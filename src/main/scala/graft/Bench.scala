package graft
import org.apache.spark.sql.SparkSession

/** Benchmark main. Runs every `SparkEntry.queries` entry against
  * SPARK_GRAFT_SF_DIR and reports wall-clock per query.
  *
  * Output contract (the driver tails stdout, so long lines get
  * front-truncated): the FULL per-query map goes out first on its own
  * line, and the machine-readable summary is the short FINAL stdout
  * line so a tail capture always retains it intact.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // warmup absorbs one-time costs (parquet footer reads, codegen paths,
    // shuffle service init) so per-query times are comparable across rounds
    // regardless of which query happens to run first
    try SparkEntry.queries("q_scan_parquet")(spark, sfDir).count()
    catch { case _: Throwable => () }
    val filter = sys.env.get("SPARK_GRAFT_BENCH_FILTER")
      .map(_.split(",").toSet)
    val selected = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => filter.forall(_.contains(n)) }
    val results = selected.map { case (name, fn) =>
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count() } catch { case _: Throwable => -1L }
      name -> (System.nanoTime() - t0) / 1e9
    }.toMap
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + f"$v%.3f" }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.values.sum else 0.0
    // numeric scale factor from the dir name (".../sf0.1" -> 0.1)
    val sf = "sf([0-9.]+)".r.findFirstMatchIn(sfDir)
      .map(_.group(1).stripSuffix(".")).getOrElse("0")
    // headline subset keeps the final line short enough for any tail size
    val headline = Seq("q_agg_groupby", "q_join_inner", "q_join_broadcast",
      "q_win_topk_group", "q_dedup_near", "q_dedup_simhash", "q_sim_topk",
      "q_text_fingerprint", "q_udtf", "q_ts_gapfill")
    val hq = headline.flatMap(k => results.get(k).map(v => s"\"" + k + "\":" + f"$v%.3f"))
      .mkString("{", ",", "}")
    println(s"""{"metric":"per_query","queries":$qs,"sf":$sf}""")
    println(f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":$hq,"sf":$sf}""")
    spark.stop()
  }
}
