package graft

import org.apache.spark.sql.DataFrame

/** The two-phase rank kernel must be BIT-IDENTICAL to the single-window
  * plan it replaces — same precedent as the salted-join and MinHashLanes
  * parity proofs: the optimized form's oracle is the plain form.
  * Exercised on the real fixtures for all four rerouted queries by
  * forcing the kernel (threshold 0) and diffing against the default
  * (plain-window) result. */
class DistRankParitySpec extends SparkSuite {

  private def collectSorted(df: DataFrame): Seq[String] =
    df.collect().map(_.toString).toSeq

  private def withKernelForced[T](f: => T): T = {
    val saved = spark.conf.getOption(graft.ops.DistRank.ThresholdConf)
    try {
      spark.conf.set(graft.ops.DistRank.ThresholdConf, "0")
      f
    } finally saved.fold(spark.conf.unset(graft.ops.DistRank.ThresholdConf))(
      spark.conf.set(graft.ops.DistRank.ThresholdConf, _))
  }

  Seq("q_win_rank", "q_win_pctrank", "q_win_firstlast", "q_ts_lttb",
      "q_win_ntile").foreach { name =>
    test(s"$name: two-phase kernel output equals the plain-window output") {
      val plain = collectSorted(SparkEntry.queries(name)(spark, sfDir))
      val kernel = withKernelForced {
        collectSorted(SparkEntry.queries(name)(spark, sfDir))
      }
      assert(plain.nonEmpty, s"$name returned no rows")
      assert(plain == kernel,
        s"$name: kernel output diverges from the window form " +
          s"(first diff: ${plain.zip(kernel).find(p => p._1 != p._2)})")
      graft.ops.Util.unpersistRegistered()
    }
  }

  test("derived ntile(4) equals the ntile window function on torture sizes") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // every n in 1..25 (covers n < q, n % q = 0..3) against real ntile
    (1 to 25).foreach { n =>
      val df = (1 to n).map(i => (i.toLong, (i * 13 % 7).toDouble))
        .toDF("id", "v")
      val ranked = graft.ops.DistRank.twoPhase(
        df, Seq.empty, Seq($"v", $"id"), sliceKey = $"v", out = "_rn",
        countOut = Some("_n"))
        .withColumn("_rem", $"_n" % 4)
        .withColumn("_big", expr("_n div 4") + 1L)
        .select($"id",
          when($"_rn" <= $"_rem" * $"_big", expr("(_rn - 1) div _big") + 1L)
            .otherwise($"_rem" + expr("(_rn - _rem * _big - 1) div (_big - 1)") + 1L)
            .cast("long").as("q"))
      val w = org.apache.spark.sql.expressions.Window.orderBy($"v", $"id")
      val expected = df.select($"id", ntile(4).over(w).cast("long").as("q"))
      assert(ranked.collect().map(_.toSeq).toSet ==
        expected.collect().map(_.toSeq).toSet, s"ntile mismatch at n=$n")
    }
    graft.ops.Util.unpersistRegistered()
  }

  test("q_win_rank_dist (always-kernel registry entry) equals q_win_rank") {
    val a = collectSorted(SparkEntry.queries("q_win_rank")(spark, sfDir))
    val b = collectSorted(SparkEntry.queries("q_win_rank_dist")(spark, sfDir))
    assert(a == b)
    graft.ops.Util.unpersistRegistered()
  }

  test("kernel is exact on a skewed + tied + small-group torture fixture") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // groups of size 1 (offset edge), 2, and a 10k-row skewed group with
    // heavy ties in the slice key (boundary-duplication path); unique
    // tie-break id keeps the ordering total
    val rows =
      (1 to 10000).map(i => ("hot", i.toLong, (i % 7).toDouble)) ++
        Seq(("solo", 1L, 5.0), ("pair", 1L, 2.0), ("pair", 2L, 1.0))
    val df = rows.toDF("g", "id", "v").repartition(8)
    val kernel = graft.ops.DistRank.twoPhase(
      df, Seq("g"), Seq($"v", $"id"), sliceKey = $"v", out = "rn",
      countOut = Some("n"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"g").orderBy($"v", $"id")
    val plain = df
      .withColumn("rn", row_number().over(w).cast("long"))
      .withColumn("n", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy($"g")))
    val k = kernel.orderBy($"g", $"rn").collect().map(_.toString)
    val p = plain.orderBy($"g", $"rn").collect().map(_.toString)
    assert(k.sameElements(p))
    graft.ops.Util.unpersistRegistered()
  }
}
