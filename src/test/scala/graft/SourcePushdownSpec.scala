package graft

import org.apache.spark.sql.functions._

/** Round-7 DSv2 depth: aggregate pushdown (SupportsPushDownAggregates),
  * key-grouped bucket partitioning (SupportsReportPartitioning +
  * HasPartitionKey), the storage-partitioned join built on them, and the
  * runtime Bloom-filter join. Each test pins BOTH the plan shape (the
  * feature actually engaged — the fallback plan would give identical
  * rows) and the values. */
class SourcePushdownSpec extends SparkSuite {

  private def synth(rows: Long, opts: (String, String)*) = {
    val r = spark.read.format("graft.sources.SynthSource")
      .option("rows", rows.toString)
    opts.foldLeft(r) { case (acc, (k, v)) => acc.option(k, v) }.load()
  }

  test("partial aggregate pushdown: the scan emits grouped partials, not raw rows") {
    val df = SparkEntry.queries("q_src_aggpush")(spark, sfDir)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("aggPushed=byBucket:AggCount,AggSum(val),AggMin(id),AggMax(id)"),
      s"aggregate not pushed into the connector:\n$p")
    // the scan's output schema IS the partial-aggregate schema — no raw id/val
    assert(p.contains("cols=bucket,agg_0_count,agg_1_sum_val,agg_2_min_id,agg_3_max_id"),
      s"scan still reads raw columns:\n$p")
    // Spark recombines partials: SUM over counts/sums, MIN/MAX over mins/maxes
    assert(p.contains("sum(agg_func_0"), s"final agg does not recombine the pushed count:\n$p")
    // values: ids [5000, 150000), 2900 per bucket
    val row = df.filter(col("bucket") === 7).head
    assert(row.getLong(1) == 2900L)
    assert(row.getLong(3) == 5007L && row.getLong(4) == 149957L)
  }

  test("complete aggregate pushdown in bucket-partitioned mode plans NO aggregate") {
    // bucket partitions each hold exactly one bucket, so per-partition
    // group results are final: the source claims supportCompletePushDown
    // and Spark drops the Aggregate node entirely — scan IS the aggregate
    val df = synth(10000, "partitionBy" -> "bucket")
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n"), sum(col("val")).as("sum_val"))
      .orderBy(col("bucket"))
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("aggPushed=byBucket"), s"aggregate not pushed:\n$p")
    assert(!p.contains("HashAggregate"),
      s"complete pushdown still planned a Spark-side aggregate:\n$p")
    // values against the closed form: bucket b holds ids b, b+50, …, 200 of them
    val rows = df.collect()
    assert(rows.length == 50)
    rows.foreach { r =>
      val b = r.getInt(0)
      val ids = (b until 10000 by 50).toSeq
      assert(r.getLong(1) == 200L, s"bucket $b count")
      assert(r.getDouble(2) == ids.map(id => (id.toLong * 37 % 1000).toDouble).sum,
        s"bucket $b sum")
    }
  }

  test("bucket-partitioned raw scan returns exactly the sliced scan's rows") {
    // mode equivalence: partitioning is a layout choice, never a content one
    val sliced = synth(10000, "slices" -> "8").collect().map(_.toSeq).sortBy(_.toString)
    val bucketed = synth(10000, "partitionBy" -> "bucket").collect().map(_.toSeq).sortBy(_.toString)
    assert(sliced.length == 10000 && bucketed.sameElements(sliced))
  }

  test("storage-partitioned join: the only Exchange in q_src_spj is the final sort") {
    val df = SparkEntry.queries("q_src_spj")(spark, sfDir)
    df.collect() // let AQE finalize
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("SortMergeJoin"), s"expected the partitioned SMJ:\n$p")
    val exchanges = "Exchange".r.findAllIn(p).size
    // AQE prints the final plan AND the initial plan: each contains exactly
    // the one rangepartitioning exchange for the presentation sort
    val rangeEx = "Exchange rangepartitioning".r.findAllIn(p).size
    assert(exchanges == rangeEx && rangeEx >= 1,
      s"join or aggregate shuffled despite key-grouped scans ($exchanges exchanges):\n$p")
  }

  test("runtime Bloom filter prunes the fact side of q_join_bloom") {
    val df = SparkEntry.queries("q_join_bloom")(spark, sfDir)
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("might_contain"),
      s"no runtime Bloom filter on the application side:\n$p")
    assert(p.contains("bloom_filter_agg"),
      s"no Bloom filter build on the creation side:\n$p")
    // the filter sits on the lineitem (application) side scan stage
    assert(p.contains("xxhash64(l_orderkey"),
      s"Bloom probe not keyed on the fact join key:\n$p")
  }

  test("one-side-bucketed join: only the un-bucketed side shuffles, into the scan's partitioning") {
    // spark.sql.sources.v2.bucketing.shuffle.enabled: when just ONE side
    // carries storage partitioning, Spark shuffles the OTHER side into the
    // scan's key-grouped layout instead of shuffling both into a fresh
    // hash partitioning — at 100 TB that keeps the big bucketed fact
    // stationary and moves only the small side
    val s2 = spark.newSession()
    s2.conf.set("spark.sql.sources.v2.bucketing.enabled", "true")
    s2.conf.set("spark.sql.sources.v2.bucketing.shuffle.enabled", "true")
    s2.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    def rd(rows: Int, opts: (String, String)*) = {
      val r = s2.read.format("graft.sources.SynthSource").option("rows", rows.toString)
      opts.foldLeft(r) { case (acc, (k, v)) => acc.option(k, v) }.load()
    }
    val fact = rd(2500, "partitionBy" -> "bucket").select(col("bucket"), col("val"))
    val dim = rd(500, "slices" -> "4")
      .select(col("bucket"), col("val").as("dim_val"))
    val j = fact.join(dim, "bucket")
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n"), sum(col("val") * col("dim_val")).as("s"))
      .orderBy(col("bucket"))
    j.collect()
    val p = j.queryExecution.executedPlan.toString
    val kgShuffles = "Exchange keygroupedpartitioning".r.findAllIn(p).size
    val hashShuffles = "Exchange hashpartitioning".r.findAllIn(p).size
    assert(kgShuffles >= 1,
      s"un-bucketed side was not shuffled into the storage partitioning:\n$p")
    assert(hashShuffles == 0,
      s"join fell back to hash-shuffling (bucketed side moved too):\n$p")
    // values: bucket b has 50 fact rows × 10 dim rows
    val r = j.collect()
    assert(r.length == 50 && r.forall(_.getLong(1) == 500L))
  }

  test("columnar read path: ColumnarToRow in the plan, content identical to row mode") {
    val df = SparkEntry.queries("q_src_columnar")(spark, sfDir)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("ColumnarToRow"),
      s"vectorized reader did not engage (no ColumnarToRow bridge):\n$p")
    // same scan in row mode must produce identical grouped results
    val row = synth(200000, "slices" -> "8")
      .filter(col("id") >= 1000 && col("id") < 150000)
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n"), avg(col("val")).as("avg_val"),
        sum(col("id")).as("sum_id"))
      .orderBy(col("bucket"))
    assert(df.collect().toSeq == row.collect().toSeq,
      "columnar and row readers disagree")
  }

  test("runtime V2 filtering: the dim's filter drops 45 of 50 fact bucket partitions") {
    val df = SparkEntry.queries("q_join_dpp_v2")(spark, sfDir)
    // grab the live Scan instance BEFORE execution: runtime filtering
    // mutates this very object once the dim side has run
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
    val pre = df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.inputPlan
      case p => p
    }
    val synthScans = pre.collect {
      case b: BatchScanExec if b.scan.description().startsWith("SynthScan") => b.scan
    }
    assert(synthScans.size == 1, s"expected one synth scan:\n$pre")
    assert(synthScans.head.toBatch.planInputPartitions().length == 50,
      "pre-execution scan should offer all 50 bucket partitions")
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("RuntimeFilters: [dynamicpruningexpression(bucket"),
      s"no runtime filter reached the connector scan:\n$p")
    // the dim (region 2 => 5 nations) disproved 45 buckets at runtime
    assert(synthScans.head.toBatch.planInputPartitions().length == 5,
      "runtime filter did not drop the disproved bucket partitions")
  }

  test("KGP and aggregate pushdown do not compose (pinned Spark limitation)") {
    // V2ScanPartitioningAndOrdering resolves reported partition keys
    // against the relation's ORIGINAL output, which aggregate pushdown
    // replaces — so the agg-pushed scan must NOT claim key-grouped
    // partitioning (claiming it would be ignored today, but this pins the
    // assumption the SPJ/aggpush query split rests on; see qSrcSpj doc)
    import org.apache.spark.sql.execution.datasources.v2.DataSourceV2ScanRelation
    val df = synth(10000, "partitionBy" -> "bucket")
      .groupBy(col("bucket")).agg(count(lit(1)).as("n"))
    val kgps = df.queryExecution.optimizedPlan.collect {
      case r: DataSourceV2ScanRelation => r.keyGroupedPartitioning
    }
    assert(kgps.nonEmpty && kgps.forall(_.isEmpty))
    // while the RAW bucketed scan does report it
    val raw = synth(10000, "partitionBy" -> "bucket").select(col("bucket"))
    val rawKgps = raw.queryExecution.optimizedPlan.collect {
      case r: DataSourceV2ScanRelation => r.keyGroupedPartitioning
    }
    assert(rawKgps.nonEmpty && rawKgps.forall(_.isDefined))
  }
}
