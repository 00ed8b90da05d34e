package graft

import org.apache.spark.sql.functions._

/** Semantic invariants for the Advanced module, beyond the oracle
  * hash-match: recursion closure, SCD-2 interval algebra, histogram
  * mass conservation, lateral≡window-rank agreement, triangle-count
  * cross-check against an independent adjacency-intersection method,
  * and the quantile gate's per-group selectivity. */
class AdvancedSpec extends SparkSuite {

  test("q_sql_recursive reaches every supplier with the binary-tree depth") {
    val rows = SparkEntry.queries("q_sql_recursive")(spark, sfDir).collect()
    val total = spark.read.parquet(s"$sfDir/supplier.parquet").count()
    assert(rows.length == total, "recursion must close over every supplier")
    rows.foreach { r =>
      val (key, depth) = (r.getLong(0), r.getLong(1))
      // root is key 0; key k >= 1 sits at floor(log2(k)) + 1
      val expected = if (key == 0) 0 else 64 - java.lang.Long.numberOfLeadingZeros(key)
      assert(depth == expected, s"key=$key depth=$depth expected=$expected")
    }
  }

  test("q_etl_scd2 intervals tile each user's timeline: no gaps, no overlap, one current") {
    import spark.implicits._
    val scd = SparkEntry.queries("q_etl_scd2")(spark, sfDir).cache()
    try {
      // exactly one open (is_current) interval per user
      val perUser = scd.groupBy($"user_id")
        .agg(sum(when($"is_current", 1).otherwise(0)).as("n_open"),
          count(lit(1)).as("n_vers"))
      assert(perUser.filter($"n_open" =!= 1).isEmpty, "each user needs exactly one open interval")
      // version k's valid_to must equal version k+1's valid_from (tiling)
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy($"user_id").orderBy($"version")
      val bad = scd.withColumn("next_from", lead($"valid_from", 1).over(w))
        .filter($"next_from".isNotNull && $"valid_to" =!= $"next_from")
      assert(bad.isEmpty, "intervals must tile: valid_to == next valid_from")
      // consecutive versions always change the tracked attribute
      val sameType = scd.withColumn("next_type", lead($"event_type", 1).over(w))
        .filter($"next_type".isNotNull && $"next_type" === $"event_type")
      assert(sameType.isEmpty, "consecutive versions must differ in event_type")
    } finally scd.unpersist()
  }

  test("q_agg_histogram conserves row count and price mass") {
    import spark.implicits._
    val h = SparkEntry.queries("q_agg_histogram")(spark, sfDir)
      .agg(sum($"n_rows"), round(sum($"sum_price"), 4)).head()
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .agg(count(lit(1)),
        round(sum($"l_extendedprice".cast("decimal(18,4)")).cast("double"), 4))
      .head()
    assert(h.getLong(0) == li.getLong(0), "histogram dropped rows")
    assert(h.getDouble(1) == li.getDouble(1), "histogram dropped price mass")
  }

  test("q_sql_lateral equals the window-rank top-2 per nation") {
    import spark.implicits._
    val lat = SparkEntry.queries("q_sql_lateral")(spark, sfDir)
    val c = spark.read.parquet(s"$sfDir/customer.parquet")
    val n = spark.read.parquet(s"$sfDir/nation.parquet")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"n_nationkey").orderBy($"c_acctbal".desc, $"c_custkey")
    val viaRank = n.join(c, $"c_nationkey" === $"n_nationkey")
      .withColumn("rn", row_number().over(w)).filter($"rn" <= 2)
      .select($"n_name", $"c_custkey", $"c_acctbal")
      .orderBy($"n_name", $"c_custkey")
    assert(lat.collect().toSeq == viaRank.collect().toSeq)
  }

  test("q_graph_triangles agrees with adjacency-set intersection counting") {
    import spark.implicits._
    val declared = SparkEntry.queries("q_graph_triangles")(spark, sfDir)
      .agg(sum($"n_triangles")).head().getLong(0)
    // independent method: per-edge |N(u) ∩ N(v)| over higher-neighbor sets
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .filter($"l_returnflag" === "R").select($"l_orderkey", $"l_partkey")
    val e = li.as("a").join(li.as("b"),
        $"a.l_orderkey" === $"b.l_orderkey" && $"a.l_partkey" < $"b.l_partkey")
      .select($"a.l_partkey".as("u"), $"b.l_partkey".as("v")).distinct().cache()
    try {
      val nbrs = e.groupBy($"u").agg(collect_set($"v").as("hi"))
      val viaSets = e.join(nbrs.withColumnRenamed("u", "w1").withColumnRenamed("hi", "hu"),
          $"u" === $"w1")
        .join(nbrs.withColumnRenamed("u", "w2").withColumnRenamed("hi", "hv"),
          $"v" === $"w2")
        .select(size(array_intersect($"hu", $"hv")).cast("long").as("k"))
        .agg(sum($"k")).head().getLong(0)
      assert(declared == viaSets,
        s"3-join count $declared != set-intersection count $viaSets")
    } finally e.unpersist()
  }

  test("q_curate_quantile keeps ~the top quartile per language, never more than 26%") {
    import spark.implicits._
    val kept = SparkEntry.queries("q_curate_quantile")(spark, sfDir)
      .groupBy($"lang").agg(count(lit(1)).as("n_kept"))
    val all = spark.read.parquet(s"$sfDir/documents.parquet")
      .groupBy($"lang").agg(count(lit(1)).as("n_all"))
    val joined = kept.join(all, "lang")
      .select($"lang", ($"n_kept".cast("double") / $"n_all").as("frac")).collect()
    assert(joined.nonEmpty)
    joined.foreach { r =>
      val f = r.getDouble(1)
      assert(f > 0.20 && f <= 0.26 + 2.0 / 50, s"lang=${r.getString(0)} frac=$f")
    }
  }

  test("q_graph_pagerank conserves rank mass and orders by degree on a star-heavy graph") {
    import spark.implicits._
    val r = SparkEntry.queries("q_graph_pagerank")(spark, sfDir).cache()
    try {
      val n = r.count()
      assert(n > 0)
      val total = r.agg(sum($"rank")).head().getDouble(0)
      // undirected graph, no dangling mass; only the 1e-12 fixed-point
      // truncation leaks (≤ |E|·1e-12 per iteration)
      assert(math.abs(total - 1.0) < 1e-6, s"rank mass $total drifted from 1")
      assert(r.filter($"rank" <= 0.0).isEmpty, "ranks must be positive")
      val spread = r.agg(max($"rank") / min($"rank")).head().getDouble(0)
      assert(spread > 1.5, s"degenerate rank spread $spread — graph not differentiating")
    } finally r.unpersist()
  }

  test("native top-k equals the window form, including groups smaller than k") {
    import spark.implicits._
    val native = SparkEntry.queries("q_win_topk_native")(spark, sfDir)
    val o = spark.read.parquet(s"$sfDir/orders.parquet")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"o_custkey").orderBy($"o_totalprice".desc, $"o_orderkey")
    val viaWindow = o.select($"o_custkey", $"o_orderkey", $"o_totalprice")
      .withColumn("rn", row_number().over(w)).filter($"rn" <= 3).drop("rn")
      .orderBy($"o_custkey", $"o_totalprice".desc, $"o_orderkey")
    assert(native.collect().toSeq == viaWindow.collect().toSeq)
    // groups smaller than k must survive whole (no customer dropped)
    assert(native.select($"o_custkey").distinct().count() ==
      o.select($"o_custkey").distinct().count())
    // and the answer is partition-layout invariant
    val repart = SparkEntry.queries("q_win_topk_native")(spark, sfDir)
    assert(repart.collect().toSeq == native.collect().toSeq)
  }

  test("q_curate_winsorize clips ~10% of each language and preserves interior values") {
    import spark.implicits._
    val df = SparkEntry.queries("q_curate_winsorize")(spark, sfDir).cache()
    try {
      val frac = df.groupBy($"lang")
        .agg((sum(when($"clipped", 1).otherwise(0)).cast("double") /
          count(lit(1))).as("f")).collect()
      frac.foreach { r =>
        assert(r.getDouble(1) <= 0.15, s"${r.getString(0)}: clipped ${r.getDouble(1)}")
      }
      assert(df.filter(!$"clipped" && $"win_chars" =!= $"n_chars").isEmpty,
        "unclipped rows must pass through unchanged")
      assert(df.filter($"clipped").count() > 0, "expected some clipping")
    } finally df.unpersist()
  }

  test("Observation metrics ride a query's own pass (production telemetry, no second job)") {
    import spark.implicits._
    val obs = new org.apache.spark.sql.Observation("etl_metrics")
    val cleaned = spark.read.parquet(s"$sfDir/orders.parquet")
      .observe(obs, count(lit(1)).as("rows_in"),
        sum(when($"o_custkey".isNull, 1L).otherwise(0L)).as("null_keys"))
      .filter($"o_totalprice" > 0.0)
    val out = cleaned.count()
    val m = obs.get
    assert(m("rows_in").asInstanceOf[Long] >= out,
      "observed input rows must cover the filtered output")
    assert(m("null_keys").asInstanceOf[Long] == 0L)
  }

  test("_metadata hidden columns expose file provenance without a schema change") {
    import spark.implicits._
    val df = spark.read.parquet(s"$sfDir/orders.parquet")
      .select($"o_orderkey", $"_metadata.file_name".as("src_file"),
        $"_metadata.file_size".as("src_size"))
    val r = df.groupBy($"src_file", $"src_size")
      .agg(count(lit(1)).as("n")).collect()
    assert(r.nonEmpty && r.forall(_.getAs[String]("src_file").endsWith(".parquet")))
    assert(r.map(_.getAs[Long]("n")).sum ==
      spark.read.parquet(s"$sfDir/orders.parquet").count())
  }

  test("q_etl_cdc: live users carry their true last event; tombstoned users absent") {
    import spark.implicits._
    val cdc = SparkEntry.queries("q_etl_cdc")(spark, sfDir)
    val ev = graft.ops.Util.events(spark, sfDir)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"user_id").orderBy($"ts".desc, $"event_id".desc)
    val heads = ev.withColumn("rn", row_number().over(w)).filter($"rn" === 1)
    val liveHeads = heads.filter($"event_type" =!= "error").count()
    assert(cdc.count() == liveHeads, "one state row per non-tombstoned user")
    val joined = cdc.join(heads, "user_id")
      .filter($"last_type" =!= $"event_type").count()
    assert(joined == 0, "last_type must equal the head event's type")
  }

  test("q_ts_corr: autocorr in [-1,1], null until 10 pairs, n_pairs capped at 20") {
    import spark.implicits._
    val df = SparkEntry.queries("q_ts_corr")(spark, sfDir).cache()
    try {
      assert(df.filter($"n_pairs" > 20).isEmpty, "frame is 20 rows")
      assert(df.filter($"autocorr".isNotNull &&
        (abs($"autocorr") > 1.0000001)).isEmpty, "corr out of [-1,1]")
      assert(df.filter($"n_pairs" < 10 && $"autocorr".isNotNull).isEmpty,
        "scores below the min-pairs floor must be null")
      assert(df.filter($"autocorr".isNotNull).count() > 0, "no scores at all")
    } finally df.unpersist()
  }
}
