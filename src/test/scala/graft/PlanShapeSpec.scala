package graft

import org.apache.spark.sql.functions.{avg, col, count, lit}

/** SURVEY §5.3(5): plan-shape assertions — the optimizer behaviors the
  * 100 TB design depends on must be visible in the physical plan, not
  * assumed. */
class PlanShapeSpec extends SparkSuite {

  private def plan(name: String, execute: Boolean = false): String = {
    val df = SparkEntry.queries(name)(spark, sfDir)
    // executing THIS df's plan (not a derived count()) lets AQE finalize it
    if (execute) df.collect()
    df.queryExecution.executedPlan.toString
  }

  test("q_scan_pruned pushes predicates and prunes columns at the scan") {
    val p = plan("q_scan_pruned")
    assert(p.contains("PushedFilters: ["), s"no pushed filters in:\n$p")
    assert(p.contains("GreaterThanOrEqual(l_shipdate"), s"shipdate filter not pushed:\n$p")
    // pruned read schema: only the 3 needed columns reach the scan
    assert(p.contains("ReadSchema"), p)
    val read = p.linesIterator.find(_.contains("ReadSchema")).get
    assert(!read.contains("l_comment") && !read.contains("l_tax") &&
      !read.contains("l_quantity"), s"scan reads unneeded columns: $read")
  }

  test("q_sort_limit plans TakeOrderedAndProject (no global sort)") {
    assert(plan("q_sort_limit").contains("TakeOrderedAndProject"))
  }

  test("q_join_broadcast uses BroadcastHashJoin for both dims") {
    val p = plan("q_join_broadcast")
    assert("BroadcastHashJoin".r.findAllIn(p).size >= 2, p)
  }

  test("q_join_smj honors the merge hint") {
    assert(plan("q_join_smj").contains("SortMergeJoin"))
  }

  test("q_join_shuffle_hash honors the shuffle_hash hint (strategy triple complete)") {
    assert(plan("q_join_shuffle_hash").contains("ShuffledHashJoin"))
  }

  test("q_join_nullsafe plans a hash join on the null-safe comparator, no cartesian") {
    val p = plan("q_join_nullsafe")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoop"), p)
  }

  test("q_join_theta is an equi join with range residual, not a cartesian") {
    val p = plan("q_join_theta")
    assert(!p.contains("CartesianProduct") && !p.contains("NestedLoop"), p)
  }

  // AQE hides stage subtrees from TreeNode.children (QueryStageExec keeps
  // its materialized plan as an inner child), so a plain collect() never
  // sees operators below the first exchange — descend explicitly
  private def allNodes(p: org.apache.spark.sql.execution.SparkPlan)
      : Seq[org.apache.spark.sql.execution.SparkPlan] = {
    val inner = p match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        Seq(a.executedPlan)
      case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
        Seq(q.plan)
      case _ => Nil
    }
    p +: (p.children ++ inner).flatMap(allNodes)
  }

  test("q_join_bucketed: SMJ over bucketed scans, zero shuffle AND zero sort below the join") {
    val df = SparkEntry.queries("q_join_bucketed")(spark, sfDir)
    df.collect()
    val smj = allNodes(df.queryExecution.executedPlan).collect {
      case j: org.apache.spark.sql.execution.joins.SortMergeJoinExec => j }
    assert(smj.nonEmpty, s"no SortMergeJoin:\n${df.queryExecution.executedPlan}")
    // the write-time exchange is the ONLY one: the join itself reads the
    // bucketed layout directly (the amortized-shuffle claim)
    val shuffles = allNodes(smj.head).collect {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeLike => e }
    assert(shuffles.isEmpty, s"bucketed join still shuffles:\n${smj.head}")
    // one file per bucket (repartition before write) + the legacy
    // sorted-scan conf => per-file sortBy order is trusted, sorts elided
    val sorts = allNodes(smj.head).collect {
      case so: org.apache.spark.sql.execution.SortExec => so }
    assert(sorts.isEmpty, s"sortBy order not trusted (Sort not elided):\n${smj.head}")
  }

  test("bucketed scan statically prunes to one bucket on a key-literal filter") {
    import org.apache.spark.sql.functions._
    SparkEntry.queries("q_join_bucketed")(spark, sfDir).collect() // ensure tables
    // scan-only queries auto-DISABLE bucketed reads (no join/agg to feed);
    // pruning needs the bucketed scan kept on
    val s2 = spark.newSession()
    s2.conf.set("spark.sql.sources.bucketing.autoBucketedScan.enabled", "false")
    val ct = s"graft_bkt_customer_${Integer.toHexString(sfDir.hashCode)}"
    val p = s2.table(ct).filter(col("c_custkey") === 42)
      .queryExecution.executedPlan.toString
    assert(p.contains("SelectedBucketsCount: 1 out of 8"),
      s"no static bucket pruning:\n$p")
  }

  test("q_sim_topk broadcasts the probe side") {
    val p = plan("q_sim_topk")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"), p)
  }

  test("q_text_contamination broadcasts the benchmark shingle set") {
    // the corpus-side explode must probe an in-memory hash relation of the
    // (tiny) benchmark set — a shuffled join here would shuffle the whole
    // corpus's shingles at 100 TB
    val p = plan("q_text_contamination")
    assert(p.contains("BroadcastHashJoin"), s"benchmark set not broadcast:\n$p")
  }

  test("minhash/simhash signature generation plans no shuffle (per-row kernels)") {
    import org.apache.spark.sql.functions._
    // the round-6 kernels moved signature generation from explode+groupBy
    // (one shuffle of per-shingle/per-token partials) to pure map-side
    // expressions — the 100 TB claim is that the corpus scan emits
    // signatures directly, so the plan must show scan -> project, no
    // Exchange anywhere
    // r14: the single-split fixture scan is SPREAD (repartition on
    // doc_id) before the per-row kernel so the signature map stage
    // parallelizes — that one input rebalance is the ONLY exchange
    // allowed; signature computation itself must still add no shuffle
    // (no per-shingle/per-token key exchange)
    val mhDf = graft.ops.LlmOps.minHashSig(spark, sfDir)
    mhDf.collect() // finalize the AQE plan so codegen stages print
    val mh = mhDf.queryExecution.executedPlan.toString
    // the rebalance tags REPARTITION_BY_NUM; a signature-side key
    // shuffle would tag ENSURE_REQUIREMENTS (AQE's toString prints the
    // plan twice, so counting "Exchange" occurrences is meaningless)
    assert(mh.contains("REPARTITION_BY_NUM") &&
      !mh.contains("ENSURE_REQUIREMENTS"),
      s"minhash signatures shuffle beyond the input spread:\n$mh")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val sh = docs.select(col("doc_id"),
      org.apache.spark.sql.graft.GraftSql.column(graft.functions.SimHashBits(
        org.apache.spark.sql.graft.GraftSql.expression(split(col("text"), " ")))))
      .queryExecution.executedPlan.toString
    assert(!sh.contains("Exchange"), s"simhash signatures shuffle:\n$sh")
    // and both ride whole-stage codegen ("*(n)" stage markers in the
    // compact plan string), not the interpreted fallback
    assert(mh.contains("*(1)"), s"minhash not codegen'd:\n$mh")
    assert(sh.contains("*(1)"), s"simhash not codegen'd:\n$sh")
  }

  test("q_dedup_near has no unblocked cross product over documents") {
    val p = plan("q_dedup_near")
    assert(!p.contains("CartesianProduct"), p)
  }

  test("whole-stage codegen is active in the flagship aggregation") {
    // codegen'd operators print with a "*(stageId)" prefix in this format
    assert(plan("q_agg_groupby", execute = true).contains("*("))
  }

  test("q_src_partitioned prunes partitions at the scan") {
    val df = SparkEntry.queries("q_src_partitioned")(spark, sfDir)
    val s = df.queryExecution.executedPlan.toString
    assert(s.contains("PartitionFilters: [") &&
      s.contains("o_year"), s"partition filter not pushed:\n$s")
  }

  test("custom optimizer rule rewrites pow(x,2) to a multiply") {
    val df = SparkEntry.queries("q_rule_rewrite")(spark, sfDir)
    val optimized = df.queryExecution.optimizedPlan.toString
    assert(!optimized.toLowerCase.contains("pow"),
      s"pow survived the rewrite rule:\n$optimized")
  }

  test("no query plans an accidental CartesianProduct") {
    // crossagg is an intentional tiny cross join (plans as broadcast NLJ,
    // but allow either); everything else must be equi/broadcast/banded
    val allowed = Set("q_join_crossagg")
    SparkEntry.queries.keys.filterNot(allowed).foreach { name =>
      val p = plan(name)
      assert(!p.contains("CartesianProduct"), s"$name plans a cartesian:\n$p")
    }
  }

  test("DSv2 connector receives the pushed range filter and pruned columns") {
    // raw scan (no aggregate, so nothing else can claim the columns): the
    // connector narrows its generated interval from the pushed filters and
    // reports it in Scan.description; id is pruned from the read schema
    // because the filter was claimed fully
    import org.apache.spark.sql.functions.col
    val raw = spark.read.format("graft.sources.SynthSource")
      .option("rows", "100000").option("slices", "8").load()
      .filter(col("id") >= 1000 && col("id") < 60000)
      .select(col("bucket"), col("val"))
    val p = raw.queryExecution.executedPlan.toString
    assert(p.contains("range=[1000,60000)"), s"filters not pushed into the source:\n$p")
    assert(p.contains("cols=bucket,val"), s"columns not pruned at the connector:\n$p")
    assert(!p.contains("Filter ("), s"Spark kept a post-scan filter despite full claim:\n$p")
    // the registered query's aggregate now ALSO pushes into the connector
    // (SourcePushdownSpec pins the shape); values stay right: 59000 ids
    val df = SparkEntry.queries("q_src_dsv2")(spark, sfDir)
    assert(df.queryExecution.executedPlan.toString.contains("aggPushed=byBucket"),
      "q_src_dsv2's aggregate no longer pushes into the connector")
    assert(df.agg(org.apache.spark.sql.functions.sum("n")).head.getLong(0) == 59000L)
  }

  test("LM family: corpus-explode subtrees cached once, model joins broadcast (never shuffle the corpus on the model key)") {
    // r14: the bigram/perplexity scoring join used to shuffle the whole
    // bigram table on (w1, w2) against a vocab²-bounded model — the model
    // broadcasts; and the explode subtree feeds both the model counts and
    // the scoring join, so it must be cached or it executes twice
    // (unigram/collocations deliberately NOT here: r14 measured their
    // cache builds slower than recomputing the cheap fused explode;
    // q_sim_sparse dropped in r17 — the capped builder that now backs
    // the id measured its postings cache SLOWER than recompute, because
    // the replicate-and-join sides fuse into whole-stage codegen
    // straight off the exchange)
    Seq("q_text_bigram_lm", "q_curate_perplexity").foreach { name =>
      val p = plan(name)
      assert(p.contains("InMemoryTableScan") || p.contains("InMemoryRelation"),
        s"$name no longer caches its reused corpus subtree:\n$p")
    }
    Seq("q_text_bigram_lm", "q_curate_perplexity").foreach { name =>
      val p = plan(name)
      assert(p.contains("BroadcastHashJoin"),
        s"$name's model join must broadcast, not shuffle the corpus:\n$p")
    }
  }

  test("suffix dedup: salted wide shuffle, no unblocked self-join, spread before the explode") {
    val p = plan("q_dedup_suffix")
    // L=40 takes the string-keyed single-exchange path (round 16), but
    // the exchange must stay SALTED — xxhash64(doc_id, pos) mod 64 in
    // the grouping key is the skew bound; the global cartesian check
    // covers self-join accidents, this pins the salt and that no
    // broadcast NLJ snuck in
    assert(p.contains("xxhash64"),
      s"q_dedup_suffix lost its xxhash64 salt on the wide shuffle:\n$p")
    assert(!p.contains("BroadcastNestedLoopJoin"),
      s"q_dedup_suffix plans a nested-loop join:\n$p")
    // the single-split fixture scan is spread across the cluster before
    // the ~300x per-char amplification (one task would do all the work)
    assert(p.contains("REPARTITION_BY_COL") || p.contains("hashpartitioning"),
      s"q_dedup_suffix lost its pre-explode spread:\n$p")
  }

  test("dedup self-joins reuse their cached signature subtrees") {
    // the minhash/ngram caches are load-bearing (3.5s->1.4s, 1.1s->0.6s):
    // a removed .cache() recomputes the expensive subtree per consumer
    Seq("q_dedup_near", "q_dedup_ngram", "q_dedup_simhash").foreach { name =>
      val p = plan(name)
      assert(p.contains("InMemoryTableScan") || p.contains("InMemoryRelation"),
        s"$name no longer caches its reused subtree:\n$p")
    }
  }

  test("blocked range join plans as a hash join on the bucket key") {
    // the whole point of the time-bucket blocking: the range condition must
    // ride an EQUALITY join (hash or SMJ), never a nested-loop
    val p = plan("q_join_range_blocked")
    assert(!p.contains("NestedLoop") && !p.contains("CartesianProduct"),
      s"range join fell back to a nested loop:\n$p")
    assert(p.contains("HashJoin") || p.contains("SortMergeJoin"),
      s"expected an equi join on the bucket key:\n$p")
  }

  test("AQE splits a skewed fact-fact sort-merge join (skew=true)") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // 97% of left rows share key 0 -> one shuffle partition dwarfs the rest;
    // thresholds lowered so test-scale data crosses them (prod defaults are
    // 256MB / factor 5 — the mechanism under test is identical)
    val confs = Map(
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "32KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "32KB",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val saved = confs.keys.map(k => k -> spark.conf.getOption(k)).toMap
    try {
      confs.foreach { case (k, v) => spark.conf.set(k, v) }
      // md5 payload keeps the skewed partition incompressible: AQE reads
      // COMPRESSED map-output sizes, and a constant-key long column would
      // lz4 down below any realistic threshold
      val left = spark.range(0, 500000)
        .select(when($"id" % 100 =!= 0, lit(0L)).otherwise($"id").as("k"),
          md5($"id".cast("string")).as("v"))
      val right = spark.range(0, 50000).select(($"id" % 1000).as("k"), $"id".as("w"))
      val joined = left.join(right, "k")
        .groupBy().agg(count(lit(1)).as("n"), max($"v").as("mv"))
      joined.collect()
      val p = joined.queryExecution.executedPlan.toString
      assert(p.contains("skew=true"), s"AQE did not mark the join skewed:\n$p")
    } finally saved.foreach { case (k, v) =>
      v.fold(spark.conf.unset(k))(spark.conf.set(k, _))
    }
  }

  test("JDBC scan pushes the predicate to the remote database") {
    // the balance filter must reach Derby as a WHERE clause, not run as a
    // post-scan Spark filter — against a real warehouse this is the
    // difference between shipping the table and shipping the result
    val p = plan("q_src_jdbc")
    assert(p.contains("PushedFilters") && p.contains("GreaterThan(s_acctbal"),
      s"balance predicate not pushed into the JDBC scan:\n$p")
  }

  test("runtime bloom filter prunes the fact side of a selective join") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // at 100 TB a selective dim filter should reach the fact scan as an
    // injected bloom filter (might_contain) so unmatched fact rows die
    // before the shuffle; size thresholds lowered to test scale, broadcast
    // off to force the shuffle-join path the injection targets
    val confs = Map(
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" -> "100MB",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val saved = confs.keys.map(k => k -> spark.conf.getOption(k)).toMap
    try {
      confs.foreach { case (k, v) => spark.conf.set(k, v) }
      val o = spark.read.parquet(s"$sfDir/orders.parquet")
        .filter($"o_orderpriority" === "1-URGENT")
      val l = spark.read.parquet(s"$sfDir/lineitem.parquet")
      val j = l.join(o, l("l_orderkey") === o("o_orderkey"))
        .groupBy($"o_orderpriority").agg(sum($"l_quantity").as("q"))
      val p = j.queryExecution.executedPlan.toString
      assert(p.contains("might_contain"),
        s"no runtime bloom filter injected on the fact side:\n$p")
    } finally saved.foreach { case (k, v) =>
      v.fold(spark.conf.unset(k))(spark.conf.set(k, _))
    }
  }

  test("custom codegen expression compiles into the plan") {
    val df = SparkEntry.queries("q_expr_custom")(spark, sfDir)
    // forcing execution exercises NormDiffCodegen.doGenCode
    assert(df.count() > 0)
  }

  test("dot_product codegen expression compiles into the embedding plans") {
    // fallback off: a DotProduct.doGenCode bug would fail the test instead
    // of silently degrading to interpreted eval
    val saved = spark.conf.getOption("spark.sql.codegen.fallback")
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try {
      val df = SparkEntry.queries("q_sim_topk")(spark, sfDir)
      assert(df.count() > 0)
      val p = df.queryExecution.executedPlan.toString
      assert(p.contains("dot_product"),
        s"DotProduct expression missing from the physical plan:\n$p")
    } finally saved.fold(spark.conf.unset("spark.sql.codegen.fallback"))(
      spark.conf.set("spark.sql.codegen.fallback", _))
  }

  test("morton_interleave codegen expression compiles into the z-order plan") {
    val saved = spark.conf.getOption("spark.sql.codegen.fallback")
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try {
      val df = SparkEntry.queries("q_layout_zorder")(spark, sfDir)
      assert(df.count() > 0)
      val p = df.queryExecution.executedPlan.toString
      assert(p.contains("morton_interleave"),
        s"MortonInterleave expression missing from the physical plan:\n$p")
    } finally saved.fold(spark.conf.unset("spark.sql.codegen.fallback"))(
      spark.conf.set("spark.sql.codegen.fallback", _))
  }

  test("dynamic partition pruning fires on the dim-filtered partitioned join") {
    val df = SparkEntry.queries("q_join_dpp")(spark, sfDir)
    assert(df.count() == 2, "expected the two 'late'-era year groups")
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("dynamicpruning"),
      s"no dynamicpruningexpression in the fact scan's PartitionFilters:\n$p")
  }

  test("recursive CTE plans as Spark's UnionLoop iterative operator") {
    val p = SparkEntry.queries("q_sql_recursive")(spark, sfDir)
      .queryExecution.optimizedPlan.toString
    assert(p.contains("UnionLoop"),
      s"recursive CTE did not lower to UnionLoop:\n$p")
  }

  test("lateral top-2 join does not degenerate to a cartesian product") {
    val p = SparkEntry.queries("q_sql_lateral")(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct"),
      s"lateral subquery planned a cartesian product:\n$p")
  }

  test("triangle counting closes wedges with equi-joins only") {
    val p = SparkEntry.queries("q_graph_triangles")(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(!p.contains("NestedLoop") && !p.contains("CartesianProduct"),
      s"triangle join degenerated to a quadratic join:\n$p")
  }

  test("native top-k runs partial+final heaps with ONE exchange of survivors between") {
    val qe = SparkEntry.queries("q_win_topk_native")(spark, sfDir).queryExecution
    val p = qe.executedPlan.toString
    assert("TopKPerGroup".r.findAllIn(p).size == 2,
      s"expected partial+final TopKPerGroupExec:\n$p")
    // the exchange between the heap phases moves survivors only — and no
    // window/sort operator appears below the final orderBy
    assert(p.contains("Exchange hashpartitioning"),
      s"no clustered exchange between heap phases:\n$p")
    assert(!p.contains("Window"), s"native top-k must not fall back to a window:\n$p")
  }

  test("window-top-k idiom is rewritten to the native heap operator (no Window executes)") {
    val qe = SparkEntry.queries("q_rule_topk")(spark, sfDir).queryExecution
    val p = qe.executedPlan.toString
    assert("TopKPerGroup".r.findAllIn(p).size == 2,
      s"RewriteWindowTopK did not fire:\n$p")
    assert(!p.contains("Window"),
      s"the Window survived the rewrite:\n$p")
  }

  test("grid-binned bbox join is an equi-join on the cell key, not a nested loop") {
    val p = SparkEntry.queries("q_geo_bbox")(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(p.contains("HashJoin") || p.contains("SortMergeJoin"),
      s"expected an equi-join on (cx, cy):\n$p")
    assert(!p.contains("NestedLoop") && !p.contains("CartesianProduct"),
      s"bbox join degenerated to a quadratic join:\n$p")
  }

  test("grid-cell radius self-join is an equi-join on the cell key, not a cross product") {
    val p = SparkEntry.queries("q_geo_join")(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(p.contains("HashJoin") || p.contains("SortMergeJoin"),
      s"expected an equi-join on (cx, cy):\n$p")
    assert(!p.contains("NestedLoop") && !p.contains("CartesianProduct"),
      s"radius self-join degenerated to a quadratic join:\n$p")
  }

  test("store metadata aggregate plans the answer row, not a data scan") {
    val p = SparkEntry.queries("q_store_metaagg")(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(p.contains("metadata-only aggregate"),
      s"count/min/max did not come from manifest lines:\n$p")
  }

  test("rank family routes through the two-phase kernel at scale (no bare-key window funnel)") {
    // the round-6 scale audit's one perf-weak finding: Window.partitionBy
    // on a ~5-value key executes ONE task per key value, funneling a full
    // segment through a single reducer at 100 TB. The family now routes
    // through DistRank.rowNumberInGroup, which is COST-BASED (like
    // Spark's broadcast-vs-shuffle choice): below the 1 GiB default the
    // single window is the cheapest correct plan (a sub-gigabyte segment
    // in one task is not a funnel), at/above it the two-phase kernel
    // engages. Lowering the threshold to 0 here simulates the 100 TB
    // input: every plan must (a) carry the percentile boundary sketch
    // and (b) partition every row_number window by >= 2 expressions
    // (_rp + group, or group + bucket) — never the bare low-cardinality
    // key. (The tiny prefix-sum window over the P×K-row count table is
    // group-partitioned but has no row_number in it.)
    val partSpec = "\\], \\[([^\\]]*)\\], \\[[^\\]]*\\]\\s*$".r
    val saved = spark.conf.getOption(graft.ops.DistRank.ThresholdConf)
    try {
      spark.conf.set(graft.ops.DistRank.ThresholdConf, "0")
      Seq("q_win_rank", "q_win_pctrank", "q_win_firstlast", "q_ts_lttb").foreach { name =>
        val p = plan(name)
        assert(p.contains("percentile_approx"),
          s"$name: two-phase slice-boundary sketch missing:\n$p")
        val rnWindows = p.linesIterator
          .filter(l => l.contains("Window ") && l.contains("row_number")).toSeq
        assert(rnWindows.nonEmpty, s"$name: expected a kernel row_number window:\n$p")
        rnWindows.foreach { l =>
          val spec = partSpec.findFirstMatchIn(l).map(_.group(1)).getOrElse("")
          assert(spec.split(",").length >= 2,
            s"$name: row_number window partitioned by the bare key — funnel is back: $l")
        }
      }
    } finally saved.fold(spark.conf.unset(graft.ops.DistRank.ThresholdConf))(
      spark.conf.set(graft.ops.DistRank.ThresholdConf, _))
    // and the default threshold picks the plain single-barrier window at
    // test scale — the cost model's other half
    val small = plan("q_win_rank")
    assert(!small.contains("percentile_approx"),
      s"cost model ignored the threshold (kernel engaged on tiny input):\n$small")
  }

  test("z-order buckets have tight envelopes in BOTH dimensions") {
    // the pruning evidence: under a z-ordered layout each curve bucket
    // spans ≤ 2^3 of EACH source column (the bucket pins the top 3 bits
    // of both); a 1-d sort would give tight envelopes in its leading
    // column but full-range envelopes in the other
    val rows = SparkEntry.queries("q_layout_zorder")(spark, sfDir)
      .selectExpr("size_max - size_min", "k64_max - k64_min")
      .collect()
    assert(rows.length > 4, "expected many z-buckets")
    rows.foreach { r =>
      assert(r.getInt(0) <= 7, s"p_size envelope ${r.getInt(0)} not tight")
      assert(r.getLong(1) <= 7L, s"key envelope ${r.getLong(1)} not tight")
    }
  }

  test("q_pipeline_incr_stored signs only the batch — one kernel pass, not two") {
    // the stored-signature variant's scale claim: corpus-side band keys
    // come from the persisted signature table, so the plan carries ONE
    // minhash_lanes-bearing projection site (the day's batch) where the
    // recomputing form carries TWO (batch + corpus). The kernel sits
    // inside the cached candidate subtree (invisible to node collect
    // through InMemoryRelation/AQE boundaries), so count plan-STRING
    // lines that are lanes-bearing Projects: each call site prints once
    // per cached-subtree reference, identically for both queries, so the
    // recomputing form must show exactly 2x the stored form's lines.
    def lanesProjLines(name: String): Int =
      plan(name).split("\n").count(l =>
        l.contains("Project") && l.contains("minhash_lanes"))
    val stored = lanesProjLines("q_pipeline_incr_stored")
    val recomputing = lanesProjLines("q_pipeline_incr")
    assert(stored > 0, "stored variant must sign the batch")
    assert(recomputing == 2 * stored,
      s"expected the recomputing form to carry exactly 2x the stored " +
        s"form's lanes projections (batch + corpus vs batch only); " +
        s"got stored=$stored recomputing=$recomputing")
  }

  test("q_store_spj: the co-partitioned store join plans no exchange below the SMJ") {
    val df = SparkEntry.queries("q_store_spj")(spark, sfDir)
    df.collect()
    val smj = allNodes(df.queryExecution.executedPlan).collect {
      case j: org.apache.spark.sql.execution.joins.SortMergeJoinExec => j }
    assert(smj.nonEmpty, s"no SortMergeJoin:\n${df.queryExecution.executedPlan}")
    val shuffles = allNodes(smj.head).collect {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeLike => e }
    assert(shuffles.isEmpty,
      s"storage-partitioned store join still shuffles:\n${smj.head}")
    // manifest-proven sortedness (SupportsReportOrdering on the re-checked
    // single-valued partition key) must also elide BOTH SortExecs — the
    // no-exchange join is a no-sort join
    val sorts = allNodes(smj.head).collect {
      case s: org.apache.spark.sql.execution.SortExec => s }
    assert(sorts.isEmpty,
      s"SPJ sides still sort despite reported ordering:\n${smj.head}")
  }

  test("q_store_spj_multi: the two-key co-partitioned join plans no exchange below the join") {
    val df = SparkEntry.queries("q_store_spj_multi")(spark, sfDir)
    df.collect()
    val joins = allNodes(df.queryExecution.executedPlan).collect {
      case j: org.apache.spark.sql.execution.joins.SortMergeJoinExec => j
      case j: org.apache.spark.sql.execution.joins.ShuffledHashJoinExec => j }
    assert(joins.nonEmpty,
      s"no shuffle-family join:\n${df.queryExecution.executedPlan}")
    val shuffles = allNodes(joins.head).collect {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeLike => e }
    assert(shuffles.isEmpty,
      s"two-key storage-partitioned join still shuffles:\n${joins.head}")
  }

  test("multi-key SPJ degradation: a join on only the leading key falls back to a shuffled plan") {
    // build the same two-column fixture, then join on pri alone — the
    // reported (pri, rgn) grouping does not satisfy a pri-only join
    // without Spark's subset-key opt-in, so both sides re-shuffle; a
    // degradation in exchanges, never in rows
    val s2 = spark.newSession()
    s2.conf.set("spark.sql.sources.v2.bucketing.enabled", "true")
    s2.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    import s2.implicits._
    import org.apache.spark.sql.functions._
    val root = graft.ops.Util.managedTempDir("graft_spjm_deg_")
    s2.conf.set("spark.sql.catalog.gsd", "graft.sources.GraftCatalog")
    s2.conf.set("spark.sql.catalog.gsd.root", root)
    s2.range(0, 400).select($"id", ($"id" % 5).as("pri"), ($"id" % 4).as("rgn"))
      .createOrReplaceTempView("deg_src")
    s2.sql("CREATE TABLE gsd.a PARTITIONED BY (pri, rgn) AS SELECT * FROM deg_src")
    s2.sql(
      """CREATE TABLE gsd.b PARTITIONED BY (pri, rgn) AS
        |SELECT pri, rgn, count(*) AS n FROM deg_src GROUP BY pri, rgn""".stripMargin)
    def rd(t: String) = s2.read.format("graft.sources.GraftStore")
      .option("path", s"$root/$t").load()
    val joined = rd("a").join(rd("b").groupBy($"pri").agg(sum($"n").as("n")), Seq("pri"))
      .groupBy($"pri").agg(count(lit(1)).as("c"), sum($"n").as("s"))
      .orderBy($"pri")
    val rows = joined.collect()
    assert(rows.length == 5 && rows.map(_.getLong(1)).sum == 400,
      "degraded join must still return exact rows")
    val joins = allNodes(joined.queryExecution.executedPlan).collect {
      case j: org.apache.spark.sql.execution.joins.SortMergeJoinExec => j
      case j: org.apache.spark.sql.execution.joins.ShuffledHashJoinExec => j }
    assert(joins.nonEmpty)
    val shuffles = allNodes(joins.head).collect {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeLike => e }
    assert(shuffles.nonEmpty,
      s"pri-only join over a (pri, rgn) grouping should shuffle (no subset-key opt-in):\n${joins.head}")
  }

  test("q_store_spj_bucket: the co-BUCKETED store join plans no exchange below the join") {
    val df = SparkEntry.queries("q_store_spj_bucket")(spark, sfDir)
    df.collect()
    val joins = allNodes(df.queryExecution.executedPlan).collect {
      case j: org.apache.spark.sql.execution.joins.SortMergeJoinExec => j
      case j: org.apache.spark.sql.execution.joins.ShuffledHashJoinExec => j }
    assert(joins.nonEmpty,
      s"no shuffle-family join:\n${df.queryExecution.executedPlan}")
    // the bucket transform resolved through the catalog's V2 function and
    // matched across sides by canonicalName: neither input re-shuffles
    val shuffles = allNodes(joins.head).collect {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeLike => e }
    assert(shuffles.isEmpty,
      s"co-bucketed store join still shuffles:\n${joins.head}")
  }

  test("q_sim_ivf_stored plans only the probed cells' files") {
    import org.apache.spark.sql.functions._
    // the two-phase probe turns cell selection into a literal IN that
    // the vector table's min==max-per-file stats answer at planning
    // time: the scan description must show files = |distinct probed
    // cells| of N, with the unprobed cells never planned
    val p = plan("q_sim_ivf_stored")
    val m = "graft_store\\([^)]*ivf_vec[^)]*, files=(\\d+)/(\\d+)\\)".r
      .findFirstMatchIn(p)
      .getOrElse(fail(s"no vector-table store scan in plan:\n$p"))
    val (planned, total) = (m.group(1).toInt, m.group(2).toInt)
    // recompute the expected probed-cell count the way the query does
    val e = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val nCells = e.select(col("label")).distinct().count().toInt
    assert(total == nCells, s"vector table should roll one file per cell")
    assert(planned <= total, s"planned $planned of $total")
    // the probe set is 10 vectors x nprobe=2 cells — at any fixture
    // scale with more cells than that coverage, files must drop
    if (nCells > 20)
      assert(planned < total,
        s"expected planning-time cell skipping: planned=$planned total=$total")
  }

  test("q_cbo_reorder: stats reorder the join chain (fact joins last, not first)") {
    val df = SparkEntry.queries("q_cbo_reorder")(spark, sfDir)
    val leaves = df.queryExecution.optimizedPlan.collectLeaves().map(_.toString)
    val li = leaves.indexWhere(_.contains("graft_cbo_lineitem"))
    assert(li >= 0, s"lineitem leaf missing:\n${leaves.mkString("\n")}")
    // query text joins lineitem FIRST; CBO must move it to the outermost
    // position so the selective customer⋈orders pair builds first
    assert(li == leaves.size - 1,
      s"CBO did not reorder: lineitem at leaf $li of ${leaves.size}:\n" +
        df.queryExecution.optimizedPlan)
  }

  test("q_sim_sparse (registry default, round 17): salt key reaches the hot join; bit-identical to the uncapped reference") {
    // since round 17 the registry DEFAULT is the capped builder — the
    // uncapped shape survives only as the unregistered reference this
    // bit-identity proof compares against
    val capped = SparkEntry.queries("q_sim_sparse")(spark, sfDir)
    val p = capped.queryExecution.executedPlan.toString
    // the block-cap is real only if the self-join's equi-keys include
    // the salt next to (top_tid, tid)
    assert(p.contains("salt"),
      s"salt key missing from the physical join:\n$p")
    val plain = graft.ops.LlmOpsExt.qSimSparseUncapped(spark, sfDir)
    assert(capped.collect().toSeq == plain.collect().toSeq,
      "salted triangular replication must preserve the exact pair set")
  }

  test("q_sim_sparse stored probe (round 19): no tokenize, no argmax window, " +
    "no corpus scan — only the staged postings table enters the plan") {
    import org.apache.spark.sql.catalyst.plans.logical.{Window => LWindow}
    for (q <- Seq("q_sim_sparse", "q_sim_sparse_incr")) {
      val df = SparkEntry.queries(q)(spark, sfDir)
      val opt = df.queryExecution.optimizedPlan
      // the whole point of the stored index: the build prefix (explode →
      // tf/df aggregation → dominant-term argmax window) must NOT appear
      // in the per-query plan
      assert(opt.collectFirst { case w: LWindow => w }.isEmpty,
        s"$q probe replans the argmax window:\n$opt")
      val leaves = opt.collectLeaves().map(_.toString)
      assert(!leaves.exists(_.contains("documents")),
        s"$q probe rescans the corpus:\n${leaves.mkString("\n")}")
      assert(leaves.forall(_.contains("graft_store(")),
        s"$q probe must read only staged store tables:\n${leaves.mkString("\n")}")
    }
  }

  test("sparse postings index: a block-targeted probe prunes whole files " +
    "via the bucket pseudo-stats") {
    import org.apache.spark.sql.functions.col
    val pPath = graft.ops.LlmOpsExt.sparseStagedIndex(spark, sfDir)
    val all = spark.read.format("graft.sources.GraftStore")
      .option("path", pPath).load()
    val block = all.select(col("top_tid")).head.getLong(0)
    val probe = all.filter(col("top_tid") === block)
    val planned = probe.queryExecution.executedPlan.toString
    val m = "files=(\\d+)/(\\d+)".r.findFirstMatchIn(planned)
    assert(m.isDefined, s"scan description missing file counts:\n$planned")
    val (read, total) = (m.get.group(1).toInt, m.get.group(2).toInt)
    assert(read < total && read >= 1,
      s"block probe must read a strict file subset, read $read of $total")
    // and the pruned scan still answers exactly
    assert(probe.count() ==
      all.collect().count(_.getAs[Long]("top_tid") == block))
  }

  test("q_sim_pairs (round 19): moment identity — no all-pairs self-join; " +
    "only the label-cardinality aggregate join remains") {
    import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Join}
    val df = SparkEntry.queries("q_sim_pairs")(spark, sfDir)
    val opt = df.queryExecution.optimizedPlan
    val joins = opt.collect { case j: Join => j }
    assert(joins.size == 1, s"expected exactly the final label join:\n$opt")
    // both join inputs must already be aggregated to label cardinality —
    // the pre-r19 quadratic shape joined two RAW embedding scans on label
    for (j <- joins; side <- Seq(j.left, j.right))
      assert(side.collectFirst { case a: Aggregate => a }.isDefined,
        s"join side is not an aggregate (all-pairs shape came back):\n$side")
  }

  test("q_store_cbo: manifest stats reorder the join chain, no ANALYZE") {
    val df = SparkEntry.queries("q_store_cbo")(spark, sfDir)
    val opt = df.queryExecution.optimizedPlan
    val leaves = opt.collectLeaves()
    // every store leaf must carry manifest-derived stats: exact row
    // count + attribute stats (the SupportsReportStatistics bridge)
    leaves.foreach { l =>
      assert(l.stats.rowCount.isDefined,
        s"store scan reports no row count: $l")
      assert(l.stats.attributeStats.nonEmpty,
        s"store scan reports no column stats: $l")
      assert(l.stats.attributeStats.exists(_._2.distinctCount.isDefined),
        s"no NDV estimate reached catalyst attributeStats: $l")
    }
    // query text joins lineitem FIRST; the cost model must move it to
    // the outermost position so the selective customer⋈orders pair
    // builds first — same contract as q_cbo_reorder, but the stats come
    // from manifest lines instead of a full-scan ANALYZE
    val strs = leaves.map(_.toString)
    val li = strs.indexWhere(s => s.contains("graft_cbostore_") && s.contains("lineitem"))
    assert(li >= 0, s"lineitem store leaf missing:\n${strs.mkString("\n")}")
    assert(li == strs.size - 1,
      s"CBO did not reorder: lineitem at leaf $li of ${strs.size}:\n$opt")
  }

  test("q_store_mv_join: store-store join served by the rollup; a commit on either side declines") {
    val df = SparkEntry.queries("q_store_mv_join")(spark, sfDir)
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("graft_smvj_") && p.contains("/mv"),
      s"store-store join should read the pre-joined rollup:\n$p")
    assert(!p.contains("graft_store("),
      s"substituted plan must scan NO store table:\n$p")
    // extract the two table paths from the MV path, append to the dim
    // side, and re-plan: the version fingerprint breaks -> decline
    val root = "graft_smvj_[0-9]+".r.findFirstIn(p)
      .map(m => s"${System.getProperty("java.io.tmpdir")}/$m")
      .getOrElse(fail(s"mv path not found in plan:\n$p"))
    import spark.implicits._
    Seq((-1L, "0-URGENT")).toDF("o_orderkey", "o_orderpriority")
      .write.format("graft.sources.GraftStore").option("path", s"$root/o")
      .mode("append").save()
    import graft.plans.RewriteAggToMv
    val s2 = spark.newSession()
    s2.experimental.extraOptimizations =
      s2.experimental.extraOptimizations :+ RewriteAggToMv
    def rd(pth: String) = s2.read.format("graft.sources.GraftStore")
      .option("path", pth).load()
    import org.apache.spark.sql.functions.{col, count, lit}
    val stale = rd(s"$root/l").join(rd(s"$root/o"),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderpriority")).agg(count(lit(1)).as("n"))
    assert(stale.queryExecution.executedPlan.toString.contains("graft_store("),
      "a committed append must break the version fingerprint and decline the rewrite")
    // the append above broke the SHARED memoized fixture's fingerprint —
    // drop the memo so later invocations rebuild a rewrite-eligible one
    graft.ops.Sources.invalidateStoreMvJoinFixture()
  }

  test("q_mv_rewrite substitutes the MV scan for the fact scan") {
    val df = SparkEntry.queries("q_mv_rewrite")(spark, sfDir)
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("graft_mv_"),
      s"physical plan does not read the materialized view:\n$p")
    assert(!p.contains("lineitem.parquet"),
      s"physical plan still scans the fact table (rewrite did not fire):\n$p")
  }

  test("q_mv_filter: a grain-column filter replays against the MV rollup") {
    val df = SparkEntry.queries("q_mv_filter")(spark, sfDir)
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("graft_mv_"),
      s"physical plan does not read the materialized view:\n$p")
    assert(!p.contains("lineitem.parquet"),
      s"physical plan still scans the fact table (filtered rewrite did not fire):\n$p")
    // and a NON-grain filter must decline (the predicate needs fact
    // rows) — on a session that HAS the rule, so the decline is real
    import graft.plans.RewriteAggToMv
    if (!spark.experimental.extraOptimizations.contains(RewriteAggToMv))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ RewriteAggToMv
    val q = graft.ops.Util.table(spark, sfDir, "lineitem")
      .filter(col("l_quantity") > 10)
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n"))
    val p2 = q.queryExecution.executedPlan.toString
    assert(p2.contains("lineitem.parquet"),
      s"non-grain filter must compute from source:\n$p2")
  }

  test("q_mv_incr: the incrementally maintained MV serves the grown fact table") {
    val df = SparkEntry.queries("q_mv_incr")(spark, sfDir)
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("mv_v2"),
      s"physical plan does not read the maintained MV:\n$p")
    assert(!p.contains("/fact"),
      s"physical plan still scans the fact table after maintenance:\n$p")
  }

  test("q_store_mv: snapshot-fresh MV serves the store table, not the store scan") {
    val df = SparkEntry.queries("q_store_mv")(spark, sfDir)
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("mv_v2"),
      s"physical plan does not read the CDF-maintained MV:\n$p")
    assert(!p.contains("graft_store("),
      s"physical plan still scans the store table:\n$p")
  }

  test("store MV: version-pinned reads are never served a current-version rollup") {
    import graft.plans.{MvCatalog, RewriteAggToMv}
    if (!spark.experimental.extraOptimizations.contains(RewriteAggToMv))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ RewriteAggToMv
    val root = graft.ops.Util.managedTempDir("graft_smvspec_")
    val t = s"$root/t"
    graft.ops.Util.table(spark, sfDir, "nation")
      .write.format("graft.sources.GraftStore").option("path", t)
      .mode("overwrite").save()
    def rollup(df: org.apache.spark.sql.DataFrame) = df
      .groupBy(col("n_regionkey")).agg(count(lit(1)).as("cnt"))
    rollup(spark.read.format("graft.sources.GraftStore").option("path", t).load())
      .write.parquet(s"$root/mv_v1")
    val key = s"graftstore:$t"
    MvCatalog.register(key, MvCatalog.MvDef(s"$root/mv_v1",
      s"v${graft.sources.GraftStore.readVersion(t)}",
      Set("n_regionkey"), Map("cnt" -> "cnt")))
    try {
      // current read: substituted
      val cur = rollup(spark.read.format("graft.sources.GraftStore")
        .option("path", t).load())
      assert(cur.queryExecution.executedPlan.toString.contains("mv_v1"),
        "current-version read should be served by the MV")
      // pinned read: MUST scan the store even though the version matches
      val pinned = rollup(spark.read.format("graft.sources.GraftStore")
        .option("path", t)
        .option("versionAsOf", graft.sources.GraftStore.readVersion(t).toString)
        .load())
      val pp = pinned.queryExecution.executedPlan.toString
      assert(pp.contains("graft_store(") && !pp.contains("mv_v1"),
        s"version-pinned read must not be MV-substituted:\n$pp")
    } finally MvCatalog.deregister(key)
  }

  test("MV rewrite declines on fingerprint mismatch (stale view never serves)") {
    import graft.plans.{MvCatalog, RewriteAggToMv}
    import org.apache.spark.sql.execution.datasources.LogicalRelation
    if (!spark.experimental.extraOptimizations.contains(RewriteAggToMv))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ RewriteAggToMv
    val src = graft.ops.Util.table(spark, sfDir, "nation")
    val lr = src.queryExecution.analyzed.collectFirst { case l: LogicalRelation => l }.get
    val key = MvCatalog.sourceKey(lr).get
    // a well-formed MV whose fingerprint does NOT match the live file set
    MvCatalog.register(key, MvCatalog.MvDef(
      mvPath = "/nonexistent/should/never/be/read",
      fingerprint = "stale0000",
      groupCols = Set("n_regionkey"),
      measures = Map("cnt" -> "cnt")))
    try {
      val q = src.groupBy(col("n_regionkey")).agg(count(lit(1)).as("cnt"))
      val p = q.queryExecution.executedPlan.toString
      assert(p.contains("nation.parquet"),
        s"stale-MV query must fall back to the source scan:\n$p")
      assert(q.collect().map(_.getLong(1)).sum == 25L)
    } finally MvCatalog.deregister(key)
  }

  test("DISTINCT at MV grain is served by the rollup's group rows") {
    SparkEntry.queries("q_mv_rewrite")(spark, sfDir).collect() // registers MV
    // the query builders inject the rule only on their own clones; this
    // spec session opts in explicitly
    import graft.plans.RewriteAggToMv
    if (!spark.experimental.extraOptimizations.contains(RewriteAggToMv))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ RewriteAggToMv
    // SELECT DISTINCT grain-cols optimizes to an Aggregate whose result
    // expressions are all bare grouping attributes — the rewrite serves it
    // from the MV's (already-distinct) group rows with no aggregation work
    val q = graft.ops.Util.table(spark, sfDir, "lineitem")
      .select(col("l_returnflag"), col("l_linestatus")).distinct()
      .orderBy(col("l_returnflag"), col("l_linestatus"))
    val p = q.queryExecution.executedPlan.toString
    assert(p.contains("graft_mv_"), s"DISTINCT not MV-substituted:\n$p")
    val expected = graft.ops.Util.table(spark.newSession(), sfDir, "lineitem")
      .select(col("l_returnflag"), col("l_linestatus")).distinct()
      .orderBy(col("l_returnflag"), col("l_linestatus")).collect().toSeq
    assert(q.collect().toSeq == expected)
  }

  test("MV min/max derivation: substituted plan agrees with rule-free computation") {
    SparkEntry.queries("q_mv_rewrite")(spark, sfDir).collect() // registers MV
    import graft.plans.RewriteAggToMv
    if (!spark.experimental.extraOptimizations.contains(RewriteAggToMv))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ RewriteAggToMv
    def q(s: org.apache.spark.sql.SparkSession) =
      graft.ops.Util.table(s, sfDir, "lineitem")
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(org.apache.spark.sql.functions.min(col("l_quantity")).as("mn"),
          org.apache.spark.sql.functions.max(col("l_quantity")).as("mx"),
          count(lit(1)).as("n"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    val withMv = q(spark)
    assert(withMv.queryExecution.executedPlan.toString.contains("graft_mv_"),
      "min/max query should be MV-substituted")
    // a fresh session has no injected rule: ground truth from source
    val expected = q(spark.newSession()).collect().toSeq
    assert(withMv.collect().toSeq == expected,
      "MV-derived min/max/count must equal the from-source computation")
  }

  test("MV rewrite declines on unsupported aggregates (avg/distinct compute from source)") {
    // registers the lineitem MV; the rule goes on THIS session so the
    // decline is meaningful (not just rule-absent) — an avg is not
    // derivable from the stored measures and must compute from source
    SparkEntry.queries("q_mv_rewrite")(spark, sfDir).collect()
    import graft.plans.RewriteAggToMv
    if (!spark.experimental.extraOptimizations.contains(RewriteAggToMv))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ RewriteAggToMv
    val q = graft.ops.Util.table(spark, sfDir, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(avg(col("l_discount")).as("a"))
    val p = q.queryExecution.executedPlan.toString
    assert(p.contains("lineitem.parquet"),
      s"avg is not MV-derivable; plan must scan the source:\n$p")
  }

  test("sparse-sim family: no unpartitioned window anywhere in the plan (dictionary ids are hashed, not globally sorted)") {
    // a row_number() over Window.orderBy(term) is a single-task sort of
    // the whole term dictionary — invisible at sf0.1, a one-core stage
    // over a billions-of-terms corpus vocabulary. The ids are xxhash64
    // now; this pin keeps the shape from regressing. The traversal
    // recurses through InMemoryRelation so a cached subtree can't hide
    // the window.
    import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, Window => LWindow}
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.columnar.{InMemoryRelation, InMemoryTableScanExec}
    import org.apache.spark.sql.execution.window.WindowExec
    def physBad(p: SparkPlan): Seq[String] = p.collect {
      case w: WindowExec if w.partitionSpec.isEmpty => Seq(w.nodeName)
      case s: InMemoryTableScanExec => physBad(s.relation.cachedPlan)
    }.flatten
    def logBad(lp: LogicalPlan): Seq[String] = lp.collect {
      case w: LWindow if w.partitionSpec.isEmpty => Seq(w.nodeName)
      case r: org.apache.spark.sql.execution.datasources.LogicalRelation => Seq.empty
    }.flatten ++ lp.collect {
      case r: InMemoryRelation => physBad(r.cachedPlan)
    }.flatten
    for (q <- Seq("q_sim_sparse", "q_sim_sparse_capped")) {
      val df = SparkEntry.queries(q)(spark, sfDir)
      val bad = logBad(df.queryExecution.optimizedPlan) ++
        physBad(df.queryExecution.executedPlan)
      assert(bad.isEmpty, s"$q plans unpartitioned window(s): $bad")
    }
  }

  // ---- TPC-H completion (round 17): decorrelation + join-shape pins ----

  /** Correlated subqueries surviving optimization would mean per-row
    * subquery execution at runtime — the one thing the decorrelation
    * framework must never let through. Collect any SubqueryExpression
    * with outer attributes anywhere in the optimized tree (including
    * nested subquery plans). */
  private def correlatedLeft(name: String): Seq[String] = {
    import org.apache.spark.sql.catalyst.expressions.SubqueryExpression
    val opt = SparkEntry.queries(name)(spark, sfDir).queryExecution.optimizedPlan
    opt.collect { case node =>
      node.expressions.flatMap(_.collect {
        case s: SubqueryExpression if s.isCorrelated => s.getClass.getSimpleName
      })
    }.flatten
  }

  test("TPC-H correlated scalar aggregates decorrelate (Q2/Q17/Q20/Q22 — no per-row subquery execution)") {
    for (q <- Seq("q_sql_q2", "q_sql_q17", "q_sql_q20", "q_sql_q22")) {
      val left = correlatedLeft(q)
      assert(left.isEmpty, s"$q kept correlated subqueries after optimization: $left")
      val p = SparkEntry.queries(q)(spark, sfDir).queryExecution.executedPlan.toString
      assert(!p.contains("CartesianProduct"), s"$q planned a cartesian:\n$p")
    }
  }

  test("TPC-H Q21 plans the EXISTS as a semi join and the NOT EXISTS as an anti join") {
    val left = correlatedLeft("q_sql_q21")
    assert(left.isEmpty, s"q_sql_q21 kept correlated subqueries: $left")
    val p = SparkEntry.queries("q_sql_q21")(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(p.contains("LeftSemi"), s"no semi join in Q21 plan:\n$p")
    assert(p.contains("LeftAnti"), s"no anti join in Q21 plan:\n$p")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoop"),
      s"Q21 degenerated to a quadratic join:\n$p")
  }

  test("TPC-H Q4's EXISTS with a non-equality outer predicate stays a semi join") {
    val p = SparkEntry.queries("q_sql_q4")(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(p.contains("LeftSemi"), s"no semi join in Q4 plan:\n$p")
    assert(!p.contains("CartesianProduct"), s"Q4 planned a cartesian:\n$p")
  }

  test("TPC-H Q11/Q15's uncorrelated scalar thresholds run once (subquery reuse, no join blowup)") {
    for (q <- Seq("q_sql_q11", "q_sql_q15")) {
      val p = SparkEntry.queries(q)(spark, sfDir).queryExecution.executedPlan.toString
      assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoop"),
        s"$q degenerated to a quadratic join:\n$p")
    }
  }

  test("TPC-H Q11 derives the doubly-referenced partsupp aggregate exactly once") {
    import org.apache.spark.sql.execution.columnar.InMemoryTableScanExec
    val df = SparkEntry.queries("q_sql_q11")(spark, sfDir)
    df.collect()
    val plan = df.queryExecution.executedPlan
    // both partsupp references (outer aggregate + HAVING's global-total
    // scalar subquery) must read the ONE persisted derivation — zero
    // direct lineitem scans anywhere in the executed plan or its
    // subqueries (the cached relation's own lineitem scan lives inside
    // the InMemoryRelation, not in this plan)
    val nodes = plan.subqueries.flatMap(allNodes) ++ allNodes(plan)
    val lineitemScans = nodes.filter {
      case s: org.apache.spark.sql.execution.FileSourceScanExec =>
        s.toString.contains("lineitem")
      case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec =>
        b.toString.contains("lineitem")
      case _ => false
    }
    assert(lineitemScans.isEmpty,
      s"Q11 still derives partsupp from a direct lineitem scan:\n$plan")
    val imts = nodes.collect { case i: InMemoryTableScanExec => i }
    assert(imts.nonEmpty,
      s"Q11's partsupp references are not served from the cache:\n$plan")
    assert(imts.map(_.relation.cacheBuilder.cachedName).distinct.size == 1,
      "Q11's two partsupp references must share one cached relation")
  }
}
