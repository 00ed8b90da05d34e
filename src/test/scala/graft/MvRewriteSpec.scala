package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.plans.RewriteAggToMv

/** Equivalence battery for the materialized-view rewrite: every
  * grain × measure combination the rule claims to serve must produce
  * byte-identical results on a rule-injected session and a rule-free
  * one. This is the property the per-query oracles can't cover — they
  * pin ONE query shape each; the rule matches a family. */
class MvRewriteSpec extends SparkSuite {

  private lazy val mvSession: SparkSession = {
    // q_mv_rewrite registers the lineitem MV (sum/cnt/min/max measures at
    // (l_returnflag, l_linestatus) grain) in the JVM-wide catalog
    SparkEntry.queries("q_mv_rewrite")(spark, sfDir).collect()
    val s = spark.newSession()
    s.experimental.extraOptimizations =
      s.experimental.extraOptimizations :+ RewriteAggToMv
    s
  }

  private def lineitem(s: SparkSession) =
    graft.ops.Util.table(s, sfDir, "lineitem")

  // the supported measure vocabulary, as column builders
  private val measures: Seq[(String, org.apache.spark.sql.Column)] = Seq(
    "sum_qty" -> graft.ops.Util.dsum(col("l_quantity")),
    "sum_price" -> graft.ops.Util.dsum(col("l_extendedprice")),
    "n" -> count(lit(1)),
    "mn" -> min(col("l_quantity")),
    "mx" -> max(col("l_quantity")))

  private val grains: Seq[Seq[String]] = Seq(
    Seq("l_returnflag"), Seq("l_linestatus"),
    Seq("l_returnflag", "l_linestatus"))

  test("every grain × measure-set combination agrees with the rule-free plan") {
    val s2 = mvSession
    var substituted = 0
    for {
      grain <- grains
      k <- 1 to measures.size
      ms = measures.take(k)
    } {
      def q(s: SparkSession) = lineitem(s)
        .groupBy(grain.map(col): _*)
        .agg(ms.head._2.as(ms.head._1),
          ms.tail.map { case (n, c) => c.as(n) }: _*)
        .orderBy(grain.map(col): _*)
      val withMv = q(s2)
      if (withMv.queryExecution.executedPlan.toString.contains("graft_mv_"))
        substituted += 1
      assert(withMv.collect().toSeq == q(spark).collect().toSeq,
        s"grain=$grain measures=${ms.map(_._1)} diverged under MV rewrite")
    }
    // the battery is only meaningful if the rule actually fired
    assert(substituted == grains.size * measures.size,
      s"only $substituted of ${grains.size * measures.size} combinations were MV-substituted")
  }

  test("multi-MV cost selection: coarse query reads the 6-row MV, fine query the finer one") {
    // q_mv_choose registers the FINE (l_returnflag, l_linestatus,
    // l_linenumber) MV next to the coarse one on the same source key
    SparkEntry.queries("q_mv_choose")(spark, sfDir).collect()
    val s2 = mvSession
    // coarse grain: BOTH MVs serve; the rule must pick the fewest-rows
    // candidate — the original coarse rollup, not the finer one
    val coarse = lineitem(s2).groupBy(col("l_returnflag"))
      .agg(graft.ops.Util.dsum(col("l_quantity")).as("sum_qty"))
    val coarsePlan = coarse.queryExecution.executedPlan.toString
    assert(coarsePlan.contains("lineitem_by_flag_status") &&
      !coarsePlan.contains("lineitem_by_flag_status_line"),
      s"coarse query should read the COARSE (cheapest) MV:\n$coarsePlan")
    // fine grain: only the finer MV's grain covers l_linenumber
    val fine = lineitem(s2).groupBy(col("l_returnflag"), col("l_linenumber"))
      .agg(count(lit(1)).as("n"))
    val finePlan = fine.queryExecution.executedPlan.toString
    assert(finePlan.contains("lineitem_by_flag_status_line"),
      s"fine query should be served by the finer MV:\n$finePlan")
    // and both agree with the rule-free session
    assert(coarse.collect().toSeq ==
      lineitem(spark).groupBy(col("l_returnflag"))
        .agg(graft.ops.Util.dsum(col("l_quantity")).as("sum_qty"))
        .collect().toSeq)
    assert(fine.orderBy(col("l_returnflag"), col("l_linenumber")).collect().toSeq ==
      lineitem(spark).groupBy(col("l_returnflag"), col("l_linenumber"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("l_returnflag"), col("l_linenumber")).collect().toSeq)
  }

  test("join-aware MV: same join tree substitutes, different join keys decline") {
    // q_mv_join registers the lineitem⋈orders rollup and returns from a
    // rule-injected clone; re-run the shape here on our own clone
    SparkEntry.queries("q_mv_join")(spark, sfDir).collect()
    val s2 = mvSession
    def orders(s: SparkSession) = graft.ops.Util.table(s, sfDir, "orders")
    val li = lineitem(s2); val or = orders(s2)
    val q = li.join(or, li("l_orderkey") === or("o_orderkey"))
      .groupBy(col("o_orderpriority"))
      .agg(graft.ops.Util.dsum(col("l_quantity")).as("sum_qty"))
    val p = q.queryExecution.executedPlan.toString
    assert(p.contains("lineitem_orders_by_pri_flag"),
      s"join query should read the pre-joined rollup:\n$p")
    assert(!p.contains("lineitem.parquet") && !p.contains("orders.parquet"),
      s"join query still scans a source table:\n$p")
    // flipped orientation (orders ⋈ lineitem) must ALSO substitute —
    // the key is orientation-normalized
    val li2 = lineitem(s2); val or2 = orders(s2)
    val flipped = or2.join(li2, li2("l_orderkey") === or2("o_orderkey"))
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n"))
    assert(flipped.queryExecution.executedPlan.toString
        .contains("lineitem_orders_by_pri_flag"),
      "orientation-flipped join should hit the same MV")
    // a DIFFERENT join key (theta on partkey) must decline
    val li3 = lineitem(s2); val or3 = orders(s2)
    val other = li3.join(or3, li3("l_partkey") === or3("o_orderkey"))
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n"))
    assert(!other.queryExecution.executedPlan.toString
        .contains("lineitem_orders_by_pri_flag"),
      "a different join key must never be served the rollup")
    // and the substituted result agrees with the rule-free plan
    val liF = lineitem(spark); val orF = orders(spark)
    assert(q.orderBy(col("o_orderpriority")).collect().toSeq ==
      liF.join(orF, liF("l_orderkey") === orF("o_orderkey"))
        .groupBy(col("o_orderpriority"))
        .agg(graft.ops.Util.dsum(col("l_quantity")).as("sum_qty"))
        .orderBy(col("o_orderpriority")).collect().toSeq)
  }

  test("a cheaper-but-STALE MV never wins cost selection") {
    import graft.plans.MvCatalog
    // register a 1-row decoy on the same source key with a bogus
    // fingerprint: freshness must filter BEFORE cost ranks, so the
    // decoy is invisible no matter how cheap it claims to be
    SparkEntry.queries("q_mv_rewrite")(spark, sfDir).collect()
    val lr = lineitem(spark).queryExecution.analyzed.collectFirst {
      case l: org.apache.spark.sql.execution.datasources.LogicalRelation => l
    }.get
    val key = MvCatalog.sourceKey(lr).get
    MvCatalog.register(key, MvCatalog.MvDef("/tmp/graft_mv_decoy/never_built",
      fingerprint = "stale-decoy", groupCols = Set("l_returnflag", "l_linestatus"),
      measures = Map("cnt" -> "cnt"), rows = 1L))
    try {
      val s2 = mvSession
      val q = lineitem(s2).groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("n"))
      val p = q.queryExecution.executedPlan.toString
      assert(!p.contains("graft_mv_decoy"),
        s"stale decoy must never be substituted:\n$p")
      assert(p.contains("graft_mv_"),
        s"the FRESH MV should still serve the query:\n$p")
      assert(q.orderBy(col("l_returnflag")).collect().toSeq ==
        lineitem(spark).groupBy(col("l_returnflag"))
          .agg(count(lit(1)).as("n")).orderBy(col("l_returnflag"))
          .collect().toSeq)
    } finally {
      // re-register only the real MVs (deregister drops the whole key)
      MvCatalog.deregister(key)
      SparkEntry.queries("q_mv_rewrite")(spark, sfDir).collect()
    }
  }

  test("global (no-grain) aggregate is also served and agrees") {
    val s2 = mvSession
    def q(s: SparkSession) = lineitem(s)
      .agg(graft.ops.Util.dsum(col("l_quantity")).as("sum_qty"),
        count(lit(1)).as("n"))
    val withMv = q(s2)
    assert(withMv.queryExecution.executedPlan.toString.contains("graft_mv_"),
      "global rollup should be MV-servable (empty grouping set ⊆ grain)")
    assert(withMv.collect().toSeq == q(spark).collect().toSeq)
  }
}
