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

  test("join MV declines an IsNotNull filter on a NON-key column that " +
      "shares its name with the other side's join key") {
    import graft.plans.{MvCatalog, RewriteAggToMv}
    import org.apache.spark.sql.execution.datasources.LogicalRelation
    // The trap (round-10 verdict #1): fact ⋈ dim on fact.k = dim.fk,
    // where dim ALSO carries a non-key nullable column NAMED `k`. A
    // below-join filter `dim.k IS NOT NULL` excludes real rows; a
    // name-pooled admissibility check (old code: one Set of both sides'
    // key NAMES) wrongly admits it because "k" is the left join key's
    // name — the pre-joined rollup then serves rows the query filtered
    // out. Per-side exprId matching must DECLINE.
    val base = graft.ops.Util.managedTempDir("graft_mv_trap_")
    val s = spark
    import s.implicits._
    // dim rows 10 and 11 have a NULL non-key `k`; their fact matches
    // (2 rows each) are excluded by the trap filter
    Seq((1L, "a", 5.0), (1L, "a", 6.0), (2L, "b", 7.0), (2L, "b", 8.0),
      (3L, "a", 9.0), (3L, "b", 1.0))
      .toDF("k", "side", "q").write.parquet(s"$base/fact")
    Seq((1L, Option("x1"), "g1"), (2L, Option.empty[String], "g1"),
      (3L, Option.empty[String], "g2"))
      .toDF("fk", "k", "g").write.parquet(s"$base/dim")
    val fact = spark.read.parquet(s"$base/fact")
    val dim = spark.read.parquet(s"$base/dim")
    def leafOf(df: org.apache.spark.sql.DataFrame) =
      df.queryExecution.analyzed.collectFirst { case l: LogicalRelation => l }.get
    val (fLr, dLr) = (leafOf(fact), leafOf(dim))
    val (fKey, dKey) = (MvCatalog.sourceKey(fLr).get, MvCatalog.sourceKey(dLr).get)
    val (fFp, dFp) = (MvCatalog.fingerprint(fLr).get, MvCatalog.fingerprint(dLr).get)
    val mvPath = s"$base/mv_fact_dim"
    fact.join(dim, fact("k") === dim("fk")).groupBy($"g")
      .agg(count(lit(1)).as("cnt")).write.parquet(mvPath)
    val (fpA, fpB) = if (fKey <= dKey) (fFp, dFp) else (dFp, fFp)
    MvCatalog.registerJoin(
      MvCatalog.joinKey(fKey, dKey, Seq("k" -> "fk")),
      MvCatalog.JoinMvDef(mvPath, fpA, fpB, groupCols = Set("g"),
        measures = Map("cnt" -> "cnt"), rows = 2L))
    val s2 = spark.newSession()
    s2.experimental.extraOptimizations =
      s2.experimental.extraOptimizations :+ RewriteAggToMv
    def tables(sx: SparkSession) =
      (sx.read.parquet(s"$base/fact"), sx.read.parquet(s"$base/dim"))
    // positive control: the unfiltered join substitutes (only the
    // optimizer-inferred IsNotNull(join key) conjuncts sit below it)
    val (f1, d1) = tables(s2)
    val clean = f1.join(d1, f1("k") === d1("fk")).groupBy($"g")
      .agg(count(lit(1)).as("n"))
    assert(clean.queryExecution.executedPlan.toString.contains("mv_fact_dim"),
      "control: the clean join must be served by the rollup")
    assert(clean.orderBy($"g").collect().map(r => (r.getString(0), r.getLong(1))).toSeq
      == Seq(("g1", 4L), ("g2", 2L)))
    // the trap: IsNotNull on dim's NON-key `k` below the join — by name
    // it collides with fact's join key; by exprId it is not a key
    def trap(sx: SparkSession) = {
      val (f, d) = tables(sx)
      val dF = d.filter(d("k").isNotNull)
      f.join(dF, f("k") === dF("fk")).groupBy(col("g"))
        .agg(count(lit(1)).as("n")).orderBy(col("g"))
    }
    val trapped = trap(s2)
    assert(!trapped.queryExecution.executedPlan.toString.contains("mv_fact_dim"),
      "a below-join filter on a non-key column must DECLINE the join MV " +
        "even when its name collides with the other side's join key")
    val expected = trap(spark).collect().toSeq
    assert(trapped.collect().toSeq == expected &&
      expected.map(r => (r.getString(0), r.getLong(1))) == Seq(("g1", 2L)),
      "trap query must compute from source (g1 keeps only fk=1's two rows)")
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
