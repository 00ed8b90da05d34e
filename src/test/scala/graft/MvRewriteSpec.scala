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
    "sum_qty" -> graft.ops.Util.dsumd(col("l_quantity")),
    "sum_price" -> graft.ops.Util.dsumd(col("l_extendedprice")),
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

  test("global (no-grain) aggregate is also served and agrees") {
    val s2 = mvSession
    def q(s: SparkSession) = lineitem(s)
      .agg(graft.ops.Util.dsumd(col("l_quantity")).as("sum_qty"),
        count(lit(1)).as("n"))
    val withMv = q(s2)
    assert(withMv.queryExecution.executedPlan.toString.contains("graft_mv_"),
      "global rollup should be MV-servable (empty grouping set ⊆ grain)")
    assert(withMv.collect().toSeq == q(spark).collect().toSeq)
  }
}
