package graft

import org.apache.spark.sql.functions._

/** Bucketed co-located join — the 100 TB pattern for repeated fact-fact
  * joins: write both sides bucketed by the join key so the join needs NO
  * exchange at read time. Asserted on the physical plan and on result
  * equality with the shuffled join. */
class BucketingSpec extends SparkSuite {

  test("join of tables bucketed on the key plans without a shuffle") {
    import spark.implicits._
    // default warehouse (./spark-warehouse, gitignored) — warehouse.dir is
    // a static conf and cannot be set on the shared test session
    Seq("li_b", "o_b").foreach { t =>
      spark.sql(s"DROP TABLE IF EXISTS $t")
      val loc = new java.io.File(s"spark-warehouse/$t")
      if (loc.exists()) {
        def rm(f: java.io.File): Unit = {
          Option(f.listFiles()).foreach(_.foreach(rm)); f.delete()
        }
        rm(loc)
      }
    }
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .select($"l_orderkey", $"l_quantity")
    val o = spark.read.parquet(s"$sfDir/orders.parquet")
      .select($"o_orderkey", $"o_orderpriority")
    li.write.mode("overwrite").bucketBy(8, "l_orderkey")
      .sortBy("l_orderkey").saveAsTable("li_b")
    o.write.mode("overwrite").bucketBy(8, "o_orderkey")
      .sortBy("o_orderkey").saveAsTable("o_b")

    // hint forces SMJ (AQE would broadcast at this tiny scale, which
    // ignores bucketing; at real scale SMJ is what the planner picks)
    val joined = spark.table("li_b").hint("merge")
      .join(spark.table("o_b"), $"l_orderkey" === $"o_orderkey")
      .groupBy($"o_orderpriority").agg(count(lit(1)).as("n"))
    joined.collect()
    val plan = joined.queryExecution.executedPlan.toString

    // the join must consume the bucketed scans directly — no exchange
    // between the scans and the join (the post-agg exchange is fine).
    // Inspect only the Final Plan section (AQE echoes the initial plan too).
    val finalPlan = plan.split("== Initial Plan ==").head
    val joinIdx = finalPlan.indexOf("SortMergeJoin")
    assert(joinIdx >= 0, s"expected SMJ over bucketed tables:\n$plan")
    val joinSubtree = finalPlan.substring(joinIdx)
    assert(joinSubtree.contains("Bucketed: true"), s"scans not bucketed:\n$plan")
    assert(!joinSubtree.contains("Exchange hashpartitioning"),
      s"bucketed join still shuffles:\n$plan")

    // result equality with the plain shuffled join
    val expect = li.join(o, $"l_orderkey" === $"o_orderkey")
      .groupBy($"o_orderpriority").agg(count(lit(1)).as("n"))
    assert(joined.except(expect).count() == 0 &&
      expect.except(joined).count() == 0)
  }
}
