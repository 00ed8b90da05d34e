package graft

import org.apache.spark.sql.functions._

/** HLL error bound (replaces the impossible sketch hash-match, SURVEY
  * §5.3(4)) + custom-expression equivalence. */
class ExtensionsSpec extends SparkSuite {

  test("approx_count_distinct within 3×rsd of exact") {
    import spark.implicits._
    val rows = SparkEntry.queries("q_agg_hll")(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val exactByFlag = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .groupBy($"l_returnflag").agg(countDistinct($"l_partkey").as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1).toDouble).toMap
    rows.foreach { r =>
      val approx = r.getAs[Long]("approx_parts").toDouble
      val exact = exactByFlag(r.getString(0))
      assert(math.abs(approx - exact) / exact <= 3 * 0.02,
        s"HLL error too large: approx=$approx exact=$exact")
    }
  }

  test("approx_percentile within 1% of exact") {
    import spark.implicits._
    val rows = SparkEntry.queries("q_agg_approxq")(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val exactByPrio = spark.read.parquet(s"$sfDir/orders.parquet")
      .groupBy($"o_orderpriority")
      .agg(expr("percentile(o_totalprice, 0.5)").as("ex"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    rows.foreach { r =>
      val ap = r.getAs[Double]("ap50"); val ex = exactByPrio(r.getString(0))
      // GK sketch returns a sample order statistic while percentile()
      // interpolates — at sf0.001 group sizes (~300) adjacent statistics
      // can sit ~2% apart, so bound at 5%
      assert(math.abs(ap - ex) / ex <= 0.05,
        s"approx_percentile error too large: approx=$ap exact=$ex")
    }
  }

  test("UDF, RuntimeReplaceable and codegen expression all agree") {
    import spark.implicits._
    val udfRes = SparkEntry.queries("q_udf_scalar")(spark, sfDir)
      .withColumnRenamed("nd", "nd_udf")
    val exprRes = SparkEntry.queries("q_expr_custom")(spark, sfDir)
    val j = udfRes.join(exprRes, "p_partkey")
    assert(j.filter($"nd" =!= $"nd_cg").count() == 0)
    assert(j.filter(abs($"nd" - $"nd_udf") > 1e-12).count() == 0)
  }

  test("typed weighted-avg aggregator matches the SQL formula") {
    import spark.implicits._
    val got = SparkEntry.queries("q_agg_typed")(spark, sfDir)
    val exp = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .groupBy($"l_returnflag")
      .agg((sum($"l_extendedprice".cast("decimal(18,4)") *
        $"l_discount".cast("decimal(18,4)")).cast("double") /
        sum($"l_discount".cast("decimal(18,4)")).cast("double")).as("expect"))
    val bad = got.join(exp, "l_returnflag")
      .filter(abs($"wavg_price" - $"expect") > 1e-6).count()
    assert(bad == 0)
  }
}
