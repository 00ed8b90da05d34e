package graft.ops

import org.apache.spark.sql.catalyst.expressions.{Add, BinaryExpression, Divide, Expression, Subtract}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.catalyst.expressions.RuntimeReplaceable
import org.apache.spark.sql.expressions.{Aggregator, Window}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DataType, DoubleType}
import org.apache.spark.sql.{Encoder, Encoders}
import Util._

/** Normalized difference (a-b)/(a+b) — the GEE band-math (NDSI) analog —
  * as a RuntimeReplaceable Catalyst expression: the optimizer rewrites it
  * to built-in arithmetic pre-execution, inheriting codegen for free. */
case class NormDiff(left: Expression, right: Expression)
    extends RuntimeReplaceable with BinaryLike[Expression] {
  override lazy val replacement: Expression =
    Divide(Subtract(left, right), Add(left, right))
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(newLeft, newRight)
}

/** Same semantics as a hand-codegen'd BinaryExpression — stays inside
  * whole-stage codegen via doGenCode instead of relying on the rewrite. */
case class NormDiffCodegen(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[Double]; val y = b.asInstanceOf[Double]
    (x - y) / (x + y)
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"(($a - $b) / ($a + $b))")
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(newLeft, newRight)
}

/** Typed discount-weighted average price. BigDecimal accumulation keeps the
  * merge order-independent (exact arithmetic), so the distributed partial
  * aggregation is deterministic; the final division happens in double. */
case class WAvgBuf(num: BigDecimal, den: BigDecimal)

object WeightedAvg extends Aggregator[(BigDecimal, BigDecimal), WAvgBuf, Double] {
  // Inputs arrive as decimal(38,18) with true scale 4, so the product's true
  // scale is 8 and setScale(18) is exact — the buffer never rounds.
  override def zero: WAvgBuf = WAvgBuf(BigDecimal(0), BigDecimal(0))
  override def reduce(b: WAvgBuf, in: (BigDecimal, BigDecimal)): WAvgBuf =
    WAvgBuf(b.num + (in._1 * in._2).setScale(18, BigDecimal.RoundingMode.HALF_UP),
      b.den + in._2)
  override def merge(x: WAvgBuf, y: WAvgBuf): WAvgBuf =
    WAvgBuf(x.num + y.num, x.den + y.den)
  override def finish(b: WAvgBuf): Double =
    if (b.den == BigDecimal(0)) 0.0 else b.num.toDouble / b.den.toDouble
  override def bufferEncoder: Encoder[WAvgBuf] = Encoders.product[WAvgBuf]
  override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
}

/** SURVEY.md §2.11 + §2.3 as-of — the extension surface: UDF, custom
  * Catalyst expressions, typed UDAF, UDTF composition, as-of join, HLL. */
object Extensions {

  /** Scalar Scala UDF: normalized difference. Documented caveat: a UDF is
    * opaque to Catalyst (no pushdown through it, breaks codegen) — compare
    * q_expr_custom, the same function as a native expression. */
  val qUdfScalar: Q = (s, dir) => {
    import s.implicits._
    val normDiff = udf((a: Double, b: Double) => (a - b) / (a + b))
    table(s, dir, "part")
      .select($"p_partkey",
        round(normDiff($"p_retailprice", $"p_size".cast("double")), 6).as("nd"))
      .orderBy($"p_partkey")
  }

  /** Custom Catalyst expressions registered in the function registry: the
    * RuntimeReplaceable form and the codegen form side by side. */
  val qExprCustom: Q = (s, dir) => {
    import s.implicits._
    s.sessionState.functionRegistry.createOrReplaceTempFunction(
      "norm_diff", exprs => NormDiff(exprs(0), exprs(1)), "scala_udf")
    s.sessionState.functionRegistry.createOrReplaceTempFunction(
      "norm_diff_cg", exprs => NormDiffCodegen(exprs(0), exprs(1)), "scala_udf")
    table(s, dir, "part")
      .select($"p_partkey",
        round(expr("norm_diff(p_retailprice, CAST(p_size AS DOUBLE))"), 6).as("nd"),
        round(expr("norm_diff_cg(p_retailprice, CAST(p_size AS DOUBLE))"), 6).as("nd_cg"))
      .orderBy($"p_partkey")
  }

  /** Typed Aggregator → UDAF: discount-weighted mean extended price. */
  val qAggTyped: Q = (s, dir) => {
    import s.implicits._
    val wavg = udaf(WeightedAvg)
    table(s, dir, "lineitem")
      .groupBy($"l_returnflag")
      .agg(wavg(dec($"l_extendedprice").cast("decimal(38,18)"),
        dec($"l_discount").cast("decimal(38,18)")).as("wavg_price"))
      .orderBy($"l_returnflag")
  }

  /** Approximate distinct via HLL (no oracle: sketch internals are
    * engine-specific; ExtensionsSpec asserts the error bound against an
    * exact countDistinct computed in the spec — the declared query is
    * sketch-only so the bench measures the sketch path). */
  val qAggHll: Q = (s, dir) => {
    import s.implicits._
    table(s, dir, "lineitem")
      .groupBy($"l_returnflag")
      .agg(approx_count_distinct($"l_partkey", 0.02).as("approx_parts"))
      .orderBy($"l_returnflag")
  }

  /** As-of join, window-rewrite v1: each purchase event matched to the
    * latest signup-or-earlier event of the same user. Union the two sides,
    * sort by (ts, side, event_id) per user, and carry the last non-null
    * signup forward — one shuffle on user_id, no range cross product.
    * Signups are deduped to one per (user, ts) so the match is unique.
    * DuckDB's native ASOF JOIN is the oracle. */
  val qJoinAsof: Q = (s, dir) => {
    import s.implicits._
    val ev = events(s, dir)
    val sig = ev.filter($"event_type" === "signup")
      .groupBy($"user_id", $"ts").agg(max($"event_id").as("s_event_id"))
      .select($"user_id", $"ts", lit(0).as("side"), $"s_event_id",
        lit(null).cast("long").as("p_event_id"))
    val pur = ev.filter($"event_type" === "purchase")
      .select($"user_id", $"ts", lit(1).as("side"),
        lit(null).cast("long").as("s_event_id"), $"event_id".as("p_event_id"))
    val w = Window.partitionBy($"user_id")
      .orderBy($"ts", $"side", $"s_event_id".asc_nulls_last)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    sig.unionAll(pur)
      .withColumn("asof_ts", last(when($"side" === 0, $"ts"), ignoreNulls = true).over(w))
      .withColumn("asof_signup", last($"s_event_id", ignoreNulls = true).over(w))
      .filter($"side" === 1)
      .select($"user_id", $"p_event_id", $"ts", $"asof_ts", $"asof_signup")
      .orderBy($"p_event_id")
  }

  /** As-of join v2: the native AsOfJoinPlan/AsOfJoinExec operator (see
    * graft.plans.AsOfJoin) planned via experimental.extraStrategies. Same
    * semantics and oracle as the window-rewrite v1 above. */
  val qJoinAsofNative: Q = (s, dir) => {
    import s.implicits._
    import graft.plans.{AsOfJoinPlan, AsOfJoinStrategy}
    if (!s.experimental.extraStrategies.contains(AsOfJoinStrategy))
      s.experimental.extraStrategies = s.experimental.extraStrategies :+ AsOfJoinStrategy
    val ev = events(s, dir)
    val pur = ev.filter($"event_type" === "purchase")
      .select($"user_id", $"event_id".as("p_event_id"), $"ts")
    val sig = ev.filter($"event_type" === "signup")
      .groupBy($"user_id", $"ts").agg(max($"event_id").as("s_event_id"))
      .select($"user_id".as("s_user_id"), $"ts".as("s_ts"), $"s_event_id")
    val lplan = pur.queryExecution.analyzed
    val rplan = sig.queryExecution.analyzed
    def attr(p: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan, n: String) =
      p.output.find(_.name == n).get
    org.apache.spark.sql.graft.GraftSql.ofRows(s,
      AsOfJoinPlan(lplan, rplan,
        attr(lplan, "user_id"), attr(rplan, "s_user_id"),
        attr(lplan, "ts"), attr(rplan, "s_ts")))
      .select($"user_id", $"p_event_id", $"ts",
        $"s_ts".as("asof_ts"), $"s_event_id".as("asof_signup"))
      .orderBy($"p_event_id")
  }

  /** UDTF surface v1: shingle stats as pure per-row expressions — zero
    * explode, zero extra shuffle (the explode+groupBy shape that
    * demonstrates a real Generator lives in q_udtf_gen).
    *
    * Round 19 (optimization): the original form — size() and
    * size(array_distinct()) over a `transform(sequence(...), i ->
    * concat_ws(" ", slice(ws,i,3)))` shingle array — ran every shingle
    * through CodegenFallback HOFs (interpreted per-element walk + a
    * materialized string per shingle + a second array_distinct pass);
    * that chain WAS this query's cost (measured ~1.9 s isolated at
    * sf0.1). Both outputs are computable without the array:
    * n_shingles for a kept doc is (#words − 2) = (#spaces − 1), counted
    * with length/translate (pure codegen byte ops); n_distinct is the
    * native single-pass ShingleDistinctCount expression (zero-copy
    * UTF8String window views into a hash set — semantics proven equal
    * to the HOF form in ExprParitySpec, and the DuckDB oracle is
    * unchanged). The filter mirrors explode semantics: docs with no
    * shingles (< 3 words or NULL text) emit no row. */
  val qUdtf: Q = (s, dir) => {
    import s.implicits._
    val nsp = (length($"text") -
      length(translate($"text", " ", ""))).as("nsp")
    graft.ops.Util.spread(table(s, dir, "documents"))
      .select($"doc_id", $"text", nsp)
      .filter($"nsp" >= 2)
      .select($"doc_id",
        ($"nsp" - 1).cast("long").as("n_shingles"),
        org.apache.spark.sql.graft.GraftSql.column(
          graft.functions.ShingleDistinctCount(
            org.apache.spark.sql.graft.GraftSql.expression($"text"), 3))
          .as("n_distinct"))
      .orderBy($"doc_id")
  }

  val queries: Map[String, Q] = Map(
    "q_udf_scalar" -> qUdfScalar,
    "q_expr_custom" -> qExprCustom,
    "q_agg_typed" -> qAggTyped,
    "q_agg_hll" -> qAggHll,
    "q_join_asof" -> qJoinAsof,
    "q_join_asof_native" -> qJoinAsofNative,
    "q_udtf" -> qUdtf,
  )

  val oracleSql: Map[String, String] = Map(
    "q_udf_scalar" ->
      """SELECT p_partkey,
        | round((p_retailprice - CAST(p_size AS DOUBLE)) / (p_retailprice + CAST(p_size AS DOUBLE)), 6) AS nd
        |FROM part ORDER BY p_partkey""".stripMargin,
    "q_expr_custom" ->
      """SELECT p_partkey,
        | round((p_retailprice - CAST(p_size AS DOUBLE)) / (p_retailprice + CAST(p_size AS DOUBLE)), 6) AS nd,
        | round((p_retailprice - CAST(p_size AS DOUBLE)) / (p_retailprice + CAST(p_size AS DOUBLE)), 6) AS nd_cg
        |FROM part ORDER BY p_partkey""".stripMargin,
    "q_agg_typed" ->
      """SELECT l_returnflag,
        | CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4)) * CAST(l_discount AS DECIMAL(18,4))) AS DOUBLE)
        |  / CAST(sum(CAST(l_discount AS DECIMAL(18,4))) AS DOUBLE) AS wavg_price
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    // q_agg_hll: intentionally no oracle (sketches differ across engines).
    "q_join_asof" ->
      """WITH sig AS (SELECT user_id, ts::TIMESTAMP AS ts, max(event_id) AS s_event_id
        |  FROM events WHERE event_type = 'signup' GROUP BY user_id, ts),
        |pur AS (SELECT user_id, event_id AS p_event_id, ts::TIMESTAMP AS ts
        |  FROM events WHERE event_type = 'purchase')
        |SELECT pur.user_id, p_event_id, pur.ts,
        | sig.ts AS asof_ts, sig.s_event_id AS asof_signup
        |FROM pur ASOF LEFT JOIN sig
        | ON pur.user_id = sig.user_id AND pur.ts >= sig.ts
        |ORDER BY p_event_id""".stripMargin,
    "q_join_asof_native" ->
      """WITH sig AS (SELECT user_id, ts::TIMESTAMP AS ts, max(event_id) AS s_event_id
        |  FROM events WHERE event_type = 'signup' GROUP BY user_id, ts),
        |pur AS (SELECT user_id, event_id AS p_event_id, ts::TIMESTAMP AS ts
        |  FROM events WHERE event_type = 'purchase')
        |SELECT pur.user_id, p_event_id, pur.ts,
        | sig.ts AS asof_ts, sig.s_event_id AS asof_signup
        |FROM pur ASOF LEFT JOIN sig
        | ON pur.user_id = sig.user_id AND pur.ts >= sig.ts
        |ORDER BY p_event_id""".stripMargin,
    "q_udtf" ->
      """WITH tok AS (SELECT doc_id, string_split(text,' ') AS ws FROM documents),
        |sh AS (SELECT doc_id, list_transform(generate_series(1, len(ws)-2),
        |  i -> ws[i]||' '||ws[i+1]||' '||ws[i+2]) AS grams FROM tok)
        |SELECT doc_id, CAST(len(grams) AS BIGINT) AS n_shingles,
        | CAST(len(list_distinct(grams)) AS BIGINT) AS n_distinct
        |FROM sh WHERE len(grams) > 0 ORDER BY doc_id""".stripMargin,
  )
}
