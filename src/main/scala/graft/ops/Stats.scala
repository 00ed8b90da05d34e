package graft.ops

import org.apache.spark.sql.functions._
import Util._

/** Statistical aggregates, UNPIVOT, arg-min/max, and outer generators.
  * Parity: second-moment statistics round to 6dp (both engines use
  * numerically stable single-pass algorithms whose results agree well
  * beyond that); min_by/max_by rank on an exactly-computed unique integer
  * key so ties cannot differ across engines. */
/** Row type for the typed-Dataset pipeline (compile-time field checks). */
case class LiRow(l_orderkey: Long, l_quantity: Double, l_returnflag: String)

object Stats {

  /** Typed Dataset[T] pipeline: case-class encoder, typed filter and
    * groupByKey — the API surface for callers who want compile-time field
    * safety; the physical plan is the same shuffle+agg as the DataFrame
    * form (the typed filter is a lambda, so predicate pushdown stops at
    * the deserializer — documented tradeoff vs the Column form). */
  val qTypedDs: Q = (s, dir) => {
    import s.implicits._
    table(s, dir, "lineitem")
      .select($"l_orderkey", $"l_quantity", $"l_returnflag")
      .as[LiRow]
      .filter(_.l_quantity > 45.0)
      .groupByKey(_.l_returnflag)
      .count()
      .toDF("l_returnflag", "n_big")
      .orderBy($"l_returnflag")
  }


  val qAggStats: Q = (s, dir) => {
    import s.implicits._
    table(s, dir, "lineitem")
      .groupBy($"l_returnflag")
      .agg(
        round(stddev_samp($"l_quantity"), 6).as("sd_qty"),
        round(var_samp($"l_quantity"), 6).as("var_qty"),
        round(corr($"l_quantity", $"l_extendedprice"), 6).as("corr_qp"),
        round(covar_samp($"l_quantity", $"l_discount"), 6).as("cov_qd"))
      .orderBy($"l_returnflag")
  }

  /** Linear-regression aggregates (regr_*): one-pass mergeable moment
    * sums, so the fit distributes exactly like sum/count — the scalable
    * alternative to fitting per-group models driver-side. Rounded to 6dp
    * like corr/covar (double moment sums are partition-order dependent in
    * the last ulp). */
  val qAggRegr: Q = (s, dir) => {
    import s.implicits._
    table(s, dir, "lineitem")
      .groupBy($"l_returnflag")
      .agg(
        round(regr_slope($"l_extendedprice", $"l_quantity"), 6).as("slope"),
        round(regr_intercept($"l_extendedprice", $"l_quantity"), 6).as("icept"),
        round(regr_r2($"l_extendedprice", $"l_quantity"), 6).as("r2"),
        regr_count($"l_extendedprice", $"l_quantity").as("n"),
        round(regr_avgx($"l_extendedprice", $"l_quantity"), 6).as("avgx"),
        round(regr_avgy($"l_extendedprice", $"l_quantity"), 6).as("avgy"))
      .orderBy($"l_returnflag")
  }

  /** UNPIVOT via the stack generator: wide → long. */
  val qFnUnpivot: Q = (s, dir) => {
    import s.implicits._
    table(s, dir, "orders")
      .selectExpr("o_orderkey",
        "stack(2, 'price', o_totalprice, 'keyx', CAST(o_orderkey AS DOUBLE)) AS (metric, v)")
      .orderBy($"o_orderkey", $"metric")
  }

  /** arg-min/arg-max with an exact unique integer ranking key
    * (acctbal cents × 10^6 + custkey — deterministic under ties). */
  val qAggMinmaxby: Q = (s, dir) => {
    import s.implicits._
    val rank = (round($"c_acctbal" * 100).cast("long") * 1000000L + $"c_custkey")
    table(s, dir, "customer")
      .groupBy($"c_mktsegment")
      .agg(
        max_by($"c_name", rank).as("richest"),
        min_by($"c_name", rank).as("poorest"),
        count(lit(1)).as("n"))
      .orderBy($"c_mktsegment")
  }

  /** explode_outer: generator rows survive empty arrays (null-extended);
    * the filtered token list is empty for every row, so each doc emits
    * exactly one null-token row (GenerateExec outer=true). */
  val qFnExplodeOuter: Q = (s, dir) => {
    import s.implicits._
    table(s, dir, "documents")
      .select($"doc_id",
        explode_outer(filter(split($"text", " "), w => w === "zzz_never"))
          .as("token"))
      .orderBy($"doc_id")
  }

  /** Edit-distance near-dup verification on prefix-blocked candidate
    * pairs (completes the dedup family: set-based Jaccard, bitwise
    * SimHash, and now sequence-based Levenshtein on the same blocks). */
  val qDedupEditdist: Q = (s, dir) => {
    import s.implicits._
    val d = table(s, dir, "documents")
    val block = d.select($"doc_id", $"text",
      md5(substring($"text", 1, 40)).as("bk"))
    block.as("x").join(block.as("y"),
        $"x.bk" === $"y.bk" && $"x.doc_id" < $"y.doc_id")
      .select($"x.doc_id".as("doc_a"), $"y.doc_id".as("doc_b"),
        levenshtein(substring($"x.text", 1, 120), substring($"y.text", 1, 120))
          .cast("long").as("edit_dist"))
      .orderBy($"doc_a", $"doc_b")
  }

  /** Trigonometric / inverse-trig battery (6dp-rounded — libm vs JVM). */
  val qFnTrig: Q = (s, dir) => {
    import s.implicits._
    val x = $"p_retailprice" / lit(1000.0)
    table(s, dir, "part")
      .select($"p_partkey",
        round(sin(x), 6).as("s"),
        round(cos(x), 6).as("c"),
        round(tan(x), 6).as("t"),
        round(atan(x), 6).as("at"),
        round(atan2($"p_size".cast("double"), x), 6).as("at2"),
        round(degrees(atan(x)), 6).as("deg"))
      .orderBy($"p_partkey")
  }

  /** Boolean aggregates + printf-style formatting + initcap (emulated
    * per-word on the DuckDB side, which lacks initcap). */
  val qFnMisc: Q = (s, dir) => {
    import s.implicits._
    table(s, dir, "part")
      .groupBy($"p_type")
      .agg(
        every($"p_retailprice" > 100.0).as("all_over100"),
        some($"p_size" > 40).as("any_big"),
        count(lit(1)).as("n"))
      .orderBy($"p_type")
  }

  val qFnFormat: Q = (s, dir) => {
    import s.implicits._
    table(s, dir, "part")
      .select($"p_partkey",
        format_string("%.2f", $"p_retailprice").as("price_str"),
        format_string("part-%05d", $"p_partkey").as("padded_id"),
        initcap($"p_name").as("title"))
      .orderBy($"p_partkey")
  }

  val queries: Map[String, Q] = Map(
    "q_fn_misc" -> qFnMisc,
    "q_fn_format" -> qFnFormat,
    "q_dedup_editdist" -> qDedupEditdist,
    "q_fn_trig" -> qFnTrig,
    "q_agg_stats" -> qAggStats,
    "q_agg_regr" -> qAggRegr,
    "q_fn_unpivot" -> qFnUnpivot,
    "q_agg_minmaxby" -> qAggMinmaxby,
    "q_fn_explode_outer" -> qFnExplodeOuter,
    "q_typed_ds" -> qTypedDs,
  )

  val oracleSql: Map[String, String] = Map(
    "q_agg_regr" ->
      """SELECT l_returnflag,
        | round(regr_slope(l_extendedprice, l_quantity), 6) AS slope,
        | round(regr_intercept(l_extendedprice, l_quantity), 6) AS icept,
        | round(regr_r2(l_extendedprice, l_quantity), 6) AS r2,
        | CAST(regr_count(l_extendedprice, l_quantity) AS BIGINT) AS n,
        | round(regr_avgx(l_extendedprice, l_quantity), 6) AS avgx,
        | round(regr_avgy(l_extendedprice, l_quantity), 6) AS avgy
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "q_fn_misc" ->
      """SELECT p_type, bool_and(p_retailprice > 100.0) AS all_over100,
        | bool_or(p_size > 40) AS any_big, count(*) AS n
        |FROM part GROUP BY p_type ORDER BY p_type""".stripMargin,
    "q_fn_format" ->
      """SELECT p_partkey,
        | printf('%.2f', p_retailprice) AS price_str,
        | printf('part-%05d', p_partkey) AS padded_id,
        | array_to_string(list_transform(string_split(p_name, ' '),
        |   w -> upper(substr(w,1,1)) || lower(substr(w,2,length(w)))), ' ') AS title
        |FROM part ORDER BY p_partkey""".stripMargin,
    "q_dedup_editdist" ->
      """WITH block AS (SELECT doc_id, text, md5(substr(text,1,40)) AS bk FROM documents)
        |SELECT x.doc_id AS doc_a, y.doc_id AS doc_b,
        | CAST(levenshtein(substr(x.text,1,120), substr(y.text,1,120)) AS BIGINT) AS edit_dist
        |FROM block x JOIN block y ON x.bk=y.bk AND x.doc_id < y.doc_id
        |ORDER BY doc_a, doc_b""".stripMargin,
    "q_fn_trig" ->
      """SELECT p_partkey,
        | round(sin(p_retailprice/1000.0), 6) AS s,
        | round(cos(p_retailprice/1000.0), 6) AS c,
        | round(tan(p_retailprice/1000.0), 6) AS t,
        | round(atan(p_retailprice/1000.0), 6) AS at,
        | round(atan2(CAST(p_size AS DOUBLE), p_retailprice/1000.0), 6) AS at2,
        | round(degrees(atan(p_retailprice/1000.0)), 6) AS deg
        |FROM part ORDER BY p_partkey""".stripMargin,
    "q_agg_stats" ->
      """SELECT l_returnflag,
        | round(stddev_samp(l_quantity), 6) AS sd_qty,
        | round(var_samp(l_quantity), 6) AS var_qty,
        | round(corr(l_quantity, l_extendedprice), 6) AS corr_qp,
        | round(covar_samp(l_quantity, l_discount), 6) AS cov_qd
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "q_fn_unpivot" ->
      """SELECT o_orderkey, metric, v FROM (
        | SELECT o_orderkey, 'price' AS metric, o_totalprice AS v FROM orders
        | UNION ALL
        | SELECT o_orderkey, 'keyx' AS metric, CAST(o_orderkey AS DOUBLE) AS v FROM orders)
        |ORDER BY o_orderkey, metric""".stripMargin,
    "q_agg_minmaxby" ->
      """SELECT c_mktsegment,
        | max_by(c_name, CAST(round(c_acctbal * 100) AS BIGINT) * 1000000 + c_custkey) AS richest,
        | min_by(c_name, CAST(round(c_acctbal * 100) AS BIGINT) * 1000000 + c_custkey) AS poorest,
        | count(*) AS n
        |FROM customer GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,
    "q_fn_explode_outer" ->
      """SELECT doc_id, CAST(NULL AS VARCHAR) AS token FROM documents
        |ORDER BY doc_id""".stripMargin,
    "q_typed_ds" ->
      """SELECT l_returnflag, count(*) AS n_big FROM lineitem
        |WHERE l_quantity > 45.0
        |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
  )
}
