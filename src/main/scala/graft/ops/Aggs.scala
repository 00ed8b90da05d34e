package graft.ops

import org.apache.spark.sql.functions._
import Util._

/** SURVEY.md §2.4 — aggregation operators.
  *
  * All plans are plain `groupBy.agg` so Catalyst generates the two-phase
  * partial → shuffle-by-group-keys → final hash aggregate; at cluster scale
  * the map-side partial agg is what keeps the shuffle small.
  */
object Aggs {

  /** TPC-H Q1 analog: pricing summary by returnflag/linestatus. */
  val qAggGroupby: Q = (s, dir) => {
    import s.implicits._
    table(s, dir, "lineitem")
      .filter($"l_shipdate" <= ts("1998-09-02 00:00:00"))
      .groupBy($"l_returnflag", $"l_linestatus")
      .agg(
        dsum($"l_quantity").as("sum_qty"),
        round(dsum($"l_extendedprice"), 4).as("sum_base_price"),
        // scale-8 sum over the full table: the underlying integer exceeds
        // 2^53 at sf>=0.1, where DuckDB's decimal->double cast can differ
        // by 1 ulp from the JVM's — round to 4dp on both sides
        round(sum(dec($"l_extendedprice") * (lit(1).cast("decimal(18,4)") - dec($"l_discount")))
          .cast("double"), 4).as("sum_disc_price"),
        (dsum($"l_quantity") / count(lit(1))).as("avg_qty"),
        count(lit(1)).as("count_order"))
      .orderBy($"l_returnflag", $"l_linestatus")
  }

  /** Exact COUNT(DISTINCT), two distincts + plain count in one aggregate
    * (Catalyst expands to a multi-phase plan). */
  val qAggDistinct: Q = (s, dir) => {
    import s.implicits._
    table(s, dir, "lineitem")
      .groupBy($"l_returnflag")
      .agg(
        countDistinct($"l_partkey").as("nd_parts"),
        countDistinct($"l_suppkey").as("nd_supps"),
        count(lit(1)).as("n_rows"))
      .orderBy($"l_returnflag")
  }

  /** ROLLUP(r_name, n_name): hierarchy subtotals + grand total. */
  val qAggRollup: Q = (s, dir) => {
    import s.implicits._
    val c = table(s, dir, "customer")
    val n = table(s, dir, "nation")
    val r = table(s, dir, "region")
    c.join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
      .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
      .rollup($"r_name", $"n_name")
      .agg(count(lit(1)).as("n_custs"))
      .orderBy($"r_name".asc_nulls_first, $"n_name".asc_nulls_first)
  }

  /** CUBE(returnflag, linestatus): all grouping combinations. */
  val qAggCube: Q = (s, dir) => {
    import s.implicits._
    table(s, dir, "lineitem")
      .cube($"l_returnflag", $"l_linestatus")
      .agg(count(lit(1)).as("n_rows"), dsum($"l_quantity").as("sum_qty"))
      .orderBy($"l_returnflag".asc_nulls_first, $"l_linestatus".asc_nulls_first)
  }

  /** Explicit GROUPING SETS ((flag), (status), ()). */
  val qAggGsets: Q = (s, dir) => {
    import s.implicits._
    table(s, dir, "lineitem")
      .groupingSets(
        Seq(Seq($"l_returnflag"), Seq($"l_linestatus"), Seq()),
        $"l_returnflag", $"l_linestatus")
      .agg(count(lit(1)).as("n_rows"))
      .orderBy($"l_returnflag".asc_nulls_first, $"l_linestatus".asc_nulls_first)
  }

  /** Exact interpolated percentiles of o_totalprice per priority. */
  val qAggPercentile: Q = (s, dir) => {
    import s.implicits._
    table(s, dir, "orders")
      .groupBy($"o_orderpriority")
      .agg(
        expr("percentile(o_totalprice, 0.5)").as("p50"),
        expr("percentile(o_totalprice, 0.9)").as("p90"))
      .orderBy($"o_orderpriority")
  }

  /** Ordered array_agg: top-5 order keys per customer by totalprice,
    * surfaced as a comma-joined string (scalar output for hash parity).
    * collect_list order is nondeterministic post-shuffle, so assembly sorts
    * (rank, key) structs explicitly. */
  val qAggCollect: Q = (s, dir) => {
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy($"o_custkey")
      .orderBy($"o_totalprice".desc, $"o_orderkey")
    table(s, dir, "orders")
      .withColumn("rn", row_number().over(w))
      .filter($"rn" <= 5)
      .groupBy($"o_custkey")
      .agg(concat_ws(",",
        transform(array_sort(collect_list(struct($"rn", $"o_orderkey"))),
          x => x.getField("o_orderkey").cast("string"))).as("top_orders"))
      .orderBy($"o_custkey")
  }


  /** Bitwise aggregates (bit_and / bit_or / bit_xor) — the fingerprint/
    * bitmap-rollup primitive; all three are associative+commutative, so
    * they combine map-side like sum. */
  val qAggBits: Q = (s, dir) => {
    import s.implicits._
    table(s, dir, "lineitem")
      .groupBy($"l_returnflag")
      .agg(bit_and($"l_partkey").as("band"),
        bit_or($"l_partkey").as("bor"),
        bit_xor($"l_partkey").as("bxor"),
        count(lit(1)).as("n"))
      .orderBy($"l_returnflag")
  }

  val queries: Map[String, Q] = Map(
    "q_agg_bits" -> qAggBits,
    "q_agg_groupby" -> qAggGroupby,
    "q_agg_distinct" -> qAggDistinct,
    "q_agg_rollup" -> qAggRollup,
    "q_agg_cube" -> qAggCube,
    "q_agg_gsets" -> qAggGsets,
    "q_agg_percentile" -> qAggPercentile,
    "q_agg_collect" -> qAggCollect,
  )

  val oracleSql: Map[String, String] = Map(
    "q_agg_bits" ->
      """SELECT l_returnflag, bit_and(l_partkey) AS band,
        | bit_or(l_partkey) AS bor, bit_xor(l_partkey) AS bxor,
        | count(*) AS n
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "q_agg_groupby" ->
      """SELECT l_returnflag, l_linestatus,
        | CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty,
        | round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE), 4) AS sum_base_price,
        | round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4)) * (CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4)))) AS DOUBLE), 4) AS sum_disc_price,
        | CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) / count(*) AS avg_qty,
        | count(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q_agg_distinct" ->
      """SELECT l_returnflag, count(DISTINCT l_partkey) AS nd_parts,
        | count(DISTINCT l_suppkey) AS nd_supps, count(*) AS n_rows
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "q_agg_rollup" ->
      """SELECT r_name, n_name, count(*) AS n_custs
        |FROM customer JOIN nation ON c_nationkey = n_nationkey
        | JOIN region ON n_regionkey = r_regionkey
        |GROUP BY ROLLUP(r_name, n_name)
        |ORDER BY r_name NULLS FIRST, n_name NULLS FIRST""".stripMargin,
    "q_agg_cube" ->
      """SELECT l_returnflag, l_linestatus, count(*) AS n_rows,
        | CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty
        |FROM lineitem GROUP BY CUBE(l_returnflag, l_linestatus)
        |ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin,
    "q_agg_gsets" ->
      """SELECT l_returnflag, l_linestatus, count(*) AS n_rows
        |FROM lineitem
        |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
        |ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin,
    "q_agg_percentile" ->
      """SELECT o_orderpriority, quantile_cont(o_totalprice, 0.5) AS p50,
        | quantile_cont(o_totalprice, 0.9) AS p90
        |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    "q_agg_collect" ->
      """SELECT o_custkey, string_agg(CAST(o_orderkey AS VARCHAR), ',' ORDER BY rn) AS top_orders
        |FROM (SELECT o_custkey, o_orderkey, row_number() OVER
        |       (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rn
        |      FROM orders) WHERE rn <= 5
        |GROUP BY o_custkey ORDER BY o_custkey""".stripMargin,
  )
}
