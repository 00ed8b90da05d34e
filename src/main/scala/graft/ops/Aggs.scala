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
        dsum($"l_extendedprice").as("sum_base_price"),
        sum(dec($"l_extendedprice") * (lit(1).cast("decimal(18,4)") - dec($"l_discount")))
          .cast("double").as("sum_disc_price"),
        (dsum($"l_quantity") / count(lit(1))).as("avg_qty"),
        count(lit(1)).as("count_order"))
      .orderBy($"l_returnflag", $"l_linestatus")
  }

  val queries: Map[String, Q] = Map(
    "q_agg_groupby" -> qAggGroupby,
  )

  val oracleSql: Map[String, String] = Map(
    "q_agg_groupby" ->
      """SELECT l_returnflag, l_linestatus,
        | CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty,
        | CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_base_price,
        | CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4)) * (CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4)))) AS DOUBLE) AS sum_disc_price,
        | CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) / count(*) AS avg_qty,
        | count(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
  )
}
