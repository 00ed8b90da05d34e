package graft.ops

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import Util._

/** Time-series utilities + remaining SQL-surface odds and ends. */
object TimeSeries {

  /** Gap-filled daily series per user: dense calendar grid (sequence +
    * explode), left join of observed daily sums, forward-fill via
    * last(ignoreNulls) — the resample/ffill primitive of a training-data
    * pipeline. Scale shape: the grid is |users| × 30 rows built from a
    * distinct-keys pass over the RAW events table (column-pruned scan +
    * partial-agg distinct — NOT from `daily`, which would compute the
    * whole aggregation twice), one shuffle per join/window on user_id. */
  val qTsGapfill: Q = (s, dir) => {
    import s.implicits._
    val daily = events(s, dir)
      .withColumn("day", to_date($"ts"))
      .groupBy($"user_id", $"day")
      .agg(dsum($"value").as("day_sum"))
    val grid = events(s, dir).select($"user_id").distinct()
      .select($"user_id", explode(sequence(
        to_date(lit("2024-01-01")), to_date(lit("2024-01-30")),
        expr("INTERVAL 1 DAY"))).as("day"))
    val w = Window.partitionBy($"user_id").orderBy($"day")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid.join(daily, Seq("user_id", "day"), "left_outer")
      .withColumn("filled", last($"day_sum", ignoreNulls = true).over(w))
      .select($"user_id", $"day", $"day_sum", $"filled")
      .orderBy($"user_id", $"day")
  }

  /** grouping()/grouping_id() over a rollup: lets consumers distinguish
    * subtotal rows from genuine NULL group keys. */
  val qAggGrouping: Q = (s, dir) => {
    import s.implicits._
    val c = table(s, dir, "customer")
    val n = table(s, dir, "nation")
    c.join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
      .rollup($"n_name", $"c_mktsegment")
      .agg(count(lit(1)).as("n_custs"),
        grouping($"n_name").cast("long").as("g_nation"),
        grouping($"c_mktsegment").cast("long").as("g_seg"),
        grouping_id($"n_name", $"c_mktsegment").cast("long").as("gid"))
      .orderBy($"n_name".asc_nulls_first, $"c_mktsegment".asc_nulls_first)
  }

  /** Error-safe casts: TRY_CAST returns NULL instead of failing. */
  val qFnTrycast: Q = (s, dir) => {
    import s.implicits._
    events(s, dir)
      .selectExpr("event_id",
        "try_cast(regexp_extract(props, '[0-9]+', 0) AS BIGINT) AS k_num",
        "try_cast(event_type AS DOUBLE) AS et_num",
        "try_cast(substr(event_type, 1, 1) AS INT) AS first_char_num")
      .orderBy($"event_id")
  }

  /** Approximate percentiles (no oracle — sketch internals are engine-
    * specific; ExtensionsSpec bounds the error vs an exact percentile it
    * computes itself, mirroring the q_agg_hll treatment: the declared
    * query is sketch-only so the bench measures only the sketch path). At
    * 100 TB this replaces the exact percentile: t-digest style sketches
    * are mergeable and bounded-memory. */
  val qAggApproxq: Q = (s, dir) => {
    import s.implicits._
    table(s, dir, "orders")
      .groupBy($"o_orderpriority")
      .agg(expr("approx_percentile(o_totalprice, 0.5, 1000)").as("ap50"))
      .orderBy($"o_orderpriority")
  }

  val queries: Map[String, Q] = Map(
    "q_agg_approxq" -> qAggApproxq,
    "q_ts_gapfill" -> qTsGapfill,
    "q_agg_grouping" -> qAggGrouping,
    "q_fn_trycast" -> qFnTrycast,
  )

  val oracleSql: Map[String, String] = Map(
    "q_ts_gapfill" ->
      """WITH daily AS (SELECT user_id, ts::TIMESTAMP::DATE AS day,
        |  CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS day_sum
        | FROM events GROUP BY 1, 2),
        |grid AS (SELECT user_id, CAST(unnest(generate_series(
        |   DATE '2024-01-01', DATE '2024-01-30', INTERVAL 1 DAY)) AS DATE) AS day
        | FROM (SELECT DISTINCT user_id FROM events))
        |SELECT g.user_id, g.day, d.day_sum,
        | last_value(d.day_sum IGNORE NULLS) OVER (PARTITION BY g.user_id
        |  ORDER BY g.day ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS filled
        |FROM grid g LEFT JOIN daily d ON g.user_id = d.user_id AND g.day = d.day
        |ORDER BY g.user_id, g.day""".stripMargin,
    "q_agg_grouping" ->
      """SELECT n_name, c_mktsegment, count(*) AS n_custs,
        | CAST(GROUPING(n_name) AS BIGINT) AS g_nation,
        | CAST(GROUPING(c_mktsegment) AS BIGINT) AS g_seg,
        | CAST(GROUPING(n_name, c_mktsegment) AS BIGINT) AS gid
        |FROM customer JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY ROLLUP(n_name, c_mktsegment)
        |ORDER BY n_name NULLS FIRST, c_mktsegment NULLS FIRST""".stripMargin,
    "q_fn_trycast" ->
      """SELECT event_id,
        | TRY_CAST(regexp_extract(props, '[0-9]+', 0) AS BIGINT) AS k_num,
        | TRY_CAST(event_type AS DOUBLE) AS et_num,
        | TRY_CAST(substr(event_type, 1, 1) AS INT) AS first_char_num
        |FROM events ORDER BY event_id""".stripMargin,
  )
}
