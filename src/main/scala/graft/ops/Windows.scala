package graft.ops

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import Util._

/** SURVEY.md §2.5 — window functions.
  *
  * Scale notes: a window partitioned by a key shuffles once on that key and
  * sorts within partitions — the same exchange is reused by chained windows
  * over the same partitioning. Every orderBy inside a window carries a
  * unique tie-break key so rank/lag output is deterministic cross-engine.
  */
object Windows {

  /** row_number/rank/dense_rank per mktsegment by acctbal desc (GEE
    * least-cloudy-scene ranking analog). mktsegment has ~5 values, so the
    * plain window would funnel each segment through ONE task at scale —
    * routed through [[DistRank.rowNumberInGroup]], which engages the
    * two-phase kernel cost-based (estimated input ≥ 1 GiB; below that the
    * single window IS the cheapest correct plan). rank and dense_rank
    * equal row_number under this total (custkey-tie-broken) ordering, and
    * the single-window form remains the DuckDB oracle. */
  val qWinRank: Q = (s, dir) => {
    import s.implicits._
    DistRank.rowNumberInGroup(
      table(s, dir, "customer")
        .select($"c_custkey", $"c_mktsegment", $"c_acctbal"),
      Seq("c_mktsegment"), Seq($"c_acctbal".desc, $"c_custkey"),
      sliceKey = -$"c_acctbal", out = "rn")
      .select($"c_custkey", $"c_mktsegment", $"c_acctbal",
        $"rn", $"rn".as("rk"), $"rn".as("drk"))
      .orderBy($"c_custkey")
  }

  /** The ALWAYS-two-phase form of q_win_rank: [[DistRank.twoPhase]]
    * unconditionally, so the driver's DuckDB oracle verifies the kernel
    * itself (boundary slicing, local ranks, broadcast offsets) at every
    * scale factor — the cost-based default above would pick the plain
    * window at test scale and leave the kernel oracle-unchecked. */
  val qWinRankDist: Q = (s, dir) => {
    import s.implicits._
    DistRank.twoPhase(
      table(s, dir, "customer")
        .select($"c_custkey", $"c_mktsegment", $"c_acctbal"),
      Seq("c_mktsegment"), Seq($"c_acctbal".desc, $"c_custkey"),
      sliceKey = -$"c_acctbal", out = "rn")
      .select($"c_custkey", $"c_mktsegment", $"c_acctbal",
        $"rn", $"rn".as("rk"), $"rn".as("drk"))
      .orderBy($"c_custkey")
  }

  /** Top-3 orders per customer — the GEE best-scene-per-path/row analog. */
  val qWinTopkGroup: Q = (s, dir) => {
    import s.implicits._
    val w = Window.partitionBy($"o_custkey")
      .orderBy($"o_totalprice".desc, $"o_orderkey")
    table(s, dir, "orders")
      .withColumn("rn", row_number().over(w).cast("long"))
      .filter($"rn" <= 3)
      .select($"o_custkey", $"o_orderkey", $"o_totalprice", $"rn")
      .orderBy($"o_custkey", $"rn")
  }

  /** lag/lead: previous/next event value per user in event-time order. */
  val qWinLag: Q = (s, dir) => {
    import s.implicits._
    val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
    events(s, dir)
      .select($"user_id", $"event_id", $"value",
        lag($"value", 1).over(w).as("prev_value"),
        lead($"value", 1).over(w).as("next_value"),
        ($"value" - lag($"value", 1).over(w)).as("delta"))
      .orderBy($"user_id", $"event_id")
  }

  /** Running sum, ROWS UNBOUNDED PRECEDING..CURRENT (decimal-summed). */
  val qWinFrameRows: Q = (s, dir) => {
    import s.implicits._
    val w = Window.partitionBy($"o_custkey")
      .orderBy($"o_orderdate", $"o_orderkey")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    table(s, dir, "orders")
      .select($"o_custkey", $"o_orderkey",
        sum(dec($"o_totalprice")).over(w).cast("double").as("running_total"))
      .orderBy($"o_custkey", $"o_orderkey")
  }

  /** 30-day trailing sum per supplier via RANGE BETWEEN on epoch seconds
    * (GEE moving-composite analog). Frame peers are defined by the range
    * value, so the non-unique orderBy is still deterministic. */
  val qWinFrameRange: Q = (s, dir) => {
    import s.implicits._
    val w = Window.partitionBy($"l_suppkey")
      .orderBy($"ship_sec")
      .rangeBetween(-30L * 86400, 0)
    table(s, dir, "lineitem")
      .withColumn("ship_sec", unix_timestamp($"l_shipdate"))
      .select($"l_suppkey", $"l_orderkey", $"l_linenumber", $"ship_sec",
        sum(dec($"l_quantity")).over(w).cast("double").as("qty_30d"))
      .orderBy($"l_suppkey", $"l_orderkey", $"l_linenumber", $"ship_sec", $"qty_30d")
  }

  /** ntile(4) + percent_rank + cume_dist over order totals. The window
    * is GLOBAL (no partition key at all — the K=1 extreme of the
    * low-cardinality funnel), so the row numbers come from
    * [[DistRank.rowNumberInGroup]] with an empty group and every rank
    * statistic is derived arithmetically from (rn, n) under the total
    * order: percent_rank = (rn−1)/(n−1), cume_dist = rn/n, and
    * ntile(q) by its integer fill rule — the first n%q tiles hold
    * n div q + 1 rows, the rest n div q (`div` keeps it integer-exact;
    * the zero-divisor branch is unreachable because when n < q every
    * row lands in the first-tiles CASE arm). The plain window form
    * stays as the oracle. */
  val qWinNtile: Q = (s, dir) => {
    import s.implicits._
    DistRank.rowNumberInGroup(
      table(s, dir, "orders").select($"o_orderkey", $"o_totalprice"),
      Seq.empty, Seq($"o_totalprice", $"o_orderkey"),
      sliceKey = $"o_totalprice", out = "_rn", countOut = Some("_n"))
      .withColumn("_rem", $"_n" % 4)
      .withColumn("_big", expr("_n div 4") + 1L)
      .select($"o_orderkey", $"o_totalprice",
        when($"_rn" <= $"_rem" * $"_big", expr("(_rn - 1) div _big") + 1L)
          .otherwise($"_rem" + expr("(_rn - _rem * _big - 1) div (_big - 1)") + 1L)
          .cast("long").as("quartile"),
        when($"_n" === 1L, lit(0.0))
          .otherwise(($"_rn" - 1L).cast("double") / ($"_n" - 1L).cast("double"))
          .as("pct_rank"),
        ($"_rn".cast("double") / $"_n".cast("double")).as("cd"))
      .orderBy($"o_orderkey")
  }

  /** percent_rank + cume_dist over a UNIQUE ordering (totalprice then
    * orderkey): both are pure rank arithmetic, deterministic once the
    * order is total. orderpriority has ~5 values — the ~5-task window
    * funnel — so the ranks come from [[DistRank.rowNumberInGroup]]
    * (two-phase kernel above the 1 GiB cost threshold, plain window
    * below) and the percentiles are derived arithmetically: under a
    * total order
    * percent_rank = (rn−1)/(n−1) (0 when n = 1, matching both engines'
    * definition) and cume_dist = rn/n. Unrounded: divisions of identical
    * exact integers are bit-identical cross-engine, while round() itself
    * can diverge at .5 boundaries. The window form stays as the oracle. */
  val qWinPctRank: Q = (s, dir) => {
    import s.implicits._
    DistRank.rowNumberInGroup(
      table(s, dir, "orders")
        .filter($"o_custkey" % 100 === 0)
        .select($"o_orderpriority", $"o_orderkey", $"o_totalprice"),
      Seq("o_orderpriority"), Seq($"o_totalprice", $"o_orderkey"),
      sliceKey = $"o_totalprice", out = "_rn", countOut = Some("_n"))
      .select($"o_orderpriority", $"o_orderkey", $"o_totalprice",
        when($"_n" === 1L, lit(0.0))
          .otherwise(($"_rn" - 1L).cast("double") / ($"_n" - 1L).cast("double"))
          .as("pr"),
        ($"_rn".cast("double") / $"_n".cast("double")).as("cd"))
      .orderBy($"o_orderpriority", $"o_orderkey")
  }

  /** Event-time RANGE frame with an INTERVAL bound — the sliding
    * "last hour per user" aggregate WITHOUT bucketing the time axis:
    * every event sees the exact sum/count of its user's events in the
    * preceding hour (window() tumbling/sliding buckets approximate
    * this; the interval frame is exact per row). Value-based frames are
    * tie-safe (equal timestamps share a frame), and the framed sum runs
    * in decimal so its order inside the frame cannot flake the hash.
    * At 100 TB the plan is the same single shuffle on user_id every
    * window query pays — the frame adds no extra exchange. */
  val qWinRangeTime: Q = (s, dir) => {
    import s.implicits._
    Util.events(s, dir)
      .selectExpr("user_id", "event_id", "ts", "value",
        """CAST(sum(CAST(value AS DECIMAL(18,4))) OVER (
          |  PARTITION BY user_id ORDER BY ts
          |  RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)
          | AS DOUBLE) AS sum_1h""".stripMargin,
        """count(*) OVER (
          |  PARTITION BY user_id ORDER BY ts
          |  RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)
          | AS n_1h""".stripMargin)
      .orderBy($"user_id", $"event_id", $"ts", $"value", $"sum_1h", $"n_1h")
  }

  val queries: Map[String, Q] = Map(
    "q_win_range_time" -> qWinRangeTime,
    "q_win_pctrank" -> qWinPctRank,
    "q_win_rank" -> qWinRank,
    "q_win_rank_dist" -> qWinRankDist,
    "q_win_topk_group" -> qWinTopkGroup,
    "q_win_lag" -> qWinLag,
    "q_win_frame_rows" -> qWinFrameRows,
    "q_win_frame_range" -> qWinFrameRange,
    "q_win_ntile" -> qWinNtile,
  )

  val oracleSql: Map[String, String] = Map(
    "q_win_range_time" ->
      """SELECT user_id, event_id, ts, value,
        | CAST(sum(CAST(value AS DECIMAL(18,4))) OVER w AS DOUBLE) AS sum_1h,
        | count(*) OVER w AS n_1h
        |FROM (SELECT user_id, event_id, ts::TIMESTAMP AS ts, value FROM events)
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts
        |  RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)
        |ORDER BY user_id, event_id, ts, value, sum_1h, n_1h""".stripMargin,
    "q_win_pctrank" ->
      """SELECT o_orderpriority, o_orderkey, o_totalprice,
        | percent_rank() OVER w AS pr,
        | cume_dist() OVER w AS cd
        |FROM orders WHERE o_custkey % 100 = 0
        |WINDOW w AS (PARTITION BY o_orderpriority
        |  ORDER BY o_totalprice, o_orderkey)
        |ORDER BY o_orderpriority, o_orderkey""".stripMargin,
    "q_win_rank" ->
      """SELECT c_custkey, c_mktsegment, c_acctbal,
        | row_number() OVER w AS rn, rank() OVER w AS rk, dense_rank() OVER w AS drk
        |FROM customer
        |WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey)
        |ORDER BY c_custkey""".stripMargin,
    // the kernel form must agree with the plain window form exactly —
    // same oracle (salting precedent: optimized form vs plain oracle)
    "q_win_rank_dist" ->
      """SELECT c_custkey, c_mktsegment, c_acctbal,
        | row_number() OVER w AS rn, rank() OVER w AS rk, dense_rank() OVER w AS drk
        |FROM customer
        |WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey)
        |ORDER BY c_custkey""".stripMargin,
    "q_win_topk_group" ->
      """SELECT o_custkey, o_orderkey, o_totalprice, rn FROM (
        | SELECT o_custkey, o_orderkey, o_totalprice, row_number() OVER
        |  (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rn
        | FROM orders) WHERE rn <= 3
        |ORDER BY o_custkey, rn""".stripMargin,
    "q_win_lag" ->
      """SELECT user_id, event_id, value,
        | lag(value, 1) OVER w AS prev_value,
        | lead(value, 1) OVER w AS next_value,
        | value - lag(value, 1) OVER w AS delta
        |FROM (SELECT user_id, event_id, value, ts::TIMESTAMP AS ts FROM events)
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        |ORDER BY user_id, event_id""".stripMargin,
    "q_win_frame_rows" ->
      """SELECT o_custkey, o_orderkey,
        | CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) OVER
        |  (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_total
        |FROM orders ORDER BY o_custkey, o_orderkey""".stripMargin,
    "q_win_frame_range" ->
      """SELECT l_suppkey, l_orderkey, l_linenumber, ship_sec,
        | CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) OVER
        |  (PARTITION BY l_suppkey ORDER BY ship_sec
        |   RANGE BETWEEN 2592000 PRECEDING AND CURRENT ROW) AS DOUBLE) AS qty_30d
        |FROM (SELECT *, CAST(epoch(l_shipdate) AS BIGINT) AS ship_sec FROM lineitem)
        |ORDER BY l_suppkey, l_orderkey, l_linenumber, ship_sec, qty_30d""".stripMargin,
    "q_win_ntile" ->
      """SELECT o_orderkey, o_totalprice,
        | ntile(4) OVER w AS quartile, percent_rank() OVER w AS pct_rank,
        | cume_dist() OVER w AS cd
        |FROM orders
        |WINDOW w AS (ORDER BY o_totalprice, o_orderkey)
        |ORDER BY o_orderkey""".stripMargin,
  )
}
