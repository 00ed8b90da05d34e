package graft.ops

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import Util._

/** SURVEY.md §2.10 — streaming operators, declared here in their
  * batch-equivalent forms (the driver's DuckDB oracle can only check batch
  * results). The same logic runs via readStream + memory sink in
  * StreamingParitySpec, which asserts batch/stream result equality —
  * that suite, not this file, is the evidence for watermark/late-data
  * semantics.
  *
  * Scale notes: tumbling/sliding windows are plain hash aggregates after
  * the window-bucket projection (map-side partial agg applies); session
  * windows and as-of logic shuffle once per user key. In true streaming,
  * state store size is bounded by the watermark.
  */
object StreamOps {

  /** Tumbling 1-hour window: count + sum(value) per (window, event_type). */
  val qStreamTumbling: Q = (s, dir) => {
    import s.implicits._
    events(s, dir)
      .groupBy(window($"ts", "1 hour"), $"event_type")
      .agg(count(lit(1)).as("n"), dsum($"value").as("sum_value"))
      .select($"window.start".as("w_start"), $"event_type", $"n", $"sum_value")
      .orderBy($"w_start", $"event_type")
  }

  /** Sliding 1-hour window, 15-minute slide: each event lands in 4 buckets. */
  val qStreamSliding: Q = (s, dir) => {
    import s.implicits._
    events(s, dir)
      .groupBy(window($"ts", "1 hour", "15 minutes"), $"event_type")
      .agg(count(lit(1)).as("n"))
      .select($"window.start".as("w_start"), $"event_type", $"n")
      .orderBy($"w_start", $"event_type")
  }

  /** Session windows (30-minute gap) per user: Spark's session_window in
    * batch mode; the oracle is the classic gaps-and-islands rewrite. A new
    * session starts when the gap is >= 30min (session end is exclusive). */
  val qStreamSession: Q = (s, dir) => {
    import s.implicits._
    events(s, dir)
      .groupBy($"user_id", session_window($"ts", "30 minutes"))
      .agg(count(lit(1)).as("n_events"), dsum($"value").as("sum_value"))
      .select($"user_id", $"session_window.start".as("s_start"),
        $"n_events", $"sum_value")
      .orderBy($"user_id", $"s_start")
  }

  /** Watermark late-data drop, batch-emulated PER KEY: arrival order =
    * event_id within each user; a row is late (dropped) if its event time
    * is > 10 minutes behind the running max event time of that user's
    * previously-arrived rows. Partitioning the arrival window by user_id
    * keeps the emulation shuffle-parallel — a global arrival order would
    * funnel the whole table through one task, the classic scale-killer.
    * (Spark's real watermark is also an approximation — the max event time
    * across partitions as of the previous micro-batch; the per-key form is
    * the scalable batch analog. True drop semantics are proven on a real
    * stream in StreamingParitySpec.) */
  val qStreamLate: Q = (s, dir) => {
    import s.implicits._
    val arrival = Window.partitionBy($"user_id").orderBy($"event_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    events(s, dir)
      .withColumn("ts_sec", unix_timestamp($"ts"))
      .withColumn("wm", max($"ts_sec").over(arrival) - 600)
      .filter($"wm".isNull || $"ts_sec" >= $"wm")
      .groupBy(window($"ts", "1 hour"), $"event_type")
      .agg(count(lit(1)).as("n"))
      .select($"window.start".as("w_start"), $"event_type", $"n")
      .orderBy($"w_start", $"event_type")
  }

  /** transformWithState batch analog (round 12) — q_stream_stateful's
    * sibling on Spark 4's SUCCESSOR arbitrary-state API: per-user final
    * state (event count, distinct event types, last event time) as a
    * StatefulProcessor with a ValueState would accumulate it. The
    * registry form is the batch-emulated equivalent (same precedent as
    * q_stream_stateful/q_stream_late: streaming runs can't be
    * oracle-hashed, batch analogs can); the REAL transformWithState op
    * — RocksDB state store, getHandle.getValueState, TimeMode.None —
    * runs in StreamingParitySpec and is asserted row-equal to THIS
    * query, so the oracle transitively checks the streaming path. */
  val qStreamStatefulTws: Q = (s, dir) => {
    import s.implicits._
    events(s, dir)
      .groupBy($"user_id")
      .agg(count(lit(1)).as("n_events"),
        countDistinct($"event_type").as("n_types"),
        max($"ts").as("last_ts"))
      .orderBy($"user_id")
  }

  /** Stateful sessionization summary (flatMapGroupsWithState batch analog):
    * per-user session count, total duration, events per session. */
  val qStreamStateful: Q = (s, dir) => {
    import s.implicits._
    val wArr = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
    val sessions = events(s, dir)
      .withColumn("prev_ts", lag($"ts", 1).over(wArr))
      .withColumn("new_s",
        when($"prev_ts".isNull ||
          $"ts".cast("double") - $"prev_ts".cast("double") >= 1800.0, 1)
          .otherwise(0))
      .withColumn("sid", sum($"new_s").over(
        Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy($"user_id", $"sid")
      .agg((unix_timestamp(max($"ts")) - unix_timestamp(min($"ts"))).as("dur"),
        count(lit(1)).as("n_ev"))
    sessions.groupBy($"user_id")
      .agg(count(lit(1)).as("n_sessions"),
        sum($"dur").as("total_dur_sec"),
        (sum($"n_ev").cast("double") / count(lit(1))).as("avg_events"))
      .orderBy($"user_id")
  }

  /** Streaming dedup batch form (dropDuplicatesWithinWatermark analog):
    * first event per (user_id, event_type) by (ts, event_id). */
  val qStreamDedup: Q = (s, dir) => {
    import s.implicits._
    val w = Window.partitionBy($"user_id", $"event_type")
      .orderBy($"ts", $"event_id")
    events(s, dir)
      .withColumn("rn", row_number().over(w))
      .withColumn("n_dups", count(lit(1)).over(
        Window.partitionBy($"user_id", $"event_type")))
      .filter($"rn" === 1)
      .select($"user_id", $"event_type", $"event_id", $"n_dups")
      .orderBy($"user_id", $"event_type")
  }

  /** Stream-stream join batch analog: each purchase joined to the same
    * user's clicks in the preceding 30 minutes (inclusive), aggregated to
    * clicks-per-purchase. The readStream form (StreamingOps.purchaseClicks,
    * proven in StreamingParitySpec) watermarks BOTH sides so the time-range
    * condition bounds the join state store. Scale: an equi-join on user_id
    * with a range post-filter — one shuffle, never a range cross product. */
  val qStreamJoin: Q = (s, dir) => {
    import s.implicits._
    val ev = events(s, dir)
    val clicks = ev.filter($"event_type" === "click")
      .select($"user_id".as("c_user"), $"ts".as("c_ts"), $"event_id".as("c_id"))
    val purch = ev.filter($"event_type" === "purchase")
      .select($"user_id", $"ts".as("p_ts"), $"event_id".as("p_id"))
    purch.join(clicks, $"user_id" === $"c_user" &&
        $"c_ts" <= $"p_ts" && $"c_ts" >= $"p_ts" - expr("INTERVAL 30 MINUTES"))
      .groupBy($"user_id", $"p_id")
      .agg(count(lit(1)).as("n_clicks"), max($"c_id").as("last_click"))
      .orderBy($"p_id")
  }

  /** Stream-static enrichment join batch analog: each event enriched with
    * the (static, broadcast) customer dimension, aggregated per (segment,
    * event type). In streaming this is the canonical dimension-join shape:
    * the static side is broadcast once per micro-batch, needs no watermark,
    * and adds no join state (StreamingOps.enrich runs the readStream form,
    * proven in StreamingParitySpec). */
  val qStreamEnrich: Q = (s, dir) => {
    import s.implicits._
    events(s, dir)
      .join(broadcast(table(s, dir, "customer")
        .select($"c_custkey", $"c_mktsegment")), $"user_id" === $"c_custkey")
      .groupBy($"c_mktsegment", $"event_type")
      .agg(count(lit(1)).as("n"), dsum($"value").as("sum_value"))
      .orderBy($"c_mktsegment", $"event_type")
  }

  /** Batch analog of the stream-stream LEFT OUTER join
    * (StreamingOps.purchaseClicksOuter, parity-proven in
    * StreamingParitySpec): every purchase keeps a row, n_clicks = 0 and
    * last_click null when no same-user click precedes it within 30
    * minutes — the attribution query where "unattributed" is itself the
    * signal. Same one-shuffle equi-join shape as qStreamJoin. */
  val qStreamOuter: Q = (s, dir) => {
    import s.implicits._
    val ev = events(s, dir)
    val clicks = ev.filter($"event_type" === "click")
      .select($"user_id".as("c_user"), $"ts".as("c_ts"), $"event_id".as("c_id"))
    val purch = ev.filter($"event_type" === "purchase")
      .select($"user_id", $"ts".as("p_ts"), $"event_id".as("p_id"))
    purch.join(clicks, $"user_id" === $"c_user" &&
        $"c_ts" <= $"p_ts" && $"c_ts" >= $"p_ts" - expr("INTERVAL 30 MINUTES"),
        "left_outer")
      .groupBy($"user_id", $"p_id")
      .agg(count($"c_id").as("n_clicks"), max($"c_id").as("last_click"))
      .orderBy($"p_id")
  }

  /** Batch analog of the stream-stream FULL OUTER join (round 17):
    * matched pairs, unattributed purchases AND orphan clicks, classified
    * per row and counted per user — the "every touchpoint accounted for"
    * attribution shape. The true streaming path (watermark-flushed
    * null-pads on BOTH sides) is proven row-equal in
    * StreamingParitySpec; this form carries the oracle. */
  val qStreamOuterFull: Q = (s, dir) => {
    import s.implicits._
    val ev = events(s, dir)
    val clicks = ev.filter($"event_type" === "click")
      .select($"user_id".as("c_user"), $"ts".as("c_ts"), $"event_id".as("c_id"))
    val purch = ev.filter($"event_type" === "purchase")
      .select($"user_id", $"ts".as("p_ts"), $"event_id".as("p_id"))
    purch.join(clicks, $"user_id" === $"c_user" &&
        $"c_ts" <= $"p_ts" && $"c_ts" >= $"p_ts" - expr("INTERVAL 30 MINUTES"),
        "full_outer")
      .select(coalesce($"user_id", $"c_user").as("uid"),
        when($"c_id".isNull, "purchase_only")
          .when($"p_id".isNull, "click_only")
          .otherwise("matched").as("kind"))
      .groupBy($"uid", $"kind").agg(count(lit(1)).as("n"))
      .orderBy($"uid", $"kind")
  }

  val queries: Map[String, Q] = Map(
    "q_stream_join" -> qStreamJoin,
    "q_stream_outer" -> qStreamOuter,
    "q_stream_outer_full" -> qStreamOuterFull,
    "q_stream_enrich" -> qStreamEnrich,
    "q_stream_tumbling" -> qStreamTumbling,
    "q_stream_sliding" -> qStreamSliding,
    "q_stream_session" -> qStreamSession,
    "q_stream_late" -> qStreamLate,
    "q_stream_stateful" -> qStreamStateful,
    "q_stream_stateful_tws" -> qStreamStatefulTws,
    "q_stream_dedup" -> qStreamDedup,
  )

  val oracleSql: Map[String, String] = Map(
    "q_stream_enrich" ->
      """SELECT c_mktsegment, event_type, count(*) AS n,
        | CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
        |FROM events JOIN customer ON user_id = c_custkey
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q_stream_outer_full" ->
      """WITH e AS (SELECT user_id, event_id, event_type, ts::TIMESTAMP AS ts FROM events),
        |c AS (SELECT user_id AS c_user, ts AS c_ts, event_id AS c_id FROM e WHERE event_type = 'click'),
        |p AS (SELECT user_id, ts AS p_ts, event_id AS p_id FROM e WHERE event_type = 'purchase')
        |SELECT coalesce(user_id, c_user) AS uid,
        | CASE WHEN c_id IS NULL THEN 'purchase_only'
        |      WHEN p_id IS NULL THEN 'click_only'
        |      ELSE 'matched' END AS kind,
        | count(*) AS n
        |FROM p FULL OUTER JOIN c ON user_id = c_user AND c_ts <= p_ts
        | AND c_ts >= p_ts - INTERVAL 30 MINUTE
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q_stream_join" ->
      """WITH e AS (SELECT user_id, event_id, event_type, ts::TIMESTAMP AS ts FROM events),
        |c AS (SELECT user_id AS c_user, ts AS c_ts, event_id AS c_id FROM e WHERE event_type = 'click'),
        |p AS (SELECT user_id, ts AS p_ts, event_id AS p_id FROM e WHERE event_type = 'purchase')
        |SELECT user_id, p_id, count(*) AS n_clicks, max(c_id) AS last_click
        |FROM p JOIN c ON user_id = c_user AND c_ts <= p_ts
        | AND c_ts >= p_ts - INTERVAL 30 MINUTE
        |GROUP BY user_id, p_id ORDER BY p_id""".stripMargin,
    "q_stream_outer" ->
      """WITH e AS (SELECT user_id, event_id, event_type, ts::TIMESTAMP AS ts FROM events),
        |c AS (SELECT user_id AS c_user, ts AS c_ts, event_id AS c_id FROM e WHERE event_type = 'click'),
        |p AS (SELECT user_id, ts AS p_ts, event_id AS p_id FROM e WHERE event_type = 'purchase')
        |SELECT user_id, p_id, count(c_id) AS n_clicks, max(c_id) AS last_click
        |FROM p LEFT JOIN c ON user_id = c_user AND c_ts <= p_ts
        | AND c_ts >= p_ts - INTERVAL 30 MINUTE
        |GROUP BY user_id, p_id ORDER BY p_id""".stripMargin,
    "q_stream_tumbling" ->
      """SELECT date_trunc('hour', ts::TIMESTAMP) AS w_start, event_type,
        | count(*) AS n,
        | CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
        |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q_stream_sliding" ->
      """SELECT TIMESTAMP '1970-01-01'
        |  + ((CAST(floor(epoch(ts::TIMESTAMP)/900) AS BIGINT) - k) * 900) * INTERVAL 1 SECOND
        |  AS w_start, event_type, count(*) AS n
        |FROM events, unnest(generate_series(0,3)) AS t(k)
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q_stream_session" ->
      """WITH e AS (SELECT user_id, event_id, value, ts::TIMESTAMP AS ts FROM events),
        |flagged AS (SELECT *, CASE WHEN prev_ts IS NULL
        |   OR epoch(ts) - epoch(prev_ts) >= 1800 THEN 1 ELSE 0 END AS new_s
        |  FROM (SELECT *, lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts FROM e)),
        |sess AS (SELECT *, sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid FROM flagged)
        |SELECT user_id, min(ts) AS s_start, count(*) AS n_events,
        | CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
        |FROM sess GROUP BY user_id, sid ORDER BY user_id, s_start""".stripMargin,
    "q_stream_late" ->
      """WITH e AS (SELECT user_id, event_id, event_type, ts::TIMESTAMP AS ts,
        |  CAST(floor(epoch(ts::TIMESTAMP)) AS BIGINT) AS ts_sec FROM events),
        |wm AS (SELECT *, max(ts_sec) OVER (PARTITION BY user_id ORDER BY event_id
        |   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) - 600 AS wm FROM e)
        |SELECT date_trunc('hour', ts) AS w_start, event_type, count(*) AS n
        |FROM wm WHERE wm IS NULL OR ts_sec >= wm
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    // per-user final state a transformWithState processor accumulates,
    // recomputed relationally
    "q_stream_stateful_tws" ->
      """SELECT user_id, count(*) AS n_events,
        | count(DISTINCT event_type) AS n_types,
        | max(ts::TIMESTAMP) AS last_ts
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_stream_stateful" ->
      """WITH e AS (SELECT user_id, event_id, ts::TIMESTAMP AS ts FROM events),
        |flagged AS (SELECT *, CASE WHEN prev_ts IS NULL
        |   OR epoch(ts) - epoch(prev_ts) >= 1800 THEN 1 ELSE 0 END AS new_s
        |  FROM (SELECT *, lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts FROM e)),
        |sess AS (SELECT *, sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid FROM flagged),
        |persess AS (SELECT user_id, sid,
        |   CAST(floor(epoch(max(ts))) AS BIGINT) - CAST(floor(epoch(min(ts))) AS BIGINT) AS dur,
        |   count(*) AS n_ev
        |  FROM sess GROUP BY user_id, sid)
        |SELECT user_id, count(*) AS n_sessions,
        | CAST(sum(dur) AS BIGINT) AS total_dur_sec,
        | CAST(sum(n_ev) AS DOUBLE)/count(*) AS avg_events
        |FROM persess GROUP BY user_id ORDER BY user_id""".stripMargin,
    "q_stream_dedup" ->
      """SELECT user_id, event_type, event_id, n_dups FROM (
        | SELECT user_id, event_type, event_id,
        |  row_number() OVER (PARTITION BY user_id, event_type ORDER BY ts::TIMESTAMP, event_id) AS rn,
        |  count(*) OVER (PARTITION BY user_id, event_type) AS n_dups
        | FROM events) WHERE rn = 1
        |ORDER BY user_id, event_type""".stripMargin,
  )
}
