package graft

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types._

/** SURVEY §2.10 / §5.3(3): each streaming operator runs for real via
  * readStream → memory sink and must equal its batch-equivalent form; the
  * watermark test feeds two micro-batches with a late row and asserts the
  * drop. This suite, not the batch queries, is the evidence for streaming
  * semantics. */
class StreamingParitySpec extends SparkSuite {

  /** The events table as a (bounded) stream via the library's streaming
    * surface (graft.streaming.StreamingOps). readStream needs a directory,
    * so the fixture file is linked into a temp dir once. */
  private lazy val eventsDir: String = {
    val d = java.nio.file.Files.createTempDirectory("graft_events")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sfDir/events.parquet"),
      d.resolve("events.parquet"))
    d.toString
  }

  private def eventStream: DataFrame =
    graft.streaming.StreamingOps.readEvents(spark, eventsDir)

  private def runToBatch(stream: DataFrame, name: String,
      mode: String = "complete"): DataFrame = {
    val q = stream.writeStream.outputMode(mode)
      .format("memory").queryName(name).start()
    q.processAllAvailable()
    q.stop()
    spark.table(name)
  }

  private def assertSetEqual(a: DataFrame, b: DataFrame, ctx: String): Unit = {
    val extra = a.exceptAll(b).count()
    val missing = b.exceptAll(a).count()
    assert(extra == 0 && missing == 0,
      s"$ctx: stream vs batch mismatch (extra=$extra missing=$missing)")
  }

  test("tumbling window: stream == batch") {
    val streamed = runToBatch(
      graft.streaming.StreamingOps.tumbling(eventStream), "t_tumbling")
    val batch = graft.streaming.StreamingOps.tumbling(
      graft.ops.Util.events(spark, sfDir))
    assertSetEqual(streamed, batch, "tumbling")
  }

  test("sliding window: stream == batch") {
    val streamed = runToBatch(
      graft.streaming.StreamingOps.sliding(eventStream), "t_sliding")
    val batch = graft.streaming.StreamingOps.sliding(
      graft.ops.Util.events(spark, sfDir))
    assertSetEqual(streamed, batch, "sliding")
  }

  test("hourly OHLC: stream == batch declared query") {
    import org.apache.spark.sql.functions.col
    val streamed = runToBatch(
      graft.streaming.StreamingOps.ohlc(eventStream), "t_ohlc")
      .select("event_type", "hour", "open", "close", "high", "low", "n_events")
    // parity against the DECLARED batch query (date_trunc('hour') ==
    // 1-hour tumbling window start), not a re-derivation
    val batch = SparkEntry.queries("q_ts_ohlc")(spark, sfDir)
      .select(col("event_type"), col("hour"),
        col("open"), col("close"), col("high"), col("low"), col("n_events"))
    assertSetEqual(streamed, batch, "ohlc")
  }

  test("session window: stream == batch") {
    val streamed = runToBatch(
      graft.streaming.StreamingOps.sessions(eventStream), "t_session")
    val batch = graft.streaming.StreamingOps.sessions(
      graft.ops.Util.events(spark, sfDir))
    assertSetEqual(streamed, batch, "session")
  }

  test("streaming dedup within watermark drops replayed event_ids") {
    val streamed = runToBatch(
      graft.streaming.StreamingOps.dedup(eventStream).select(col("event_id")),
      "t_dedup", mode = "append")
    // event_id is unique in the fixture, so dedup must be a no-op
    val n = graft.ops.Util.events(spark, sfDir).count()
    assert(streamed.count() == n)
  }

  test("stream-static enrichment join: stream == batch") {
    import spark.implicits._
    val dim = spark.read.parquet(s"$sfDir/customer.parquet")
      .select($"c_custkey", $"c_mktsegment")
    val streamed = runToBatch(
      graft.streaming.StreamingOps.enrich(eventStream, dim), "t_enrich")
    val batch = graft.streaming.StreamingOps.enrich(
      graft.ops.Util.events(spark, sfDir), dim)
    assertSetEqual(streamed, batch, "stream-static enrich")
  }

  test("stream-stream purchase/click join: stream == batch pairs") {
    import spark.implicits._
    val streamed = runToBatch(
      graft.streaming.StreamingOps.purchaseClicks(eventStream),
      "t_ssjoin", mode = "append")
    val ev = graft.ops.Util.events(spark, sfDir)
    val clicks = ev.filter($"event_type" === "click")
      .select($"user_id".as("c_user"), $"ts".as("c_ts"), $"event_id".as("c_id"))
    val purch = ev.filter($"event_type" === "purchase")
      .select($"user_id", $"ts".as("p_ts"), $"event_id".as("p_id"))
    val batch = purch.join(clicks, $"user_id" === $"c_user" &&
        $"c_ts" <= $"p_ts" && $"c_ts" >= $"p_ts" - expr("INTERVAL 30 MINUTES"))
      .select($"user_id", $"p_id", $"c_id")
    assertSetEqual(streamed, batch, "stream-stream join")
  }

  test("stream-stream LEFT OUTER join: null-padded rows flush at the watermark") {
    import spark.implicits._
    // Outer results only emit once the GLOBAL watermark passes a row's
    // join window, and a finite stream's tail never flushes on its own —
    // so feed sentinel click+purchase rows 2 h past the fixture horizon
    // (negative ids) purely to advance both watermarks. The sentinel file
    // must carry the SAME raw ts type as the fixture (nanos LONG vs µs
    // NTZ has differed across fixture generations) or the mixed directory
    // fails the parquet read.
    val ev = graft.ops.Util.events(spark, sfDir)
    val maxMs = ev.agg(max($"ts")).head().getTimestamp(0).getTime
    val d = java.nio.file.Files.createTempDirectory("graft_events_outer")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sfDir/events.parquet"),
      d.resolve("events.parquet"))
    val sentinelUs = (maxMs + 2 * 3600 * 1000L) * 1000L
    val rawTsType = spark.read.parquet(s"$sfDir/events.parquet").schema("ts").dataType
    val tsCol = rawTsType match {
      case LongType         => $"ts_us" * 1000L
      case TimestampNTZType => timestamp_micros($"ts_us").cast(TimestampNTZType)
      case TimestampType    => timestamp_micros($"ts_us")
      case other => fail(s"unsupported fixture ts type $other")
    }
    Seq((-1L, sentinelUs, -1L, "click", 0.0, "{}"),
        (-2L, sentinelUs, -1L, "purchase", 0.0, "{}"))
      .toDF("event_id", "ts_us", "user_id", "event_type", "value", "props")
      .select($"event_id", tsCol.as("ts"), $"user_id", $"event_type",
        $"value", $"props")
      .write.mode("append").parquet(d.toString)
    val streamed = runToBatch(
      graft.streaming.StreamingOps.purchaseClicksOuter(
        graft.streaming.StreamingOps.readEvents(spark, d.toString)),
      "t_ssouter", mode = "append")
      .filter($"user_id" >= 0)
    val clicks = ev.filter($"event_type" === "click")
      .select($"user_id".as("c_user"), $"ts".as("c_ts"), $"event_id".as("c_id"))
    val purch = ev.filter($"event_type" === "purchase")
      .select($"user_id", $"ts".as("p_ts"), $"event_id".as("p_id"))
    val batch = purch.join(clicks, $"user_id" === $"c_user" &&
        $"c_ts" <= $"p_ts" && $"c_ts" >= $"p_ts" - expr("INTERVAL 30 MINUTES"),
        "left_outer")
      .select($"user_id", $"p_id", $"c_id")
    assertSetEqual(streamed, batch, "stream-stream left-outer join")
    assert(streamed.filter($"c_id".isNull).count() > 0,
      "expected at least one null-padded (unattributed) purchase")
  }

  test("stream-stream FULL OUTER join: both sides' null-pads flush at the watermark") {
    import spark.implicits._
    // same sentinel discipline as the left-outer test: advance BOTH
    // watermarks 2 h past the fixture horizon so every outer result is
    // provably unmatchable and flushes
    val ev = graft.ops.Util.events(spark, sfDir)
    val maxMs = ev.agg(max($"ts")).head().getTimestamp(0).getTime
    val d = java.nio.file.Files.createTempDirectory("graft_events_fouter")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sfDir/events.parquet"),
      d.resolve("events.parquet"))
    val sentinelUs = (maxMs + 2 * 3600 * 1000L) * 1000L
    val rawTsType = spark.read.parquet(s"$sfDir/events.parquet").schema("ts").dataType
    val tsCol = rawTsType match {
      case LongType         => $"ts_us" * 1000L
      case TimestampNTZType => timestamp_micros($"ts_us").cast(TimestampNTZType)
      case TimestampType    => timestamp_micros($"ts_us")
      case other => fail(s"unsupported fixture ts type $other")
    }
    Seq((-1L, sentinelUs, -1L, "click", 0.0, "{}"),
        (-2L, sentinelUs, -1L, "purchase", 0.0, "{}"))
      .toDF("event_id", "ts_us", "user_id", "event_type", "value", "props")
      .select($"event_id", tsCol.as("ts"), $"user_id", $"event_type",
        $"value", $"props")
      .write.mode("append").parquet(d.toString)
    val streamed = runToBatch(
      graft.streaming.StreamingOps.purchaseClicksFullOuter(
        graft.streaming.StreamingOps.readEvents(spark, d.toString)),
      "t_ssfouter", mode = "append")
      .filter($"user_id" >= 0)
    val clicks = ev.filter($"event_type" === "click")
      .select($"user_id".as("c_user"), $"ts".as("c_ts"), $"event_id".as("c_id"))
    val purch = ev.filter($"event_type" === "purchase")
      .select($"user_id", $"ts".as("p_ts"), $"event_id".as("p_id"))
    val batch = purch.join(clicks, $"user_id" === $"c_user" &&
        $"c_ts" <= $"p_ts" && $"c_ts" >= $"p_ts" - expr("INTERVAL 30 MINUTES"),
        "full_outer")
      .select(coalesce($"user_id", $"c_user").as("user_id"), $"p_id", $"c_id")
    assertSetEqual(streamed, batch, "stream-stream full-outer join")
    assert(streamed.filter($"c_id".isNull).count() > 0,
      "expected at least one unattributed purchase")
    assert(streamed.filter($"p_id".isNull).count() > 0,
      "expected at least one orphan click (the full-outer addition)")
  }

  test("FULL OUTER join eviction: watermark expiry emits each null-pad exactly once across micro-batch boundaries") {
    import java.nio.file.Files
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_fouter_evict").toFile
    val srcDir = new java.io.File(dir, "src"); srcDir.mkdirs()
    def write(rows: Seq[(Long, String, Long, String)], file: String): Unit =
      rows.toDF("event_id", "ts_s", "user_id", "event_type")
        .select($"event_id", $"ts_s".cast("timestamp").as("ts"),
          $"user_id", $"event_type")
        .coalesce(1).write.mode("append").parquet(s"$srcDir/$file")
    val schema = StructType(Seq(StructField("event_id", LongType),
      StructField("ts", TimestampType), StructField("user_id", LongType),
      StructField("event_type", StringType)))
    // b1: one UNMATCHABLE purchase (user 1) and one UNMATCHABLE click
    // (user 2) — the rows whose state must expire and null-pad
    write(Seq((101L, "2024-01-01 12:00:00", 1L, "purchase"),
              (201L, "2024-01-01 12:00:00", 2L, "click")), "b1")
    val events = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(s"$srcDir/*")
    val q = graft.streaming.StreamingOps.purchaseClicksFullOuter(events)
      .writeStream.outputMode("append")
      .format("memory").queryName("t_fo_evict").start()
    q.processAllAvailable()
    def pads() = {
      val t = spark.table("t_fo_evict")
      (t.filter($"p_id" === 101L && $"c_id".isNull).count(),
        t.filter($"c_id" === 201L && $"p_id".isNull).count())
    }
    // watermark after b1 is 11:50 — neither side's window has passed,
    // so nothing may flush yet
    assert(pads() == ((0L, 0L)),
      s"null-pads emitted before the watermark passed: ${pads()}")
    // b2/b3: matched advancer pairs push the watermark to 12:50 then
    // 13:50; the purchase expires once the CLICK-side watermark passes
    // p_ts (12:00), the click once the PURCHASE-side watermark passes
    // c_ts + 30min (12:30) — both thresholds are crossed by b2's
    // end-of-batch watermark, so the pads must appear by the END of b3
    // (eviction runs against the watermark of the PREVIOUS batch end)
    write(Seq((301L, "2024-01-01 13:00:00", 90L, "purchase"),
              (302L, "2024-01-01 13:00:00", 90L, "click")), "b2")
    q.processAllAvailable()
    write(Seq((401L, "2024-01-01 14:00:00", 91L, "purchase"),
              (402L, "2024-01-01 14:00:00", 91L, "click")), "b3")
    q.processAllAvailable()
    assert(pads() == ((1L, 1L)),
      s"both-side null-pads must flush after the watermark passes: ${pads()}")
    // b4: a further advance must NOT re-emit evicted state — the pads
    // stay exactly-once across every later micro-batch boundary
    write(Seq((501L, "2024-01-01 15:00:00", 92L, "purchase"),
              (502L, "2024-01-01 15:00:00", 92L, "click")), "b4")
    q.processAllAvailable()
    q.stop()
    assert(pads() == ((1L, 1L)),
      s"a later micro-batch re-emitted evicted null-pads: ${pads()}")
    // the matched advancer pairs joined as inner rows exactly once each
    val inner = spark.table("t_fo_evict")
      .filter($"p_id".isNotNull && $"c_id".isNotNull)
    assert(inner.count() == 3 &&
      inner.select($"user_id").as[Long].collect().sorted.toSeq == Seq(90L, 91L, 92L),
      "matched pairs must emit exactly once each")
  }

  test("session/stateful results are invariant across 4 vs 16 shuffle partitions") {
    // partition-count determinism for the stateful pair, matching the
    // batch determinism audit: the suite runs everything at 4 shuffle
    // partitions; re-running in a sibling session at 16 must produce the
    // identical ordered result (same SparkContext, different partitioning)
    val s16 = spark.newSession()
    s16.conf.set("spark.sql.shuffle.partitions", "16")
    Seq("q_stream_session", "q_stream_stateful").foreach { q =>
      val a = SparkEntry.queries(q)(spark, sfDir).collect().toSeq
      val b = SparkEntry.queries(q)(s16, sfDir).collect().toSeq
      assert(a == b, s"$q differs between 4 and 16 shuffle partitions")
    }
  }

  test("watermark drops a late row (two micro-batches through a file source)") {
    import java.nio.file.Files
    val dir = Files.createTempDirectory("graft_late").toFile
    val srcDir = new java.io.File(dir, "src"); srcDir.mkdirs()
    import spark.implicits._
    val schema = StructType(Seq(StructField("ts", TimestampType),
      StructField("k", StringType)))

    def write(batch: Seq[(String, String)], file: String): Unit =
      batch.toDF("ts_s", "k")
        .select($"ts_s".cast("timestamp").as("ts"), $"k")
        .coalesce(1).write.mode("append").parquet(s"$srcDir/$file")

    // batch 1 advances event time to 12:00 → watermark 11:50
    write(Seq(("2024-01-01 12:00:00", "on_time")), "b1")
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(s"$srcDir/*")
      .withWatermark("ts", "10 minutes")
      .groupBy(window($"ts", "5 minutes")).agg(count(lit(1)).as("n"))
    val q = stream.writeStream.outputMode("append")
      .format("memory").queryName("t_late").start()
    q.processAllAvailable()
    // batch 2: one row 30 min late (11:30 < watermark 11:50) + one on time
    write(Seq(("2024-01-01 11:30:00", "late"),
      ("2024-01-01 12:20:00", "on_time2")), "b2")
    q.processAllAvailable()
    // batch 3 pushes the watermark past 12:20 so its window can emit
    write(Seq(("2024-01-01 13:00:00", "flush")), "b3")
    q.processAllAvailable()
    q.stop()
    val emitted = spark.table("t_late")
      .select(col("window.start").cast("string")).as[String].collect().toSet
    assert(emitted.contains("2024-01-01 12:00:00"), s"on-time window missing: $emitted")
    assert(emitted.contains("2024-01-01 12:20:00"), s"second window missing: $emitted")
    assert(!emitted.contains("2024-01-01 11:30:00"), s"late row was not dropped: $emitted")
  }

  test("parquet file sink with checkpoint is exactly-once across a restart") {
    import java.nio.file.Files
    val out = Files.createTempDirectory("graft_sink").toString
    val cp = Files.createTempDirectory("graft_cp").toString
    def run(): Unit = {
      val q = eventStream.select(col("event_id"), col("user_id"))
        .writeStream.format("parquet")
        .option("path", s"$out/data").option("checkpointLocation", cp)
        .outputMode("append").start()
      q.processAllAvailable(); q.stop()
    }
    run()
    val n = graft.ops.Util.events(spark, sfDir).count()
    assert(spark.read.parquet(s"$out/data").count() == n,
      "file sink missed or duplicated rows")
    // restart against the SAME checkpoint: the committed batch must not
    // replay — this is the exactly-once contract of the file sink
    run()
    assert(spark.read.parquet(s"$out/data").count() == n,
      "restart with checkpoint replayed rows (exactly-once violated)")
  }

  test("foreachBatch sink runs custom per-micro-batch logic with batch ids") {
    import java.nio.file.Files
    val out = Files.createTempDirectory("graft_feb").toString
    val seenBatches = java.util.concurrent.ConcurrentHashMap.newKeySet[Long]()
    val q = eventStream
      .writeStream
      .foreachBatch { (df: DataFrame, batchId: Long) =>
        seenBatches.add(batchId)
        // arbitrary per-batch logic: aggregate THIS micro-batch and append
        df.groupBy(col("event_type")).agg(count(lit(1)).as("n"))
          .coalesce(1).write.mode("append").parquet(s"$out/agg")
      }
      .start()
    q.processAllAvailable(); q.stop()
    assert(!seenBatches.isEmpty, "foreachBatch never ran")
    // per-batch partial counts re-aggregate to the batch totals
    val streamed = spark.read.parquet(s"$out/agg")
      .groupBy(col("event_type")).agg(sum(col("n")).as("n"))
    val batch = graft.ops.Util.events(spark, sfDir)
      .groupBy(col("event_type")).agg(count(lit(1)).as("n"))
    val diff = streamed.except(batch).count() + batch.except(streamed).count()
    assert(diff == 0, "foreachBatch partial aggregates != batch totals")
  }

  test("flatMapGroupsWithState on the stream sessionizes like batch gaps-and-islands") {
    import spark.implicits._
    // Real streaming stateful op: per-user sessionization via
    // flatMapGroupsWithState over the event stream (single micro-batch of
    // the bounded source finalizes every group), compared to the oracle-
    // checked batch form. Event times in fractional seconds (full µs).
    val ds = eventStream
      .select($"user_id", $"ts".cast("double").as("tsd"))
      .as[(Long, Double)]
    val counted = ds.groupByKey(_._1)
      .flatMapGroupsWithState[Array[Double], (Long, Long)](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (uid: Long, it: Iterator[(Long, Double)], state: GroupState[Array[Double]]) =>
          val prev = if (state.exists) state.get else Array.empty[Double]
          val all = (prev ++ it.map(_._2)).sorted
          state.update(all)
          val n = 1 + all.sliding(2).count(p => p.length == 2 && p(1) - p(0) >= 1800.0)
          Iterator.single((uid, n.toLong))
      }.toDF("user_id", "n_sessions")
    val q = counted.writeStream.outputMode("append")
      .format("memory").queryName("t_stateful").start()
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("t_stateful")
    val batch = SparkEntry.queries("q_stream_stateful")(spark, sfDir)
      .select($"user_id", $"n_sessions")
    val diff = streamed.except(batch).count() + batch.except(streamed).count()
    assert(diff == 0, "streaming flatMapGroupsWithState != batch gaps-and-islands")
  }

  test("transformWithState (Spark 4 arbitrary state API) == q_stream_stateful_tws batch analog") {
    import spark.implicits._
    import org.apache.spark.sql.streaming.{StatefulProcessor, TimeMode, TTLConfig, TimerValues}
    import org.apache.spark.sql.Encoders

    // per-user final state a StatefulProcessor accumulates: event count,
    // distinct event types, max event-time micros — exactly what the
    // oracle-checked registry entry computes relationally, so the DuckDB
    // oracle transitively checks this streaming path
    class StateProcessor
      extends StatefulProcessor[Long, (Long, String, Long), (Long, Long, Long, Long)] {
      @transient private var st: org.apache.spark.sql.streaming.ValueState[(Long, Set[String], Long)] = _
      override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
        st = getHandle.getValueState[(Long, Set[String], Long)]("st",
          Encoders.kryo[(Long, Set[String], Long)], TTLConfig.NONE)
      override def handleInputRows(key: Long, rows: Iterator[(Long, String, Long)],
          timerValues: TimerValues): Iterator[(Long, Long, Long, Long)] = {
        var (n, types, maxTs) =
          if (st.exists()) st.get() else (0L, Set.empty[String], Long.MinValue)
        rows.foreach { case (_, tpe, micros) =>
          n += 1; types += tpe; if (micros > maxTs) maxTs = micros
        }
        st.update((n, types, maxTs))
        Iterator.single((key, n, types.size.toLong, maxTs))
      }
    }

    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val ds = eventStream.select(col("user_id"), col("event_type"),
          expr("unix_micros(ts)"))
        .as[(Long, String, Long)]
      val out = ds.groupByKey(_._1)
        .transformWithState(new StateProcessor, TimeMode.None(), OutputMode.Update())
        .toDF("user_id", "n_events", "n_types", "max_micros")
      val q = out.writeStream.outputMode("update")
        .format("memory").queryName("t_tws").start()
      q.processAllAvailable()
      q.stop()
      // the last update per user is the final state
      val streamed = spark.table("t_tws")
        .groupBy(col("user_id")).agg(max(col("n_events")).as("n_events"),
          max(col("n_types")).as("n_types"), max(col("max_micros")).as("m"))
      val batch = SparkEntry.queries("q_stream_stateful_tws")(spark, sfDir)
        .select(col("user_id"), col("n_events"), col("n_types"),
          expr("unix_micros(last_ts)").as("m"))
      val diff = streamed.except(batch).count() + batch.except(streamed).count()
      assert(diff == 0,
        "transformWithState final state != q_stream_stateful_tws batch analog")
    } finally {
      spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    }
  }

  test("Trigger.AvailableNow drains the admission-controlled DSv2 source exactly once") {
    import spark.implicits._
    // the AvailableNow wrapper snapshots reportLatestOffset() as its end
    // target and feeds batches through latestOffset(start, limit) — the
    // surface SupportsAdmissionControl obliges a source to get right
    // (r18 review: a null reportLatestOffset or an ignored ReadLimit
    // breaks this trigger)
    val q = spark.readStream.format("graft.sources.SynthSource")
      .option("rows", "5000").option("slices", "4")
      .option("microBatchRows", "512")
      .load()
      .writeStream.outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .format("memory").queryName("t_availnow").start()
    assert(q.awaitTermination(120000), "AvailableNow query did not finish")
    val agg = spark.table("t_availnow")
      .agg(count(lit(1)), countDistinct($"id")).head()
    assert(agg.getLong(0) == 5000L && agg.getLong(1) == 5000L,
      s"AvailableNow drained ${agg.getLong(0)} rows (${agg.getLong(1)} distinct)")
  }

  test("DSv2 micro-batch stream (q_src_stream): stream == batch, in real increments") {
    // the SAME connector serves readStream: 20k ids admitted 3000/trigger
    val stream = spark.readStream.format("graft.sources.SynthSource")
      .option("rows", "20000").option("slices", "4")
      .option("microBatchRows", "3000").load()
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n"), sum(col("val")).as("sum_val"),
        max(col("id")).as("max_id"))
    val q = stream.writeStream.outputMode("complete")
      .format("memory").queryName("t_src_stream").start()
    q.processAllAvailable()
    val batchesWithRows = q.recentProgress.count(_.numInputRows > 0)
    q.stop()
    val streamed = spark.table("t_src_stream")
    val batch = SparkEntry.queries("q_src_stream")(spark, sfDir)
    assertSetEqual(streamed, batch, "dsv2 micro-batch")
    // 20000 rows / 3000-row admission quantum => at least 7 non-empty batches
    assert(batchesWithRows >= 7,
      s"stream drained in $batchesWithRows batches — admission control not engaged")
  }
}
