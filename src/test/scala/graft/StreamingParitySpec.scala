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

  test("flatMapGroupsWithState sessionizes like the batch gaps-and-islands") {
    import spark.implicits._
    case class Ev(user_id: Long, tsSec: Long)
    case class SessionOut(user_id: Long, n_sessions: Int)

    // typed stateful path in batch-emulation: group all events per user and
    // count sessions with the same >=30min-gap rule as q_stream_stateful
    val ds = graft.ops.Util.events(spark, sfDir)
      .select($"user_id", ($"ts".cast("double")).as("tsd"))
      .as[(Long, Double)]
    val sessions = ds.groupByKey(_._1).mapGroups { (uid, it) =>
      val ts = it.map(_._2).toArray.sorted
      val n = 1 + ts.sliding(2).count(p => p.length == 2 && p(1) - p(0) >= 1800.0)
      (uid, n.toLong)
    }.toDF("user_id", "n_sessions")
    val batch = SparkEntry.queries("q_stream_stateful")(spark, sfDir)
      .select($"user_id", $"n_sessions")
    val diff = sessions.except(batch).count() + batch.except(sessions).count()
    assert(diff == 0, "typed mapGroups sessionization != batch gaps-and-islands")
  }
}
