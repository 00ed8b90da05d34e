package graft

import java.io.File

import org.apache.spark.sql.functions._

import graft.sources.GraftStore

/** Hidden-partitioning transforms (`days(ts)`, `trunc(w,col)`) and the
  * temporal manifest stats they ride on, pinned at the protocol level:
  *
  *  - the writer records min/max/mono stats for timestamp columns (epoch
  *    micros — order-isomorphic to event time) and the rolling write
  *    makes every file single-valued on the DERIVED day;
  *  - a `ts` RANGE predicate — what users actually write; they never see
  *    a day value — prunes whole files from manifest stats;
  *  - dropping a whole day is a METADATA-ONLY delete (entire-file proof
  *    from the same micros bounds, zero data I/O);
  *  - min/max(ts) is a metadata-only aggregate ("freshest event" costs
  *    one manifest read — proven brutally: data files deleted, still
  *    answers);
  *  - trunc(w, string) rolls per prefix; bucket transforms are refused
  *    (not monotone — a source-ordered write cannot prove single-valued
  *    files without a derived-value exchange key).
  */
class TransformPartitionSpec extends SparkSuite {

  private val DayMicros = 86400000000L

  /** 8 UTC days × 24 hourly events, written `PARTITIONED BY (days(ts))`
    * with a range-partitioned (ORDER BY) upstream so each day lands
    * contiguously in few tasks. */
  private def daysTable(): String = {
    val root = graft.ops.Util.managedTempDir("graft_tpart_spec_")
    val s2 = spark.newSession()
    s2.conf.set("spark.sql.catalog.gtp", "graft.sources.GraftCatalog")
    s2.conf.set("spark.sql.catalog.gtp.root", root)
    s2.range(0, 192).selectExpr(
      "id AS event_id",
      "timestamp_seconds(1704067200 + id * 3600) AS ts", // 2024-01-01 +1h/row
      "CAST(id % 7 AS DOUBLE) AS value")
      .createOrReplaceTempView("tpart_src")
    s2.sql(
      """CREATE TABLE gtp.e PARTITIONED BY (days(ts)) AS
        |SELECT event_id, ts, value FROM tpart_src ORDER BY ts""".stripMargin)
    s"$root/e"
  }

  private def entries(path: String) = GraftStore.readManifest(path).get._2

  test("days(ts) writes single-day files with exact micros stats") {
    val path = daysTable()
    assert(GraftStore.readPartitionBy(path).contains("days(ts)"))
    val es = entries(path)
    assert(es.nonEmpty && es.map(_.rows).sum == 192)
    // every file spans exactly one UTC day, proven from its OWN ts stats
    es.foreach { e =>
      val st = e.stats("ts")
      assert(st.min.nonEmpty && st.nulls == 0)
      assert(Math.floorDiv(st.min.toLong, DayMicros) ==
        Math.floorDiv(st.max.toLong, DayMicros),
        s"file ${e.file} straddles days: ${st.min}..${st.max}")
      assert(st.mono, "the demanded ordering makes each file ts-sorted")
      assert(st.sum.isEmpty, "no wrap-sum recorded for temporal columns")
    }
    // all 8 days present
    val days = es.map(e => Math.floorDiv(e.stats("ts").min.toLong, DayMicros))
    assert(days.distinct.size == 8)
    // the ORDER BY upstream keeps the file count near the day count —
    // the layout a 100 TB ingest would get, not one file per task × day
    assert(es.size <= 16, s"expected ~1-2 files/day, got ${es.size}")
  }

  test("a ts range predicate prunes whole files from micros bounds") {
    import spark.implicits._
    val path = daysTable()
    val total = entries(path).size
    val df = spark.read.format("graft.sources.GraftStore")
      .option("path", path).load()
      .filter($"ts" >= lit("2024-01-03 00:00:00").cast("timestamp") &&
        $"ts" < lit("2024-01-05 00:00:00").cast("timestamp"))
    assert(df.count() == 48, "two full days")
    val planned = df.queryExecution.executedPlan.toString
    val m = "files=(\\d+)/(\\d+)".r.findFirstMatchIn(planned)
    assert(m.isDefined, s"scan description missing file counts:\n$planned")
    val (kept, all) = (m.get.group(1).toInt, m.get.group(2).toInt)
    assert(all == total)
    val daysOf = entries(path).map(e =>
      Math.floorDiv(e.stats("ts").min.toLong, DayMicros)).distinct.size
    // exactly the files of days 3 and 4 survive (2 of 8 days)
    assert(kept <= math.ceil(total.toDouble / daysOf).toInt * 2 && kept < total,
      s"expected ~2 days of files kept, got $kept/$all")
  }

  test("dropping a whole day is a metadata-only DELETE, zero data I/O") {
    val path = daysTable()
    val before = entries(path)
    val victims = before.filter(e =>
      Math.floorDiv(e.stats("ts").min.toLong, DayMicros) ==
        Math.floorDiv(
          java.time.Instant.parse("2024-01-02T00:00:00Z").toEpochMilli * 1000L,
          DayMicros))
    assert(victims.nonEmpty)
    val keptMtimes = before.filterNot(victims.contains)
      .map(e => new File(path, e.file).lastModified()).toSet

    val s2 = spark.newSession()
    s2.conf.set("spark.sql.catalog.gtp2", "graft.sources.GraftCatalog")
    s2.conf.set("spark.sql.catalog.gtp2.root", new File(path).getParent)
    s2.sql(
      """DELETE FROM gtp2.e
        |WHERE ts >= TIMESTAMP '2024-01-02 00:00:00'
        |  AND ts < TIMESTAMP '2024-01-03 00:00:00'""".stripMargin)

    val after = entries(path)
    assert(after.size == before.size - victims.size)
    assert(after.forall(e => !victims.exists(_.file == e.file)))
    // kept files untouched (no copy-on-write rewrite happened)
    assert(after.map(e => new File(path, e.file).lastModified()).toSet ==
      keptMtimes)
    val (v, _, _, op) = GraftStore.history(path).last
    assert(op == "delete", s"expected a metadata delete commit, got $op at v$v")
    assert(s2.table("gtp2.e").count() == 192 - 24)
  }

  test("min/max(ts) answers from the manifest with data files deleted") {
    import spark.implicits._
    val path = daysTable()
    // brutal zero-I/O proof (q_store_metaagg precedent): remove the bytes
    entries(path).foreach(e => new File(path, e.file).delete())
    val got = spark.read.format("graft.sources.GraftStore")
      .option("path", path).load()
      .agg(min($"ts").as("first_ev"), max($"ts").as("last_ev"),
        count(lit(1)).as("n"))
      .collect()(0)
    assert(got.getAs[java.sql.Timestamp]("first_ev").toInstant ==
      java.time.Instant.parse("2024-01-01T00:00:00Z"))
    assert(got.getAs[java.sql.Timestamp]("last_ev").toInstant ==
      java.time.Instant.parse("2024-01-08T23:00:00Z"))
    assert(got.getAs[Long]("n") == 192)
  }

  test("trunc(w, string) rolls per prefix; mixed spec with identity") {
    val root = graft.ops.Util.managedTempDir("graft_tpart_trunc_")
    val s2 = spark.newSession()
    s2.conf.set("spark.sql.catalog.gtt", "graft.sources.GraftCatalog")
    s2.conf.set("spark.sql.catalog.gtt.root", root)
    s2.range(0, 120).selectExpr(
      "id",
      "concat(CASE WHEN id % 3 = 0 THEN 'alpha' WHEN id % 3 = 1 THEN 'beta9' ELSE 'gamma' END, id) AS code",
      "CAST(id % 2 AS INT) AS seg")
      .createOrReplaceTempView("trunc_src")
    s2.sql(
      """CREATE TABLE gtt.t PARTITIONED BY (seg, trunc(4, code)) AS
        |SELECT id, code, seg FROM trunc_src""".stripMargin)
    assert(GraftStore.readPartitionBy(s"$root/t").contains("seg,trunc(4,code)"))
    val es = entries(s"$root/t")
    // 2 segs × 3 prefixes ('alph','beta','gamm'); identity clustering on
    // seg puts each seg in one task → exactly one file per (seg, prefix)
    assert(es.size == 6, s"expected 6 files, got ${es.size}")
    // each file single-valued on seg (identity stats prove it)
    assert(es.forall(e => e.stats("seg").min == e.stats("seg").max))
    // and single-prefixed on code (re-read rows to prove — string stats
    // are bloom-only, the roll itself is what's being pinned)
    val byFile = spark.read.format("graft.sources.GraftStore")
      .option("path", s"$root/t").load()
      .select(col("code"), col("_file"))
      .collect().groupBy(_.getString(1))
    assert(byFile.size == 6)
    byFile.values.foreach { rows =>
      assert(rows.map(_.getString(0).take(4)).distinct.length == 1)
    }
  }

  test("bucket(n, k): derived clustering, one file per bucket, exact bucket stats") {
    val root = graft.ops.Util.managedTempDir("graft_tpart_bkt_")
    val s2 = spark.newSession()
    s2.conf.set("spark.sql.catalog.gtb", "graft.sources.GraftCatalog")
    s2.conf.set("spark.sql.catalog.gtb.root", root)
    s2.range(0, 256).selectExpr("id AS k", "id * 10 AS v")
      .createOrReplaceTempView("bkt_src")
    // the V2 bucket function resolves the write's clustered distribution:
    // exactly one task per bucket → exactly one file per bucket
    s2.sql(
      """CREATE TABLE gtb.t PARTITIONED BY (bucket(8, k)) AS
        |SELECT k, v FROM bkt_src""".stripMargin)
    val path = s"$root/t"
    assert(graft.sources.GraftStore.readPartitionBy(path).contains("bucket(8,k)"))
    val es = entries(path)
    assert(es.size == 8, s"expected one file per bucket, got ${es.size}")
    assert(es.map(_.rows).sum == 256)
    // every file single-bucket, recorded as the pseudo-column stat, and
    // the derived value matches the canonical hash of the file's keys
    es.foreach { e =>
      val st = e.stats("__bucket_8_k")
      assert(st.min.nonEmpty && st.min == st.max && st.nulls == 0)
    }
    assert(es.map(_.stats("__bucket_8_k").min.toInt).toSet == (0 until 8).toSet)
    // avalanche sanity: bucket loads roughly uniform over sequential keys
    assert(es.map(_.rows).max <= 2L * es.map(_.rows).min)

    // catalog INSERT INTO resolves the same function: append stays bucketed
    s2.sql("INSERT INTO gtb.t SELECT k + 1000 AS k, k AS v FROM bkt_src WHERE k < 64")
    val es2 = entries(path)
    assert(es2.size <= 16 && es2.map(_.rows).sum == 320)
    assert(es2.forall(e => e.stats("__bucket_8_k").min ==
      e.stats("__bucket_8_k").max))
  }

  test("bucket-equality pruning: a point lookup reads one bucket's file") {
    import spark.implicits._
    val root = graft.ops.Util.managedTempDir("graft_tpart_bkt2_")
    val s2 = spark.newSession()
    s2.conf.set("spark.sql.catalog.gtb2", "graft.sources.GraftCatalog")
    s2.conf.set("spark.sql.catalog.gtb2.root", root)
    s2.range(0, 512).selectExpr("id AS k", "CAST(id % 9 AS DOUBLE) AS v")
      .createOrReplaceTempView("bkt2_src")
    s2.sql(
      """CREATE TABLE gtb2.t PARTITIONED BY (bucket(16, k)) AS
        |SELECT k, v FROM bkt2_src""".stripMargin)
    val path = s"$root/t"
    val total = entries(path).size
    assert(total == 16)
    val df = spark.read.format("graft.sources.GraftStore")
      .option("path", path).load().filter($"k" === 137L)
    val rows = df.collect()
    assert(rows.length == 1 && rows(0).getDouble(1) == (137 % 9).toDouble)
    val planned = df.queryExecution.executedPlan.toString
    val m = "files=(\\d+)/(\\d+)".r.findFirstMatchIn(planned)
    assert(m.isDefined, s"scan description missing file counts:\n$planned")
    assert(m.get.group(1).toInt == 1 && m.get.group(2).toInt == 16,
      s"point lookup must read exactly one bucket file: ${m.get.matched}")
    // IN-list prunes to the union of its buckets (≤ 3 of 16)
    val df2 = spark.read.format("graft.sources.GraftStore")
      .option("path", path).load().filter($"k".isin(1L, 2L, 3L))
    assert(df2.count() == 3)
    val m2 = "files=(\\d+)/(\\d+)".r.findFirstMatchIn(
      df2.queryExecution.executedPlan.toString).get
    assert(m2.group(1).toInt <= 3, s"IN-list kept ${m2.group(1)} files")
    // compaction merges buckets → pseudo-stat degrades → pruning declines
    // but results stay exact
    graft.sources.GraftStore.compact(spark, path, targetBytes = Long.MaxValue)
    val df3 = spark.read.format("graft.sources.GraftStore")
      .option("path", path).load().filter($"k" === 137L)
    assert(df3.count() == 1)
  }

  test("bucket SPJ: co-bucketed tables join with zero exchange") {
    val root = graft.ops.Util.managedTempDir("graft_tpart_spj_")
    val s2 = spark.newSession()
    s2.conf.set("spark.sql.catalog.gbs", "graft.sources.GraftCatalog")
    s2.conf.set("spark.sql.catalog.gbs.root", root)
    s2.conf.set("spark.sql.sources.v2.bucketing.enabled", "true")
    s2.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    s2.range(0, 512).selectExpr("id AS k", "id * 3 AS v1")
      .createOrReplaceTempView("spjb_a")
    s2.range(0, 256).selectExpr("id AS k", "CAST(id % 11 AS DOUBLE) AS v2")
      .createOrReplaceTempView("spjb_b")
    s2.sql(
      """CREATE TABLE gbs.a PARTITIONED BY (bucket(8, k)) AS
        |SELECT k, v1 FROM spjb_a""".stripMargin)
    s2.sql(
      """CREATE TABLE gbs.b PARTITIONED BY (bucket(8, k)) AS
        |SELECT k, v2 FROM spjb_b""".stripMargin)
    // catalog reads (the relation's FunctionCatalog is what resolves the
    // bucket transform in the reported partitioning — a path read has
    // none and would silently fall back to a shuffled join)
    val df = s2.sql(
      """SELECT count(*) AS n, sum(a.v1) AS s1, sum(b.v2) AS s2
        |FROM gbs.a a JOIN gbs.b b ON a.k = b.k""".stripMargin)
    val row = df.collect()(0)
    assert(row.getLong(0) == 256)
    assert(row.getLong(1) == (0L until 256L).map(_ * 3).sum)
    def allNodes(p: org.apache.spark.sql.execution.SparkPlan)
        : Seq[org.apache.spark.sql.execution.SparkPlan] =
      (p +: p.children.flatMap(allNodes)) ++ (p match {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          allNodes(a.executedPlan)
        case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
          allNodes(q.plan)
        case _ => Seq.empty
      })
    val plan = df.queryExecution.executedPlan
    val joins = allNodes(plan).collect {
      case j: org.apache.spark.sql.execution.joins.SortMergeJoinExec => j
      case j: org.apache.spark.sql.execution.joins.ShuffledHashJoinExec => j }
    assert(joins.nonEmpty, s"no shuffle-family join planned:\n$plan")
    val shuffles = allNodes(joins.head).collect {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeLike => e }
    assert(shuffles.isEmpty,
      s"co-bucketed join still shuffles:\n${joins.head}")
  }

  test("unsupported transforms are refused loudly") {
    val root = graft.ops.Util.managedTempDir("graft_tpart_ref_")
    val s2 = spark.newSession()
    s2.conf.set("spark.sql.catalog.gtr", "graft.sources.GraftCatalog")
    s2.conf.set("spark.sql.catalog.gtr.root", root)
    s2.sql("SELECT timestamp_seconds(0) AS ts").createOrReplaceTempView("ref_src")
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Seq.empty else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    // an unknown transform is a loud refusal that names it; hours()
    // over a non-timestamp is a TYPE refusal (years/months/days/hours
    // are all supported as of round 12)
    val ex = intercept[Exception] {
      s2.sql("CREATE TABLE gtr.t PARTITIONED BY (weeks(ts)) AS SELECT ts FROM ref_src")
    }
    assert(msgs(ex).exists(m => m.contains("weeks")),
      s"refusal must name the transform: ${msgs(ex)}")
    s2.sql("SELECT 1L AS v").createOrReplaceTempView("ref_long")
    val ex2 = intercept[Exception] {
      s2.sql("CREATE TABLE gtr.t2 PARTITIONED BY (hours(v)) AS SELECT v FROM ref_long")
    }
    assert(msgs(ex2).exists(m => m.contains("timestamp")),
      s"hours over a long must be a type refusal: ${msgs(ex2)}")
  }

  test("hours(ts): files roll per hour and hour ranges prune from micros bounds") {
    import spark.implicits._
    val root = graft.ops.Util.managedTempDir("graft_tpart_hr_")
    val s2 = spark.newSession()
    s2.conf.set("spark.sql.catalog.gth", "graft.sources.GraftCatalog")
    s2.conf.set("spark.sql.catalog.gth.root", root)
    // 8 hours × 12 events, minute grain, single ordered slice
    s2.range(0, 8 * 12, 1, 1)
      .selectExpr("timestamp_seconds(1704067200 + id * 300) AS ts", "id AS v")
      .createOrReplaceTempView("hr_src")
    s2.sql("CREATE TABLE gth.t PARTITIONED BY (hours(ts)) AS SELECT * FROM hr_src")
    val path = s"$root/t"
    val es = GraftStore.readManifest(path).get._2
    assert(es.size == 8, s"expected one file per hour, got ${es.size}")
    es.foreach { e =>
      val st = e.stats("ts")
      assert(Math.floorDiv(st.min.toLong, 3600000000L) ==
        Math.floorDiv(st.max.toLong, 3600000000L),
        s"${e.file} straddles hours: [${st.min}, ${st.max}]")
    }
    // a one-hour range reads exactly one file (planning-time skip) and
    // returns exactly that hour's rows
    val scan = spark.read.format("graft.sources.GraftStore")
      .option("path", path).load()
      .filter($"ts" >= lit("2024-01-01 02:00:00").cast("timestamp") &&
        $"ts" < lit("2024-01-01 03:00:00").cast("timestamp"))
    assert(scan.count() == 12)
    val desc = scan.queryExecution.executedPlan.toString
    assert(desc.contains("files=1/8"), s"hour range must plan 1 file:\n$desc")
  }

  test("months(date): files roll per calendar month and date ranges prune") {
    import spark.implicits._
    val root = graft.ops.Util.managedTempDir("graft_tpart_mo_")
    val s2 = spark.newSession()
    s2.conf.set("spark.sql.catalog.gtm", "graft.sources.GraftCatalog")
    s2.conf.set("spark.sql.catalog.gtm.root", root)
    // 90 days from 2024-01-01 → Jan/Feb/Mar, single ordered slice
    s2.range(0, 90, 1, 1)
      .selectExpr("date_add(DATE '2024-01-01', CAST(id AS INT)) AS d", "id AS v")
      .createOrReplaceTempView("mo_src")
    s2.sql("CREATE TABLE gtm.t PARTITIONED BY (months(d)) AS SELECT * FROM mo_src")
    val path = s"$root/t"
    val es = GraftStore.readManifest(path).get._2
    assert(es.size == 3, s"expected one file per month, got ${es.size}")
    // a one-month range reads exactly one file
    val scan = spark.read.format("graft.sources.GraftStore")
      .option("path", path).load()
      .filter($"d" >= lit("2024-02-01").cast("date") &&
        $"d" < lit("2024-03-01").cast("date"))
    assert(scan.count() == 29) // 2024 is a leap year
    assert(scan.queryExecution.executedPlan.toString.contains("files=1/3"),
      "month range must plan 1 of 3 files")
    // $partitions renders the calendar month
    val parts = s2.sql("SELECT `partition`, n_rows FROM gtm.`t$partitions` ORDER BY 1")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(parts == Seq(("d_month=2024-01", 31L), ("d_month=2024-02", 29L),
      ("d_month=2024-03", 30L)), parts.mkString(","))
  }

  test("years(date): files roll per calendar year and date ranges prune") {
    import spark.implicits._
    val root = graft.ops.Util.managedTempDir("graft_tpart_yr_")
    val s2 = spark.newSession()
    s2.conf.set("spark.sql.catalog.gty", "graft.sources.GraftCatalog")
    s2.conf.set("spark.sql.catalog.gty.root", root)
    // 900 days from 2023-01-01 → 2023 (365) / 2024 (366, leap) / 2025
    // (169), single ordered slice
    s2.range(0, 900, 1, 1)
      .selectExpr("date_add(DATE '2023-01-01', CAST(id AS INT)) AS d", "id AS v")
      .createOrReplaceTempView("yr_src")
    s2.sql("CREATE TABLE gty.t PARTITIONED BY (years(d)) AS SELECT * FROM yr_src")
    val path = s"$root/t"
    val es = GraftStore.readManifest(path).get._2
    assert(es.size == 3, s"expected one file per year, got ${es.size}")
    // a one-year range reads exactly one file
    val scan = spark.read.format("graft.sources.GraftStore")
      .option("path", path).load()
      .filter($"d" >= lit("2024-01-01").cast("date") &&
        $"d" < lit("2025-01-01").cast("date"))
    assert(scan.count() == 366) // 2024 is a leap year
    assert(scan.queryExecution.executedPlan.toString.contains("files=1/3"),
      "year range must plan 1 of 3 files")
    // $partitions renders the calendar year
    val parts = s2.sql("SELECT `partition`, n_rows FROM gty.`t$partitions` ORDER BY 1")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(parts == Seq(("d_year=2023", 365L), ("d_year=2024", 366L),
      ("d_year=2025", 169L)), parts.mkString(","))
    // a non-temporal source is a type refusal at create time, same as
    // the other temporal transforms
    val err = intercept[Exception] {
      s2.sql("CREATE TABLE gty.bad PARTITIONED BY (years(v)) AS SELECT * FROM yr_src")
    }
    assert(err.getMessage.contains("years(v) needs a timestamp/date column"),
      err.getMessage)
  }

  test("temporal stats survive compaction merge and stay pruning-exact") {
    import spark.implicits._
    val path = daysTable()
    // bin-pack everything into one file: mergeStats folds micros bounds
    GraftStore.compact(spark, path, targetBytes = Long.MaxValue)
    val es = entries(path)
    assert(es.size == 1)
    val st = es.head.stats("ts")
    assert(st.min.toLong == 1704067200L * 1000000L)
    assert(st.max.toLong == (1704067200L + 191 * 3600L) * 1000000L)
    // the merged file straddles days → a one-day range no longer prunes
    // it but results stay exact (read side never trusted the layout)
    val n = spark.read.format("graft.sources.GraftStore")
      .option("path", path).load()
      .filter($"ts" >= lit("2024-01-03 00:00:00").cast("timestamp") &&
        $"ts" < lit("2024-01-04 00:00:00").cast("timestamp"))
      .count()
    assert(n == 24)
  }

  // --------------------- round 15: composite (temporal, identity) specs

  test("composite (days(ts), kind): one file per cell, pruning on both terms, $partitions renders both, evolution adds/drops a term") {
    import spark.implicits._
    val root = graft.ops.Util.managedTempDir("graft_tpart_comp_")
    val s2 = spark.newSession()
    s2.conf.set("spark.sql.catalog.gtc", "graft.sources.GraftCatalog")
    s2.conf.set("spark.sql.catalog.gtc.root", root)
    // deterministic (day, kind) grid: day = id / 6, kind = id % 3 —
    // 4 UTC days × 3 kinds, 2 rows per (day, kind) cell, kinds
    // ALTERNATING within each day (the raw-ts ordering worst case)
    s2.range(0, 24).selectExpr(
      "id AS event_id",
      "timestamp_seconds(1704067200 + (id DIV 6) * 86400 + id * 60) AS ts",
      "CAST(id % 3 AS INT) AS kind",
      "CAST(id AS DOUBLE) AS value")
      .createOrReplaceTempView("comp_src")
    s2.sql(
      """CREATE TABLE gtc.e PARTITIONED BY (days(ts), kind) AS
        |SELECT event_id, ts, kind, value FROM comp_src""".stripMargin)
    val path = s"$root/e"
    assert(GraftStore.readPartitionBy(path).contains("days(ts),kind"))
    val es = entries(path)
    assert(es.map(_.rows).sum == 24)
    // exactly one rolled file per (day, kind) cell — the derived-day
    // sort key (via the catalog's V2 days function) groups the tuple;
    // raw-ts ordering would roll at every kind flip within a day
    assert(es.size == 12, s"expected 12 (4 days x 3 kinds), got ${es.size}")
    es.foreach { e =>
      val ts = e.stats("ts"); val k = e.stats("kind")
      assert(Math.floorDiv(ts.min.toLong, DayMicros) ==
        Math.floorDiv(ts.max.toLong, DayMicros), s"${e.file} straddles days")
      assert(k.min == k.max, s"${e.file} spans kinds")
    }
    // pruning on BOTH terms: a day range alone keeps 3 cells, kind
    // alone keeps 4, both keep exactly 1 — per-file stats skipping,
    // independently per term
    def kept(cond: org.apache.spark.sql.Column): Int = {
      val df = s2.read.format("graft.sources.GraftStore")
        .option("path", path).load().filter(cond)
      df.count() // finalize AQE
      val m = "files=(\\d+)/(\\d+)".r
        .findFirstMatchIn(df.queryExecution.executedPlan.toString)
      assert(m.isDefined); m.get.group(1).toInt
    }
    val dayCond = col("ts") >= lit("2024-01-02 00:00:00").cast("timestamp") &&
      col("ts") < lit("2024-01-03 00:00:00").cast("timestamp")
    assert(kept(dayCond) == 3, "day range must keep one day's 3 kind cells")
    assert(kept(col("kind") === 1) == 4, "kind filter must keep 4 day cells")
    assert(kept(dayCond && col("kind") === 1) == 1,
      "day+kind must prune to the single cell")
    // $partitions renders the full multi-term tuple
    val parts = s2.sql("SELECT partition FROM gtc.`e$partitions`")
      .collect().map(_.getString(0))
    assert(parts.length == 12, parts.mkString(", "))
    assert(parts.contains("ts_day=2024-01-02/kind=1"), parts.mkString(", "))
    // spec evolution DROPS a term (metadata-only); appends adopt
    GraftStore.evolvePartitionBy(path, Some("days(ts)"))
    assert(GraftStore.readPartitionBy(path).contains("days(ts)"))
    s2.range(24, 36).selectExpr(
      "id AS event_id",
      "timestamp_seconds(1704067200 + 10 * 86400 + (id - 24) * 60) AS ts",
      "CAST(id % 3 AS INT) AS kind", "CAST(id AS DOUBLE) AS value")
      .createOrReplaceTempView("comp_add")
    s2.sql("INSERT INTO gtc.e SELECT * FROM comp_add")
    val newFiles = entries(path).filterNot(e => es.exists(_.file == e.file))
    // kind no longer rolls: the 12 alternating-kind rows would have cut
    // ~12 single-kind files under the old spec; per-day rolling caps the
    // count at the task count (temporal distribution is caller-supplied)
    assert(newFiles.size <= 4 &&
      newFiles.exists(e => e.stats("kind").min != e.stats("kind").max),
      s"post-drop append must roll per day only: ${newFiles.map(_.file)}")
    // and evolution ADDS a term back (validated like create)
    GraftStore.evolvePartitionBy(path, Some("days(ts), kind"))
    assert(GraftStore.readPartitionBy(path).contains("days(ts),kind"))
    s2.range(36, 42).selectExpr(
      "id AS event_id",
      "timestamp_seconds(1704067200 + 20 * 86400 + (id - 36) * 60) AS ts",
      "CAST(id % 3 AS INT) AS kind", "CAST(id AS DOUBLE) AS value")
      .createOrReplaceTempView("comp_add2")
    s2.sql("INSERT INTO gtc.e SELECT * FROM comp_add2")
    val newest = entries(path).filterNot(e => es.exists(_.file == e.file))
      .filterNot(e => newFiles.exists(_.file == e.file))
    assert(newest.size == 3, // one day x 3 kinds again
      s"post-add append must roll per (day, kind): ${newest.size}")
    assert(newest.forall(e => e.stats("kind").min == e.stats("kind").max))
    // results stay layout-invisible across both evolutions
    assert(s2.sql("SELECT count(*) FROM gtc.e").collect()(0).getLong(0) == 42)
  }
}
