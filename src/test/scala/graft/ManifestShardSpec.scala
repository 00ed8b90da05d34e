package graft

import java.io.File

import org.apache.spark.sql.functions._
import org.apache.spark.sql.sources.EqualTo

import graft.sources.GraftStore

/** SHARDED MANIFEST (round 18, verdict item 1): past a configurable
  * entry threshold a snapshot manifest becomes a manifest LIST —
  * `!clist=` lines referencing immutable, content-addressed child
  * manifests grouped by partition cell, each line carrying the child's
  * aggregated column stats. Pinned here at the protocol level:
  *
  *  - a sharded table's parent manifest inlines ZERO entries and the
  *    flattened read-back equals the input exactly;
  *  - a partition-pruned scan OPENS exactly the matching children
  *    (the 100 TB metadata contract: planning I/O ∝ partitions touched,
  *    proven by the logical child-read counter, cache-independent);
  *  - appends reuse unchanged cells' children byte-identically
  *    (content addressing = incremental metadata cost, no diff protocol);
  *  - time travel, copy-on-write DML, and snapshot expiry (including
  *    the stale-child GC sweep) behave verbatim as on inline manifests.
  */
class ManifestShardSpec extends SparkSuite {

  // running SQL on a threshold-forcing child session makes it the
  // THREAD's active session, and GraftStore.shardThreshold reads the
  // active session's conf — restore the prior active session after
  // every test or later suites on this thread would shard at
  // threshold 1 (caught as a cross-suite PartitionEvolutionSpec
  // failure in the full run)
  override protected def withFixture(test: NoArgTest) = {
    val prev = org.apache.spark.sql.SparkSession.getActiveSession
    try super.withFixture(test)
    finally prev match {
      case Some(p) => org.apache.spark.sql.SparkSession.setActiveSession(p)
      case None => org.apache.spark.sql.SparkSession.clearActiveSession()
    }
  }

  private def freshRoot(): String =
    graft.ops.Util.managedTempDir("graft_mshard_spec_")

  /** Session with its own catalog root and the shard threshold forced
    * low so small fixtures shard. */
  private def sess(root: String, threshold: Int) = {
    val s2 = spark.newSession()
    s2.conf.set("spark.sql.catalog.gms", "graft.sources.GraftCatalog")
    s2.conf.set("spark.sql.catalog.gms.root", root)
    s2.conf.set("spark.graft.manifest.shardThreshold", threshold.toString)
    s2
  }

  private def structured(path: String) =
    GraftStore.readManifestStructured(new File(path, "_manifest")).get

  private def childFiles(path: String): Seq[String] =
    Option(new File(path).listFiles()).getOrElse(Array.empty)
      .map(_.getName).filter(_.startsWith("_mchild.")).toSeq.sorted

  /** 4 identity-partition cells, one task per cell → one file per cell;
    * threshold 1 → every cell is its own child manifest. */
  private def partitionedTable(root: String): (org.apache.spark.sql.SparkSession, String) = {
    val s2 = sess(root, threshold = 1)
    import s2.implicits._
    s2.range(0, 400, 1, 4)
      .select(($"id" % 4).cast("int").as("k"), $"id", ($"id" * 0.5).as("v"))
      .repartition(4, $"k")
      .createOrReplaceTempView("mshard_src")
    s2.sql(
      """CREATE TABLE gms.t PARTITIONED BY (k) AS
        |SELECT k, id, v FROM mshard_src""".stripMargin)
    (s2, s"$root/t")
  }

  test("sharded write inlines zero entries; flattened read-back is exact") {
    val (s2, path) = partitionedTable(freshRoot())
    val (_, inline, _, children) = structured(path)
    assert(inline.isEmpty, "sharded manifest must not inline entries")
    assert(children.size == 4,
      s"one child per identity cell expected, got ${children.map(_.file)}")
    assert(children.map(_.nfiles).sum == 4 && children.map(_.rows).sum == 400)
    assert(childFiles(path).toSet == children.map(_.file).toSet)
    // aggregated child stats: each cell pins k (min==max, 0 nulls) and
    // carries the summed exact int64 id sum
    children.foreach { c =>
      val k = c.stats("k")
      assert(k.min.nonEmpty && k.min == k.max && k.nulls == 0, c)
      assert(c.stats("id").sum.nonEmpty, "exact sums must fold into the child")
      assert(!c.stats("id").mono, "mono must not survive the child fold")
    }
    val back = s2.sql("SELECT * FROM gms.t")
    assert(back.count() == 400)
    assert(back.agg(sum("id")).head.getLong(0) == (0L until 400L).sum)
  }

  test("partition-pruned scan opens exactly the matching child") {
    val (s2, path) = partitionedTable(freshRoot())
    val (_, _, _, children) = structured(path)
    GraftStore.childReads.set(0L)
    val pruned = new graft.sources.GraftStoreScan(path, Array(EqualTo("k", 2)))
    assert(pruned.planInputPartitions().length == 1)
    assert(GraftStore.childReads.get() == 1L,
      s"planning opened ${GraftStore.childReads.get()} of ${children.size} " +
        "children for a single-partition filter")
    // end to end through Spark's pushdown: same answer as the oracle
    val got = s2.sql("SELECT sum(id) FROM gms.t WHERE k = 2").head.getLong(0)
    assert(got == (0L until 400L).filter(_ % 4 == 2).sum)
    // a filter matching nothing opens NO children
    GraftStore.childReads.set(0L)
    val none = new graft.sources.GraftStoreScan(path, Array(EqualTo("k", 99)))
    assert(none.planInputPartitions().isEmpty)
    assert(GraftStore.childReads.get() == 0L,
      "a disproved-everywhere filter must open zero children")
  }

  test("!stats version gate reaches children: a pre-v2 parent demotes ref and flattened double stats") {
    import java.nio.file.{Files, Paths}
    import java.nio.charset.StandardCharsets
    val (s2, path) = partitionedTable(freshRoot())
    assert(structured(path)._4.forall(_.stats.contains("v")),
      "sanity: current-version refs carry the double column's stats")
    // simulate a parent written by the pre-NaN-fix (v1) writer: strip
    // the !stats and !uid headers (same staging as GraftStoreNaNSpec —
    // children carry NO version header of their own, so the parent's
    // version must govern them; r18 review found the sharded layout
    // bypassed the demotion entirely)
    for (f <- new File(path).listFiles() if f.getName.startsWith("_manifest")) {
      val lines = new String(Files.readAllBytes(f.toPath), StandardCharsets.UTF_8)
        .split('\n').filterNot(l => l.startsWith("!stats=") || l.startsWith("!uid="))
      Files.write(Paths.get(f.getPath),
        lines.mkString("\n").getBytes(StandardCharsets.UTF_8))
    }
    val refs = structured(path)._4
    assert(refs.forall(!_.stats.contains("v")),
      "pre-v2 child refs must have double-column stats demoted at parse")
    assert(refs.forall(_.stats.contains("k")),
      "integer stats are NaN-free and survive the child demotion")
    val flat = GraftStore.readManifest(path).get._2
    assert(flat.forall(!_.stats.contains("v")),
      "flattened child entries must be demoted too")
    assert(flat.forall(_.stats.contains("id")))
    // a filter the STALE double stats would have disproven must open
    // every child (Unknown = read, never wrongly skipped) and answer
    // from data
    GraftStore.childReads.set(0L)
    val scan = new graft.sources.GraftStoreScan(path,
      Array(org.apache.spark.sql.sources.GreaterThan("v", 1e9)))
    assert(scan.planInputPartitions().length == 4,
      "demoted stats must not prune (they are unknown, not disproven)")
    assert(GraftStore.childReads.get() == 4L)
    assert(s2.sql("SELECT count(*) FROM gms.t WHERE v >= 0").head.getLong(0) == 400)
    // a NEW commit on the demoted table claims the CURRENT version, so
    // the append fast path must refuse to carry demoted refs verbatim:
    // old entries stay double-stats-free, the new entry keeps its stats
    s2.sql("INSERT INTO gms.t SELECT CAST(2 AS INT), id, id * 0.5 " +
      "FROM range(1000, 1010)")
    val flat2 = GraftStore.readManifest(path).get._2
    val (oldE, newE) = flat2.partition(_.rows == 100)
    assert(oldE.size == 4 && newE.size == 1)
    assert(oldE.forall(!_.stats.contains("v")),
      "carried-forward pre-v2 entries must stay double-stats-free in a " +
        "current-version sharded manifest")
    assert(newE.forall(_.stats.get("v").exists(_.min.nonEmpty)),
      "entries written by the current writer keep their double stats")
  }

  test("append reuses unchanged cells' children by content address") {
    val (s2, path) = partitionedTable(freshRoot())
    val before = structured(path)._4.map(_.file).toSet
    s2.sql("INSERT INTO gms.t SELECT CAST(2 AS INT), id, id * 0.5 " +
      "FROM range(1000, 1100)")
    val after = structured(path)._4.map(_.file).toSet
    // the 3 untouched cells keep their names, and the appended cell's
    // OLD chunk does too (chunking preserves prefix chunks): the only
    // new child is the appended file's own chunk
    assert((before intersect after) == before && after.size == before.size + 1,
      s"append must add exactly one child: before=$before after=$after")
    assert(s2.sql("SELECT count(*) FROM gms.t").head.getLong(0) == 500)
    // time travel: the pre-append snapshot still answers through its
    // own (shared) children
    val v1 = spark.read.format("graft.sources.GraftStore")
      .option("path", path).option("versionAsOf", "1").load()
    assert(v1.count() == 400)
  }

  test("copy-on-write DML and unpartitioned chunking stay exact") {
    val root = freshRoot()
    val (s2, path) = partitionedTable(root)
    s2.sql("DELETE FROM gms.t WHERE id < 100")
    assert(s2.sql("SELECT count(*), sum(id) FROM gms.t").head.toSeq ==
      Seq(300L, (100L until 400L).sum))
    // unpartitioned table: cells are unprovable/absent — entries chunk
    // into threshold-sized children, read-back exact
    val s3 = sess(freshRoot(), threshold = 2)
    import s3.implicits._
    val p2 = s"${freshRoot()}/u"
    s3.range(0, 90, 1, 6).toDF("id").write
      .format("graft.sources.GraftStore").option("path", p2)
      .mode("overwrite").save()
    val (_, inline2, _, children2) = structured(p2)
    assert(inline2.isEmpty && children2.size == 3,
      s"6 files at threshold 2 must chunk into 3 children, got " +
        s"${children2.size}")
    assert(spark.read.format("graft.sources.GraftStore").option("path", p2)
      .load().agg(sum("id")).head.getLong(0) == (0L until 90L).sum)
  }

  test("string-equality blooms OR into children: an absent literal opens zero children") {
    import org.apache.spark.sql.sources.EqualTo
    val s3 = sess(freshRoot(), threshold = 2)
    import s3.implicits._
    val p = s"${freshRoot()}/sb"
    s3.range(0, 90, 1, 6)
      .select($"id", concat(lit("tag_"), ($"id" % 9).cast("string")).as("s"))
      .write.format("graft.sources.GraftStore").option("path", p)
      .mode("overwrite").save()
    val children = structured(p)._4
    assert(children.nonEmpty &&
      children.forall(_.stats.get("s").exists(_.bloom.nonEmpty)),
      "child refs must carry the OR-merged string bloom")
    GraftStore.childReads.set(0L)
    val none = new graft.sources.GraftStoreScan(p,
      Array(EqualTo("s", "tag_never_written")))
    assert(none.planInputPartitions().isEmpty,
      "bloom-disproved literal must prune every file")
    assert(GraftStore.childReads.get() == 0L,
      "bloom-disproved literal must prune every CHILD unopened")
    // a present literal still answers exactly
    val got = spark.read.format("graft.sources.GraftStore").option("path", p)
      .load().filter($"s" === "tag_3").agg(sum("id")).head.getLong(0)
    assert(got == (0L until 90L).filter(_ % 9 == 3).sum)
  }

  test("OPTIMIZE on a sharded table: compaction re-shards, answers unchanged") {
    val (s2, path) = partitionedTable(freshRoot())
    // several appends fragment the cells (each adds one file per touched
    // cell), all under the same sharded-manifest regime
    (0 until 3).foreach { i =>
      s2.sql(s"INSERT INTO gms.t SELECT CAST(id % 4 AS INT), id, id * 0.5 " +
        s"FROM range(${1000 * (i + 1)}, ${1000 * (i + 1) + 200})")
    }
    val before = s2.sql("SELECT count(*), sum(id) FROM gms.t").head.toSeq
    val filesBefore = structured(path)._4.map(_.nfiles).sum
    GraftStore.compact(s2, path, targetBytes = 1L << 20)
    val after = s2.sql("SELECT count(*), sum(id) FROM gms.t").head.toSeq
    assert(after == before, s"compaction changed answers: $before -> $after")
    // fewer data files; manifest stays readable whether the new count
    // re-shards (above threshold) or collapses back inline (below)
    val (_, inline, _, children) = structured(path)
    val filesAfter = inline.size + children.map(_.nfiles).sum
    assert(filesAfter < filesBefore,
      s"compaction did not reduce files: $filesBefore -> $filesAfter")
  }

  test("CAS conflict: the loser's pre-claim children orphan harmlessly and sweep after the grace") {
    val (s2, path) = partitionedTable(freshRoot())
    org.apache.spark.sql.SparkSession.setActiveSession(s2)
    val (v, latest) = GraftStore.readLatestVersioned(path)
    val (schema, entries) = latest.get
    // winner claims v+1 first
    GraftStore.writeManifestAtomicAt(path, v + 1, schema, entries,
      op = "append")
    val winnerChildren = childFiles(path).toSet
    // loser: same base, plus a novel cell — its children (including one
    // NEW name for the novel cell) land BEFORE the claim, which loses;
    // nothing committed is clobbered
    val loser = entries :+ GraftStore.FileEntry("data/ghost.bin", 1L,
      Map("k" -> GraftStore.ColStats("7", "7", 0)))
    intercept[GraftStore.ConflictException] {
      GraftStore.writeManifestAtomicAt(path, v + 1, schema, loser,
        op = "append")
    }
    val orphans = childFiles(path).toSet -- winnerChildren
    assert(orphans.size == 1,
      s"expected exactly the loser's novel-cell child as orphan: $orphans")
    // the table answers from the winner's commit, unaffected
    assert(s2.sql("SELECT count(*) FROM gms.t").head.getLong(0) == 400)
    // grace-0 sweep (via expiry retaining both snapshots) removes the
    // unreferenced child, keeps every referenced one
    GraftStore.expireSnapshots(path, keepLast = 2, graceMs = 0L)
    assert(childFiles(path).toSet == winnerChildren,
      "sweep must remove exactly the conflict loser's orphan child")
    assert(s2.sql("SELECT sum(id) FROM gms.t").head.getLong(0) ==
      (0L until 400L).sum)
  }

  test("the parent manifest is the metadata wall REMOVED: size ∝ children, not files") {
    // grow an unpartitioned table by appends; at threshold 8 the parent
    // carries one !clist= line per chunk while the flattened entry text
    // grows linearly with files — the parent must stay well under the
    // inline representation and grow ~8× slower
    val s3 = sess(freshRoot(), threshold = 8)
    import s3.implicits._
    val p = s"${freshRoot()}/grow"
    def append(lo: Long): Unit =
      s3.range(lo, lo + 80, 1, 8).toDF("id").write
        .format("graft.sources.GraftStore").option("path", p)
        .mode(if (lo == 0) "overwrite" else "append").save()
    append(0)
    (1 to 5).foreach(i => append(i * 80L))
    val (_, inline, _, children) = structured(p)
    val nFiles = children.map(_.nfiles).sum
    assert(inline.isEmpty && nFiles == 48, s"expected 48 files, got $nFiles")
    val parentBytes = new File(p, "_manifest").length()
    val childBytes = childFiles(p)
      .map(n => new File(p, n).length()).sum
    // the inline representation would be ≈ childBytes of entry text in
    // the parent; sharded, the parent holds ~nFiles/8 refs
    assert(parentBytes < childBytes,
      s"parent ($parentBytes B) must be smaller than the entry text it " +
        s"replaces ($childBytes B)")
    assert(children.size <= (nFiles + 7) / 8 + 1,
      s"${children.size} children for $nFiles files at threshold 8")
    // planning a point lookup touches one child, however many appends
    GraftStore.childReads.set(0L)
    val one = new graft.sources.GraftStoreScan(p,
      Array(org.apache.spark.sql.sources.EqualTo("id", 200L)))
    assert(one.planInputPartitions().length == 1)
    assert(GraftStore.childReads.get() <= 2,
      s"point lookup opened ${GraftStore.childReads.get()} children")
  }

  test("append fast path: formats only the appended entries, byte-identical to a full regroup") {
    val (s2, path) = partitionedTable(freshRoot())
    // append one file's worth of rows to ONE cell: the fast path must
    // format ~that file's entry, not the whole table
    GraftStore.shardFmtEntries.set(0L)
    s2.sql("INSERT INTO gms.t SELECT CAST(1 AS INT), id, id * 0.5 " +
      "FROM range(5000, 5100)")
    val formatted = GraftStore.shardFmtEntries.get()
    assert(formatted >= 1 && formatted <= 2,
      s"append formatted $formatted entries — the fast path must not " +
        "reformat the whole table (5 files)")
    // equivalence: a from-scratch regroup of the SAME flattened entry
    // list (same schema, same partition spec) must produce the same
    // content-addressed child names in the same order — grouping and
    // chunking are deterministic functions of the list, and the fast
    // path must not diverge from them
    val (schema, entries) = GraftStore.readManifest(path).get
    val fastRefs = structured(path)._4.map(r => (r.file, r.cell))
    val p2 = graft.ops.Util.managedTempDir("graft_mshard_equiv_") + "/t2"
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(p2))
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(path, "_partition"),
      java.nio.file.Paths.get(p2, "_partition"))
    org.apache.spark.sql.SparkSession.setActiveSession(s2)
    GraftStore.writeManifestAtomicAt(p2, 1L, schema, entries, op = "create")
    val fullRefs = GraftStore.readManifestStructured(
      new File(p2, "_manifest")).get._4.map(r => (r.file, r.cell))
    assert(fastRefs == fullRefs,
      s"fast-path refs diverge from the full regroup:\n$fastRefs\nvs\n$fullRefs")
    // and a restore (a NON-extension commit → full-regroup fallback) of
    // the appended version reproduces the same children byte-for-byte
    val v = GraftStore.readVersion(path)
    GraftStore.restore(path, v)
    assert(structured(path)._4.map(r => (r.file, r.cell)) == fastRefs,
      "restore's full regroup must reproduce the fast path's children")
  }

  test("randomized thresholds/cell-counts: sharded answers equal the source under every filter") {
    import org.apache.spark.sql.functions._
    // fixed seeds — deterministic sweep over awkward chunk boundaries
    // (threshold dividing / not dividing cell sizes, single-cell,
    // more-cells-than-files-per-cell)
    val rnd = new scala.util.Random(1234)
    (1 to 3).foreach { trial =>
      val threshold = Seq(1, 2, 3, 5)(rnd.nextInt(4))
      val nCells = 1 + rnd.nextInt(5)
      val rows = 60 + rnd.nextInt(200)
      val s3 = sess(freshRoot(), threshold)
      import s3.implicits._
      s3.range(0, rows, 1, 4)
        .select(($"id" % nCells).cast("int").as("k"), $"id")
        .repartition(4, $"k")
        .createOrReplaceTempView(s"mshard_rand_$trial")
      s3.sql(s"CREATE TABLE gms.r$trial PARTITIONED BY (k) AS " +
        s"SELECT k, id FROM mshard_rand_$trial")
      // a second append batch crosses chunk boundaries
      s3.sql(s"INSERT INTO gms.r$trial SELECT CAST(id % $nCells AS INT), id " +
        s"FROM range(${rows * 10}, ${rows * 10 + 37})")
      val expected = ((0L until rows.toLong) ++
        (rows * 10L until rows * 10L + 37L)).map(id => (id % nCells, id))
      // full scan equals the source exactly
      val all = s3.sql(s"SELECT k, id FROM gms.r$trial").collect()
        .map(r => (r.getInt(0).toLong, r.getLong(1))).sorted.toSeq
      assert(all == expected.sortBy(identity),
        s"trial $trial (threshold=$threshold cells=$nCells): full scan diverged")
      // every single-cell filter equals the source's filter
      (0 until nCells).foreach { c =>
        val got = s3.sql(s"SELECT sum(id), count(*) FROM gms.r$trial WHERE k = $c")
          .head
        val exp = expected.filter(_._1 == c)
        assert(got.getLong(0) == exp.map(_._2).sum && got.getLong(1) == exp.size,
          s"trial $trial cell $c: pruned read diverged")
      }
    }
  }

  test("schema evolution on a sharded table: rename + widen remap child stats; pruning fires on the new name, never wrongly") {
    // r18 verdict item 3: the children here are written PRE-evolution;
    // a wrong prune through stale child-level stat keys would be silent
    // wrong answers — the worst failure class — so every prune below is
    // paired with a recomputed-answer check
    val root = freshRoot()
    val s2 = sess(root, threshold = 1)
    import s2.implicits._
    // 4 identity cells with DISJOINT id ranges per cell, so child-level
    // min/max on the (about to be renamed) id column genuinely prune
    s2.range(0, 400, 1, 4)
      .select(($"id" / 100).cast("int").as("k"), $"id",
        ($"id" % 10).cast("int").as("w"), ($"id" * 0.5).as("v"))
      .repartition(4, $"k")
      .createOrReplaceTempView("mshard_ev_src")
    s2.sql(
      """CREATE TABLE gms.ev PARTITIONED BY (k) AS
        |SELECT k, id, w, v FROM mshard_ev_src""".stripMargin)
    val path = s"$root/ev"
    val v1 = GraftStore.readVersion(path)
    val pre = structured(path)._4
    assert(pre.nonEmpty, "CTAS at threshold 1 must shard")
    assert(pre.forall(_.stats.contains("id")))
    // RENAME id -> row_id, then WIDEN w int -> long: both metadata-only
    // commits over a table whose children predate them
    GraftStore.renameColumn(path, "id", "row_id")
    GraftStore.widenColumn(path, "w")
    val (_, inline, _, children) = structured(path)
    assert(inline.isEmpty && children.size == 4,
      "the evolve commits must keep the table sharded")
    assert(children.forall(c =>
      c.stats.contains("row_id") && !c.stats.contains("id")),
      s"child-level stats must follow the rename: " +
        children.map(_.stats.keySet).mkString(", "))
    assert(GraftStore.readManifest(path).get._2.forall(e =>
      e.stats.contains("row_id") && !e.stats.contains("id")),
      "flattened child entries must follow the rename")
    // pruning on the RENAMED column through child stats: row_id < 150
    // must open exactly the 2 children whose ranges intersect, and the
    // answer must equal the recomputation
    import org.apache.spark.sql.sources.{GreaterThanOrEqual, LessThan}
    GraftStore.childReads.set(0L)
    val pruned = new graft.sources.GraftStoreScan(path,
      Array(LessThan("row_id", 150L)))
    assert(pruned.planInputPartitions().length == 2,
      "renamed child stats must keep pruning (2 of 4 cells intersect)")
    assert(GraftStore.childReads.get() == 2L,
      s"opened ${GraftStore.childReads.get()} children, expected 2")
    assert(s2.sql("SELECT count(*), sum(row_id) FROM gms.ev WHERE row_id < 150")
      .head.toSeq == Seq(150L, (0L until 150L).sum))
    // the top cell: 1 child opened, answer exact (a WRONG prune would
    // show up here as a wrong count, not a crash)
    GraftStore.childReads.set(0L)
    val top = new graft.sources.GraftStoreScan(path,
      Array(GreaterThanOrEqual("row_id", 350L)))
    assert(top.planInputPartitions().length == 1 &&
      GraftStore.childReads.get() == 1L)
    assert(s2.sql("SELECT count(*) FROM gms.ev WHERE row_id >= 350")
      .head.getLong(0) == 50L)
    // the widened column reads as long over pre-widen children
    assert(s2.sql("SELECT sum(w) FROM gms.ev").head.getLong(0) ==
      (0L until 400L).map(_ % 10).sum)
    // time travel to the pre-evolution snapshot reads OLD names through
    // the OLD children
    val v1df = spark.read.format("graft.sources.GraftStore")
      .option("path", path).option("versionAsOf", v1.toString).load()
    assert(v1df.schema.fieldNames.toSeq == Seq("k", "id", "w", "v"))
    assert(v1df.filter(col("id") < 150).count() == 150)
  }

  test("CALL rewrite_manifests regroups fragmented children metadata-only; collapses under-threshold tables to inline") {
    // r18 verdict item 5: the Iceberg-standard repair — an ingest job
    // tuned the shard threshold small (many 1-entry children), platform
    // raises it; rewrite_manifests re-canonicalizes WITHOUT touching
    // data files, as one new commit
    val root = freshRoot()
    val s1 = sess(root, threshold = 1)
    import s1.implicits._
    def src(lo: Int): org.apache.spark.sql.DataFrame =
      s1.range(lo, lo + 20, 1, 1)
        .select(($"id" % 4).cast("int").as("k"), $"id")
        .repartition(4, $"k")
    src(0).createOrReplaceTempView("mshard_rw_src")
    s1.sql("CREATE TABLE gms.rw PARTITIONED BY (k) AS SELECT k, id FROM mshard_rw_src")
    (1 to 5).foreach { i =>
      src(i * 20).createOrReplaceTempView("mshard_rw_add")
      s1.sql("INSERT INTO gms.rw SELECT k, id FROM mshard_rw_add")
    }
    val path = s"$root/rw"
    val preV = GraftStore.readVersion(path)
    val (_, _, _, preRefs) = structured(path)
    assert(preRefs.size == 24 && preRefs.forall(_.nfiles == 1L),
      s"fixture must be fragmented: 4 cells x 6 one-entry children, got " +
        preRefs.map(r => s"${r.cell}:${r.nfiles}").mkString(", "))
    val preEntries = GraftStore.readManifest(path).get._2
    val dataFiles = Option(new File(path, "data").listFiles()).get
      .map(f => f.getName -> f.lastModified()).toMap
    // raise the threshold in a NEW session and repair
    val s3 = sess(root, threshold = 3)
    val res = s3.sql("CALL gms.system.rewrite_manifests('rw')").head
    assert(res.getLong(0) == preV + 1 &&
      res.getLong(0) == GraftStore.readVersion(path))
    assert(res.getLong(1) == 24L && res.getLong(2) == 8L,
      s"24 one-entry children must regroup to 4 cells x ceil(6/3)=8, " +
        s"got ${res.getLong(1)} -> ${res.getLong(2)}")
    val (_, inline, _, postRefs) = structured(path)
    assert(inline.isEmpty && postRefs.size == 8 &&
      postRefs.forall(_.nfiles <= 3L))
    // metadata-only: same flattened entries, same data files, untouched
    assert(GraftStore.readManifest(path).get._2 == preEntries)
    assert(Option(new File(path, "data").listFiles()).get
      .map(f => f.getName -> f.lastModified()).toMap == dataFiles,
      "rewrite_manifests must not touch data files")
    assert(s3.sql("SELECT count(*), sum(id) FROM gms.rw").head.toSeq ==
      Seq(120L, (0L until 120L).sum))
    // pruning fires through the regrouped children: k=0 opens only that
    // cell's 2 children
    import org.apache.spark.sql.sources.EqualTo
    GraftStore.childReads.set(0L)
    val scan = new graft.sources.GraftStoreScan(path, Array(EqualTo("k", 0)))
    scan.planInputPartitions()
    assert(GraftStore.childReads.get() == 2L,
      s"opened ${GraftStore.childReads.get()} children, expected the k=0 cell's 2")
    // idempotent: a second call regroups to the identical layout
    val res2 = s3.sql("CALL gms.system.rewrite_manifests('rw')").head
    assert(res2.getLong(1) == 8L && res2.getLong(2) == 8L)
    assert(structured(path)._4.map(_.file) == postRefs.map(_.file))
    // time travel to the fragmented snapshot reads the OLD children
    val old = spark.read.format("graft.sources.GraftStore")
      .option("path", path).option("versionAsOf", preV.toString).load()
    assert(old.count() == 120L)
    // COLLAPSE: entry count under the threshold -> back to inline (the
    // explicit override of the layout-follows-the-table rule), and the
    // table STAYS inline across a later append
    val s9 = sess(root, threshold = 64)
    val res3 = s9.sql("CALL gms.system.rewrite_manifests('rw')").head
    assert(res3.getLong(2) == 0L)
    val (_, postInline, _, postKids) = structured(path)
    assert(postKids.isEmpty && postInline.size == 24 &&
      postInline == preEntries)
    s9.range(120, 140, 1, 1)
      .select(col("id").mod(4).cast("int").as("k"), col("id"))
      .repartition(4, col("k"))
      .createOrReplaceTempView("mshard_rw_add2")
    s9.sql("INSERT INTO gms.rw SELECT k, id FROM mshard_rw_add2")
    assert(structured(path)._4.isEmpty, "collapsed table must stay inline")
    assert(s9.sql("SELECT count(*), sum(id) FROM gms.rw").head.toSeq ==
      Seq(140L, (0L until 140L).sum))
  }

  test("rewrite_manifests racing concurrent appends: conflict-retry lands everything, nothing lost") {
    // the production race at scale: scheduled manifest maintenance vs
    // live ingest. The rewrite's CAS loser must retry from the fresh
    // base (metadata-only regroup derives from whatever file list the
    // re-read observes — always sound), never die or clobber an append
    val root = freshRoot()
    val s2 = sess(root, threshold = 2)
    def src(lo: Long) = s2.range(lo, lo + 40, 1, 1)
      .select((col("id") % 4).cast("int").as("k"), col("id"))
      .repartition(4, col("k"))
    src(0).createOrReplaceTempView("mshard_race_src")
    s2.sql("CREATE TABLE gms.race PARTITIONED BY (k) AS SELECT k, id FROM mshard_race_src")
    val path = s"$root/race"
    val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    def run(body: => Unit) = new Thread(() => {
      try {
        org.apache.spark.sql.SparkSession.setActiveSession(s2)
        body
      } catch { case t: Throwable => errs.add(t) }
    })
    val threads =
      Seq(100L, 200L, 300L).map(lo => run {
        src(lo).write.format("graft.sources.GraftStore")
          .option("path", path).mode("append").save()
      }) ++ Seq.fill(2)(run { GraftStore.rewriteManifests(path) })
    threads.foreach(_.start()); threads.foreach(_.join())
    assert(errs.isEmpty,
      s"racing commits must all land, got: ${errs.toArray.mkString("; ")}")
    val ids = spark.read.format("graft.sources.GraftStore")
      .option("path", path).load()
      .select(col("id")).collect().map(_.getLong(0)).sorted.toSeq
    val expected = ((0L until 40L) ++ (100L until 140L) ++
      (200L until 240L) ++ (300L until 340L)).sorted
    assert(ids == expected, "an append was lost under the rewrite race")
    assert(GraftStore.history(path).count(_._4 == "rewrite_manifests") == 2,
      "both rewrite commits must appear in the history")
    assert(structured(path)._4.nonEmpty, "the table must stay sharded")
  }

  test("change feed over a history that CROSSES the shard threshold equals the unsharded replay") {
    // the 100 TB layout is sharded manifests; the flagship streaming
    // consumer is the CDF — their composition was unproven (r18 verdict
    // item 2). Build the SAME commit history twice: once at threshold 3
    // (v1 inline, v2 onward sharded — the history crosses the
    // threshold mid-life) and once effectively unsharded; replay
    // changesFrom=0 on both and compare row for row.
    def history(threshold: Int): (org.apache.spark.sql.SparkSession, String) = {
      val s2 = sess(freshRoot(), threshold)
      org.apache.spark.sql.SparkSession.setActiveSession(s2)
      val path = s"${freshRoot()}/cdf"
      def w(df: org.apache.spark.sql.DataFrame, mode: String) =
        df.write.format("graft.sources.GraftStore")
          .option("path", path).mode(mode).save()
      // v1: 2 files — inline at threshold 3
      w(s2.range(0, 200, 1, 2).selectExpr("id AS k", "id AS v"), "overwrite")
      // v2: 2 more files — 4 entries > 3, the manifest becomes a list
      w(s2.range(200, 400, 1, 2).selectExpr("id AS k", "id AS v"), "append")
      // v3: copy-on-write DELETE (delete + insert churn in the feed)
      GraftStore.deleteByKey(s2, path, s2.range(0, 50).selectExpr("id AS k"))
      // v4: keyed upsert (retract + apply)
      GraftStore.upsertByKey(s2, path, Seq("k"),
        s2.range(100, 150).selectExpr("id AS k", "id + 100000 AS v"))
      (s2, path)
    }
    def replay(s2: org.apache.spark.sql.SparkSession, path: String) =
      s2.read.format("graft.sources.GraftStore").option("path", path)
        .option("changesFrom", "0").load()
        .selectExpr("k", "v", "_change_type", "_commit_version")
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
        .sortBy(x => (x._4, x._3, x._1, x._2)).toSeq
    val (sa, sharded) = history(threshold = 3)
    assert(structured(sharded)._4.nonEmpty,
      "fixture must end sharded or the test proves nothing")
    val (sb, inline) = history(threshold = 1000000)
    assert(structured(inline)._4.isEmpty)
    val a = replay(sa, sharded)
    val b = replay(sb, inline)
    assert(a.nonEmpty && a == b,
      s"sharded replay diverged: ${a.size} vs ${b.size} change rows")
  }

  test("streaming CDF mirror converges over a SHARDED upstream") {
    // q_stream_mirror_eq's apply loop, pointed at an upstream whose
    // manifests are child lists: the micro-batch changelog read plans
    // through flattened children; the mirror must converge to the
    // source content exactly as on inline manifests
    val root = freshRoot()
    val s2 = sess(root, threshold = 2)
    org.apache.spark.sql.SparkSession.setActiveSession(s2)
    import s2.implicits._
    val src = s"$root/src"
    s2.range(0, 300, 1, 4).selectExpr("id AS k", "id AS v")
      .write.format("graft.sources.GraftStore").option("path", src)
      .mode("overwrite").save()
    GraftStore.upsertByKey(s2, src, Seq("k"),
      s2.range(0, 300).filter($"id" % 3 === 0)
        .selectExpr("id AS k", "id + 100000 AS v"))
    GraftStore.deleteByKey(s2, src,
      s2.range(0, 300).filter($"id" % 5 === 0).selectExpr("id AS k"))
    assert(structured(src)._4.nonEmpty, "upstream must actually be sharded")
    val mirror = s"$root/m"
    s2.range(0, 0).selectExpr("id AS k", "id AS v")
      .write.format("graft.sources.GraftStore").option("path", mirror)
      .mode("overwrite").save()
    val q = s2.readStream.format("graft.sources.GraftStore")
      .option("path", src).option("changesFrom", "0").load()
      .writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        val b = batch.persist()
        try {
          val slices = b.groupBy($"_commit_version", $"_change_type")
            .count().collect()
            .map(r => (r.getLong(0), r.getString(1)) -> r.getLong(2)).toMap
          val vs = slices.keys.map(_._1).toSeq.distinct.sorted
          vs.foreach { v =>
            val atV = b.filter($"_commit_version" === v)
            if (slices.getOrElse((v, "delete"), 0L) > 0)
              GraftStore.deleteByKey(b.sparkSession, mirror,
                atV.filter($"_change_type" === "delete").select($"k"))
            if (slices.getOrElse((v, "insert"), 0L) > 0)
              GraftStore.upsertByKey(b.sparkSession, mirror, Seq("k"),
                atV.filter($"_change_type" === "insert").select($"k", $"v"))
          }
        } finally { b.unpersist(blocking = false); () }
        ()
      }
      .option("checkpointLocation",
        graft.ops.Util.managedTempDir("graft_mshard_ckpt_"))
      .start()
    try q.processAllAvailable() finally q.stop()
    def content(path: String) =
      s2.read.format("graft.sources.GraftStore").option("path", path).load()
        .select($"k", $"v").collect()
        .map(r => (r.getLong(0), r.getLong(1))).sortBy(identity).toSeq
    val got = content(mirror)
    assert(got.nonEmpty && got == content(src),
      "mirror must converge to the sharded upstream's content")
  }

  test("change feed across a rewrite_manifests commit: the repair contributes zero change rows") {
    // rewrite_manifests is the one commit whose flattened entries are
    // IDENTICAL but whose children are entirely rewritten — if the CDF
    // diff ever keyed on layout instead of content, a repair would emit
    // phantom inserts/deletes or refuse the range (r19 review gap)
    val root = freshRoot()
    val s2 = sess(root, threshold = 1)
    org.apache.spark.sql.SparkSession.setActiveSession(s2)
    val path = s"$root/cdfrw"
    def w(df: org.apache.spark.sql.DataFrame, mode: String) =
      df.write.format("graft.sources.GraftStore")
        .option("path", path).mode(mode).save()
    w(s2.range(0, 100, 1, 2).selectExpr("id AS k", "id AS v"), "overwrite") // v1
    w(s2.range(100, 200, 1, 2).selectExpr("id AS k", "id AS v"), "append") // v2
    val preV = GraftStore.readVersion(path)
    // repair under a raised threshold, then keep committing
    val s3 = sess(root, threshold = 8)
    org.apache.spark.sql.SparkSession.setActiveSession(s3)
    val (rv, before, after) = GraftStore.rewriteManifests(path)
    assert(rv == preV + 1 && after < before)
    w(s3.range(200, 250, 1, 2).selectExpr("id AS k", "id AS v"), "append") // v4
    val changes = s3.read.format("graft.sources.GraftStore")
      .option("path", path).option("changesFrom", "0").load()
      .selectExpr("k", "_change_type", "_commit_version").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq
    assert(!changes.exists(_._3 == rv),
      s"the metadata-only repair must be SILENT in the feed, got " +
        changes.filter(_._3 == rv).take(5).mkString(", "))
    assert(changes.count(_._2 == "insert") == 250 &&
      changes.forall(_._2 == "insert"),
      "replay across the repair must carry exactly the three appends' rows")
    // and the post-repair append's rows are attributed to ITS version
    assert(changes.filter(_._3 > rv).map(_._1).sorted ==
      (200L until 250L).toSeq)
  }

  test("snapshot expiry sweeps only unreferenced children") {
    val (s2, path) = partitionedTable(freshRoot())
    val v1Children = structured(path)._4.map(_.file).toSet
    // overwrite with disjoint content → v2's children are all new
    s2.sql("INSERT OVERWRITE gms.t SELECT CAST(id % 2 AS INT), id, id * 0.5 " +
      "FROM range(2000, 2400)")
    val v2Children = structured(path)._4.map(_.file).toSet
    assert((v1Children intersect v2Children).isEmpty)
    // both generations retained → both survive a grace-0 GC
    GraftStore.expireSnapshots(path, keepLast = 2, graceMs = 0L)
    assert(childFiles(path).toSet == v1Children ++ v2Children)
    // expire v1 → its children (referenced by nothing) are swept; v2's
    // stay; the table still answers exactly
    GraftStore.expireSnapshots(path, keepLast = 1, graceMs = 0L)
    assert(childFiles(path).toSet == v2Children,
      "expiry must sweep the expired snapshot's children and no others")
    assert(s2.sql("SELECT count(*), sum(id) FROM gms.t").head.toSeq ==
      Seq(400L, (2000L until 2400L).sum))
  }
}
