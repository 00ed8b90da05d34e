package graft

import org.apache.spark.sql.DataFrame

import graft.sources.GraftStore

/** Seeded fuzz for the streaming CDC tail: a keyed mirror driven by
  * `readStream(changesFrom)` + foreachBatch (the q_stream_mirror_eq
  * apply loop) must converge to the upstream table after ANY random
  * DML history — applied in two tranches with the stream tailing
  * BETWEEN them, so the changelog is consumed across multiple
  * micro-batches from a live checkpoint, not replayed once from
  * scratch. Runs under merge-on-read + sharded manifests (the regime
  * where the changelog planner does the most work: DV deltas,
  * equality-delete sidecars, flattened children). */
class StreamMirrorFuzzSpec extends SparkSuite {

  private def runHistory(tag: String, mor: Boolean, threshold: Option[Int],
      seed: Long): Unit = {
    val root = graft.ops.Util.managedTempDir(s"graft_smirror_fuzz_${tag}_")
    val s2 = spark.newSession()
    s2.conf.set("spark.sql.catalog.smz", "graft.sources.GraftCatalog")
    s2.conf.set("spark.sql.catalog.smz.root", root)
    threshold.foreach(t =>
      s2.conf.set("spark.graft.manifest.shardThreshold", t.toString))
    org.apache.spark.sql.SparkSession.setActiveSession(s2)
    import s2.implicits._
    val rnd = new scala.util.Random(seed)
    val props =
      if (mor) "TBLPROPERTIES('write.mode'='merge-on-read')" else ""
    s2.sql(s"""CREATE TABLE smz.t $props AS
      |SELECT id AS k, id * 10 AS v FROM range(0, 200)""".stripMargin)
    val src = s"$root/t"
    val mirror = s"$root/m"
    s2.range(0, 0).selectExpr("id AS k", "id AS v")
      .write.format("graft.sources.GraftStore").option("path", mirror)
      .mode("overwrite").save()
    val q = s2.readStream.format("graft.sources.GraftStore")
      .option("path", src).option("changesFrom", "0").load()
      .writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val b = batch.persist()
        try {
          // apply commit-by-commit, deletes before inserts within one
          val vs = b.select($"_commit_version").distinct()
            .collect().map(_.getLong(0)).sorted
          vs.foreach { v =>
            val atV = b.filter($"_commit_version" === v)
            val dels = atV.filter($"_change_type" === "delete").select($"k")
            if (dels.limit(1).count() > 0)
              GraftStore.deleteByKey(b.sparkSession, mirror, dels)
            val ins = atV.filter($"_change_type" === "insert")
              .select($"k", $"v")
            if (ins.limit(1).count() > 0)
              GraftStore.upsertByKey(b.sparkSession, mirror, Seq("k"), ins)
          }
        } finally { b.unpersist(blocking = false); () }
        ()
      }
      .option("checkpointLocation",
        graft.ops.Util.managedTempDir(s"graft_smirror_ckpt_${tag}_"))
      .start()
    def content(path: String): Seq[(Long, Long)] =
      s2.read.format("graft.sources.GraftStore").option("path", path).load()
        .select($"k", $"v").collect()
        .map(r => (r.getLong(0), r.getLong(1))).sortBy(identity).toSeq
    try {
      // tranche 1: the stream consumes a live prefix of the history
      val next = FuzzDml.applyRandomOps(s2, "smz.t", rnd, steps = 5,
        nextId0 = 200L, restoreAt = Some(src))
      q.processAllAvailable()
      assert(content(mirror) == content(src),
        s"$tag: mirror diverged after the first tranche")
      // tranche 2: more DML lands while the checkpoint already exists
      FuzzDml.applyRandomOps(s2, "smz.t", rnd, steps = 5, nextId0 = next,
        restoreAt = Some(src))
      q.processAllAvailable()
    } finally q.stop()
    val got = content(mirror)
    assert(got == content(src),
      s"$tag: mirror must converge to the upstream after the full history " +
        s"(mirror ${got.length} rows vs src ${content(src).length})")
    assert(got.nonEmpty, s"$tag: degenerate history (empty table)")
  }

  test("streaming mirror fuzz: merge-on-read + sharded manifests") {
    runHistory("morshard", mor = true, threshold = Some(2), seed = 9L)
  }
  test("streaming mirror fuzz: copy-on-write inline") {
    runHistory("cow", mor = false, threshold = None, seed = 17L)
  }
}
