package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.GraftStore

/** Seeded fuzz for the maintenance INVARIANCE contract: compact,
  * zorder, purge_deletes and rewrite_manifests may rewrite bytes and
  * metadata at will but must never change what a query returns — and
  * must stay CHANGE-FEED-SILENT (dataChange=false), so a downstream
  * CDC consumer never sees a phantom batch from housekeeping. The
  * targeted specs pin each procedure on a crafted table; this fuzz
  * interleaves them with random DML so maintenance runs over whatever
  * state the history produced (DV-carrying files, equality-delete
  * sidecars, fresh appends, sharded manifests) rather than the shapes
  * the authors thought to craft. */
class MaintenanceFuzzSpec extends SparkSuite {

  private def canon(df: DataFrame): Seq[String] =
    df.select(col("k"), col("v")).collect().map(_.toString).sorted.toSeq

  private def runHistory(tag: String, mor: Boolean, threshold: Option[Int],
      seed: Long): Unit = {
    val root = graft.ops.Util.managedTempDir(s"graft_maint_fuzz_${tag}_")
    val s2 = spark.newSession()
    s2.conf.set("spark.sql.catalog.mfz", "graft.sources.GraftCatalog")
    s2.conf.set("spark.sql.catalog.mfz.root", root)
    threshold.foreach(t =>
      s2.conf.set("spark.graft.manifest.shardThreshold", t.toString))
    val rnd = new scala.util.Random(seed)
    val props =
      if (mor) "TBLPROPERTIES('write.mode'='merge-on-read')" else ""
    s2.sql(s"""CREATE TABLE mfz.t $props AS
      |SELECT id AS k, id * 10 AS v FROM range(0, 200)""".stripMargin)
    val path = s"$root/t"
    var nextId = 200L
    (1 to 14).foreach { step =>
      rnd.nextInt(11) match {
        case 10 => // restore: content-CHANGING rollback between maintenance
          val vs = GraftStore.history(path).map(_._1).sorted
          if (vs.length >= 2) {
            val v = vs.init(rnd.nextInt(vs.length - 1))
            s2.sql(s"CALL mfz.system.restore('t', $v)").collect()
          }
        case 0 | 1 =>
          s2.sql(s"""INSERT INTO mfz.t
            |SELECT id AS k, id * 10 AS v
            |FROM range($nextId, ${nextId + 50})""".stripMargin)
          nextId += 50
        case 2 =>
          val m = 2 + rnd.nextInt(5)
          s2.sql(s"DELETE FROM mfz.t WHERE k % $m = ${rnd.nextInt(m)}")
        case 3 =>
          val m = 2 + rnd.nextInt(5)
          s2.sql(
            s"UPDATE mfz.t SET v = v + 7 WHERE k % $m = ${rnd.nextInt(m)}")
        case 4 =>
          val lo = nextId - 25
          s2.sql(s"""MERGE INTO mfz.t t
            |USING (SELECT id AS k, id * 10 + 1 AS v
            |       FROM range($lo, ${lo + 50})) s
            |ON t.k = s.k
            |WHEN MATCHED THEN UPDATE SET v = s.v
            |WHEN NOT MATCHED THEN INSERT (k, v) VALUES (s.k, s.v)"""
            .stripMargin)
          nextId += 25
        case m9 => // maintenance: content- and CDF-invariant by contract
          val before = canon(s2.table("mfz.t"))
          val preV = GraftStore.readVersion(path)
          val call = m9 match {
            case 5 | 6 => "CALL mfz.system.compact('t', 134217728)"
            case 7 => "CALL mfz.system.zorder('t', 'k,v', 4)"
            case 8 => "CALL mfz.system.rewrite_manifests('t')"
            case _ =>
              if (mor) "CALL mfz.system.purge_deletes('t')"
              else "CALL mfz.system.remove_orphan_files('t', 3600000)"
          }
          s2.sql(call).collect()
          assert(canon(s2.table("mfz.t")) == before,
            s"$tag step $step: '$call' changed query results")
          val feed = spark.read.format("graft.sources.GraftStore")
            .option("path", path).option("changesFrom", preV.toString).load()
          assert(feed.count() == 0,
            s"$tag step $step: '$call' must be change-feed-silent")
      }
    }
    // one line per history so a failing seed's op mix is in the test log
    println(s"[maintfuzz] $tag ops: " +
      GraftStore.history(path).map(_._4).mkString(","))
    // maintenance never broke the full replay either
    val feed = spark.read.format("graft.sources.GraftStore")
      .option("path", path).option("changesFrom", "0").load()
    val folded = canon(
      feed.filter(col("_change_type") === "insert").select(col("k"), col("v"))
        .exceptAll(feed.filter(col("_change_type") === "delete")
          .select(col("k"), col("v"))))
    assert(folded == canon(s2.table("mfz.t")),
      s"$tag: CDF fold across maintenance commits diverges")
  }

  test("maintenance fuzz: merge-on-read + sharded manifests (threshold 2)") {
    runHistory("morshard", mor = true, threshold = Some(2), seed = 7L)
  }
  test("maintenance fuzz: copy-on-write, inline manifest") {
    runHistory("cow", mor = false, threshold = None, seed = 13L)
  }
}
