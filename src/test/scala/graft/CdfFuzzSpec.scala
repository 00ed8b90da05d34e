package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.GraftStore

/** Seeded fuzz for the change-feed FOLD invariant: for ANY history of
  * appends / DELETEs / UPDATEs / MERGEs / INSERT OVERWRITEs, replaying
  * the change feed over a base snapshot must reconstruct the table —
  * snapshot(v) ∪ inserts(v→head] − deletes(v→head] == current, as
  * multisets, for v = 0 (empty base) and a random midpoint. The
  * targeted CDF specs pin each emission branch on crafted histories;
  * this fuzz pins their COMPOSITION under three physical regimes where
  * the planner takes different paths: copy-on-write inline manifests,
  * merge-on-read (DV + equality-delete sidecars), and a sharded
  * manifest list (threshold 2). Seeds fixed, histories deterministic. */
class CdfFuzzSpec extends SparkSuite {

  private def canon(df: DataFrame): Seq[String] =
    df.select(col("k"), col("v")).collect().map(_.toString).sorted.toSeq

  private def runHistory(tag: String, mor: Boolean, threshold: Option[Int],
      seed: Long): Unit = {
    val root = graft.ops.Util.managedTempDir(s"graft_cdf_fuzz_${tag}_")
    val s2 = spark.newSession()
    s2.conf.set("spark.sql.catalog.cfz", "graft.sources.GraftCatalog")
    s2.conf.set("spark.sql.catalog.cfz.root", root)
    threshold.foreach(t =>
      s2.conf.set("spark.graft.manifest.shardThreshold", t.toString))
    val rnd = new scala.util.Random(seed)
    val props =
      if (mor) "TBLPROPERTIES('write.mode'='merge-on-read')" else ""
    s2.sql(s"""CREATE TABLE cfz.t $props AS
      |SELECT id AS k, id * 10 AS v FROM range(0, 200)""".stripMargin)
    var nextId = 200L
    (1 to 10).foreach { _ =>
      rnd.nextInt(10) match {
        case 0 | 1 | 2 => // append a fresh id block
          s2.sql(s"""INSERT INTO cfz.t
            |SELECT id AS k, id * 10 AS v
            |FROM range($nextId, ${nextId + 50})""".stripMargin)
          nextId += 50
        case 3 | 4 => // keyed delete
          val m = 2 + rnd.nextInt(5)
          s2.sql(s"DELETE FROM cfz.t WHERE k % $m = ${rnd.nextInt(m)}")
        case 5 | 6 => // keyed update (pre-image delete + post-image insert)
          val m = 2 + rnd.nextInt(5)
          s2.sql(
            s"UPDATE cfz.t SET v = v + 7 WHERE k % $m = ${rnd.nextInt(m)}")
        case 7 | 8 => // merge upsert straddling the id frontier
          val lo = nextId - 25
          s2.sql(s"""MERGE INTO cfz.t t
            |USING (SELECT id AS k, id * 10 + 1 AS v
            |       FROM range($lo, ${lo + 50})) s
            |ON t.k = s.k
            |WHEN MATCHED THEN UPDATE SET v = s.v
            |WHEN NOT MATCHED THEN INSERT (k, v) VALUES (s.k, s.v)"""
            .stripMargin)
          nextId += 25
        case _ => // full overwrite: delete-all + insert-all in the feed
          s2.sql(s"""INSERT OVERWRITE cfz.t
            |SELECT id AS k, id * 10 + 3 AS v
            |FROM range(0, ${100 + rnd.nextInt(100)})""".stripMargin)
      }
    }
    val path = s"$root/t"
    def fold(base: DataFrame, fromV: Long): Seq[String] = {
      val feed = spark.read.format("graft.sources.GraftStore")
        .option("path", path).option("changesFrom", fromV.toString).load()
      val ins = feed.filter(col("_change_type") === "insert")
        .select(col("k"), col("v"))
      val del = feed.filter(col("_change_type") === "delete")
        .select(col("k"), col("v"))
      canon(base.select(col("k"), col("v")).unionAll(ins).exceptAll(del))
    }
    val current = canon(s2.table("cfz.t"))
    val empty = s2.range(0).select(col("id").as("k"), col("id").as("v"))
    assert(fold(empty, 0L) == current,
      s"$tag: full-history CDF fold does not reconstruct the table")
    val head = GraftStore.readVersion(path)
    val mid = 1L + rnd.nextInt(head.toInt)
    val snap = spark.read.format("graft.sources.GraftStore")
      .option("path", path).option("versionAsOf", mid.toString).load()
    assert(fold(snap, mid) == current,
      s"$tag: CDF fold from v$mid over its snapshot diverges")
    assert(current.nonEmpty, s"$tag: degenerate history (empty table)")
  }

  test("CDF fold fuzz: copy-on-write, inline manifest") {
    runHistory("cow", mor = false, threshold = None, seed = 11L)
  }
  test("CDF fold fuzz: merge-on-read (DV + equality deletes)") {
    runHistory("mor", mor = true, threshold = None, seed = 22L)
  }
  test("CDF fold fuzz: sharded manifest list (threshold 2)") {
    runHistory("shard", mor = false, threshold = Some(2), seed = 33L)
  }
}
