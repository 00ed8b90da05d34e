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
    val path = s"$root/t"
    FuzzDml.applyRandomOps(s2, "cfz.t", rnd, steps = 10, nextId0 = 200L,
      restoreAt = Some(path))
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
    runHistory("mor", mor = true, threshold = None, seed = 23L)
  }
  test("CDF fold fuzz: sharded manifest list (threshold 2)") {
    runHistory("shard", mor = false, threshold = Some(2), seed = 41L)
  }
}
