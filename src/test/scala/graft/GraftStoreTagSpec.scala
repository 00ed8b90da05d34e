package graft

import java.io.File

import org.apache.spark.sql.functions._

import graft.sources.GraftStore

/** Named snapshot refs (tags), pinned at the protocol level:
  *
  *  - a tag resolves by name through every read surface (DataFrame
  *    `versionAsOf`, SQL `VERSION AS OF 'name'`) to exactly the tagged
  *    snapshot's content;
  *  - creation is ATOMIC and immutable (one `Files.createFile` per
  *    `_refs/<name>`): a duplicate is a loud refusal, as are all-digit
  *    names (would shadow version numbers) and non-file-safe names;
  *  - the load-bearing retention half: `expireSnapshots` pins tagged
  *    manifests, so after retention rolls past every untagged peer the
  *    tag still answers AND its exclusive data files survive GC;
  *  - dropping the tag releases the pin — the next expiry removes the
  *    manifest and the read fails loudly;
  *  - `$refs` renders (tag, version, n_rows) as a metadata table.
  */
class GraftStoreTagSpec extends SparkSuite {

  /** v1 = ids 0..9 (tagged), v2 OVERWRITES with ids 10..19 (so v1's data
    * files are EXCLUSIVE to the tagged snapshot — the GC-survival proof
    * needs files no later manifest references), v3 appends ids 20..29;
    * current = ids 10..29. */
  private def threeSnapshots(tag: Boolean = true): String = {
    val d = graft.ops.Util.managedTempDir("graft_tagspec_")
    def slice(lo: Int, mode: String): Unit =
      spark.range(lo, lo + 10).selectExpr("id", "id * 2 AS v").write
        .format("graft.sources.GraftStore").option("path", d)
        .mode(mode).save()
    slice(0, "overwrite")
    if (tag) GraftStore.tagCreate(d, "audit", 1L)
    slice(10, "overwrite"); slice(20, "append")
    d
  }

  test("a tag resolves by name on every read surface") {
    val d = threeSnapshots()
    val byOpt = spark.read.format("graft.sources.GraftStore")
      .option("path", d).option("versionAsOf", "audit").load()
    assert(byOpt.agg(count(lit(1)), sum("id")).collect().head.toSeq ==
      Seq(10L, 45L))
    // SQL time travel: VERSION AS OF accepts the tag name (Iceberg ref
    // surface). The catalog resolves it to the same snapshot.
    val root = d.stripSuffix("/").split('/').dropRight(1).mkString("/")
    val tbl = d.stripSuffix("/").split('/').last
    val s2 = spark.newSession()
    s2.conf.set("spark.sql.catalog.gtag", "graft.sources.GraftCatalog")
    s2.conf.set("spark.sql.catalog.gtag.root", root)
    val viaSql = s2.sql(
      s"SELECT count(*) AS n, sum(id) AS s FROM gtag.`$tbl` VERSION AS OF 'audit'")
      .collect().head
    assert(viaSql.getLong(0) == 10L && viaSql.getLong(1) == 45L)
    // and a numeric version string still reads as a version id
    val v2 = spark.read.format("graft.sources.GraftStore")
      .option("path", d).option("versionAsOf", "2").load()
    assert(v2.count() == 10L)
  }

  test("tag creation is atomic and immutable; bad names refuse loudly") {
    val d = threeSnapshots()
    val dup = intercept[IllegalArgumentException] {
      GraftStore.tagCreate(d, "audit", 2L)
    }
    assert(dup.getMessage.contains("already exists at v1"), dup.getMessage)
    val num = intercept[IllegalArgumentException] {
      GraftStore.tagCreate(d, "42", 1L)
    }
    assert(num.getMessage.contains("all digits"), num.getMessage)
    val bad = intercept[IllegalArgumentException] {
      GraftStore.tagCreate(d, "a/b", 1L)
    }
    assert(bad.getMessage.contains("file-safe"), bad.getMessage)
    val gone = intercept[IllegalArgumentException] {
      GraftStore.tagCreate(d, "later", 99L)
    }
    assert(gone.getMessage.contains("no such retained snapshot"), gone.getMessage)
    // unknown tag on read: loud, names the known tags
    val miss = intercept[IllegalArgumentException] {
      spark.read.format("graft.sources.GraftStore")
        .option("path", d).option("versionAsOf", "nope").load().count()
    }
    assert(miss.getMessage.contains("no tag 'nope'") &&
      miss.getMessage.contains("audit"), miss.getMessage)
  }

  test("expiry pins tagged manifests and GC keeps their data files") {
    val d = threeSnapshots()
    GraftStore.expireSnapshots(d, keepLast = 1, graceMs = 0L)
    // v1 survives via the tag; v2 (untagged, not newest) is expired
    val kept = GraftStore.snapshotFiles(d).map(_.getName)
    assert(kept.contains("_manifest.v1") && !kept.contains("_manifest.v2"),
      kept.mkString(","))
    // the tagged read still answers exactly v1 — v1's data files are
    // referenced by NO later manifest (v2 overwrote), so they survived
    // the grace-0 GC pass only because the pinned manifest holds them
    val tagged = spark.read.format("graft.sources.GraftStore")
      .option("path", d).option("versionAsOf", "audit").load()
    assert(tagged.agg(count(lit(1)), sum("id")).collect().head.toSeq ==
      Seq(10L, 45L))
    // current read unaffected
    assert(spark.read.format("graft.sources.GraftStore")
      .option("path", d).load().count() == 20L)
  }

  test("dropping the tag releases the pin") {
    val d = threeSnapshots()
    assert(GraftStore.tagDelete(d, "audit"))
    assert(!GraftStore.tagDelete(d, "audit")) // idempotent: already gone
    GraftStore.expireSnapshots(d, keepLast = 1, graceMs = 0L)
    assert(!GraftStore.snapshotFiles(d).map(_.getName).contains("_manifest.v1"))
    val ex = intercept[IllegalArgumentException] {
      spark.read.format("graft.sources.GraftStore")
        .option("path", d).option("versionAsOf", "audit").load().count()
    }
    assert(ex.getMessage.contains("no tag 'audit'"), ex.getMessage)
  }

  test("$refs metadata table renders (tag, version, n_rows)") {
    val d = threeSnapshots()
    GraftStore.tagCreate(d, "rc-2", 2L)
    val root = d.stripSuffix("/").split('/').dropRight(1).mkString("/")
    val tbl = d.stripSuffix("/").split('/').last
    val s2 = spark.newSession()
    s2.conf.set("spark.sql.catalog.gtagm", "graft.sources.GraftCatalog")
    s2.conf.set("spark.sql.catalog.gtagm.root", root)
    val rows = s2.sql(s"SELECT tag, version, n_rows FROM gtagm.`$tbl$$refs` ORDER BY tag")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(rows == Seq(("audit", 1L, 10L), ("rc-2", 2L, 10L)), rows.mkString(","))
  }
}
