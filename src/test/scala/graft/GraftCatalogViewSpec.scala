package graft

import java.io.File

/** ViewCatalog (round 13): `CREATE VIEW cat.v AS SELECT …` through
  * Spark 4's native ViewCatalog API — SQL text + capture context in a
  * `_view` sidecar, late-bound resolution at read time. */
class GraftCatalogViewSpec extends SparkSuite {

  // view DDL/resolution rides GraftExtensions (hint-batch rule) — a
  // plain newSession has no extension hook, so build a real extension
  // session on the shared context (GraftExtensionsSpec pattern)
  private lazy val extSession: org.apache.spark.sql.SparkSession = {
    spark // force the shared context first
    org.apache.spark.sql.SparkSession.builder()
      .master("local[4]")
      .withExtensions(new GraftExtensions())
      .config("spark.sql.shuffle.partitions", "4")
      .create()
  }

  private def freshCat(tag: String): (org.apache.spark.sql.SparkSession, String) = {
    val s2 = extSession
    val root = graft.ops.Util.managedTempDir(s"graft_viewspec_${tag}_")
    s2.conf.set(s"spark.sql.catalog.gv$tag", "graft.sources.GraftCatalog")
    s2.conf.set(s"spark.sql.catalog.gv$tag.root", root)
    (s2, root)
  }

  test("view lifecycle: create, late-bound read, nested view, drop") {
    val (s2, root) = freshCat("life")
    s2.range(0, 100).selectExpr("id", "id % 4 AS g")
      .createOrReplaceTempView("vsrc")
    s2.sql("CREATE TABLE gvlife.t AS SELECT * FROM vsrc WHERE id < 50")
    s2.sql("CREATE VIEW gvlife.agg AS SELECT g, count(*) AS n, sum(id) AS s FROM gvlife.t GROUP BY g")
    assert(s2.sql("SELECT sum(n) FROM gvlife.agg").head.getLong(0) == 50)
    // LATE BINDING: new rows appear in the view with zero refresh
    s2.sql("INSERT INTO gvlife.t SELECT * FROM vsrc WHERE id >= 50")
    assert(s2.sql("SELECT sum(n) FROM gvlife.agg").head.getLong(0) == 100)
    // nested view resolves through the same path
    s2.sql("CREATE VIEW gvlife.top AS SELECT g, n FROM gvlife.agg WHERE n >= 25")
    assert(s2.sql("SELECT count(*) FROM gvlife.top").head.getLong(0) == 4)
    // storage shape: one _view sidecar, no manifest
    assert(new File(s"$root/agg/_view").isFile)
    assert(!new File(s"$root/agg/_manifest").exists())
    s2.sql("DROP VIEW gvlife.top")
    intercept[Exception](s2.sql("SELECT * FROM gvlife.top").collect())
    assert(s2.sql("SELECT sum(n) FROM gvlife.agg").head.getLong(0) == 100,
      "dropping a dependent view must not disturb its base view")
  }

  test("SHOW VIEWS lists, ALTER VIEW SET properties persists, rename moves") {
    val (s2, root) = freshCat("meta")
    s2.sql("CREATE TABLE gvmeta.t AS SELECT 1 AS a")
    s2.sql("CREATE VIEW gvmeta.v1 AS SELECT a FROM gvmeta.t")
    s2.sql("CREATE VIEW gvmeta.v2 AS SELECT a + 1 AS b FROM gvmeta.t")
    val shown = s2.sql("SHOW VIEWS IN gvmeta").collect()
      .map(_.getString(1)).sorted.toSeq
    assert(shown == Seq("v1", "v2"), s"got $shown")
    s2.sql("ALTER VIEW gvmeta.v1 SET TBLPROPERTIES ('owner.team' = 'data')")
    // read the persisted property back through the ViewCatalog API
    // (SHOW TBLPROPERTIES has no v2-view resolution in vanilla Spark)
    val cat = s2.sessionState.catalogManager.catalog("gvmeta")
      .asInstanceOf[graft.sources.GraftCatalog]
    val vid = org.apache.spark.sql.connector.catalog.Identifier
      .of(Array.empty, "v1")
    assert(cat.loadView(vid).properties().get("owner.team") == "data")
    s2.sql("ALTER VIEW gvmeta.v1 RENAME TO gvmeta.v1b")
    assert(s2.sql("SELECT a FROM gvmeta.v1b").head.getInt(0) == 1)
    intercept[Exception](s2.sql("SELECT a FROM gvmeta.v1").collect())
    assert(new File(s"$root/v1b/_view").isFile)
  }

  test("refusals: duplicate view, view named like a table, table named like a view") {
    val (s2, _) = freshCat("ref")
    s2.sql("CREATE TABLE gvref.t AS SELECT 1 AS a")
    s2.sql("CREATE VIEW gvref.v AS SELECT a FROM gvref.t")
    intercept[Exception](
      s2.sql("CREATE VIEW gvref.v AS SELECT a FROM gvref.t"))
    intercept[Exception](
      s2.sql("CREATE VIEW gvref.t AS SELECT a FROM gvref.t"))
    // CREATE OR REPLACE is the sanctioned overwrite
    s2.sql("CREATE OR REPLACE VIEW gvref.v AS SELECT a + 41 AS a FROM gvref.t")
    assert(s2.sql("SELECT a FROM gvref.v").head.getInt(0) == 42)
  }

  // ---------------------------------------------------- round 14 depth

  test("capture context: unqualified names in a view body resolve against the CREATE-time catalog") {
    val (s2, _) = freshCat("ctx")
    s2.sql("CREATE TABLE gvctx.t AS SELECT 7 AS a")
    val mgr = s2.sessionState.catalogManager
    val prevCat = mgr.currentCatalog.name()
    try {
      // author the view under `USE gvctx`: body names `t` unqualified
      mgr.setCurrentCatalog("gvctx")
      s2.sql("CREATE VIEW gvctx.v AS SELECT a FROM t")
    } finally mgr.setCurrentCatalog(prevCat)
    // the READER is in a different catalog, with a same-named temp view
    // trying to hijack the name — the stored context must win
    s2.range(0, 1).selectExpr("999 AS a").createOrReplaceTempView("t")
    try {
      assert(s2.sql("SELECT a FROM gvctx.v").head.getInt(0) == 7,
        "view body resolved against the reader's context, not capture-time")
    } finally s2.catalog.dropTempView("t")
  }

  test("cycle guard: mutually-referencing views fail fast with a named cycle") {
    val (s2, _) = freshCat("cyc")
    s2.sql("CREATE TABLE gvcyc.t AS SELECT 1 AS a")
    s2.sql("CREATE VIEW gvcyc.v2 AS SELECT a FROM gvcyc.t")
    s2.sql("CREATE VIEW gvcyc.v1 AS SELECT a FROM gvcyc.v2")
    // redefine v2 to close the loop — the API path writes the sidecar
    // without analysis (SQL-path replace would catch it at analysis)
    val cat = s2.sessionState.catalogManager.catalog("gvcyc")
      .asInstanceOf[graft.sources.GraftCatalog]
    val v2id = org.apache.spark.sql.connector.catalog.Identifier
      .of(Array.empty, "v2")
    val schema = new org.apache.spark.sql.types.StructType()
      .add("a", org.apache.spark.sql.types.IntegerType)
    cat.dropView(v2id)
    cat.createView(new org.apache.spark.sql.connector.catalog.ViewInfo(
      v2id, "SELECT a FROM gvcyc.v1", "spark_catalog", Array.empty,
      schema, Array("a"), Array.empty, Array.empty,
      new java.util.HashMap[String, String]()))
    val e = intercept[Exception](s2.sql("SELECT a FROM gvcyc.v1").collect())
    assert(e.getMessage.contains("cycle"), e.getMessage)
    // a self-cycle fails the same way, not via fixpoint exhaustion
    cat.dropView(v2id)
    cat.createView(new org.apache.spark.sql.connector.catalog.ViewInfo(
      v2id, "SELECT a FROM gvcyc.v2", "spark_catalog", Array.empty,
      schema, Array("a"), Array.empty, Array.empty,
      new java.util.HashMap[String, String]()))
    val e2 = intercept[Exception](s2.sql("SELECT a FROM gvcyc.v2").collect())
    assert(e2.getMessage.contains("cycle"), e2.getMessage)
  }

  // -------------------------------------------------- round 15 depth

  test("table_changes TVF: qualified + current-catalog forms, version ranges, op honesty, loud refusals") {
    val (s2, root) = freshCat("tvf")
    s2.range(0, 10).selectExpr("id AS k", "id * 2 AS v")
      .createOrReplaceTempView("tvf_src")
    s2.sql("CREATE TABLE gvtvf.t AS SELECT * FROM tvf_src WHERE k < 5") // v1
    s2.sql("INSERT INTO gvtvf.t SELECT * FROM tvf_src WHERE k >= 5")    // v2
    s2.sql("DELETE FROM gvtvf.t WHERE k = 7")                           // v3
    // full feed, catalog-qualified name
    val full = s2.sql(
      "SELECT _commit_version, _change_type, k FROM table_changes('gvtvf.t', 0) ORDER BY 1, 2, 3")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    // copy-on-write DELETE surfaces at file granularity: the victim's
    // file (k=7,8,9) emits delete for all three and re-inserts 8,9 —
    // net change exact
    assert(full.count(_._2 == "insert") == 12, full.mkString(", "))
    assert(full.filter(t => t._1 == 3L && t._2 == "delete").map(_._3).toSet
      == Set(7L, 8L, 9L), full.mkString(", "))
    assert(full.filter(t => t._1 == 3L && t._2 == "insert").map(_._3).toSet
      == Set(8L, 9L), full.mkString(", "))
    // version RANGE: Delta boundary semantics — BOTH inclusive, so
    // [2, 2] is exactly the second append and [1, 2] includes the CTAS
    val range = s2.sql(
      "SELECT _change_type, k FROM table_changes('gvtvf.t', 2, 2) ORDER BY k")
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(range.toSeq == (5L until 10L).map(("insert", _)).toSeq,
      range.mkString(", "))
    assert(s2.sql("SELECT count(*) FROM table_changes('gvtvf.t', 1, 2)")
      .head.getLong(0) == 10, "inclusive-from must keep version 1's changes")
    // current-catalog form: unqualified name under USE gvtvf
    val mgr = s2.sessionState.catalogManager
    val prev = mgr.currentCatalog.name()
    try {
      mgr.setCurrentCatalog("gvtvf")
      assert(s2.sql("SELECT count(*) FROM table_changes('t', 2, 2)")
        .head.getLong(0) == 5)
    } finally mgr.setCurrentCatalog(prev)
    // timestamp boundaries resolve through the commit index: from = the
    // instant of v2's commit (earliest at-or-after) → v2..v3; a from
    // past the last commit refuses loudly
    val commits = graft.sources.GraftStore.commitTimestamps(s"$root/t").toMap
    def utc(ms: Long): String = java.time.Instant.ofEpochMilli(ms)
      .atZone(java.time.ZoneOffset.UTC).toLocalDateTime
      .format(java.time.format.DateTimeFormatter
        .ofPattern("yyyy-MM-dd HH:mm:ss.SSS"))
    val fromTs = s2.sql(
      s"SELECT count(*) FROM table_changes('gvtvf.t', '${utc(commits(2L))}')")
      .head.getLong(0)
    // v2 (5 inserts) + v3's COW delete file churn (3 deletes + 2 inserts)
    assert(fromTs == 10, s"ts-from feed rows: $fromTs")
    val eTs = intercept[Exception](s2.sql(
      s"SELECT * FROM table_changes('gvtvf.t', '${utc(commits.values.max + 60000)}')")
      .collect())
    assert(eTs.getMessage.contains("at or after") ||
      (eTs.getCause != null && eTs.getCause.getMessage.contains("at or after")),
      eTs.getMessage)
    // boundary kinds MIX per position: version from, timestamp to
    assert(s2.sql(
      s"SELECT count(*) FROM table_changes('gvtvf.t', 2, '${utc(commits(2L))}')")
      .head.getLong(0) == 5, "version-from + ts-to must bracket exactly v2")
    // a 2-part call whose qualifier is NOT a graft catalog is never
    // hijacked, even though the string arg would resolve here
    intercept[Exception](s2.sql(
      "SELECT * FROM spark_catalog.table_changes('gvtvf.t', 0)").collect())
    // loud refusals: unknown table; a non-graft name falls through to
    // Spark's own unresolved-TVF error
    val e1 = intercept[Exception](
      s2.sql("SELECT * FROM table_changes('gvtvf.nope', 0)").collect())
    assert(e1.getMessage.contains("nope"), e1.getMessage)
    intercept[Exception](
      s2.sql("SELECT * FROM table_changes('spark_catalog.x.y', 0)").collect())
  }

  test("subquery depth: capture-time qualification and the cycle guard reach into IN/EXISTS subqueries") {
    val (s2, _) = freshCat("sub")
    s2.sql("CREATE TABLE gvsub.t AS SELECT 7 AS a")
    s2.sql("CREATE TABLE gvsub.keys AS SELECT 7 AS k")
    val mgr = s2.sessionState.catalogManager
    val prevCat = mgr.currentCatalog.name()
    try {
      // author under `USE gvsub`: `keys` appears ONLY inside an IN
      // subquery — plain transformUp would never qualify it
      mgr.setCurrentCatalog("gvsub")
      s2.sql("CREATE VIEW gvsub.v AS SELECT a FROM t " +
        "WHERE a IN (SELECT k FROM keys)")
    } finally mgr.setCurrentCatalog(prevCat)
    // the reader hijacks BOTH names with temp views that would change
    // the answer — capture-time context must win inside the subquery too
    s2.range(0, 1).selectExpr("999 AS a").createOrReplaceTempView("t")
    s2.range(0, 1).selectExpr("999 AS k").createOrReplaceTempView("keys")
    try {
      assert(s2.sql("SELECT a FROM gvsub.v").head.getInt(0) == 7,
        "a table referenced only inside a subquery resolved against " +
          "the reader's context, not capture-time")
    } finally {
      s2.catalog.dropTempView("t"); s2.catalog.dropTempView("keys")
    }
    // a view cycle routed THROUGH a subquery fails the named guard, not
    // analyzer fixpoint exhaustion
    val cat = s2.sessionState.catalogManager.catalog("gvsub")
      .asInstanceOf[graft.sources.GraftCatalog]
    val cid = org.apache.spark.sql.connector.catalog.Identifier
      .of(Array.empty, "c")
    val schema = new org.apache.spark.sql.types.StructType()
      .add("a", org.apache.spark.sql.types.IntegerType)
    cat.createView(new org.apache.spark.sql.connector.catalog.ViewInfo(
      cid, "SELECT a FROM gvsub.t WHERE a IN (SELECT a FROM gvsub.c)",
      "spark_catalog", Array.empty, schema, Array("a"), Array.empty,
      Array.empty, new java.util.HashMap[String, String]()))
    val e = intercept[Exception](s2.sql("SELECT a FROM gvsub.c").collect())
    assert(e.getMessage.contains("cycle"), e.getMessage)
  }

  test("ALTER VIEW AS redefines in place, preserves properties; failed redefinition leaves the view intact") {
    val (s2, _) = freshCat("alt")
    s2.sql("CREATE TABLE gvalt.t AS SELECT 5 AS a")
    s2.sql("CREATE VIEW gvalt.v AS SELECT a FROM gvalt.t")
    s2.sql("ALTER VIEW gvalt.v SET TBLPROPERTIES ('team' = 'data')")
    s2.sql("ALTER VIEW gvalt.v AS SELECT a * 2 AS a FROM gvalt.t")
    assert(s2.sql("SELECT a FROM gvalt.v").head.getInt(0) == 10)
    val cat = s2.sessionState.catalogManager.catalog("gvalt")
      .asInstanceOf[graft.sources.GraftCatalog]
    val vid = org.apache.spark.sql.connector.catalog.Identifier
      .of(Array.empty, "v")
    assert(cat.loadView(vid).properties().get("team") == "data",
      "redefinition must preserve view properties")
    // a body that fails analysis leaves the old definition standing
    intercept[Exception](
      s2.sql("ALTER VIEW gvalt.v AS SELECT no_such_col FROM gvalt.t"))
    assert(s2.sql("SELECT a FROM gvalt.v").head.getInt(0) == 10)
  }

  test("rename-under-a-view: a renamed base column makes the view read fail loudly (late binding)") {
    val (s2, root) = freshCat("ren")
    s2.sql("CREATE TABLE gvren.t AS SELECT 3 AS a, 4 AS b")
    s2.sql("CREATE VIEW gvren.v AS SELECT a FROM gvren.t")
    s2.sql("ALTER TABLE gvren.t RENAME COLUMN a TO a2")
    // late binding re-resolves the stored text: `a` no longer exists —
    // the behavior we PIN is a loud analysis failure, never silent
    // stale data
    intercept[Exception](s2.sql("SELECT a FROM gvren.v").collect())
    // redefinition against the new name repairs it
    s2.sql("ALTER VIEW gvren.v AS SELECT a2 AS a FROM gvren.t")
    assert(s2.sql("SELECT a FROM gvren.v").head.getInt(0) == 3)
  }
}
