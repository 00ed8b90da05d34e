package graft

/** SCD2's CDC contract beyond the oracle's final-state check: applying
  * the SAME batch twice must change nothing — the close-MERGE's
  * changed-guard makes the re-delivery a no-op and the anti-join finds
  * every key already open. (The q_store_scd2 query itself rebuilds its
  * table per invocation; this spec drives the same apply loop and then
  * REPLAYS the last batch.) */
class Scd2Spec extends SparkSuite {

  test("re-applying a batch is a no-op: no new versions, no reopened intervals") {
    val s2 = spark.newSession()
    val root = graft.ops.Util.managedTempDir("graft_scd2_spec_")
    s2.conf.set("spark.sql.catalog.gsd", "graft.sources.GraftCatalog")
    s2.conf.set("spark.sql.catalog.gsd.root", root)
    s2.range(0, 300).selectExpr("id AS k", "CAST(id % 7 AS DECIMAL(18,4)) AS price")
      .createOrReplaceTempView("b1")
    s2.range(0, 450).selectExpr("id AS k",
        "CAST(id % 7 + CASE WHEN id % 2 = 0 THEN 50 ELSE 0 END AS DECIMAL(18,4)) AS price")
      .createOrReplaceTempView("b2")
    s2.sql(
      """CREATE TABLE gsd.d AS
        |SELECT CAST(0 AS BIGINT) AS k, CAST(0 AS DECIMAL(18,4)) AS price,
        |       CAST(0 AS BIGINT) AS ver_from, CAST(0 AS BIGINT) AS ver_to
        |WHERE 1 = 0""".stripMargin)
    def apply(batch: String, ver: Int): Unit = {
      s2.sql(
        s"""MERGE INTO gsd.d t USING $batch s
           |ON t.k = s.k AND t.ver_to = 0
           |WHEN MATCHED AND t.price <> s.price THEN UPDATE SET ver_to = $ver
           |""".stripMargin)
      s2.sql(
        s"""INSERT INTO gsd.d
           |SELECT s.k, s.price, $ver, CAST(0 AS BIGINT)
           |FROM $batch s
           |LEFT ANTI JOIN (SELECT k FROM gsd.d WHERE ver_to = 0) c ON s.k = c.k""".stripMargin)
    }
    apply("b1", 1)
    apply("b2", 2)
    val before = s2.sql("SELECT * FROM gsd.d ORDER BY k, ver_from").collect().toSeq
    // every key open exactly once; evens have two versions, odds one,
    // 300..449 arrive in v2 only
    assert(before.count(_.getLong(3) == 0L) == 450)
    assert(before.size == 450 + 150, s"got ${before.size}")
    // the CDC re-delivery: same batch, same version stamp — NOTHING moves
    apply("b2", 2)
    val after = s2.sql("SELECT * FROM gsd.d ORDER BY k, ver_from").collect().toSeq
    assert(after == before, "re-applied batch must be a complete no-op")
    // and a LATER re-delivery of the same content is also a no-op (the
    // changed-guard, not the version stamp, is what protects history)
    apply("b2", 3)
    val after3 = s2.sql("SELECT * FROM gsd.d ORDER BY k, ver_from").collect().toSeq
    assert(after3 == before, "unchanged content must never open a new version")
  }
}
