package graft

import org.apache.spark.sql.SparkSession

/** Shared random-DML history generator for the fuzz suites. Emits
  * appends, keyed DELETEs/UPDATEs, frontier-straddling MERGEs and
  * INSERT OVERWRITEs against a (k BIGINT, v BIGINT) catalog table.
  * Invariant by construction: `k` stays unique across the table (fresh
  * id blocks, keyed updates, overwrites that clear first), so keyed
  * CDC consumers (upsert-by-k mirrors) are well-defined over any
  * generated history. Deterministic for a given Random. */
object FuzzDml {

  /** Apply `steps` random operations; returns the advanced id frontier.
    * With `restoreAt` (the table's filesystem path) the overwrite slot
    * sometimes issues `CALL restore` to a random retained version
    * instead — the re-added-files CDF branch under random composition.
    * The extra Random draw happens only when `restoreAt` is set, so
    * histories generated without it keep their exact op sequences. */
  def applyRandomOps(s2: SparkSession, qualified: String,
      rnd: scala.util.Random, steps: Int, nextId0: Long,
      restoreAt: Option[String] = None): Long = {
    var nextId = nextId0
    val trace = scala.collection.mutable.Buffer[String]()
    (1 to steps).foreach { _ =>
      rnd.nextInt(10) match {
        case 0 | 1 | 2 =>
          trace += "append"
          s2.sql(s"""INSERT INTO $qualified
            |SELECT id AS k, id * 10 AS v
            |FROM range($nextId, ${nextId + 50})""".stripMargin)
          nextId += 50
        case 3 | 4 =>
          trace += "delete"
          val m = 2 + rnd.nextInt(5)
          s2.sql(s"DELETE FROM $qualified WHERE k % $m = ${rnd.nextInt(m)}")
        case 5 | 6 =>
          trace += "update"
          val m = 2 + rnd.nextInt(5)
          s2.sql(
            s"UPDATE $qualified SET v = v + 7 WHERE k % $m = ${rnd.nextInt(m)}")
        case 7 | 8 =>
          trace += "merge"
          val lo = nextId - 25
          s2.sql(s"""MERGE INTO $qualified t
            |USING (SELECT id AS k, id * 10 + 1 AS v
            |       FROM range($lo, ${lo + 50})) s
            |ON t.k = s.k
            |WHEN MATCHED THEN UPDATE SET v = s.v
            |WHEN NOT MATCHED THEN INSERT (k, v) VALUES (s.k, s.v)"""
            .stripMargin)
          nextId += 25
        case _ =>
          val retained = restoreAt.filter(_ => rnd.nextBoolean())
            .map(p => graft.sources.GraftStore.history(p).map(_._1).sorted)
            .filter(_.length >= 2)
          retained match {
            case Some(vs) => // roll back to a random earlier snapshot
              trace += "restore"
              val Array(cat, tbl) = qualified.split('.')
              val v = vs.init(rnd.nextInt(vs.length - 1))
              s2.sql(s"CALL $cat.system.restore('$tbl', $v)").collect()
            case None =>
              trace += "overwrite"
              s2.sql(s"""INSERT OVERWRITE $qualified
                |SELECT id AS k, id * 10 + 3 AS v
                |FROM range(0, ${100 + rnd.nextInt(100)})""".stripMargin)
          }
      }
    }
    // one line per history so a failing seed's op mix is in the test log
    println(s"[fuzzdml] $qualified: ${trace.mkString(",")}")
    nextId
  }
}
