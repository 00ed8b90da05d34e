package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

import graft.sources.GraftStore

/** Seeded fuzz for schema evolution composed with DML, checked against
  * a driver-side reference model. The evolve specs pin each mechanism
  * (rename stats remap, widen lane promotion, add-column null-pad) on
  * crafted tables; this fuzz runs random INTERLEAVINGS — append,
  * keyed delete/update, RENAME COLUMN, ALTER TYPE BIGINT, ADD COLUMN —
  * and after every operation compares the full table to a model that
  * applied the same operation to plain Scala values. At the end, every
  * recorded snapshot is re-read via time travel and must still equal
  * what the model held when that version committed (era schema and
  * all): evolution is metadata-only, so history must never shift under
  * later renames/widens. Types limited to long/int/string (doubles
  * would drag formatting into the comparison, not semantics). */
class EvolveFuzzSpec extends SparkSuite {

  private case class Model(
      var names: Vector[String],   // column names, table order
      var types: Vector[String],   // "long" | "int" | "string"
      var rows: Vector[Vector[Any]]) {
    def canon: Seq[String] =
      rows.map(_.map(v => if (v == null) "null" else v.toString)
        .mkString("[", ",", "]")).sorted
  }

  private def canonDf(df: DataFrame, names: Seq[String]): Seq[String] =
    df.select(names.map(col): _*).collect().map(_.toString).sorted.toSeq

  private def runHistory(tag: String, seed: Long): Unit = {
    val root = graft.ops.Util.managedTempDir(s"graft_evolve_fuzz_${tag}_")
    val s2 = spark.newSession()
    s2.conf.set("spark.sql.catalog.efz", "graft.sources.GraftCatalog")
    s2.conf.set("spark.sql.catalog.efz.root", root)
    val rnd = new scala.util.Random(seed)
    val path = s"$root/t"

    s2.sql("""CREATE TABLE efz.t AS
      |SELECT id AS k, CAST(id % 100 AS INT) AS a,
      |       concat('s', CAST(id % 7 AS STRING)) AS s0
      |FROM range(0, 120)""".stripMargin)
    val m = Model(Vector("k", "a", "s0"), Vector("long", "int", "string"),
      (0L until 120L).map(id =>
        Vector[Any](id, (id % 100).toInt, "s" + (id % 7))).toVector)
    var nextId = 120L
    var renameN = 0
    // version -> (era column names, model canon at that commit)
    val eras = scala.collection.mutable.Map[Long, (Vector[String], Seq[String])]()

    def sqlValueExpr(tpe: String, j: Int): String = tpe match {
      case "long" => s"id * ${j + 1}"
      case "int" => s"CAST((id + $j) % 1000 AS INT)"
      case _ => s"concat('s', CAST(id % 7 AS STRING))"
    }
    def modelValue(tpe: String, j: Int, id: Long): Any = tpe match {
      case "long" => id * (j + 1)
      case "int" => ((id + j) % 1000).toInt
      case _ => "s" + (id % 7)
    }

    (1 to 16).foreach { step =>
      rnd.nextInt(8) match {
        case 0 | 1 => // append under the CURRENT schema
          val exprs = m.names.indices.map(j =>
            s"${sqlValueExpr(m.types(j), j)} AS `${m.names(j)}`")
          s2.sql(s"""INSERT INTO efz.t
            |SELECT ${exprs.mkString(", ")}
            |FROM range($nextId, ${nextId + 30})""".stripMargin)
          m.rows ++= (nextId until nextId + 30).map(id =>
            m.names.indices.map(j => modelValue(m.types(j), j, id)).toVector)
          nextId += 30
        case 2 => // keyed delete (k is always column 0, current name tracked)
          val md = 2 + rnd.nextInt(5); val r = rnd.nextInt(md)
          s2.sql(s"DELETE FROM efz.t WHERE `${m.names(0)}` % $md = $r")
          m.rows = m.rows.filterNot(row => row(0).asInstanceOf[Long] % md == r)
        case 3 => // keyed update of a random non-key numeric column
          val cands = m.names.indices.drop(1)
            .filter(j => m.types(j) == "int" || m.types(j) == "long")
          if (cands.nonEmpty) {
            val j = cands(rnd.nextInt(cands.length))
            val md = 2 + rnd.nextInt(5); val r = rnd.nextInt(md)
            s2.sql(s"""UPDATE efz.t SET `${m.names(j)}` = `${m.names(j)}` + 1
              |WHERE `${m.names(0)}` % $md = $r""".stripMargin)
            m.rows = m.rows.map { row =>
              if (row(0).asInstanceOf[Long] % md == r && row(j) != null)
                row.updated(j, row(j) match {
                  case i: Int => i + 1
                  case l: Long => l + 1
                })
              else row
            }
          }
        case 4 => // rename a random column
          val j = rnd.nextInt(m.names.length)
          renameN += 1
          val nn = s"r$renameN"
          s2.sql(s"ALTER TABLE efz.t RENAME COLUMN `${m.names(j)}` TO `$nn`")
          m.names = m.names.updated(j, nn)
        case 5 => // widen a random int column to long
          val cands = m.names.indices.filter(j => m.types(j) == "int")
          if (cands.nonEmpty) {
            val j = cands(rnd.nextInt(cands.length))
            s2.sql(s"ALTER TABLE efz.t ALTER COLUMN `${m.names(j)}` TYPE BIGINT")
            m.types = m.types.updated(j, "long")
            m.rows = m.rows.map(row => row.updated(j, row(j) match {
              case null => null
              case i: Int => i.toLong
            }))
          }
        case 6 => // add a nullable column: old rows null-pad
          renameN += 1
          val nn = s"c$renameN"
          val tpe = if (rnd.nextBoolean()) "int" else "string"
          val sqlT = if (tpe == "int") "INT" else "STRING"
          s2.sql(s"ALTER TABLE efz.t ADD COLUMN `$nn` $sqlT")
          m.names :+= nn
          m.types :+= tpe
          m.rows = m.rows.map(_ :+ null)
        case _ => // maintenance across evolved files must stay invariant
          s2.sql("CALL efz.system.compact('t', 134217728)").collect()
      }
      val got = canonDf(s2.table("efz.t"), m.names)
      assert(got == m.canon,
        s"$tag step $step diverged from the model " +
          s"(cols ${m.names.mkString(",")}): store ${got.length} rows vs " +
          s"model ${m.rows.length}; first store row ${got.headOption}, " +
          s"first model row ${m.canon.headOption}")
      eras(GraftStore.readVersion(path)) = (m.names, m.canon)
    }
    // time travel: every recorded snapshot re-reads exactly as the model
    // held it THEN — later renames/widens must not bleed backwards
    eras.toSeq.sortBy(_._1).foreach { case (v, (names, expect)) =>
      val tt = spark.read.format("graft.sources.GraftStore")
        .option("path", path).option("versionAsOf", v.toString).load()
      assert(canonDf(tt, names) == expect,
        s"$tag: time travel to v$v no longer matches the era model")
    }
    assert(m.rows.nonEmpty, s"$tag: degenerate history (empty table)")
  }

  test("evolution fuzz, seed 101") { runHistory("s101", 101L) }
  test("evolution fuzz, seed 202") { runHistory("s202", 202L) }
}
