package graft.ops

import org.apache.spark.sql.functions._
import Util._

/** SURVEY.md §2.6 sorts/limits + §2.7 set operations.
  *
  * Scale notes: orderBy+limit plans as TakeOrderedAndProject (per-partition
  * top-k, then k·partitions rows to the driver — no global sort). Set ops
  * are shuffle-based distinct aggregations; duplicate-identical rows make a
  * non-unique orderBy deterministic for the hash compare.
  */
object SetSort {

  /** Global top-10 revenue parts: TakeOrderedAndProject, not a full sort. */
  val qSortLimit: Q = (s, dir) => {
    import s.implicits._
    table(s, dir, "lineitem")
      .groupBy($"l_partkey")
      .agg(sum(dec($"l_extendedprice") * (lit(1).cast("decimal(18,4)") - dec($"l_discount")))
        .cast("double").as("revenue"))
      .orderBy($"revenue".desc, $"l_partkey")
      .limit(10)
  }

  /** Multi-key sort with explicit NULLS FIRST (nulls synthesized — fixtures
    * have none) and a desc secondary key. */
  val qSortMulti: Q = (s, dir) => {
    import s.implicits._
    table(s, dir, "orders")
      .select($"o_orderkey", nullif($"o_orderstatus", lit("P")).as("st"),
        $"o_totalprice")
      .orderBy($"st".asc_nulls_first, $"o_totalprice".desc, $"o_orderkey")
  }

  private def unionSides(s: org.apache.spark.sql.SparkSession, dir: String) = {
    import s.implicits._
    val o = table(s, dir, "orders")
    (o.filter($"o_totalprice" > 200000.0).select($"o_orderkey"),
      o.filter($"o_orderdate" >= ts("1998-01-01 00:00:00")).select($"o_orderkey"))
  }

  /** UNION ALL captured as per-key duplicate counts (covers both the bag
    * union and, via the key set itself, UNION DISTINCT). */
  val qSetUnion: Q = (s, dir) => {
    import s.implicits._
    val (a, b) = unionSides(s, dir)
    a.unionAll(b)
      .groupBy($"o_orderkey")
      .agg(count(lit(1)).as("n_dup"))
      .orderBy($"o_orderkey")
  }

  /** INTERSECT (distinct semantics): rich customers with a big order. */
  val qSetIntersect: Q = (s, dir) => {
    import s.implicits._
    val c = table(s, dir, "customer")
    val o = table(s, dir, "orders")
    c.filter($"c_acctbal" > 5000.0).select($"c_custkey")
      .intersect(o.filter($"o_totalprice" > 150000.0)
        .select($"o_custkey".as("c_custkey")))
      .orderBy($"c_custkey")
  }

  /** EXCEPT (distinct semantics): rich customers with no big order. */
  val qSetExcept: Q = (s, dir) => {
    import s.implicits._
    val c = table(s, dir, "customer")
    val o = table(s, dir, "orders")
    c.filter($"c_acctbal" > 5000.0).select($"c_custkey")
      .except(o.filter($"o_totalprice" > 150000.0)
        .select($"o_custkey".as("c_custkey")))
      .orderBy($"c_custkey")
  }

  val queries: Map[String, Q] = Map(
    "q_sort_limit" -> qSortLimit,
    "q_sort_multi" -> qSortMulti,
    "q_set_union" -> qSetUnion,
    "q_set_intersect" -> qSetIntersect,
    "q_set_except" -> qSetExcept,
  )

  val oracleSql: Map[String, String] = Map(
    "q_sort_limit" ->
      """SELECT l_partkey,
        | CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4)) * (CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4)))) AS DOUBLE) AS revenue
        |FROM lineitem GROUP BY l_partkey
        |ORDER BY revenue DESC, l_partkey LIMIT 10""".stripMargin,
    "q_sort_multi" ->
      """SELECT o_orderkey, nullif(o_orderstatus, 'P') AS st, o_totalprice
        |FROM orders
        |ORDER BY st ASC NULLS FIRST, o_totalprice DESC, o_orderkey""".stripMargin,
    "q_set_union" ->
      """SELECT o_orderkey, count(*) AS n_dup FROM (
        | SELECT o_orderkey FROM orders WHERE o_totalprice > 200000.0
        | UNION ALL
        | SELECT o_orderkey FROM orders WHERE o_orderdate >= TIMESTAMP '1998-01-01')
        |GROUP BY o_orderkey ORDER BY o_orderkey""".stripMargin,
    "q_set_intersect" ->
      """SELECT c_custkey FROM customer WHERE c_acctbal > 5000.0
        |INTERSECT
        |SELECT o_custkey AS c_custkey FROM orders WHERE o_totalprice > 150000.0
        |ORDER BY c_custkey""".stripMargin,
    "q_set_except" ->
      """SELECT c_custkey FROM customer WHERE c_acctbal > 5000.0
        |EXCEPT
        |SELECT o_custkey AS c_custkey FROM orders WHERE o_totalprice > 150000.0
        |ORDER BY c_custkey""".stripMargin,
  )
}
