package graft.ops

import org.apache.spark.sql.SparkSession
import Util._

/** TPC-H completion (round 17): the 15 queries Extras.scala didn't cover
  * — Q2/Q4/Q7-Q9/Q11-Q13/Q15-Q17/Q19-Q22 — each as ONE SQL text that runs
  * verbatim on Spark and the DuckDB oracle. Together with Extras'
  * Q1/Q3/Q5/Q6/Q10/Q14/Q18 this makes the canon 22/22, and it closes the
  * last relational plan shapes with no oracle entry: Q21's EXISTS +
  * NOT-EXISTS chain over the same fact, and Q17/Q20's correlated
  * scalar-aggregate subqueries (decorrelation pinned in PlanShapeSpec —
  * no per-row subquery execution survives optimization).
  *
  * Fixture adaptations (the driver's tables carry a reduced column set;
  * every adaptation preserves the query's distinctive PLAN SHAPE):
  *  - no `partsupp` table → a `partsupp` CTE derived from lineitem:
  *    ps_supplycost := min(l_extendedprice) per (partkey, suppkey),
  *    ps_availqty := line count (Q2/Q9/Q11/Q16/Q20). The CTE is a
  *    one-shuffle aggregate at (part, supp) grain — at 100 TB it is the
  *    same shuffle the real partsupp scan would induce, and Catalyst
  *    plans it once per reference (DuckDB CSE's it; Spark re-derives —
  *    both correct, the fixture sizes keep the double derivation cheap).
  *  - no l_commitdate/l_receiptdate → "late" := l_shipdate > o_orderdate
  *    (Q4/Q12/Q21; ~51% selectivity at sf0.01, verified non-degenerate).
  *    In Q21, l3's lateness references the OUTER o_orderdate — the same
  *    multi-outer-attribute correlation the original carries.
  *  - no p_container / l_shipmode → p_type / l_returnflag stand in for
  *    the categorical filters (Q12/Q16/Q19); no c_phone → cntrycode :=
  *    substring(c_name, 16, 1), the hundreds digit of the zero-padded
  *    custkey (Q22, uniform 10-way split).
  *  - every customer has orders at every sf, so Q22's "no orders" anti
  *    join becomes "no orders since 1999" — still a correlated NOT
  *    EXISTS against the full orders table.
  *
  * Determinism discipline per SURVEY §5.4: money sums go through
  * DECIMAL(18,4) and cast to DOUBLE (with round(...,4) wherever the
  * scale-8 product sum can exceed 2^53 unscaled at sf0.1 — the
  * e8e116e / q_sql_q1 class); EXTRACT(YEAR ...) is cast to BIGINT on
  * both engines (Spark yields INT, DuckDB BIGINT); averages are
  * exact-decimal sums divided by bigint counts (one IEEE divide);
  * every ORDER BY carries a unique tiebreak.
  */
object TpcH {

  private def views(s: SparkSession, dir: String): Unit =
    Seq("customer", "orders", "lineitem", "part",
        "supplier", "nation", "region").foreach { t =>
      table(s, dir, t).createOrReplaceTempView(t)
    }

  /** Q2 minimum-cost supplier: the correlated scalar MIN subquery over the
    * derived partsupp, re-entered from the outer part row — Catalyst
    * decorrelates to an aggregate + join (no per-part rescan). */
  private val sqlQ2 =
    """WITH partsupp AS (
      |  SELECT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey,
      |         min(l_extendedprice) AS ps_supplycost
      |  FROM lineitem GROUP BY 1, 2)
      |SELECT s_acctbal, s_name, n_name, p_partkey, p_name, ps_supplycost
      |FROM part, supplier, partsupp, nation, region
      |WHERE p_partkey = ps_partkey AND s_suppkey = ps_suppkey
      |  AND p_size BETWEEN 10 AND 20 AND p_type = 'LARGE'
      |  AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
      |  AND r_name = 'EUROPE'
      |  AND ps_supplycost = (
      |    SELECT min(ps_supplycost)
      |    FROM partsupp, supplier, nation, region
      |    WHERE p_partkey = ps_partkey AND s_suppkey = ps_suppkey
      |      AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
      |      AND r_name = 'EUROPE')
      |ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
      |LIMIT 100""".stripMargin

  /** Q4 order-priority checking: correlated EXISTS semi-join with a
    * non-equality outer-reference predicate (l_shipdate > o_orderdate). */
  private val sqlQ4 =
    """SELECT o_orderpriority, count(*) AS order_count
      |FROM orders
      |WHERE o_orderdate >= TIMESTAMP '1996-07-01'
      |  AND o_orderdate < TIMESTAMP '1996-10-01'
      |  AND EXISTS (
      |    SELECT 1 FROM lineitem
      |    WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
      |GROUP BY o_orderpriority
      |ORDER BY o_orderpriority""".stripMargin

  /** Q7 volume shipping: the symmetric nation-pair disjunction through a
    * 6-table join with the nation dimension joined TWICE (n1 supplier-
    * side, n2 customer-side) — both broadcast at any scale. Two-nation
    * SETS rather than the original's single pair: one pair of 25²
    * nations is empty at the sf0.001 smoke fixture. */
  private val sqlQ7 =
    """SELECT supp_nation, cust_nation, l_year,
      | round(CAST(sum(volume) AS DOUBLE), 4) AS revenue
      |FROM (
      |  SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
      |    CAST(EXTRACT(YEAR FROM l_shipdate) AS BIGINT) AS l_year,
      |    CAST(l_extendedprice AS DECIMAL(18,4)) * (CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4))) AS volume
      |  FROM supplier, lineitem, orders, customer, nation n1, nation n2
      |  WHERE s_suppkey = l_suppkey AND o_orderkey = l_orderkey
      |    AND c_custkey = o_custkey
      |    AND s_nationkey = n1.n_nationkey AND c_nationkey = n2.n_nationkey
      |    AND ((n1.n_name IN ('NATION_1', 'NATION_2') AND n2.n_name IN ('NATION_3', 'NATION_4'))
      |      OR (n1.n_name IN ('NATION_3', 'NATION_4') AND n2.n_name IN ('NATION_1', 'NATION_2')))
      |    AND l_shipdate >= TIMESTAMP '1996-01-01'
      |    AND l_shipdate < TIMESTAMP '1998-01-01') shipping
      |GROUP BY supp_nation, cust_nation, l_year
      |ORDER BY supp_nation, cust_nation, l_year""".stripMargin

  /** Q8 national market share: conditional-over-total ratio via the
    * FILTER clause (NULL-safe with coalesce — years where the target
    * nation sold nothing report 0, not NULL). */
  private val sqlQ8 =
    """SELECT o_year,
      | round(CAST(coalesce(sum(volume) FILTER (WHERE nation = 'NATION_3'), 0) AS DOUBLE)
      |   / CAST(sum(volume) AS DOUBLE), 6) AS mkt_share,
      | count(*) AS n_items
      |FROM (
      |  SELECT CAST(EXTRACT(YEAR FROM o_orderdate) AS BIGINT) AS o_year,
      |    CAST(l_extendedprice AS DECIMAL(18,4)) * (CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4))) AS volume,
      |    n2.n_name AS nation
      |  FROM part, supplier, lineitem, orders, customer, nation n1, nation n2, region
      |  WHERE p_partkey = l_partkey AND s_suppkey = l_suppkey
      |    AND l_orderkey = o_orderkey AND o_custkey = c_custkey
      |    AND c_nationkey = n1.n_nationkey AND n1.n_regionkey = r_regionkey
      |    AND r_name = 'ASIA' AND s_nationkey = n2.n_nationkey
      |    AND o_orderdate >= TIMESTAMP '1996-01-01'
      |    AND o_orderdate < TIMESTAMP '1998-01-01'
      |    AND p_type = 'ECONOMY') all_nations
      |GROUP BY o_year
      |ORDER BY o_year""".stripMargin

  /** Q9 product-type profit: revenue minus supply cost through the
    * derived partsupp, by nation and order year. */
  private val sqlQ9 =
    """WITH partsupp AS (
      |  SELECT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey,
      |         min(l_extendedprice) AS ps_supplycost
      |  FROM lineitem GROUP BY 1, 2)
      |SELECT nation, o_year, round(CAST(sum(amount) AS DOUBLE), 4) AS sum_profit
      |FROM (
      |  SELECT n_name AS nation,
      |    CAST(EXTRACT(YEAR FROM o_orderdate) AS BIGINT) AS o_year,
      |    CAST(l_extendedprice AS DECIMAL(18,4)) * (CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4)))
      |      - CAST(ps_supplycost AS DECIMAL(18,4)) * CAST(l_quantity AS DECIMAL(18,4)) AS amount
      |  FROM part, supplier, lineitem, partsupp, orders, nation
      |  WHERE s_suppkey = l_suppkey AND ps_suppkey = l_suppkey
      |    AND ps_partkey = l_partkey AND p_partkey = l_partkey
      |    AND o_orderkey = l_orderkey AND s_nationkey = n_nationkey
      |    AND p_name LIKE '%bolt%') profit
      |GROUP BY nation, o_year
      |ORDER BY nation, o_year""".stripMargin

  /** Q11 important stock: per-part value with a HAVING gate against a
    * GLOBAL scalar-subquery threshold (sum × fraction) — the subquery
    * is uncorrelated, computed once, broadcast into the filter. */
  /** Q11's partsupp CTE is referenced TWICE (outer aggregate + the
    * HAVING clause's global-total scalar subquery). Spark inlines CTEs,
    * so the SQL text alone derives the lineitem-grain aggregate twice —
    * two full lineitem shuffles for one answer (DuckDB CSEs it; at
    * 100 TB the second derivation is a full extra pass over the fact
    * table). The registry entry therefore derives partsupp ONCE into a
    * persisted temp view and runs the body over it; the oracle keeps
    * the verbatim single-text CTE form. (r18, verdict item 2 — the
    * PlanShapeSpec pin: zero direct lineitem scans in the executed
    * plan, both references served from one InMemoryRelation.) */
  private val sqlQ11Partsupp =
    """SELECT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey,
      |       count(*) AS ps_availqty, min(l_extendedprice) AS ps_supplycost
      |FROM lineitem GROUP BY 1, 2""".stripMargin
  private val sqlQ11Body =
    """SELECT ps_partkey,
      | round(CAST(sum(CAST(ps_supplycost AS DECIMAL(18,4)) * ps_availqty) AS DOUBLE), 4) AS value
      |FROM partsupp, supplier, nation
      |WHERE ps_suppkey = s_suppkey AND s_nationkey = n_nationkey
      |  AND n_name IN ('NATION_1', 'NATION_2', 'NATION_3')
      |GROUP BY ps_partkey
      |HAVING sum(CAST(ps_supplycost AS DECIMAL(18,4)) * ps_availqty) > (
      |  SELECT sum(CAST(ps_supplycost AS DECIMAL(18,4)) * ps_availqty) * 0.0002
      |  FROM partsupp, supplier, nation
      |  WHERE ps_suppkey = s_suppkey AND s_nationkey = n_nationkey
      |    AND n_name IN ('NATION_1', 'NATION_2', 'NATION_3'))
      |ORDER BY value DESC, ps_partkey""".stripMargin
  private val sqlQ11 =
    s"WITH partsupp AS (\n$sqlQ11Partsupp)\n$sqlQ11Body"

  /** Q12 shipping-mode priority split: FILTER-clause conditional counts
    * (count FILTER yields BIGINT on both engines; the original's
    * sum-of-CASE yields HUGEINT on DuckDB). */
  private val sqlQ12 =
    """SELECT l_returnflag,
      | count(*) FILTER (WHERE o_orderpriority IN ('1-URGENT', '2-HIGH')) AS high_line_count,
      | count(*) FILTER (WHERE o_orderpriority NOT IN ('1-URGENT', '2-HIGH')) AS low_line_count
      |FROM orders JOIN lineitem ON o_orderkey = l_orderkey
      |WHERE l_returnflag IN ('A', 'R')
      |  AND l_shipdate > o_orderdate
      |  AND l_shipdate >= TIMESTAMP '1996-01-01'
      |  AND l_shipdate < TIMESTAMP '1997-01-01'
      |GROUP BY l_returnflag
      |ORDER BY l_returnflag""".stripMargin

  /** Q13 customer order-count distribution: LEFT OUTER join with an
    * extra non-key ON predicate, double aggregation. */
  private val sqlQ13 =
    """SELECT c_count, count(*) AS custdist
      |FROM (
      |  SELECT c_custkey, count(o_orderkey) AS c_count
      |  FROM customer LEFT OUTER JOIN orders
      |    ON c_custkey = o_custkey AND o_orderpriority <> '5-LOW'
      |  GROUP BY c_custkey) c_orders
      |GROUP BY c_count
      |ORDER BY custdist DESC, c_count DESC""".stripMargin

  /** Q15 top supplier: CTE referenced twice — once as the join input,
    * once under an uncorrelated MAX scalar subquery. The revenue is
    * rounded INSIDE the CTE so the equality join on the double is
    * against the exact same rounded value on both engines. */
  private val sqlQ15 =
    """WITH revenue AS (
      |  SELECT l_suppkey AS supplier_no,
      |    round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4)) * (CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4)))) AS DOUBLE), 4) AS total_revenue
      |  FROM lineitem
      |  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      |    AND l_shipdate < TIMESTAMP '1996-04-01'
      |  GROUP BY l_suppkey)
      |SELECT s_suppkey, s_name, total_revenue
      |FROM supplier, revenue
      |WHERE s_suppkey = supplier_no
      |  AND total_revenue = (SELECT max(total_revenue) FROM revenue)
      |ORDER BY s_suppkey""".stripMargin

  /** Q16 parts/supplier relationship: NOT IN anti-join against the
    * "complaint" supplier set (negative balance stands in for the
    * fixture-absent s_comment), then count(DISTINCT) per part class. */
  private val sqlQ16 =
    """WITH partsupp AS (
      |  SELECT DISTINCT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey
      |  FROM lineitem)
      |SELECT p_brand, p_type, p_size, count(DISTINCT ps_suppkey) AS supplier_cnt
      |FROM partsupp, part
      |WHERE p_partkey = ps_partkey
      |  AND p_brand <> 'Brand#1' AND p_type <> 'PROMO'
      |  AND p_size IN (1, 4, 7, 10, 13, 16, 19, 22)
      |  AND ps_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
      |GROUP BY p_brand, p_type, p_size
      |ORDER BY supplier_cnt DESC, p_brand, p_type, p_size""".stripMargin

  /** Q17 small-quantity-order revenue: the per-part correlated scalar
    * AVG subquery — the decorrelation benchmark shape (Catalyst turns
    * it into one grouped aggregate joined back; pinned in
    * PlanShapeSpec). The average is an exact decimal sum over a bigint
    * count, one IEEE divide on both engines. */
  private val sqlQ17 =
    """SELECT
      | round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) / 7.0, 4) AS avg_yearly,
      | count(*) AS n_items
      |FROM lineitem, part
      |WHERE p_partkey = l_partkey AND p_brand = 'Brand#23'
      |  AND l_quantity < (
      |    SELECT 0.2 * (CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) / count(*))
      |    FROM lineitem WHERE l_partkey = p_partkey)""".stripMargin

  /** Q19 discounted revenue: the three-branch disjunctive predicate over
    * the part⋈lineitem join — each disjunct mixes build-side (brand,
    * size) and probe-side (quantity, returnflag) columns, so only the
    * join key reaches the scan and the disjunction filters post-join. */
  private val sqlQ19 =
    """SELECT
      | round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4)) * (CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4)))) AS DOUBLE), 4) AS revenue,
      | count(*) AS n_items
      |FROM lineitem JOIN part ON p_partkey = l_partkey
      |WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5
      |        AND l_quantity BETWEEN 1 AND 11 AND l_returnflag = 'N')
      |   OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10
      |        AND l_quantity BETWEEN 10 AND 20 AND l_returnflag = 'N')
      |   OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 15
      |        AND l_quantity BETWEEN 20 AND 30 AND l_returnflag = 'R')""".stripMargin

  /** Q20 potential part promotion: nested IN subqueries with a correlated
    * scalar-aggregate threshold at the innermost level (half the named
    * year's shipped quantity vs the pair's line count) — the second
    * decorrelation shape PlanShapeSpec pins. */
  private val sqlQ20 =
    """WITH partsupp AS (
      |  SELECT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey,
      |         count(*) AS ps_availqty
      |  FROM lineitem GROUP BY 1, 2)
      |SELECT s_suppkey, s_name
      |FROM supplier, nation
      |WHERE s_suppkey IN (
      |  SELECT ps_suppkey FROM partsupp
      |  WHERE ps_partkey IN (SELECT p_partkey FROM part WHERE p_name LIKE '%bolt%')
      |    AND ps_availqty > (
      |      SELECT 0.5 * sum(l_quantity) FROM lineitem
      |      WHERE l_partkey = ps_partkey AND l_suppkey = ps_suppkey
      |        AND l_shipdate >= TIMESTAMP '1996-01-01'
      |        AND l_shipdate < TIMESTAMP '1997-01-01'))
      |  AND s_nationkey = n_nationkey
      |  AND n_name IN ('NATION_1', 'NATION_2', 'NATION_3', 'NATION_4', 'NATION_5')
      |ORDER BY s_suppkey""".stripMargin

  /** Q21 suppliers who kept orders waiting: the EXISTS + NOT-EXISTS
    * chain over the SAME fact table — l2 proves another supplier
    * touched the order (semi-join), l3 proves no OTHER supplier was
    * late on it (anti-join whose lateness predicate references the
    * OUTER o_orderdate — a multi-outer-attribute correlation). */
  private val sqlQ21 =
    """SELECT s_name, count(*) AS numwait
      |FROM supplier, lineitem l1, orders, nation
      |WHERE s_suppkey = l1.l_suppkey AND o_orderkey = l1.l_orderkey
      |  AND o_orderstatus = 'F' AND l1.l_shipdate > o_orderdate
      |  AND EXISTS (
      |    SELECT 1 FROM lineitem l2
      |    WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey)
      |  AND NOT EXISTS (
      |    SELECT 1 FROM lineitem l3
      |    WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
      |      AND l3.l_shipdate > o_orderdate)
      |  AND s_nationkey = n_nationkey
      |  AND n_name IN ('NATION_1', 'NATION_2', 'NATION_3', 'NATION_4', 'NATION_5')
      |GROUP BY s_name
      |ORDER BY numwait DESC, s_name
      |LIMIT 100""".stripMargin

  /** Q22 global sales opportunity: an uncorrelated scalar AVG threshold
    * plus a correlated NOT EXISTS anti-join against recent orders
    * (every fixture customer has SOME order, so "never ordered" becomes
    * "no orders since 1999" — same anti-join shape). */
  private val sqlQ22 =
    """SELECT cntrycode, count(*) AS numcust,
      | CAST(sum(CAST(c_acctbal AS DECIMAL(18,4))) AS DOUBLE) AS totacctbal
      |FROM (
      |  SELECT substring(c_name, 16, 1) AS cntrycode, c_acctbal, c_custkey
      |  FROM customer
      |  WHERE substring(c_name, 16, 1) IN ('1', '3', '5', '7', '9')
      |    AND c_acctbal > (
      |      SELECT CAST(sum(CAST(c_acctbal AS DECIMAL(18,4))) AS DOUBLE) / count(*)
      |      FROM customer
      |      WHERE c_acctbal > 0.0
      |        AND substring(c_name, 16, 1) IN ('1', '3', '5', '7', '9'))) custsale
      |WHERE NOT EXISTS (
      |  SELECT 1 FROM orders
      |  WHERE o_custkey = c_custkey AND o_orderdate >= TIMESTAMP '1999-01-01')
      |GROUP BY cntrycode
      |ORDER BY cntrycode""".stripMargin

  private val texts: Map[String, String] = Map(
    "q_sql_q2" -> sqlQ2, "q_sql_q4" -> sqlQ4, "q_sql_q7" -> sqlQ7,
    "q_sql_q8" -> sqlQ8, "q_sql_q9" -> sqlQ9, "q_sql_q11" -> sqlQ11,
    "q_sql_q12" -> sqlQ12, "q_sql_q13" -> sqlQ13, "q_sql_q15" -> sqlQ15,
    "q_sql_q16" -> sqlQ16, "q_sql_q17" -> sqlQ17, "q_sql_q19" -> sqlQ19,
    "q_sql_q20" -> sqlQ20, "q_sql_q21" -> sqlQ21, "q_sql_q22" -> sqlQ22,
  )

  val queries: Map[String, Q] =
    texts.map { case (name, sql) =>
      name -> ((s: SparkSession, dir: String) => { views(s, dir); s.sql(sql) })
    } + ("q_sql_q11" -> ((s: SparkSession, dir: String) => {
      // derive the doubly-referenced subtree ONCE, and at the SMALLEST
      // sufficient grain: the HAVING threshold is the global total of
      // the SAME grouped aggregate (sum of group sums == the join-wide
      // sum, exact in decimal), so what gets persisted is one small row
      // per part — not the lineitem-grain partsupp CTE. One lineitem
      // shuffle total; `cached` registers the persist for the harness's
      // query-boundary unpersist. Oracle text unchanged (sqlQ11).
      views(s, dir)
      // the supplier-nation filter SEMI-JOINS lineitem BEFORE the
      // (partkey, suppkey) aggregate — exact-preserving (dropping a
      // suppkey drops ALL its rows, so kept pairs keep their full
      // min/count) and the reduction Catalyst cannot derive itself
      // across an aggregation: the agg input shrinks to the wanted
      // nations' share of the fact table
      cached(s.sql(
        """SELECT ps_partkey,
          | sum(CAST(ps_supplycost AS DECIMAL(18,4)) * ps_availqty) AS raw_value
          |FROM (SELECT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey,
          |        count(*) AS ps_availqty, min(l_extendedprice) AS ps_supplycost
          |      FROM lineitem
          |      WHERE l_suppkey IN (
          |        SELECT s_suppkey FROM supplier JOIN nation
          |          ON s_nationkey = n_nationkey
          |        WHERE n_name IN ('NATION_1', 'NATION_2', 'NATION_3'))
          |      GROUP BY 1, 2) partsupp
          |GROUP BY ps_partkey""".stripMargin))
        .createOrReplaceTempView("q11_grouped")
      s.sql(
        """SELECT ps_partkey, round(CAST(raw_value AS DOUBLE), 4) AS value
          |FROM q11_grouped
          |WHERE raw_value > (SELECT sum(raw_value) * 0.0002 FROM q11_grouped)
          |ORDER BY value DESC, ps_partkey""".stripMargin)
    }))

  val oracleSql: Map[String, String] = texts
}
