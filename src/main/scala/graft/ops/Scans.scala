package graft.ops

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import Util._

/** SURVEY.md §2.1 scans/sources + §2.2 projection/filter.
  *
  * Scale notes: all predicates/projections here are declarative so Catalyst
  * pushes them into the Parquet scan (PushedFilters / ReadSchema) — at 100 TB
  * row-group pruning + column projection is the difference between reading
  * terabytes and gigabytes. Plan-shape asserted in ScanSpec.
  */
object Scans {

  /** Full-table scan with count projection (scan throughput floor). */
  val qScanParquet: Q = (s, dir) =>
    table(s, dir, "lineitem").agg(count(lit(1)).as("n_rows"))

  /** Column-pruned + predicate-pushed scan: 3 read columns of 11. */
  val qScanPruned: Q = (s, dir) => {
    import s.implicits._
    table(s, dir, "lineitem")
      .filter($"l_shipdate" >= ts("1996-01-01 00:00:00") &&
              $"l_shipdate" <  ts("1997-01-01 00:00:00"))
      .select($"l_orderkey", $"l_linenumber", $"l_extendedprice")
      .orderBy($"l_orderkey", $"l_linenumber", $"l_extendedprice")
  }

  /** Schema'd ingestion of the JSON `events.props` string (GEE properties-
    * dict analog): declared StructType, never inferred. */
  val qScanJsonProps: Q = (s, dir) => {
    import s.implicits._
    val propsSchema = StructType(Seq(StructField("k", IntegerType)))
    events(s, dir)
      .select($"event_id",
        from_json($"props", propsSchema).getField("k").cast("long").as("k"))
      .orderBy($"event_id")
  }

  /** §2.2 projection with computed columns: pure double arithmetic is
    * bit-deterministic per-row, so no decimal cast needed (no reordering). */
  val qProjectCompute: Q = (s, dir) => {
    import s.implicits._
    table(s, dir, "lineitem")
      .select($"l_orderkey", $"l_linenumber",
        ($"l_extendedprice" * (lit(1.0) - $"l_discount")).as("revenue"),
        ($"l_extendedprice" * (lit(1.0) - $"l_discount") * (lit(1.0) + $"l_tax"))
          .as("charged"),
        ($"l_quantity" * lit(10.0)).as("qty10"))
      .orderBy($"l_orderkey", $"l_linenumber", $"revenue", $"charged", $"qty10")
  }

  /** §2.2 conjunctive/disjunctive predicates, BETWEEN, IN-list. */
  val qFilterConj: Q = (s, dir) => {
    import s.implicits._
    table(s, dir, "orders")
      .filter(($"o_orderstatus" === "F" && $"o_totalprice" > 150000.0) ||
        ($"o_orderpriority".isin("1-URGENT", "2-HIGH") &&
          $"o_totalprice".between(50000.0, 100000.0)))
      .select($"o_orderkey", $"o_orderstatus", $"o_orderpriority", $"o_totalprice")
      .orderBy($"o_orderkey")
  }

  /** §2.2 numeric-threshold filter — the GEE CLOUD_COVER analog. */
  val qFilterThreshold: Q = (s, dir) => {
    import s.implicits._
    table(s, dir, "lineitem")
      .filter($"l_discount" < 0.05)
      .select($"l_orderkey", $"l_linenumber", $"l_discount")
      .orderBy($"l_orderkey", $"l_linenumber", $"l_discount")
  }

  /** §2.2 string pattern predicates LIKE / RLIKE. */
  val qFilterLike: Q = (s, dir) => {
    import s.implicits._
    table(s, dir, "part")
      .filter($"p_name".like("%red%") || $"p_type".rlike("^(ECONOMY|SMALL)$"))
      .select($"p_partkey", $"p_name", $"p_type")
      .orderBy($"p_partkey")
  }

  val queries: Map[String, Q] = Map(
    "q_scan_parquet" -> qScanParquet,
    "q_scan_pruned" -> qScanPruned,
    "q_scan_json_props" -> qScanJsonProps,
    "q_project_compute" -> qProjectCompute,
    "q_filter_conj" -> qFilterConj,
    "q_filter_threshold" -> qFilterThreshold,
    "q_filter_like" -> qFilterLike,
  )

  val oracleSql: Map[String, String] = Map(
    "q_scan_parquet" -> "SELECT count(*) AS n_rows FROM lineitem",
    "q_scan_pruned" ->
      """SELECT l_orderkey, l_linenumber, l_extendedprice FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
        |ORDER BY l_orderkey, l_linenumber, l_extendedprice""".stripMargin,
    "q_scan_json_props" ->
      """SELECT event_id, CAST(json_extract(props, '$.k') AS BIGINT) AS k
        |FROM events ORDER BY event_id""".stripMargin,
    "q_project_compute" ->
      """SELECT l_orderkey, l_linenumber,
        | l_extendedprice * (1.0 - l_discount) AS revenue,
        | l_extendedprice * (1.0 - l_discount) * (1.0 + l_tax) AS charged,
        | l_quantity * 10.0 AS qty10
        |FROM lineitem ORDER BY l_orderkey, l_linenumber, revenue, charged, qty10""".stripMargin,
    "q_filter_conj" ->
      """SELECT o_orderkey, o_orderstatus, o_orderpriority, o_totalprice FROM orders
        |WHERE (o_orderstatus = 'F' AND o_totalprice > 150000.0)
        |   OR (o_orderpriority IN ('1-URGENT','2-HIGH') AND o_totalprice BETWEEN 50000.0 AND 100000.0)
        |ORDER BY o_orderkey""".stripMargin,
    "q_filter_threshold" ->
      """SELECT l_orderkey, l_linenumber, l_discount FROM lineitem
        |WHERE l_discount < 0.05 ORDER BY l_orderkey, l_linenumber, l_discount""".stripMargin,
    "q_filter_like" ->
      """SELECT p_partkey, p_name, p_type FROM part
        |WHERE p_name LIKE '%red%' OR regexp_matches(p_type, '^(ECONOMY|SMALL)$')
        |ORDER BY p_partkey""".stripMargin,
  )
}
