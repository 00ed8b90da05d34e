package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import Util._

/** Data-layout operators: multi-dimensional clustering keys. */
object Layout {

  /** Z-order (Morton) key via the codegen'd graft.functions.MortonInterleave
    * expression. */
  private def morton(x: Column, y: Column): Column =
    org.apache.spark.sql.graft.GraftSql.column(
      graft.functions.MortonInterleave(
        org.apache.spark.sql.graft.GraftSql.expression(x),
        org.apache.spark.sql.graft.GraftSql.expression(y)))

  /** Z-order layout key over part(p_size, p_partkey mod 64): the space-
    * filling-curve trick behind multi-dimensional file clustering —
    * writing a table range-partitioned + sorted by morton(a, b) gives
    * every file a tight min/max envelope in BOTH columns, so footer
    * stats prune scans for predicates on either (a one-dimensional sort
    * only prunes its leading column). At 100 TB this decides whether
    * `p_size = 37` reads one file group or every file. The two curve
    * inputs are scaled to the SAME bit width (6 bits each) — interleaving
    * a 6-bit column with a 16-bit one puts only the wide column's bits
    * in the high positions and degenerates the curve back to a 1-d sort.
    * The query buckets the curve by its top 6 bits (= 3 high bits of
    * EACH dimension) and reports each bucket's envelope in both source
    * dimensions — exactly the per-file stats a z-ordered write would
    * produce; both envelopes spanning ≤ 2^3 IS the pruning evidence
    * (asserted in PlanShapeSpec), and the oracle replays the interleave
    * with explicit magic-mask arithmetic. The expression is pure per-row
    * compute inside whole-stage codegen; the only shuffle is the bucket
    * aggregation. */
  val qLayoutZorder: Q = (s, dir) => {
    import s.implicits._
    table(s, dir, "part")
      .select($"p_partkey", $"p_size",
        ($"p_partkey" % 64).cast("long").as("k64"),
        morton($"p_size".cast("long"),
          ($"p_partkey" % 64).cast("long")).as("zval"))
      .withColumn("bucket", shiftright($"zval", 6))
      .groupBy($"bucket")
      .agg(count(lit(1)).as("n_parts"),
        min($"zval").as("zmin"), max($"zval").as("zmax"),
        min($"p_size").as("size_min"), max($"p_size").as("size_max"),
        min($"k64").as("k64_min"), max($"k64").as("k64_max"))
      .orderBy($"bucket")
  }

  val queries: Map[String, Q] = Map(
    "q_layout_zorder" -> qLayoutZorder,
  )

  val oracleSql: Map[String, String] = Map(
    // spread(v) = five shift/mask steps (DuckDB reuses SELECT aliases, so
    // the steps chain in one projection); morton = spread(x) | spread(y)<<1
    "q_layout_zorder" ->
      """WITH b AS (SELECT p_partkey, p_size,
        |  CAST(p_size AS BIGINT) & 65535 AS x,
        |  CAST(p_partkey % 64 AS BIGINT) AS k64,
        |  CAST(p_partkey % 64 AS BIGINT) & 65535 AS y FROM part),
        |sp AS (SELECT p_partkey, p_size, k64,
        |  ((x | (x << 8)) & 16711935) AS xa,
        |  ((xa | (xa << 4)) & 252645135) AS xb,
        |  ((xb | (xb << 2)) & 858993459) AS xc,
        |  ((xc | (xc << 1)) & 1431655765) AS xd,
        |  ((y | (y << 8)) & 16711935) AS ya,
        |  ((ya | (ya << 4)) & 252645135) AS yb,
        |  ((yb | (yb << 2)) & 858993459) AS yc,
        |  ((yc | (yc << 1)) & 1431655765) AS yd
        | FROM b),
        |z AS (SELECT p_partkey, p_size, k64, (xd | (yd << 1)) AS zval FROM sp)
        |SELECT zval >> 6 AS bucket, count(*) AS n_parts,
        | min(zval) AS zmin, max(zval) AS zmax,
        | min(p_size) AS size_min, max(p_size) AS size_max,
        | min(k64) AS k64_min, max(k64) AS k64_max
        |FROM z GROUP BY bucket ORDER BY bucket""".stripMargin,
  )
}
