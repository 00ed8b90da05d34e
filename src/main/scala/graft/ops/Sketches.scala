package graft.ops

import org.apache.spark.sql.functions._
import Util._

/** SURVEY.md §4 datasketches surface — the don't-reimplement path for
  * approximate analytics at 100 TB. All four queries are oracle-exempt by
  * the q_agg_hll precedent (sketch internals are engine-specific; DuckDB
  * cannot reproduce them bit-for-bit); SketchesSpec bounds each estimate
  * against its exact counterpart instead.
  *
  * Scale story: every sketch here is mergeable — partial sketches build
  * map-side per partition and merge associatively in one reduce, so the
  * shuffle carries kilobyte sketches instead of raw values. That is the
  * 1000-executor replacement for exact countDistinct (full shuffle of all
  * distinct keys) and exact percentile (full sort or collect of the group).
  */
object Sketches {

  /** Apache DataSketches HLL via Spark's native hll_sketch_agg: per-group
    * distinct estimate + a union across groups (hll_union_agg over the
    * per-group sketches — the re-aggregation story: group sketches are
    * reusable for any coarser rollup without touching raw data). The query
    * is sketch-only — the exact countDistinct it replaces lives in
    * SketchesSpec, so the bench measures the sketch path, not the thing
    * the sketch exists to avoid. */
  val qAggHllsketch: Q = (s, dir) => {
    import s.implicits._
    val perGroup = table(s, dir, "lineitem")
      .groupBy($"l_returnflag")
      .agg(expr("hll_sketch_agg(l_partkey, 14)").as("sk"))
      .transform(cached) // feeds both the per-group rows and the union rollup
    perGroup.select($"l_returnflag",
        expr("hll_sketch_estimate(sk)").cast("long").as("hll_parts"))
      .unionAll(
        perGroup.agg(expr("hll_sketch_estimate(hll_union_agg(sk))")
            .cast("long").as("hll_parts"))
          .select(lit("ALL").as("l_returnflag"), $"hll_parts"))
      .orderBy($"l_returnflag")
  }

  /** KLL quantile sketch (kll_sketch_agg_double): streaming/mergeable
    * median + p90 per order priority vs the exact percentile. Default k's
    * normalized rank error is ~1.65% — SketchesSpec asserts the estimate
    * lands inside the exact [q-5%, q+5%] rank window. */
  val qAggKll: Q = (s, dir) => {
    import s.implicits._
    table(s, dir, "orders")
      .select($"o_orderpriority", $"o_totalprice".cast("double").as("p"))
      .groupBy($"o_orderpriority")
      .agg(expr("kll_sketch_agg_double(p)").as("sk"))
      .select($"o_orderpriority",
        expr("kll_sketch_get_quantile_double(sk, 0.5)").as("kll50"),
        expr("kll_sketch_get_quantile_double(sk, 0.9)").as("kll90"))
      .orderBy($"o_orderpriority")
  }

  /** Theta sketch: distinct counting with SET ALGEBRA — estimate the
    * distinct suppliers seen in returned lineitems, non-returned ones, and
    * their intersection (theta_intersection_agg over per-flag sketches), a
    * query exact distinct cannot answer without re-scanning raw data. */
  val qAggTheta: Q = (s, dir) => {
    import s.implicits._
    val perFlag = table(s, dir, "lineitem")
      .withColumn("returned", ($"l_returnflag" === "R").cast("string"))
      .groupBy($"returned")
      .agg(expr("theta_sketch_agg(l_suppkey)").as("sk"))
      .transform(cached) // feeds both the per-flag rows and the intersection row
    perFlag.select($"returned",
        expr("theta_sketch_estimate(sk)").cast("long").as("theta_supps"))
      .unionAll(
        // coalesce(1): a partial theta-intersection over an EMPTY partition
        // cannot serialize (empty intersection = the infinite set); the
        // input is two rows, so single-partition aggregation is free
        perFlag.coalesce(1).agg(
            expr("theta_sketch_estimate(theta_intersection_agg(sk))")
              .cast("long").as("theta_supps"))
          .select(lit("BOTH").as("returned"), $"theta_supps"))
      .orderBy($"returned")
  }

  /** approx_top_k heavy hitters: top order priorities with estimated
    * counts. On a 5-value column the sketch tracks every item, so the
    * counts are exact — SketchesSpec asserts equality with the exact
    * groupBy. */
  val qAggTopk: Q = (s, dir) => {
    import s.implicits._
    table(s, dir, "orders")
      .agg(expr("approx_top_k(o_orderpriority, 5)").as("tk"))
      .select(explode($"tk").as("e"))
      .select($"e.item".as("priority"), $"e.count".as("n"))
      .orderBy($"n".desc, $"priority")
  }

  /** Count-min sketch heavy hitters, built from first principles with the
    * engine's own codegen'd pieces (Spark ships no CM aggregate): depth=4
    * seeded xxhash64 rows × width=512 buckets of token-occurrence counts
    * — a 2k-counter mergeable summary of a corpus-sized frequency table.
    * The sketch build is ONE groupBy over (row, bucket): map-side partial
    * agg shrinks every partition to ≤2048 counters, so the shuffle
    * carries kilobytes regardless of corpus size — the 100 TB frequency
    * story next to the HLL/KLL/theta mergeability. Estimates (min over
    * the 4 rows — the classic one-sided bound: est ≥ true, inflated only
    * by collisions) are read back for candidate words by joining the
    * BROADCAST sketch; top-20 by estimate. Deterministic (seeded hashes,
    * integer counts) but engine-specific (DuckDB has no xxhash64) →
    * oracle-exempt by the sketch-family precedent; SketchesSpec asserts
    * the one-sided bound on every word and exactness on the true
    * heavy hitters. */
  val qAggCountmin: Q = (s, dir) => {
    import s.implicits._
    val D = 4
    val W = 512
    val toks = table(s, dir, "documents")
      .select(explode(split($"text", " ")).as("w"))
      .filter(length($"w") > 0)
    val rowsOf = (w: org.apache.spark.sql.Column) =>
      array((0 until D).map(j => struct(lit(j).as("d"),
        pmod(xxhash64(w, lit(j)), lit(W)).as("b"))): _*)
    val sketch = toks
      .select(explode(rowsOf($"w")).as("e"))
      .groupBy($"e.d".as("d"), $"e.b".as("b"))
      .agg(count(lit(1)).as("c"))
    val est = toks.distinct()
      .select($"w", explode(rowsOf($"w")).as("e"))
      .select($"w", $"e.d".as("d"), $"e.b".as("b"))
      .join(broadcast(sketch), Seq("d", "b"))
      .groupBy($"w")
      .agg(min($"c").as("est"))
    est.orderBy($"est".desc, $"w").limit(20)
  }

  val queries: Map[String, Q] = Map(
    "q_agg_countmin" -> qAggCountmin,
    "q_agg_hllsketch" -> qAggHllsketch,
    "q_agg_kll" -> qAggKll,
    "q_agg_theta" -> qAggTheta,
    "q_agg_topk" -> qAggTopk,
  )

  // Intentionally empty: all four are sketch-based and oracle-exempt;
  // SketchesSpec is the correctness evidence (bounds vs exact values).
  val oracleSql: Map[String, String] = Map()
}
