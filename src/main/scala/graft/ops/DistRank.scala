package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Two-phase DISTRIBUTED row numbering within low-cardinality groups —
  * the scale-safe replacement for `row_number().over(Window.partitionBy
  * (lowCardKey).orderBy(...))`.
  *
  * A window partitioned by a ~5-value key executes as ONE task per key
  * value, so at 100 TB each key funnels a full segment of the corpus
  * through a single reducer's sort — the classic low-cardinality-window
  * funnel (the round-6 scale audit's one perf-weak finding). The
  * two-phase kernel bounds every task by a RANGE SLICE instead:
  *
  *   1. Slice boundaries: P−1 approximate percentiles of a caller-
  *      supplied ORDER-CORRELATED numeric `sliceKey` (ascending with the
  *      window order), aggregated into a ONE-ROW table. The row is
  *      cached — a one-row cache — because the two consumers below must
  *      see the SAME boundaries (the sketch's merge order is not
  *      deterministic); precision is irrelevant, only consistency:
  *      ranks are invariant to where the boundaries land, boundaries
  *      only balance the slices.
  *   2. Each row's slice id `_rp` = how many boundaries sort strictly
  *      below its sliceKey — a codegen'd array-filter over the broadcast
  *      boundary row, pure map-side compute, NO physical range exchange.
  *      Slices are order-contiguous within every group: order(a) <
  *      order(b) implies slice(a) <= slice(b), and order-ties share a
  *      slice because the key is a function of the row's order prefix.
  *   3. Local rank: `row_number()` over (`_rp`, group) — the window key
  *      now has up to P×K values and each window partition is one
  *      slice of one group, so no task sorts more than ~1/P of the data
  *      regardless of K. This hash exchange is the plan's ONLY corpus
  *      shuffle — the same count as the naive single-window plan.
  *   4. Per-(slice, group) row counts aggregate map-side to a TINY table
  *      (≤ P×K rows); a prefix-exclusive sum over it (partitioned by
  *      group, ordered by slice — low-cardinality but over P×K rows,
  *      not the corpus) yields each slice's global OFFSET, broadcast-
  *      joined back. Global row number = offset + local rank. Exact,
  *      not approximate: integer arithmetic end-to-end, bit-identical
  *      to the single-window form whenever the ordering is total (the
  *      plain window form stays as the DuckDB oracle — same precedent
  *      as q_join_salted, whose oracle is the unsalted join).
  *
  * Cost vs the naive window: one extra column-pruned scan for the
  * boundary sketch, one for the count table, and one broadcast of a
  * ≤ P×K-row table — all constants; the corpus still shuffles exactly
  * once. At 1000 executors this is the difference between a running job
  * and five stragglers each sorting 20 TB. P follows
  * spark.sql.shuffle.partitions, so the kernel scales with the
  * session's cluster sizing.
  *
  * SELECTION IS COST-BASED, like Spark's own broadcast-vs-shuffle join
  * choice: the two extra job barriers are pure constants (~1.4 s at
  * local[32] regardless of data size — measured), so below
  * `spark.graft.distrank.threshold.bytes` (default 1 GiB of estimated
  * input) [[rowNumberInGroup]] emits the plain single-window plan — a
  * sub-gigabyte segment sorting in one task is not a funnel, it is the
  * cheapest correct plan. At or above the threshold the two-phase
  * kernel engages automatically. Both paths produce bit-identical
  * output (parity asserted in DistRankParitySpec; the always-kernel
  * registry entry q_win_rank_dist is oracle-checked by the driver), so
  * the switch is invisible to callers.
  *
  * Caveats (documented contract, all shared with physical range
  * partitioning): `sliceKey` must be non-null and ascending-consistent
  * with `order`'s leading term (negate a numeric for DESC); a heavily
  * tied sliceKey degrades toward one slice per tie value — pick a finer
  * key (same failure mode as RangePartitioner on a constant key).
  *
  * Derived ranks under a TOTAL (duplicate-free) ordering — the only kind
  * this library emits (every window carries a unique tie-break key, see
  * Windows.scala header): rank() and dense_rank() both equal
  * row_number() (no peer groups exist), percent_rank = (rn−1)/(n−1) and
  * cume_dist = rn/n with n the group size (`countOut`). Callers lean on
  * these identities instead of a second kernel.
  */
object DistRank {

  /** Estimated-input-size threshold (bytes) at which [[rowNumberInGroup]]
    * switches from the plain single-window plan to the two-phase kernel.
    * Read per call, so a spec (or an operator on a known-huge input) can
    * lower it; never WRITTEN by any query body. */
  val ThresholdConf = "spark.graft.distrank.threshold.bytes"
  private val DefaultThreshold: Long = 1L << 30

  /** `df` + column `out` = 1-based row number within `group` under
    * `order` (LongType). With `countOut = Some(n)`, also attaches the
    * total group row count as column `n` (LongType).
    *
    * Cost-based: uses Catalyst's `optimizedPlan.stats.sizeInBytes`
    * estimate of `df` (planning-time only, no job) against
    * [[ThresholdConf]] — plain window below, [[twoPhase]] kernel at or
    * above. Output columns and values are identical either way.
    *
    * `order` must be total within each group (unique tie-break key) for
    * cross-engine determinism — same contract as every window in this
    * library. `sliceKey` is only consulted on the two-phase path.
    */
  /** The cost gate used by [[rowNumberInGroup]], exposed for operators
    * whose whole STRUCTURE changes with it (e.g. q_win_firstlast trades
    * a full-frame window for agg + broadcast-join only at scale).
    * Planning-time only — no job runs. */
  def isBig(df: DataFrame): Boolean = {
    val s = df.sparkSession
    val threshold = s.conf.get(ThresholdConf, DefaultThreshold.toString).toLong
    df.queryExecution.optimizedPlan.stats.sizeInBytes >= threshold
  }

  def rowNumberInGroup(
      df: DataFrame,
      group: Seq[String],
      order: Seq[Column],
      sliceKey: Column,
      out: String,
      countOut: Option[String] = None): DataFrame = {
    if (isBig(df)) twoPhase(df, group, order, sliceKey, out, countOut)
    else {
      val g = group.map(col)
      val w = Window.partitionBy(g: _*).orderBy(order: _*)
      val rn = df.withColumn(out, row_number().over(w).cast("long"))
      countOut.fold(rn)(n =>
        rn.withColumn(n, count(lit(1)).over(Window.partitionBy(g: _*))))
    }
  }

  /** The two-phase kernel itself (always engaged — q_win_rank_dist runs
    * this form through the driver's DuckDB oracle at every scale).
    * Internal column names `_rp`/`_bnd`/`_cnt`/`_off` must not collide
    * with `df`'s schema. */
  def twoPhase(
      df: DataFrame,
      group: Seq[String],
      order: Seq[Column],
      sliceKey: Column,
      out: String,
      countOut: Option[String] = None): DataFrame = {
    val s = df.sparkSession
    val g = group.map(col)
    val p = s.sessionState.conf.numShufflePartitions
    // one-row boundary table: P-1 approximate percentiles of the slice
    // key; cached so both consumers slice under identical boundaries
    val bnd = Util.cached(df.agg(percentile_approx(
      sliceKey,
      array((1 until p).map(i => lit(i.toDouble / p)): _*),
      lit(1000)).as("_bnd")))
    // slice id = #boundaries strictly below this row's key (codegen'd
    // HOF over the broadcast one-row array — no physical range exchange)
    val sliced = df.crossJoin(broadcast(bnd))
      .withColumn("_rp", size(filter(col("_bnd"), b => b < sliceKey)))
      .drop("_bnd")
    val counts = sliced.groupBy((col("_rp") +: g): _*)
      .agg(count(lit(1)).as("_cnt"))
    // prefix-exclusive sum of slice sizes = each slice's global offset;
    // these windows run over the ≤ P×K-row count table, not the corpus
    val offW = Window.partitionBy(g: _*).orderBy(col("_rp"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val totW = Window.partitionBy(g: _*)
    val offsets = counts.select(
      (col("_rp") +: g) ++
        Seq(coalesce(sum(col("_cnt")).over(offW), lit(0L)).as("_off")) ++
        countOut.map(n => sum(col("_cnt")).over(totW).as(n)).toSeq: _*)
    val localW = Window.partitionBy((col("_rp") +: g): _*).orderBy(order: _*)
    sliced
      .join(broadcast(offsets), "_rp" +: group)
      .withColumn(out, row_number().over(localW).cast("long") + col("_off"))
      // normalize column order to match the plain-window path exactly:
      // df's columns, then out, then countOut
      .select(df.columns.map(col) ++ (col(out) +: countOut.map(col).toSeq): _*)
  }
}
