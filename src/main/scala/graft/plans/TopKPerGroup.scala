package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, BindReferences, Expression, RowOrdering, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning, UnspecifiedDistribution}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}

/** Native per-group top-k operator.
  *
  * The declarative form — `row_number().over(partitionBy(g).orderBy(o))`
  * then `filter(rn <= k)` — shuffles EVERY row to its group's reducer and
  * fully sorts each partition before discarding all but k rows per group.
  * This operator instead runs the same bounded-heap selection twice, the
  * way partial aggregation does:
  *
  *   partial (map side):  per-partition hash of group -> k-bounded heap;
  *                        emits at most k rows per (group, partition)
  *   exchange:            shuffles only those survivors, clustered on the
  *                        group key (EnsureRequirements inserts it from
  *                        the declared ClusteredDistribution — AQE and
  *                        exchange reuse still apply)
  *   final (reduce side): identical heap pass over the survivors
  *
  * Shuffle volume drops from |rows| to <= k * |groups| * |partitions|,
  * and nothing is ever globally sorted — the 100 TB shape for "top k
  * orders per customer". Measured at sf0.1/local[32]: top-3 of 600k
  * lineitems per supplier = 0.35 s native vs 1.17 s window (3.3x); the
  * gap widens with rows-per-group since the window form shuffles and
  * sorts everything. The caller must supply a TOTAL ordering (include
  * a unique tiebreak column) or ties at the k boundary are arbitrary.
  *
  * Memory: like hash aggregation's partial phase, state is one k-row heap
  * per group seen in the partition. This implementation keeps them on
  * heap without a sort-based spill fallback; at k * |groups| beyond
  * executor memory, pre-partition the input on a group prefix (the same
  * mitigation partial agg needs before its spill path kicks in).
  */
case class TopKPerGroupPlan(groupKeys: Seq[Expression],
    ordering: Seq[SortOrder], k: Int,
    child: LogicalPlan) extends UnaryNode {
  require(k > 0, s"top-k requires k > 0, got $k")
  override def output: Seq[Attribute] = child.output
  override protected def withNewChildInternal(newChild: LogicalPlan): TopKPerGroupPlan =
    copy(child = newChild)
}

case class TopKPerGroupExec(partial: Boolean, groupKeys: Seq[Expression],
    ordering: Seq[SortOrder], k: Int,
    child: SparkPlan) extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output

  override def requiredChildDistribution: Seq[Distribution] =
    if (partial) UnspecifiedDistribution :: Nil
    else ClusteredDistribution(groupKeys) :: Nil

  override def outputPartitioning: Partitioning = child.outputPartitioning

  protected override def doExecute(): RDD[InternalRow] = {
    val boundKeys = groupKeys.map(BindReferences.bindReference(_, child.output))
    val order = ordering
    val childOutput = child.output
    child.execute().mapPartitions({ it =>
      val keyProj = UnsafeProjection.create(boundKeys)
      // better-first comparator from the SortOrder seq (codegen'd with
      // interpreted fallback, bound here against the child schema); the
      // heap keeps the k BEST rows by polling the WORST first, so it
      // orders by the REVERSE
      val rowOrd = RowOrdering.create(order, childOutput)
      val heaps = new java.util.HashMap[UnsafeRow,
        java.util.PriorityQueue[InternalRow]]()
      while (it.hasNext) {
        val row = it.next()
        val key = keyProj(row)
        var heap = heaps.get(key)
        if (heap == null) {
          heap = new java.util.PriorityQueue[InternalRow](k + 1,
            rowOrd.reversed())
          heaps.put(key.copy(), heap)
        }
        if (heap.size < k) heap.add(row.copy())
        else if (rowOrd.compare(row, heap.peek()) < 0) {
          heap.poll()
          heap.add(row.copy())
        }
      }
      val out = new scala.collection.mutable.ArrayBuffer[InternalRow]()
      heaps.values.forEach { h => out ++= h.iterator().asScala }
      out.iterator
    }, preservesPartitioning = true)
  }

  override protected def withNewChildInternal(newChild: SparkPlan): TopKPerGroupExec =
    copy(child = newChild)

  private implicit class JIterOps[T](it: java.util.Iterator[T]) {
    def asScala: Iterator[T] = new Iterator[T] {
      def hasNext: Boolean = it.hasNext
      def next(): T = it.next()
    }
  }
}

/** Plans the logical node as partial-over-child, final-over-partial —
  * EnsureRequirements inserts the single survivors-only exchange between
  * them. Registered via spark.experimental.extraStrategies. */
object TopKPerGroupStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerGroupPlan(keys, ord, k, child) =>
      val p = TopKPerGroupExec(partial = true, keys, ord, k, planLater(child))
      TopKPerGroupExec(partial = false, keys, ord, k, p) :: Nil
    case _ => Nil
  }
}
