package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, BindReferences, Expression, GenericInternalRow, JoinedRow, RowOrdering, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.util.TypeUtils
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}

/** Native as-of join (SURVEY §4 stretch / §2.3 q_join_asof v2).
  *
  * Semantics: for every left row, attach the right row of the same key with
  * the greatest `rightTs <= leftTs` (left outer: nulls when none). The
  * window-rewrite v1 (graft.ops.Extensions.qJoinAsof) needs a union +
  * full-partition sort of both sides together; this operator instead
  * shuffles each side once on its key, sorts within partitions by
  * (key, ts) — both requirements declared to EnsureRequirements, so AQE
  * and exchange reuse still apply — and streams a two-pointer merge per
  * partition: O(n log n) in the shuffle sort, O(n) merge, no state beyond
  * one candidate row. That is the 100 TB shape: no cross product, no
  * per-key buffering of the probe side.
  */
case class AsOfJoinPlan(left: LogicalPlan, right: LogicalPlan,
    leftKey: Expression, rightKey: Expression,
    leftTs: Expression, rightTs: Expression) extends BinaryNode {
  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  /** Planning-time type check (run by AsOfJoinStrategy, i.e. post-
    * analysis): both key and ts pairs must agree in type and be orderable.
    * Fails with a clear message instead of a runtime ClassCastException
    * mid-task. */
  def checkTypes(): Unit = {
    def check(what: String, l: Expression, r: Expression): Unit = {
      if (l.dataType != r.dataType) throw new UnsupportedOperationException(
        s"as-of join $what types differ: ${l.dataType.catalogString} vs " +
          s"${r.dataType.catalogString}")
      if (!RowOrdering.isOrderable(l.dataType))
        throw new UnsupportedOperationException(
          s"as-of join $what type ${l.dataType.catalogString} is not orderable")
    }
    check("key", leftKey, rightKey)
    check("timestamp", leftTs, rightTs)
  }

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinPlan =
    copy(left = newLeft, right = newRight)
}

case class AsOfJoinExec(left: SparkPlan, right: SparkPlan,
    leftKey: Expression, rightKey: Expression,
    leftTs: Expression, rightTs: Expression) extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  // Both sides clustered on the join key (EnsureRequirements co-partitions
  // them, exactly as for SortMergeJoinExec) ...
  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftKey :: Nil) :: ClusteredDistribution(rightKey :: Nil) :: Nil

  // ... and sorted within partitions by (key, ts) so the merge is linear.
  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTs, Ascending)),
    Seq(SortOrder(rightKey, Ascending), SortOrder(rightTs, Ascending)))

  override def outputPartitioning: Partitioning = left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] = left.outputOrdering

  protected override def doExecute(): RDD[InternalRow] = {
    val lKey = BindReferences.bindReference(leftKey, left.output)
    val lTs = BindReferences.bindReference(leftTs, left.output)
    val rKey = BindReferences.bindReference(rightKey, right.output)
    val rTs = BindReferences.bindReference(rightTs, right.output)
    // type-dispatched comparators (not asInstanceOf[Long]): any orderable
    // key/ts type works — string keys included — and an unsupported type
    // fails planning in AsOfJoinPlan.checkTypes, not mid-task
    val keyOrd = TypeUtils.getInterpretedOrdering(leftKey.dataType)
    val tsOrd = TypeUtils.getInterpretedOrdering(leftTs.dataType)
    val rightWidth = right.output.size
    val outAttrs = output
    // bind the projection against nullability-WIDENED right attributes
    // (== output): binding the original non-nullable attrs would skip the
    // null check and read garbage from the null-extension row
    val inAttrs = outAttrs

    left.execute().zipPartitions(right.execute()) { (lit, rit) =>
      val proj = UnsafeProjection.create(outAttrs, inAttrs)
      val joined = new JoinedRow
      val nullRight = new GenericInternalRow(rightWidth)
      val rBuf = rit.buffered
      var candidate: InternalRow = null
      var candidateKey: Any = null
      lit.map { lrow =>
        val lk = lKey.eval(lrow)
        val lt = lTs.eval(lrow)
        // SQL comparison semantics: a null key or ts matches nothing
        if (lk == null || lt == null) proj(joined(lrow, nullRight))
        else {
          var advance = true
          while (advance && rBuf.hasNext) {
            val head = rBuf.head
            val hk = rKey.eval(head)
            val ht = rTs.eval(head)
            if (hk == null || ht == null) { rBuf.next(); () } // unmatchable
            else {
              val c = keyOrd.compare(hk, lk)
              if (c < 0 || (c == 0 && tsOrd.compare(ht, lt) <= 0)) {
                // rows from the shuffle iterator are reused — copy to
                // retain; re-eval the key off the COPIED row so a pointer
                // type (UTF8String) doesn't alias the recycled buffer
                candidate = rBuf.next().copy()
                candidateKey = rKey.eval(candidate)
              } else advance = false
            }
          }
          if (candidate != null && keyOrd.compare(candidateKey, lk) == 0)
            proj(joined(lrow, candidate))
          else proj(joined(lrow, nullRight))
        }
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)
}

/** Planner strategy mapping the logical node to the exec; registered via
  * spark.experimental.extraStrategies (public extension hook). */
object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case p @ AsOfJoinPlan(l, r, lk, rk, lt, rt) =>
      p.checkTypes()
      AsOfJoinExec(planLater(l), planLater(r), lk, rk, lt, rt) :: Nil
    case _ => Nil
  }
}
