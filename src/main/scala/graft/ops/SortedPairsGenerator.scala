package graft.ops

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, Generator, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** Native Generator emitting every value-ordered pair (u, v), u < v, of a
  * bigint array — the round-19 replacement for the co-order edge build
  * `li.as("a").join(li.as("b"), a.key === b.key && a.part < b.part)`
  * shared by pagerank / BFS / SSSP / triangles. The self-join scanned the
  * filtered lineitem twice and exchanged it twice (both join legs hash on
  * the order key); the generator form reaches ONE exchange
  * (groupBy(order) collect_list) and emits the identical pair MULTISET:
  * for part values x < y with in-order multiplicities c_x and c_y, the
  * join emits c_x·c_y (x, y) rows, and so does enumerating i < j over the
  * sorted list while skipping equal values — SSSP's multiplicity weights
  * and the others' distinct() both come out unchanged (pinned in
  * PropertySpec). Per-order arrays are lineitems-per-order-sized
  * (bounded, ~7), so per-row state is trivially capped at any scale. */
case class SortedPairsGenerator(child: Expression)
    extends UnaryExpression with Generator with CodegenFallback {

  override def elementSchema: StructType =
    StructType(Seq(StructField("u", LongType), StructField("v", LongType)))

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val v = child.eval(input)
    if (v == null) Nil
    else {
      val arr = v.asInstanceOf[ArrayData].toLongArray()
      if (arr.length < 2) Nil
      else {
        java.util.Arrays.sort(arr)
        val out = scala.collection.mutable.ArrayBuffer.empty[InternalRow]
        var i = 0
        while (i < arr.length - 1) {
          var j = i + 1
          while (j < arr.length) {
            if (arr(i) != arr(j)) out += InternalRow(arr(i), arr(j))
            j += 1
          }
          i += 1
        }
        out
      }
    }
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
