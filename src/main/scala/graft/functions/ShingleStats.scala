package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Codegen'd distinct-word-n-gram count over a text column — the native
  * replacement for the interpreted HOF chain
  * `size(array_distinct(transform(sequence(1, size(ws)-n+1), i ->
  * concat_ws(" ", slice(ws, i, n)))))` that was q_udtf's whole cost: every
  * HOF in that chain is CodegenFallback, so each shingle paid an
  * interpreted expression-tree walk plus a materialized string, and
  * array_distinct re-hashed the materialized array afterwards.
  *
  * Semantics match the HOF form exactly (oracle unchanged):
  * words = split(text, " ", -1) — single-space separator, empty words and
  * the trailing empty word kept, exactly Spark's `split` with the
  * single-space pattern. A shingle is words[i..i+n-1] joined with " ",
  * which — because the separator is the same single space the text was
  * split on — is precisely the byte slice of the ORIGINAL text from the
  * start of word i to the end of word i+n-1. Distinctness of joined
  * strings therefore equals distinctness of those slices, and the
  * expression never materializes a shingle: it collects zero-copy
  * UTF8String views over the input row's bytes into a hash set.
  * (0x20 cannot occur inside a multi-byte UTF-8 sequence, so the byte
  * scan finds exactly the word boundaries `split` finds.)
  *
  * Returns the distinct count as LONG; fewer than n words → 0 (the HOF
  * form yields an empty array there). NULL input → NULL.
  */
case class ShingleDistinctCount(child: Expression, n: Int)
    extends UnaryExpression {
  require(n >= 1, s"shingle width must be >= 1, got $n")

  override def dataType: DataType = LongType
  override def prettyName: String = "shingle_distinct_count"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string input, got ${other.catalogString}")
  }

  override protected def nullSafeEval(t: Any): Any =
    ShingleDistinctCount.count(t.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.ShingleDistinctCount.count($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object ShingleDistinctCount {
  /** Single pass: find space positions, then insert one zero-copy
    * UTF8String view per shingle window into a hash set. O(bytes) time,
    * O(words) extra space. Called from generated code — keep it static
    * and allocation-light. */
  def count(s: UTF8String, n: Int): Long = {
    val base = s.getBaseObject
    val off = s.getBaseOffset
    val len = s.numBytes()
    // word start offsets (byte index just after each space, plus 0)
    var starts = new Array[Int](16)
    starts(0) = 0
    var nWords = 1
    var i = 0
    while (i < len) {
      if (org.apache.spark.unsafe.Platform.getByte(base, off + i) == 0x20) {
        if (nWords == starts.length) {
          starts = java.util.Arrays.copyOf(starts, nWords * 2)
        }
        starts(nWords) = i + 1
        nWords += 1
      }
      i += 1
    }
    if (nWords < n) return 0L
    val set = new java.util.HashSet[UTF8String](math.max(16, (nWords - n + 1) * 2))
    var w = 0
    while (w <= nWords - n) {
      val start = starts(w)
      // end of word w+n-1: one byte before the next word's start, or len
      val end = if (w + n < nWords) starts(w + n) - 1 else len
      set.add(UTF8String.fromAddress(base, off + start, end - start))
      w += 1
    }
    set.size.toLong
  }
}
