package graft.ops

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, Generator, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Generator emitting one (w1, w2) row per adjacent word pair of a
  * text column — the round-19 replacement for the interpreted HOF chain
  * `explode(transform(sequence(1, size(ws)-1), i -> struct(element_at(ws,i),
  * element_at(ws,i+1))))` that fronted every bigram query (bigram LM,
  * perplexity gate, collocations). Each element of that chain walked the
  * interpreted-expression path (ArrayTransform and friends are
  * CodegenFallback) and materialized the full word array first; this
  * generator scans the text bytes once and emits word slices directly,
  * planned through GenerateExec exactly like the built-in explode.
  *
  * Word semantics are EXACTLY Spark's `split(text, " ")` (single-space
  * separator, empty words kept, trailing empty word kept — limit -1), so
  * results are bit-identical to the HOF form and the DuckDB oracles are
  * unchanged (pinned in PropertySpec). NULL text or < 2 words emit no row,
  * matching the old `filter(size(ws) >= 2)` + empty-sequence behavior.
  * Emitted strings are copies (clone), not views: generator output rows
  * escape the per-input-row scope. */
case class WordPairGenerator(child: Expression)
    extends UnaryExpression with Generator with CodegenFallback {

  override def elementSchema: StructType =
    StructType(Seq(StructField("w1", StringType), StructField("w2", StringType)))

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val v = child.eval(input)
    if (v == null) Nil
    else {
      val s = v.asInstanceOf[UTF8String]
      val base = s.getBaseObject
      val off = s.getBaseOffset
      val len = s.numBytes()
      // word start offsets: 0 plus every byte just after a 0x20 (space
      // cannot occur inside a multi-byte UTF-8 sequence)
      var starts = new Array[Int](16)
      starts(0) = 0
      var nWords = 1
      var i = 0
      while (i < len) {
        if (org.apache.spark.unsafe.Platform.getByte(base, off + i) == 0x20) {
          if (nWords == starts.length)
            starts = java.util.Arrays.copyOf(starts, nWords * 2)
          starts(nWords) = i + 1
          nWords += 1
        }
        i += 1
      }
      if (nWords < 2) Nil
      else {
        def word(k: Int): UTF8String = {
          val start = starts(k)
          val end = if (k + 1 < nWords) starts(k + 1) - 1 else len
          UTF8String.fromAddress(base, off + start, end - start).clone()
        }
        val out = new Array[InternalRow](nWords - 1)
        var w2 = word(0)
        var k = 0
        while (k < nWords - 1) {
          val w1 = w2
          w2 = word(k + 1)
          out(k) = InternalRow(w1, w2)
          k += 1
        }
        scala.collection.immutable.ArraySeq.unsafeWrapArray(out)
      }
    }
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
