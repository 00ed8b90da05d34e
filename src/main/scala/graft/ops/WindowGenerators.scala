package graft.ops

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, Generator, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Generator emitting every n-word window of a text column as ONE
  * string (words joined with " ") — the round-19 replacement for the BPE
  * family's interpreted symbol-pair chain
  * `explode(transform(sequence(1, size(syms)-1), i ->
  * concat(element_at(syms,i), " ", element_at(syms,i+1))))`.
  * Word semantics are exactly `split(text, " ")` (single-space separator,
  * empty + trailing words kept); because the joiner is the same single
  * space, each window is precisely the byte slice of the original text
  * from the start of word i to the end of word i+n-1 — identical strings,
  * zero per-window string building (slices are cloned on emission since
  * generator rows escape the per-input-row scope). < n words emit no row,
  * matching the old empty-array explode. Parity pinned in PropertySpec. */
case class WordWindowGenerator(child: Expression, n: Int)
    extends UnaryExpression with Generator with CodegenFallback {
  require(n >= 2, s"window width must be >= 2, got $n")

  override def elementSchema: StructType =
    StructType(Seq(StructField("window", StringType)))

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val v = child.eval(input)
    if (v == null) Nil
    else {
      val s = v.asInstanceOf[UTF8String]
      val base = s.getBaseObject
      val off = s.getBaseOffset
      val len = s.numBytes()
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
      if (nWords < n) Nil
      else {
        val out = new Array[InternalRow](nWords - n + 1)
        var k = 0
        while (k <= nWords - n) {
          val a = starts(k)
          val b = if (k + n < nWords) starts(k + n) - 1 else len
          out(k) = InternalRow(
            UTF8String.fromAddress(base, off + a, b - a).clone())
          k += 1
        }
        scala.collection.immutable.ArraySeq.unsafeWrapArray(out)
      }
    }
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Native Generator emitting every n-CHARACTER substring of a string —
  * the round-19 replacement for the interpreted
  * `explode(transform(sequence(1, length(w)-n+1), i -> substr(w, i, n)))`
  * char-gram chains (BPE pair counting, character-gram containment).
  * Exactly Spark `substr` semantics: positions count CODE POINTS and all
  * emitted grams have exactly n chars. For strings SHORTER than n the two
  * call-site conventions differ, so the behavior is a parameter:
  * `keepShort = false` emits no row (call sites that filter length >= n
  * first, e.g. BPE pair counting); `keepShort = true` emits the whole
  * (short) string once — the `sequence(1, greatest(length-n+1, 1))`
  * convention of the containment gram build, where every doc must
  * contribute at least one gram. */
case class CharGramGenerator(child: Expression, n: Int, keepShort: Boolean)
    extends UnaryExpression with Generator with CodegenFallback {
  require(n >= 1, s"gram width must be >= 1, got $n")

  override def elementSchema: StructType =
    StructType(Seq(StructField("gram", StringType)))

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val v = child.eval(input)
    if (v == null) Nil
    else {
      val s = v.asInstanceOf[UTF8String]
      val m = s.numChars()
      if (m < n) {
        if (keepShort) InternalRow(s.substringSQL(1, n)) :: Nil else Nil
      } else (1 to m - n + 1).map(i => InternalRow(s.substringSQL(i, n)))
    }
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
