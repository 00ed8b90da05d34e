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

/** Codegen'd distinct word-n-gram shingle ARRAY — the native replacement
  * for `array_distinct(shingles(toks(text)))` in the exact-verify stages
  * of the dedup family (near-dup Jaccard, containment): the HOF chain ran
  * interpreted per shingle and materialized every duplicate before
  * array_distinct re-hashed the array. One pass over the text bytes,
  * first-occurrence order (exactly array_distinct's), elements are the
  * byte slices of the original text (identical strings to the
  * concat_ws(" ", slice(ws,i,n)) form — see ShingleDistinctCount).
  * NULL text and < n words both yield the EMPTY array, exactly like the
  * old `when(size(ws) >= 3, ...).otherwise(array())` + array_distinct
  * composition (size(null) = -1 there). Parity pinned in PropertySpec. */
case class DistinctShinglesArray(child: Expression, n: Int)
    extends UnaryExpression {
  require(n >= 1, s"shingle width must be >= 1, got $n")

  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(StringType, containsNull = false)
  override def prettyName: String = "distinct_shingles"
  override def nullable: Boolean = false

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string input, got ${other.catalogString}")
  }

  override def eval(
      input: org.apache.spark.sql.catalyst.InternalRow): Any =
    DistinctShinglesArray.compute(
      child.eval(input).asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    import org.apache.spark.sql.catalyst.expressions.codegen.FalseLiteral
    val c = child.genCode(ctx)
    val childVal = if (child.nullable) s"(${c.isNull} ? null : ${c.value})"
      else c.value.toString
    val call =
      s"graft.functions.DistinctShinglesArray.compute($childVal, $n);"
    ev.copy(
      code = c.code +
        code"""
           |org.apache.spark.sql.catalyst.util.ArrayData ${ev.value} = $call
           |""".stripMargin,
      isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** DISTINCT character n-grams of a document as ONE array, first-occurrence
  * order — the char-gram sibling of [[DistinctShinglesArray]] (round 20):
  * byte-identical gram strings to CharGramGenerator(n, keepShort) followed
  * by a per-doc distinct (grams are the char-boundary byte slices
  * substringSQL produces; a doc shorter than n chars contributes its whole
  * text as one gram when keepShort, nothing otherwise; NULL text yields
  * the EMPTY array — the generator emitted no row, and the one consumer
  * guards the resulting 0/0). Lets q_dedup_ngram intersect per-row gram
  * SETS (array_intersect) instead of exploding, distinct-shuffling and
  * re-joining the gram table — the nearDupPairs verify discipline.
  * Parity pinned in PropertySpec. */
case class DistinctCharGramsArray(child: Expression, n: Int, keepShort: Boolean)
    extends UnaryExpression {
  require(n >= 1, s"gram width must be >= 1, got $n")

  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(StringType, containsNull = false)
  override def prettyName: String = "distinct_chargrams"
  override def nullable: Boolean = false

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string input, got ${other.catalogString}")
  }

  override def eval(
      input: org.apache.spark.sql.catalyst.InternalRow): Any =
    DistinctCharGramsArray.compute(
      child.eval(input).asInstanceOf[UTF8String], n, keepShort)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    import org.apache.spark.sql.catalyst.expressions.codegen.FalseLiteral
    val c = child.genCode(ctx)
    val childVal = if (child.nullable) s"(${c.isNull} ? null : ${c.value})"
      else c.value.toString
    val call =
      s"graft.functions.DistinctCharGramsArray.compute($childVal, $n, $keepShort);"
    ev.copy(
      code = c.code +
        code"""
           |org.apache.spark.sql.catalyst.util.ArrayData ${ev.value} = $call
           |""".stripMargin,
      isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object DistinctCharGramsArray {
  import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}

  private val empty = new GenericArrayData(Array.empty[Any])

  /** Called from generated code; null-tolerant (null → empty array). */
  def compute(s: UTF8String, n: Int, keepShort: Boolean): ArrayData = {
    if (s == null) return empty
    val base = s.getBaseObject
    val off = s.getBaseOffset
    val len = s.numBytes()
    // char-start byte offsets (UTF8 boundaries), offs(m) = len
    var offs = new Array[Int](math.max(16, len + 1))
    var m = 0
    var i = 0
    while (i < len) {
      offs(m) = i
      m += 1
      i += UTF8String.numBytesForFirstByte(
        org.apache.spark.unsafe.Platform.getByte(base, off + i))
    }
    if (offs.length <= m) offs = java.util.Arrays.copyOf(offs, m + 1)
    offs(m) = len
    if (m < n) {
      // substringSQL(1, n) of a shorter-than-n string is the whole string
      return if (keepShort) new GenericArrayData(Array[Any](s.clone()))
        else empty
    }
    val seen = new java.util.LinkedHashSet[UTF8String](
      math.max(16, (m - n + 1) * 2))
    var g = 0
    while (g <= m - n) {
      val a = offs(g)
      val b = offs(g + n)
      val view = UTF8String.fromAddress(base, off + a, b - a)
      if (!seen.contains(view)) seen.add(view.clone())
      g += 1
    }
    new GenericArrayData(seen.toArray.asInstanceOf[Array[Any]])
  }
}

object DistinctShinglesArray {
  import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}

  private val empty = new GenericArrayData(Array.empty[Any])

  /** Called from generated code; null-tolerant (null → empty array). */
  def compute(s: UTF8String, n: Int): ArrayData = {
    if (s == null) return empty
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
    if (nWords < n) return empty
    val seen = new java.util.LinkedHashSet[UTF8String](
      math.max(16, (nWords - n + 1) * 2))
    var w = 0
    while (w <= nWords - n) {
      val a = starts(w)
      val b = if (w + n < nWords) starts(w + n) - 1 else len
      val view = UTF8String.fromAddress(base, off + a, b - a)
      if (!seen.contains(view)) seen.add(view.clone())
      w += 1
    }
    new GenericArrayData(seen.toArray.asInstanceOf[Array[Any]])
  }
}

/** Codegen'd per-document repetition statistics — one pass over the text
  * bytes computing exactly what q_text_repetition's two explode →
  * groupBy(doc, token) → groupBy(doc) pipelines computed:
  * (n_toks, n_distinct, top_w, n_bi, top_b) with
  * words = split(text, " ") (empty + trailing words kept) and
  * bigram = two adjacent words joined with " " (= the byte slice of the
  * original text covering both words, since the joiner is the same
  * single space the text was split on).
  *
  * The relational form shuffled every (doc, token) and (doc, bigram) pair
  * twice; per-document state is bounded by the document itself (KBs), so
  * this is a strictly better 100 TB shape: a scan-side projection with
  * ZERO corpus shuffle. Returns NULL when the doc has < 2 words (the old
  * inner join on bigram stats dropped those docs) or the text is NULL.
  * Parity with the relational form is pinned in PropertySpec.
  */
case class RepetitionStats(child: Expression)
    extends UnaryExpression {

  override def dataType: DataType = RepetitionStats.schema
  override def prettyName: String = "repetition_stats"
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string input, got ${other.catalogString}")
  }

  override protected def nullSafeEval(t: Any): Any =
    RepetitionStats.compute(t.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      |${ev.value} = graft.functions.RepetitionStats.compute($c);
      |${ev.isNull} = (${ev.value} == null);
      """.stripMargin)

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object RepetitionStats {
  import org.apache.spark.sql.types.{LongType, StructField, StructType}

  val schema: StructType = StructType(Seq(
    StructField("n_toks", LongType, nullable = false),
    StructField("n_distinct", LongType, nullable = false),
    StructField("top_w", LongType, nullable = false),
    StructField("n_bi", LongType, nullable = false),
    StructField("top_b", LongType, nullable = false)))

  /** Called from generated code. Returns null for < 2 words. */
  def compute(s: UTF8String): org.apache.spark.sql.catalyst.InternalRow = {
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
    if (nWords < 2) return null
    def slice(startWord: Int, endWord: Int): UTF8String = {
      val a = starts(startWord)
      val b = if (endWord + 1 < nWords) starts(endWord + 1) - 1 else len
      UTF8String.fromAddress(base, off + a, b - a)
    }
    val wc = new java.util.HashMap[UTF8String, Array[Long]](nWords * 2)
    val bc = new java.util.HashMap[UTF8String, Array[Long]](nWords * 2)
    var topW = 0L
    var topB = 0L
    var k = 0
    while (k < nWords) {
      val c = wc.computeIfAbsent(slice(k, k), _ => new Array[Long](1))
      c(0) += 1
      if (c(0) > topW) topW = c(0)
      if (k + 1 < nWords) {
        val cb = bc.computeIfAbsent(slice(k, k + 1), _ => new Array[Long](1))
        cb(0) += 1
        if (cb(0) > topB) topB = cb(0)
      }
      k += 1
    }
    org.apache.spark.sql.catalyst.InternalRow(
      nWords.toLong, wc.size.toLong, topW, (nWords - 1).toLong, topB)
  }
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
