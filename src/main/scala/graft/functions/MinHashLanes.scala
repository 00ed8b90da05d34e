package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** All 8 MinHash lanes of a document in ONE per-row pass over its token
  * array — the shuffle-free replacement for the explode→groupBy signature
  * pipeline (`min(substring(md5(shingle), 4j+1, 4))` per lane). Semantics
  * are byte-identical to that aggregation — word-3-gram shingles joined
  * with single spaces, lowercase-hex md5, lane j = hex chars [4j, 4j+4),
  * lexicographic min (= unsigned numeric min of the two digest bytes,
  * since '0'<'9'<'a'<'f' follows nibble order) — so the DuckDB oracle and
  * every downstream banding join are unchanged. NULL when the doc has
  * fewer than 3 tokens (the explode form emits no row for those docs).
  *
  * Scale: signature generation becomes pure map-side per-row compute
  * inside whole-stage codegen — at 100 TB the corpus scan emits
  * kilobyte signatures with NO shuffle at all (the old shape shuffled
  * per-shingle partial mins). The md5 instance is thread-local; the
  * shingle bytes are assembled in a reused buffer, no per-shingle string
  * materialization.
  */
case class MinHashLanes(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "minhash_lanes"
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string>, got ${t.catalogString}")
  }

  override protected def nullSafeEval(input: Any): Any =
    MinHashKernel.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      s"""
         |${ev.value} = graft.functions.MinHashKernel.compute($a);
         |${ev.isNull} = (${ev.value} == null);
       """.stripMargin
    })

  override protected def withNewChildInternal(
      newChild: Expression): MinHashLanes = copy(child = newChild)
}

/** Static kernel for [[MinHashLanes]] (object without companion class →
  * Scala emits static forwarders, so generated Java calls it directly). */
object MinHashKernel {
  private val LANES = 8

  private val mdLocal = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  private val HEX = "0123456789abcdef".toCharArray

  /** null when < 3 tokens (no shingles); otherwise 8 four-hex-char lane
    * minima over all word-3-gram shingles. */
  def compute(tokens: ArrayData): ArrayData = {
    val n = tokens.numElements()
    if (n < 3) return null
    val md = mdLocal.get()
    val mins = new Array[Int](LANES)
    java.util.Arrays.fill(mins, Int.MaxValue)
    var sawShingle = false
    var i = 0
    while (i <= n - 3) {
      // a shingle containing a NULL token hashes to NULL upstream and is
      // skipped by the min aggregate — mirror that
      if (!tokens.isNullAt(i) && !tokens.isNullAt(i + 1) &&
          !tokens.isNullAt(i + 2)) {
        sawShingle = true
        md.reset()
        md.update(tokens.getUTF8String(i).getBytes)
        md.update(' '.toByte)
        md.update(tokens.getUTF8String(i + 1).getBytes)
        md.update(' '.toByte)
        md.update(tokens.getUTF8String(i + 2).getBytes)
        val d = md.digest()
        var j = 0
        while (j < LANES) {
          val v = ((d(2 * j) & 0xff) << 8) | (d(2 * j + 1) & 0xff)
          if (v < mins(j)) mins(j) = v
          j += 1
        }
      }
      i += 1
    }
    if (!sawShingle) return null
    val out = new Array[AnyRef](LANES)
    var j = 0
    while (j < LANES) {
      val v = mins(j)
      out(j) = UTF8String.fromString(new String(Array(
        HEX((v >> 12) & 0xf), HEX((v >> 8) & 0xf),
        HEX((v >> 4) & 0xf), HEX(v & 0xf))))
      j += 1
    }
    new GenericArrayData(out)
  }
}
