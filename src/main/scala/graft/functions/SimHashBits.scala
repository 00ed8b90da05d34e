package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** 32-bit SimHash signature of a token array in ONE per-row pass — the
  * shuffle-free replacement for the explode→packed-vote aggregation
  * (per-token md5, vote per hex nibble's high bit, majority per bit).
  * Bit b (1 = MSB) of the result is set iff 2·votes_b > n, where votes_b
  * counts tokens whose md5 hex char at position b is in 8..f and n is
  * the total token count — integer sums in either order, so the kernel
  * is bit-identical to the aggregation by construction (also proven on
  * the fixture corpus in PropertySpec) and the DuckDB oracle is
  * unchanged. Token MULTIPLICITY counts, exactly like the explode form.
  *
  * Scale: signature generation becomes pure map-side compute inside
  * whole-stage codegen — no per-token shuffle, no 9-column vote
  * aggregation buffer; the corpus scan emits one long per doc. */
case class SimHashBits(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "simhash_bits"
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string>, got ${t.catalogString}")
  }

  override protected def nullSafeEval(input: Any): Any =
    SimHashKernel.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val tmp = ctx.freshName("simhash")
      s"""
         |java.lang.Long $tmp = graft.functions.SimHashKernel.compute($a);
         |${ev.isNull} = ($tmp == null);
         |${ev.value} = ${ev.isNull} ? -1L : $tmp.longValue();
       """.stripMargin
    })

  override protected def withNewChildInternal(
      newChild: Expression): SimHashBits = copy(child = newChild)
}

/** Static kernel for [[SimHashBits]]. */
object SimHashKernel {
  private val mdLocal = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** Packed 32-bit signature (bit 1 = MSB at 1L<<31 … bit 32 at 1L<<0).
    * NULL for an EMPTY token array: the explode→vote form emits no row at
    * all for a zero-token doc, so the kernel's parity with it must not
    * invent a 0-signature there. Unreachable from split(text,' ') (never
    * empty) but the expression is general-purpose. */
  def compute(tokens: ArrayData): java.lang.Long = {
    val n = tokens.numElements()
    if (n == 0) return null
    val md = mdLocal.get()
    val votes = new Array[Int](32)
    var i = 0
    while (i < n) {
      // a NULL token md5s to NULL upstream: the vote columns skip it but
      // count(*) still counts the row — mirror that (n includes it)
      if (!tokens.isNullAt(i)) {
        md.reset()
        md.update(tokens.getUTF8String(i).getBytes)
        val d = md.digest()
        var k = 0
        while (k < 16) {
          // hex char 2k   = high nibble, 2k+1 = low nibble; vote when the
          // nibble's top bit is set (hex char in 8..f)
          if ((d(k) & 0x80) != 0) votes(2 * k) += 1
          if ((d(k) & 0x08) != 0) votes(2 * k + 1) += 1
          k += 1
        }
      }
      i += 1
    }
    var shl = 0L
    var b = 0
    while (b < 32) {
      if (2L * votes(b) > n) shl |= 1L << (31 - b)
      b += 1
    }
    shl
  }
}
