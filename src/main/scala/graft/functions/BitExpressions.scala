package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}

/** Codegen'd Z-order (Morton) interleave of two 16-bit keys — the
  * space-filling-curve primitive behind multi-dimensional data layout:
  * sorting/range-partitioning a table by `morton(x, y)` co-locates rows
  * that are close in BOTH dimensions, so min/max footer stats prune scans
  * for predicates on either column (the "cluster by (a, b)" layout trick;
  * at 100 TB the difference between reading one file group and all of
  * them). Composed from the classic magic-mask bit spread — five shifts
  * and masks per key instead of a 16-iteration bit loop — inside
  * whole-stage codegen.
  *
  * Semantics (mirrored exactly by the DuckDB oracle's mask arithmetic):
  * both inputs are masked to their low 16 bits; x occupies even result
  * bits, y odd. Pure arithmetic — null only when an input is null.
  */
case class MortonInterleave(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "morton_interleave"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (LongType, LongType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (bigint, bigint), got " +
          s"(${l.catalogString}, ${r.catalogString})")
    }

  override protected def nullSafeEval(a: Any, b: Any): Any =
    MortonInterleave.spread(a.asInstanceOf[Long]) |
      (MortonInterleave.spread(b.asInstanceOf[Long]) << 1)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val (x, y) = (ctx.freshName("x"), ctx.freshName("y"))
      def spread(v: String): String =
        s"""$v &= 0xFFFFL;
           |$v = ($v | ($v << 8)) & 0x00FF00FFL;
           |$v = ($v | ($v << 4)) & 0x0F0F0F0FL;
           |$v = ($v | ($v << 2)) & 0x33333333L;
           |$v = ($v | ($v << 1)) & 0x55555555L;""".stripMargin
      s"""
         |long $x = $a;
         |long $y = $b;
         |${spread(x)}
         |${spread(y)}
         |${ev.value} = $x | ($y << 1);
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): MortonInterleave =
    copy(left = newLeft, right = newRight)
}

object MortonInterleave {
  /** Spread the low 16 bits of v to the even bit positions of a 32-bit
    * value (0babcd → 0b0a0b0c0d) via magic masks. */
  def spread(v0: Long): Long = {
    var v = v0 & 0xFFFFL
    v = (v | (v << 8)) & 0x00FF00FFL
    v = (v | (v << 4)) & 0x0F0F0F0FL
    v = (v | (v << 2)) & 0x33333333L
    v = (v | (v << 1)) & 0x55555555L
    v
  }
}
