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

/** N-dimensional Morton interleave (round 16) — the [[MortonInterleave]]
  * space-filling curve generalized to 2-4 dimensions for
  * `CALL zorder('t', 'a,b,c[,d]', n)`: bit j of child d lands at result
  * bit j*N + d, so sorting by the result co-locates rows close in EVERY
  * dimension and per-file min/max stats prune filters on any of them.
  * Children are masked to their low 16 bits; the CALLER must pre-scale
  * inputs so j*N + d never reaches bit 63 (15 bits/dim at N=4 — the
  * sign bit would invert sort order), which the zorder procedure's
  * lattice scaling guarantees. Codegen'd: a 16-iteration shift loop per
  * child — no magic-mask constant exists for stride 3, and the loop is
  * ~50 instructions inside whole-stage codegen, invisible next to the
  * rewrite's shuffle. */
case class MortonInterleaveN(children: Seq[Expression]) extends Expression {
  import org.apache.spark.sql.catalyst.InternalRow
  import org.apache.spark.sql.catalyst.expressions.codegen.Block._

  override def dataType: DataType = LongType
  override def nullable: Boolean = children.exists(_.nullable)
  override def prettyName: String = "morton_interleave_n"

  override def checkInputDataTypes(): TypeCheckResult =
    if (children.length < 2 || children.length > 4)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName takes 2-4 dimensions, got ${children.length}")
    else children.find(_.dataType != LongType) match {
      case Some(c) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires bigint dimensions, got ${c.dataType.catalogString}")
      case None => TypeCheckResult.TypeCheckSuccess
    }

  /** Per-dimension bit budget: 16 at N=2/3, 15 at N=4 — at N=4 a 16th
    * bit would land at position 15·4+3 = 63, the long's SIGN bit, and
    * invert the sort order of the z-key. Masked HERE (r17, advice item)
    * rather than relying on callers to pre-clamp: an out-of-contract
    * lane value now degrades clustering for that row only, never the
    * whole table's ordering. */
  private def dimMask: Long = if (children.length == 4) 0x7FFFL else 0xFFFFL

  override def eval(input: InternalRow): Any = {
    val n = children.length
    var r = 0L
    var d = 0
    while (d < n) {
      val v = children(d).eval(input)
      if (v == null) return null
      r |= MortonInterleaveN.spreadN(v.asInstanceOf[Long] & dimMask, n) << d
      d += 1
    }
    r
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val n = children.length
    val evals = children.map(_.genCode(ctx))
    val body = evals.zipWithIndex.map { case (e, d) =>
      val v = ctx.freshName("v")
      val j = ctx.freshName("j")
      s"""${e.code}
         |if (${e.isNull}) { ${ev.isNull} = true; }
         |else if (!${ev.isNull}) {
         |  long $v = ${e.value} & ${dimMask}L;
         |  for (int $j = 0; $j < 16; $j++)
         |    ${ev.value} |= (($v >>> $j) & 1L) << ($j * $n + $d);
         |}""".stripMargin
    }.mkString("\n")
    ev.copy(code =
      code"""
        |boolean ${ev.isNull} = false;
        |long ${ev.value} = 0L;
        |$body
      """.stripMargin)
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): MortonInterleaveN =
    copy(children = newChildren)
}

object MortonInterleaveN {
  /** Spread the low 16 bits of v with stride n (bit j → bit j*n). */
  def spreadN(v: Long, n: Int): Long = {
    var r = 0L
    var j = 0
    while (j < 16) {
      r |= ((v >>> j) & 1L) << (j * n)
      j += 1
    }
    r
  }
}
