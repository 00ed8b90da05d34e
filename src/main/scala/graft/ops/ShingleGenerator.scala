package graft.ops

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, Generator, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Custom Catalyst table function (UDTF v2, SURVEY §2.11): emits word
  * n-gram shingles of a text column, one output row per shingle — the
  * native-Generator upgrade of the explode(transform(sequence(...)))
  * composition in Extensions.qUdtf. Registered in the function registry and
  * planned through GenerateExec exactly like the built-in explode, so at
  * scale it streams rows without materializing the shingle array per row. */
case class ShingleGenerator(child: Expression, n: Int)
    extends UnaryExpression with Generator with CodegenFallback {

  override def elementSchema: StructType =
    StructType(Seq(StructField("shingle", StringType)))

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val v = child.eval(input)
    if (v == null) Nil
    else {
      val words = v.asInstanceOf[UTF8String].toString.split(" ")
      if (words.length < n) Nil
      else (0 to words.length - n).map { i =>
        InternalRow(UTF8String.fromString(words.slice(i, i + n).mkString(" ")))
      }
    }
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
