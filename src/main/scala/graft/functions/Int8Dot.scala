package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, LongType}

/** Integer dot product of two int8-quantized vectors (array<tinyint>),
  * as a native codegen'd Catalyst expression — the scan kernel of
  * scalar-quantized similarity search ([[graft.llm.Vectors.simTopKSq8]]).
  *
  * The multiply-accumulate runs entirely in integers (byte×byte products
  * summed in long — overflow-free to 2⁴⁷ elements), which is the point
  * of SQ8: the approximate scan touches 1/4 the bytes of the float
  * corpus and does integer MACs, and only re-rank survivors ever load
  * float vectors. Same native-expression shape as [[FloatDot]] — no
  * boxing, stays inside whole-stage codegen.
  */
case class Int8Dot(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType
  override def nullSafeEval(a: Any, b: Any): Any =
    Int8Dot.dot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.Int8Dot.dot($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "int8_dot"
}

object Int8Dot {
  /** Tight integer loop, no allocation; static so generated code calls
    * it directly. */
  def dot(a: ArrayData, b: ArrayData): Long = {
    val n = math.min(a.numElements(), b.numElements())
    var s = 0L
    var i = 0
    while (i < n) { s += a.getByte(i).toLong * b.getByte(i); i += 1 }
    s
  }

  def int8_dot(a: Column, b: Column): Column =
    GraftBridge.column(
      Int8Dot(GraftBridge.expression(a), GraftBridge.expression(b)))
}
