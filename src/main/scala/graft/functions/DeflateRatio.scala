package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType}
import org.apache.spark.unsafe.types.UTF8String

/** Compression-ratio quality signal as a native codegen'd expression:
  * deflate(text).length / text.utf8Length. The classic cheap redundancy
  * detector for corpus curation (used alongside the Gopher-style rules):
  * highly repetitive machine-generated text compresses far below normal
  * prose (~0.4–0.7 for English), while random/encrypted blobs sit near
  * or above 1.0 — both tails are drop candidates that simple word
  * statistics miss.
  *
  * DEFLATE here is the standard zlib algorithm (RFC 1951) at a fixed
  * level, so the score is deterministic for a given input. Engine-
  * specific (no SQL equivalent in the oracle) ⇒ the registered query is
  * spec-gated: FunctionsSpec refolds the same Deflater over collected
  * text and pins the ordering law (repetitive < prose < random).
  *
  * Scale: zero-shuffle scan projection. The Deflater is a per-thread
  * reused native object (allocating one per row would dominate the
  * cost); `reset()` between rows is cheap.
  */
case class DeflateRatio(child: Expression) extends UnaryExpression {

  override def dataType: DataType = DoubleType
  override def nullSafeEval(input: Any): Any =
    DeflateRatio.ratio(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.DeflateRatio.ratio($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
  override def prettyName: String = "deflate_ratio"
}

object DeflateRatio {

  private val LEVEL = 6 // zlib default — the conventional corpus-scan level

  private val local = new ThreadLocal[java.util.zip.Deflater] {
    override def initialValue(): java.util.zip.Deflater =
      new java.util.zip.Deflater(LEVEL)
  }

  /** deflate size / raw size; 0.0 for empty input (nothing to judge). */
  def ratio(text: UTF8String): Double = {
    val raw = text.getBytes
    if (raw.length == 0) return 0.0
    val d = local.get()
    d.reset()
    d.setInput(raw)
    d.finish()
    // count output without keeping it: only the SIZE matters
    val buf = new Array[Byte](8192)
    var n = 0L
    while (!d.finished()) n += d.deflate(buf)
    n.toDouble / raw.length
  }

  def deflate_ratio(c: Column): Column =
    GraftBridge.column(DeflateRatio(GraftBridge.expression(c)))
}
