package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.sql.GraftBridge

/** Winnowing document fingerprint (Schleimer et al., SIGMOD 2003 "local
  * algorithms for document fingerprinting") as a native Catalyst expression:
  * polynomial rolling hashes over every k-char window, then the minimum
  * hash of each w-hash window (rightmost-min rule), deduplicated, sorted.
  *
  * A native `Expression` (not a Scala UDF) keeps the operator inside
  * whole-stage codegen: `doGenCode` emits a static call with no
  * serialization or boxing on the hot path, so a 100 TB scan fingerprints
  * at columnar-scan speed. The reference has no fingerprinting operator —
  * this is part of the training-data-pipeline extension surface
  * (SURVEY.md §7 step 6).
  */
case class WinnowedFingerprint(child: Expression, k: Int, w: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(input: Any): Any =
    WinnowedFingerprint.fingerprint(input.asInstanceOf[UTF8String], k, w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.WinnowedFingerprint.fingerprint($c, $k, $w)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
  override def prettyName: String = "winnowed_fingerprint"
}

object WinnowedFingerprint {
  private final val Base = 1000003L

  /** All-window rolling hash + winnowing. Static and allocation-light so
    * the generated code calls straight into it. */
  def fingerprint(text: UTF8String, k: Int, w: Int): GenericArrayData = {
    val s = text.toString
    val n = s.length
    if (n < k) return new GenericArrayData(Array.empty[Long])
    val m = n - k + 1
    val hashes = new Array[Long](m)
    // h(i) = sum s(i+j) * Base^(k-1-j), updated in O(1) per slide
    var pow = 1L
    var j = 1
    while (j < k) { pow *= Base; j += 1 }
    var h = 0L
    var i = 0
    while (i < k) { h = h * Base + s.charAt(i); i += 1 }
    hashes(0) = h
    i = 1
    while (i < m) {
      h = (h - s.charAt(i - 1) * pow) * Base + s.charAt(i + k - 1)
      hashes(i) = h
      i += 1
    }
    if (m <= w) {
      var min = hashes(0)
      i = 1
      while (i < m) { if (hashes(i) <= min) min = hashes(i); i += 1 }
      return new GenericArrayData(Array(min))
    }
    val out = scala.collection.mutable.SortedSet.empty[Long]
    var winStart = 0
    while (winStart + w <= m) {
      var min = hashes(winStart)
      var idx = winStart
      i = winStart + 1
      while (i < winStart + w) {
        if (hashes(i) <= min) { min = hashes(i); idx = i }
        i += 1
      }
      out += hashes(idx)
      winStart += 1
    }
    new GenericArrayData(out.toArray)
  }

  /** Column-level entry point. */
  def winnowed_fingerprint(c: Column, k: Int = 8, w: Int = 4): Column =
    GraftBridge.column(
      WinnowedFingerprint(GraftBridge.expression(c), k, w))
}
