package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType}
import org.apache.spark.unsafe.types.UTF8String

/** Content-defined chunk boundaries via a Gear rolling hash (the
  * FastCDC family: Xia et al., USENIX ATC 2016; Gear hash from Ddelta,
  * Xia et al. 2014): a 64-bit hash h = (h << 1) + gear[byte] rolls over
  * the bytes, and a boundary is declared where (h & mask) == 0, with
  * min/max chunk-length clamps. Returns the boundary offsets INCLUDING
  * 0 and the document length, so consecutive pairs are exactly the
  * chunks.
  *
  * Why content-defined instead of the fixed windows of
  * [[graft.llm.TextOps.docChunks]]: fixed-size chunking shatters under
  * a single-byte insertion (every later chunk shifts and re-hashes);
  * CDC boundaries are functions of LOCAL content, so an edit disturbs
  * only the chunk it lands in and chunk-level dedup keeps matching the
  * rest — the property FunctionsSpec pins (prefix-shift keeps all but
  * the leading chunks' hashes). This is how backup/dedup stores (and
  * span-level corpus dedup over long documents) stay robust to
  * boilerplate insertions.
  *
  * The gear table derives from the engine-owned splitmix64 finalizer
  * ([[HllSketch.mix64]]) — deterministic across runs and engines, no
  * external constants. DuckDB-oracled since r14: the hash masks to its
  * low 6 bits, and 2^t mod 64 = 0 for t ≥ 6, so the boundary predicate
  * is LOCAL to the last 6 bytes — [[graft.llm.TextOps.cdcCutsCtesSql]]
  * replays it as a per-position zero set plus a recursive CTE over cut
  * offsets. FunctionsSpec also compares against an independent
  * plain-Scala roll.
  */
case class CdcBoundaries(child: Expression, avgBits: Int, minLen: Int,
    maxLen: Int) extends UnaryExpression {

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullSafeEval(input: Any): Any =
    CdcBoundaries.boundaries(input.asInstanceOf[UTF8String], avgBits, minLen,
      maxLen)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.CdcBoundaries.boundaries($c, $avgBits, $minLen, $maxLen)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
  override def prettyName: String = "cdc_boundaries"
}

object CdcBoundaries {

  /** 256-entry gear table from the splitmix64 finalizer. */
  val gear: Array[Long] = Array.tabulate(256)(i => HllSketch.mix64(i.toLong))

  /** Boundary offsets over the UTF-8 BYTES of `text`: starts with 0,
    * ends with n; a cut lands where the masked gear hash zeroes, no
    * closer than `minLen` to the last cut, and forced at `maxLen`. The
    * hash resets at each cut so every boundary decision depends only on
    * the bytes of its own chunk — the locality that makes edits
    * non-propagating. */
  def boundaries(text: UTF8String, avgBits: Int, minLen: Int,
      maxLen: Int): ArrayData = {
    val bytes = text.getBytes
    val n = bytes.length
    val mask = (1L << avgBits) - 1
    val out = scala.collection.mutable.ArrayBuffer[Int](0)
    var h = 0L
    var last = 0
    var i = 0
    while (i < n) {
      h = (h << 1) + gear(bytes(i) & 0xff)
      val len = i - last + 1
      if ((len >= minLen && (h & mask) == 0L) || len >= maxLen) {
        out += i + 1
        last = i + 1
        h = 0L
      }
      i += 1
    }
    if (out.last != n) out += n
    new GenericArrayData(out.toArray)
  }

  def cdc_boundaries(c: Column, avgBits: Int = 6, minLen: Int = 16,
      maxLen: Int = 256): Column =
    GraftBridge.column(
      CdcBoundaries(GraftBridge.expression(c), avgBits, minLen, maxLen))
}
