package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** The corpus tokenizer `filter(split(lower(text), "\s+"), len > 0)` as
  * ONE native codegen'd expression — the hot inner loop of every text
  * query (token counts, shingles, TF-IDF, BM25, quality rules, LM
  * scoring all start here).
  *
  * The composed chain's `split` is codegen'd, but the higher-order
  * `filter` is not: its lambda evaluates interpreted per ELEMENT, and
  * the chain materializes the unfiltered split array first. This
  * expression is a single byte-scan pass over the lowercased UTF-8:
  * no regex, no intermediate array, no lambda — and its generated code
  * is one static call, so the surrounding projection stays inside
  * whole-stage codegen.
  *
  * Semantics are BIT-IDENTICAL to the composed chain (FunctionsSpec
  * pins the equivalence on the real corpus and the adversarial cases):
  *   - lowercasing is the same `UTF8String.toLowerCase` the `lower()`
  *     builtin calls;
  *   - Java's default `\s` is EXACTLY the six ASCII bytes
  *     { space, \t, \n, \x0B, \f, \r } (no UNICODE_CHARACTER_CLASS
  *     flag anywhere in the chain), and none of those byte values can
  *     occur inside a UTF-8 multibyte sequence, so a byte-level scan
  *     splits at precisely the positions the regex splits at;
  *   - `split` emits a leading "" for leading whitespace and (because
  *     Spark's two-arg split uses limit = -1) also trailing ""s for
  *     trailing whitespace; the chain's filter removes both kinds of
  *     empties — equivalently, this scan emits maximal non-whitespace
  *     runs, in order;
  *   - a null input is null; the output array contains no nulls.
  */
case class Tokenize(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  // tokens() casts to UTF8String: any other child type must fail at
  // analysis time rather than ClassCastException mid-scan
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other =>
      TypeCheckResult.TypeCheckFailure(
        s"tokenize requires string, got ${other.catalogString}")
  }

  override def nullSafeEval(v: Any): Any =
    Tokenize.tokens(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Tokenize.tokens($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
  override def prettyName: String = "tokenize"
}

object Tokenize {

  private def isWs(b: Byte): Boolean =
    b == 0x20 || (b >= 0x09 && b <= 0x0D)

  /** One pass: lowercase, then slice maximal non-whitespace byte runs.
    * Slices wrap the shared byte array (UTF8String.fromBytes with an
    * offset is a view, not a copy). */
  def tokens(s: UTF8String): ArrayData = {
    val lower = s.toLowerCase
    val bytes = lower.getBytes
    val n = bytes.length
    val out = new java.util.ArrayList[UTF8String](8)
    var i = 0
    while (i < n) {
      while (i < n && isWs(bytes(i))) i += 1
      val start = i
      while (i < n && !isWs(bytes(i))) i += 1
      if (i > start)
        out.add(UTF8String.fromBytes(bytes, start, i - start))
    }
    val arr = new Array[Any](out.size)
    var j = 0
    while (j < arr.length) { arr(j) = out.get(j); j += 1 }
    new GenericArrayData(arr)
  }

  def tokenize(text: Column): Column =
    GraftBridge.column(Tokenize(GraftBridge.expression(text)))
}
