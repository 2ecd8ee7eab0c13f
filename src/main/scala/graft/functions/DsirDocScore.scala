package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Per-document DSIR reduction against a driver-built term → log-ratio
  * table, as a native codegen'd Catalyst expression: one hash lookup
  * per token, returning `array<double>` `[n_tokens, slr]` where
  * `n_tokens` counts the tokens present in the table and `slr` is the
  * exact DECIMAL(28,9) sum of their rounded log ratios, cast to double.
  *
  * This is the Generate-side fold the shuffle plan it replaces paid two
  * exchanges for: explode → sort-merge join positions against the
  * vocabulary model on `term` → hash-aggregate by doc_id. With the
  * model collected driver-side (the [[BpeMergeCounter]] /
  * `tokenCountLearned` collected-artifact pattern), the whole scoring
  * pass is scan → project → TakeOrdered: zero shuffles of corpus data.
  *
  * Semantics are BIT-IDENTICAL to the join plan, which is what lets
  * `dsir_select` keep its exact DuckDB oracle:
  *   - the table's values are the per-term unscaled longs of
  *     `CAST(round(ln(pT/pR), 9) AS DECIMAL(28,9))` — i.e.
  *     `BigDecimal.valueOf(lr).setScale(9, HALF_UP)` shifted 9 — the
  *     very decimals the join plan's SUM added; long addition is the
  *     exact decimal addition, order-independent;
  *   - `slr` converts via `BigDecimal(unscaled, 9).doubleValue()`,
  *     Spark's own Decimal(28,9) → double path;
  *   - a token absent from the table is skipped from BOTH the count and
  *     the sum (inner-join semantics; with the model trained on the
  *     same corpus nothing is absent), a null token element likewise
  *     (a null join key matches nothing);
  *   - a null tokens array → null (null-propagation).
  */
case class DsirDocScore(child: Expression,
    scorer: DsirScorer) extends UnaryExpression {

  override def dataType: DataType =
    ArrayType(org.apache.spark.sql.types.DoubleType, containsNull = false)
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other =>
      TypeCheckResult.TypeCheckFailure(
        s"dsir_doc_score requires array<string>, got ${other.catalogString}")
  }

  override def nullSafeEval(v: Any): Any =
    scorer.score(v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("dsirScorer", scorer,
      classOf[DsirScorer].getName)
    defineCodeGen(ctx, ev, c => s"$ref.score($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
  override def prettyName: String = "dsir_doc_score"
}

/** The codegen-referenced lookup table: term → unscaled DECIMAL(28,9)
  * log ratio, keyed by [[UTF8String]] so the hot loop probes with the
  * scanned bytes directly (no per-token String decode). Serializable so
  * the reference object ships to executors once per plan, not per row. */
class DsirScorer(terms: Array[String], lrs: Array[Long])
    extends Serializable {

  @transient private lazy val entries: java.util.HashMap[UTF8String, java.lang.Long] = {
    val m = new java.util.HashMap[UTF8String, java.lang.Long](
      terms.length * 2)
    var i = 0
    while (i < terms.length) {
      m.put(UTF8String.fromString(terms(i)), java.lang.Long.valueOf(lrs(i)))
      i += 1
    }
    m
  }

  def size: Int = terms.length

  def score(toks: ArrayData): ArrayData = {
    val n = toks.numElements()
    var present = 0L
    var sum = 0L
    var i = 0
    while (i < n) {
      if (!toks.isNullAt(i)) {
        val lr = entries.get(toks.getUTF8String(i))
        // addExact: the shuffle plan this replaces summed Decimal(38,9),
        // which fails loudly on overflow; a silent Long wrap here would
        // break the bit-identity contract, so overflow must throw too.
        // (28,9) unscaled values fit a Long with ~10^9 headroom per term,
        // so a real corpus never trips this — it is a tripwire, not a path.
        if (lr != null) { present += 1L; sum = Math.addExact(sum, lr.longValue()) }
      }
      i += 1
    }
    val slr = new java.math.BigDecimal(
      java.math.BigInteger.valueOf(sum), 9).doubleValue()
    UnsafeArrayData.fromPrimitiveArray(Array(present.toDouble, slr))
  }
}

object DsirDocScore {
  def dsir_doc_score(tokens: Column, scorer: DsirScorer): Column =
    GraftBridge.column(
      DsirDocScore(GraftBridge.expression(tokens), scorer))
}
