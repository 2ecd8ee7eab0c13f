package graft.functions

import java.text.Normalizer

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode normalization as a native codegen'd expression — the very
  * first pass of every text-curation pipeline (before tokenizing,
  * hashing, or deduplicating anything): the same visible string can
  * arrive as composed or decomposed codepoints (é vs e+U+0301), and
  * every downstream equality — exact dedup md5s, shingle hashes,
  * stopword matches — silently fractures across the two forms unless
  * the corpus is normalized first.
  *
  * NFC (canonical composition) is the interchange default and is what
  * the `text_normalize` query ships through the DuckDB oracle
  * (`nfc_normalize` — byte-identical semantics); NFKC additionally
  * folds compatibility forms (ﬁ → fi, fullwidth → ASCII), the usual
  * choice before tokenizer training — engine-side option, spec-gated
  * on crafted strings.
  *
  * Scale: zero-shuffle scan projection inside whole-stage codegen; the
  * JDK normalizer fast-paths pure-ASCII input (`isNormalized` is a
  * table lookup per char), so the common corpus row costs one scan of
  * its chars and zero allocations.
  */
case class UnicodeNormalize(child: Expression, form: Normalizer.Form)
    extends UnaryExpression {

  override def dataType: DataType = StringType
  override def nullSafeEval(input: Any): Any =
    UnicodeNormalize.normalize(input.asInstanceOf[UTF8String], form.name())

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"""graft.functions.UnicodeNormalize.normalize($c, "${form.name()}")""")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
  override def prettyName: String = s"unicode_normalize_${form.name().toLowerCase}"
}

object UnicodeNormalize {

  /** Normalize, with the no-allocation fast path when already in form
    * (the overwhelmingly common case for a mostly-ASCII corpus). */
  def normalize(text: UTF8String, formName: String): UTF8String = {
    val s = text.toString
    val form = Normalizer.Form.valueOf(formName)
    if (Normalizer.isNormalized(s, form)) text
    else UTF8String.fromString(Normalizer.normalize(s, form))
  }

  def unicode_normalize(c: Column, form: String = "NFC"): Column =
    GraftBridge.column(
      UnicodeNormalize(GraftBridge.expression(c), Normalizer.Form.valueOf(form)))
}
