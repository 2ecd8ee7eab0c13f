package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.Generator
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Word n-gram generator — the UDTF/Generator tier of the Catalyst
  * extension surface: one output row per n-gram of a token array,
  * produced LAZILY.
  *
  * The composed form this replaces in hot paths —
  * `explode(transform(sequence(...), i -> concat_ws(...)))`
  * ([[graft.llm.Decontam.ngramsFromTokens]]) — materializes the entire
  * n-gram array per row before exploding: for 13-grams that is ~13×
  * the document's text held per row at once, which is exactly the kind
  * of per-row amplification that turns into executor OOM at corpus
  * scale. A native [[Generator]] yields each gram as the downstream
  * operator consumes it, so peak memory per row is one gram.
  *
  * Output rows are identical to the composed form (same grams, same
  * order), so DuckDB-oracle checks on consumers are unchanged;
  * FunctionsSpec pins row-level equality. Generators run through
  * GenerateExec with CodegenFallback for the generator expression
  * itself — the surrounding operators stay codegen'd.
  */
case class NGramGenerate(child: Expression, n: Int)
    extends UnaryExpression with Generator with CodegenFallback {

  require(n >= 1, s"n must be >= 1, got $n")

  override def checkInputDataTypes():
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) =>
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    case other =>
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"ngram_gen needs array<string>, got $other")
  }

  override def elementSchema: StructType =
    StructType(StructField("gram", StringType) :: Nil)

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val toks = child.eval(input).asInstanceOf[ArrayData]
    if (toks == null || toks.numElements() < n) Iterator.empty
    else {
      val count = toks.numElements() - n + 1
      val sep = UTF8String.fromString(" ")
      Iterator.tabulate(count) { i =>
        val parts = new Array[UTF8String](n)
        var j = 0
        while (j < n) { parts(j) = toks.getUTF8String(i + j); j += 1 }
        InternalRow(UTF8String.concatWs(sep, parts: _*))
      }
    }
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
  override def prettyName: String = "ngram_gen"
}

object NGramGenerate {
  /** Column-level entry point; use directly in a select like explode. */
  def ngram_gen(toks: Column, n: Int): Column =
    GraftBridge.column(NGramGenerate(GraftBridge.expression(toks), n))
}
