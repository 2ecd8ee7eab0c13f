package graft.functions

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SQL registration for graft's native expressions, so
  * `spark.sql("SELECT winnowed_fingerprint(text, 8, 4) ...")` works the
  * same as the Column API. Two entry points:
  *
  *   - [[register]]: imperative, into an existing session's registry;
  *   - [[GraftExtensions]]: `spark.sql.extensions=graft.functions.GraftExtensions`
  *     for config-driven injection at session build (the library-style
  *     deployment on a shared cluster).
  */
object GraftFunctions {

  private def intArg(e: Expression): Int =
    e.eval().asInstanceOf[Number].intValue()

  private val builders: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "winnowed_fingerprint" -> { exprs =>
      exprs match {
        case Seq(c) => WinnowedFingerprint(c, 8, 4)
        case Seq(c, k, w) => WinnowedFingerprint(c, intArg(k), intArg(w))
        case _ => throw new IllegalArgumentException(
          "winnowed_fingerprint(text[, k, w])")
      }
    },
    "float_dot" -> { exprs =>
      require(exprs.length == 2, "float_dot(a, b)")
      FloatDot(exprs.head, exprs(1))
    },
    "bpe_token_count" -> { exprs =>
      require(exprs.length == 1, "bpe_token_count(text)")
      BpeTokenCount(exprs.head)
    },
    "deflate_ratio" -> { exprs =>
      require(exprs.length == 1, "deflate_ratio(text)")
      DeflateRatio(exprs.head)
    },
    "unicode_normalize" -> { exprs =>
      exprs match {
        case Seq(c) => UnicodeNormalize(c, java.text.Normalizer.Form.NFC)
        case Seq(c, f) => UnicodeNormalize(c,
          java.text.Normalizer.Form.valueOf(
            f.eval().asInstanceOf[org.apache.spark.unsafe.types.UTF8String]
              .toString))
        case _ => throw new IllegalArgumentException(
          "unicode_normalize(text[, form])")
      }
    })

  def register(spark: SparkSession): Unit =
    builders.foreach { case (name, builder) =>
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(
        name, builder, "built-in")
    }
}

/** Config-driven injection: `--conf spark.sql.extensions=graft.functions.GraftExtensions`. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("winnowed_fingerprint"),
      new ExpressionInfo(classOf[WinnowedFingerprint].getName, "winnowed_fingerprint"),
      (exprs: Seq[Expression]) => exprs match {
        case Seq(c) => WinnowedFingerprint(c, 8, 4)
        case Seq(c, k, w) => WinnowedFingerprint(c,
          k.eval().asInstanceOf[Number].intValue(),
          w.eval().asInstanceOf[Number].intValue())
        case _ => throw new IllegalArgumentException(
          "winnowed_fingerprint(text[, k, w])")
      }))
    ext.injectFunction((
      FunctionIdentifier("float_dot"),
      new ExpressionInfo(classOf[FloatDot].getName, "float_dot"),
      (exprs: Seq[Expression]) => FloatDot(exprs.head, exprs(1))))
    ext.injectFunction((
      FunctionIdentifier("bpe_token_count"),
      new ExpressionInfo(classOf[BpeTokenCount].getName, "bpe_token_count"),
      (exprs: Seq[Expression]) => BpeTokenCount(exprs.head)))
    ext.injectFunction((
      FunctionIdentifier("deflate_ratio"),
      new ExpressionInfo(classOf[DeflateRatio].getName, "deflate_ratio"),
      (exprs: Seq[Expression]) => DeflateRatio(exprs.head)))
    // whole-operator tier: plan AsofJoin logical nodes natively in any
    // session built with this extension (the imperative path is
    // AsofJoinPlan.install / implicit in AsofJoinPlan.asof)
    ext.injectPlannerStrategy(_ => graft.plans.AsofJoinPlan.AsofJoinStrategy)
    // optimizer-rule tier: bounded levenshtein predicates run the banded
    // O(len·k) DP instead of the full O(len²) matrix
    ext.injectOptimizerRule(_ => graft.plans.BandedLevenshteinRule)
  }
}
