package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Expression, GreaterThan,
  GreaterThanOrEqual, LessThan, LessThanOrEqual, Levenshtein, Literal}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.IntegerType

/** Optimizer rule: rewrite bounded edit-distance predicates into
  * Spark's banded (thresholded) Levenshtein.
  *
  *   levenshtein(a, b) <= k   ==>   levenshtein(a, b, k) >= 0
  *   levenshtein(a, b) <  k   ==>   levenshtein(a, b, k-1) >= 0
  *   (and the two mirrored literal-first forms)
  *
  * The three-argument form runs the Ukkonen banded DP — O(len·k) cells
  * and an early exit the moment the band overflows, returning −1 above
  * the threshold — while the two-argument form always fills the full
  * O(len²) matrix. For a near-dup predicate (k a few edits, strings
  * hundreds of chars) that is a 10-100× per-pair saving, applied
  * automatically to ANY user query planned through
  * [[graft.functions.GraftExtensions]] — the same rewrite
  * [[graft.llm.Dedup.dedupEditDistance]] does by hand in its verify
  * stage, generalized.
  *
  * Soundness: for k ≥ 0, distance ≤ k ⟺ banded(k) ≠ −1 ⟺ banded(k) ≥ 0
  * (the banded result equals the true distance whenever it is within
  * the band, and distances are non-negative); `< k` lowers the band to
  * k−1. NULL inputs give NULL under both forms, so filter semantics are
  * unchanged. Only bare (un-thresholded) calls compared against
  * non-negative integer LITERALS are touched — everything else is left
  * exactly as written. FunctionsSpec pins plan shape + result parity
  * against the unrewritten form on random near/far string pairs.
  */
object BandedLevenshteinRule extends Rule[LogicalPlan] {

  private def banded(a: Expression, b: Expression, k: Int): Expression =
    GreaterThanOrEqual(Levenshtein(a, b, Some(Literal(k))), Literal(0))

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case LessThanOrEqual(Levenshtein(a, b, None), Literal(k: Int, IntegerType))
          if k >= 0 => banded(a, b, k)
      case GreaterThanOrEqual(Literal(k: Int, IntegerType), Levenshtein(a, b, None))
          if k >= 0 => banded(a, b, k)
      case LessThan(Levenshtein(a, b, None), Literal(k: Int, IntegerType))
          if k >= 1 => banded(a, b, k - 1)
      case GreaterThan(Literal(k: Int, IntegerType), Levenshtein(a, b, None))
          if k >= 1 => banded(a, b, k - 1)
    }
}
