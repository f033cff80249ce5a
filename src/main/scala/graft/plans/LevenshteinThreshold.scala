package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.IntegerType

/** Optimizer rule: rewrite bounded edit-distance comparisons to the
  * THRESHOLDED levenshtein.
  *
  *   levenshtein(a, b) <= k   ==>   levenshtein(a, b, k) >= 0
  *
  * The 2-arg levenshtein fills the full O(|a|·|b|) DP table; the
  * 3-arg form runs the banded O(k·min(|a|,|b|)) DP and returns −1 as
  * soon as the distance provably exceeds k. For a dedup filter like
  * `WHERE levenshtein(a, b) <= 10` on 40-char keys that is ~4× less
  * work per pair — and the user's query didn't have to know the
  * 3-arg form exists. Both predicates are exactly equivalent: the
  * thresholded DP is exact for all distances ≤ k and −1 (excluded by
  * the `>= 0` conjunct) otherwise.
  *
  * This is the engine's Rule[LogicalPlan] extension exemplar (SURVEY
  * §7.3 tier (c)): a semantic rewrite Catalyst doesn't know, injected
  * via SparkSessionExtensions.injectOptimizerRule — the same public
  * mechanism a real cluster deployment uses. The rewrite fires on any
  * boolean context (Filter, Join condition, projected flag), only
  * when the comparison bound is a non-negative integer literal and
  * the call has no explicit threshold already.
  *
  * Equivalence: the thresholded DP returns the exact distance d when
  * d ≤ k and −1 otherwise, so the single predicate `>= 0` encodes
  * the whole bound — one evaluation, no reliance on subexpression
  * elimination. NULL inputs yield NULL under both forms.
  */
object LevenshteinThreshold extends Rule[LogicalPlan] {

  private def banded(l: Expression, r: Expression, k: Int): Expression =
    GreaterThanOrEqual(Levenshtein(l, r, Some(Literal(k))), Literal(0))

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case LessThanOrEqual(Levenshtein(l, r, None), Literal(k: Int, IntegerType))
          if k >= 0 => banded(l, r, k)
      case GreaterThanOrEqual(Literal(k: Int, IntegerType), Levenshtein(l, r, None))
          if k >= 0 => banded(l, r, k)
      case LessThan(Levenshtein(l, r, None), Literal(k: Int, IntegerType))
          if k >= 1 => banded(l, r, k - 1)
      case GreaterThan(Literal(k: Int, IntegerType), Levenshtein(l, r, None))
          if k >= 1 => banded(l, r, k - 1)
    }
}
