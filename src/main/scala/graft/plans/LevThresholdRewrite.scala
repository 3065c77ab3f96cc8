package graft.plans

import org.apache.spark.sql.catalyst.expressions.{EqualTo, Expression, GreaterThan, GreaterThanOrEqual, LessThan, LessThanOrEqual, Levenshtein, Literal}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.IntegerType

/** Optimizer rule: route bounded Levenshtein comparisons onto the
  * built-in's own THRESHOLD form.
  *
  * `levenshtein(a, b) <= k` computes the full O(|a|·|b|) DP and then
  * compares; `levenshtein(a, b, k)` runs the banded O(k·min(|a|,|b|)) DP,
  * bails out immediately when |len(a) − len(b)| > k, and returns −1 past
  * the bound — but users (and the engine's own linkage operators) write
  * the first form. This rule rewrites, for non-negative int literals k:
  *
  *   lev(a,b) <= k   →  lev(a,b,k) >= 0
  *   lev(a,b) <  k   →  lev(a,b,k−1) >= 0          (k ≥ 1)
  *   lev(a,b) =  k   →  lev(a,b,k) = k
  *
  * (plus the literal-on-the-left mirrors). Exactness: for distance d and
  * k ≥ 0, lev(a,b,k) returns d iff d ≤ k and −1 otherwise, so each
  * rewritten predicate has the identical truth table, and NULL inputs
  * propagate NULL through both forms. Idempotent by construction — the
  * output's threshold is `Some`, which the pattern (threshold `None`)
  * no longer matches. Measured **~70×** on a 200k-pair `<= 2` filter
  * over ~512-char strings (0.2 s vs 13.3 s, `graft.dev.LevBench` — the
  * control wraps the distance in `greatest(·, 0)` because Catalyst's own
  * `x + 0 → x` folding would otherwise hand the naive formulation to
  * this rule too); the win scales with string length since the full DP
  * is quadratic and the banded form is O(k·n) with a length-difference
  * bailout. */
object LevThresholdRewrite extends Rule[LogicalPlan] {

  private def bounded(a: Expression, b: Expression, k: Int): Expression =
    GreaterThanOrEqual(Levenshtein(a, b, Some(Literal(k))), Literal(0))

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case LessThanOrEqual(Levenshtein(a, b, None), Literal(k: Int, IntegerType))
          if k >= 0 => bounded(a, b, k)
      case GreaterThanOrEqual(Literal(k: Int, IntegerType), Levenshtein(a, b, None))
          if k >= 0 => bounded(a, b, k)
      case LessThan(Levenshtein(a, b, None), Literal(k: Int, IntegerType))
          if k >= 1 => bounded(a, b, k - 1)
      case GreaterThan(Literal(k: Int, IntegerType), Levenshtein(a, b, None))
          if k >= 1 => bounded(a, b, k - 1)
      case EqualTo(Levenshtein(a, b, None), Literal(k: Int, IntegerType))
          if k >= 0 =>
        EqualTo(Levenshtein(a, b, Some(Literal(k))), Literal(k))
      case EqualTo(Literal(k: Int, IntegerType), Levenshtein(a, b, None))
          if k >= 0 =>
        EqualTo(Levenshtein(a, b, Some(Literal(k))), Literal(k))
    }
}
