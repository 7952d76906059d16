package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.IntegerType

/** Optimizer rule: bound Levenshtein comparisons run the banded DP.
  *
  * A predicate `levenshtein(a, b) <= k` forces the full O(|a|·|b|) DP per
  * row even though only distances within k matter. Spark's threshold form
  * `levenshtein(a, b, k)` runs the O(max(|a|,|b|)·k) banded DP with early
  * exit and returns -1 above the bound — so the predicate is equivalent to
  * `levenshtein(a, b, k) >= 0` (NULL propagation identical: null inputs
  * make both forms null). This rule rewrites the comparison wherever it
  * appears, the same style of pattern-rewrite Catalyst's own
  * LikeSimplification applies to `LIKE 'abc%'`.
  *
  * Users get the speedup without knowing the threshold form exists — the
  * value of owning the optimizer extension point: at 100 TB a blocked
  * near-dup join evaluates this predicate billions of times, and k ≪ |s|
  * makes the banded DP ~|s|/(2k+1)× cheaper.
  */
object BandedLevenshteinRule extends Rule[LogicalPlan] {

  private def banded(a: Expression, b: Expression, k: Int): Expression =
    GreaterThanOrEqual(Levenshtein(a, b, Some(Literal(k))), Literal(0))

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      // lev(a,b) <= k  /  k >= lev(a,b)
      case LessThanOrEqual(Levenshtein(a, b, None), Literal(k: Int, IntegerType)) if k >= 0 =>
        banded(a, b, k)
      case GreaterThanOrEqual(Literal(k: Int, IntegerType), Levenshtein(a, b, None)) if k >= 0 =>
        banded(a, b, k)
      // lev(a,b) < k  /  k > lev(a,b)
      case LessThan(Levenshtein(a, b, None), Literal(k: Int, IntegerType)) if k >= 1 =>
        banded(a, b, k - 1)
      case GreaterThan(Literal(k: Int, IntegerType), Levenshtein(a, b, None)) if k >= 1 =>
        banded(a, b, k - 1)
    }
}
