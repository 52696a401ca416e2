package org.apache.spark.sql.graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.IntegerType

/** Catalyst optimizer rule: band bounded edit-distance comparisons.
  *
  * `levenshtein(a, b) <= k` forces the full O(|a|·|b|) dynamic program per
  * row even though only distances up to k matter. Spark ships a banded
  * O(k·min(|a|,|b|)) kernel behind the 3-arg `levenshtein(a, b, k)` (it
  * returns -1 past the threshold) but the optimizer never rewrites the
  * 2-arg comparison into it — users must know the trick. This rule does
  * the rewrite mechanically:
  *
  *   levenshtein(a, b) <= k   →   0 <= levenshtein(a, b, k)
  *   levenshtein(a, b) <  k   →   0 <= levenshtein(a, b, k-1)
  *
  * (the banded form returns the true distance when ≤ threshold and -1
  * otherwise, so "≥ 0" is exactly "within threshold"). Semantics are
  * unchanged — `GraftOptimizationsSpec` A/Bs result equality — and a
  * fuzzy-join stage gets the ~k/n DP cut without hand-tuning. The rewrite
  * fires only for non-negative integer literals on the right.
  *
  * Install per session (`GraftOptimizations.install(spark)`, idempotent)
  * or for every session via
  * `--conf spark.sql.extensions=org.apache.spark.sql.graft.GraftExtensions`.
  */
object BandLevenshteinRule extends Rule[LogicalPlan] {

  private def banded(lev: Levenshtein, k: Int): Expression =
    GreaterThanOrEqual(
      Levenshtein(lev.left, lev.right, Some(Literal(k))), Literal(0))

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformAllExpressions {
    case LessThanOrEqual(lev: Levenshtein, Literal(k: Int, IntegerType))
        if lev.threshold.isEmpty && k >= 0 =>
      banded(lev, k)
    case GreaterThanOrEqual(Literal(k: Int, IntegerType), lev: Levenshtein)
        if lev.threshold.isEmpty && k >= 0 =>
      banded(lev, k)
    case LessThan(lev: Levenshtein, Literal(k: Int, IntegerType))
        if lev.threshold.isEmpty && k >= 1 =>
      banded(lev, k - 1)
    case GreaterThan(Literal(k: Int, IntegerType), lev: Levenshtein)
        if lev.threshold.isEmpty && k >= 1 =>
      banded(lev, k - 1)
  }
}

object GraftOptimizations {
  val rules: Seq[Rule[LogicalPlan]] = Seq(BandLevenshteinRule)

  /** Register on a live session (idempotent). */
  def install(spark: SparkSession): Unit = {
    val current = spark.experimental.extraOptimizations
    val missing = rules.filterNot(current.contains)
    if (missing.nonEmpty)
      spark.experimental.extraOptimizations = current ++ missing
  }
}

/** Builder-time form: `.config("spark.sql.extensions", classOf[GraftExtensions].getName)`. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftOptimizations.rules.foreach(r => ext.injectOptimizerRule(_ => r))
}
