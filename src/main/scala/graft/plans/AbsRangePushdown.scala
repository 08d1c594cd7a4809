package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{DataType, DecimalType, DoubleType, FloatType}

/** Optimizer rule: rewrite magnitude predicates over fractional
  * columns into range predicates —
  *
  *   `abs(e) <= k`  →  `e >= -k AND e <= k`
  *
  * (and the <, and literal-on-the-left mirrors). The abs() form is
  * opaque to data-source filter pushdown — the scan reads everything
  * and filters rows post-decode; the range form reaches parquet as
  * `PushedFilters: [GreaterThanOrEqual(e,-k), LessThanOrEqual(e,k)]`,
  * which skips whole row groups via min/max statistics. At 100 TB
  * that is the difference between scanning the band and scanning the
  * table.
  *
  * Semantics-preserving for all FRACTIONAL inputs (Double/Float/
  * Decimal): NULL → NULL both ways; NaN fails both forms; -0.0
  * compares equal to 0.0 in both. Deliberately NOT applied to
  * integral types, where ANSI `abs(Long.MinValue)` raises an overflow
  * error that the rewritten form would silently mask.
  *
  * Registered via [[graft.GraftExtensions]] (`injectOptimizerRule`) —
  * the rule lands in the operator-optimization fixed point, so
  * ConstantFolding collapses the emitted `UnaryMinus(k)` before
  * pushdown translation runs.
  */
object AbsRangePushdown extends Rule[LogicalPlan] {

  private def fractional(dt: DataType): Boolean = dt match {
    case DoubleType | FloatType | _: DecimalType => true
    case _ => false
  }

  private def rewritable(e: Expression, l: Literal): Boolean =
    fractional(e.dataType) && e.deterministic &&
      l.value != null && fractional(l.dataType)

  /** Negate at rewrite time: an emitted `UnaryMinus(k)` node only
    * constant-folds when the rule runs inside the operator-
    * optimization fixed point — under `experimental.extraOptimizations`
    * (a post-optimization batch) it would survive to pushdown
    * translation, which requires a bare Literal and silently drops
    * the bound.
    */
  private def neg(l: Literal): Expression =
    Literal.create(UnaryMinus(l, failOnError = false).eval(null), l.dataType)

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformAllExpressions {
    case LessThanOrEqual(Abs(e, _), l: Literal) if rewritable(e, l) =>
      And(GreaterThanOrEqual(e, neg(l)), LessThanOrEqual(e, l))
    case LessThan(Abs(e, _), l: Literal) if rewritable(e, l) =>
      And(GreaterThan(e, neg(l)), LessThan(e, l))
    case GreaterThanOrEqual(l: Literal, Abs(e, _)) if rewritable(e, l) =>
      And(GreaterThanOrEqual(e, neg(l)), LessThanOrEqual(e, l))
    case GreaterThan(l: Literal, Abs(e, _)) if rewritable(e, l) =>
      And(GreaterThan(e, neg(l)), LessThan(e, l))
  }
}
