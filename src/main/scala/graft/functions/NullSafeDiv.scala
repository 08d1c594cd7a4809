package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Cast, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.types.{DataType, DoubleType}

/** `null_safe_div(a, b)` — double division that yields NULL instead of
  * Infinity/NaN when the divisor is 0 (SURVEY.md §2 J5).
  *
  * A native Catalyst expression rather than a Scala UDF so it
  * participates in whole-stage codegen: no boxing, no closure call,
  * stays inside the fused pipeline. The null-when-zero semantics need
  * a custom doGenCode (BinaryExpression's nullSafeCodeGen can only
  * null-out on null inputs, not on a value predicate).
  */
case class NullSafeDiv(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "null_safe_div"

  override def eval(input: InternalRow): Any = {
    val r = right.eval(input)
    if (r == null) return null
    val rv = r.asInstanceOf[Double]
    if (rv == 0.0) return null
    val l = left.eval(input)
    if (l == null) return null
    l.asInstanceOf[Double] / rv
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val l = left.genCode(ctx)
    val r = right.genCode(ctx)
    ev.copy(code =
      code"""
        ${l.code}
        ${r.code}
        boolean ${ev.isNull} = true;
        double ${ev.value} = 0.0;
        if (!${l.isNull} && !${r.isNull} && ${r.value} != 0.0) {
          ${ev.isNull} = false;
          ${ev.value} = ${l.value} / ${r.value};
        }
      """)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Session registration for graft's custom SQL functions. */
object GraftFunctions {
  def register(spark: SparkSession): Unit = {
    // Inputs are coerced with an explicit double Cast (ImplicitCast
    // machinery is private[sql]); a no-op for already-double columns.
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "null_safe_div",
      exprs => NullSafeDiv(Cast(exprs(0), DoubleType), Cast(exprs(1), DoubleType)),
      "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "array_dot", exprs => ArrayFloatDot(exprs(0), exprs(1)), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "simhash64", exprs => SimHash64(exprs.head), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "char_entropy", exprs => CharEntropy(exprs.head), "built-in")
    // Spark's OWN bloom-filter pair (the machinery behind runtime
    // row-level join filtering), shipped in catalyst but not exposed
    // in the public FunctionRegistry — registered here so a query can
    // build an explicit membership sketch as ONE aggregate row and
    // prescreen a scan map-side before an exact join (the
    // text_decontaminate_bloom pattern). The analyzer wraps the
    // AggregateFunction and validates the might_contain input forms
    // (constant or scalar subquery) exactly as for built-ins.
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "bloom_agg",
      exprs => new org.apache.spark.sql.catalyst.expressions.aggregate
        .BloomFilterAggregate(exprs(0), exprs(1), exprs(2)),
      "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "bloom_might_contain",
      exprs => org.apache.spark.sql.catalyst.expressions
        .BloomFilterMightContain(exprs(0), exprs(1)),
      "built-in")
  }
}
