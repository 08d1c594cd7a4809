package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Cast, Expression, ExpressionInfo}
import org.apache.spark.sql.types.DoubleType
import graft.functions.NullSafeDiv

/** Cluster-deployment entry point: register graft's custom functions
  * at session build time via
  * `--conf spark.sql.extensions=graft.GraftExtensions`
  * (or `SparkSession.builder().withExtensions(new GraftExtensions)`).
  *
  * Equivalent to [[graft.functions.GraftFunctions.register]] but wired
  * through the public SparkSessionExtensions injection API so every
  * session on a cluster — including Thrift/Connect sessions the
  * library never touches directly — sees the functions.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction((
      FunctionIdentifier("null_safe_div"),
      new ExpressionInfo(classOf[NullSafeDiv].getCanonicalName, "null_safe_div"),
      (exprs: Seq[Expression]) =>
        NullSafeDiv(Cast(exprs.head, DoubleType), Cast(exprs(1), DoubleType))))
  }
}
