package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** `array_dot(a, b)` — dot product of two float arrays accumulated in
  * double, as a whole-stage-codegen'd Catalyst expression.
  *
  * This is the SURVEY §4 "custom needed: cosine over float arrays"
  * case: the composable formulation
  * `aggregate(zip_with(a, b, (x, y) -> double(x)*double(y)), 0D, +)`
  * is semantically identical but runs as interpreted lambda calls —
  * ~50× slower on the 2M-pair sf0.1 near-dup join. The accumulation
  * order (sequential by index, each float widened to double before the
  * multiply) matches the HOF formulation and DuckDB's
  * list_cosine_similarity loop, so 6-dp-rounded results are unchanged.
  *
  * Null semantics mirror the HOF formulation EXACTLY (so
  * [[graft.plans.DotProductFusion]] is a pure optimization): length
  * mismatch → zip_with pads with null → sum is null; any null element
  * → null. Dense same-length arrays (the embeddings case) never hit
  * either branch.
  */
case class ArrayFloatDot(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "array_dot"

  // Strict element-type contract: ArrayData.getFloat reads with a
  // 4-byte stride, so an array<double> input would silently produce
  // garbage instead of failing — reject it at analysis time.
  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(FloatType, _) => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (array<float>, array<float>), got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }

  override def nullable: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    var s = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      s += x.getFloat(i).toDouble * y.getFloat(i).toDouble
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("sum")
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $s = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    $s += ((double) $a.getFloat($i)) * ((double) $b.getFloat($i));
         |  }
         |  if (!${ev.isNull}) ${ev.value} = $s;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
