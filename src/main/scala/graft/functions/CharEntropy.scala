package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** `char_entropy(t)` → struct<n_letters: bigint, entropy: double> —
  * the [a-z] Shannon entropy of an (already-lowercased) string in ONE
  * pass over its bytes.
  *
  * Replaces the 26-replace spelling of `text_entropy` (each letter
  * counted as `length(t) - length(replace(t, c, ''))`, i.e. 26 full
  * string scans per row) with a single byte scan: ASCII a-z are
  * single-byte in UTF-8 and no multi-byte lead/continuation byte
  * falls in 0x61-0x7A, so counting bytes equals counting codepoints.
  *
  * ARITHMETIC CONTRACT: bit-identical to the SQL formulation the
  * DuckDB oracle mirrors — the 26 terms are folded in the same fixed
  * a→z order, each as `p * log2(p)` with p = cnt/n in double and
  * log2 = StrictMath.log(x)/StrictMath.log(2.0) (verified equal to
  * Spark's `log2` bit-for-bit), so swapping the spellings changes no
  * output at the 6-dp gate — or anywhere else.
  *
  * CodegenFallback is fine here (the SimHash64 rule): per-row cost is
  * the byte scan itself, not expression dispatch.
  */
case class CharEntropy(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = StructType(Seq(
    StructField("n_letters", LongType, nullable = false),
    StructField("entropy", DoubleType, nullable = false)))
  override def prettyName: String = "char_entropy"
  override def nullable: Boolean = true

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string input, got ${child.dataType.simpleString}")

  private val log2denom = StrictMath.log(2.0)

  override def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[UTF8String].getBytes
    val counts = new Array[Long](26)
    var i = 0
    while (i < bytes.length) {
      val b = bytes(i)
      if (b >= 'a' && b <= 'z') counts(b - 'a') += 1
      i += 1
    }
    var n = 0L
    var c = 0
    while (c < 26) { n += counts(c); c += 1 }
    var sum = 0.0
    if (n > 0L) {
      val nd = n.toDouble
      c = 0
      while (c < 26) {
        if (counts(c) != 0L) {
          val p = counts(c).toDouble / nd
          sum += p * (StrictMath.log(p) / log2denom)
        } else sum += 0.0
        c += 1
      }
    }
    val entropy = if (n == 0L) 0.0 else -sum
    new GenericInternalRow(Array[Any](n, entropy))
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
