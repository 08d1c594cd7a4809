package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Output canonicalization for the cross-engine correctness gate.
  *
  * The driver reads the Spark dump via pyarrow (DECIMAL →
  * `decimal.Decimal`, str `'138014.00'`) but the DuckDB oracle via
  * `fetchdf` (DECIMAL → float64, str `'138014.0'`), so any DECIMAL
  * column in the final output fails its string-hash compare even when
  * every value is identical; ARRAY/MAP columns crash its row sorter
  * outright (numpy arrays are unhashable). Queries therefore keep
  * decimal-exact arithmetic INTERNALLY (shuffle-order-independent sums,
  * SURVEY §7.4.2) but the verification dump canonicalizes the final
  * projection: DECIMAL → DOUBLE (both engines then render the same
  * float64), ARRAY/MAP → compact JSON text (matched by `to_json` on the
  * DuckDB side where an oracle exists).
  *
  * Library callers are unaffected — this wraps only the [[Verify]]
  * dump, not the public operators.
  */
object Canon {

  private def needsCanon(dt: DataType): Boolean = dt match {
    case _: DecimalType | _: ArrayType | _: MapType | _: StructType => true
    case _ => false
  }

  def canon(df: DataFrame): DataFrame =
    if (!df.schema.fields.exists(f => needsCanon(f.dataType))) df
    else df.select(df.schema.fields.toIndexedSeq.map { f =>
      f.dataType match {
        case _: DecimalType => col(f.name).cast("double").as(f.name)
        // StructType joins ARRAY/MAP here: pyarrow reads a struct column
        // as dicts the driver's row sorter can't order, exactly the way
        // arrays crashed it in round 1. DuckDB twin where an oracle
        // exists: to_json(struct_pack(...)) / CAST(... AS VARCHAR).
        case _: ArrayType | _: MapType | _: StructType =>
          to_json(col(f.name)).as(f.name)
        case _ => col(f.name)
      }
    }: _*)
}
