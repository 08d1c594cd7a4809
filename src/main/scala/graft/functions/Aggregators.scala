package graft.functions

import java.math.{BigDecimal => JBigDecimal, RoundingMode}

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed custom aggregates (SURVEY.md §2 J2/J3).
  *
  * Both accumulate in exact java BigDecimal (mirroring the engine-wide
  * decimal recipe, SURVEY §7.4.2) so partial aggregation + merge is
  * associative and shuffle-order-independent — the property any
  * 100 TB-scale aggregate must have. The double conversion happens
  * once, in finish().
  */
object Aggregators {

  /** CAST(x AS DECIMAL(18,2)) equivalent on the JVM side. */
  private def d2(x: Double): JBigDecimal =
    JBigDecimal.valueOf(x).setScale(2, RoundingMode.HALF_UP)

  case class WAvgBuf(num: JBigDecimal, den: JBigDecimal)

  /** J2: quantity-weighted average price: sum(p*q)/sum(q), exact until
    * the final double division.
    */
  object WeightedAvg extends Aggregator[(Double, Double), WAvgBuf, Double] {
    override def zero: WAvgBuf = WAvgBuf(JBigDecimal.ZERO, JBigDecimal.ZERO)
    override def reduce(b: WAvgBuf, in: (Double, Double)): WAvgBuf =
      WAvgBuf(b.num.add(d2(in._1).multiply(d2(in._2))), b.den.add(d2(in._2)))
    override def merge(a: WAvgBuf, b: WAvgBuf): WAvgBuf =
      WAvgBuf(a.num.add(b.num), a.den.add(b.den))
    override def finish(b: WAvgBuf): Double =
      if (b.den.signum == 0) 0.0 else b.num.doubleValue / b.den.doubleValue
    override def bufferEncoder: Encoder[WAvgBuf] = Encoders.product[WAvgBuf]
    override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
  }

  case class VarBuf(n: Long, sum: JBigDecimal, sumSq: JBigDecimal)

  /** J3: sample variance from exact decimal moments — a mergeable
    * sketch-style buffer (count, Σx, Σx²). The closed form
    * (Σx² − (Σx)²/n)/(n−1) is evaluated in double with the same
    * operation order as the SQL oracle twin.
    */
  object ExactVariance extends Aggregator[Double, VarBuf, Double] {
    override def zero: VarBuf = VarBuf(0L, JBigDecimal.ZERO, JBigDecimal.ZERO)
    override def reduce(b: VarBuf, x: Double): VarBuf = {
      val d = d2(x)
      VarBuf(b.n + 1, b.sum.add(d), b.sumSq.add(d.multiply(d)))
    }
    override def merge(a: VarBuf, b: VarBuf): VarBuf =
      VarBuf(a.n + b.n, a.sum.add(b.sum), a.sumSq.add(b.sumSq))
    override def finish(b: VarBuf): Double =
      if (b.n < 2) Double.NaN
      else {
        val s = b.sum.doubleValue
        (b.sumSq.doubleValue - s * s / b.n) / (b.n - 1)
      }
    override def bufferEncoder: Encoder[VarBuf] = Encoders.product[VarBuf]
    override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
  }

  /** Per-group BLOOM filter of a string column — the publish-time
    * index build behind CommitLog.writeBloomStats. The buffer is
    * Spark's own `util.sketch.BloomFilter` (java-serializable,
    * mergeable when sized identically), so the whole per-unit index
    * of a table builds in ONE grouped pass instead of one job per
    * unit, and the serialized output round-trips through
    * `BloomFilter.readFrom` with the same string hashing the probe's
    * `mightContain` uses.
    */
  class BloomAgg(expectedItems: Long, fpp: Double) extends Aggregator[
      String, org.apache.spark.util.sketch.BloomFilter, Array[Byte]] {
    override def zero: org.apache.spark.util.sketch.BloomFilter =
      org.apache.spark.util.sketch.BloomFilter.create(expectedItems, fpp)
    override def reduce(b: org.apache.spark.util.sketch.BloomFilter,
        s: String): org.apache.spark.util.sketch.BloomFilter = {
      if (s != null) b.putString(s)
      b
    }
    override def merge(a: org.apache.spark.util.sketch.BloomFilter,
        b: org.apache.spark.util.sketch.BloomFilter)
        : org.apache.spark.util.sketch.BloomFilter = {
      a.mergeInPlace(b); a
    }
    override def finish(b: org.apache.spark.util.sketch.BloomFilter)
        : Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream()
      b.writeTo(bos)
      bos.toByteArray
    }
    override def bufferEncoder
        : Encoder[org.apache.spark.util.sketch.BloomFilter] =
      Encoders.javaSerialization[org.apache.spark.util.sketch.BloomFilter]
    override def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
  }
}
