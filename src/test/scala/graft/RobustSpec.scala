package graft

import org.apache.spark.sql.Row

/** Family X invariants (IQR fences / Gini coefficient / MAD). Value
  * equality is the driver's DuckDB gate; these pin the math and plan
  * shapes.
  */
class RobustSpec extends GraftSpec {

  private def plan(name: String): String =
    q(name).queryExecution.executedPlan.toString

  private def bd(r: Row, c: String): Double =
    r.getAs[java.math.BigDecimal](c).doubleValue()

  test("win_iqr_outliers: p25 <= p75, flags mutually exclusive, one exchange") {
    val rows = q("win_iqr_outliers").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(bd(r, "p25_v") <= bd(r, "p75_v"))
      assert(!(r.getAs[Boolean]("is_low") && r.getAs[Boolean]("is_high")))
      assert(r.getAs[Long]("n") >= 1 && r.getAs[Long]("n") <= 21)
    }
    assert(rows.exists(r => r.getAs[Boolean]("is_low") || r.getAs[Boolean]("is_high")),
      "sf0.001 series should contain at least one fence breach")
    assert(plan("win_iqr_outliers").split("Exchange hashpartitioning").length - 1 == 1)
  }

  test("agg_gini_coef lies in [0, 1) and uniform-ish classes are far from 1") {
    val rows = q("agg_gini_coef").collect()
    assert(rows.length == 5)
    rows.foreach { r =>
      val g = bd(r, "gini")
      assert(g >= 0.0 && g < 1.0, s"gini out of range: $g")
    }
  }

  test("agg_gini_coef rank window and aggregation share one exchange") {
    assert(plan("agg_gini_coef").split("Exchange hashpartitioning").length - 1 == 1)
  }

  test("ts_mad equals a driver-side replay of the discrete definition") {
    val ev = Tables.load(spark, sf, "events")
      .selectExpr("event_type", "event_id", "CAST(round(value * 100) AS BIGINT) AS q")
      .collect()
    def discMedian(xs: Seq[(Long, Long)]): Long = { // (value, tiebreak id)
      val sorted = xs.sortBy(identity).map(_._1)
      sorted((sorted.length + 1) / 2 - 1)
    }
    val expected = ev.groupBy(_.getAs[String]("event_type")).map { case (t, g) =>
      val qs = g.map(r => (r.getAs[Long]("q"), r.getAs[Long]("event_id"))).toSeq
      val med = discMedian(qs)
      val devs = g.map(r => (math.abs(r.getAs[Long]("q") - med), r.getAs[Long]("event_id"))).toSeq
      t -> ((med, discMedian(devs)))
    }
    q("ts_mad").collect().foreach { r =>
      val t = r.getAs[String]("event_type")
      assert(math.abs(bd(r, "median_v") * 100 - expected(t)._1) < 0.5, s"median wrong for $t")
      assert(math.abs(bd(r, "mad_v") * 100 - expected(t)._2) < 0.5, s"mad wrong for $t")
    }
  }

  // Round 17: agg_weighted_median pre-aggregates per (flag, v) before
  // the RANGE-frame cumulative (the 3-partition window serialized the
  // whole table — guide §2.5). This pins the rewrite against the
  // original row-level formulation: the RANGE frame groups tied v, so
  // both compute cw(v) = Σ weight at values ≤ v and the same selection.
  test("agg_weighted_median pre-aggregated rewrite equals the row-level window formulation") {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.expressions.Window
    val b = Tables.load(spark, sf, "lineitem").select(
      col("l_returnflag").as("flag"),
      Tables.dec(col("l_extendedprice")).as("v"),
      col("l_quantity").cast("bigint").as("wt"))
    val cum = Window.partitionBy("flag").orderBy("v")
      .rangeBetween(Window.unboundedPreceding, Window.currentRow)
    val rowLevel = b.withColumn("cw", sum(col("wt")).over(cum))
      .withColumn("tot", sum(col("wt")).over(Window.partitionBy("flag")))
      .filter(lit(2) * col("cw") >= col("tot"))
      .groupBy("flag")
      .agg(min(col("v")).as("wmedian"), max(col("tot")).cast("bigint").as("wt_total"))
      .collect().map(r => (r.getString(0),
        r.getDecimal(1).toPlainString, r.getLong(2))).toSet
    val shipped = q("agg_weighted_median").collect().map(r => (r.getString(0),
      r.getDecimal(1).toPlainString, r.getLong(2))).toSet
    assert(shipped == rowLevel, s"shipped=$shipped rowLevel=$rowLevel")
  }
}
