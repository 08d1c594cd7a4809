package graft

import org.apache.spark.sql.functions._

/** Family P (TPC-H completion) invariants: cross-expression equalities
  * at sf0.001 plus the plan shapes the 100 TB design depends on. The
  * value-level gate is the driver's DuckDB oracle (all 11 oracled).
  */
class TpchSpec extends GraftSpec {

  private def plan(name: String): String =
    q(name).queryExecution.executedPlan.toString

  test("tpch_q1 count_order total equals the filtered lineitem count") {
    val rows = q("tpch_q1").collect()
    assert(rows.nonEmpty)
    val total = rows.map(_.getAs[Long]("count_order")).sum
    val expected = Tables.load(spark, sf, "lineitem")
      .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp")).count()
    assert(total == expected)
  }

  test("tpch_q1 avg_qty is sum_qty / count_order per group") {
    q("tpch_q1").collect().foreach { r =>
      val avg = r.getAs[java.math.BigDecimal]("sum_qty").doubleValue() /
        r.getAs[Long]("count_order").toDouble
      assert(math.abs(avg - r.getAs[Double]("avg_qty")) < 1e-12)
    }
  }

  test("tpch_q6 equals the unaggregated row sum") {
    val rev = q("tpch_q6").collect()(0).getAs[java.math.BigDecimal]("revenue")
    val direct = Tables.load(spark, sf, "lineitem")
      .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp")
        && col("l_shipdate") < lit("1997-01-01").cast("timestamp")
        && col("l_discount") > 0.04 && col("l_discount") < 0.08
        && col("l_quantity") < 24.0)
      .select(Tables.dec(col("l_extendedprice")) * Tables.dec(col("l_discount")))
      .collect().map(_.getDecimal(0).doubleValue()).sum
    assert(math.abs(rev.doubleValue() - direct) < 1e-6)
  }

  test("tpch_q15 returns only suppliers at the exact max revenue") {
    val rows = q("tpch_q15").collect()
    assert(rows.nonEmpty)
    val revs = rows.map(_.getAs[java.math.BigDecimal]("total_revenue")).distinct
    assert(revs.length == 1, "all winners must share the max revenue")
  }

  test("tpch_q13 custdist sums to the customer count (left join keeps zeros)") {
    val total = q("tpch_q13").collect().map(_.getAs[Long]("custdist")).sum
    assert(total == Tables.load(spark, sf, "customer").count())
  }

  test("tpch_q8 market share is a valid fraction of total revenue") {
    q("tpch_q8").collect().foreach { r =>
      val share = r.getAs[Double]("mkt_share")
      assert(share >= 0.0 && share <= 1.0)
      assert(r.getAs[java.math.BigDecimal]("nation_rev")
        .compareTo(r.getAs[java.math.BigDecimal]("total_rev")) <= 0)
    }
  }

  test("tpch_q21 waits are positive and sorted descending") {
    val waits = q("tpch_q21").collect().map(_.getAs[Long]("numwait"))
    assert(waits.forall(_ >= 1))
    assert(waits.sameElements(waits.sorted(Ordering[Long].reverse)))
  }

  test("tpch_q4 runs as a left-semi join (no lineitem materialization)") {
    assert(plan("tpch_q4").contains("LeftSemi"), plan("tpch_q4").take(1500))
  }

  test("tpch_q8/q19 broadcast every dimension") {
    assert(plan("tpch_q8").split("BroadcastHashJoin").length - 1 >= 3,
      "q8 should broadcast part/customer/supplier dims")
    assert(plan("tpch_q19").contains("BroadcastHashJoin"))
  }

  test("tpch_q21 profile avoids Expand (two-level agg, not countDistinct)") {
    assert(!plan("tpch_q21").contains("Expand"), plan("tpch_q21").take(2000))
  }

  test("tpch_q15 scalar max is a broadcast, not a global window") {
    val p = plan("tpch_q15")
    assert(!p.contains("Window"), "q15 must not sort all suppliers in one window")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastExchange"))
  }

  test("tpch_q1 pushes the shipdate filter into the scan") {
    assert(plan("tpch_q1").contains("PushedFilters: [IsNotNull(l_shipdate)")
      || plan("tpch_q1").contains("l_shipdate"), plan("tpch_q1").take(1200))
  }

  test("tpch_q22 anti-join keeps only customers without recent orders") {
    assert(plan("tpch_q22").contains("LeftAnti"))
  }
}
