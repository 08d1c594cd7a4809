package graft

import org.apache.spark.sql.functions._

/** Family S invariants (calendar spine / rolling trend / CDC apply /
  * Z-order). Value equality is the driver's DuckDB gate.
  */
class LakehouseSpec extends GraftSpec {

  test("ts_calendar spine is gap-free and conserves the order count") {
    val rows = q("ts_calendar").collect()
    assert(rows.nonEmpty)
    val days = rows.map(_.getAs[java.sql.Date]("day").toLocalDate)
    days.sliding(2).foreach { w =>
      assert(w(1) == w(0).plusDays(1), s"calendar gap between ${w(0)} and ${w(1)}")
    }
    assert(rows.map(_.getAs[Long]("n_orders")).sum ==
      Tables.load(spark, sf, "orders").count())
    assert(rows.forall { r =>
      val dw = r.getAs[Long]("isodow"); dw >= 1 && dw <= 7
    })
  }

  test("ts_trend frame sums cap at 21 rows and gate the slope at 10") {
    val rows = q("ts_trend").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val n = r.getAs[Long]("n")
      assert(n >= 1 && n <= 21)
      if (n < 10) assert(r.isNullAt(r.fieldIndex("slope")))
      else assert(!r.isNullAt(r.fieldIndex("slope")))
    }
  }

  test("dml_cdc_apply resolves tombstones, updates, and inserts correctly") {
    val rows = q("dml_cdc_apply").collect()
    assert(rows.nonEmpty)
    val base = Tables.load(spark, sf, "orders")
      .select(col("o_orderkey"), col("o_totalprice")).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(rows.forall(_.getAs[Long]("o_orderkey") % 4 != 0), "deletes must drop out")
    rows.foreach { r =>
      val k = r.getAs[Long]("o_orderkey")
      val price = r.getAs[java.math.BigDecimal]("price").doubleValue()
      if (k % 4 == 1) {
        assert(r.getAs[String]("last_op") == "U")
        assert(math.abs(price - 2 * base(k)) < 1e-6)
      } else {
        assert(r.getAs[String]("last_op") == "I")
        assert(math.abs(price - base(k)) < 1e-6)
      }
    }
    assert(rows.length == base.keys.count(_ % 4 != 0))
  }

  test("sort_zorder buckets partition the rows and localize both dims") {
    val rows = q("sort_zorder").collect()
    assert(rows.length > 1)
    val expected = Tables.load(spark, sf, "orders")
      .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp")
        && col("o_orderdate") < lit("1997-01-01").cast("timestamp")).count()
    assert(rows.map(_.getAs[Long]("n")).sum == expected)
    // locality: the mean per-bucket customer span must be far below the
    // global span — that's the entire point of z-ordering.
    val globalSpan = rows.map(_.getAs[Long]("cust_max")).max -
      rows.map(_.getAs[Long]("cust_min")).min
    val meanSpan = rows.map(r =>
      r.getAs[Long]("cust_max") - r.getAs[Long]("cust_min")).sum.toDouble / rows.length
    assert(meanSpan < globalSpan / 2.0,
      s"z-order shows no customer locality: mean span $meanSpan vs global $globalSpan")
  }

  test("dml_snapshot_diff classifies adds/removes/changes against the synthetic edit") {
    val rows = q("dml_snapshot_diff").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val k = r.getAs[Long]("k")
      r.getAs[String]("change") match {
        case "A" =>
          assert(k >= 1000000000L && (k - 1000000000L) % 11 == 0, s"unexpected add $k")
          assert(r.getAs[java.math.BigDecimal]("old_price") == null)
        case "R" =>
          assert(k % 7 == 0, s"unexpected remove $k")
          assert(r.getAs[java.math.BigDecimal]("new_price") == null)
        case "C" =>
          assert(k % 5 == 0 && k % 7 != 0, s"unexpected change $k")
          assert(r.getAs[java.math.BigDecimal]("new_price")
            .compareTo(r.getAs[java.math.BigDecimal]("old_price")) > 0)
        case other => fail(s"unknown change class $other")
      }
    }
    // one key-keyed join, no other exchange keys
    val p = q("dml_snapshot_diff").queryExecution.executedPlan.toString
    assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin"))
  }
}
