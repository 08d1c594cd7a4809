package graft

import org.apache.spark.sql.Row

/** Family U invariants (ratio analytics / cross-series correlation /
  * readability). Value equality is the driver's DuckDB gate; these
  * pin the math and the plan shapes the 100 TB design depends on.
  */
class AnalyticsSpec extends GraftSpec {

  private def plan(name: String): String =
    q(name).queryExecution.executedPlan.toString

  private def bd(r: Row, c: String): Double =
    r.getAs[java.math.BigDecimal](c).doubleValue()

  test("win_ratio_to_report shares sum to 1 per group and avoid the window funnel") {
    val rows = q("win_ratio_to_report").collect()
    rows.groupBy(_.getAs[String]("o_orderpriority")).foreach { case (p, g) =>
      val mass = g.map(bd(_, "share")).sum
      assert(math.abs(mass - 1.0) < 1e-6, s"priority $p shares sum to $mass")
    }
    // the scale-correct formulation: totals broadcast back, no window
    // partition over the low-cardinality group on the fact table
    val p = plan("win_ratio_to_report")
    assert(p.contains("BroadcastHashJoin"))
    assert(!p.contains("Window"), "ratio-to-report must not window-partition the fact table")
  }

  test("olap_ratio_to_parent: month shares sum to 1 within quarter and year") {
    val rows = q("olap_ratio_to_parent").collect()
    rows.groupBy(r => (r.getAs[Long]("yr"), r.getAs[Long]("qtr"))).foreach { case (k, g) =>
      val mass = g.map(bd(_, "share_of_qtr")).sum
      assert(math.abs(mass - 1.0) < 1e-6, s"quarter $k shares sum to $mass")
    }
    rows.groupBy(_.getAs[Long]("yr")).foreach { case (y, g) =>
      val mass = g.map(bd(_, "share_of_yr")).sum
      assert(math.abs(mass - 1.0) < 1e-6, s"year $y shares sum to $mass")
    }
  }

  test("agg_corr_pairs: valid correlations over all unordered type pairs") {
    val rows = q("agg_corr_pairs").collect()
    val types = Tables.load(spark, sf, "events")
      .select("event_type").distinct().count().toInt
    assert(rows.length == types * (types - 1) / 2, "one row per unordered pair")
    rows.foreach { r =>
      assert(r.getAs[String]("t1") < r.getAs[String]("t2"))
      assert(math.abs(bd(r, "r")) <= 1.0 + 1e-9)
      assert(r.getAs[Long]("n") > 0)
    }
  }

  test("ts_weekday_profile indices average to 1 under the n-weighted mean") {
    val rows = q("ts_weekday_profile").collect()
    rows.groupBy(_.getAs[String]("event_type")).foreach { case (t, g) =>
      assert(g.length <= 7)
      // sum(n_dw * idx) == n_t  <=>  weighted mean of the index is 1
      val nTot = g.map(_.getAs[Long]("n_dw")).sum.toDouble
      val wsum = g.map(r => r.getAs[Long]("n_dw") * bd(r, "idx")).sum
      assert(math.abs(wsum / nTot - 1.0) < 1e-4, s"$t weighted idx mean ${wsum / nTot}")
    }
  }

  test("ts_decompose components reconstruct the series exactly (within rounding)") {
    val rows = q("ts_decompose").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val cnt = r.getAs[Long]("cnt").toDouble
      val recon = bd(r, "trend") + bd(r, "seasonal") + bd(r, "resid")
      // detr and resid each round to 1e-6 before reuse → ≤ 2e-6 drift
      assert(math.abs(recon - cnt) <= 2e-6,
        s"${r.getAs[String]("event_type")} ${r.getAs[java.sql.Date]("day")}: " +
          s"trend+seasonal+resid = $recon vs cnt = $cnt")
    }
    // seasonal means of the detrended series must average ~0 per type
    rows.groupBy(_.getAs[String]("event_type")).foreach { case (t, g) =>
      val meanResid = g.map(r => bd(r, "resid")).sum / g.length
      assert(math.abs(meanResid) < 1.0, s"$t mean residual $meanResid")
    }
  }

  test("text_readability equals the exact cross-multiplied formula") {
    val rows = q("text_readability").collect()
    assert(rows.length > 0)
    rows.foreach { r =>
      val (w, s2, v) = (r.getAs[Long]("n_words"), r.getAs[Long]("n_sent"), r.getAs[Long]("n_vg"))
      assert(w > 0 && s2 >= 1)
      val expected = (206835.0 * s2 * w - 1015.0 * w * w - 84600.0 * v * s2) / (1000.0 * s2 * w)
      assert(math.abs(bd(r, "flesch") - expected) < 1e-3)
    }
  }

  test("text_readability is map-only (no exchange except the output sort)") {
    val p = plan("text_readability")
    assert(p.split("Exchange hashpartitioning").length - 1 == 0,
      "readability scoring must not shuffle")
  }

  test("olap_rank_delta: consecutive ranks, non-increasing revenue, consistent deltas") {
    val out = q("olap_rank_delta").collect()
    assert(out.nonEmpty)
    out.groupBy(_.get(0)).foreach { case (mon, rows) =>
      val byRank = rows.sortBy(_.getLong(3))
      assert(byRank.map(_.getLong(3)).toSeq == (1L to byRank.length).toSeq,
        s"ranks not consecutive for $mon")
      val revs = byRank.map(_.getDecimal(2).doubleValue())
      assert(revs.zip(revs.tail).forall { case (a, b) => a >= b },
        s"revenue not non-increasing for $mon")
    }
    out.filter(!_.isNullAt(4)).foreach { r =>
      assert(r.getLong(5) == r.getLong(4) - r.getLong(3), "delta != prev_rnk - rnk")
    }
    assert(out.exists(_.isNullAt(4)), "expected at least one new entrant (null prev_rnk)")
  }

  test("attribution_last_touch replays correctly against a driver-side walk") {
    import org.apache.spark.sql.functions._
    val ev = Tables.load(spark, sf, "events")
      .select(col("user_id"), expr("unix_micros(cast(ts as timestamp))").as("ep"),
        col("event_id"), col("event_type")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    val expected = scala.collection.mutable.Map.empty[String, Long].withDefaultValue(0L)
    ev.groupBy(_._1).foreach { case (_, rows) =>
      var touch: String = null
      rows.sortBy(r => (r._2, r._3)).foreach { case (_, _, _, tpe) =>
        if (tpe == "purchase")
          expected(if (touch == null) "direct" else touch) += 1
        else touch = tpe
      }
    }
    val out = q("attribution_last_touch").collect()
    assert(out.map(_.getLong(1)).sum == ev.count(_._4 == "purchase"),
      "every purchase must be attributed exactly once")
    out.foreach { r =>
      assert(r.getLong(1) == expected(r.getString(0)),
        s"attribution count mismatch for channel ${r.getString(0)}")
    }
    assert(out.map(_.getString(0)).toSet == expected.filter(_._2 > 0).keySet)
  }

  test("eval_forecast matches a brute-force naive-baseline recomputation") {
    import org.apache.spark.sql.functions._
    val hourly = Tables.load(spark, sf, "events")
      .select(col("event_type"),
        date_trunc("hour", col("ts")).cast("string").as("hr"),
        expr("CAST(round(value * 100) AS BIGINT)").as("q"))
      .groupBy("event_type", "hr").agg(sum(col("q")).as("v"))
      .collect() // test-only reference model (hour grain)
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    val rows = q("eval_forecast").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val et = r.getString(0)
      val series = hourly.filter(_._1 == et).sortBy(_._2).map(_._3)
      val res = series.sliding(2).map(p => p(1) - p(0)).toSeq
      val n = res.length.toLong
      assert(r.getLong(1) == n, s"$et n: $r vs $n")
      val mae = res.map(x => math.abs(x).toDouble).sum / n
      val rmse = math.sqrt(res.map(x => x.toDouble * x).sum / n)
      val tail = series.drop(1)
      val sv = tail.map(BigInt(_)).sum
      val svv = tail.map(x => BigInt(x) * BigInt(x)).sum
      val sstot = svv.toDouble - sv.toDouble * sv.toDouble / n
      val r2 = 1.0 - res.map(x => x.toDouble * x).sum / sstot
      assert(math.abs(r.getDecimal(2).doubleValue - mae) < 1e-4,
        s"$et mae: $r vs $mae")
      assert(math.abs(r.getDecimal(3).doubleValue - rmse) < 1e-4,
        s"$et rmse: $r vs $rmse")
      assert(math.abs(r.getDecimal(4).doubleValue - r2) < 1e-4,
        s"$et r2: $r vs $r2")
    }
  }
}
