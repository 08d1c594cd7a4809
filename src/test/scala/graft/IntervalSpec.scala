package graft

import org.apache.spark.sql.functions._

/** Family Y invariants (sweep-line concurrency / gap stats /
  * co-occurrence / partition overwrite). Value equality is the
  * driver's DuckDB gate; these pin the math and plan shapes.
  */
class IntervalSpec extends GraftSpec {

  private def plan(name: String): String =
    q(name).queryExecution.executedPlan.toString

  test("ts_concurrency: max >= 1, the sweep shares one event_type exchange") {
    val rows = q("ts_concurrency").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("max_conc") >= 1L)
      assert(r.getAs[Long]("at_us") > 0L)
    }
    assert(plan("ts_concurrency").split("Exchange hashpartitioning").length - 1 == 1)
  }

  test("ts_concurrency matches a driver-side sweep replay") {
    val ev = Tables.load(spark, sf, "events")
      .selectExpr("event_type", "event_id",
        "unix_micros(cast(ts as timestamp)) AS t0",
        "unix_micros(cast(ts as timestamp)) + CAST(round(value * 100) AS BIGINT) * 10000 AS t1")
      .collect()
    val expected = ev.groupBy(_.getAs[String]("event_type")).map { case (t, g) =>
      val bounds = g.flatMap(r => Seq(
        (r.getAs[Long]("t0"), 1L, r.getAs[Long]("event_id")),
        (r.getAs[Long]("t1"), -1L, r.getAs[Long]("event_id")))).sortBy(identity)
      var c = 0L; var best = Long.MinValue
      bounds.foreach { case (_, d, _) => c += d; best = math.max(best, c) }
      t -> best
    }
    q("ts_concurrency").collect().foreach { r =>
      assert(r.getAs[Long]("max_conc") == expected(r.getAs[String]("event_type")))
    }
  }

  test("ts_gap_stats: p50 <= max, positive gaps, floor-scaled mean consistent") {
    val rows = q("ts_gap_stats").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (n, avgK, mx, p50) = (r.getAs[Long]("n_gaps"), r.getAs[Long]("avg_gap_us_x1000"),
        r.getAs[Long]("max_gap_us"), r.getAs[Long]("p50_gap_us"))
      assert(n >= 1 && p50 <= mx)
      assert(avgK >= 0 && avgK <= mx * 1000, "floor-scaled mean must stay within [0, max]")
    }
  }

  test("text_cooccurrence: 5 ranked pairs per distance, counts descending") {
    val rows = q("text_cooccurrence").collect()
    assert(rows.map(_.getAs[Long]("dist")).distinct.sorted.toSeq == Seq(1L, 2L))
    rows.groupBy(_.getAs[Long]("dist")).foreach { case (_, g) =>
      val counts = g.sortBy(_.getAs[Long]("rn")).map(_.getAs[Long]("c"))
      assert(counts.zip(counts.tail).forall { case (a, b) => a >= b })
      assert(g.length == 5)
    }
  }

  test("dml_partition_overwrite: only the target partition changed") {
    import org.apache.spark.sql.types.DecimalType
    val base = Tables.load(spark, sf, "orders")
      .select(col("o_orderkey").as("k0"), col("o_totalprice").cast(DecimalType(18, 2)).as("p0"))
    val got = q("dml_partition_overwrite")
    val joined = got.join(base, col("o_orderkey") === col("k0")).collect()
    assert(joined.nonEmpty)
    joined.foreach { r =>
      val (pr, p, p0) = (r.getAs[String]("o_orderpriority"),
        r.getAs[java.math.BigDecimal]("price"), r.getAs[java.math.BigDecimal]("p0"))
      if (pr == "1-URGENT")
        assert(p.subtract(p0).compareTo(java.math.BigDecimal.TEN) == 0, s"backfill missed key")
      else assert(p.compareTo(p0) == 0, s"non-target partition mutated")
    }
  }

  test("interval_merge replays correctly against a driver-side sweep") {
    import org.apache.spark.sql.functions._
    val iv = Tables.load(spark, sf, "events")
      .select(col("user_id"), col("event_id"),
        expr("unix_micros(cast(ts as timestamp))").as("t0"),
        expr("unix_micros(cast(ts as timestamp)) + CAST(round(value * 100) AS BIGINT) * 10000").as("t1"))
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getLong(3)))
    val expected = iv.groupBy(_._1).map { case (u, rows) =>
      val sorted = rows.map(t => (t._2, t._3)).sortBy(identity)
      // linear sweep: extend the open island or open a new one
      var islands = List.empty[(Long, Long)]
      sorted.foreach { case (s0, e0) =>
        islands match {
          case (i0, i1) :: rest if s0 <= i1 => islands = (i0, math.max(i1, e0)) :: rest
          case _ => islands = (s0, e0) :: islands
        }
      }
      u -> (rows.length.toLong, islands.length.toLong,
        islands.map(i => i._2 - i._1).sum, islands.map(i => i._2 - i._1).max)
    }
    val out = q("interval_merge").collect()
    assert(out.length == expected.size)
    out.foreach { r =>
      val (n, k, cov, mx) = expected(r.getLong(0))
      assert(r.getLong(1) == n && r.getLong(2) == k &&
        r.getLong(3) == cov && r.getLong(4) == mx,
        s"island mismatch for user ${r.getLong(0)}")
    }
  }

  test("interval_merge rides one user_id exchange for windows and rollups") {
    val df = q("interval_merge")
    df.collect()
    // AQE's toString renders Final AND Initial plans — count only the
    // final one or every exchange is double-counted.
    val full = df.queryExecution.executedPlan.toString
    val plan = full.split("== Initial Plan ==").head
    val hashEx = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(hashEx == 1, s"expected one hash exchange, found $hashEx:\n${plan.take(1500)}")
  }
}
