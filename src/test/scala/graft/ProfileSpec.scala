package graft

/** Family R invariants (profiling / drawdown / LM scoring / Holt).
  * Value equality is the driver's DuckDB gate; these pin the math and
  * the single-shuffle plan shapes.
  */
class ProfileSpec extends GraftSpec {

  private def plan(name: String): String =
    q(name).queryExecution.executedPlan.toString

  test("dq_profile profiles every column over the full row count") {
    val rows = q("dq_profile").collect()
    assert(rows.map(_.getAs[String]("col_name")).sorted.toSeq ==
      Seq("o_custkey", "o_orderpriority", "o_orderstatus", "o_totalprice"))
    val n = Tables.load(spark, sf, "orders").count()
    rows.foreach { r =>
      assert(r.getAs[Long]("n") == n)
      assert(r.getAs[Long]("n_null") == 0L)
      assert(r.getAs[Long]("n_distinct") <= n)
      assert(r.getAs[String]("min_v") <= r.getAs[String]("max_v"))
    }
  }

  test("win_drawdown never reports equity above the running peak") {
    val rows = q("win_drawdown").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[java.math.BigDecimal]("equity")
        .compareTo(r.getAs[java.math.BigDecimal]("peak")) <= 0)
      assert(r.getAs[Double]("dd") >= 0.0)
      Option(r.getAs[java.lang.Double]("dd_frac")).foreach { f =>
        assert(f >= 0.0 && f <= 1.0)
      }
    }
  }

  test("win_drawdown shares one hash exchange across both windows") {
    val hashExchanges = plan("win_drawdown")
      .split("Exchange hashpartitioning").length - 1
    assert(hashExchanges == 1, s"got $hashExchanges hash exchanges")
  }

  test("text_lm_score scores are valid quantized probability means") {
    val rows = q("text_lm_score").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (nb, qs, score) = (r.getAs[Long]("n_bigrams"),
        r.getAs[Long]("q_sum"), r.getAs[Double]("lm_score"))
      assert(qs >= 0L && qs <= 1000000L * nb)
      assert(score > 0.0 && score <= 1.0)
      assert(math.abs(score - qs.toDouble / (1e6 * nb.toDouble)) == 0.0)
    }
  }

  test("ts_holt initializes level to the first observation, trend to zero") {
    val firsts = q("ts_holt").collect().filter(_.getAs[Long]("rn") == 1L)
    assert(firsts.nonEmpty)
    firsts.foreach { r =>
      assert(r.getAs[Double]("trend") == 0.0)
      assert(r.getAs[Double]("forecast") == r.getAs[Double]("level"))
    }
  }

  test("ts_holt forecast is level plus trend on every row") {
    q("ts_holt").collect().foreach { r =>
      assert(r.getAs[Double]("forecast") ==
        r.getAs[Double]("level") + r.getAs[Double]("trend"))
    }
  }
}
