package graft

/** Family Q invariants (OLS / OHLC / bigram LM / triangles). Value
  * equality is the driver's DuckDB gate; these pin the math and the
  * plan shapes the 100 TB design depends on.
  */
class StatsSpec extends GraftSpec {

  private def plan(name: String): String =
    q(name).queryExecution.executedPlan.toString

  test("agg_regression r2 is a valid coefficient of determination") {
    val rows = q("agg_regression").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val r2 = r.getAs[java.math.BigDecimal]("r2").doubleValue()
      assert(r2 >= 0.0 && r2 <= 1.0, s"r2 out of range: $r2")
    }
  }

  test("ts_ohlc candles are internally consistent (low <= open/close <= high)") {
    val rows = q("ts_ohlc").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (o, h, l, c) = (r.getAs[Double]("open"), r.getAs[Double]("high"),
        r.getAs[Double]("low"), r.getAs[Double]("close"))
      assert(l <= o && o <= h, s"open $o outside [$l, $h]")
      assert(l <= c && c <= h, s"close $c outside [$l, $h]")
      assert(r.getAs[Long]("n") >= 1)
    }
  }

  test("ts_ohlc windows and agg share one hash exchange") {
    val hashExchanges = plan("ts_ohlc")
      .split("Exchange hashpartitioning").length - 1
    assert(hashExchanges == 1,
      s"expected the (type, hour) partitioning to be reused, got $hashExchanges hash exchanges")
  }

  test("text_bigram_lm probabilities are consistent with their counts") {
    val rows = q("text_bigram_lm").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (c2, c1, p) = (r.getAs[Long]("c2"), r.getAs[Long]("c1"),
        r.getAs[Double]("p"))
      assert(c2 <= c1 && c1 >= 20L)
      assert(math.abs(p - c2.toDouble / c1.toDouble) == 0.0)
      assert(r.getAs[Long]("rn") <= 3L)
    }
    // top-3 conditional probabilities per context can never exceed 1
    rows.groupBy(_.getAs[String]("w1")).foreach { case (w1, g) =>
      val mass = g.map(_.getAs[Double]("p")).sum
      assert(mass <= 1.0 + 1e-9, s"context $w1 has probability mass $mass")
    }
  }

  test("graph_triangles vertex incidences sum to a multiple of 3") {
    val total = q("graph_triangles").collect().map(_.getAs[Long]("n_tri")).sum
    assert(total > 0, "sf0.001 similarity graph should contain triangles")
    assert(total % 3 == 0, s"each triangle touches exactly 3 vertices, got $total")
  }

  test("graph_triangles never plans a cartesian product") {
    val p = plan("graph_triangles")
    assert(!p.contains("CartesianProduct"), p.take(2000))
  }

  test("graph_components equals a union-find recomputation") {
    import org.apache.spark.sql.functions._
    val edges = Tables.load(spark, sf, "lineitem")
      .filter(col("l_orderkey") % 40 === 0)
      .select((col("l_orderkey") * 2).as("a"), (col("l_partkey") * 2 + 1).as("b"))
      .distinct().collect() // test-only reference model
      .map(r => (r.getLong(0), r.getLong(1)))
    // plain union-find with path compression — an algorithmically
    // INDEPENDENT path to the same partition as min-label propagation
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val truth = parent.keys.toSeq.groupBy(find)
      .map { case (_, members) =>
        val ms = members.toSet
        ms.min -> (ms.size.toLong,
          ms.count(_ % 2 == 0).toLong, ms.count(_ % 2 == 1).toLong)
      }
    val rows = q("graph_components").collect()
    assert(rows.length == truth.size,
      s"component count: got ${rows.length}, truth ${truth.size}")
    rows.foreach { r =>
      val t = truth(r.getLong(0))
      assert((r.getLong(1), r.getLong(2), r.getLong(3)) == t,
        s"component ${r.getLong(0)}: got $r, truth $t")
    }
  }
}
