package graft

import org.apache.spark.sql.Row

/** Family T invariants (moments / impurity / encoders / interleave /
  * n-grams / quantified subqueries / centroids / CUSUM). Value
  * equality is the driver's DuckDB gate; these pin the math and the
  * plan shapes the 100 TB design depends on.
  */
class FeatureSpec extends GraftSpec {

  private def plan(name: String): String =
    q(name).queryExecution.executedPlan.toString

  private def bd(r: Row, c: String): Double =
    r.getAs[java.math.BigDecimal](c).doubleValue()

  test("agg_skew_kurt moments are finite and kurtosis respects the skew bound") {
    val rows = q("agg_skew_kurt").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (sk, ku) = (bd(r, "skew"), bd(r, "kurt"))
      assert(!sk.isNaN && !ku.isNaN)
      // g2 >= g1^2 - 2 holds for every distribution (Pearson inequality)
      assert(ku >= sk * sk - 2.0 - 1e-6, s"impossible moment pair ($sk, $ku)")
      assert(bd(r, "mean_v") > 0.0)
    }
  }

  test("agg_skew_kurt is one partial-aggregated exchange") {
    val p = plan("agg_skew_kurt")
    assert(p.split("Exchange hashpartitioning").length - 1 == 1)
    // partial aggregation before the shuffle: sums travel, not rows
    assert(p.contains("HashAggregate"))
  }

  test("dq_gini: impurity in [0,1), one-value columns at 0, distinct counts sane") {
    val rows = q("dq_gini").collect().map { r =>
      r.getAs[String]("col_name") ->
        ((r.getAs[Long]("n"), r.getAs[Long]("n_distinct"), bd(r, "gini")))
    }.toMap
    assert(rows.keySet == Set("o_orderstatus", "o_orderpriority", "o_custkey"))
    rows.values.foreach { case (n, k, g) =>
      assert(g >= 0.0 && g < 1.0)
      assert(k >= 1 && k <= n)
      // Gini upper bound for k categories: 1 - 1/k
      assert(g <= 1.0 - 1.0 / k + 1e-9)
    }
    // high-cardinality key column must be closer to 1 than the status flag
    assert(rows("o_custkey")._3 > rows("o_orderstatus")._3)
  }

  test("ts_autocorr is a valid correlation and reuses the window exchange") {
    val rows = q("ts_autocorr").collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(math.abs(bd(r, "r1")) <= 1.0 + 1e-9))
    // lag window and groupBy share ONE event_type hash exchange
    assert(plan("ts_autocorr").split("Exchange hashpartitioning").length - 1 == 1)
  }

  test("encode_onehot assigns dense alphabetical indices and unique bits") {
    val rows = q("encode_onehot").collect()
    val dict = rows.map(r => (r.getAs[String]("lang"), r.getAs[Long]("lang_idx")))
      .distinct.sortBy(_._1)
    assert(dict.map(_._2).toSeq == dict.indices.map(_.toLong),
      s"indices not dense-alphabetical: $dict")
    rows.foreach(r =>
      assert(r.getAs[Long]("onehot") == (1L << r.getAs[Long]("lang_idx"))))
  }

  test("encode_onehot broadcasts the dictionary (fact side never shuffles for the join)") {
    assert(plan("encode_onehot").contains("BroadcastHashJoin"))
  }

  test("encode_target shrinks every category toward the global mean") {
    val rows = q("encode_target").collect()
    val grand = {
      val docs = Tables.load(spark, sf, "documents")
      val r = docs.selectExpr("CAST(sum(n_chars) AS DOUBLE) / count(*) AS m").head()
      r.getAs[Double]("m")
    }
    rows.foreach { r =>
      val (raw, sm) = (bd(r, "raw_mean"), bd(r, "smoothed"))
      // smoothed value lies strictly between the raw mean and the prior
      assert((sm - raw) * (grand - raw) >= 0.0, s"no shrinkage: raw=$raw sm=$sm prior=$grand")
      assert(math.abs(sm - grand) <= math.abs(raw - grand) + 1e-9)
    }
  }

  test("interleave_order: 8 shards, contiguous positions from 1, hash-deterministic") {
    val rows = q("interleave_order").collect()
    val byShard = rows.groupBy(_.getAs[Long]("shard"))
    assert(byShard.keySet.subsetOf((0L until 8L).toSet))
    byShard.foreach { case (_, g) =>
      val pos = g.map(_.getAs[Long]("pos")).sorted
      assert(pos.sameElements(1L to pos.length),
        "positions must be contiguous from 1")
    }
    // determinism: same input -> same manifest
    val again = q("interleave_order").collect()
    assert(rows.map(_.toString).sorted.sameElements(again.map(_.toString).sorted))
  }

  test("text_ngram_profile: trigrams of length 3, ranked by count desc within lang") {
    val rows = q("text_ngram_profile").collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getAs[String]("tg").length == 3))
    rows.groupBy(_.getAs[String]("lang")).foreach { case (lang, g) =>
      val ranked = g.sortBy(_.getAs[Long]("rn"))
      assert(ranked.map(_.getAs[Long]("rn")).toSeq == (1L to ranked.length),
        s"$lang ranks not dense")
      val counts = ranked.map(_.getAs[Long]("c"))
      assert(counts.zip(counts.tail).forall { case (a, b) => a >= b },
        s"$lang counts not descending")
    }
  }

  test("subq_quantified: empty subquery set makes ALL true and ANY false") {
    // sf0.001 has no suppliers with nationkey < 5 represented? Derive the
    // expectation from the data rather than assuming: check consistency
    // against a driver-side min/max of the subquery set.
    val sup = Tables.load(spark, sf, "supplier")
    val sub = sup.filter("s_nationkey < 5")
      .selectExpr("CAST(s_acctbal AS DECIMAL(18,2)) AS b").collect().map(bd(_, "b"))
    val rows = q("subq_quantified").collect()
    rows.foreach { r =>
      val bal = bd(r, "bal")
      val expGtAll = sub.isEmpty || sub.forall(bal > _)
      val expLtAny = sub.nonEmpty && sub.exists(bal < _)
      assert(r.getAs[Boolean]("gt_all") == expGtAll, s"gt_all wrong for bal=$bal")
      assert(r.getAs[Boolean]("lt_any") == expLtAny, s"lt_any wrong for bal=$bal")
    }
  }

  test("embed_centroids covers labels x 64 dims with nonnegative variance") {
    val rows = q("embed_centroids").collect()
    val labels = rows.map(_.getAs[Int]("label")).distinct
    assert(rows.length == labels.length * 64)
    rows.foreach { r =>
      assert(r.getAs[Long]("n") > 0)
      assert(bd(r, "variance") >= -1e-9)
    }
  }

  test("embed_centroids is one (label, dim) exchange after a map-side explode") {
    val p = plan("embed_centroids")
    assert(p.split("Exchange hashpartitioning").length - 1 == 1)
    assert(p.contains("Generate posexplode"), "explode must be map-side, pre-shuffle")
  }

  test("ts_cusum picks the |cusum| argmax (verified against a driver-side replay)") {
    import org.apache.spark.sql.functions._
    val ev = Tables.load(spark, sf, "events")
      .select(col("event_type"), col("ts"), col("event_id"),
        expr("CAST(round(value * 100) AS BIGINT)").as("q"))
      .collect()
    val expected = ev.groupBy(_.getAs[String]("event_type")).map { case (t, g) =>
      val ord = g.sortBy { r =>
        val t = r.getAs[java.time.LocalDateTime]("ts")
        (t.toEpochSecond(java.time.ZoneOffset.UTC) * 1000000000L + t.getNano,
          r.getAs[Long]("event_id"))
      }
      val qs = ord.map(_.getAs[Long]("q"))
      val tot = qs.sum
      val n = qs.length.toLong
      val cusums = qs.scanLeft(0L)(_ + _).tail.zipWithIndex.map { case (run, i) =>
        (i + 1L, BigInt(n) * BigInt(run) - BigInt(i + 1L) * BigInt(tot))
      }
      val best = cusums.minBy { case (rn, c) => (-c.abs, rn) }
      t -> best._1
    }
    q("ts_cusum").collect().foreach { r =>
      val t = r.getAs[String]("event_type")
      assert(r.getAs[Long]("cp_rn") == expected(t), s"wrong changepoint for $t")
    }
  }

  test("ts_cusum shares one event_type exchange across all window passes") {
    assert(plan("ts_cusum").split("Exchange hashpartitioning").length - 1 == 1)
  }

  test("encode_hashing_trick matches a driver md5 recomputation") {
    import org.apache.spark.sql.functions._
    val out = q("encode_hashing_trick").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(out.nonEmpty)
    assert(out.keys.forall { case (_, b) => b >= 0 && b < 1024 })
    assert(out.values.forall(_ != 0L), "exact zero features must drop")
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map(b => f"$b%02x").mkString
    val truth = Tables.load(spark, sf, "documents")
      .filter(col("text").isNotNull)
      .select("doc_id", "text").collect() // test-sized reference model
      .flatMap { r =>
        r.getString(1).split(" ").filter(_.nonEmpty).map { w =>
          val h = md5hex(w)
          val b = java.lang.Long.parseLong(h.take(8), 16) % 1024
          val sgn = if (h.charAt(8) < '8') 1L else -1L
          (r.getLong(0), b) -> sgn
        }
      }.groupBy(_._1).view.mapValues(_.map(_._2).sum)
      .filter(_._2 != 0L).toMap
    assert(out == truth,
      s"feature maps diverge: ${out.size} vs ${truth.size} cells")
  }
}
