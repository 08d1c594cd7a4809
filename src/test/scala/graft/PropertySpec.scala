package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property-based laws (SURVEY §5): null semantics, set-op bag/set
  * laws, window-frame invariants — checked over scalacheck-generated
  * micro-tables (sampled with fixed seeds; no scalatestplus bridge in
  * the offline cache, so sampling is driven manually).
  */
class PropertySpec extends GraftSpec {

  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(i.toLong)))

  private val smallInts: Gen[List[Option[Int]]] =
    Gen.listOfN(12, Gen.option(Gen.choose(0, 5)))

  test("null-safe equality is reflexive even on NULL (<=> vs =)") {
    import spark.implicits._
    samples(smallInts, 20).foreach { xs =>
      val df = xs.toDF("x")
      val n = df.count()
      assert(df.filter(col("x") <=> col("x")).count() === n)
      val nulls = xs.count(_.isEmpty)
      assert(df.filter(col("x") === col("x")).count() === n - nulls)
    }
  }

  test("union_all count = sum of counts; intersectAll/exceptAll bag laws") {
    import spark.implicits._
    samples(Gen.zip(smallInts, smallInts), 20).foreach { case (xs, ys) =>
      val a = xs.flatten.toDF("x")
      val b = ys.flatten.toDF("x")
      assert(a.union(b).count() === a.count() + b.count())
      val i = a.intersectAll(b).count()
      assert(i <= a.count() && i <= b.count())
      assert(a.exceptAll(b).count() === a.count() - i)
    }
  }

  test("running-sum window: last row per group equals the group total") {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val gen = Gen.nonEmptyListOf(Gen.zip(Gen.choose(0, 3), Gen.choose(1, 100)))
    samples(gen, 20).foreach { rows =>
      val df = rows.zipWithIndex.map { case ((g, v), i) => (g, i.toLong, v.toLong) }
        .toDF("g", "id", "v")
      val w = Window.partitionBy("g").orderBy("id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val last = df.withColumn("run", sum(col("v")).over(w))
        .groupBy("g").agg(max(struct(col("id"), col("run"))).as("m"))
        .select(col("g"), col("m.run").as("run"))
      val totals = df.groupBy("g").agg(sum(col("v")).as("total"))
      val joined = last.join(totals, "g")
      assert(joined.filter(col("run") =!= col("total")).count() === 0L)
    }
  }

  test("dedup_exact fixpoint: applying distinct twice changes nothing") {
    val once = q("dedup_exact")
    assert(once.distinct().count() === once.count())
  }

  test("cosinePairsBlocked is complete: equals brute force on random unit vectors") {
    import spark.implicits._
    graft.functions.GraftFunctions.register(spark)
    val rnd = new scala.util.Random(7)
    // 3 random corpora, including low dims where cells actually spread
    Seq(2, 4, 8).foreach { dim =>
      val vecs = (1L to 60L).map { id =>
        val raw = Array.fill(dim)(rnd.nextGaussian().toFloat)
        val n = math.sqrt(raw.map(x => x.toDouble * x).sum)
        (id, raw.map(x => (x / n).toFloat))
      }
      val df = vecs.toDF("vid", "v")
      val blocked = graft.api.GraftOps.cosinePairsBlocked(df, "vid", "v", minCos = 0.6)
        .select("a_id", "b_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      // brute force in Scala with the same double accumulation + 6dp rounding
      val brute = (for {
        (a, va) <- vecs; (b, vb) <- vecs if a < b
        dot = va.zip(vb).map { case (x, y) => x.toDouble * y.toDouble }.sum
        na = math.sqrt(va.map(x => x.toDouble * x).sum)
        nb = math.sqrt(vb.map(x => x.toDouble * x).sum)
        cos = BigDecimal(dot / (na * nb)).setScale(6, BigDecimal.RoundingMode.HALF_UP)
        if cos >= BigDecimal("0.6")
      } yield (a, b)).toSet
      assert(blocked === brute, s"dim=$dim: missing ${brute -- blocked}, extra ${blocked -- brute}")
    }
  }

  test("containmentPairs pre-filter never changes the result (vs reference semantics)") {
    import spark.implicits._
    // The round-8 upper-bound pre-filter (shared_rare + min common
    // counts) must be INVISIBLE: on random overlapping corpora the
    // operator's output must equal the reference formulation —
    // candidates = pairs sharing a rare (1 < df <= maxDf) shingle,
    // verified on exact containment — computed brute-force in Scala.
    val rnd = new scala.util.Random(11)
    val vocab = Array("red", "blue", "green", "gold", "iron", "wolf", "moon", "star")
    (0 until 6).foreach { round =>
      val maxDf = 2 + round % 3 // 2..4: exercises the common-shingle counts
      val thr = if (round % 2 == 0) 0.8 else 0.5
      val docs = (1L to 25L).map { id =>
        val n = 3 + rnd.nextInt(10)
        (id, Array.fill(n)(vocab(rnd.nextInt(vocab.length))).mkString(" "))
      }
      val df = docs.toDF("rid", "body")
      val got = graft.api.GraftOps.containmentPairs(df, "rid", "body",
        minContainment = thr, shingleSize = 3, maxDf = maxDf)
        .collect().map(r => (r.getLong(0), r.getLong(1),
          r.getDecimal(2).stripTrailingZeros)).toSet
      // reference semantics in plain Scala
      def sh(t: String): Set[String] = {
        val w = t.split(" ")
        (0 to math.max(w.length - 3, 0)).map(i => w.slice(i, i + 3).mkString(" ")).toSet
      }
      val sets = docs.map { case (id, t) => id -> sh(t) }.toMap
      val dfCount = sets.values.flatten.groupBy(identity).map { case (s, xs) => s -> xs.size }
      val rare = dfCount.collect { case (s, c) if c > 1 && c <= maxDf => s }.toSet
      val want = (for {
        (a, sa) <- sets.toSeq; (b, sb) <- sets.toSeq
        if a < b && (sa & sb).exists(rare)
        cont = (sa & sb).size.toDouble / math.min(sa.size, sb.size)
        if cont >= thr
      } yield (a, b, BigDecimal(cont).setScale(6, BigDecimal.RoundingMode.HALF_UP)
        .bigDecimal.stripTrailingZeros)).toSet
      assert(got === want,
        s"round=$round maxDf=$maxDf thr=$thr: missing ${want -- got}, extra ${got -- want}")
    }
  }

  test("sessionize session ids are dense, 1-based, monotone per key") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    (0 until 5).foreach { trial =>
      val rows = (1L to 50L).map(i => (rnd.nextInt(3).toLong, rnd.nextInt(1000).toLong * 10L, i))
      val out = graft.api.GraftOps.sessionize(rows.toDF("k", "t", "rid"), "k", "t", "rid", gapMicros = 500L)
        .orderBy("k", "t", "rid").collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(3)))
      out.groupBy(_._1).foreach { case (_, grp) =>
        val sess = grp.map(_._3)
        assert(sess.head === 1L)
        // dense + monotone: each id equals previous or previous+1
        sess.sliding(2).foreach { case Array(a, b) => assert(b === a || b === a + 1); case _ => }
        // gap rule: session increments exactly when gap > 500
        grp.sliding(2).foreach {
          case Array((_, t1, s1), (_, t2, s2)) =>
            if (t2 - t1 > 500L) assert(s2 === s1 + 1) else assert(s2 === s1)
          case _ =>
        }
      }
    }
  }

  test("windowFunnel depth is monotone in the window size and bounded by steps") {
    import spark.implicits._
    import graft.api.GraftOps
    val gen = Gen.nonEmptyListOf(Gen.zip(
      Gen.choose(0, 2), Gen.oneOf("a", "b", "c"), Gen.choose(0L, 1000L)))
    samples(gen, 15).foreach { rows =>
      val df = rows.map { case (k, ty, ep) => (k.toLong, ty, ep) }.toDF("k", "ty", "ep")
      val steps = Seq("a", "b", "c")
      def depths(win: Long): Map[Long, Long] =
        GraftOps.windowFunnel(df, "k", "ty", "ep", steps, win)
          .collect().map(r => r.getAs[Long]("k") -> r.getAs[Long]("depth")).toMap
      val small = depths(10L)
      val large = depths(2000L)
      assert(small.keySet == large.keySet, "step-1 population must not depend on the window")
      small.foreach { case (k, d) =>
        assert(d <= large(k), s"depth must be monotone in window size (key $k)")
        assert(d >= 1 && large(k) <= steps.length)
      }
    }
  }

  test("rollingMedian stays within the running min/max of its frame") {
    import spark.implicits._
    import graft.api.GraftOps
    val gen = Gen.nonEmptyListOf(Gen.choose(-100, 100))
    samples(gen, 15).foreach { xs =>
      val df = xs.zipWithIndex
        .map { case (v, i) => (1L, i.toLong, BigDecimal(v)) }.toDF("k", "o", "x")
      val out = GraftOps.rollingMedian(df, "k", Seq(col("o").asc), "x",
        precedingRows = 3, nOut = "n", medOut = "med")
        .orderBy("o").collect()
      val vals = xs.map(BigDecimal(_))
      out.zipWithIndex.foreach { case (r, i) =>
        val frame = vals.slice(math.max(0, i - 3), i + 1)
        val med = BigDecimal(r.getAs[java.math.BigDecimal]("med"))
        assert(med >= frame.min && med <= frame.max)
        assert(frame.contains(med), "discrete median must be an actual frame value")
      }
    }
  }

  test("removeDuplicatedSpans: output words are an ordered subset, counts reconcile") {
    import spark.implicits._
    import graft.api.GraftOps
    // random small docs over a 6-word vocabulary (heavy shingle
    // collisions by construction) — for EVERY doc the cleaned text
    // must be an ordered subsequence of the original and
    // kept + removed must equal the original word count
    val vocab = Vector("w0", "w1", "w2", "w3", "w4", "w5")
    val docGen = Gen.listOfN(8, Gen.chooseNum(2, 12).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf(vocab)).map(_.mkString(" "))))
    samples(docGen, 10).foreach { texts =>
      val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("rid", "body")
      val out = GraftOps.removeDuplicatedSpans(df, "rid", "body", k = 3)
        .collect().map(r => r.getLong(0) -> (r.getString(1), r.getLong(2))).toMap
      texts.zipWithIndex.foreach { case (t, i) =>
        val orig = t.split(" ").toSeq
        val (clean, removed) = out(i.toLong)
        val cleanWords = if (clean.isEmpty) Seq.empty else clean.split(" ").toSeq
        assert(cleanWords.size + removed === orig.size, s"doc $i count reconcile")
        // ordered-subsequence check
        var oi = 0
        cleanWords.foreach { w =>
          val at = orig.indexOf(w, oi)
          assert(at >= 0, s"doc $i: '$w' out of order or absent")
          oi = at + 1
        }
      }
    }
  }

  test("increasingStreaks: n_up equals the pairwise up-step count, max <= n_up") {
    import spark.implicits._
    import graft.api.GraftOps
    val gen = Gen.nonEmptyListOf(Gen.choose(0, 20))
    samples(gen, 15).foreach { xs =>
      val df = xs.zipWithIndex
        .map { case (v, i) => (1L, i.toLong, BigDecimal(v)) }.toDF("k", "o", "x")
      val r = GraftOps.increasingStreaks(df, "k", Seq(col("o").asc), "x").head()
      val ups = xs.sliding(2).count { case Seq(a, b) => b > a; case _ => false }
      assert(r.getAs[Long]("n_up") === ups.toLong)
      assert(r.getAs[Long]("max_streak") <= r.getAs[Long]("n_up"))
    }
  }
}
