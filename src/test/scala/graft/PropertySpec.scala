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
}
