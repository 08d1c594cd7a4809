package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.api.GraftOps

/** The custom TopKPerGroup physical operator (plans/TopKPerGroup.scala):
  * semantics pinned against the row_number window formulation, plan
  * shape pinned to partial+final heaps around exactly one exchange,
  * determinism pinned across input partitionings.
  */
class TopKSpec extends GraftSpec {

  private def orders = Tables.load(spark, sf, "orders")
    .select("o_custkey", "o_orderkey", "o_totalprice")

  private def windowTop3 = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
    orders.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3).drop("rn")
  }

  private def sortedRows(df: org.apache.spark.sql.DataFrame): Seq[Row] =
    df.orderBy("o_custkey", "o_orderkey").collect().toSeq

  test("topKPerGroup equals the row_number window formulation bit-for-bit") {
    val custom = GraftOps.topKPerGroup(orders, Seq("o_custkey"),
      Seq(("o_totalprice", true), ("o_orderkey", false)), 3)
    assert(sortedRows(custom) == sortedRows(windowTop3))
  }

  test("plan is partial+final heaps around ONE exchange — no Window, no Sort") {
    val custom = GraftOps.topKPerGroup(orders, Seq("o_custkey"),
      Seq(("o_totalprice", true), ("o_orderkey", false)), 3)
    val plan = custom.queryExecution.executedPlan.toString
    assert(plan.contains("TopKPerGroupPartial"), plan)
    assert(plan.contains("TopKPerGroupFinal"), plan)
    assert(!plan.contains("Window"), s"window crept back in:\n$plan")
    assert(!plan.contains("Sort"), s"full sort crept back in:\n$plan")
    assert("Exchange".r.findAllIn(plan).size == 1,
      s"expected exactly one exchange:\n$plan")
  }

  test("output is invariant to input partitioning (3 vs 11 partitions)") {
    def run(parts: Int) = sortedRows(GraftOps.topKPerGroup(
      orders.repartition(parts), Seq("o_custkey"),
      Seq(("o_totalprice", true), ("o_orderkey", false)), 3))
    assert(run(3) == run(11))
  }

  test("k >= group size returns every row of the group") {
    val custom = GraftOps.topKPerGroup(orders, Seq("o_custkey"),
      Seq(("o_totalprice", true), ("o_orderkey", false)), 1000000)
    assert(custom.count() == orders.count())
  }

  test("k = 1 is argmax per group") {
    val custom = GraftOps.topKPerGroup(orders, Seq("o_custkey"),
      Seq(("o_totalprice", true), ("o_orderkey", false)), 1)
    val direct = orders.groupBy("o_custkey")
      .agg(max(struct(col("o_totalprice"), col("o_orderkey") * -1)).as("s"))
    assert(custom.count() == direct.count())
    val viaWindow = {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      orders.withColumn("rn", row_number().over(w)).filter(col("rn") === 1).drop("rn")
    }
    assert(sortedRows(custom) == sortedRows(viaWindow))
  }

  test("null order keys follow Spark SortOrder defaults (DESC -> nulls last)") {
    import spark.implicits._
    val df = Seq(
      ("a", 1L, Some(10.0)), ("a", 2L, None), ("a", 3L, Some(5.0)),
      ("b", 4L, None), ("b", 5L, None)).toDF("g", "id", "v")
    val custom = GraftOps.topKPerGroup(df, Seq("g"), Seq(("v", true), ("id", false)), 2)
      .orderBy("g", "id").collect().toSeq
    val w = Window.partitionBy(col("g")).orderBy(col("v").desc_nulls_last, col("id").asc)
    val win = df.withColumn("rn", row_number().over(w)).filter(col("rn") <= 2)
      .drop("rn").orderBy("g", "id").collect().toSeq
    assert(custom == win)
  }

  test("empty input yields empty output") {
    val empty = orders.filter(col("o_orderkey") < 0)
    assert(GraftOps.topKPerGroup(empty, Seq("o_custkey"),
      Seq(("o_totalprice", true)), 3).count() == 0)
  }

  test("partial phase bounds the shuffle payload when groups are few") {
    // The operator's 100 TB claim, measured: 150k rows in 5 groups
    // over 8 map partitions. The window formulation shuffles all 150k
    // rows; the heap partial emits at most groups × k per partition
    // (= 120 rows) into the exchange. AQE off for a stable two-node
    // plan whose partial-side metric we can read directly.
    val saved = spark.conf.getOption("spark.sql.adaptive.enabled")
    try {
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      val df = spark.range(150000).select(
        (org.apache.spark.sql.functions.col("id") % 5).as("g"),
        org.apache.spark.sql.functions.col("id").as("v"))
        .repartition(8)
      val top = GraftOps.topKPerGroup(df, Seq("g"), Seq(("v", true)), 3)
      assert(top.count() == 15)
      val partial = top.queryExecution.executedPlan.collect {
        case t: graft.plans.TopKPerGroupExec if t.partial => t
      }.head
      val emitted = partial.metrics("numOutputRows").value
      assert(emitted <= 5L * 3 * 8,
        s"partial emitted $emitted rows into the shuffle; expected <= 120 of 150000")
    } finally saved match {
      case Some(v) => spark.conf.set("spark.sql.adaptive.enabled", v)
      case None => spark.conf.unset("spark.sql.adaptive.enabled")
    }
  }

  test("partial-phase group cap: pass-through past the cap stays exact") {
    // 10k customers against a cap of 7 partial heaps per partition:
    // nearly every row streams through unpruned, and the final phase
    // must still produce the exact answer — the memory-safety valve
    // costs optimization, never correctness.
    val capped = GraftOps.topKPerGroup(orders, Seq("o_custkey"),
      Seq(("o_totalprice", true), ("o_orderkey", false)), 3, maxPartialGroups = 7)
    assert(sortedRows(capped) == sortedRows(windowTop3))
  }

  test("float group keys: -0.0 and 0.0 (and NaN bit patterns) are one group") {
    // ADVICE r5 (medium): Spark's NormalizeFloatingNumbers rule never
    // visits the custom node, so the strategy normalizes group keys
    // itself — under bytewise UnsafeRow grouping, -0.0 vs 0.0 would
    // otherwise form two groups and even hash to different partitions.
    import spark.implicits._
    val df = Seq((0.0, 1L), (-0.0, 2L), (0.0, 3L), (Double.NaN, 4L),
      (0.0 / 0.0, 5L), (1.5, 6L))
      .toDF("g", "id").repartition(7)
    val top = GraftOps.topKPerGroup(df, Seq("g"), Seq(("id", false)), 2)
    // one group for ±0.0 (keeps ids 1,2), one for NaN (4,5), one for 1.5 (6)
    assert(top.count() == 5)
    val w = Window.partitionBy(col("g")).orderBy(col("id").asc)
    val win = df.withColumn("rn", row_number().over(w)).filter(col("rn") <= 2).drop("rn")
    assert(top.select(sum("id")).head().getLong(0) ==
      win.select(sum("id")).head().getLong(0))
  }

  test("empty group list is rejected with a clear message") {
    // ADVICE r5 (low): ClusteredDistribution(Nil) would otherwise fail
    // deep inside planning with an unhelpful internal require.
    val e = intercept[IllegalArgumentException] {
      GraftOps.topKPerGroup(orders, Seq.empty,
        Seq(("o_totalprice", true)), 3).collect()
    }
    assert(e.getMessage.contains("at least one group column"), e.getMessage)
  }

  test("column resolution honors spark.sql.caseSensitive=false") {
    // ADVICE r5 (low): 'O_CUSTKEY' resolves everywhere else in the API.
    val custom = GraftOps.topKPerGroup(orders, Seq("O_CUSTKEY"),
      Seq(("O_TOTALPRICE", true), ("o_orderkey", false)), 3)
    assert(sortedRows(custom) == sortedRows(windowTop3))
  }

  test("composes downstream: join + aggregate over the operator's output") {
    val customer = Tables.load(spark, sf, "customer").select("c_custkey", "c_mktsegment")
    val top = GraftOps.topKPerGroup(orders, Seq("o_custkey"),
      Seq(("o_totalprice", true), ("o_orderkey", false)), 3)
    val agg = top.join(customer, col("o_custkey") === col("c_custkey"))
      .groupBy("c_mktsegment").agg(count(lit(1)).as("n"))
    val viaWindow = windowTop3.join(customer, col("o_custkey") === col("c_custkey"))
      .groupBy("c_mktsegment").agg(count(lit(1)).as("n"))
    assert(agg.orderBy("c_mktsegment").collect().toSeq ==
      viaWindow.orderBy("c_mktsegment").collect().toSeq)
  }
}
