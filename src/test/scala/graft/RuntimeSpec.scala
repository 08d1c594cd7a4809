package graft

import org.apache.spark.sql.functions._

/** Family V invariants: dynamic partition pruning fires on the
  * partitioned fact, and runtime bloom-filter injection works when
  * the thresholds admit it (conf-gated demo, save/restore pattern
  * from ScaleSpec's AQE tests).
  */
class RuntimeSpec extends GraftSpec {

  test("join_dpp plan carries a dynamicpruning partition filter") {
    val p = q("join_dpp").queryExecution.executedPlan.toString
    assert(p.contains("dynamicpruning"),
      "dim-side filter must prune fact partitions at runtime")
    assert(p.contains("PartitionFilters"))
  }

  test("join_dpp matches the unpartitioned equivalent") {
    import org.apache.spark.sql.types.DecimalType
    val direct = Tables.load(spark, sf, "orders")
      .filter(expr("CAST(substring(o_orderpriority, 1, 1) AS INT) <= 2"))
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n"),
        sum(Tables.dec(col("o_totalprice"))).cast(DecimalType(38, 2)).as("rev"))
      .orderBy("o_orderpriority")
    assert(q("join_dpp").collect().toSeq === direct.collect().toSeq)
  }

  test("agg_heavy_hitters returns exactly the >1/5-share values") {
    val counts = Tables.load(spark, sf, "documents")
      .groupBy("lang").count().collect()
      .map(r => r.getAs[String]("lang") -> r.getAs[Long]("count")).toMap
    val total = counts.values.sum
    val expected = counts.filter { case (_, c) => c * 5 > total }.keySet
    val got = q("agg_heavy_hitters").collect().map(_.getAs[String]("lang")).toSet
    assert(got == expected, s"expected $expected got $got")
    assert(got.nonEmpty, "corpus has a dominant language by construction")
  }

  test("runtime bloom filter injects a might_contain probe when thresholds admit it") {
    // Not a `queries` entry: the injection is threshold-gated (the
    // application side must look big), so the demo lowers the size
    // thresholds, asserts the plan shape, and restores the session
    // confs — the same save/restore discipline as ScaleSpec's AQE
    // tests (ADVICE r4: restore EVERY key you touch).
    val keys = Seq(
      "spark.sql.optimizer.runtime.bloomFilter.enabled",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold",
      "spark.sql.autoBroadcastJoinThreshold")
    val saved = keys.map(k => k -> spark.conf.getOption(k))
    try {
      spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
      spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "0")
      spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold", "100MB")
      // force a shuffle join: bloom filters decorate the application
      // side of a shuffle, not a broadcast reuse
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val fact = Tables.load(spark, sf, "lineitem").select("l_orderkey", "l_quantity")
      val dim = Tables.load(spark, sf, "orders")
        .filter(col("o_orderpriority") === "1-URGENT")
        .select("o_orderkey")
      val joined = fact.join(dim, fact("l_orderkey") === dim("o_orderkey"))
        .groupBy("l_orderkey").agg(sum(Tables.dec(col("l_quantity"))).as("qty"))
      val plan = joined.queryExecution.optimizedPlan.toString
      assert(plan.contains("might_contain"),
        s"expected a bloom-filter probe on the fact side, plan:\n${plan.take(2000)}")
      assert(joined.count() > 0)
    } finally {
      saved.foreach {
        case (k, Some(v)) => spark.conf.set(k, v)
        case (k, None) => spark.conf.unset(k)
      }
    }
  }
}
