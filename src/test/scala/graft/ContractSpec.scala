package graft

/** The driver contract: every declared query executes and returns rows;
  * every oracle entry has a matching query; the flagship entry smokes.
  */
class ContractSpec extends GraftSpec {

  test("entry (flagship Q1) returns rows on sf0.001") {
    assert(SparkEntry.entry(spark).count() === 6L)
  }

  test("oracleSql keys are a subset of queries keys") {
    val orphans = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphans.isEmpty, s"oracle entries without a query: $orphans")
  }

  test("inventory covers every SURVEY §2 family") {
    val names = SparkEntry.queries.keySet
    val expectPrefixes = Seq("scan_", "filter_", "join_", "agg_", "win_",
      "sort_", "topk_", "set_", "fn_", "udf_", "udaf_", "udtf_", "expr_",
      "dedup_", "sim_", "text_", "multimodal_", "cluster_", "stream_")
    expectPrefixes.foreach { p =>
      assert(names.exists(_.startsWith(p)), s"no query named $p*")
    }
    assert(names.size >= 63, s"inventory shrank: ${names.size} < 63")
  }

  // Catch-all: every single declared query must execute on sf0.001.
  // (Streaming queries run their micro-batches inside the call.)
  SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
    test(s"query $name executes and returns rows") {
      val n = fn(spark, sf).count()
      val mayBeEmpty = Set("join_left_anti", "set_except", "dedup_near", "sim_ann")
      assert(n > 0 || mayBeEmpty(name), s"$name returned 0 rows")
    }
  }
}
