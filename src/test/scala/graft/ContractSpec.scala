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

  test("no query name is defined by two modules (silent map override)") {
    // SparkEntry merges ~30 module maps with ++, where a later module
    // SILENTLY wins a name clash — a new query can shadow (or be
    // shadowed by) an old one and every per-query check still passes,
    // just against the wrong implementation. Caught live in round 5:
    // a second ts_interpolate. Assert clash-freedom structurally.
    val modules: Seq[(String, Map[String, queries.Q])] = Seq(
      "Scan" -> queries.ScanQueries.queries,
      "Filter" -> queries.FilterQueries.queries,
      "Join" -> queries.JoinQueries.queries,
      "Agg" -> queries.AggQueries.queries,
      "Window" -> queries.WindowQueries.queries,
      "Sort" -> queries.SortQueries.queries,
      "Set" -> queries.SetQueries.queries,
      "ScalarFn" -> queries.ScalarFnQueries.queries,
      "Udf" -> queries.UdfQueries.queries,
      "Llm" -> queries.LlmQueries.queries,
      "Text" -> queries.TextQueries.queries,
      "Curation" -> queries.CurationQueries.queries,
      "Prep" -> queries.PrepQueries.queries,
      "Multimodal" -> queries.MultimodalQueries.queries,
      "Scale" -> queries.ScaleQueries.queries,
      "Subquery" -> queries.SubqueryQueries.queries,
      "Pipeline" -> queries.PipelineQueries.queries,
      "Olap" -> queries.OlapQueries.queries,
      "Tpch" -> queries.TpchQueries.queries,
      "Stats" -> queries.StatsQueries.queries,
      "Profile" -> queries.ProfileQueries.queries,
      "Lakehouse" -> queries.LakehouseQueries.queries,
      "Feature" -> queries.FeatureQueries.queries,
      "Analytics" -> queries.AnalyticsQueries.queries,
      "Runtime" -> queries.RuntimeQueries.queries,
      "Sequence" -> queries.SequenceQueries.queries,
      "Robust" -> queries.RobustQueries.queries,
      "Interval" -> queries.IntervalQueries.queries,
      "Report" -> queries.ReportQueries.queries,
      "Retrieval" -> queries.RetrievalQueries.queries,
      "Cbo" -> queries.CboQueries.queries,
      "Stream" -> streaming.StreamQueries.queries)
    val clashes = modules.flatMap { case (m, qs) => qs.keys.map(_ -> m) }
      .groupBy(_._1).filter(_._2.size > 1)
      .map { case (n, ms) => s"$n in ${ms.map(_._2).mkString("+")}" }
    assert(clashes.isEmpty, s"duplicate query names: ${clashes.mkString(", ")}")
    val total = modules.map(_._2.size).sum
    assert(total == SparkEntry.queries.size,
      s"merged surface ${SparkEntry.queries.size} != module sum $total")
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
