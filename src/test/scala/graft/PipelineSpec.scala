package graft

import org.apache.spark.sql.functions._

/** Family L (pipeline operators) + new exempt sources/streams:
  * invariants that the DuckDB oracle can't express.
  */
class PipelineSpec extends GraftSpec {

  test("scan_orc_roundtrip equals the parquet source rows") {
    val direct = Tables.load(spark, sf, "part")
      .filter(col("p_partkey") % 10 === 0)
      .select("p_partkey", "p_name", "p_brand", "p_size", "p_retailprice")
      .orderBy("p_partkey")
    assert(q("scan_orc_roundtrip").collect().toSeq === direct.collect().toSeq)
  }

  test("stream_stream_join equals the batch interval join") {
    val ev = Tables.load(spark, sf, "events")
      .select(col("event_id"), col("ts").cast("timestamp").as("ts"),
        col("user_id"), col("event_type"))
    val p = ev.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("ts").as("p_ts"), col("event_id").as("p_id"))
    val e = ev.filter(col("event_type") === "error")
      .select(col("user_id").as("e_user"), col("ts").as("e_ts"), col("event_id").as("e_id"))
    val batch = p.join(e, col("p_user") === col("e_user")
        && col("e_ts") <= col("p_ts")
        && col("e_ts") >= col("p_ts") - expr("INTERVAL 30 MINUTES"))
      .select(col("p_user").as("user_id"), col("p_id"), col("e_id"))
      .orderBy("user_id", "p_id", "e_id")
    assert(q("stream_stream_join").collect().toSeq === batch.collect().toSeq)
  }

  test("sessionize_batch session count equals stream_session") {
    // same 30-minute gap semantics, batch window formulation vs
    // session_window streaming state
    assert(q("sessionize_batch").count() === q("stream_session").count())
  }

  test("dedup_cluster: clusters are consistent with the pair graph") {
    val pairs = api.GraftOps.ngramJaccardPairs(
      Tables.load(spark, sf, "documents"), "doc_id", "text", minJaccard = 0.8)
      .select("a_id", "b_id").collect().map(r => (r.getLong(0), r.getLong(1)))
    val cluster = q("dedup_cluster").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // every paired doc shares its partner's cluster
    pairs.foreach { case (a, b) =>
      assert(cluster(a) === cluster(b), s"pair ($a,$b) split across clusters")
    }
    // cluster label is the component minimum: a label never exceeds its member
    cluster.foreach { case (id, c) => assert(c <= id) }
    // docs with no pair stay singletons
    val paired = pairs.flatMap(p => Seq(p._1, p._2)).toSet
    cluster.filterNot(kv => paired(kv._1)).foreach { case (id, c) =>
      assert(c === id, s"unpaired doc $id moved to cluster $c")
    }
  }

  test("sample_stratified is deterministic and capped per stratum") {
    val a = q("sample_stratified").collect()
    val b = q("sample_stratified").collect()
    assert(a.toSeq === b.toSeq)
    val perGroup = a.groupBy(_.getString(0)).map(_._2.length)
    assert(perGroup.forall(_ <= 100))
  }

  test("agg_sketch estimates land within 15% of the exact distinct count") {
    val approx = q("agg_sketch").collect()
      .map(r => r.getString(0) -> r.getLong(1).toDouble).toMap
    val exact = Tables.load(spark, sf, "lineitem")
      .groupBy("l_returnflag").agg(countDistinct(col("l_partkey")).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    exact.foreach { case (flag, n) =>
      val est = approx(flag)
      assert(math.abs(est - n) / n <= 0.15, s"$flag: est $est vs exact $n")
    }
  }

  test("stream_foreachbatch sink holds exactly the batch-filtered rows") {
    val streamed = q("stream_foreachbatch")
      .select("event_id", "user_id", "value").orderBy("event_id")
    val batch = Tables.load(spark, sf, "events")
      .filter(col("event_type") === "purchase")
      .select("event_id", "user_id", "value").orderBy("event_id")
    assert(streamed.collect().toSeq === batch.collect().toSeq)
  }

  test("quality_filter ratios are bounded and keep is consistent") {
    val rows = q("quality_filter").collect()
    rows.foreach { r =>
      val short = r.getDecimal(2).doubleValue()
      val alpha = r.getDecimal(3).doubleValue()
      assert(short >= 0.0 && short <= 1.0)
      assert(alpha >= 0.0 && alpha <= 1.0)
      val expected = r.getLong(1) >= 5 && alpha >= 0.5 && short <= 0.5
      assert(r.getBoolean(5) === expected)
    }
  }
}
