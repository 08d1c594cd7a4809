package graft

/** Plan assertions for the scale-pattern queries: bucketing must
  * actually eliminate the exchanges it exists to eliminate.
  */
class ScaleSpec extends GraftSpec {

  test("join_bucketed: bucketed join + agg run with zero exchanges") {
    val df = q("join_bucketed")
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    // the only allowed exchange is the final range partitioning for
    // the output ORDER BY — never a hash exchange for join or agg
    assert(!plan.contains("Exchange hashpartitioning"),
      s"bucketing failed to co-locate:\n${plan.take(2000)}")
  }

  test("dedup_embed_cos: candidate generation is bucketed, never corpus × corpus") {
    val df = q("dedup_embed_cos")
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"),
      s"all-pairs scan in the plan:\n${plan.take(2000)}")
    assert(!plan.contains("BroadcastNestedLoopJoin"),
      s"all-pairs scan in the plan:\n${plan.take(2000)}")
  }

  test("sim_ivf reads the persisted index with partition pruning and matches direct ivfTopK") {
    import org.apache.spark.sql.functions._
    val df = q("sim_ivf")
    val rows = df.collect()
    assert(rows.nonEmpty)
    val plan = df.queryExecution.executedPlan.toString
    // the corpus side must come from the bucket-partitioned index
    // files with a pruning filter, not a full re-bucketing job
    assert(plan.contains("PartitionFilters") && plan.contains("bucket#"),
      s"index scan not partition-pruned:\n${plan.take(2000)}")
    graft.functions.GraftFunctions.register(spark)
    val emb = Tables.load(spark, sf, "embeddings")
    val cent = graft.api.GraftOps.centroids(emb, "label", "embedding")
    val direct = graft.api.GraftOps.ivfTopK(emb, "vec_id", "embedding", cent,
      col("vec_id") < 10, k = 5, nprobe = 3).orderBy("q_id", "rn")
    assert(rows.toSeq === direct.collect().toSeq)
  }

  test("join_salted runs as a salted shuffle join, not broadcast") {
    val df = q("join_salted")
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("ShuffledHashJoin") || plan.contains("SortMergeJoin"),
      s"expected a shuffle join:\n${plan.take(2000)}")
    assert(plan.contains("__salt"), "join keys do not include the salt shard")
  }

  test("sink_partitioned read-back prunes to the filtered partition") {
    val df = q("sink_partitioned")
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("o_orderstatus"),
      s"partition pruning missing:\n${plan.take(2000)}")
  }

  test("sink_compacted rewrites 64 small files into 4") {
    q("sink_compacted").collect()
    val root = graft.queries.ScaleQueries.compactDir.get(sf)
    def parquets(p: String) =
      new java.io.File(p).listFiles().count(_.getName.endsWith(".parquet"))
    assert(parquets(s"$root/small") === 64)
    assert(parquets(s"$root/compact") === 4)
  }

  test("agg_salted equals the direct group-by bit-for-bit") {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types.DecimalType
    val direct = Tables.load(spark, sf, "lineitem")
      .groupBy("l_returnflag")
      .agg(sum(Tables.dec(col("l_quantity"))).cast(DecimalType(38, 2)).as("sum_qty"),
        count(lit(1)).as("n"))
      .orderBy("l_returnflag")
    assert(q("agg_salted").collect().toSeq === direct.collect().toSeq)
  }

  test("GraftExtensions registers null_safe_div via the injection API") {
    val e = new org.apache.spark.sql.SparkSessionExtensions
    new GraftExtensions().apply(e)
    // builder ran without throwing; function resolution itself is
    // covered by GoldenSpec through the registry path
    succeed
  }
}
