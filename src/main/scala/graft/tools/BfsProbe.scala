package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe (round 16 — VERDICT r15 #8): split graph_bfs's wall-clock
  * into its two phases — the blocked-cosine EDGE BUILD (eager
  * localCheckpoint) vs the 3 frontier hops + distance fold — so the
  * adjudication rests on a measurement, not a guess about "per-round
  * overhead". Usage: dev/run.sh graft.tools.BfsProbe [sfDir]
  */
object BfsProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.Tables.tune(spark)
    graft.functions.GraftFunctions.register(spark)
    val t0 = System.nanoTime()
    val p = graft.api.GraftOps.cosinePairsBlocked(
        graft.Tables.load(spark, sfDir, "embeddings"),
        "vec_id", "embedding", minCos = 0.3)
      .select(col("a_id"), col("b_id"))
      .localCheckpoint(true)
    val tEdges = (System.nanoTime() - t0) / 1e9
    val t1 = System.nanoTime()
    val edges = p.unionAll(
      p.select(col("b_id").as("a_id"), col("a_id").as("b_id")))
    val seeds = p.select(col("a_id").as("v")).distinct()
      .orderBy("v").limit(3)
    def hop(frontier: org.apache.spark.sql.DataFrame) =
      frontier.join(edges, frontier("v") === edges("a_id"))
        .select(col("b_id").as("v")).distinct()
    val f1 = hop(seeds)
    val f2 = hop(f1)
    val f3 = hop(f2)
    val n = seeds.withColumn("dist", lit(0L))
      .unionAll(f1.withColumn("dist", lit(1L)))
      .unionAll(f2.withColumn("dist", lit(2L)))
      .unionAll(f3.withColumn("dist", lit(3L)))
      .groupBy("v").agg(min(col("dist")).as("dist"))
      .count()
    val tHops = (System.nanoTime() - t1) / 1e9
    println(f"edges=${p.count()} rows=$n edge_build=$tEdges%.1f hops=$tHops%.1f")
    spark.stop()
  }
}
