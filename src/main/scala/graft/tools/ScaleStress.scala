package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables.load
import graft.api.GraftOps

/** Scale-growth measurement for the operators whose 100 TB survival is
  * asserted from plan shape (VERDICT r2 "What's missing" #4): run each
  * at 1× and N× input (synthetic disjoint copies) and report the
  * runtime ratio. Near-linear operators show ratio ≈ N or below
  * (shared fixed overheads); a quadratic regression shows ≈ N².
  *
  * Copy constructions keep the WORKLOAD linear by design:
  *  - sessionize: user_id offset per copy → N× disjoint users, same
  *    per-user history (window partitions scale, no partition grows).
  *  - connectedComponents: node-id offset per copy → N disjoint
  *    isomorphic graphs, same propagation-round count, N× rows/round.
  *  - cosinePairsBlocked: element ROTATION per copy — preserves norms
  *    and within-copy pair structure, decorrelates cross-copy cosines
  *    so the true pair set grows ~N×, not N²; grid-cell density still
  *    grows N×, so candidate pairs per cell grow — the measured ratio
  *    is the honest cost of a denser corpus at fixed cell width.
  *
  * Usage: SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
  *          dev/run.sh graft.tools.ScaleStress [mult]
  * Prints one markdown table row per operator (pasted into SCALE.md).
  */
object ScaleStress {

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val mult = if (args.nonEmpty) args(0).toInt else 10
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.GraftFunctions.register(spark)
    println(s"| operator | rows 1x | sec 1x | rows ${mult}x | sec ${mult}x | ratio |")
    println("|---|---|---|---|---|---|")
    run(spark, sfDir, mult).foreach { case (op, r1, t1, rn, tn) =>
      println(f"| $op | $r1 | $t1%.2f | $rn | $tn%.2f | ${tn / t1}%.1fx |")
    }
    spark.stop()
  }

  /** One (name, rows1x, sec1x, rowsNx, secNx) tuple per operator. */
  def run(spark: SparkSession, sfDir: String, mult: Int): Seq[(String, Long, Double, Long, Double)] = {
    val off = 100000000L // id offset stride between synthetic copies

    def timeCount(df: DataFrame): (Long, Double) = {
      val t0 = System.nanoTime()
      val n = df.count()
      (n, (System.nanoTime() - t0) / 1e9)
    }

    // --- sessionize over N× disjoint users -------------------------
    val ev = load(spark, sfDir, "events")
      .withColumn("ep_us", expr("unix_micros(cast(ts as timestamp))"))
      .select("user_id", "ep_us", "event_id")
    def evCopies(n: Int): DataFrame =
      (0 until n).map(k => ev.select(
        (col("user_id") + lit(k * off)).as("user_id"),
        col("ep_us"), (col("event_id") + lit(k * off)).as("event_id")))
        .reduce(_ union _)
    def sess(df: DataFrame): DataFrame =
      GraftOps.sessionize(df, "user_id", "ep_us", "event_id", 1800L * 1000000L)
        .groupBy("user_id", "sess").agg(count(lit(1)).as("n"))
    val (sr1, st1) = timeCount(sess(evCopies(1)))
    val (srn, stn) = timeCount(sess(evCopies(mult)))

    // --- connected components over N disjoint copies of the
    //     embeddings similarity graph ------------------------------
    val emb = load(spark, sfDir, "embeddings")
    val baseEdges = GraftOps.cosinePairsBlocked(emb, "vec_id", "embedding", minCos = 0.4)
      .select(col("a_id"), col("b_id")).persist()
    baseEdges.count() // materialize: edge DISCOVERY is the cosine row below
    def ccCopies(n: Int): (DataFrame, DataFrame) = {
      val vs = (0 until n).map(k =>
        emb.select((col("vec_id") + lit(k * off)).as("id"))).reduce(_ union _)
      val es = (0 until n).map(k => baseEdges.select(
        (col("a_id") + lit(k * off)).as("a_id"),
        (col("b_id") + lit(k * off)).as("b_id"))).reduce(_ union _)
      (vs, es)
    }
    def cc(n: Int): DataFrame = {
      val (vs, es) = ccCopies(n)
      GraftOps.connectedComponents(vs, "id", es, "a_id", "b_id")
    }
    val (cr1, ct1) = timeCount(cc(1))
    val (crn, ctn) = timeCount(cc(mult))
    baseEdges.unpersist()

    // --- exact cosine pairs over an N×-denser corpus ----------------
    val dim = emb.select(size(col("embedding"))).head().getInt(0)
    def rotCopies(n: Int): DataFrame =
      (0 until n).map { k =>
        val r = k % dim
        emb.select((col("vec_id") + lit(k * off)).as("vec_id"),
          expr(s"concat(slice(embedding, ${r + 1}, ${dim - r}), slice(embedding, 1, $r))")
            .as("embedding"))
      }.reduce(_ union _)
    def cos(df: DataFrame): DataFrame =
      GraftOps.cosinePairsBlocked(df, "vec_id", "embedding", minCos = 0.4)
    val (pr1, pt1) = timeCount(cos(rotCopies(1)))
    val (prn, ptn) = timeCount(cos(rotCopies(mult)))

    Seq(
      ("sessionize_batch", sr1, st1, srn, stn),
      ("dedup_cluster (connectedComponents)", cr1, ct1, crn, ctn),
      ("dedup_embed_cos (cosinePairsBlocked)", pr1, pt1, prn, ptn))
  }
}
