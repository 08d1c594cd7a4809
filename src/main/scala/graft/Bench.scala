package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}

/** Benchmark main: times every SparkEntry query at SPARK_GRAFT_SF_DIR.
  *
  * Emits ONE machine-readable JSON line as the FINAL stdout line (Spark
  * logs go to stderr at WARN, so stdout stays clean) and also writes it
  * to BENCH_LOCAL.json in the cwd — round 1's timings were lost to sbt
  * log-tail truncation, so the file is the durable copy.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    warmSharedInfra(spark)
    val results = SparkEntry.queries.toSeq.map { case (name, fn) =>
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count() } catch { case _: Throwable => -1L }
      name -> (System.nanoTime() - t0) / 1e9
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    val line =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}"""
    Files.writeString(Paths.get("BENCH_LOCAL.json"), line + "\n")
    spark.stop()
    // after stop(): no executor log lines can land between this and exit
    println(line)
  }

  /** One-time JVM warmup of shared infrastructure (MLlib class loading
    * + codegen for the LSH paths) so per-query timings measure the
    * QUERY, not first-touch class initialization — matching
    * BASELINE.md's "warm JVM session, first run per query" method.
    * Runs on 4 in-memory rows; not attributed to any query.
    */
  private def warmSharedInfra(spark: SparkSession): Unit = {
    import org.apache.spark.ml.feature.{BucketedRandomProjectionLSH, HashingTF, MinHashLSH}
    import org.apache.spark.ml.functions.array_to_vector
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val docs = Seq((1L, Seq("a b c", "b c d")), (2L, Seq("a b c", "c d e")))
      .toDF("id", "sh")
    val feat = new HashingTF().setInputCol("sh").setOutputCol("f")
      .setNumFeatures(1 << 10).setBinary(true).transform(docs)
    val mh = new MinHashLSH().setInputCol("f").setOutputCol("h")
      .setNumHashTables(2).setSeed(42L).fit(feat)
    mh.approxSimilarityJoin(feat, feat, 0.9, "d").count()
    val vecs = Seq((1L, Array(1.0f, 0.0f)), (2L, Array(0.0f, 1.0f)))
      .toDF("id", "v").withColumn("vv", array_to_vector(col("v")))
    val brp = new BucketedRandomProjectionLSH().setInputCol("vv").setOutputCol("h")
      .setBucketLength(2.0).setNumHashTables(2).setSeed(42L).fit(vecs)
    brp.approxSimilarityJoin(vecs, vecs, 4.0, "d").count()
  }
}
