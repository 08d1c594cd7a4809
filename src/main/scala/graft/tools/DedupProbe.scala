package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev probe (round 18): stage-split timings for the dedup_near /
  * dedup_simhash sf1 tails (VERDICT r17 #4) and the
  * text_ngram_profile per-row-compute A/B (VERDICT r17 #7) — which
  * sub-stage actually owns the cost decides whether a persisted
  * signature index (relocating per-doc work) or a join-side change
  * (relocating pair work) is the right lever.
  *
  * Usage: dev/run.sh graft.tools.DedupProbe <sfDir> [simhash|near|ngram]
  */
object DedupProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val which = args.lift(1).getOrElse("simhash")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.functions.GraftFunctions.register(spark)
    val docs = graft.Tables.load(spark, sfDir, "documents")

    def time(label: String)(df: => DataFrame): Unit = {
      val t0 = System.nanoTime()
      val n = df.count()
      println(f"$label%-40s ${(System.nanoTime() - t0) / 1e9}%8.2f s  rows=$n")
    }

    which match {
      case "simhash" => simhashStages(spark, docs, time)
      case "near"    => nearStages(spark, docs, time)
      case "ngram"   => ngramAb(spark, docs, time)
    }
    spark.stop()
  }

  /** The simhashPairs pipeline cut at each stage boundary (mirrors
    * GraftOps.simhashPairs line for line).
    */
  private def simhashStages(s: SparkSession, docs: DataFrame,
      time: String => (=> DataFrame) => Unit): Unit = {
    val idCol = "doc_id"; val textCol = "text"
    def words = docs.select(col(idCol), split(col(textCol), " ").as("__wall"))
      .withColumn("__simhash", expr("simhash64(__wall)"))
      .withColumn("__w", expr(
        "array_distinct(transform(sequence(1, greatest(size(__wall) - 2, 1)), " +
          "i -> concat_ws(' ', slice(__wall, i, 3))))"))
    time("1 words (split+simhash64+shingles)")(words)
    val tables = (0 until 8).combinations(2).toSeq.zipWithIndex.map {
      case (Seq(i, j), t) =>
        struct(lit(t).as("band_idx"),
          (shiftright(col("__simhash"), i * 8).bitwiseAND(lit(255L)) * 256L +
            shiftright(col("__simhash"), j * 8).bitwiseAND(lit(255L))).as("band_val"))
    }
    def banded = words.select(col(idCol), col("__simhash"),
      explode(array(tables: _*)).as("__b"))
      .select(col(idCol), col("__simhash"),
        col("__b.band_idx").as("band_idx"), col("__b.band_val").as("band_val"))
    time("2 banded (28-table explode)")(banded)
    def cand = {
      val a = banded.select(col(idCol).as("a_id"), col("__simhash").as("a_sh"),
        col("band_idx"), col("band_val"))
      val b = banded.select(col(idCol).as("b_id"), col("__simhash").as("b_sh"),
        col("band_idx").as("b_bi"), col("band_val").as("b_bv"))
      a.join(b, col("band_idx") === col("b_bi") && col("band_val") === col("b_bv")
          && col("a_id") < col("b_id"))
        .withColumn("hamming", expr("bit_count(a_sh ^ b_sh)").cast("int"))
        .filter(col("hamming") <= 6)
        .select("a_id", "b_id", "hamming").distinct()
    }
    time("3 candidates (band join+ham+distinct)")(cand)
    time("4 full (verify joins + jaccard)")(
      graft.api.GraftOps.simhashPairs(docs, idCol, textCol))
  }

  /** The minHashNearDupPairs pipeline cut at each stage boundary. */
  private def nearStages(s: SparkSession, docs: DataFrame,
      time: String => (=> DataFrame) => Unit): Unit = {
    import org.apache.spark.ml.feature.{HashingTF, MinHashLSH}
    val sh = graft.api.GraftOps.shingles(docs, "text", 3, "__shingles")
    time("1 shingles")(sh)
    val tf = new HashingTF().setInputCol("__shingles").setOutputCol("__features")
      .setNumFeatures(1 << 18).setBinary(true)
    def feat = tf.transform(sh).select(col("doc_id"), col("__features"))
    time("2 +hashingTF")(feat)
    val f = feat.cache()
    val lsh = new MinHashLSH().setInputCol("__features").setOutputCol("__hashes")
      .setNumHashTables(5).setSeed(42L)
    val model = lsh.fit(f)
    time("3 +minhash transform")(model.transform(f))
    time("4 full approxSimilarityJoin")(
      model.approxSimilarityJoin(f, f, 0.5, "jaccard_dist")
        .filter(col("datasetA.doc_id") < col("datasetB.doc_id"))
        .select(col("datasetA.doc_id").as("a_id"),
          col("datasetB.doc_id").as("b_id")))
    f.unpersist()
  }

  /** text_ngram_profile per-row-compute A/B: positions-explode +
    * substring (shipped, O(position) per UTF8 substring) vs
    * split-chars + O(1) array indexing. Same trigram multiset by
    * construction (both are character-positioned).
    */
  private def ngramAb(s: SparkSession, docs: DataFrame,
      time: String => (=> DataFrame) => Unit): Unit = {
    def agg(tg: DataFrame) = tg.groupBy("lang", "tg").agg(count(lit(1)).as("c"))
    def a = agg(docs.filter(length(col("text")) >= 3)
      .select(col("lang"), lower(col("text")).as("tx"))
      .select(col("lang"),
        explode(expr("sequence(1, length(tx) - 2)")).as("i"), col("tx"))
      .select(col("lang"), expr("substring(tx, i, 3)").as("tg")))
    def b = agg(docs.filter(length(col("text")) >= 3)
      .select(col("lang"), split(lower(col("text")), "").as("ca"))
      .select(col("lang"), explode(expr(
        "transform(sequence(0, size(ca) - 3), " +
          "i -> concat(ca[i], ca[i+1], ca[i+2]))")).as("tg")))
    // alternate twice: round 1 pays JVM/codegen warm-up, round 2 is the
    // comparable pair (order bias cost one wrong call this round)
    time("A positions+substring r1")(a)
    time("B split-chars r1")(b)
    time("A positions+substring r2")(a)
    time("B split-chars r2")(b)
    // cross-check equality of the aggregated profiles
    def pmap(df: DataFrame) = df.collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    val pa = pmap(a)
    val pb = pmap(b)
    println(s"profiles equal: ${pa == pb} (a=${pa.size} groups, b=${pb.size} groups)")
  }
}
