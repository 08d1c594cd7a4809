package graft

/** Determinism harness (SURVEY §5): representative queries must produce
  * identical ordered output under different shuffle-partition counts —
  * the in-suite guard for the §7.4.2 class of bugs. (The dev loop runs
  * the full 76-query version of this via dev/run.sh + dev/check.py.)
  */
class DeterminismSpec extends GraftSpec {

  private val sample = Seq(
    "agg_groupby",      // decimal sums
    "join_asof",        // window last_value ordering
    "win_rank",         // rank ties
    "sim_topk",         // rounded-cosine ranking
    "dedup_near",           // LSH buckets
    "text_tfidf",           // log scores + top-k
    "graph_pagerank",       // iterative integer fixed-point ranks (round 5)
    "ts_anomaly",           // windowed decimal power sums (round 5)
    "text_paragraph_dedup", // global first-occurrence window (round 5)
    "agg_skew_kurt",        // q-grid power sums + double algebra (round 5)
    "win_iqr_outliers",     // discrete quantile selection + integer fences (round 5)
    "typed_mapgroups",      // mapGroups with order-insensitive aggregates (round 5)
    "topk_physical",        // custom heap operator, total per-group order (round 5)
    "dedup_minhash",        // banded min-md5 signatures (round 5)
    "sample_reservoir",     // hash-order reservoir via the heap operator (round 5)
    "vocab_bpe_pairs",      // weighted pair counts + top-20 tie-break (round 5)
    "sample_temperature",   // decimal-normalized rates + md5 buckets (round 6)
    "text_entropy",         // fixed-order 26-term float fold (round 8)
    "embed_knn_block_unscaled",      // blocked rounded-cosine ranking (round 8)
    "cluster_kmeans_step",  // E-step margin + exact-integer M-step (round 8)
    "seq_markov")           // lag bigrams + single exact-int division (round 8)

  sample.foreach { name =>
    test(s"$name is partition-count invariant") {
      val conf = "spark.sql.shuffle.partitions"
      val orig = spark.conf.get(conf)
      try {
        spark.conf.set(conf, "2")
        val a = SparkEntry.queries(name)(spark, sf).collect().toSeq
        spark.conf.set(conf, "7")
        val b = SparkEntry.queries(name)(spark, sf).collect().toSeq
        assert(a === b, s"$name output depends on partitioning")
        assert(a.nonEmpty)
      } finally spark.conf.set(conf, orig)
    }
  }
}
