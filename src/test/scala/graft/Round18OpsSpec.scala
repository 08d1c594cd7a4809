package graft

import org.apache.spark.sql.functions._

/** Round-18 pins: the degree-ordered triangle orientation (VERDICT
  * r17 #3) is value-identical to the round-5 node-iterator
  * formulation — same triangle set, same per-vertex counts.
  */
class Round18OpsSpec extends GraftSpec {

  test("graph_triangles degree-ordered orientation == node-iterator per-vertex counts") {
    graft.functions.GraftFunctions.register(spark)
    // the shipped (oriented) formulation
    val oriented = q("graph_triangles").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // the round-5 node-iterator over the SAME edge set: ordered edges
    // (a<b) joined twice on the middle vertex
    val e = graft.queries.SimGraph.edges(spark, sf, minCos = 0.3)
      .select(col("a_id"), col("b_id"))
    val e1 = e.select(col("a_id").as("a"), col("b_id").as("b"))
    val e2 = e.select(col("a_id").as("b2"), col("b_id").as("c"))
    val e3 = e.select(col("a_id").as("a3"), col("b_id").as("c3"))
    val tri = e1.join(e2, col("b") === col("b2"))
      .join(e3, col("a") === col("a3") && col("c") === col("c3"))
      .select("a", "b", "c")
    val nodeIter = tri.select(col("a").as("vec_id"))
      .unionAll(tri.select(col("b").as("vec_id")))
      .unionAll(tri.select(col("c").as("vec_id")))
      .groupBy("vec_id").agg(count(lit(1)).as("n_tri"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(nodeIter.nonEmpty, "triangle fixture degenerate — no triangles")
    assert(oriented == nodeIter,
      s"only-oriented=${(oriented.toSet -- nodeIter.toSet).take(5)} " +
        s"only-nodeiter=${(nodeIter.toSet -- oriented.toSet).take(5)}")
  }

  test("text_ngram_profile split-chars trigrams == positions+substring trigrams") {
    // the shipped split-chars formulation (O(len) per doc) must produce
    // the identical (lang, tg, c) profile as the former
    // positions-explode + substring formulation (O(len²) per doc) —
    // both are character-positioned by construction
    val docs = Tables.load(spark, sf, "documents")
    def profile(tg: org.apache.spark.sql.DataFrame) =
      tg.groupBy("lang", "tg").agg(count(lit(1)).as("c"))
        .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2))
        .toMap
    val shipped = profile(docs.filter(length(col("text")) >= 3)
      .select(col("lang"), split(lower(col("text")), "").as("ca"))
      .select(col("lang"), explode(expr(
        "transform(sequence(0, size(ca) - 3), " +
          "i -> concat(ca[i], ca[i+1], ca[i+2]))")).as("tg")))
    val positions = profile(docs.filter(length(col("text")) >= 3)
      .select(col("lang"), lower(col("text")).as("tx"))
      .select(col("lang"),
        explode(expr("sequence(1, length(tx) - 2)")).as("i"), col("tx"))
      .select(col("lang"), expr("substring(tx, i, 3)").as("tg")))
    assert(shipped.nonEmpty && shipped == positions,
      s"only-shipped=${(shipped.toSet -- positions.toSet).take(5)} " +
        s"only-positions=${(positions.toSet -- shipped.toSet).take(5)}")
  }

  test("persisted IVF quantizer table == recomputed centroids, bit-exact") {
    graft.functions.GraftFunctions.register(spark)
    def centMap(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getInt(0) -> r.getSeq[Double](1).toList).toMap
    val persisted = centMap(graft.queries.LlmQueries.centFor(spark, sf))
    val recomputed = centMap(graft.api.GraftOps.centroids(
      Tables.load(spark, sf, "embeddings"), "label", "embedding"))
    assert(persisted.nonEmpty && persisted == recomputed,
      "parquet round-trip of the quantizer diverged from the direct aggregate")
  }

  test("dedup_near FromSignatures == direct MinHash tier") {
    val docs = Tables.load(spark, sf, "documents")
    val direct = graft.api.GraftOps.minHashNearDupPairs(
      docs, "doc_id", "text", maxJaccardDist = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val indexed = graft.api.GraftOps.minHashNearDupPairsFromSignatures(
      graft.queries.LlmQueries.nearSigFor(spark, sf), "doc_id",
      maxJaccardDist = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(indexed.nonEmpty && indexed == direct,
      s"only-indexed=${(indexed -- direct).take(5)} " +
        s"only-direct=${(direct -- indexed).take(5)}")
  }

  test("dedup_simhash FromSignatures == direct SimHash tier (hamming included)") {
    graft.functions.GraftFunctions.register(spark)
    val docs = Tables.load(spark, sf, "documents")
    val direct = graft.api.GraftOps.simhashPairs(docs, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val indexed = graft.api.GraftOps.simhashPairsFromSignatures(
      graft.queries.LlmQueries.shSigFor(spark, sf), "doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(indexed.nonEmpty && indexed == direct,
      s"only-indexed=${(indexed -- direct).take(5)} " +
        s"only-direct=${(direct -- indexed).take(5)}")
  }

  test("persisted IVF index (c_id, bucket) == fresh ivfAssign routing (the sim_ivfpq read)") {
    graft.functions.GraftFunctions.register(spark)
    val emb = Tables.load(spark, sf, "embeddings")
    val cent = graft.queries.LlmQueries.centFor(spark, sf)
    val fresh = graft.api.GraftOps.ivfAssign(emb, "vec_id", "embedding", cent)
      .select("c_id", "bucket").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    // the same read sim_ivfpq performs: the persisted v2 index's routing
    val q = SparkEntry.queries("sim_ivfpq")(spark, sf) // forces index build
    q.count()
    val fp = Tables.fingerprint(sf, "embeddings")
    val path = java.nio.file.Paths.get(System.getProperty("java.io.tmpdir"),
      s"graft_ivf2_${Integer.toHexString((sf + fp).hashCode)}").toString
    val persisted = spark.read.parquet(path).select("c_id", "bucket")
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(persisted.nonEmpty && persisted == fresh,
      "persisted index routing diverged from pointwise ivfAssign")
  }
}
