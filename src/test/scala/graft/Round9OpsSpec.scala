package graft

/** Round-9 additions: multi-iteration k-means convergence contract,
  * the derived bloom-prescreen sizing's FPR at 10× the r8 cap, and
  * the content-aware table fingerprint (ADVICE r8).
  */
class Round9OpsSpec extends GraftSpec {

  test("cluster_kmeans: conservation, convergence, and step agreement") {
    val rows = q("cluster_kmeans").collect()
    val nVecs = Tables.load(spark, sf, "embeddings").count()
    val k = Tables.load(spark, sf, "embeddings")
      .select("label").distinct().count()
    val byIter = rows.groupBy(_.getInt(0))
    assert(byIter.keySet == (1 to 5).toSet, "exactly 5 iterations reported")
    byIter.foreach { case (it, rs) =>
      assert(rs.length == k, s"iter $it must report every cluster")
      assert(rs.map(_.getLong(2)).sum == nVecs,
        s"iter $it must assign every vector exactly once")
      rs.foreach(r => assert(r.getDecimal(3).signum() >= 0))
    }
    // label-centroid init is near the fixpoint on this corpus: the
    // loop must not diverge — last round's largest centroid move is
    // bounded by the first round's.
    def maxShift(it: Int): Double =
      byIter(it).map(_.getDecimal(3).doubleValue()).max
    assert(maxShift(5) <= maxShift(1) + 1e-9,
      s"diverging centroids: iter1 ${maxShift(1)} -> iter5 ${maxShift(5)}")
    // iteration 1 IS cluster_assign's E-step (same init centroids):
    // its cluster sizes must agree with the oracled assignment query.
    val sizes1 = byIter(1).map(r => r.getLong(1) -> r.getLong(2)).toMap
    val assignSizes = q("cluster_assign").collect()
      .groupBy(_.getInt(2).toLong).map { case (cl, rs) => cl -> rs.length.toLong }
    assert(sizes1 == assignSizes,
      "iter-1 cluster sizes must match cluster_assign's grouping")
  }

  test("derived bloom sizing holds the designed FPR at 10x the old cap") {
    // r8 pinned bloom_agg at 50k items / 400k bits; the prescreen now
    // derives (n, 8n). Verify the 8-bits-per-item design point keeps
    // the false-positive rate near its ~2% theoretical value at
    // 500 000 items — the regime where the old cap would have
    // saturated toward FPP ~1 and erased the prescreen's win.
    graft.functions.GraftFunctions.register(spark)
    val n = 500000L
    spark.range(n).createOrReplaceTempView("__fpr_items")
    try {
      val fp = spark.sql(
        s"""WITH bf AS (SELECT bloom_agg(xxhash64(id), ${n}L, ${8 * n}L) AS f
           |            FROM __fpr_items)
           |SELECT count(*) AS fp FROM range(${n}, ${n + 100000})
           |WHERE bloom_might_contain((SELECT f FROM bf), xxhash64(id))"""
          .stripMargin).head().getLong(0)
      val rate = fp.toDouble / 100000.0
      assert(rate < 0.05, s"FPR $rate exceeds the 8-bits/item design point")
    } finally spark.catalog.dropTempView("__fpr_items")
  }

  test("fingerprint catches a same-size same-mtime content rewrite") {
    val dir = java.nio.file.Files.createTempDirectory("graft_fp")
    val f = dir.resolve("documents.parquet")
    java.nio.file.Files.write(f, Array.fill[Byte](4096)(1))
    val mtime = java.nio.file.Files.getLastModifiedTime(f)
    val fp1 = Tables.fingerprint(dir.toString, "documents")
    // deterministic regenerator writing identical size within the same
    // mtime granule — the ADVICE-r8 collision class
    val bytes = Array.fill[Byte](4096)(1); bytes(4000) = 2
    java.nio.file.Files.write(f, bytes)
    java.nio.file.Files.setLastModifiedTime(f, mtime)
    val fp2 = Tables.fingerprint(dir.toString, "documents")
    assert(fp1 != fp2, "content change must change the fingerprint")
    // and stability: re-probing unchanged content is a fixpoint
    assert(fp2 == Tables.fingerprint(dir.toString, "documents"))
  }
}
