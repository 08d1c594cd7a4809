package graft

import org.apache.spark.sql.functions._
import graft.queries.MultimodalQueries

/** Multimodal plumbing tests: the decode stub must round-trip through
  * the distributed mapPartitions path exactly as it computes on the
  * driver, and the plan must stay map-only (no shuffle before decode).
  */
class MultimodalSpec extends GraftSpec {

  test("multimodal_decode matches driver-side stub recomputation") {
    val docs = Tables.load(spark, sf, "documents")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val got = q("multimodal_decode").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getInt(2), r.getInt(3),
        r.getLong(4), r.getDouble(5)))
    assert(got.length === docs.size)
    got.foreach { case (id, kind, w, h, n, mean) =>
      val exp = MultimodalQueries.decodeStub(id, kind,
        docs(id).getBytes(java.nio.charset.StandardCharsets.UTF_8))
      assert((id, kind, w, h, n, mean) ===
        (exp.media_id, exp.kind, exp.width, exp.height, exp.n_bytes, exp.mean_byte))
    }
  }

  test("decode stage is map-only — no exchange before mapPartitions") {
    val df = q("multimodal_decode")
    val plan = df.queryExecution.executedPlan.toString
    val beforeSort = plan.split("Sort ").last // everything below the final output sort
    assert(!beforeSort.contains("Exchange hashpartitioning"),
      s"decode pipeline shuffles:\n${plan.take(1500)}")
  }

  test("multimodal_frames fingerprints agree with direct byte slicing") {
    val sample = q("multimodal_frames").filter(col("media_id") === 2L).collect()
    val text = Tables.load(spark, sf, "documents")
      .filter(col("doc_id") === 2L).select("text").head().getString(0)
    assert(sample.nonEmpty)
    sample.foreach { r =>
      val pos = r.getLong(2).toInt
      val frame = text.substring(pos - 1, pos - 1 + 16)
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(frame.getBytes("UTF-8")).map("%02x".format(_)).mkString
      assert(r.getString(3) === md)
    }
  }

  test("multimodal_resize stride-2 fingerprint matches an independent recomputation") {
    val byId = q("multimodal_resize").collect()
      .map(r => r.getLong(0) -> (r.getLong(2), r.getString(3))).toMap
    val docs = Tables.load(spark, sf, "documents")
      .filter(col("doc_id") <= 5L).select("doc_id", "text").collect()
    docs.foreach { r =>
      val bytes = r.getString(1).getBytes("UTF-8")
      val resized = bytes.indices.collect { case i if i % 2 == 0 => bytes(i) }.toArray
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(resized).map("%02x".format(_)).mkString
      val (len, got) = byId(r.getLong(0))
      assert(len === resized.length.toLong)
      assert(got === md)
    }
  }

  test("multimodal_features is a normalized 16-bin nibble histogram") {
    val rows = q("multimodal_features").filter(col("media_id") <= 5L).collect()
    val docs = Tables.load(spark, sf, "documents")
      .filter(col("doc_id") <= 5L).select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(rows.nonEmpty)
    rows.foreach { r =>
      // the dump projection widens the float histogram to double
      // (exact) for the oracle's JSON rendering — values unchanged
      val feat = r.getSeq[Double](2)
      assert(feat.length === 16)
      assert(math.abs(feat.sum - 1.0) < 1e-4)
      val bytes = docs(r.getLong(0)).getBytes("UTF-8")
      val h = new Array[Float](16)
      bytes.foreach(b => h(b & 0x0f) += 1f)
      val expected = h.map(_ / bytes.length)
      assert(feat.zip(expected).forall { case (a, b) => math.abs(a - b.toDouble) < 1e-6 })
    }
  }
}
