package graft

/** Family M (curation operators): planted-truth checks the DuckDB
  * oracles can't express — the redaction patterns really are gone,
  * the contamination flag is consistent with the share counts, the
  * repetition ratios are well-formed, and the resampling respects its
  * own targets.
  */
class CurationSpec extends GraftSpec {

  test("text_redact_pii scrubs every planted email/phone/card") {
    val rows = q("text_redact_pii").collect()
    assert(rows.nonEmpty)
    val email = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}".r
    val digits13 = "[0-9]{13,16}".r
    rows.foreach { r =>
      val red = r.getString(1)
      assert(email.findFirstIn(red).isEmpty, s"email survived redaction: $red")
      assert(digits13.findFirstIn(red).isEmpty, s"digit run survived: $red")
      // exactly the planted PII is found (word-salad has no emails/cards
      // of its own; digit runs could only come from the payload)
      assert(r.getLong(2) >= 1L && r.getLong(3) >= 1L && r.getLong(4) >= 1L)
      assert(red.contains("<EMAIL>") && red.contains("<PHONE>") && red.contains("<CARD>"))
    }
  }

  test("text_decontaminate: flag == (n_shared > 0) and the corpus has real hits") {
    val out = q("text_decontaminate").collect()
    assert(out.nonEmpty)
    assert(out.forall(r => (r.getLong(1) > 0L) == r.getBoolean(2)))
    // the 21 shared-prefix near-dup groups guarantee eval/train overlap
    assert(out.exists(_.getBoolean(2)), "no contamination found — eval split or shingles broken")
  }

  test("text_repetition ratios are well-formed") {
    val out = q("text_repetition").collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val n = r.getLong(1)
      val dupW = r.getDecimal(2).doubleValue()
      val dupG = r.getDecimal(3).doubleValue()
      val top = r.getDecimal(4).doubleValue()
      assert(n >= 1L)
      assert(dupW >= 0.0 && dupW < 1.0)
      assert(dupG >= 0.0 && dupG < 1.0)
      // top word occurs at least once and at most n times (5e-7 slack:
      // the ratio is rounded to 6 dp and can dip just below 1/n)
      assert(top >= 1.0 / n - 5e-7 && top <= 1.0 + 5e-7)
      // a doc with duplicate words has a top word appearing >= 2 times
      if (dupW > 0.0) assert(top >= 2.0 / n - 5e-7)
    }
  }

  test("sample_weighted fills every language to its sqrt-share target") {
    val out = q("sample_weighted").collect()
      .map(r => (r.getString(1), r.getLong(2), r.getLong(3)))
    val perLang = out.groupBy(_._1)
    assert(perLang.nonEmpty)
    perLang.foreach { case (lang, rows) =>
      val target = rows.head._3
      assert(rows.length.toLong === target, s"$lang: ${rows.length} sampled vs target $target")
      assert(rows.map(_._2).sorted.toSeq === (1L to target), s"$lang: rn not dense")
    }
    // floor() drift: total within [budget - n_langs, budget]
    val total = perLang.values.map(_.head._3).sum
    assert(total >= 200L - perLang.size && total <= 200L, s"targets sum to $total")
  }

  test("sample_temperature flattens the mix toward sqrt-shares at rate targetFrac") {
    import spark.implicits._
    // Planted two-domain corpus: 400 'big' + 100 'small' docs.
    // alpha = 0.5 -> weights 20 : 10; targetFrac = 0.6 -> budget 300;
    // targets big = 200 (rate 0.5), small = 100 (rate 1.0 -> keep ALL).
    val docs = ((1L to 400L).map(i => (i, "big")) ++ (401L to 500L).map(i => (i, "small")))
      .toDF("id", "dom")
    val kept = graft.api.GraftOps.sampleTemperature(docs, "id", "dom",
      alpha = 0.5, targetFrac = 0.6).select("id", "dom")
    val byDom = kept.collect().map(r => (r.getLong(0), r.getString(1))).groupBy(_._2)
    // capped domain is kept verbatim
    assert(byDom("small").length === 100, s"small kept ${byDom("small").length}, want all 100")
    // Bernoulli domain lands near its 200-doc expectation (md5 buckets
    // are uniform; 4 sigma ~ 40 at n=400, p=0.5)
    val big = byDom("big").length
    assert(big > 160 && big < 240, s"big kept $big, expected ~200")
    // deterministic: same rows whatever the partitioning
    val again = graft.api.GraftOps.sampleTemperature(docs.repartition(7), "id", "dom",
      alpha = 0.5, targetFrac = 0.6).select("id", "dom")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(again === kept.collect().map(r => (r.getLong(0), r.getString(1))).toSet)
    // invalid params fail fast
    intercept[IllegalArgumentException] {
      graft.api.GraftOps.sampleTemperature(docs, "id", "dom", targetFrac = 0.0)
    }
  }

  test("text_tokenize_bpe: per-doc token counts are BPE-consistent") {
    import org.apache.spark.sql.functions._
    val rows = q("text_tokenize_bpe").collect()
    assert(rows.length > 400, s"most docs have >=1 tokenizable word, got ${rows.length}")
    rows.foreach { r =>
      val (nw, nt) = (r.getLong(1), r.getLong(2))
      // every word is at least 1 and at most length(word) symbols
      assert(nt >= nw, s"doc ${r.getLong(0)}: tokens $nt < words $nw")
      assert(math.abs(r.getDecimal(3).doubleValue() - nt.toDouble / nw) < 1e-6,
        "tok_per_word must be the 6-dp ratio")
    }
    // merges really fire: 20 learned merges must compress the corpus
    // below its letters-per-word ceiling (chars = upper bound = no
    // merges applied anywhere)
    val chars = Tables.load(spark, sf, "documents")
      .select(explode(split(lower(col("text")), "[^a-z]+")).as("w"))
      .filter(length(col("w")) >= 2)
      .agg(sum(length(col("w")))).collect()(0).getLong(0)
    val totalToks = rows.map(_.getLong(2)).sum
    assert(totalToks < chars,
      s"no merge fired anywhere: $totalToks tokens vs $chars chars")
  }

  test("sample_group_split never splits a user across sets") {
    val out = q("sample_group_split").collect()
    val ev = Tables.load(spark, sf, "events")
    assert(out.map(_.getString(0)).toSet.subsetOf(Set("train", "valid", "test")))
    assert(out.map(_.getLong(1)).sum == ev.count(),
      "every event must land in exactly one split")
    // THE leakage property: summing per-split distinct-user counts
    // equals the global distinct-user count iff no user appears in
    // two splits (a straddling user would be double-counted).
    assert(out.map(_.getLong(2)).sum == ev.select("user_id").distinct().count())
    assert(out.exists(r => r.getString(0) == "train" && r.getLong(2) > 0))
  }

  test("sample_balanced caps every class at the minority size, deterministically") {
    val out = q("sample_balanced").collect()
    val docs = Tables.load(spark, sf, "documents")
      .filter(org.apache.spark.sql.functions.col("text").isNotNull)
    val classCounts = docs.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val cap = classCounts.values.min
    // every class present and sampled to EXACTLY the minority size
    val sizes = out.groupBy(_.getString(0)).map { case (l, g) => l -> g.size }
    assert(sizes.keySet == classCounts.keySet)
    sizes.foreach { case (l, n) =>
      assert(n.toLong == cap, s"class $l: $n rows, cap $cap")
    }
    // members are real distinct docs, and the pick is reproducible
    assert(out.map(_.getLong(1)).distinct.length == out.length)
    val again = q("sample_balanced").collect()
    assert(out.map(r => (r.getString(0), r.getLong(1))).toSeq ==
      again.map(r => (r.getString(0), r.getLong(1))).toSeq,
      "md5-permutation selection must be reproducible run to run")
  }

  test("sample_negative picks the brute-force top-3 pair hashes in-bucket") {
    import org.apache.spark.sql.functions.col
    val out = q("sample_negative").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    def md5hex(s: String): String = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8"))
      d.map(b => f"$b%02x").mkString
    }
    val ids = Tables.load(spark, sf, "documents")
      .filter(col("text").isNotNull)
      .select("doc_id").collect().map(_.getLong(0)) // test-sized
    // round-12 formula: nb derives from the corpus (greatest(16,
    // n DIV 256)), hash range is 8 md5 hex digits
    val nb = math.max(16L,
      Tables.load(spark, sf, "documents")
        .filter(col("text").isNotNull).count() / 256L)
    def bucket(id: Long): Long =
      java.lang.Long.parseLong(md5hex(id.toString).take(8), 16) % nb
    val byBucket = ids.groupBy(bucket)
    val truth = ids.flatMap { a =>
      byBucket(bucket(a)).filter(_ != a)
        .map(c => (a, c, md5hex(s"$a|$c")))
        .sortBy { case (_, c, h) => (h, c) }
        .take(3).zipWithIndex
        .map { case ((_, c, _), i) => (a, c, i + 1L) }
    }.toSet
    assert(out.length == truth.size,
      s"row count: got ${out.length}, truth ${truth.size}")
    out.foreach(t => assert(truth(t), s"unexpected negative $t"))
    // structural guards: no self-pair, in-bucket only, <= 3 per anchor
    out.foreach { case (a, c, _) =>
      assert(a != c); assert(bucket(a) == bucket(c))
    }
    out.groupBy(_._1).values.foreach(g => assert(g.length <= 3))
  }
}
