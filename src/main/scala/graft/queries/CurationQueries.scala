package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables.load
import graft.api.GraftOps

/** Family M — training-data curation operators (round-3 additions to
  * the §2.K/L pipeline families): PII redaction, benchmark
  * decontamination, repetition-quality signals, and temperature-based
  * language resampling. These are the four classic curation stages a
  * production LLM data pipeline runs between raw crawl and tokenizer
  * that the surface did not yet cover.
  *
  * Scale shapes (the 100 TB contract):
  *  - M1/M3 are map-only expression pipelines — no shuffle at all.
  *  - M2 is a shingle equi-join whose build side (the benchmark/eval
  *    set) is tiny by definition → broadcast, no fact shuffle.
  *  - M4 is a two-level aggregation plus a broadcast of 5 per-language
  *    targets — the fact table shuffles once on the window key.
  */
object CurationQueries {

  // RE2-compatible patterns (no lookaround) so the Java-regex Spark
  // side and the RE2-based DuckDB oracle match byte-for-byte.
  private val emailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  private val phoneRe = "\\+?[0-9]{1,3}-[0-9]{3}-[0-9]{4}"
  private val cardRe = "[0-9]{13,16}"

  val queries: Map[String, Q] = Map(
    // M1: PII redaction. The corpus is synthetic word-salad with no
    // real PII, so the query plants one deterministic email/phone/card
    // per document and then redacts — exercising the operator's regex
    // chain end-to-end with non-trivial counts. Replacement order
    // (email → phone → card) matters and is part of the contract: the
    // phone pass must run before the bare-digit-run card pass.
    "text_redact_pii" -> ((s, d) => {
      val synth = concat(col("text"), lit(" contact user"),
        col("doc_id").cast("string"), lit("@example.com or +1-555-"),
        lpad((col("doc_id") % 10000).cast("string"), 4, "0"),
        lit(" card 4111111111111111"))
      load(s, d, "documents").withColumn("t", synth).select(
        col("doc_id"),
        regexp_replace(regexp_replace(regexp_replace(col("t"),
          emailRe, "<EMAIL>"), phoneRe, "<PHONE>"), cardRe, "<CARD>")
          .as("redacted"),
        size(regexp_extract_all(col("t"), lit(emailRe), lit(0)))
          .cast("bigint").as("n_emails"),
        size(regexp_extract_all(col("t"), lit(phoneRe), lit(0)))
          .cast("bigint").as("n_phones"),
        size(regexp_extract_all(col("t"), lit(cardRe), lit(0)))
          .cast("bigint").as("n_cards"))
        .orderBy("doc_id")
    }),

    // M2: benchmark decontamination — flag training documents sharing
    // any distinct 5-gram shingle with the (deterministic pseudo-)
    // eval set. At 100 TB the eval set stays KBs–MBs → broadcast join
    // against the exploded training shingles; the training side never
    // shuffles for the probe.
    "text_decontaminate" -> ((s, d) => {
      val sh = GraftOps.shingles(
        load(s, d, "documents").select("doc_id", "text"), "text", 5, "sh")
      val ev = sh.filter(col("doc_id") % 29 === 0)
        .select(explode(col("sh")).as("s")).distinct()
      val tr = sh.filter(col("doc_id") % 29 =!= 0)
      val hits = tr.select(col("doc_id"), explode(col("sh")).as("s"))
        .join(broadcast(ev), "s")
        .groupBy("doc_id").agg(countDistinct(col("s")).as("n_shared"))
      tr.select("doc_id").join(hits, Seq("doc_id"), "left")
        .select(col("doc_id"),
          coalesce(col("n_shared"), lit(0L)).as("n_shared"),
          (coalesce(col("n_shared"), lit(0L)) > 0).as("contaminated"))
        .orderBy("doc_id")
    }),

    // M2b (round 8): M1's decontamination with an explicit BLOOM
    // PRESCREEN — the eval-set shingles collapse to ONE aggregate row
    // (Spark's own BloomFilterAggregate, the runtime-join-filter
    // machinery, registered via GraftFunctions) consumed as a scalar
    // subquery by a map-side might_contain filter on the exploded
    // training shingles. No false negatives ⇒ the exact join after it
    // sees every true hit, and it resolves the false positives ⇒ the
    // OUTPUT IS BIT-IDENTICAL to plain text_decontaminate (same
    // oracle). What changes is the plan: at 100 TB the corpus-side
    // explode no longer feeds the join exchange wholesale — the
    // prescreen drops ~all non-matching shingles inside the scan
    // stage, so shuffle volume tracks matches + the filter's false-
    // positive rate instead of corpus size.
    "text_decontaminate_bloom" -> ((s, d) => {
      graft.functions.GraftFunctions.register(s)
      val sh = GraftOps.shingles(
        load(s, d, "documents").select("doc_id", "text"), "text", 5, "sh")
      // Bloom sizing derived from the data, not pinned (ADVICE r8): the
      // raw (pre-distinct) eval shingle count is a one-number map-side
      // aggregate — sum(size(sh)) over the eval slice, no explode and
      // no distinct shuffle — and an upper bound on the NDV the filter
      // holds, so the FPP stays at the designed ~2% (8 bits/item) at
      // ANY eval-set size instead of silently degrading past a cap.
      // BloomFilterAggregate requires foldable sizing args, hence the
      // literal interpolation rather than a computed column; the count
      // job scans only the eval partition's array-size column.
      val nEval = math.max(1L,
        sh.filter(col("doc_id") % 29 === 0)
          .agg(coalesce(sum(size(col("sh"))), lit(0L))).head().getLong(0))
      val nBits = 8L * nEval
      sh.createOrReplaceTempView("__decon_sh")
      try s.sql(
        s"""WITH ev AS (SELECT DISTINCT explode(sh) AS s FROM __decon_sh
          |            WHERE doc_id % 29 = 0),
          | bf AS (SELECT bloom_agg(xxhash64(s), ${nEval}L, ${nBits}L) AS f FROM ev),
          | tr AS (SELECT doc_id, explode(sh) AS s FROM __decon_sh
          |        WHERE doc_id % 29 <> 0),
          | pre AS (SELECT doc_id, s FROM tr
          |         WHERE bloom_might_contain((SELECT f FROM bf), xxhash64(s))),
          | hits AS (SELECT pre.doc_id, count(DISTINCT pre.s) AS n_shared
          |          FROM pre JOIN ev ON pre.s = ev.s GROUP BY pre.doc_id)
          |SELECT d.doc_id, coalesce(n_shared, CAST(0 AS BIGINT)) AS n_shared,
          |  coalesce(n_shared, CAST(0 AS BIGINT)) > 0 AS contaminated
          |FROM (SELECT doc_id FROM __decon_sh WHERE doc_id % 29 <> 0) d
          |LEFT JOIN hits ON d.doc_id = hits.doc_id
          |ORDER BY d.doc_id""".stripMargin)
      // spark.sql analyzes eagerly, so the resolved plan no longer needs
      // the view — drop it rather than leak a name into the shared
      // session catalog (ADVICE r8).
      finally s.catalog.dropTempView("__decon_sh")
    }),

    // M3: Gopher-style repetition signals, map-only: duplicate-word
    // fraction, duplicate-3-gram fraction, and top-word frequency
    // ratio, each from array HOFs (O(distinct×n) per row — bounded by
    // document length, no shuffle).
    "text_repetition" -> ((s, d) =>
      load(s, d, "documents")
        .selectExpr("doc_id", "split(text, ' ') AS w")
        .selectExpr(
          "doc_id",
          "CAST(size(w) AS BIGINT) AS n_words",
          "CAST(1.0 - CAST(size(array_distinct(w)) AS DOUBLE) / size(w) AS DECIMAL(18,6)) AS dup_word_frac",
          "CAST(1.0 - CAST(size(array_distinct(transform(sequence(0, greatest(size(w) - 3, 0))," +
            " i -> concat_ws(' ', slice(w, i + 1, 3))))) AS DOUBLE)" +
            " / (greatest(size(w) - 3, 0) + 1) AS DECIMAL(18,6)) AS dup_3gram_frac",
          "CAST(CAST(array_max(transform(array_distinct(w), x -> size(filter(w, y -> y = x)))) AS DOUBLE)" +
            " / size(w) AS DECIMAL(18,6)) AS top_word_ratio")
        .orderBy("doc_id")),

    // M4: temperature-based language resampling (multilingual mix
    // rebalancing, alpha = 0.5): per-language targets ∝ sqrt(share),
    // deterministic md5-permutation pick within each language. The
    // targets frame is 5 rows → broadcast; no driver-side collect.
    "sample_weighted" -> ((s, d) => {
      val docs = load(s, d, "documents")
      val t = docs.groupBy("lang").agg(count(lit(1)).as("n"))
        .withColumn("wn", sqrt(col("n").cast("double")))
        .withColumn("wtot", sum(col("wn")).over(Window.partitionBy()))
      val tgt = t.select(col("lang"),
        greatest(lit(1L), floor(lit(200) * col("wn") / col("wtot")).cast("bigint"))
          .as("target_n"))
      docs.select(col("doc_id"), col("lang"))
        .withColumn("rn", row_number().over(Window.partitionBy("lang")
          .orderBy(md5(col("doc_id").cast("string")), col("doc_id")))
          .cast("bigint")) // DuckDB rank fns are BIGINT (SURVEY §7.4 delta)
        .join(broadcast(tgt), "lang")
        .filter(col("rn") <= col("target_n"))
        .select(col("doc_id"), col("lang"), col("rn"), col("target_n"))
        .orderBy("lang", "rn")
    }),

    // M4b (round 6): RATE-based temperature resampling — the scale
    // twin of M4. Same α = 0.5 mix target, but acceptance is a
    // deterministic md5-bucket Bernoulli at per-language rates
    // r_d ∝ n_d^(α-1), so the plan is one combinable count + a
    // broadcast of 5 thresholds + a map-only filter: NO per-language
    // window sort (M4's row_number is a global per-domain sort — the
    // part that doesn't survive 100 TB). Expected kept fraction 0.5;
    // counts are exact-deterministic given the md5 permutation.
    "sample_temperature" -> ((s, d) =>
      GraftOps.sampleTemperature(load(s, d, "documents"), "doc_id", "lang",
        alpha = 0.5, targetFrac = 0.5)
        .select("doc_id", "lang")
        .orderBy("doc_id")),

    // M5 (round 7): exact-substring span REMOVAL — the Lee et al.
    // 2022 dedup step itself, companion to dedup_substring's
    // coverage stats: every word position inside a cross-document-
    // duplicated 5-word shingle is dropped and the doc reassembled.
    // Shingle-grain shuffles only (never pairs); position-sorted
    // reassembly keeps the text deterministic under any partitioning.
    "text_dedup_spans" -> ((s, d) =>
      GraftOps.removeDuplicatedSpans(load(s, d, "documents"), "doc_id", "text",
        k = 5)
        .orderBy("doc_id")),

    // M6 (round 8): fixed-weight logistic-regression quality scorer —
    // the model-based stage of a quality gate (the heuristic stage is
    // K6 text_quality): score = σ(w·x) over three cheap features
    // (word count, English stopword ratio, punctuation density), keep
    // at score ≥ 0.5. The weights are frozen in the operator (a real
    // pipeline ships them from an offline fit); inference is MAP-ONLY
    // — per-row expressions, zero shuffle, embarrassingly parallel at
    // any corpus size. The logit is written in one fixed evaluation
    // order in both engines; keep is derived from the 6-dp-rounded
    // score so the boolean can't split on a sub-rounding float diff.
    //
    // SCORING DOMAIN IS LATIN/ENGLISH ONLY (ADVICE r8, same contract
    // as text_entropy's a-z alphabet): the `punct` feature counts
    // every char outside [a-zA-Z0-9 ] — including CJK and all other
    // non-Latin LETTERS — as punctuation, and the stopword list is
    // English, so non-Latin-script documents score ≈ σ(-10) and are
    // uniformly dropped. A multilingual gate must route by language
    // (text_langid) to per-script weights first; widening the class
    // here to \p{L} would silently change the frozen model's feature
    // definition, so the bias is documented rather than patched.
    "quality_lr_score" -> ((s, d) =>
      load(s, d, "documents")
        .filter("text IS NOT NULL AND length(text) > 0")
        .selectExpr("doc_id",
          "CAST(size(split(text, ' ')) AS BIGINT) AS wc",
          s"size(filter(split(text, ' '), w -> w IN ($lrStopList))) AS stops",
          "length(text) AS chars",
          "(length(text) - length(regexp_replace(text, '[^a-zA-Z0-9 ]', ''))) AS punct")
        .selectExpr("doc_id", "wc", s"CAST($lrLogit AS DOUBLE) AS logit")
        .selectExpr("doc_id", "wc",
          "CAST(1.0 / (1.0 + exp(-logit)) AS DECIMAL(18,6)) AS score")
        .selectExpr("doc_id", "wc", "score", "score >= 0.5 AS keep")
        .orderBy("doc_id")),

    // M7: see groupSplitCase above.
    "sample_group_split" -> ((s, d) =>
      load(s, d, "events")
        .selectExpr("user_id", "event_id",
          "CAST(conv(substring(md5(CAST(user_id AS STRING)), 1, 4), 16, 10) AS BIGINT) % 10 AS b")
        .selectExpr("user_id", "event_id", s"$groupSplitCase AS split")
        .groupBy("split")
        .agg(count(lit(1)).cast("bigint").as("n_events"),
          countDistinct(col("user_id")).cast("bigint").as("n_users"))
        .orderBy("split")),

    // M8 (round 9): TOKEN-BUDGETED mixture selection — the data-mixture
    // op a pretraining run actually executes: a global token budget
    // (half the corpus here) split equally across sources, each source
    // filled greedily in a deterministic md5-permutation order until
    // its budget is exhausted (a doc is never split; the budget is a
    // cap, so the kept set is the maximal md5-prefix under it). Plan:
    // map-only token counts → ONE 1-row broadcast agg (total tokens,
    // source count) → per-source cumulative-sum window (the same
    // per-group sort the M4 targets use) → map-only cap filter. All
    // integer arithmetic (budget = total DIV (2·n_src)) — exact and
    // order-independent cross-engine. At 100 TB the per-source window
    // sort is the only super-scan term — the same boundary documented
    // for M4, with sample_temperature as the rate-based scale twin.
    "sample_token_budget" -> ((s, d) => {
      val docs = load(s, d, "documents").filter(col("text").isNotNull)
        .select(col("doc_id"), col("source"),
          size(split(col("text"), " ")).cast("bigint").as("n_tok"))
      val tot = docs.agg(sum(col("n_tok")).as("t"),
        countDistinct(col("source")).as("ns"))
      val w = Window.partitionBy("source")
        .orderBy(md5(col("doc_id").cast("string")), col("doc_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      docs.crossJoin(broadcast(tot))
        .withColumn("budget", expr("t DIV (2 * ns)"))
        .withColumn("cum_tok", sum(col("n_tok")).over(w))
        .filter(col("cum_tok") <= col("budget"))
        .select("doc_id", "source", "n_tok", "cum_tok")
        .orderBy("source", "cum_tok", "doc_id")
    }),

    // M9 (round 11): CLASS-BALANCED downsampling — the imbalance fix a
    // classifier-training set needs: every class capped at the
    // minority class's size, members picked by the deterministic
    // md5-permutation (the M8 order), so the kept set is reproducible
    // under any partitioning. Plan: one combinable class-count agg
    // collapsed to a broadcast 1-row min; per-class row_number window;
    // map-only cap filter. At 100 TB the per-class window sort is the
    // boundary shared with M4/M8 — for hot classes it decomposes the
    // same two-level way sample_curriculum's prefix sum does.
    "sample_balanced" -> ((s, d) => {
      val docs = load(s, d, "documents").filter(col("text").isNotNull)
        .select(col("doc_id"), col("lang"))
      val cap = docs.groupBy("lang").agg(count(lit(1)).as("n"))
        .agg(min(col("n")).cast("bigint").as("cap"))
      val w = Window.partitionBy("lang")
        .orderBy(md5(col("doc_id").cast("string")), col("doc_id"))
      docs.withColumn("rn", row_number().over(w).cast("bigint"))
        .crossJoin(broadcast(cap))
        .filter(col("rn") <= col("cap"))
        .select("lang", "doc_id", "rn")
        .orderBy("lang", "rn")
    }),

    // M10 (round 11): NEGATIVE SAMPLING for contrastive training —
    // each anchor doc gets k=3 deterministic pseudo-random negatives.
    // The trick that scales: candidates pair only WITHIN an md5
    // bucket, and the per-pair "randomness" is md5(anchor|candidate)
    // — a pure function of the pair, so the sample is reproducible
    // under any partitioning, immune to rerun drift, and
    // oracle-checkable. The bucket count DERIVES from the corpus
    // (ADVICE r11 — a fixed 16 made the self-join O((n/16)^2) =
    // O(n^2)): nb = greatest(16, n DIV 256) pins the expected bucket
    // population at ~256 docs, so total candidate pairs stay
    // O(n x 256) — linear — at any corpus size; 8 md5 hex digits give
    // a 2^32 hash range, uniform to ~10^7 buckets. One combinable
    // count collapsed to a broadcast 1-row nb, one bucket-keyed
    // self-join + a per-anchor top-3 window over bounded buckets.
    "sample_negative" -> ((s, d) => {
      val base = load(s, d, "documents").filter(col("text").isNotNull)
        .select("doc_id")
      val nb = base.agg(count(lit(1)).as("n"))
        .selectExpr("greatest(CAST(16 AS BIGINT), n DIV 256) AS nb")
      val docs = base.crossJoin(broadcast(nb))
        .selectExpr("doc_id",
          "CAST(conv(substring(md5(CAST(doc_id AS STRING)), 1, 8), 16, 10)" +
            " AS BIGINT) % nb AS b")
      val cands = docs.selectExpr("b", "doc_id AS neg_id")
      val w = Window.partitionBy("doc_id").orderBy(col("pair_h"), col("neg_id"))
      docs.join(cands, "b")
        .filter(col("doc_id") =!= col("neg_id"))
        .withColumn("pair_h", md5(concat(col("doc_id").cast("string"),
          lit("|"), col("neg_id").cast("string"))))
        .withColumn("rn", row_number().over(w).cast("bigint"))
        .filter(col("rn") <= 3)
        .select("doc_id", "neg_id", "rn")
        .orderBy("doc_id", "rn")
    }),
  )

  // M7 (round 8): GROUP-level train/valid/test split — the leakage
  // guard a per-row split violates: hashing the ROW puts one user's
  // events in several splits, so eval leaks that user's behavior.
  // Bucketing on md5(user_id) (the sink_shards recipe: deterministic,
  // layout- and partitioning-independent) assigns every event of a
  // user to ONE split by construction: 0-7 train, 8 valid, 9 test.
  // Map-only assignment + one combinable 3-group rollup.
  private val groupSplitCase =
    "CASE WHEN b <= 7 THEN 'train' WHEN b = 8 THEN 'valid' ELSE 'test' END"

  // quality_lr_score building blocks — shared verbatim with the DuckDB
  // twin so the float arithmetic is evaluation-order-identical.
  private val lrStopList =
    Seq("the", "and", "of", "is", "a", "to", "in", "that", "it", "as")
      .map(w => s"'$w'").mkString(", ")
  private val lrLogit =
    "-2.0 + 0.02 * wc + 20.0 * (stops / CAST(wc AS DOUBLE)) " +
      "- 10.0 * (punct / CAST(chars AS DOUBLE))"

  val oracle: Map[String, String] = Map(
    // M9 twin: identical min-class cap and md5-permutation window.
    "sample_balanced" ->
      """WITH d AS (SELECT doc_id, lang FROM documents
        |  WHERE text IS NOT NULL),
        | cap AS (SELECT CAST(min(n) AS BIGINT) AS cap FROM
        |   (SELECT count(*) AS n FROM d GROUP BY lang) t),
        | r AS (SELECT lang, doc_id,
        |    CAST(row_number() OVER (PARTITION BY lang
        |      ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS BIGINT) AS rn
        |  FROM d)
        |SELECT lang, doc_id, rn FROM r, cap WHERE rn <= cap
        |ORDER BY lang, rn""".stripMargin,

    // M10 twin: identical bucket hash and pair-hash ordering.
    "sample_negative" ->
      """WITH nbt AS (SELECT greatest(CAST(16 AS BIGINT), count(*) // 256)
        |      AS nb
        |  FROM documents WHERE text IS NOT NULL),
        | d AS (SELECT doc_id,
        |    ('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
        |      % nb AS b
        |  FROM documents, nbt WHERE text IS NOT NULL),
        | pairs AS (SELECT a.doc_id AS doc_id, c.doc_id AS neg_id,
        |    md5(CAST(a.doc_id AS VARCHAR) || '|' || CAST(c.doc_id AS VARCHAR))
        |      AS pair_h
        |  FROM d a JOIN d c USING (b) WHERE a.doc_id <> c.doc_id),
        | r AS (SELECT doc_id, neg_id,
        |    CAST(row_number() OVER (PARTITION BY doc_id
        |      ORDER BY pair_h, neg_id) AS BIGINT) AS rn
        |  FROM pairs)
        |SELECT doc_id, neg_id, rn FROM r WHERE rn <= 3
        |ORDER BY doc_id, rn""".stripMargin,

    // M8 twin: identical integer budget arithmetic and md5-permutation
    // cumulative window.
    "sample_token_budget" ->
      """WITH d AS (SELECT doc_id, source,
        |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok
        |  FROM documents WHERE text IS NOT NULL),
        | tot AS (SELECT sum(n_tok) AS t, count(DISTINCT source) AS ns FROM d),
        | c AS (SELECT doc_id, source, n_tok,
        |    CAST(sum(n_tok) OVER (PARTITION BY source
        |      ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |      AS cum_tok
        |  FROM d)
        |SELECT doc_id, source, n_tok, cum_tok
        |FROM c, tot WHERE cum_tok <= t // (2 * ns)
        |ORDER BY source, cum_tok, doc_id""".stripMargin,
    // M7 twin: the sink_shards md5-bucket arithmetic on the GROUP key.
    "sample_group_split" ->
      s"""WITH b AS (SELECT user_id, event_id,
         |    ('0x' || substring(md5(CAST(user_id AS VARCHAR)), 1, 4))::INT % 10 AS b
         |  FROM events)
         |SELECT $groupSplitCase AS split,
         |  CAST(count(*) AS BIGINT) AS n_events,
         |  CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
         |FROM b GROUP BY 1 ORDER BY split""".stripMargin,
    "quality_lr_score" ->
      s"""WITH f AS (SELECT doc_id,
         |    CAST(len(string_split(text, ' ')) AS BIGINT) AS wc,
         |    len(list_filter(string_split(text, ' '), w -> w IN ($lrStopList))) AS stops,
         |    length(text) AS chars,
         |    (length(text) - length(regexp_replace(text, '[^a-zA-Z0-9 ]', '', 'g'))) AS punct
         |  FROM documents WHERE text IS NOT NULL AND length(text) > 0),
         | l AS (SELECT doc_id, wc, CAST($lrLogit AS DOUBLE) AS logit FROM f),
         | s AS (SELECT doc_id, wc,
         |    CAST(1.0 / (1.0 + exp(-logit)) AS DECIMAL(18,6)) AS score FROM l)
         |SELECT doc_id, wc, score, score >= 0.5 AS keep
         |FROM s ORDER BY doc_id""".stripMargin,
    // M5 twin: same positional 5-gram spans; unnest(list_transform)
    // instead of lateral generate_series (DuckDB 1.0 rejects column
    // args in the lateral form); string_agg ORDER BY p mirrors the
    // Spark side's position-sorted reassembly.
    "text_dedup_spans" ->
      """WITH w AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
        | words AS (SELECT doc_id, e['p'] AS p, e['word'] AS word FROM (
        |   SELECT doc_id, unnest(list_transform(generate_series(1, len(w)),
        |     i -> {'p': i - 1, 'word': w[i]})) AS e FROM w)),
        | st AS (SELECT doc_id, e['s'] AS s, e['sh'] AS sh FROM (
        |   SELECT doc_id, unnest(list_transform(generate_series(1, len(w) - 4),
        |     i -> {'s': i - 1, 'sh': array_to_string(w[i:i+4], ' ')})) AS e
        |   FROM w WHERE len(w) >= 5)),
        | dup AS (SELECT sh FROM st GROUP BY sh HAVING count(DISTINCT doc_id) > 1),
        | ds AS (SELECT st.doc_id, st.s FROM st JOIN dup USING (sh)),
        | cov AS (SELECT DISTINCT doc_id, s + x AS p FROM ds, generate_series(0, 4) t(x)),
        | kept AS (SELECT words.doc_id, words.p, words.word
        |          FROM words LEFT JOIN cov ON words.doc_id = cov.doc_id AND words.p = cov.p
        |          WHERE cov.p IS NULL),
        | agg AS (SELECT doc_id, count(*) AS nk,
        |           string_agg(word, ' ' ORDER BY p) AS ct
        |         FROM kept GROUP BY doc_id)
        | SELECT w.doc_id, coalesce(agg.ct, '') AS clean_text,
        |   CAST(len(w.w) - coalesce(agg.nk, 0) AS BIGINT) AS n_removed
        | FROM w LEFT JOIN agg USING (doc_id) ORDER BY doc_id""".stripMargin,
    "sample_temperature" ->
      """WITH cnt AS (SELECT lang, CAST(COUNT(*) AS BIGINT) AS n
        |             FROM documents GROUP BY lang),
        | w AS (SELECT lang, n, CAST(sqrt(CAST(n AS DOUBLE)) AS DECIMAL(18,6)) AS wn FROM cnt),
        | tot AS (SELECT CAST(SUM(n) AS BIGINT) AS nn, SUM(wn) AS den FROM w),
        | r AS (SELECT lang, CAST(floor(4294967296.0 * least(1.0,
        |         0.5 * CAST(nn AS DOUBLE) * CAST(wn AS DOUBLE)
        |           / (CAST(den AS DOUBLE) * CAST(n AS DOUBLE)))) AS BIGINT) AS thr
        |       FROM w, tot)
        |SELECT d.doc_id, d.lang FROM documents d JOIN r USING (lang)
        |WHERE CAST(('0x' || substring(md5('7:' || CAST(d.doc_id AS VARCHAR)), 1, 8)) AS BIGINT) < r.thr
        |ORDER BY d.doc_id""".stripMargin,
    "text_redact_pii" ->
      """WITH synth AS (SELECT doc_id,
        |    text || ' contact user' || doc_id || '@example.com or +1-555-'
        |      || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
        |      || ' card 4111111111111111' AS t
        |  FROM documents)
        | SELECT doc_id,
        |  regexp_replace(regexp_replace(regexp_replace(t,
        |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
        |    '\+?[0-9]{1,3}-[0-9]{3}-[0-9]{4}', '<PHONE>', 'g'),
        |    '[0-9]{13,16}', '<CARD>', 'g') AS redacted,
        |  CAST(len(regexp_extract_all(t, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS BIGINT) AS n_emails,
        |  CAST(len(regexp_extract_all(t, '\+?[0-9]{1,3}-[0-9]{3}-[0-9]{4}')) AS BIGINT) AS n_phones,
        |  CAST(len(regexp_extract_all(t, '[0-9]{13,16}')) AS BIGINT) AS n_cards
        | FROM synth ORDER BY doc_id""".stripMargin,
    "text_decontaminate" ->
      """WITH sh AS (SELECT doc_id,
        |    list_distinct(list_transform(generate_series(1, greatest(len(string_split(text, ' ')) - 4, 1)),
        |      i -> array_to_string((string_split(text, ' '))[i:i+4], ' '))) AS shingles
        |  FROM documents),
        | ev AS (SELECT DISTINCT unnest(shingles) AS s FROM sh WHERE doc_id % 29 = 0),
        | tr AS (SELECT doc_id, unnest(shingles) AS s FROM sh WHERE doc_id % 29 <> 0),
        | hits AS (SELECT tr.doc_id, count(DISTINCT tr.s) AS n_shared
        |          FROM tr JOIN ev ON tr.s = ev.s GROUP BY tr.doc_id)
        | SELECT d.doc_id, coalesce(n_shared, 0) AS n_shared,
        |   coalesce(n_shared, 0) > 0 AS contaminated
        | FROM (SELECT doc_id FROM documents WHERE doc_id % 29 <> 0) d
        | LEFT JOIN hits ON d.doc_id = hits.doc_id
        | ORDER BY d.doc_id""".stripMargin,
    // M2b twin: the bloom prescreen is invisible to semantics (no
    // false negatives; the exact join kills false positives), so the
    // oracle is text_decontaminate's, verbatim.
    "text_decontaminate_bloom" ->
      """WITH sh AS (SELECT doc_id,
        |    list_distinct(list_transform(generate_series(1, greatest(len(string_split(text, ' ')) - 4, 1)),
        |      i -> array_to_string((string_split(text, ' '))[i:i+4], ' '))) AS shingles
        |  FROM documents),
        | ev AS (SELECT DISTINCT unnest(shingles) AS s FROM sh WHERE doc_id % 29 = 0),
        | tr AS (SELECT doc_id, unnest(shingles) AS s FROM sh WHERE doc_id % 29 <> 0),
        | hits AS (SELECT tr.doc_id, count(DISTINCT tr.s) AS n_shared
        |          FROM tr JOIN ev ON tr.s = ev.s GROUP BY tr.doc_id)
        | SELECT d.doc_id, coalesce(n_shared, 0) AS n_shared,
        |   coalesce(n_shared, 0) > 0 AS contaminated
        | FROM (SELECT doc_id FROM documents WHERE doc_id % 29 <> 0) d
        | LEFT JOIN hits ON d.doc_id = hits.doc_id
        | ORDER BY d.doc_id""".stripMargin,
    "text_repetition" ->
      """WITH w AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
        | sh AS (SELECT doc_id, w,
        |    list_transform(generate_series(1, greatest(len(w) - 2, 1)),
        |      i -> array_to_string(w[i:i+2], ' ')) AS g3 FROM w)
        | SELECT doc_id,
        |  CAST(len(w) AS BIGINT) AS n_words,
        |  CAST(1.0 - CAST(len(list_distinct(w)) AS DOUBLE) / len(w) AS DECIMAL(18,6)) AS dup_word_frac,
        |  CAST(1.0 - CAST(len(list_distinct(g3)) AS DOUBLE) / len(g3) AS DECIMAL(18,6)) AS dup_3gram_frac,
        |  CAST(CAST(list_max(list_transform(list_distinct(w), x -> len(list_filter(w, y -> y = x)))) AS DOUBLE)
        |    / len(w) AS DECIMAL(18,6)) AS top_word_ratio
        | FROM sh ORDER BY doc_id""".stripMargin,
    "sample_weighted" ->
      """WITH c AS (SELECT lang, count(*) AS n FROM documents GROUP BY lang),
        | t AS (SELECT lang, n, sqrt(CAST(n AS DOUBLE)) AS wn,
        |         sum(sqrt(CAST(n AS DOUBLE))) OVER () AS wtot FROM c),
        | tgt AS (SELECT lang, CAST(greatest(1, floor(200 * wn / wtot)) AS BIGINT) AS target_n FROM t),
        | r AS (SELECT doc_id, d.lang AS lang,
        |         row_number() OVER (PARTITION BY d.lang
        |           ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn
        |       FROM documents d)
        | SELECT r.doc_id, r.lang, r.rn, tgt.target_n
        | FROM r JOIN tgt ON r.lang = tgt.lang
        | WHERE rn <= target_n ORDER BY r.lang, r.rn""".stripMargin,
  )
}
