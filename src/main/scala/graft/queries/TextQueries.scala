package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.Tables.load
import graft.api.GraftOps

/** Text-analysis operators for large-scale training-data pipelines
  * (builder mandate alongside SURVEY.md §2.K): language-ID, quality
  * scoring, token counting, document fingerprinting.
  *
  * All four are pure scalar pipelines — per-row expressions with no
  * shuffle at all (the aggregations live in K5/K6). That is the shape
  * that matters at 100 TB: a language-ID or quality-score pass is a
  * map-only job that parallelizes to any number of executors.
  */
object TextQueries {

  // Marker stopwords per language (public common-word lists).
  private val markers = Map(
    "de" -> Seq("der", "die", "und", "das", "ist"),
    "en" -> Seq("the", "and", "of", "is", "a"),
    "es" -> Seq("el", "la", "de", "que", "es"),
    "fr" -> Seq("le", "la", "et", "les", "est"),
    "zh" -> Seq("的", "是", "了", "在", "和"))

  private def markerCountDuck(lang: String): String = {
    val list = markers(lang).map(w => s"'$w'").mkString(", ")
    s"len(list_filter(string_split(text, ' '), w -> w IN ($list)))"
  }

  // Deterministic argmax chain: earlier (alphabetical) language wins ties.
  private def predictedCase(score: String => String): String =
    s"""CASE
       | WHEN ${score("de")} >= ${score("en")} AND ${score("de")} >= ${score("es")}
       |  AND ${score("de")} >= ${score("fr")} AND ${score("de")} >= ${score("zh")} THEN 'de'
       | WHEN ${score("en")} >= ${score("es")} AND ${score("en")} >= ${score("fr")}
       |  AND ${score("en")} >= ${score("zh")} THEN 'en'
       | WHEN ${score("es")} >= ${score("fr")} AND ${score("es")} >= ${score("zh")} THEN 'es'
       | WHEN ${score("fr")} >= ${score("zh")} THEN 'fr'
       | ELSE 'zh' END""".stripMargin

  // Round 18 (guide §1.2 "per-task work"): marker counts over a
  // PRE-SPLIT word array column. Inlining markerCount into
  // predictedCase evaluated size(filter(split(text)…)) up to 20× per
  // row — codegen's subexpression elimination does not hoist
  // expressions that only occur under later CASE branches (they are
  // conditionally executed), so every branch predicate re-split the
  // text. Staging the split (once) and the five scores (once each) as
  // their own projections leaves the argmax CASE comparing plain
  // columns; CollapseProject keeps the stages separate because the
  // aliases are multiply-referenced and non-cheap. Same scores, same
  // argmax, same oracle.
  private def markerCountOn(arr: String)(lang: String): String = {
    val list = markers(lang).map(w => s"'$w'").mkString(", ")
    s"size(filter($arr, w -> w IN ($list)))"
  }

  private def scoreCols(pre: Seq[String]): Seq[String] =
    pre ++ Seq("de", "en", "es", "fr", "zh").map(l =>
      s"CAST(${markerCountOn("__w")(l)} AS BIGINT) AS score_$l")

  private val argmaxCase: String = predictedCase(l => s"score_$l")

  val queries: Map[String, Q] = Map(
    // Language-ID: n-gram/marker-word heuristic, argmax over per-lang
    // scores with a deterministic tie-break.
    "text_langid" -> ((s, d) =>
      load(s, d, "documents")
        .selectExpr("doc_id", "lang", "split(text, ' ') AS __w")
        .selectExpr(scoreCols(Seq("doc_id", "lang")): _*)
        .selectExpr("doc_id", "lang", "score_de", "score_en", "score_es",
          "score_fr", "score_zh", s"$argmaxCase AS predicted")
        .withColumn("hit", (col("predicted") === col("lang")))
        .orderBy("doc_id")),

    // BPE-style vocabulary induction, step 1 (round 5): most frequent
    // adjacent character pairs. The 100 TB trick is counting over the
    // WORD-COUNT VOCABULARY, not the corpus: corpus → (word, count) is
    // one heavily-combinable shuffle, then the pair explode runs over
    // the vocabulary (≪ corpus) with counts as weights — exactly how
    // production BPE trainers amortize merge rounds.
    "vocab_bpe_pairs" -> ((s, d) => {
      val words = load(s, d, "documents")
        .select(explode(split(lower(col("text")), "[^a-z]+")).as("w"))
        .filter(length(col("w")) >= 2)
        .groupBy("w").agg(count(lit(1)).as("wc"))
      words
        .select(explode(expr(
          "transform(sequence(1, length(w) - 1), i -> substring(w, i, 2))")).as("pair"),
          col("wc"))
        .groupBy("pair").agg(sum(col("wc")).cast("bigint").as("n"))
        .orderBy(desc("n"), col("pair")).limit(20)
    }),

    // BPE APPLY (round 7) — the tokenize step whose merges the query
    // above LEARNS: top-20 char-pair merges applied greedily in rank
    // order to the top-200 vocabulary words (weights ride along, so
    // corpus token counts are one multiply away). Vocabulary-grain:
    // cost is |vocab| × |merges|, independent of corpus size. The
    // double-space `replace` fold is deterministic string algebra →
    // full recursive-CTE oracle.
    "vocab_bpe_apply" -> ((s, d) => {
      val words = load(s, d, "documents")
        .select(explode(split(lower(col("text")), "[^a-z]+")).as("w"))
        .filter(length(col("w")) >= 2)
        .groupBy("w").agg(count(lit(1)).as("wc"))
      val top = words.orderBy(desc("wc"), col("w")).limit(200)
      val merges = words
        .select(explode(expr(
          "transform(sequence(1, length(w) - 1), i -> substring(w, i, 2))")).as("pair"),
          col("wc"))
        .groupBy("pair").agg(sum(col("wc")).cast("bigint").as("n"))
        .orderBy(desc("n"), col("pair")).limit(20)
        .withColumn("r", row_number().over(
          org.apache.spark.sql.expressions.Window.orderBy(desc("n"), col("pair"))))
      GraftOps.bpeApply(top, "w", merges, "pair", "r")
        .withColumn("n_sym", size(split(col("toks"), " ")).cast("bigint"))
        .select("w", "wc", "toks", "n_sym")
        .orderBy("w")
    }),

    // CORPUS-grain BPE tokenization (round 8) — the production
    // tokenizer-throughput shape: merges are applied ONCE per distinct
    // word (the vocabulary map-reduce amortization — |vocab| ×
    // |merges| string scans, independent of corpus size), then every
    // word OCCURRENCE picks up its token count through a hash join on
    // the word, and per-document counts are a combinable sum. At
    // 100 TB the corpus explode shuffles narrow (doc_id, w) rows on w
    // — document text never rides a shuffle — and the vocab side is
    // tiny relative to occurrences (AQE broadcasts it when it fits).
    // Deterministic string algebra end to end → full recursive-CTE
    // oracle at corpus grain.
    "text_tokenize_bpe" -> ((s, d) => {
      val occ = load(s, d, "documents")
        .select(col("doc_id"), explode(split(lower(col("text")), "[^a-z]+")).as("w"))
        .filter(length(col("w")) >= 2)
      val vocab = occ.groupBy("w").agg(count(lit(1)).as("wc"))
      val merges = vocab
        .select(explode(expr(
          "transform(sequence(1, length(w) - 1), i -> substring(w, i, 2))")).as("pair"),
          col("wc"))
        .groupBy("pair").agg(sum(col("wc")).cast("bigint").as("n"))
        .orderBy(desc("n"), col("pair")).limit(20)
        .withColumn("r", row_number().over(
          org.apache.spark.sql.expressions.Window.orderBy(desc("n"), col("pair"))))
      val tokenized = GraftOps.bpeApply(vocab.select("w"), "w", merges, "pair", "r")
        .withColumn("n_sym", size(split(col("toks"), " ")).cast("bigint"))
        .select("w", "n_sym")
      occ.join(tokenized, "w")
        .groupBy("doc_id")
        .agg(count(lit(1)).cast("bigint").as("n_words"),
          sum(col("n_sym")).cast("bigint").as("n_tokens"))
        .withColumn("tok_per_word",
          (col("n_tokens").cast("double") / col("n_words").cast("double"))
            .cast(org.apache.spark.sql.types.DecimalType(18, 6)))
        .orderBy("doc_id")
    }),

    // Classifier evaluation (round 5): per-class precision/recall/F1 of
    // the langid heuristic against the gold `lang` label. The corpus
    // collapses to a ≤|classes|² confusion matrix in ONE combinable
    // shuffle; the metric algebra runs on that tiny table (broadcast
    // cross join with the class list). Ratios stay DOUBLE end-to-end —
    // identical IEEE expression shape on both engines.
    "eval_confusion" -> ((s, d) => {
      import s.implicits._
      // round 18: staged split + scores (see markerCountOn) — the CASE
      // argmax compares columns instead of re-splitting text per branch
      val cm = load(s, d, "documents")
        .selectExpr("lang", "split(text, ' ') AS __w")
        .selectExpr(scoreCols(Seq("lang")): _*)
        .selectExpr("lang", s"$argmaxCase AS predicted")
        .groupBy("lang", "predicted").agg(count(lit(1)).as("n"))
      val cls = Seq("de", "en", "es", "fr", "zh").toDF("class")
      cls.crossJoin(cm).groupBy("class").agg(
          coalesce(sum(when(col("lang") === col("class") &&
            col("predicted") === col("class"), col("n"))), lit(0L)).as("tp"),
          coalesce(sum(when(col("predicted") === col("class") &&
            col("lang") =!= col("class"), col("n"))), lit(0L)).as("fp"),
          coalesce(sum(when(col("lang") === col("class") &&
            col("predicted") =!= col("class"), col("n"))), lit(0L)).as("fn"),
          coalesce(sum(when(col("lang") === col("class"), col("n"))), lit(0L)).as("support"))
        .selectExpr("class", "tp", "fp", "fn", "support",
          "CAST(tp AS DOUBLE) / nullif(tp + fp, 0) AS precision",
          "CAST(tp AS DOUBLE) / nullif(tp + fn, 0) AS recall",
          "2 * (CAST(tp AS DOUBLE) / nullif(tp + fp, 0)) * (CAST(tp AS DOUBLE) / nullif(tp + fn, 0))" +
            " / nullif(CAST(tp AS DOUBLE) / nullif(tp + fp, 0)" +
            " + CAST(tp AS DOUBLE) / nullif(tp + fn, 0), 0) AS f1")
        .orderBy("class")
    }),

    // Quality scoring: length / word-shape / stopword-ratio features
    // combined into a deterministic polynomial score.
    "text_quality" -> ((s, d) =>
      load(s, d, "documents").selectExpr(
        "doc_id",
        "CAST(length(text) AS BIGINT) AS n_chars_txt",
        "CAST(size(split(text, ' ')) AS BIGINT) AS n_words",
        "CAST(length(replace(text, ' ', '')) AS BIGINT) AS n_nonspace",
        "CAST(length(replace(text, ' ', '')) AS DOUBLE) / size(split(text, ' ')) AS avg_wlen",
        "CAST(size(filter(split(text, ' '), w -> w IN ('the', 'and', 'of', 'a', 'in', 'to'))) AS DOUBLE)" +
          " / size(split(text, ' ')) AS stop_ratio")
        .withColumn("quality",
          (lit(0.5) * col("stop_ratio") + lit(0.1) * col("avg_wlen"))
            .cast(DecimalType(18, 6)))
        .orderBy("doc_id")),

    // Token counting: whitespace tokens, regex (BPE-ish) tokens,
    // distinct tokens, chars/4 budget estimate.
    "text_tokens" -> ((s, d) =>
      load(s, d, "documents").selectExpr(
        "doc_id",
        "CAST(size(split(text, ' ')) AS BIGINT) AS ws_tokens",
        "CAST(size(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]', 0)) AS BIGINT) AS re_tokens",
        "CAST(size(array_distinct(split(text, ' '))) AS BIGINT) AS distinct_tokens",
        "CAST(ceil(length(replace(text, ' ', '')) / 4.0) AS BIGINT) AS est_bpe")
        .orderBy("doc_id")),

    // Document fingerprinting: content hash + leading-shingle hash —
    // the join keys an exact/near dedup pipeline runs on.
    "text_fingerprint" -> ((s, d) =>
      load(s, d, "documents").selectExpr(
        "doc_id",
        "md5(lower(trim(text))) AS fp",
        "md5(concat_ws(' ', slice(split(text, ' '), 1, 5))) AS prefix_fp",
        "CAST(size(split(text, ' ')) AS BIGINT) AS n_words")
        .orderBy("doc_id")),

    // K7 (round 8): character-level Shannon entropy over [a-z] of the
    // lowercased text — the classic gibberish/binary-spill filter
    // (natural language sits ~3.5-4.2 bits; keyboard mash and
    // base64 blobs sit at the extremes; CJK scores 0 here by design —
    // its codepoints are outside the a-z alphabet this filter rates).
    // MAP-ONLY, zero shuffle. Computed by the custom CharEntropy
    // expression — ONE byte scan per row instead of the 26-replace
    // SQL spelling's 26 full string scans — with a pinned arithmetic
    // contract: same fixed a→z fold, same log2 bits, so it is
    // output-identical to the 26-term formulation the DuckDB oracle
    // mirrors (bit-equality asserted in Round8OpsSpec).
    "text_entropy" -> ((s, d) => {
      graft.functions.GraftFunctions.register(s)
      load(s, d, "documents")
        .filter("text IS NOT NULL")
        .selectExpr("doc_id", "char_entropy(lower(text)) AS ce")
        .selectExpr("doc_id",
          "ce.n_letters AS n_letters",
          "CAST(ce.entropy AS DECIMAL(18,6)) AS entropy")
        .orderBy("doc_id")
    }),
  )

  /** The 26-replace SQL spelling of text_entropy (the formulation the
    * DuckDB oracle mirrors) — kept as the reference the CharEntropy
    * expression is bit-compared against in tests.
    */
  private[graft] def entropyBySql(s: org.apache.spark.sql.SparkSession,
      d: String): org.apache.spark.sql.DataFrame =
    load(s, d, "documents")
      .filter("text IS NOT NULL")
      .selectExpr("doc_id", "lower(text) AS t")
      .selectExpr("doc_id" +: az.map(c => s"${letterCount(c)} AS n_$c"): _*)
      .selectExpr(("doc_id" +: az.map(c => s"n_$c")) :+ s"($letterSum) AS n": _*)
      .selectExpr("doc_id",
        "CAST(n AS BIGINT) AS n_letters",
        s"CAST(CASE WHEN n = 0 THEN 0.0 ELSE -($entropySum) END AS DECIMAL(18,6)) AS entropy")
      .orderBy("doc_id")

  // text_entropy building blocks — the SAME SQL fragments feed the
  // Spark selectExpr and the DuckDB oracle, so the arithmetic (and its
  // left-to-right evaluation order) is textually identical cross-engine.
  private val az = ('a' to 'z').map(_.toString)
  private def letterCount(c: String): String =
    s"(length(t) - length(replace(t, '$c', '')))"
  private val letterSum = az.map(c => s"n_$c").mkString(" + ")
  private def entropyTerm(c: String): String =
    s"CASE WHEN n_$c = 0 THEN CAST(0.0 AS DOUBLE) ELSE " +
      s"(CAST(n_$c AS DOUBLE) / CAST(n AS DOUBLE)) * log2(CAST(n_$c AS DOUBLE) / CAST(n AS DOUBLE)) END"
  private val entropySum = az.map(entropyTerm).mkString(" + ")

  val oracle: Map[String, String] = Map(
    "text_entropy" ->
      s"""WITH t0 AS (SELECT doc_id, lower(text) AS t FROM documents
         |            WHERE text IS NOT NULL),
         | c0 AS (SELECT doc_id, ${az.map(c => s"${letterCount(c)} AS n_$c").mkString(", ")} FROM t0),
         | s0 AS (SELECT *, ($letterSum) AS n FROM c0)
         |SELECT doc_id, CAST(n AS BIGINT) AS n_letters,
         |  CAST(CASE WHEN n = 0 THEN 0.0 ELSE -($entropySum) END AS DECIMAL(18,6)) AS entropy
         |FROM s0 ORDER BY doc_id""".stripMargin,
    // round-7 twin of vocab_bpe_apply: same learn (top-20 pairs) +
    // greedy double-space replace fold, expressed as a recursive CTE
    // over merge rank.
    "vocab_bpe_apply" ->
      """WITH RECURSIVE
        | words AS (SELECT w, count(*) AS wc FROM (
        |     SELECT unnest(string_split_regex(lower(text), '[^a-z]+')) AS w FROM documents) t
        |   WHERE length(w) >= 2 GROUP BY w),
        | topw AS (SELECT w, wc FROM words ORDER BY wc DESC, w LIMIT 200),
        | pairs AS (SELECT pair, CAST(sum(wc) AS BIGINT) AS n FROM (
        |     SELECT unnest(list_transform(generate_series(1, length(w) - 1),
        |       i -> substring(w, i, 2))) AS pair, wc FROM words) t
        |   GROUP BY pair),
        | merges AS (SELECT pair, row_number() OVER (ORDER BY n DESC, pair) AS r
        |            FROM (SELECT * FROM pairs ORDER BY n DESC, pair LIMIT 20) t),
        | appl AS (
        |   SELECT w, wc, '  ' || regexp_replace(w, '(.)', '\1  ', 'g') AS s, 0 AS r FROM topw
        |   UNION ALL
        |   SELECT a.w, a.wc,
        |     replace(a.s, ' ' || substring(m.pair, 1, 1) || '  ' || substring(m.pair, 2, 1) || ' ',
        |       ' ' || m.pair || ' '), a.r + 1
        |   FROM appl a JOIN merges m ON m.r = a.r + 1)
        | SELECT w, wc, trim(regexp_replace(s, '  +', ' ', 'g')) AS toks,
        |   CAST(len(string_split(trim(regexp_replace(s, '  +', ' ', 'g')), ' ')) AS BIGINT) AS n_sym
        | FROM appl WHERE r = (SELECT max(r) FROM merges) ORDER BY w""".stripMargin,
    // corpus-grain twin: same learn + greedy fold applied to the FULL
    // vocabulary, joined back to word occurrences for per-doc sums.
    "text_tokenize_bpe" ->
      """WITH RECURSIVE
        | occ AS (SELECT doc_id, w FROM (
        |     SELECT doc_id, unnest(string_split_regex(lower(text), '[^a-z]+')) AS w
        |     FROM documents) t
        |   WHERE length(w) >= 2),
        | words AS (SELECT w, count(*) AS wc FROM occ GROUP BY w),
        | pairs AS (SELECT pair, CAST(sum(wc) AS BIGINT) AS n FROM (
        |     SELECT unnest(list_transform(generate_series(1, length(w) - 1),
        |       i -> substring(w, i, 2))) AS pair, wc FROM words) t
        |   GROUP BY pair),
        | merges AS (SELECT pair, row_number() OVER (ORDER BY n DESC, pair) AS r
        |            FROM (SELECT * FROM pairs ORDER BY n DESC, pair LIMIT 20) t),
        | appl AS (
        |   SELECT w, '  ' || regexp_replace(w, '(.)', '\1  ', 'g') AS s, 0 AS r FROM words
        |   UNION ALL
        |   SELECT a.w,
        |     replace(a.s, ' ' || substring(m.pair, 1, 1) || '  ' || substring(m.pair, 2, 1) || ' ',
        |       ' ' || m.pair || ' '), a.r + 1
        |   FROM appl a JOIN merges m ON m.r = a.r + 1),
        | tok AS (SELECT w,
        |     CAST(len(string_split(trim(regexp_replace(s, '  +', ' ', 'g')), ' ')) AS BIGINT) AS n_sym
        |   FROM appl WHERE r = (SELECT max(r) FROM merges))
        | SELECT o.doc_id, CAST(count(*) AS BIGINT) AS n_words,
        |   CAST(sum(t.n_sym) AS BIGINT) AS n_tokens,
        |   CAST(CAST(sum(t.n_sym) AS DOUBLE) / count(*) AS DECIMAL(18,6)) AS tok_per_word
        | FROM occ o JOIN tok t USING (w)
        | GROUP BY o.doc_id ORDER BY o.doc_id""".stripMargin,
    "text_langid" ->
      s"""SELECT doc_id, lang,
         | CAST(${markerCountDuck("de")} AS BIGINT) AS score_de,
         | CAST(${markerCountDuck("en")} AS BIGINT) AS score_en,
         | CAST(${markerCountDuck("es")} AS BIGINT) AS score_es,
         | CAST(${markerCountDuck("fr")} AS BIGINT) AS score_fr,
         | CAST(${markerCountDuck("zh")} AS BIGINT) AS score_zh,
         | ${predictedCase(markerCountDuck)} AS predicted,
         | ${predictedCase(markerCountDuck)} = lang AS hit
         | FROM documents ORDER BY doc_id""".stripMargin,
    "vocab_bpe_pairs" ->
      """WITH words AS (
        |   SELECT w, count(*) AS wc FROM (
        |     SELECT unnest(string_split_regex(lower(text), '[^a-z]+')) AS w
        |     FROM documents) t
        |   WHERE length(w) >= 2 GROUP BY w
        | ), pairs AS (
        |   SELECT unnest(list_transform(range(1, length(w)),
        |     i -> substr(w, CAST(i AS INT), 2))) AS pair, wc
        |   FROM words)
        | SELECT pair, CAST(sum(wc) AS BIGINT) AS n FROM pairs
        | GROUP BY pair ORDER BY n DESC, pair LIMIT 20""".stripMargin,
    "eval_confusion" ->
      s"""WITH cm AS (
         |   SELECT lang, ${predictedCase(markerCountDuck)} AS predicted, count(*) AS n
         |   FROM documents GROUP BY 1, 2),
         | counts AS (
         |   SELECT c.class,
         |    CAST(coalesce(sum(CASE WHEN cm.lang = c.class AND cm.predicted = c.class THEN cm.n END), 0) AS BIGINT) AS tp,
         |    CAST(coalesce(sum(CASE WHEN cm.predicted = c.class AND cm.lang <> c.class THEN cm.n END), 0) AS BIGINT) AS fp,
         |    CAST(coalesce(sum(CASE WHEN cm.lang = c.class AND cm.predicted <> c.class THEN cm.n END), 0) AS BIGINT) AS fn,
         |    CAST(coalesce(sum(CASE WHEN cm.lang = c.class THEN cm.n END), 0) AS BIGINT) AS support
         |   FROM (SELECT unnest(['de','en','es','fr','zh']) AS class) c
         |   CROSS JOIN cm GROUP BY c.class)
         | SELECT class, tp, fp, fn, support,
         |   CAST(tp AS DOUBLE) / nullif(tp + fp, 0) AS precision,
         |   CAST(tp AS DOUBLE) / nullif(tp + fn, 0) AS recall,
         |   2 * (CAST(tp AS DOUBLE) / nullif(tp + fp, 0)) * (CAST(tp AS DOUBLE) / nullif(tp + fn, 0))
         |     / nullif(CAST(tp AS DOUBLE) / nullif(tp + fp, 0)
         |     + CAST(tp AS DOUBLE) / nullif(tp + fn, 0), 0) AS f1
         | FROM counts ORDER BY class""".stripMargin,
    "text_quality" ->
      """SELECT doc_id,
        | CAST(length(text) AS BIGINT) AS n_chars_txt,
        | CAST(len(string_split(text, ' ')) AS BIGINT) AS n_words,
        | CAST(length(replace(text, ' ', '')) AS BIGINT) AS n_nonspace,
        | CAST(length(replace(text, ' ', '')) AS DOUBLE) / len(string_split(text, ' ')) AS avg_wlen,
        | CAST(len(list_filter(string_split(text, ' '), w -> w IN ('the', 'and', 'of', 'a', 'in', 'to'))) AS DOUBLE)
        |   / len(string_split(text, ' ')) AS stop_ratio,
        | CAST(0.5 * (CAST(len(list_filter(string_split(text, ' '), w -> w IN ('the', 'and', 'of', 'a', 'in', 'to'))) AS DOUBLE)
        |   / len(string_split(text, ' ')))
        |  + 0.1 * (CAST(length(replace(text, ' ', '')) AS DOUBLE) / len(string_split(text, ' '))) AS DECIMAL(18,6)) AS quality
        | FROM documents ORDER BY doc_id""".stripMargin,
    "text_tokens" ->
      """SELECT doc_id,
        | CAST(len(string_split(text, ' ')) AS BIGINT) AS ws_tokens,
        | CAST(len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]')) AS BIGINT) AS re_tokens,
        | CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT) AS distinct_tokens,
        | CAST(ceil(length(replace(text, ' ', '')) / 4.0) AS BIGINT) AS est_bpe
        | FROM documents ORDER BY doc_id""".stripMargin,
    "text_fingerprint" ->
      """SELECT doc_id,
        | md5(lower(trim(text))) AS fp,
        | md5(array_to_string((string_split(text, ' '))[1:5], ' ')) AS prefix_fp,
        | CAST(len(string_split(text, ' ')) AS BIGINT) AS n_words
        | FROM documents ORDER BY doc_id""".stripMargin,
  )
}
