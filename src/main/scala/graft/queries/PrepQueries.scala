package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.Tables.{dec, load}

/** Family N — round-4 training-data prep + OLAP extensions (ref: n/a,
  * SURVEY §0 — surface extrapolated from the §2 contract families):
  * RAG chunking, token-budget sequence packing, URL canonical dedup,
  * boilerplate-line removal, per-key EWMA smoothing, SCD2 dimension
  * versioning, fixed-width histograms, deterministic mode, TPC-H Q5,
  * and binary-payload dedup.
  *
  * Scale shapes (the 100 TB contract):
  *  - N1 text_chunk / N3 dedup_url / N10 multimodal_dedup are map-only
  *    or one-window-shuffle pipelines; no joins.
  *  - N2 pack_sequences packs PER LANGUAGE partition — the global
  *    concat order a single-sequence packer needs is the part that
  *    cannot scale, so the operator contract is per-shard packing
  *    (shard = lang here), one shuffle on the shard key.
  *  - N4 text_boilerplate aggregates line document-frequencies per
  *    source (one shuffle) and joins them back map-side broadcastable
  *    at per-source cardinality.
  *  - N5 ts_ewma is sequential per key by definition; one shuffle on
  *    user_id, then a linear fold per key (bounded series — events per
  *    user are session-scale; unbounded series would stream through
  *    I6's stateful path instead).
  *  - N6 dml_scd2 is two window passes sharing ONE o_custkey shuffle.
  *  - N9 tpch_q5 broadcasts the filtered dim chain (region→nation→
  *    supplier); the lineitem fact shuffles once for the orders join.
  */
object PrepQueries {

  val queries: Map[String, Q] = Map(
    // N1: RAG chunking — overlapping token windows (size 32, stride
    // 24). Chunk starts walk the token array at stride offsets; slice
    // clamps the final window. Map-only (sequence/transform/slice stay
    // in codegen); the explode multiplies rows ~2-4x, never data-size².
    "text_chunk" -> ((s, d) =>
      load(s, d, "documents")
        .select(col("doc_id"), split(col("text"), " ").as("w"))
        .select(col("doc_id"), posexplode(expr(
          "transform(sequence(0, CAST((size(w)-1) DIV 24 AS INT)), i -> slice(w, i*24+1, 32))")))
        .select(col("doc_id"), col("pos").cast("bigint").as("chunk_id"),
          size(col("col")).cast("bigint").as("n_tok"),
          array_join(col("col"), " ").as("chunk"))
        .orderBy("doc_id", "chunk_id")),

    // N2: token-budget sequence packing (budget 256). Documents are
    // deterministically shuffled (md5 permutation) within each lang
    // shard, then assigned the bin their START offset falls in —
    // start-offset binning is the prefix-sum-expressible relaxation of
    // greedy first-fit (a bin may overflow by at most one document's
    // tail), the standard distributed packing compromise.
    "pack_sequences" -> ((s, d) => {
      val w = Window.partitionBy("lang")
        .orderBy(md5(col("doc_id").cast("string")), col("doc_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      load(s, d, "documents")
        .select(col("doc_id"), col("lang"),
          size(split(col("text"), " ")).cast("bigint").as("n_tok"))
        .withColumn("offset", sum(col("n_tok")).over(w) - col("n_tok"))
        .withColumn("bin_id", expr("offset DIV 256"))
        .orderBy("doc_id")
    }),

    // N3: URL canonicalization + dedup. The corpus has no url column,
    // so the query plants one deterministic URL per document (scheme
    // case, www, utm tracking params, and — every 5th doc — a REAL
    // query param after a tracking one, exercising the punctuation
    // repair) and the operator canonicalizes via
    // GraftOps.canonicalizeUrl, then marks each canonical group's
    // minimum doc_id as the kept representative. One window shuffle on
    // the canonical key; no join.
    "dedup_url" -> ((s, d) => {
      val url = concat(
        when(col("doc_id") % 2 === 0, lit("HTTPS://www.")).otherwise(lit("http://")),
        col("source"), lit(".example.com/p/"), (col("doc_id") % 10).cast("string"),
        when(col("doc_id") % 3 === 0,
          concat(lit("?utm_source=feed&utm_id="), col("doc_id").cast("string"),
            when(col("doc_id") % 5 === 0, lit("&page=2")).otherwise(lit(""))))
          .otherwise(lit("")))
      val canon = graft.api.GraftOps.canonicalizeUrl(url)
      val g = Window.partitionBy("canon_url")
      load(s, d, "documents").withColumn("canon_url", canon)
        .select(col("doc_id"), col("canon_url"),
          count(lit(1)).over(g).as("dup_count"),
          (col("doc_id") === min(col("doc_id")).over(g)).as("is_canonical"))
        .orderBy("doc_id")
    }),

    // N4: boilerplate-line removal (C4-style). Plants a per-source
    // copyright footer on every doc and a "subscribe" line on every
    // third, splits to lines, computes each line's document frequency
    // WITHIN its source, drops lines appearing in >= 5 docs of the
    // source, and reassembles the survivors in original line order.
    // The df table is per-source line counts (tiny — one row per
    // distinct line) joined back to the exploded lines.
    "text_boilerplate" -> ((s, d) => {
      val t = concat(col("text"),
        lit("\ncopyright (c) "), col("source"), lit(" media"),
        when(col("doc_id") % 3 === 0, lit("\nsubscribe to our newsletter"))
          .otherwise(concat(lit("\nfooter id "), col("doc_id").cast("string"))))
      val lines = load(s, d, "documents").withColumn("t", t)
        .select(col("doc_id"), col("source"), posexplode(split(col("t"), "\n")))
        .withColumnRenamed("col", "line")
      val df = lines.groupBy("source", "line")
        .agg(countDistinct(col("doc_id")).as("df"))
      lines.join(df, Seq("source", "line"))
        .filter(col("df") < 5)
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_kept"),
          array_join(expr("transform(array_sort(collect_list(struct(pos, line))), x -> x.line)"),
            "\n").as("clean_text"))
        .orderBy("doc_id")
    }),

    // N5: exponentially weighted moving average per user (alpha=0.3,
    // s_1 = x_1), the classic time-series smoother. Sequential per key
    // by definition: one shuffle groups each user's (bounded,
    // session-scale) series, a linear fold computes every prefix's
    // EWMA, zip_with + posexplode restores one row per event. The fold
    // order is (ts, event_id) — bit-identical to the oracle's
    // recursive-CTE fold.
    "ts_ewma" -> ((s, d) =>
      load(s, d, "events")
        .select(col("user_id"), col("event_id"), col("ts"), col("value"))
        .groupBy("user_id")
        .agg(expr("array_sort(collect_list(struct(ts, event_id, value)))").as("sorted"))
        .withColumn("ewmas", expr(
          """aggregate(sorted,
            |  named_struct('prev', CAST(NULL AS DOUBLE), 'out', CAST(array() AS ARRAY<DOUBLE>)),
            |  (a, x) -> named_struct(
            |    'prev', CASE WHEN a.prev IS NULL THEN x.value
            |                 ELSE 0.3D * x.value + 0.7D * a.prev END,
            |    'out', array_append(a.out,
            |      CASE WHEN a.prev IS NULL THEN x.value
            |           ELSE 0.3D * x.value + 0.7D * a.prev END)),
            |  a -> a.out)""".stripMargin))
        .select(col("user_id"), posexplode(expr(
          "zip_with(sorted, ewmas, (s, e) -> named_struct('event_id', s.event_id, 'ewma', e))")))
        .select(col("user_id"), col("col.event_id").as("event_id"),
          (col("pos") + 1).cast("bigint").as("rn"), col("col.ewma").as("ewma"))
        .orderBy("user_id", "rn")),

    // N6: SCD2 dimension versioning — collapse each customer's order
    // status history into versioned validity ranges (valid_from /
    // valid_to / is_current). Gaps-and-islands (lag + running sum)
    // then one lead for the range end; both window passes and the
    // group-by share ONE o_custkey shuffle.
    "dml_scd2" -> ((s, d) => {
      val wo = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
      val runs = load(s, d, "orders")
        .select(col("o_custkey"), col("o_orderdate"), col("o_orderstatus"), col("o_orderkey"))
        .withColumn("brk",
          when(lag(col("o_orderstatus"), 1).over(wo).isNull
            || col("o_orderstatus") =!= lag(col("o_orderstatus"), 1).over(wo), 1)
            .otherwise(0))
        .withColumn("ver", sum(col("brk"))
          .over(wo.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .groupBy(col("o_custkey"), col("ver"), col("o_orderstatus").as("status"))
        .agg(min(col("o_orderdate")).as("valid_from"))
      runs
        .withColumn("valid_to", lead(col("valid_from"), 1)
          .over(Window.partitionBy("o_custkey").orderBy("ver")))
        .select(col("o_custkey"), col("status"), col("ver").cast("bigint").as("version"),
          col("valid_from"), col("valid_to"), col("valid_to").isNull.as("is_current"))
        .orderBy("o_custkey", "version")
    }),

    // N7: fixed-width histogram (22 buckets of 5000 over
    // l_extendedprice, clamped) — the profiling primitive. Bucket
    // assignment is pure arithmetic (codegen, map-side combine); the
    // count per bucket shuffles 22 rows.
    "agg_histogram" -> ((s, d) =>
      load(s, d, "lineitem")
        .withColumn("bucket_id",
          least(lit(21L), greatest(lit(0L),
            floor(col("l_extendedprice") / 5000.0).cast("long"))))
        .groupBy("bucket_id")
        .agg(count(lit(1)).as("n"),
          sum(dec(col("l_extendedprice"))).cast(DecimalType(38, 2)).as("tot"),
          min(col("l_extendedprice")).as("lo_val"),
          max(col("l_extendedprice")).as("hi_val"))
        .withColumn("lo_edge", col("bucket_id") * 5000.0)
        .select("bucket_id", "lo_edge", "n", "tot", "lo_val", "hi_val")
        .orderBy("bucket_id")),

    // N8: deterministic mode per group — most frequent l_quantity per
    // return flag, ties broken toward the smaller value (Spark's own
    // mode() leaves ties unspecified, so the operator pins them):
    // count per (group, value), then rank by (count desc, value asc).
    "agg_mode" -> ((s, d) => {
      val cnt = load(s, d, "lineitem")
        .groupBy("l_returnflag", "l_quantity")
        .agg(count(lit(1)).as("n"))
      cnt.withColumn("rk", row_number().over(
          Window.partitionBy("l_returnflag")
            .orderBy(col("n").desc, col("l_quantity").asc)))
        .filter(col("rk") === 1)
        .select(col("l_returnflag"), col("l_quantity").as("mode_qty"), col("n"))
        .orderBy("l_returnflag")
    }),

    // N9: TPC-H Q5 shape (local-supplier volume): region filter walks
    // the dim chain region→nation→supplier, all broadcast; customer ⋈
    // orders ⋈ lineitem carries the c_nationkey = s_nationkey
    // same-nation constraint into the final broadcast join; revenue is
    // decimal-exact. The fact table shuffles once (orders join); no
    // dim ever shuffles it again.
    "tpch_q5" -> ((s, d) => {
      val r = load(s, d, "region").filter(col("r_name") === "ASIA")
      val n = load(s, d, "nation")
        .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
      val sup = load(s, d, "supplier")
        .join(broadcast(n), col("s_nationkey") === col("n_nationkey"))
        .select("s_suppkey", "s_nationkey", "n_name")
      val o = load(s, d, "orders")
        .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp")
          && col("o_orderdate") < lit("1997-01-01").cast("timestamp"))
      val c = load(s, d, "customer")
      val l = load(s, d, "lineitem")
      c.join(o, c("c_custkey") === o("o_custkey"))
        .join(l, o("o_orderkey") === l("l_orderkey"))
        .join(broadcast(sup),
          l("l_suppkey") === sup("s_suppkey") && c("c_nationkey") === sup("s_nationkey"))
        .groupBy("n_name")
        .agg(sum(dec(col("l_extendedprice"))
            * (lit(1) - dec(col("l_discount"))).cast(DecimalType(4, 2)))
          .cast(DecimalType(38, 4)).as("revenue"))
        .orderBy(col("revenue").desc, col("n_name").asc)
    }),

    // N11: bucketed interval join — the IP-range/window-lookup shape
    // where NO equi-key exists (pure containment v ∈ [lo, hi)).
    // Bucketing CREATES the equi-key: intervals are exploded into the
    // fixed-width buckets they overlap (width >= max interval length
    // ⇒ <= 2 buckets each), probes compute their bucket arithmetically,
    // and the containment filter runs on equi-join candidates only —
    // one keyed shuffle instead of the O(probes × intervals)
    // BroadcastNestedLoop a raw theta join degenerates to.
    "join_range_bucketed" -> ((s, d) => {
      val iv = s.range(0, 210).toDF("iv_id")
        .withColumn("lo", col("iv_id") * 500.0)
        .withColumn("hi", col("iv_id") * 500.0 + 350.0)
      val ivb = iv.withColumn("bucket", explode(expr(
        "sequence(CAST(floor(lo/500.0) AS BIGINT), CAST(floor(hi/500.0) AS BIGINT))")))
      load(s, d, "lineitem").select(col("l_extendedprice").as("v"))
        .withColumn("bucket", floor(col("v") / 500.0).cast("long"))
        .join(ivb, Seq("bucket"))
        .filter(col("v") >= col("lo") && col("v") < col("hi"))
        .groupBy("iv_id")
        .agg(count(lit(1)).as("n"),
          sum(dec(col("v"))).cast(DecimalType(38, 2)).as("tot"))
        .orderBy("iv_id")
    }),

    // N12: cross-corpus near-dedup — flag heldout documents (doc_id %
    // 29 == 0, the decontaminate split) whose 3-gram shingle Jaccard
    // vs any training document reaches 0.8. Unlike dedup_ngram's
    // self-join this crosses two corpora; GraftOps blocks on the
    // 2-word prefix so neither side is ever crossed with itself.
    "dedup_cross" -> ((s, d) => {
      val docs = load(s, d, "documents")
      graft.api.GraftOps.ngramJaccardCrossPairs(
        docs.filter(col("doc_id") % 29 =!= 0),
        docs.filter(col("doc_id") % 29 === 0),
        "doc_id", "text", minJaccard = 0.8)
        .orderBy("a_id", "b_id")
    }),

    // N13: incremental aggregate maintenance — the materialized-view
    // refresh shape: a base aggregate (orders before 2000) is combined
    // with the delta's PARTIAL aggregate by merging states (sum of
    // counts, sum of decimal sums), never touching base fact rows
    // again. Correct because count/sum are commutative monoids; the
    // oracle is the full recompute and must match exactly. At 100 TB
    // this is the difference between re-scanning the lake and scanning
    // one day's partition.
    "dml_incremental" -> ((s, d) => {
      val o = load(s, d, "orders")
      val cut = lit("2000-01-01").cast("timestamp")
      def partial(df: org.apache.spark.sql.DataFrame) =
        df.groupBy("o_custkey").agg(
          count(lit(1)).as("n"),
          sum(dec(col("o_totalprice"))).cast(DecimalType(38, 2)).as("tot"))
      partial(o.filter(col("o_orderdate") < cut))
        .unionByName(partial(o.filter(col("o_orderdate") >= cut)))
        .groupBy("o_custkey")
        .agg(sum(col("n")).as("n"),
          sum(col("tot")).cast(DecimalType(38, 2)).as("tot"))
        .orderBy("o_custkey")
    }),

    // N14: forward as-of — nearest error event at-or-after each event,
    // per user: the mirror of C10's backward as-of, same one-shuffle
    // window formulation in descending time order.
    "join_asof_fwd" -> ((s, d) =>
      graft.api.GraftOps.asofNextMatch(load(s, d, "events"),
        partitionCol = "user_id", tsCol = "ts", idCol = "event_id",
        marker = col("event_type") === "error", outCol = "next_error_id")
        .select("event_id", "user_id", "next_error_id")
        .orderBy("event_id")),

    // N15: edit-distance fuzzy dedup — near-identical 60-char prefixes
    // (levenshtein <= 5) among documents sharing the 2-word block
    // prefix. Round 15 (VERDICT r14 #1): blocks holding more than
    // `maxBlock` docs route through GraftOps.fuzzyPrefixPairs'
    // deterministic banded-MinHash candidate tier (character-3-gram
    // min-md5 signatures) instead of the quadratic within-block
    // self-join — the same flood guard dedup_ngram has carried since
    // round 6; the exact levenshtein verify is unchanged. maxBlock = 3
    // here is deliberately tiny so BOTH routes run and are
    // oracle-checked at the sf0.01 gate; the production default is
    // 1024. SEMANTICS NOTE (ADVICE r15): with maxBlock this small the
    // entry's contract is the APPROXIMATE one — nearly every real
    // block takes the banded route, whose worst-case band recall for
    // dist-5 pairs of 60-char prefixes is ~0.8 (the oracle mirrors
    // the same banding, so the gate checks the routed pipeline, not
    // exact completeness). The exact contract at the production
    // threshold is the separately-named `dedup_fuzzy_exact` below.
    "dedup_fuzzy" -> ((s, d) =>
      graft.api.GraftOps.fuzzyPrefixPairs(load(s, d, "documents"),
        "doc_id", "text", prefixLen = 60, maxDist = 5, maxBlock = 3)
        .orderBy("a_id", "b_id")),

    // N15b (round 16 — ADVICE r15): the SAME operator at its
    // production threshold (maxBlock = 1024), where every sf0.01
    // block (largest = 4 docs) takes the exact within-block route —
    // so this entry's oracle is the UNROUTED exact blocked join and
    // the gate pins exact-completeness semantics, the contract a
    // production caller gets on all but pathological flood blocks.
    // Together the two entries make the exact/approximate split an
    // explicit, separately-named surface instead of a hidden
    // parameter choice.
    "dedup_fuzzy_exact" -> ((s, d) =>
      graft.api.GraftOps.fuzzyPrefixPairs(load(s, d, "documents"),
        "doc_id", "text", prefixLen = 60, maxDist = 5, maxBlock = 1024)
        .orderBy("a_id", "b_id")),

    // N16: sliding-window distinct — unique users per 2-hour window
    // sliding by 1 hour, the standard telemetry cardinality shape.
    // Spark's window() explodes each row into its two covering
    // windows; the distinct agg shuffles on (window, user) — the same
    // two-level plan a 100 TB rollup uses.
    "agg_window_distinct" -> ((s, d) =>
      load(s, d, "events")
        .groupBy(window(col("ts"), "2 hours", "1 hour"))
        .agg(countDistinct(col("user_id")).as("u"),
          count(lit(1)).as("n"))
        .select(col("window.start").cast("timestamp_ntz").as("w_start"),
          col("u"), col("n"))
        .orderBy("w_start")),

    // N17: TPC-H Q18 shape (large-volume customers) — the
    // aggregate-derived semi-join pattern: the qualifying-order set is
    // itself a fact aggregation (partial agg before its shuffle, a few
    // thousand keys out of millions), then a LEFT SEMI join prunes
    // orders before the final 3-way join+agg+top-20
    // (TakeOrderedAndProject). At 100 TB the semi-join side stays
    // small enough to broadcast — the fact is filtered, never
    // re-shuffled for qualification.
    "tpch_q18" -> ((s, d) => {
      val l = load(s, d, "lineitem")
      val big = l.groupBy("l_orderkey")
        .agg(sum(dec(col("l_quantity"))).as("q"))
        .filter(col("q") > 150)
        .select(col("l_orderkey").as("big_okey"))
      val o = load(s, d, "orders")
      val c = load(s, d, "customer")
      o.join(big, o("o_orderkey") === big("big_okey"), "left_semi")
        .join(c, col("o_custkey") === c("c_custkey"))
        .join(l, col("o_orderkey") === l("l_orderkey"))
        .groupBy(col("c_name"), col("o_orderkey"), col("o_orderdate"),
          col("o_totalprice"))
        .agg(sum(dec(col("l_quantity"))).cast(DecimalType(38, 2)).as("total_qty"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
        .limit(20)
    }),

    // N18: deterministic train/val/test split — assignment by the
    // first md5 hex digit of the id (12/2/2 of 16 → 75% / 12.5% /
    // 12.5%), the reproducible-split contract every training pipeline
    // needs: stable under re-runs, shard order, and corpus growth
    // (adding documents never moves an existing one). Map-only.
    // N18b (round 5): deterministic per-group reservoir sample — k docs
    // per language, selected by md5-hash order. Rides the custom
    // TopKPerGroup heap operator, so the "reservoir" really is one:
    // O(k) memory per group per partition, shuffle payload ≤ k ×
    // groups per map partition, corpus never sorted. Same answer as
    // the row_number formulation (the oracle) at any partitioning.
    "sample_reservoir" -> ((s, d) => {
      val df = load(s, d, "documents")
        .select(col("doc_id"), col("lang"),
          md5(col("doc_id").cast("string")).as("h"))
      graft.api.GraftOps.topKPerGroup(df, Seq("lang"),
          Seq(("h", false), ("doc_id", false)), 20)
        .orderBy("lang", "h", "doc_id")
    }),

    "sample_split" -> ((s, d) => {
      val h = substring(md5(col("doc_id").cast("string")), 1, 1)
      load(s, d, "documents").select(
        col("doc_id"), col("lang"), h.as("bucket"),
        when(h <= "9" || h === "a" || h === "b", "train")
          .when(h === "c" || h === "d", "val")
          .otherwise("test").as("split"))
        .orderBy("doc_id")
    }),

    // N19: time-range window frame — trailing-1-hour count and sum per
    // user (RANGE frame over event-time seconds, not ROWS): the
    // telemetry moving-aggregate shape. One shuffle on user_id; the
    // frame walks each partition's sort once. Both engines order by
    // floored epoch seconds so sub-second timestamps can't split the
    // frame boundary differently.
    "win_time_range" -> ((s, d) => {
      val w = Window.partitionBy("user_id")
        .orderBy(expr("unix_seconds(CAST(ts AS TIMESTAMP))"))
        .rangeBetween(-3600, 0)
      load(s, d, "events")
        .select(col("event_id"), col("user_id"), col("ts"), col("value"))
        .withColumn("n_1h", count(lit(1)).over(w))
        .withColumn("sum_1h", sum(dec(col("value"))).over(w).cast(DecimalType(38, 2)))
        .select("event_id", "user_id", "n_1h", "sum_1h")
        .orderBy("event_id")
    }),

    // N10: binary-payload exact dedup — the image-corpus dedup stage:
    // hash the payload bytes (md5 — content fingerprint, not
    // security), group on the digest, keep the minimum doc_id. The
    // payload is the doc's 40-byte text prefix cast to binary (the
    // corpus's planted near-dup groups share prefixes, so real
    // collisions exist). One window shuffle on the digest.
    "multimodal_dedup" -> ((s, d) => {
      val g = Window.partitionBy("payload_md5")
      load(s, d, "documents")
        .select(col("doc_id"),
          md5(substring(col("text"), 1, 40).cast("binary")).as("payload_md5"))
        .select(col("doc_id"), col("payload_md5"),
          count(lit(1)).over(g).as("dup_count"),
          (col("doc_id") === min(col("doc_id")).over(g)).as("is_canonical"))
        .orderBy("doc_id")
    }),
  )

  val oracle: Map[String, String] = Map(
    "text_chunk" ->
      """WITH w AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
        | c AS (SELECT doc_id,
        |    unnest(generate_series(0, (len(w)-1)//24)) AS chunk_id,
        |    unnest(list_transform(generate_series(0, (len(w)-1)//24),
        |      i -> w[i*24+1 : i*24+32])) AS ch
        |  FROM w)
        | SELECT doc_id, CAST(chunk_id AS BIGINT) AS chunk_id,
        |  CAST(len(ch) AS BIGINT) AS n_tok, array_to_string(ch, ' ') AS chunk
        | FROM c ORDER BY doc_id, chunk_id""".stripMargin,
    "pack_sequences" ->
      """WITH t AS (SELECT doc_id, lang,
        |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok FROM documents),
        | c AS (SELECT doc_id, lang, n_tok,
        |    CAST(sum(n_tok) OVER (PARTITION BY lang
        |      ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |      - n_tok AS "offset" FROM t)
        | SELECT doc_id, lang, n_tok, "offset", "offset" // 256 AS bin_id
        | FROM c ORDER BY doc_id""".stripMargin,
    "dedup_url" ->
      """WITH u AS (SELECT doc_id,
        |    CASE WHEN doc_id % 2 = 0 THEN 'HTTPS://www.' ELSE 'http://' END
        |      || source || '.example.com/p/' || CAST(doc_id % 10 AS VARCHAR)
        |      || CASE WHEN doc_id % 3 = 0
        |           THEN '?utm_source=feed&utm_id=' || CAST(doc_id AS VARCHAR)
        |             || CASE WHEN doc_id % 5 = 0 THEN '&page=2' ELSE '' END
        |           ELSE '' END AS url
        |  FROM documents),
        | c AS (SELECT doc_id,
        |    regexp_replace(regexp_replace(
        |      regexp_replace(
        |        regexp_replace(lower(url), '^https?://(www\.)?', ''),
        |        '[?&](utm_[a-z_]+|fbclid|gclid)=[^&]*', '', 'g'),
        |      '^([^?]*)&', '\1?'), '\?$', '') AS canon_url
        |  FROM u)
        | SELECT doc_id, canon_url,
        |  CAST(count(*) OVER (PARTITION BY canon_url) AS BIGINT) AS dup_count,
        |  doc_id = min(doc_id) OVER (PARTITION BY canon_url) AS is_canonical
        | FROM c ORDER BY doc_id""".stripMargin,
    "text_boilerplate" ->
      """WITH t AS (SELECT doc_id, source,
        |    text || chr(10) || 'copyright (c) ' || source || ' media' || chr(10)
        |      || CASE WHEN doc_id % 3 = 0 THEN 'subscribe to our newsletter'
        |              ELSE 'footer id ' || CAST(doc_id AS VARCHAR) END AS t
        |  FROM documents),
        | l AS (SELECT doc_id, source,
        |    unnest(generate_series(0, len(string_split(t, chr(10)))-1)) AS pos,
        |    unnest(string_split(t, chr(10))) AS line FROM t),
        | df AS (SELECT source, line, count(DISTINCT doc_id) AS df
        |        FROM l GROUP BY source, line)
        | SELECT l.doc_id, CAST(count(*) AS BIGINT) AS n_kept,
        |  string_agg(l.line, chr(10) ORDER BY l.pos) AS clean_text
        | FROM l JOIN df ON l.source = df.source AND l.line = df.line
        | WHERE df.df < 5
        | GROUP BY l.doc_id ORDER BY l.doc_id""".stripMargin,
    "ts_ewma" ->
      """WITH RECURSIVE e AS (SELECT user_id, event_id, value,
        |    row_number() OVER (PARTITION BY user_id
        |      ORDER BY CAST(ts AS TIMESTAMP), event_id) AS rn
        |  FROM events),
        | s AS (SELECT user_id, event_id, rn, value AS ewma FROM e WHERE rn = 1
        |   UNION ALL
        |   SELECT e.user_id, e.event_id, e.rn,
        |     CAST(0.3 AS DOUBLE) * e.value + CAST(0.7 AS DOUBLE) * s.ewma
        |   FROM s JOIN e ON e.user_id = s.user_id AND e.rn = s.rn + 1)
        | SELECT user_id, event_id, CAST(rn AS BIGINT) AS rn, ewma
        | FROM s ORDER BY user_id, rn""".stripMargin,
    "dml_scd2" ->
      """WITH b AS (SELECT o_custkey, o_orderdate, o_orderstatus, o_orderkey,
        |    CASE WHEN lag(o_orderstatus) OVER w IS NULL
        |           OR o_orderstatus <> lag(o_orderstatus) OVER w THEN 1 ELSE 0 END AS brk
        |  FROM orders WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)),
        | v AS (SELECT o_custkey, o_orderdate, o_orderstatus,
        |    CAST(sum(brk) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS ver
        |  FROM b),
        | g AS (SELECT o_custkey, o_orderstatus AS status, ver,
        |    min(o_orderdate) AS valid_from FROM v GROUP BY 1, 2, 3)
        | SELECT o_custkey, status, ver AS version, valid_from,
        |  lead(valid_from) OVER (PARTITION BY o_custkey ORDER BY ver) AS valid_to,
        |  lead(valid_from) OVER (PARTITION BY o_custkey ORDER BY ver) IS NULL AS is_current
        | FROM g ORDER BY o_custkey, version""".stripMargin,
    "agg_histogram" ->
      """SELECT CAST(least(21, greatest(0, floor(l_extendedprice / 5000.0))) AS BIGINT) AS bucket_id,
        |  CAST(least(21, greatest(0, floor(l_extendedprice / 5000.0))) AS BIGINT) * 5000.0 AS lo_edge,
        |  count(*) AS n,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DECIMAL(38,2)) AS tot,
        |  min(l_extendedprice) AS lo_val, max(l_extendedprice) AS hi_val
        | FROM lineitem GROUP BY 1, 2 ORDER BY bucket_id""".stripMargin,
    "agg_mode" ->
      """WITH c AS (SELECT l_returnflag, l_quantity, count(*) AS n
        |  FROM lineitem GROUP BY 1, 2),
        | r AS (SELECT l_returnflag, l_quantity, n,
        |    row_number() OVER (PARTITION BY l_returnflag
        |      ORDER BY n DESC, l_quantity ASC) AS rk FROM c)
        | SELECT l_returnflag, l_quantity AS mode_qty, n
        | FROM r WHERE rk = 1 ORDER BY l_returnflag""".stripMargin,
    "tpch_q5" ->
      """SELECT n_name,
        | CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
        |   * CAST(1 - CAST(l_discount AS DECIMAL(18,2)) AS DECIMAL(4,2))) AS DECIMAL(38,4)) AS revenue
        | FROM customer, orders, lineitem, supplier, nation, region
        | WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
        |   AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        |   AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
        |   AND r_name = 'ASIA'
        |   AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        |   AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
        | GROUP BY n_name ORDER BY revenue DESC, n_name ASC""".stripMargin,
    "join_range_bucketed" ->
      """WITH iv AS (SELECT i AS iv_id, i*500.0 AS lo, i*500.0 + 350.0 AS hi
        |  FROM generate_series(0, 209) t(i))
        | SELECT iv_id, count(*) AS n,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DECIMAL(38,2)) AS tot
        | FROM iv JOIN lineitem
        |   ON l_extendedprice >= lo AND l_extendedprice < hi
        | GROUP BY iv_id ORDER BY iv_id""".stripMargin,
    "dedup_cross" ->
      """WITH docs AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
        |     sh AS (SELECT doc_id,
        |        list_distinct(list_transform(generate_series(1, greatest(len(w) - 2, 1)),
        |          i -> array_to_string(w[i:i+2], ' '))) AS shingles,
        |        array_to_string(w[1:2], ' ') AS blk
        |      FROM docs)
        | SELECT a.doc_id AS a_id, b.doc_id AS b_id,
        |   CAST(CAST(len(list_intersect(a.shingles, b.shingles)) AS DOUBLE)
        |     / len(list_distinct(a.shingles || b.shingles)) AS DECIMAL(18,6)) AS jac
        | FROM sh a JOIN sh b ON a.blk = b.blk
        |   AND a.doc_id % 29 <> 0 AND b.doc_id % 29 = 0
        | WHERE CAST(len(list_intersect(a.shingles, b.shingles)) AS DOUBLE)
        |     / len(list_distinct(a.shingles || b.shingles)) >= 0.8
        | ORDER BY a_id, b_id""".stripMargin,
    "dml_incremental" ->
      """SELECT o_custkey, count(*) AS n,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DECIMAL(38,2)) AS tot
        | FROM orders GROUP BY o_custkey ORDER BY o_custkey""".stripMargin,
    "join_asof_fwd" ->
      """SELECT event_id, user_id,
        |  last_value(CASE WHEN event_type = 'error' THEN event_id END IGNORE NULLS)
        |    OVER (PARTITION BY user_id
        |          ORDER BY CAST(ts AS TIMESTAMP) DESC, event_id DESC
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS next_error_id
        | FROM events ORDER BY event_id""".stripMargin,
    // mirrors the FULL routed pipeline (small blocks direct, hot
    // blocks via banded min-md5 over character 3-grams of the prefix),
    // exactly like dedup_ngram's oracle — both engines run both routes
    "dedup_fuzzy" ->
      """WITH d AS (SELECT doc_id, substring(text, 1, 60) AS p,
        |    array_to_string((string_split(text, ' '))[1:2], ' ') AS blk
        |  FROM documents),
        | cnt AS (SELECT blk, count(*) AS bn FROM d GROUP BY blk),
        | small AS (SELECT d.* FROM d JOIN cnt USING (blk) WHERE bn <= 3),
        | hot AS (SELECT d.* FROM d JOIN cnt USING (blk) WHERE bn > 3),
        | small_pairs AS (
        |   SELECT a.doc_id AS a_id, b.doc_id AS b_id, a.p AS pa, b.p AS pb
        |   FROM small a JOIN small b ON a.blk = b.blk AND a.doc_id < b.doc_id),
        | hsh AS (SELECT doc_id, blk, unnest(list_distinct(list_transform(
        |      generate_series(1, greatest(len(p) - 2, 1)),
        |      i -> substr(p, i, 3)))) AS s
        |   FROM hot),
        | mh AS (SELECT doc_id, blk,
        |    min(substr(md5('0:' || s), 1, 8))  AS h0, min(substr(md5('0:' || s), 9, 8))  AS h1,
        |    min(substr(md5('0:' || s), 17, 8)) AS h2, min(substr(md5('0:' || s), 25, 8)) AS h3,
        |    min(substr(md5('1:' || s), 1, 8))  AS h4, min(substr(md5('1:' || s), 9, 8))  AS h5,
        |    min(substr(md5('1:' || s), 17, 8)) AS h6, min(substr(md5('1:' || s), 25, 8)) AS h7
        |  FROM hsh GROUP BY doc_id, blk),
        | bands AS (
        |   SELECT doc_id, blk, 0 AS band, h0 || h1 AS sig FROM mh
        |   UNION ALL SELECT doc_id, blk, 1, h2 || h3 FROM mh
        |   UNION ALL SELECT doc_id, blk, 2, h4 || h5 FROM mh
        |   UNION ALL SELECT doc_id, blk, 3, h6 || h7 FROM mh),
        | hot_cand AS (
        |   SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id
        |   FROM bands a JOIN bands b
        |     ON a.blk = b.blk AND a.band = b.band AND a.sig = b.sig
        |    AND a.doc_id < b.doc_id),
        | hot_pairs AS (
        |   SELECT c.a_id, c.b_id, x.p AS pa, y.p AS pb
        |   FROM hot_cand c JOIN hot x ON c.a_id = x.doc_id
        |                   JOIN hot y ON c.b_id = y.doc_id),
        | allp AS (SELECT * FROM small_pairs UNION ALL SELECT * FROM hot_pairs)
        | SELECT a_id, b_id, CAST(levenshtein(pa, pb) AS BIGINT) AS dist
        | FROM allp WHERE levenshtein(pa, pb) <= 5
        | ORDER BY a_id, b_id""".stripMargin,
    // exact-route contract: at sf0.01 every block is <= 1024 docs, so
    // the Spark side's routed operator degenerates to the plain
    // within-block self-join this SQL expresses — the gate pins exact
    // completeness at the production threshold
    "dedup_fuzzy_exact" ->
      """WITH d AS (SELECT doc_id, substring(text, 1, 60) AS p,
        |    array_to_string((string_split(text, ' '))[1:2], ' ') AS blk
        |  FROM documents)
        | SELECT a.doc_id AS a_id, b.doc_id AS b_id,
        |   CAST(levenshtein(a.p, b.p) AS BIGINT) AS dist
        | FROM d a JOIN d b ON a.blk = b.blk AND a.doc_id < b.doc_id
        | WHERE levenshtein(a.p, b.p) <= 5
        | ORDER BY a_id, b_id""".stripMargin,
    "agg_window_distinct" ->
      """WITH e AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts FROM events),
        | w AS (SELECT user_id,
        |    unnest([time_bucket(INTERVAL '1 hour', ts),
        |            time_bucket(INTERVAL '1 hour', ts) - INTERVAL '1 hour']) AS w_start
        |  FROM e)
        | SELECT w_start, count(DISTINCT user_id) AS u, count(*) AS n
        | FROM w GROUP BY w_start ORDER BY w_start""".stripMargin,
    "tpch_q18" ->
      """SELECT c_name, o.o_orderkey, o.o_orderdate, o.o_totalprice,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DECIMAL(38,2)) AS total_qty
        | FROM customer c JOIN orders o ON c.c_custkey = o.o_custkey
        |  JOIN lineitem l ON o.o_orderkey = l.l_orderkey
        | WHERE o.o_orderkey IN (
        |   SELECT l_orderkey FROM lineitem GROUP BY l_orderkey
        |   HAVING sum(CAST(l_quantity AS DECIMAL(18,2))) > 150)
        | GROUP BY c_name, o.o_orderkey, o.o_orderdate, o.o_totalprice
        | ORDER BY o.o_totalprice DESC, o.o_orderkey ASC LIMIT 20""".stripMargin,
    "sample_reservoir" ->
      """SELECT doc_id, lang, h FROM (
        |  SELECT doc_id, lang, md5(CAST(doc_id AS VARCHAR)) AS h,
        |    row_number() OVER (PARTITION BY lang
        |      ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn
        |  FROM documents) t
        | WHERE rn <= 20 ORDER BY lang, h, doc_id""".stripMargin,
    "sample_split" ->
      """WITH h AS (SELECT doc_id, lang,
        |    substring(md5(CAST(doc_id AS VARCHAR)), 1, 1) AS bucket
        |  FROM documents)
        | SELECT doc_id, lang, bucket,
        |  CASE WHEN bucket <= '9' OR bucket = 'a' OR bucket = 'b' THEN 'train'
        |       WHEN bucket IN ('c', 'd') THEN 'val'
        |       ELSE 'test' END AS split
        | FROM h ORDER BY doc_id""".stripMargin,
    "win_time_range" ->
      """SELECT event_id, user_id,
        |  CAST(count(*) OVER w AS BIGINT) AS n_1h,
        |  CAST(sum(CAST(value AS DECIMAL(18,2))) OVER w AS DECIMAL(38,2)) AS sum_1h
        | FROM events
        | WINDOW w AS (PARTITION BY user_id
        |   ORDER BY CAST(floor(epoch(CAST(ts AS TIMESTAMP))) AS BIGINT)
        |   RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW)
        | ORDER BY event_id""".stripMargin,
    "multimodal_dedup" ->
      """WITH h AS (SELECT doc_id, md5(substring(text, 1, 40)) AS payload_md5
        |  FROM documents)
        | SELECT doc_id, payload_md5,
        |  CAST(count(*) OVER (PARTITION BY payload_md5) AS BIGINT) AS dup_count,
        |  doc_id = min(doc_id) OVER (PARTITION BY payload_md5) AS is_canonical
        | FROM h ORDER BY doc_id""".stripMargin,
  )
}
