package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.Tables.{dec, load}

/** Family O — round-5 OLAP + corpus completeness extensions (ref: n/a,
  * SURVEY §0 — surface extrapolated from the §2 contract families):
  * TPC-H Q7/Q10, corpus rollup stats, global paragraph-level exact
  * dedup, deterministic domain-mix sampling, trailing-window anomaly
  * scoring, linear gap interpolation, bitmap-index distinct counting,
  * date/interval arithmetic, interval-overlap join, int8 embedding
  * quantization, and C-style string formatting.
  *
  * Scale shapes (the 100 TB contract):
  *  - O1 tpch_q7 / O2 tpch_q10 shuffle the lineitem fact ONCE (orders
  *    join); every dimension (nation-filtered supplier/customer sides)
  *    is broadcast. Q10's top-20 runs as TakeOrderedAndProject — no
  *    global sort materialization.
  *  - O3 corpus_stats is a single partial-aggregated shuffle on
  *    (source, lang) — thousands of groups regardless of corpus size.
  *  - O4 text_paragraph_dedup shuffles once on the chunk hash (the
  *    window partition key); state per key is the occurrence list of
  *    one chunk — bounded by duplication factor, not corpus size.
  *  - O5 sample_domain_mix is map-only (hash + threshold per row);
  *    sampling 100 TB costs one scan, no shuffle.
  *  - O6 ts_anomaly / O7 ts_interpolate shuffle once on their key
  *    (event_type / user_id) and walk each partition's sort once;
  *    per-key series are session-scale (unbounded series belong to
  *    the streaming family's stateful path).
  *  - O8 agg_bitmap is the two-level bitmap pattern: per-bucket
  *    fixed-size bitmaps (map-side combinable binary OR) then a
  *    per-group sum — exact distinct counts without a count(distinct)
  *    re-shuffle of raw keys.
  *  - O10 join_interval_overlap equi-joins on the day bucket and
  *    broadcasts the tiny window dimension — never a nested-loop
  *    range join.
  *  - O11 embed_quantize is map-only; int8 vectors cut ANN memory 4x
  *    (the 100 TB reason to quantize at all).
  */
object OlapQueries {

  /** Shared Q7 "volume" measure: exact decimal revenue contribution. */
  private def volume = (dec(col("l_extendedprice"))
    * (lit(1) - dec(col("l_discount"))).cast(DecimalType(4, 2)))

  val queries: Map[String, Q] = Map(
    // O1: TPC-H Q7 (volume shipping) — revenue flowing from supplier
    // nations of region 0 to customer nations of region 1, by year.
    // The fact shuffles once for the orders join; nation-tagged
    // supplier/customer dims broadcast.
    "tpch_q7" -> ((s, d) => {
      val n1 = load(s, d, "nation").filter(col("n_regionkey") === 0)
        .select(col("n_nationkey").as("s_nk"), col("n_name").as("supp_nation"))
      val n2 = load(s, d, "nation").filter(col("n_regionkey") === 1)
        .select(col("n_nationkey").as("c_nk"), col("n_name").as("cust_nation"))
      val sup = load(s, d, "supplier")
        .join(broadcast(n1), col("s_nationkey") === col("s_nk"))
        .select("s_suppkey", "supp_nation")
      val cust = load(s, d, "customer")
        .join(broadcast(n2), col("c_nationkey") === col("c_nk"))
        .select("c_custkey", "cust_nation")
      val li = load(s, d, "lineitem")
        .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp")
          && col("l_shipdate") < lit("1998-01-01").cast("timestamp"))
      li.join(load(s, d, "orders"), col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(sup), col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
        .withColumn("yr", year(col("l_shipdate")).cast("bigint"))
        .groupBy("supp_nation", "cust_nation", "yr")
        .agg(sum(volume).cast(DecimalType(38, 4)).as("revenue"),
          count(lit(1)).as("n"))
        .orderBy("supp_nation", "cust_nation", "yr")
    }),

    // O2: TPC-H Q10 (returned-item revenue) — top-20 customers by
    // revenue lost to returns in 1996Q1. TakeOrderedAndProject keeps
    // the limit on the map side.
    "tpch_q10" -> ((s, d) => {
      val nat = load(s, d, "nation")
        .select(col("n_nationkey").as("nk"), col("n_name"))
      val cust = load(s, d, "customer")
        .join(broadcast(nat), col("c_nationkey") === col("nk"))
        .select("c_custkey", "c_name", "n_name")
      val o = load(s, d, "orders")
        .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp")
          && col("o_orderdate") < lit("1996-04-01").cast("timestamp"))
      load(s, d, "lineitem").filter(col("l_returnflag") === "R")
        .join(o, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(sum(volume).cast(DecimalType(38, 4)).as("revenue"))
        .orderBy(col("revenue").desc, col("c_custkey"))
        .limit(20)
    }),

    // O3: corpus rollup — per (source, lang) document/token/char
    // totals; the dataset-card numbers every corpus release ships.
    "corpus_stats" -> ((s, d) =>
      load(s, d, "documents")
        .groupBy("source", "lang")
        .agg(count(lit(1)).as("n_docs"),
          sum(size(split(col("text"), " "))).cast("bigint").as("n_tokens"),
          sum(col("n_chars")).cast("bigint").as("total_chars"),
          max(col("n_chars")).cast("bigint").as("max_chars"))
        .orderBy("source", "lang")),

    // O4: global exact paragraph dedup (first-occurrence-wins): docs
    // are chunked into 10-word spans; a span seen earlier in the
    // corpus (by doc_id, pos order) is dropped, and the survivors are
    // reassembled in document order. One shuffle on the span value.
    "text_paragraph_dedup" -> ((s, d) => {
      val ch = load(s, d, "documents")
        .select(col("doc_id"), split(col("text"), " ").as("w"))
        .select(col("doc_id"), posexplode(expr(
          "transform(sequence(0, CAST((size(w)-1) DIV 10 AS INT)), i -> array_join(slice(w, i*10+1, 10), ' '))")))
        .withColumnRenamed("col", "chunk")
      val rk = ch.withColumn("rn", row_number().over(
        Window.partitionBy("chunk").orderBy("doc_id", "pos")))
      rk.groupBy("doc_id")
        .agg(count(lit(1)).as("n_chunks"),
          count(when(col("rn") === 1, 1)).as("n_kept"),
          // nullif: a doc whose every span duplicates an earlier doc
          // keeps nothing — DuckDB's string_agg yields NULL there,
          // Spark's array_join would yield '' — normalize to NULL.
          nullif(array_join(expr(
            "transform(array_sort(collect_list(CASE WHEN rn = 1 THEN struct(pos, chunk) END)), x -> x.chunk)"),
            " "), lit("")).as("clean_text"))
        .orderBy("doc_id")
    }),

    // O5: deterministic domain-mix sampling — per-language keep rates
    // (en 100%, fr/de 50%, es 25%, zh ~10%) applied via the first two
    // md5 hex digits of the key: reproducible on any cluster layout,
    // map-only, and re-runnable incrementally (same rows always kept).
    "sample_domain_mix" -> ((s, d) => {
      val b = conv(substring(md5(col("doc_id").cast("string")), 1, 2), 16, 10)
        .cast("bigint")
      val rate = when(col("lang") === "en", 256L)
        .when(col("lang") === "fr", 128L).when(col("lang") === "de", 128L)
        .when(col("lang") === "es", 64L).otherwise(26L)
      load(s, d, "documents")
        .withColumn("b", b).filter(col("b") < rate)
        .select("doc_id", "lang", "b")
        .orderBy("doc_id")
    }),

    // O6: trailing-window anomaly scores — z of each value against
    // the 20 preceding observations of its event_type (frame excludes
    // the current row). Variance comes from exact decimal power sums;
    // the z expression tree is double-identical on both engines.
    "ts_anomaly" -> ((s, d) => {
      val win = Window.partitionBy("event_type")
        .orderBy(col("t"), col("event_id")).rowsBetween(-20, -1)
      val nD = col("n").cast("double")
      val sxD = col("sx").cast("double")
      val sxxD = col("sxx").cast("double")
      val varE = (sxxD - sxD * sxD / nD) / (nD - 1)
      val z = (col("x").cast("double") - sxD / nD) / sqrt(varE)
      val ok = col("n") >= 10 && varE > 0
      load(s, d, "events")
        .select(col("event_id"), col("event_type"),
          dec(col("value")).as("x"), col("ts").cast("timestamp").as("t"))
        .withColumn("n", count(lit(1)).over(win))
        .withColumn("sx", sum(col("x")).over(win))
        .withColumn("sxx", sum(col("x") * col("x")).over(win))
        .select(col("event_id"), col("event_type"), col("n"),
          when(ok, z.cast(DecimalType(18, 6))).as("z"),
          // non-null boolean: the driver's two read paths disagree on
          // NULL-boolean repr (pyarrow None vs fetchdf NaN)
          when(ok, abs(z) > 3.0).otherwise(lit(false)).as("is_anomaly"))
        .orderBy("event_id")
    }),

    // O7: linear interpolation of missing hourly means per user —
    // gapfill's zero-fill sibling for continuous measures. The
    // prev/next anchor scan is two window passes sharing one user_id
    // shuffle; endpoints extend flat.
    "ts_interpolate" -> ((s, d) => {
      val ev = load(s, d, "events")
        .withColumn("hr",
          floor(expr("unix_micros(cast(ts as timestamp))") / 3600000000L).cast("bigint"))
      val hv = ev.groupBy("user_id", "hr")
        .agg(sum(dec(col("value"))).as("sxd"), count(lit(1)).as("cnt"))
        .select(col("user_id"), col("hr"),
          (col("sxd").cast("double") / col("cnt").cast("double")).as("v"))
      val grid = ev.groupBy("user_id")
        .agg(min(col("hr")).as("h0"), max(col("hr")).as("h1"))
        .select(col("user_id"), explode(sequence(col("h0"), col("h1"))).as("hr"))
      val wPrev = Window.partitionBy("user_id").orderBy("hr")
        .rowsBetween(Window.unboundedPreceding, 0)
      val wNext = Window.partitionBy("user_id").orderBy("hr")
        .rowsBetween(0, Window.unboundedFollowing)
      val g = grid.join(hv, Seq("user_id", "hr"), "left")
        .withColumn("ph", last(when(col("v").isNotNull, col("hr")), ignoreNulls = true).over(wPrev))
        .withColumn("pv", last(when(col("v").isNotNull, col("v")), ignoreNulls = true).over(wPrev))
        .withColumn("nh", first(when(col("v").isNotNull, col("hr")), ignoreNulls = true).over(wNext))
        .withColumn("nv", first(when(col("v").isNotNull, col("v")), ignoreNulls = true).over(wNext))
      // left-associated like the twin's `(nv-pv) * CAST(..)/CAST(..)`:
      // ((nv-pv) * Δ) / span — a*(Δ/span) differs by 1 ulp
      val interp = col("pv") + (col("nv") - col("pv")) *
        (col("hr") - col("ph")).cast("double") / (col("nh") - col("ph")).cast("double")
      // v_interp stays DOUBLE: interpolation midpoints land on exactly
      // representable .xxx5 values (power-of-2 gap widths), where a
      // decimal cast round ties half-even in DuckDB vs half-up in
      // Spark. The raw doubles are IEEE-identical on both engines.
      g.select(col("user_id"), col("hr"), col("v").isNotNull.as("observed"),
        when(col("v").isNotNull, col("v"))
          .when(col("ph").isNull, col("nv"))
          .when(col("nh").isNull, col("pv"))
          .otherwise(interp).as("v_interp"))
        .orderBy("user_id", "hr")
    }),

    // O8: exact distinct via bitmap index — per (group, bucket) the
    // keys OR into a fixed-size bitmap (map-side combinable), then
    // bit counts sum per group. The scale path for exact distinct:
    // no re-shuffle of raw keys, state is bitmap bytes not key sets.
    "agg_bitmap" -> ((s, d) =>
      load(s, d, "events")
        .groupBy(col("event_type"), expr("bitmap_bucket_number(user_id)").as("bkt"))
        .agg(expr("bitmap_count(bitmap_construct_agg(bitmap_bit_position(user_id)))").as("c"))
        .groupBy("event_type")
        .agg(sum(col("c")).cast("bigint").as("n_users"))
        .orderBy("event_type")),

    // O9: date/interval arithmetic — month-clamped add_months, day
    // offsets, month-end, quarter/ISO-week truncation, day diffs.
    "fn_interval" -> ((s, d) => {
      val dt = col("o_orderdate").cast("date")
      load(s, d, "orders").filter(col("o_orderkey") % 7 === 0)
        .select(col("o_orderkey"), dt.as("d"),
          add_months(dt, 3).as("plus_3m"),
          date_add(dt, 45).as("plus_45d"),
          last_day(dt).as("month_end"),
          date_trunc("quarter", col("o_orderdate")).cast("date").as("q_start"),
          date_trunc("week", col("o_orderdate")).cast("date").as("wk_start"),
          datediff(lit("2000-01-01").cast("date"), dt).cast("bigint").as("days_to_y2k"))
        .orderBy("o_orderkey")
    }),

    // O10: interval-overlap join — per-user daily activity spans vs
    // two planted 6-hour maintenance windows per day. Equi-join on
    // the day bucket (broadcast dimension) + overlap predicate; the
    // scalable reformulation of a range join.
    "join_interval_overlap" -> ((s, d) => {
      val us = expr("unix_micros(cast(ts as timestamp))")
      val act = load(s, d, "events")
        .select(col("user_id"), col("ts").cast("date").as("day"), us.as("us"))
        .groupBy("user_id", "day")
        .agg(min(col("us")).as("a_start"), max(col("us")).as("a_end"))
      val mw = act.select("day").distinct()
        .select(col("day"), explode(array(lit(0L), lit(1L))).as("m_id"))
        .select(col("day"), col("m_id"),
          (expr("unix_micros(cast(day as timestamp))") + col("m_id") * 43200000000L
            + 7200000000L).as("m_start"),
          (expr("unix_micros(cast(day as timestamp))") + col("m_id") * 43200000000L
            + 28800000000L).as("m_end"))
      act.join(broadcast(mw), Seq("day"))
        .filter(col("a_start") < col("m_end") && col("m_start") < col("a_end"))
        .select(col("user_id"), col("day"), col("m_id"),
          (least(col("a_end"), col("m_end"))
            - greatest(col("a_start"), col("m_start"))).cast("bigint").as("overlap_us"))
        .orderBy("user_id", "day", "m_id")
    }),

    // O11: int8 embedding quantization (symmetric, per-vector scale
    // 127/max|x|) — 4x memory cut for ANN serving. Map-only; the
    // round-half-up grid (floor(x*s + 0.5)) is IEEE-identical on both
    // engines. Vectors leave as an md5 of the int list (the driver's
    // comparator rejects raw array cells).
    "embed_quantize" -> ((s, d) =>
      load(s, d, "embeddings")
        .withColumn("amax", expr(
          "aggregate(embedding, CAST(0.0 AS DOUBLE), (a, x) -> greatest(a, abs(CAST(x AS DOUBLE))))"))
        .withColumn("scale", expr("CASE WHEN amax > 0 THEN 127.0/amax ELSE 1.0 END"))
        .withColumn("qv", expr(
          "transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * scale + 0.5) AS BIGINT))"))
        .select(col("vec_id"), size(col("qv")).cast("bigint").as("n_dim"),
          expr("aggregate(qv, 0L, (a, x) -> a + x)").as("q_sum"),
          array_min(col("qv")).cast("bigint").as("q_min"),
          array_max(col("qv")).cast("bigint").as("q_max"),
          md5(array_join(expr("transform(qv, x -> CAST(x AS STRING))"), ",")).as("q_hash"))
        .orderBy("vec_id")),

    // O14: TPC-H Q14 (promo revenue share) by ship month of 1996 —
    // the two decimal sums stay exact; the fact joins the broadcast
    // part dim and shuffles only for the 12-group month agg.
    "tpch_q14" -> ((s, d) => {
      val p = load(s, d, "part")
        .select(col("p_partkey"), (col("p_type") === "PROMO").as("is_promo"))
      load(s, d, "lineitem")
        .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp")
          && col("l_shipdate") < lit("1997-01-01").cast("timestamp"))
        .join(broadcast(p), col("l_partkey") === col("p_partkey"))
        .withColumn("vol", volume)
        .groupBy(date_format(col("l_shipdate"), "yyyy-MM").as("mon"))
        .agg(sum(when(col("is_promo"), col("vol"))).cast(DecimalType(38, 4)).as("promo_rev"),
          sum(col("vol")).cast(DecimalType(38, 4)).as("total_rev"))
        .orderBy("mon")
    }),

    // O15: as-of join with a staleness tolerance (pandas merge_asof
    // tolerance semantics): each event sees its user's most recent
    // purchase only if it happened within the last 2 hours. One
    // shuffle, no self-join.
    "join_asof_tolerance" -> ((s, d) =>
      graft.api.GraftOps.asofLastMatchWithin(load(s, d, "events"),
        partitionCol = "user_id", tsCol = "ts", idCol = "event_id",
        marker = col("event_type") === "purchase",
        outCol = "last_purchase_id", gapCol = "gap_us",
        toleranceMicros = 2L * 3600 * 1000000)
        .select("event_id", "user_id", "last_purchase_id", "gap_us")
        .orderBy("event_id")),

    // O16: sequential pattern detection (MATCH_RECOGNIZE-lite): each
    // user's event-initial string is scanned for view→clicks→purchase
    // funnels (`vc*p`, non-overlapping). One shuffle on user_id; the
    // per-user sequence is session-scale.
    "win_pattern" -> ((s, d) =>
      load(s, d, "events")
        .groupBy("user_id")
        .agg(array_join(expr(
          "transform(array_sort(collect_list(struct(ts, event_id, substring(event_type, 1, 1) AS i))), x -> x.i)"),
          "").as("seq"))
        .select(col("user_id"), length(col("seq")).cast("bigint").as("n_events"),
          expr("regexp_count(seq, 'vc*p')").cast("bigint").as("n_funnels"),
          col("seq").rlike("vc*p").as("converted"))
        .orderBy("user_id")),

    // O17: token-rarity quality stats per doc against the corpus
    // unigram table — the exact-integer core of unigram LM scoring.
    // (Deliberately no ln(): libm and JVM Math.log can disagree by
    // 1 ulp, and every integer here is order-independent and exact.)
    //
    // Plan shape (round-9 fix, VERDICT r8 "What's wrong" #1): the
    // unigram join runs at (doc_id, word)-DISTINCT grain, not token
    // grain. Joining the raw exploded table meant |tokens| rows through
    // a word-keyed exchange whose hot keys ("the"-class) are Zipf-skewed;
    // pre-aggregating per-doc word counts first cuts the join input to
    // |doc × distinct-word| (~10× here, more at corpus scale) and caps
    // any one word's exchange mass at |docs| instead of |occurrences|.
    // The token-grain stats are recovered exactly from the counts:
    // n_tok = Σcnt, sum_c = Σcnt·c, n_hapax = Σcnt·[c=1]. The unigram
    // table itself re-aggregates the same pre-agg (c = Σ_doc cnt), so
    // Spark's ReuseExchange shares the one (doc_id, w) shuffle between
    // both branches. Output is value-identical to the token-grain plan
    // (same oracle row; pinned by ContractSpec).
    "text_rarity" -> ((s, d) => {
      val perDoc = load(s, d, "documents")
        .select(col("doc_id"), explode(split(col("text"), " ")).as("w"))
        .groupBy("doc_id", "w").agg(count(lit(1)).as("cnt"))
      val uni = perDoc.groupBy("w").agg(sum(col("cnt")).cast("bigint").as("c"))
      perDoc.join(uni, Seq("w"))
        .groupBy("doc_id")
        .agg(sum(col("cnt")).cast("bigint").as("n_tok"),
          sum(col("cnt") * col("c")).cast("bigint").as("sum_c"),
          min(col("c")).as("min_c"),
          sum(when(col("c") === 1, col("cnt")).otherwise(lit(0L))).cast("bigint").as("n_hapax"))
        .select(col("doc_id"), col("n_tok"), col("sum_c"), col("min_c"), col("n_hapax"),
          (col("sum_c").cast("double") / col("n_tok").cast("double")).as("avg_c"))
        .orderBy("doc_id")
    }),

    // O18: distribution-drift monitor — per event_type, the L1
    // distance between the value histograms (20 bins of width 20) of
    // the first and second half of its timeline, cross-multiplied to
    // stay in exact integers: l1_cross = Σ|c1·t2 − c2·t1| (divide by
    // t1·t2 for the usual [0,2] L1). Two keyed shuffles, group count
    // = |event_type| regardless of data size.
    "dq_drift" -> ((s, d) => {
      val e = load(s, d, "events")
        .select(col("event_type"),
          expr("unix_micros(cast(ts as timestamp))").as("tu"),
          least(floor(col("value") / 20).cast("bigint"), lit(19L)).as("bin"))
      val mid = e.groupBy("event_type")
        .agg((min(col("tu")) + expr("(max(tu) - min(tu)) DIV 2")).as("m"))
      val cnt = e.join(mid, Seq("event_type"))
        .withColumn("half", when(col("tu") < col("m"), 0).otherwise(1))
        .groupBy("event_type", "bin")
        .agg(count(when(col("half") === 0, 1)).as("c1"),
          count(when(col("half") === 1, 1)).as("c2"))
      val tot = cnt.groupBy("event_type")
        .agg(sum(col("c1")).cast("bigint").as("t1"),
          sum(col("c2")).cast("bigint").as("t2"))
      cnt.join(tot, Seq("event_type"))
        .groupBy(col("event_type"), col("t1").as("n_first"), col("t2").as("n_second"))
        .agg(sum(abs(col("c1") * col("t2") - col("c2") * col("t1"))).cast("bigint").as("l1_cross"))
        .orderBy("event_type")
    }),

    // O19: time-hierarchy rollup — year/quarter/month subtotal
    // lattice with the grouping_id bitmask, the OLAP report shape.
    "agg_time_rollup" -> ((s, d) =>
      load(s, d, "orders")
        .select(year(col("o_orderdate")).cast("bigint").as("yr"),
          quarter(col("o_orderdate")).cast("bigint").as("qtr"),
          month(col("o_orderdate")).cast("bigint").as("mth"),
          col("o_totalprice"))
        .rollup("yr", "qtr", "mth")
        .agg(grouping_id().cast("bigint").as("gid"),
          count(lit(1)).as("n"),
          sum(dec(col("o_totalprice"))).cast(DecimalType(38, 2)).as("total"))
        .select("yr", "qtr", "mth", "gid", "n", "total")
        .orderBy(col("gid"), col("yr").asc_nulls_first,
          col("qtr").asc_nulls_first, col("mth").asc_nulls_first)),

    // O20: top-k with ties (RANK, not row_number): every order tying
    // a top-3 price per status survives — DENSE set semantics a
    // LIMIT-based top-k cannot express.
    "topk_with_ties" -> ((s, d) => {
      val w = Window.partitionBy("o_orderstatus")
        .orderBy(col("o_totalprice").desc)
      load(s, d, "orders")
        .select(col("o_orderstatus"), col("o_orderkey"), col("o_totalprice"))
        .withColumn("rk", rank().over(w).cast("bigint"))
        .filter(col("rk") <= 3)
        .select("o_orderstatus", "rk", "o_orderkey", "o_totalprice")
        .orderBy("o_orderstatus", "rk", "o_orderkey")
    }),

    // O21: PageRank over the embedding similarity graph (cos ≥ 0.4
    // blocked pair join → symmetric edges; 5 power iterations in
    // exact decimal arithmetic — partition-count-invariant). Oracle-
    // exempt: iterative; pinned by OlapSpec invariants instead.
    "graph_pagerank" -> ((s, d) => {
      graft.functions.GraftFunctions.register(s)
      val emb = load(s, d, "embeddings")
      // Round 17 (VERDICT r16 #1): edges from the persisted SimGraph
      // index (built at cos≥0.3) filtered to this query's 0.4
      // threshold — the ≥0.3 set is complete, so its ≥0.4 subset IS
      // the ≥0.4 edge set, and the stored cos_sim is the same 6-dp
      // decimal the direct join computes (Round17OpsSpec pins the
      // equality). The filter prunes row groups via the units'
      // cos_sim sort order.
      val edges = graft.queries.SimGraph.edges(s, d, minCos = 0.4)
        .select(col("a_id"), col("b_id"))
      // integer fixed-point units → one exact double scaling at the
      // end (rank units < 2^53, so the cast and division are the same
      // IEEE ops on both engines); oracled via 5 unrolled CTEs.
      graft.api.GraftOps.pageRank(
        emb.select("vec_id"), "vec_id", edges, "a_id", "b_id", iters = 5)
        .select(col("id"),
          (col("rank").cast("double") / lit(10000000000.0)).as("rank"))
        .orderBy("id")
    }),

    // O22: argmax/argmin per group (max_by/min_by) with a DETERMINISTIC
    // tie-break: price and key are packed into one sortable bigint
    // (cents * 10^7 + key), because ties on the raw measure make
    // max_by engine- and partition-order-dependent. Prices are exact
    // 2-dp values and keys < 10^7, so the packing is collision-free.
    "agg_minmax_by" -> ((s, d) => {
      val packed = (round(col("o_totalprice") * 100).cast("bigint") * 10000000L
        + col("o_orderkey"))
      load(s, d, "orders")
        .withColumn("pk", packed)
        .groupBy("o_orderstatus")
        .agg(expr("max_by(o_orderkey, pk)").as("top_order"),
          max(col("o_totalprice")).as("top_price"),
          expr("min_by(o_orderkey, pk)").as("bottom_order"),
          min(col("o_totalprice")).as("bottom_price"))
        .orderBy("o_orderstatus")
    }),

    // O23: point-in-time (temporal) dimension join — facts pick the
    // SCD2 version valid at their event time. Equi-join on the
    // dimension key + validity-range predicate: per-key version lists
    // are small, so the range check runs inside the hash join's
    // per-key bucket, never as a nested loop over the fact table.
    "join_temporal" -> ((s, d) => {
      val w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
      val v = load(s, d, "orders").filter(col("o_orderkey") % 3 === 0)
        .select(col("o_custkey"), col("o_orderstatus").as("status"),
          col("o_orderdate").as("valid_from"),
          coalesce(lead(col("o_orderdate"), 1).over(w),
            lit("9999-12-31").cast("timestamp")).as("valid_to"),
          row_number().over(w).cast("bigint").as("ver"))
      val f = load(s, d, "orders").filter(col("o_orderkey") % 3 === 1)
        .select(col("o_orderkey"), col("o_custkey").as("f_ck"),
          col("o_orderdate").as("t"))
      f.join(v, col("f_ck") === col("o_custkey")
          && col("t") >= col("valid_from") && col("t") < col("valid_to"))
        .select(col("o_orderkey"), col("o_custkey"), col("ver"), col("status"))
        .orderBy("o_orderkey")
    }),

    // O24: nearest as-of (pandas direction='nearest'): each event
    // pairs with its user's closest purchase in EITHER direction,
    // ties to the earlier one. Two window passes (backward +
    // forward) sharing ONE user_id shuffle; no self-join.
    "join_asof_nearest" -> ((s, d) => {
      val wB = Window.partitionBy("user_id")
        .orderBy(col("tu").asc, col("event_id").asc)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val wF = Window.partitionBy("user_id")
        .orderBy(col("tu").desc, col("event_id").desc)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val isP = col("event_type") === "purchase"
      val backGap = col("tu") - col("bt")
      val fwdGap = col("ft") - col("tu")
      val pickBack = col("bt").isNotNull &&
        (col("ft").isNull || backGap <= fwdGap)
      load(s, d, "events")
        .select(col("event_id"), col("user_id"), col("event_type"),
          expr("unix_micros(cast(ts as timestamp))").as("tu"))
        .withColumn("bid", last(when(isP, col("event_id")), ignoreNulls = true).over(wB))
        .withColumn("bt", last(when(isP, col("tu")), ignoreNulls = true).over(wB))
        .withColumn("fid", last(when(isP, col("event_id")), ignoreNulls = true).over(wF))
        .withColumn("ft", last(when(isP, col("tu")), ignoreNulls = true).over(wF))
        .select(col("event_id"), col("user_id"),
          when(pickBack, col("bid")).otherwise(col("fid")).as("nearest_purchase_id"),
          when(pickBack, backGap).otherwise(fwdGap).as("dist_us"))
        .orderBy("event_id")
    }),

    // O25: boolean/conditional aggregates — count_if + bool_and/bool_or
    // (map-side-combinable, one shuffle).
    "agg_bool" -> ((s, d) =>
      load(s, d, "orders")
        .groupBy("o_orderstatus")
        .agg(count(when(col("o_totalprice") > 300000, 1)).as("n_big"),
          expr("bool_and(o_totalprice > 1000)").as("all_over_1k"),
          expr("bool_or(o_totalprice > 490000)").as("any_huge"),
          count(when(col("o_orderpriority") === "1-URGENT", 1)).as("n_urgent"))
        .orderBy("o_orderstatus")),

    // O26: data masking (SQL mask()): full class masking and
    // digits-only redaction — map-only, the column-level PII shape
    // (text_redact_pii handles free text).
    "fn_mask" -> ((s, d) =>
      load(s, d, "customer").filter(col("c_custkey") % 13 === 0)
        .select(col("c_custkey"),
          expr("mask(c_name)").as("masked"),
          expr("mask(c_name, NULL, NULL, '*', NULL)").as("digits_starred"))
        .orderBy("c_custkey")),

    // O27: sessionization via the BUILT-IN session_window (the batch
    // form of streaming family I3) — merge while gap < 30 min, new
    // session at gap >= 30 min (strict boundary; the twin encodes the
    // same `>=` break). Window bounds: [first event, last event + gap).
    "sessionize_native" -> ((s, d) =>
      load(s, d, "events")
        .groupBy(session_window(col("ts").cast("timestamp"), "30 minutes"),
          col("user_id"))
        .agg(count(lit(1)).as("n"))
        .select(col("user_id"),
          expr("unix_micros(session_window.start)").as("s_start_us"),
          expr("unix_micros(session_window.end)").as("s_end_us"),
          col("n"))
        .orderBy("user_id", "s_start_us")),

    // O13: C-style formatting — zero-padded ids, composite report
    // lines. Formats stay at/above the stored 2-dp precision so Java
    // (half-up) and C (half-even) tie-rounding can never diverge.
    "fn_format" -> ((s, d) =>
      load(s, d, "orders").filter(col("o_orderkey") % 11 === 0)
        .select(col("o_orderkey"),
          format_string("%08d", col("o_orderkey")).as("key_pad"),
          format_string("%s/%05d/%.2f", col("o_orderstatus"), col("o_custkey"),
            col("o_totalprice")).as("line"),
          format_string("%.3f", col("o_totalprice")).as("amt"))
        .orderBy("o_orderkey"))
  )

  /** graph_pagerank twin: the 5 power iterations UNROLLED as chained
    * CTEs — possible (and exact) only because pageRank runs in integer
    * fixed point, where Spark's `DIV` and DuckDB's BIGINT `//` are the
    * same floor division. This moves the one iterative graph operator
    * from the exempt tier to the driver-oracled tier.
    */
  private lazy val pagerankSql: String = {
    val base = """p AS (SELECT a.vec_id AS a_id, b.vec_id AS b_id
      |    FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
      |    WHERE CAST(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
      |      CAST(b.embedding AS DOUBLE[])) AS DECIMAL(18,6)) >= 0.4),
      | sym AS (SELECT a_id AS src, b_id AS dst FROM p
      |   UNION ALL SELECT b_id AS src, a_id AS dst FROM p),
      | deg AS (SELECT src, CAST(count(*) AS BIGINT) AS dg FROM sym GROUP BY src),
      | v AS (SELECT vec_id AS id FROM embeddings),
      | r0 AS (SELECT id, CAST(10000000000 AS BIGINT) AS rank FROM v)""".stripMargin
    val iters = (1 to 5).map { k =>
      s""",
         | i$k AS (SELECT sym.dst AS id, sum(r${k - 1}.rank // deg.dg) AS inr
         |   FROM sym JOIN r${k - 1} ON sym.src = r${k - 1}.id
         |   JOIN deg ON deg.src = sym.src GROUP BY sym.dst),
         | r$k AS (SELECT v.id, 1500000000 + COALESCE((85 * i$k.inr) // 100, 0) AS rank
         |   FROM v LEFT JOIN i$k ON v.id = i$k.id)""".stripMargin
    }.mkString
    s"WITH $base$iters\n SELECT id, CAST(rank AS DOUBLE) / 10000000000.0 AS rank FROM r5 ORDER BY id"
  }

  val oracle: Map[String, String] = Map(
    "graph_pagerank" -> pagerankSql,
    "tpch_q7" ->
      """SELECT supp_nation, cust_nation, yr,
        |  CAST(sum(volume) AS DECIMAL(38,4)) AS revenue, CAST(count(*) AS BIGINT) AS n
        |FROM (SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
        |        CAST(year(l_shipdate) AS BIGINT) AS yr,
        |        CAST(l_extendedprice AS DECIMAL(18,2))
        |          * (1 - CAST(l_discount AS DECIMAL(18,2))) AS volume
        |      FROM supplier
        |      JOIN lineitem ON s_suppkey = l_suppkey
        |      JOIN orders ON o_orderkey = l_orderkey
        |      JOIN customer ON c_custkey = o_custkey
        |      JOIN nation n1 ON s_nationkey = n1.n_nationkey
        |      JOIN nation n2 ON c_nationkey = n2.n_nationkey
        |      WHERE n1.n_regionkey = 0 AND n2.n_regionkey = 1
        |        AND l_shipdate >= TIMESTAMP '1996-01-01'
        |        AND l_shipdate < TIMESTAMP '1998-01-01')
        |GROUP BY supp_nation, cust_nation, yr
        |ORDER BY supp_nation, cust_nation, yr""".stripMargin,
    "tpch_q10" ->
      """SELECT c_custkey, c_name, n_name,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
        |    * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DECIMAL(38,4)) AS revenue
        |FROM customer
        |JOIN orders ON c_custkey = o_custkey
        |JOIN lineitem ON l_orderkey = o_orderkey
        |JOIN nation ON c_nationkey = n_nationkey
        |WHERE o_orderdate >= TIMESTAMP '1996-01-01'
        |  AND o_orderdate < TIMESTAMP '1996-04-01'
        |  AND l_returnflag = 'R'
        |GROUP BY c_custkey, c_name, n_name
        |ORDER BY revenue DESC, c_custkey
        |LIMIT 20""".stripMargin,
    "corpus_stats" ->
      """SELECT source, lang, CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS n_tokens,
        |  CAST(sum(n_chars) AS BIGINT) AS total_chars,
        |  CAST(max(n_chars) AS BIGINT) AS max_chars
        |FROM documents GROUP BY source, lang ORDER BY source, lang""".stripMargin,
    "text_paragraph_dedup" ->
      """WITH w AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
        | ch AS (SELECT doc_id,
        |    unnest(generate_series(0, (len(w)-1)//10)) AS pos,
        |    unnest(list_transform(generate_series(0, (len(w)-1)//10),
        |      i -> array_to_string(w[i*10+1 : i*10+10], ' '))) AS chunk
        |  FROM w),
        | rk AS (SELECT doc_id, pos, chunk,
        |    row_number() OVER (PARTITION BY chunk ORDER BY doc_id, pos) AS rn
        |  FROM ch)
        |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_chunks,
        |  CAST(count(*) FILTER (rn = 1) AS BIGINT) AS n_kept,
        |  string_agg(CASE WHEN rn = 1 THEN chunk END, ' ' ORDER BY pos) AS clean_text
        |FROM rk GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "sample_domain_mix" ->
      """WITH h AS (SELECT doc_id, lang,
        |    CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 2))::INT AS BIGINT) AS b
        |  FROM documents)
        |SELECT doc_id, lang, b FROM h
        |WHERE b < CASE lang WHEN 'en' THEN 256 WHEN 'fr' THEN 128
        |  WHEN 'de' THEN 128 WHEN 'es' THEN 64 ELSE 26 END
        |ORDER BY doc_id""".stripMargin,
    "ts_anomaly" ->
      """WITH s AS (SELECT event_id, event_type, CAST(value AS DECIMAL(18,2)) AS x,
        |    CAST(ts AS TIMESTAMP) AS t FROM events),
        | w AS (SELECT event_id, event_type, x,
        |    CAST(count(*) OVER win AS BIGINT) AS n,
        |    sum(x) OVER win AS sx, sum(x*x) OVER win AS sxx
        |  FROM s WINDOW win AS (PARTITION BY event_type ORDER BY t, event_id
        |    ROWS BETWEEN 20 PRECEDING AND 1 PRECEDING))
        |SELECT event_id, event_type, n,
        |  CASE WHEN n >= 10 AND (CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE)*CAST(sx AS DOUBLE)/CAST(n AS DOUBLE)) / (CAST(n AS DOUBLE) - 1) > 0
        |    THEN CAST((CAST(x AS DOUBLE) - CAST(sx AS DOUBLE)/CAST(n AS DOUBLE)) /
        |      sqrt((CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE)*CAST(sx AS DOUBLE)/CAST(n AS DOUBLE)) / (CAST(n AS DOUBLE) - 1)) AS DECIMAL(18,6))
        |    END AS z,
        |  CASE WHEN n >= 10 AND (CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE)*CAST(sx AS DOUBLE)/CAST(n AS DOUBLE)) / (CAST(n AS DOUBLE) - 1) > 0
        |    THEN abs((CAST(x AS DOUBLE) - CAST(sx AS DOUBLE)/CAST(n AS DOUBLE)) /
        |      sqrt((CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE)*CAST(sx AS DOUBLE)/CAST(n AS DOUBLE)) / (CAST(n AS DOUBLE) - 1))) > 3.0
        |    ELSE FALSE END AS is_anomaly
        |FROM w ORDER BY event_id""".stripMargin,
    "ts_interpolate" ->
      """WITH e AS (SELECT user_id,
        |    CAST(floor(epoch_us(CAST(ts AS TIMESTAMP))/3600000000) AS BIGINT) AS hr,
        |    CAST(value AS DECIMAL(18,2)) AS x FROM events),
        | hv AS (SELECT user_id, hr,
        |    CAST(sum(x) AS DOUBLE)/CAST(count(*) AS DOUBLE) AS v
        |  FROM e GROUP BY user_id, hr),
        | grid AS (SELECT user_id, unnest(generate_series(min(hr), max(hr))) AS hr
        |  FROM e GROUP BY user_id),
        | g AS (SELECT grid.user_id, grid.hr, hv.v
        |  FROM grid LEFT JOIN hv ON grid.user_id = hv.user_id AND grid.hr = hv.hr),
        | nb AS (SELECT user_id, hr, v,
        |    last_value(CASE WHEN v IS NOT NULL THEN hr END IGNORE NULLS)
        |      OVER (PARTITION BY user_id ORDER BY hr
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS ph,
        |    last_value(CASE WHEN v IS NOT NULL THEN v END IGNORE NULLS)
        |      OVER (PARTITION BY user_id ORDER BY hr
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pv,
        |    first_value(CASE WHEN v IS NOT NULL THEN hr END IGNORE NULLS)
        |      OVER (PARTITION BY user_id ORDER BY hr
        |        ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nh,
        |    first_value(CASE WHEN v IS NOT NULL THEN v END IGNORE NULLS)
        |      OVER (PARTITION BY user_id ORDER BY hr
        |        ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nv
        |  FROM g)
        |SELECT user_id, hr, (v IS NOT NULL) AS observed,
        |  CASE WHEN v IS NOT NULL THEN v
        |       WHEN ph IS NULL THEN nv WHEN nh IS NULL THEN pv
        |       ELSE pv + (nv - pv) * CAST(hr - ph AS DOUBLE)/CAST(nh - ph AS DOUBLE)
        |       END AS v_interp
        |FROM nb ORDER BY user_id, hr""".stripMargin,
    "agg_bitmap" ->
      """SELECT event_type, CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    "fn_interval" ->
      """SELECT o_orderkey,
        |  CAST(o_orderdate AS DATE) AS d,
        |  CAST(o_orderdate + INTERVAL 3 MONTH AS DATE) AS plus_3m,
        |  CAST(o_orderdate + INTERVAL 45 DAY AS DATE) AS plus_45d,
        |  last_day(CAST(o_orderdate AS DATE)) AS month_end,
        |  CAST(date_trunc('quarter', o_orderdate) AS DATE) AS q_start,
        |  CAST(date_trunc('week', o_orderdate) AS DATE) AS wk_start,
        |  CAST(datediff('day', CAST(o_orderdate AS DATE), DATE '2000-01-01') AS BIGINT) AS days_to_y2k
        |FROM orders WHERE o_orderkey % 7 = 0 ORDER BY o_orderkey""".stripMargin,
    "join_interval_overlap" ->
      """WITH act AS (SELECT user_id, CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day,
        |    min(epoch_us(CAST(ts AS TIMESTAMP))) AS a_start,
        |    max(epoch_us(CAST(ts AS TIMESTAMP))) AS a_end
        |  FROM events GROUP BY 1, 2),
        | days AS (SELECT DISTINCT day FROM act),
        | mw AS (SELECT day, m_id,
        |    epoch_us(CAST(day AS TIMESTAMP)) + m_id*43200000000 + 7200000000 AS m_start,
        |    epoch_us(CAST(day AS TIMESTAMP)) + m_id*43200000000 + 28800000000 AS m_end
        |  FROM days, (SELECT unnest([0, 1]) AS m_id))
        |SELECT a.user_id, a.day, a.m_id, a.overlap_us FROM (
        |  SELECT act.user_id, act.day, CAST(m.m_id AS BIGINT) AS m_id,
        |    CAST(least(act.a_end, m.m_end) - greatest(act.a_start, m.m_start) AS BIGINT) AS overlap_us
        |  FROM act JOIN mw m ON act.day = m.day
        |  WHERE act.a_start < m.m_end AND m.m_start < act.a_end) a
        |ORDER BY a.user_id, a.day, a.m_id""".stripMargin,
    "embed_quantize" ->
      """WITH s AS (SELECT vec_id, embedding,
        |    list_max(list_transform(embedding, x -> abs(CAST(x AS DOUBLE)))) AS amax
        |  FROM embeddings),
        | q AS (SELECT vec_id,
        |    list_transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE)
        |      * (CASE WHEN amax > 0 THEN 127.0/amax ELSE 1.0 END) + 0.5) AS BIGINT)) AS qv
        |  FROM s)
        |SELECT vec_id, CAST(len(qv) AS BIGINT) AS n_dim,
        |  CAST(list_sum(qv) AS BIGINT) AS q_sum,
        |  CAST(list_min(qv) AS BIGINT) AS q_min,
        |  CAST(list_max(qv) AS BIGINT) AS q_max,
        |  md5(array_to_string(qv, ',')) AS q_hash
        |FROM q ORDER BY vec_id""".stripMargin,
    "tpch_q14" ->
      """SELECT strftime(date_trunc('month', l_shipdate), '%Y-%m') AS mon,
        |  CAST(sum(CASE WHEN p_type = 'PROMO'
        |    THEN CAST(l_extendedprice AS DECIMAL(18,2))
        |      * (1 - CAST(l_discount AS DECIMAL(18,2))) END) AS DECIMAL(38,4)) AS promo_rev,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
        |    * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DECIMAL(38,4)) AS total_rev
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        |  AND l_shipdate < TIMESTAMP '1997-01-01'
        |GROUP BY mon ORDER BY mon""".stripMargin,
    "join_asof_tolerance" ->
      """WITH e AS (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS t,
        |    event_type FROM events),
        | w AS (SELECT event_id, user_id, epoch_us(t) AS tu,
        |    last_value(CASE WHEN event_type = 'purchase' THEN event_id END IGNORE NULLS)
        |      OVER win AS lp,
        |    last_value(CASE WHEN event_type = 'purchase' THEN epoch_us(t) END IGNORE NULLS)
        |      OVER win AS lpt
        |  FROM e WINDOW win AS (PARTITION BY user_id ORDER BY t, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
        |SELECT event_id, user_id,
        |  CASE WHEN tu - lpt <= 7200000000 THEN lp END AS last_purchase_id,
        |  CASE WHEN tu - lpt <= 7200000000 THEN tu - lpt END AS gap_us
        |FROM w ORDER BY event_id""".stripMargin,
    "win_pattern" ->
      """WITH s AS (SELECT user_id,
        |    string_agg(substring(event_type, 1, 1), ''
        |      ORDER BY CAST(ts AS TIMESTAMP), event_id) AS seq
        |  FROM events GROUP BY user_id)
        |SELECT user_id, CAST(length(seq) AS BIGINT) AS n_events,
        |  CAST(len(regexp_extract_all(seq, 'vc*p')) AS BIGINT) AS n_funnels,
        |  CASE WHEN regexp_matches(seq, 'vc*p') THEN true ELSE false END AS converted
        |FROM s ORDER BY user_id""".stripMargin,
    "text_rarity" ->
      """WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS w
        |    FROM documents),
        | uni AS (SELECT w, CAST(count(*) AS BIGINT) AS c FROM tok GROUP BY w)
        |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tok,
        |  CAST(sum(c) AS BIGINT) AS sum_c, CAST(min(c) AS BIGINT) AS min_c,
        |  CAST(count(*) FILTER (c = 1) AS BIGINT) AS n_hapax,
        |  CAST(sum(c) AS DOUBLE)/CAST(count(*) AS DOUBLE) AS avg_c
        |FROM tok JOIN uni USING (w)
        |GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "dq_drift" ->
      """WITH e AS (SELECT event_type, epoch_us(CAST(ts AS TIMESTAMP)) AS tu,
        |    least(CAST(floor(value/20) AS BIGINT), 19) AS bin FROM events),
        | mid AS (SELECT event_type, min(tu) + (max(tu) - min(tu))//2 AS m
        |   FROM e GROUP BY event_type),
        | lab AS (SELECT e.event_type, e.bin,
        |    CASE WHEN e.tu < mid.m THEN 0 ELSE 1 END AS half
        |   FROM e JOIN mid USING (event_type)),
        | cnt AS (SELECT event_type, bin,
        |    CAST(count(*) FILTER (half = 0) AS BIGINT) AS c1,
        |    CAST(count(*) FILTER (half = 1) AS BIGINT) AS c2
        |   FROM lab GROUP BY event_type, bin),
        | tot AS (SELECT event_type, CAST(sum(c1) AS BIGINT) AS t1,
        |    CAST(sum(c2) AS BIGINT) AS t2 FROM cnt GROUP BY event_type)
        |SELECT cnt.event_type, tot.t1 AS n_first, tot.t2 AS n_second,
        |  CAST(sum(abs(c1*tot.t2 - c2*tot.t1)) AS BIGINT) AS l1_cross
        |FROM cnt JOIN tot USING (event_type)
        |GROUP BY cnt.event_type, tot.t1, tot.t2
        |ORDER BY cnt.event_type""".stripMargin,
    "agg_time_rollup" ->
      """SELECT CAST(year(o_orderdate) AS BIGINT) AS yr,
        |  CAST(quarter(o_orderdate) AS BIGINT) AS qtr,
        |  CAST(month(o_orderdate) AS BIGINT) AS mth,
        |  CAST(grouping(year(o_orderdate)) * 4 + grouping(quarter(o_orderdate)) * 2
        |    + grouping(month(o_orderdate)) AS BIGINT) AS gid,
        |  CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DECIMAL(38,2)) AS total
        |FROM orders
        |GROUP BY ROLLUP (year(o_orderdate), quarter(o_orderdate), month(o_orderdate))
        |ORDER BY gid, yr NULLS FIRST, qtr NULLS FIRST, mth NULLS FIRST""".stripMargin,
    "topk_with_ties" ->
      """WITH r AS (SELECT o_orderstatus, o_orderkey, o_totalprice,
        |    rank() OVER (PARTITION BY o_orderstatus
        |      ORDER BY o_totalprice DESC) AS rk
        |  FROM orders)
        |SELECT o_orderstatus, CAST(rk AS BIGINT) AS rk, o_orderkey, o_totalprice
        |FROM r WHERE rk <= 3
        |ORDER BY o_orderstatus, rk, o_orderkey""".stripMargin,
    "agg_minmax_by" ->
      """SELECT o_orderstatus,
        |  arg_max(o_orderkey, CAST(round(o_totalprice*100) AS BIGINT)*10000000
        |    + o_orderkey) AS top_order,
        |  max(o_totalprice) AS top_price,
        |  arg_min(o_orderkey, CAST(round(o_totalprice*100) AS BIGINT)*10000000
        |    + o_orderkey) AS bottom_order,
        |  min(o_totalprice) AS bottom_price
        |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,
    "join_temporal" ->
      """WITH v AS (
        |  SELECT o_custkey, o_orderstatus AS status,
        |    CAST(o_orderdate AS TIMESTAMP) AS valid_from,
        |    coalesce(lead(CAST(o_orderdate AS TIMESTAMP))
        |      OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey),
        |      TIMESTAMP '9999-12-31') AS valid_to,
        |    CAST(row_number() OVER (PARTITION BY o_custkey
        |      ORDER BY o_orderdate, o_orderkey) AS BIGINT) AS ver
        |  FROM orders WHERE o_orderkey % 3 = 0),
        | f AS (SELECT o_orderkey, o_custkey, CAST(o_orderdate AS TIMESTAMP) AS t
        |   FROM orders WHERE o_orderkey % 3 = 1)
        |SELECT f.o_orderkey, f.o_custkey, v.ver, v.status
        |FROM f JOIN v ON f.o_custkey = v.o_custkey
        |  AND f.t >= v.valid_from AND f.t < v.valid_to
        |ORDER BY f.o_orderkey""".stripMargin,
    "join_asof_nearest" ->
      """WITH e AS (SELECT event_id, user_id, event_type,
        |    epoch_us(CAST(ts AS TIMESTAMP)) AS tu FROM events),
        | w AS (SELECT event_id, user_id, tu,
        |    last_value(CASE WHEN event_type = 'purchase' THEN event_id END IGNORE NULLS)
        |      OVER wb AS bid,
        |    last_value(CASE WHEN event_type = 'purchase' THEN tu END IGNORE NULLS)
        |      OVER wb AS bt,
        |    first_value(CASE WHEN event_type = 'purchase' THEN event_id END IGNORE NULLS)
        |      OVER wf AS fid,
        |    first_value(CASE WHEN event_type = 'purchase' THEN tu END IGNORE NULLS)
        |      OVER wf AS ft
        |  FROM e WINDOW
        |    wb AS (PARTITION BY user_id ORDER BY tu, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
        |    wf AS (PARTITION BY user_id ORDER BY tu, event_id
        |      ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING))
        |SELECT event_id, user_id,
        |  CASE WHEN bt IS NOT NULL AND (ft IS NULL OR tu - bt <= ft - tu)
        |    THEN bid ELSE fid END AS nearest_purchase_id,
        |  CASE WHEN bt IS NOT NULL AND (ft IS NULL OR tu - bt <= ft - tu)
        |    THEN tu - bt ELSE ft - tu END AS dist_us
        |FROM w ORDER BY event_id""".stripMargin,
    "agg_bool" ->
      """SELECT o_orderstatus,
        |  CAST(count(*) FILTER (o_totalprice > 300000) AS BIGINT) AS n_big,
        |  bool_and(o_totalprice > 1000) AS all_over_1k,
        |  bool_or(o_totalprice > 490000) AS any_huge,
        |  CAST(count(*) FILTER (o_orderpriority = '1-URGENT') AS BIGINT) AS n_urgent
        |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,
    "fn_mask" ->
      """SELECT c_custkey,
        |  regexp_replace(regexp_replace(regexp_replace(c_name,
        |    '[A-Z]', 'X', 'g'), '[a-z]', 'x', 'g'), '[0-9]', 'n', 'g') AS masked,
        |  regexp_replace(c_name, '[0-9]', '*', 'g') AS digits_starred
        |FROM customer WHERE c_custkey % 13 = 0 ORDER BY c_custkey""".stripMargin,
    "sessionize_native" ->
      """WITH e AS (SELECT user_id, epoch_us(CAST(ts AS TIMESTAMP)) AS tu
        |    FROM events),
        | g AS (SELECT user_id, tu,
        |    CASE WHEN lag(tu) OVER w IS NULL
        |         OR tu - lag(tu) OVER w >= 1800000000 THEN 1 ELSE 0 END AS brk
        |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY tu)),
        | s AS (SELECT user_id, tu, sum(brk) OVER (PARTITION BY user_id ORDER BY tu
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sess FROM g)
        |SELECT user_id, min(tu) AS s_start_us,
        |  max(tu) + 1800000000 AS s_end_us, CAST(count(*) AS BIGINT) AS n
        |FROM s GROUP BY user_id, sess ORDER BY user_id, s_start_us""".stripMargin,
    "fn_format" ->
      """SELECT o_orderkey,
        |  printf('%08d', o_orderkey) AS key_pad,
        |  printf('%s/%05d/%.2f', o_orderstatus, o_custkey, o_totalprice) AS line,
        |  printf('%.3f', o_totalprice) AS amt
        |FROM orders WHERE o_orderkey % 11 = 0 ORDER BY o_orderkey""".stripMargin
  )
}
