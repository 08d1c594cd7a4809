package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.Tables.{dec, load}

/** Family R — profiling / risk / LM-scoring / forecasting extensions
  * (ref: n/a, SURVEY §0 — the reference repo is empty):
  * one-pass column profiling, drawdown analysis, fixed-point LM
  * quality scoring, and Holt double-exponential smoothing.
  *
  * Scale shapes (the 100 TB contract):
  *  - R1 dq_profile unpivots K columns in one scan (stack stays in
  *    codegen) and aggregates per column name — K groups total, one
  *    shuffle, no per-column re-scan.
  *  - R2 win_drawdown is one user_id shuffle; the equity curve is an
  *    EXACT decimal running sum (float cumsums are shuffle-order-
  *    dependent), divisions happen per-row after the windows.
  *  - R3 text_lm_score re-uses the bigram-count table and joins doc
  *    bigrams to it on (w1,w2) — the probability mass is summed as
  *    FIXED-POINT integers (floor(1e6·c2/c1)), which commutes, so no
  *    ordered fold and no float-sum nondeterminism; one double
  *    division per doc at the very end.
  *  - R4 ts_holt is sequential per key by definition (same contract
  *    as N5 ts_ewma): one user_id shuffle, then a linear two-state
  *    fold over each bounded per-user series.
  */
object ProfileQueries {

  val queries: Map[String, Q] = Map(
    // R1: data profiling — per-column null/distinct/min/max in ONE
    // scan via stack-unpivot. Doubles go through DECIMAL(18,2) before
    // the string render so both engines print identical values.
    "dq_profile" -> ((s, d) =>
      load(s, d, "orders")
        .select(expr(
          """stack(4,
            |  'o_orderstatus',   o_orderstatus,
            |  'o_orderpriority', o_orderpriority,
            |  'o_custkey',       CAST(o_custkey AS STRING),
            |  'o_totalprice',    CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS STRING)
            |) AS (col_name, v)""".stripMargin))
        .groupBy("col_name")
        .agg(count(lit(1)).as("n"),
          sum(when(col("v").isNull, 1L).otherwise(0L)).as("n_null"),
          countDistinct(col("v")).as("n_distinct"),
          min(col("v")).as("min_v"),
          max(col("v")).as("max_v"))
        .orderBy("col_name")),

    // R2: running drawdown per user — equity is the exact decimal
    // cumulative value (order (ts, event_id)), peak its running max;
    // drawdown and its fraction are per-row doubles computed from the
    // exact pair, so the whole curve is shuffle-order-independent.
    "win_drawdown" -> ((s, d) => {
      val ord = Window.partitionBy("user_id")
        .orderBy(col("ts").asc, col("event_id").asc)
      val run = ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      load(s, d, "events")
        .select(col("user_id"), col("event_id"), col("ts"), dec(col("value")).as("x"))
        .withColumn("equity", sum(col("x")).over(run))
        .withColumn("peak", max(col("equity")).over(run))
        .select(col("user_id"), col("event_id"),
          col("equity").cast(DecimalType(38, 2)).as("equity"),
          col("peak").cast(DecimalType(38, 2)).as("peak"),
          (col("peak") - col("equity")).cast("double").as("dd"),
          when(col("peak") > 0,
            (col("peak") - col("equity")).cast("double") / col("peak").cast("double"))
            .as("dd_frac"))
        .orderBy("user_id", "event_id")
    }),

    // R3: LM quality scoring (CCNet-shape) — each doc scored by the
    // mean corpus bigram probability of its transitions. Probabilities
    // are quantized to exact integers q = floor(1e6·c2/c1) BEFORE the
    // per-doc sum (integer sums commute; float sums don't), then one
    // double division renders the score.
    "text_lm_score" -> ((s, d) => {
      val docsW = load(s, d, "documents")
        .select(col("doc_id"), split(col("text"), " ").as("w"))
      val docBg = docsW
        .select(col("doc_id"), explode(expr(
          "transform(sequence(2, size(w)), i -> struct(w[i-2] AS w1, w[i-1] AS w2))")).as("b"))
        .select(col("doc_id"), col("b.w1"), col("b.w2"))
      val lm = docBg.groupBy("w1", "w2").agg(count(lit(1)).as("c2"))
        .withColumn("c1", sum(col("c2")).over(Window.partitionBy("w1")))
        .withColumn("q", floor(lit(1000000L) * col("c2") / col("c1")).cast("bigint"))
        .select("w1", "w2", "q")
      docBg.join(lm, Seq("w1", "w2"))
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_bigrams"), sum(col("q")).as("q_sum"))
        .select(col("doc_id"), col("n_bigrams"), col("q_sum"),
          (col("q_sum").cast("double")
            / (lit(1e6) * col("n_bigrams").cast("double"))).as("lm_score"))
        .orderBy("doc_id")
    }),

    // R4: Holt double-exponential smoothing (level + trend, α=0.5,
    // β=0.3) per user — two coupled recurrences folded over the
    // (ts, event_id)-sorted series, bit-identical to the oracle's
    // recursive CTE; forecast = level + trend.
    "ts_holt" -> ((s, d) =>
      load(s, d, "events")
        .select(col("user_id"), col("event_id"), col("ts"), col("value"))
        .groupBy("user_id")
        .agg(expr("array_sort(collect_list(struct(ts, event_id, value)))").as("sorted"))
        .withColumn("states", expr(
          """aggregate(sorted,
            |  named_struct('l', CAST(NULL AS DOUBLE), 'b', CAST(NULL AS DOUBLE),
            |    'out', CAST(array() AS ARRAY<STRUCT<l: DOUBLE, b: DOUBLE>>)),
            |  (a, x) -> CASE WHEN a.l IS NULL THEN named_struct(
            |      'l', x.value, 'b', 0.0D,
            |      'out', array_append(a.out, named_struct('l', x.value, 'b', 0.0D)))
            |    ELSE named_struct(
            |      'l', 0.5D * x.value + 0.5D * (a.l + a.b),
            |      'b', 0.3D * ((0.5D * x.value + 0.5D * (a.l + a.b)) - a.l) + 0.7D * a.b,
            |      'out', array_append(a.out, named_struct(
            |        'l', 0.5D * x.value + 0.5D * (a.l + a.b),
            |        'b', 0.3D * ((0.5D * x.value + 0.5D * (a.l + a.b)) - a.l) + 0.7D * a.b)))
            |    END,
            |  a -> a.out)""".stripMargin))
        .select(col("user_id"), posexplode(expr(
          "zip_with(sorted, states, (s, st) -> named_struct('event_id', s.event_id, 'l', st.l, 'b', st.b))")))
        .select(col("user_id"), col("col.event_id").as("event_id"),
          (col("pos") + 1).cast("bigint").as("rn"),
          col("col.l").as("level"), col("col.b").as("trend"),
          (col("col.l") + col("col.b")).as("forecast"))
        .orderBy("user_id", "rn")),

    // R5 (round 8): Benford first-digit audit of order totals — the
    // classic fabricated-data / corrupted-feed detector. One combinable
    // 9-group count aggregate (map-side collapse) + the expected
    // log10(1+1/d) mass per digit; p_obs is one exact-int division.
    "dq_benford" -> ((s, d) =>
      load(s, d, "orders")
        .filter(col("o_totalprice") >= 1)
        .groupBy(expr(benfordDigit).as("digit"))
        .agg(count(lit(1)).as("cnt"))
        .withColumn("n", col("cnt").cast("bigint"))
        .withColumn("p_obs", (col("cnt") / sum(col("cnt")).over(Window.partitionBy()))
          .cast(DecimalType(18, 6)))
        .withColumn("p_benford",
          expr("CAST(log10(1.0 + 1.0 / CAST(digit AS DOUBLE)) AS DECIMAL(18,6))"))
        .select("digit", "n", "p_obs", "p_benford")
        .orderBy("digit"))
  )

  // dq_benford first-digit extraction — shared SQL fragment: the first
  // decimal digit comes from the INTEGER floor's string render (exact
  // on both engines), never from log10 bucketing of a double (whose
  // libm rounding near powers of 10 could flip the digit cross-engine).
  private val benfordDigit =
    "substring(CAST(CAST(floor(o_totalprice) AS BIGINT) AS STRING), 1, 1)"

  val oracle: Map[String, String] = Map(
    "dq_benford" ->
      s"""WITH b AS (SELECT ${benfordDigit.replace("AS STRING", "AS VARCHAR")} AS digit
         |           FROM orders WHERE o_totalprice >= 1)
         |SELECT digit, CAST(count(*) AS BIGINT) AS n,
         |  CAST(count(*) / sum(count(*)) OVER () AS DECIMAL(18,6)) AS p_obs,
         |  CAST(log10(1.0 + 1.0 / CAST(digit AS DOUBLE)) AS DECIMAL(18,6)) AS p_benford
         |FROM b GROUP BY digit ORDER BY digit""".stripMargin,
    "dq_profile" ->
      """WITH u AS (
        |  SELECT 'o_orderstatus' AS col_name, o_orderstatus AS v FROM orders
        |  UNION ALL
        |  SELECT 'o_orderpriority', o_orderpriority FROM orders
        |  UNION ALL
        |  SELECT 'o_custkey', CAST(o_custkey AS VARCHAR) FROM orders
        |  UNION ALL
        |  SELECT 'o_totalprice', CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS VARCHAR) FROM orders)
        |SELECT col_name, CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(CASE WHEN v IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null,
        |  CAST(count(DISTINCT v) AS BIGINT) AS n_distinct,
        |  min(v) AS min_v, max(v) AS max_v
        |FROM u GROUP BY col_name ORDER BY col_name""".stripMargin,
    "win_drawdown" ->
      """WITH s AS (SELECT user_id, event_id,
        |    CAST(value AS DECIMAL(18,2)) AS x,
        |    CAST(ts AS TIMESTAMP) AS t
        |  FROM events),
        | eq AS (SELECT user_id, event_id, t,
        |    sum(x) OVER (PARTITION BY user_id ORDER BY t, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS equity
        |  FROM s),
        | w AS (SELECT user_id, event_id, equity,
        |    max(equity) OVER (PARTITION BY user_id ORDER BY t, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS peak
        |  FROM eq)
        |SELECT user_id, event_id,
        |  CAST(equity AS DECIMAL(38,2)) AS equity,
        |  CAST(peak AS DECIMAL(38,2)) AS peak,
        |  CAST(peak - equity AS DOUBLE) AS dd,
        |  CASE WHEN peak > 0
        |    THEN CAST(peak - equity AS DOUBLE) / CAST(peak AS DOUBLE) END AS dd_frac
        |FROM w ORDER BY user_id, event_id""".stripMargin,
    "text_lm_score" ->
      """WITH w AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
        | db AS (SELECT doc_id, b[1] AS w1, b[2] AS w2
        |  FROM (SELECT doc_id, unnest(list_transform(generate_series(2, len(w)),
        |      i -> [w[i-1], w[i]])) AS b FROM w)),
        | bg AS (SELECT w1, w2, CAST(count(*) AS BIGINT) AS c2
        |  FROM db GROUP BY 1, 2),
        | lm AS (SELECT w1, w2,
        |    CAST(floor(1000000 * c2 / sum(c2) OVER (PARTITION BY w1)) AS BIGINT) AS q
        |  FROM bg)
        |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
        |  CAST(sum(q) AS BIGINT) AS q_sum,
        |  CAST(sum(q) AS DOUBLE) / (1000000.0 * CAST(count(*) AS DOUBLE)) AS lm_score
        |FROM db JOIN lm USING (w1, w2)
        |GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "ts_holt" ->
      """WITH RECURSIVE e AS (SELECT user_id, event_id, value,
        |    row_number() OVER (PARTITION BY user_id
        |      ORDER BY CAST(ts AS TIMESTAMP), event_id) AS rn
        |  FROM events),
        | s AS (SELECT user_id, event_id, rn,
        |     CAST(value AS DOUBLE) AS level, CAST(0.0 AS DOUBLE) AS trend
        |   FROM e WHERE rn = 1
        |   UNION ALL
        |   SELECT e.user_id, e.event_id, e.rn,
        |     CAST(0.5 AS DOUBLE) * e.value + CAST(0.5 AS DOUBLE) * (s.level + s.trend),
        |     CAST(0.3 AS DOUBLE) * ((CAST(0.5 AS DOUBLE) * e.value
        |         + CAST(0.5 AS DOUBLE) * (s.level + s.trend)) - s.level)
        |       + CAST(0.7 AS DOUBLE) * s.trend
        |   FROM s JOIN e ON e.user_id = s.user_id AND e.rn = s.rn + 1)
        |SELECT user_id, event_id, CAST(rn AS BIGINT) AS rn,
        |  level, trend, level + trend AS forecast
        |FROM s ORDER BY user_id, rn""".stripMargin
  )
}
