package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables.load

/** Family X — robust statistics (ref: n/a, SURVEY §0 — the reference
  * repo is empty): rolling IQR outlier fences, the Gini concentration
  * coefficient, and median absolute deviation. All on the exact cent
  * grid (q = round(100·x) as BIGINT) with DISCRETE quantiles —
  * element ceil(n·p) of the sorted set, DuckDB's quantile_disc rule
  * (probed over n = 1..8) — so every comparison and selection is exact
  * integer arithmetic; no interpolation, no float fences.
  *
  * Scale shapes (the 100 TB contract):
  *  - X1 win_iqr_outliers: BOUNDED 21-row frame → O(frame) per-row
  *    state, one event_type exchange; the fence test is
  *    cross-multiplied to integers (2q < 2p25 − 3·IQR), so the flag
  *    can never flip on a 1-ulp double difference.
  *  - X2 agg_gini_coef: rank window + aggregation share ONE group
  *    exchange; Σi·q is tie-order invariant (equal values commute
  *    inside a tied rank block).
  *  - X3 ts_mad: two rank-select medians (value, then deviation) —
  *    each is one keyed window pass; the 5-row median table joins
  *    back by broadcast.
  */
object RobustQueries {

  private val grid = expr("CAST(round(value * 100) AS BIGINT)")

  val queries: Map[String, Q] = Map(
    // X1: rolling Tukey fences — trailing-21 discrete p25/p75 per
    // event_type; outlier flags from exact integer comparisons.
    "win_iqr_outliers" -> ((s, d) => {
      val w = Window.partitionBy("event_type")
        .orderBy(col("ts").asc, col("event_id").asc).rowsBetween(-20, 0)
      load(s, d, "events")
        .select(col("event_type"), col("ts"), col("event_id"), grid.as("q"))
        .withColumn("arr", array_sort(collect_list(col("q")).over(w)))
        .withColumn("n", size(col("arr")).cast("bigint"))
        .withColumn("p25", expr("element_at(arr, CAST(CEIL(size(arr) * 0.25) AS INT))"))
        .withColumn("p75", expr("element_at(arr, CAST(CEIL(size(arr) * 0.75) AS INT))"))
        .select(col("event_id"), col("event_type"), col("n"),
          expr("CAST(p25 / 100.0D AS DECIMAL(18,2))").as("p25_v"),
          expr("CAST(p75 / 100.0D AS DECIMAL(18,2))").as("p75_v"),
          expr("2 * q < 2 * p25 - 3 * (p75 - p25)").as("is_low"),
          expr("2 * q > 2 * p75 + 3 * (p75 - p25)").as("is_high"))
        .orderBy("event_id")
    }),

    // X2: Gini concentration coefficient of order value per priority
    // class — G = (2·Σi·qᵢ − (n+1)·Σq) / (n·Σq) over the sorted
    // ranks; exact integer sums, one double division.
    "agg_gini_coef" -> ((s, d) => {
      val w = Window.partitionBy("o_orderpriority")
        .orderBy(col("q").asc, col("o_orderkey").asc)
      load(s, d, "orders")
        .select(col("o_orderpriority"), col("o_orderkey"),
          expr("CAST(round(o_totalprice * 100) AS BIGINT)").as("q"))
        .withColumn("i", row_number().over(w).cast("bigint"))
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("n"),
          sum(expr("CAST(q AS DECIMAL(38,0))")).as("sq"),
          sum(expr("CAST(i * q AS DECIMAL(38,0))")).as("siq"))
        .select(col("o_orderpriority"), col("n"),
          expr("""CAST((2.0D * CAST(siq AS DOUBLE) - (CAST(n AS DOUBLE) + 1.0D) * CAST(sq AS DOUBLE))
                 | / (CAST(n AS DOUBLE) * CAST(sq AS DOUBLE)) AS DECIMAL(18,6))""".stripMargin).as("gini"))
        .orderBy("o_orderpriority")
    }),

    // X3: median absolute deviation per event_type — both medians are
    // DISCRETE rank selections ((n+1) DIV 2 of the sorted sequence),
    // so the whole statistic is exact integer selection.
    "ts_mad" -> ((s, d) => {
      val ev = load(s, d, "events").select(col("event_type"), col("event_id"), grid.as("q"))
      def rankMedian(df: org.apache.spark.sql.DataFrame, valCol: String, out: String) = {
        val w = Window.partitionBy("event_type").orderBy(col(valCol).asc, col("event_id").asc)
        val all = Window.partitionBy("event_type")
          .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
        df.withColumn("rn", row_number().over(w).cast("bigint"))
          .withColumn("nn", count(lit(1)).over(all))
          .filter(col("rn") === expr("(nn + 1) DIV 2"))
          .select(col("event_type"), col(valCol).as(out), col("nn"))
      }
      val med = rankMedian(ev, "q", "med_q")
      val dev = ev.join(broadcast(med.drop("nn")), "event_type")
        .withColumn("d", abs(col("q") - col("med_q")))
      rankMedian(dev, "d", "mad_q").drop("nn")
        .join(broadcast(med), "event_type")
        .select(col("event_type"), col("nn").as("n"),
          expr("CAST(med_q / 100.0D AS DECIMAL(18,2))").as("median_v"),
          expr("CAST(mad_q / 100.0D AS DECIMAL(18,2))").as("mad_v"))
        .orderBy("event_type")
    }),

    // X4 (round 7): quantity-weighted median price per return flag —
    // the weighted-quantile selection a data-mix audit needs (each
    // row counts `wt` times). Cumulative weights ride a RANGE frame,
    // so tied values share one group-end cumulative and the selected
    // value is tie-order independent; the threshold test is the
    // exact integer comparison 2·cw ≥ tot (no float midpoint). One
    // keyed window pass — the same shape as the X3 rank-select
    // median, weights replacing row counts.
    "agg_weighted_median" -> ((s, d) => {
      val b = load(s, d, "lineitem").select(
        col("l_returnflag").as("flag"),
        graft.Tables.dec(col("l_extendedprice")).as("v"),
        col("l_quantity").cast("bigint").as("wt"))
      // Round 17 (guide §2.5): partitionBy("flag") has THREE distinct
      // values, so the window serialized the whole table into 3 tasks
      // (8.1 s at sf1). Pre-aggregate per (flag, v) first — map-side
      // combinable, fully parallel — and run the same RANGE-frame
      // cumulative over the per-value weight sums. Exactly equal by
      // construction: the RANGE frame already groups tied v (ties
      // share one group-end cumulative), so cw at value v is the sum
      // of all weight at values ≤ v on both formulations, tot is the
      // flag total either way, and min(v) over 2·cw ≥ tot is
      // unchanged. The window now sorts distinct values per flag
      // instead of every row.
      val pv = b.groupBy("flag", "v").agg(sum(col("wt")).as("w"))
      val cum = Window.partitionBy("flag").orderBy("v")
        .rangeBetween(Window.unboundedPreceding, Window.currentRow)
      pv.withColumn("cw", sum(col("w")).over(cum))
        .withColumn("tot", sum(col("w")).over(Window.partitionBy("flag")))
        .filter(lit(2) * col("cw") >= col("tot"))
        .groupBy("flag")
        .agg(min(col("v")).as("wmedian"), max(col("tot")).cast("bigint").as("wt_total"))
        .orderBy("flag")
    })
  )

  val oracle: Map[String, String] = Map(
    // X4 twin: identical RANGE-frame cumulative + integer threshold.
    "agg_weighted_median" ->
      """WITH b AS (SELECT l_returnflag AS flag,
        |         CAST(l_extendedprice AS DECIMAL(18,2)) AS v,
        |         CAST(l_quantity AS BIGINT) AS wt FROM lineitem),
        | c AS (SELECT *, sum(wt) OVER (PARTITION BY flag ORDER BY v
        |         RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cw,
        |       sum(wt) OVER (PARTITION BY flag) AS tot FROM b)
        | SELECT flag, min(v) AS wmedian, CAST(max(tot) AS BIGINT) AS wt_total
        | FROM c WHERE 2 * cw >= tot GROUP BY flag ORDER BY flag""".stripMargin,
    "win_iqr_outliers" ->
      """WITH e AS (SELECT event_type, ts, event_id,
        |    CAST(round(value * 100) AS BIGINT) AS q FROM events),
        | w AS (SELECT event_id, event_type, q,
        |    CAST(count(*) OVER fr AS BIGINT) AS n,
        |    quantile_disc(q, 0.25) OVER fr AS p25,
        |    quantile_disc(q, 0.75) OVER fr AS p75
        |  FROM e WINDOW fr AS (PARTITION BY event_type ORDER BY ts, event_id
        |    ROWS BETWEEN 20 PRECEDING AND CURRENT ROW))
        |SELECT event_id, event_type, n,
        |  CAST(p25 / 100.0 AS DECIMAL(18,2)) AS p25_v,
        |  CAST(p75 / 100.0 AS DECIMAL(18,2)) AS p75_v,
        |  2 * q < 2 * p25 - 3 * (p75 - p25) AS is_low,
        |  2 * q > 2 * p75 + 3 * (p75 - p25) AS is_high
        |FROM w ORDER BY event_id""".stripMargin,
    "agg_gini_coef" ->
      """WITH o AS (SELECT o_orderpriority, o_orderkey,
        |    CAST(round(o_totalprice * 100) AS BIGINT) AS q FROM orders),
        | r AS (SELECT *, CAST(row_number() OVER (PARTITION BY o_orderpriority
        |    ORDER BY q, o_orderkey) AS BIGINT) AS i FROM o),
        | a AS (SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n,
        |    sum(CAST(q AS DECIMAL(38,0))) AS sq,
        |    sum(CAST(i * q AS DECIMAL(38,0))) AS siq
        |  FROM r GROUP BY 1)
        |SELECT o_orderpriority, n,
        |  CAST((2.0 * CAST(siq AS DOUBLE) - (CAST(n AS DOUBLE) + 1.0) * CAST(sq AS DOUBLE))
        |    / (CAST(n AS DOUBLE) * CAST(sq AS DOUBLE)) AS DECIMAL(18,6)) AS gini
        |FROM a ORDER BY o_orderpriority""".stripMargin,
    "ts_mad" ->
      """WITH e AS (SELECT event_type, event_id,
        |    CAST(round(value * 100) AS BIGINT) AS q FROM events),
        | r1 AS (SELECT *, CAST(row_number() OVER (PARTITION BY event_type
        |      ORDER BY q, event_id) AS BIGINT) AS rn,
        |    CAST(count(*) OVER (PARTITION BY event_type) AS BIGINT) AS nn
        |  FROM e),
        | med AS (SELECT event_type, q AS med_q, nn FROM r1 WHERE rn = (nn + 1) // 2),
        | dv AS (SELECT e.event_type, e.event_id, abs(e.q - med.med_q) AS d
        |  FROM e JOIN med USING (event_type)),
        | r2 AS (SELECT *, CAST(row_number() OVER (PARTITION BY event_type
        |      ORDER BY d, event_id) AS BIGINT) AS rn,
        |    CAST(count(*) OVER (PARTITION BY event_type) AS BIGINT) AS nn
        |  FROM dv),
        | mad AS (SELECT event_type, d AS mad_q FROM r2 WHERE rn = (nn + 1) // 2)
        |SELECT med.event_type, med.nn AS n,
        |  CAST(med_q / 100.0 AS DECIMAL(18,2)) AS median_v,
        |  CAST(mad_q / 100.0 AS DECIMAL(18,2)) AS mad_v
        |FROM med JOIN mad USING (event_type)
        |ORDER BY event_type""".stripMargin
  )
}
