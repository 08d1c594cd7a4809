package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables.{dec, load}

/** Family W — sequence analytics (ref: n/a, SURVEY §0 — the reference
  * repo is empty): exact rolling median, time-bounded funnels, and
  * condition-streak detection.
  *
  * Scale shapes (the 100 TB contract):
  *  - W1 win_median_frame: the frame is BOUNDED (21 rows), so the
  *    per-row collect+sort state is O(frame), not O(partition); one
  *    event_type exchange. Median uses lower-middle (discrete)
  *    semantics — element (n+1) DIV 2 of the sorted frame — which is
  *    exact decimal selection, no interpolation arithmetic to drift.
  *  - W2 funnel_window: the ClickHouse-windowFunnel shape (each step
  *    within 1 h of the previous) restated as three user-keyed
  *    filter→agg passes chained by equi-joins — every stage rides the
  *    user_id partitioning; no per-user array state, no driver logic.
  *  - W3 win_streak: condition-based gaps-and-islands (runs of
  *    increasing value per type): lag + running break-count share one
  *    event_type exchange; the island rollup's partial agg collapses
  *    each island to one row before the second (island-count-sized)
  *    shuffle.
  */
object SequenceQueries {

  val queries: Map[String, Q] = Map(
    // W1: exact trailing-21 rolling median of value per event_type —
    // discrete (lower-middle) median: element (n+1) DIV 2 of the
    // sorted frame, matching DuckDB's quantile_disc(0.5).
    "win_median_frame" -> ((s, d) => {
      val base = load(s, d, "events")
        .select(col("event_type"), col("ts"), col("event_id"), dec(col("value")).as("x"))
      graft.api.GraftOps.rollingMedian(base, "event_type",
        Seq(col("ts").asc, col("event_id").asc), "x",
        precedingRows = 20, nOut = "n", medOut = "med")
        .select("event_id", "event_type", "n", "med")
        .orderBy("event_id")
    }),

    // W2: time-bounded funnel — first view, first click within 1 h of
    // it, first purchase within 1 h of that; depth = steps reached.
    // Three user-keyed aggregations chained by equi-joins.
    "funnel_window" -> ((s, d) => {
      val ev = load(s, d, "events")
        .withColumn("ep", expr("unix_micros(cast(ts as timestamp))"))
        .select("user_id", "event_type", "ep")
      graft.api.GraftOps.windowFunnel(ev, "user_id", "event_type", "ep",
        steps = Seq("view", "click", "purchase"), windowMicros = 3600000000L)
        .select(col("user_id"), col("t1").as("tv"), col("t2").as("tc"),
          col("t3").as("tp"), col("depth"))
        .orderBy("user_id")
    }),

    // W3: longest run of strictly increasing value per event_type —
    // condition-based islands: a break (value <= previous, or the
    // first row) opens a new island; islands collapse map-side.
    "win_streak" -> ((s, d) => {
      val base = load(s, d, "events")
        .select(col("event_type"), col("ts"), col("event_id"), dec(col("value")).as("x"))
      graft.api.GraftOps.increasingStreaks(base, "event_type",
        Seq(col("ts").asc, col("event_id").asc), "x")
        .orderBy("event_type")
    }),

    // W4 (round 8): first-order Markov transition matrix over per-user
    // event sequences — the sequence-mining primitive behind next-event
    // prediction and session-flow reports. lag() per user (deterministic
    // ts, event_id order) emits (prev, next) bigrams; one combinable
    // count aggregate collapses them map-side, and the row-probability
    // normalization runs over the TYPE²-sized matrix, not the events.
    // Scale: the lag window rides one user_id exchange (bounded per-user
    // partitions); everything after it is matrix-grain. The division is
    // a single exact-integer-over-exact-integer op — no float folds.
    "seq_markov" -> ((s, d) => {
      val w = Window.partitionBy("user_id").orderBy(col("ts").asc, col("event_id").asc)
      val pairs = load(s, d, "events")
        .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
        .withColumn("prev_type", lag(col("event_type"), 1).over(w))
        .filter(col("prev_type").isNotNull)
      val counts = pairs.groupBy(col("prev_type"), col("event_type").as("next_type"))
        .agg(count(lit(1)).as("n"))
      counts
        .withColumn("p", (col("n") / sum(col("n")).over(Window.partitionBy("prev_type")))
          .cast(org.apache.spark.sql.types.DecimalType(18, 6)))
        .select(col("prev_type"), col("next_type"), col("n").cast("bigint").as("n"), col("p"))
        .orderBy("prev_type", "next_type")
    })
  )

  val oracle: Map[String, String] = Map(
    "win_median_frame" ->
      """WITH e AS (SELECT event_type, ts, event_id,
        |    CAST(value AS DECIMAL(18,2)) AS x FROM events)
        |SELECT event_id, event_type,
        |  CAST(count(*) OVER fr AS BIGINT) AS n,
        |  quantile_disc(x, 0.5) OVER fr AS med
        |FROM e WINDOW fr AS (PARTITION BY event_type ORDER BY ts, event_id
        |  ROWS BETWEEN 20 PRECEDING AND CURRENT ROW)
        |ORDER BY event_id""".stripMargin,
    "funnel_window" ->
      """WITH e AS (SELECT user_id, event_type,
        |    epoch_us(CAST(ts AS TIMESTAMP)) AS ep FROM events),
        | v AS (SELECT user_id, min(ep) AS tv FROM e
        |   WHERE event_type = 'view' GROUP BY 1),
        | c AS (SELECT e.user_id, min(ep) AS tc FROM e JOIN v USING (user_id)
        |   WHERE event_type = 'click' AND ep > tv AND ep <= tv + 3600000000
        |   GROUP BY 1),
        | p AS (SELECT e.user_id, min(ep) AS tp FROM e JOIN c USING (user_id)
        |   WHERE event_type = 'purchase' AND ep > tc AND ep <= tc + 3600000000
        |   GROUP BY 1)
        |SELECT user_id, tv, tc, tp,
        |  CAST(1 + CASE WHEN tc IS NOT NULL THEN 1 ELSE 0 END
        |    + CASE WHEN tp IS NOT NULL THEN 1 ELSE 0 END AS BIGINT) AS depth
        |FROM v LEFT JOIN c USING (user_id) LEFT JOIN p USING (user_id)
        |ORDER BY user_id""".stripMargin,
    "win_streak" ->
      """WITH e AS (SELECT event_type, ts, event_id,
        |    CAST(value AS DECIMAL(18,2)) AS x FROM events),
        | f AS (SELECT event_type, ts, event_id, x,
        |    x > lag(x) OVER ord AS up
        |  FROM e WINDOW ord AS (PARTITION BY event_type ORDER BY ts, event_id)),
        | g AS (SELECT *, sum(CASE WHEN coalesce(up, false) THEN 0 ELSE 1 END)
        |    OVER (PARTITION BY event_type ORDER BY ts, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS grp
        |  FROM f),
        | i AS (SELECT event_type, grp,
        |    sum(CASE WHEN up THEN 1 ELSE 0 END) AS streak_len
        |  FROM g GROUP BY 1, 2)
        |SELECT event_type,
        |  CAST(max(streak_len) AS BIGINT) AS max_streak,
        |  CAST(sum(CASE WHEN streak_len > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_streaks,
        |  CAST(sum(streak_len) AS BIGINT) AS n_up
        |FROM i GROUP BY 1 ORDER BY event_type""".stripMargin,
    "seq_markov" ->
      """WITH p AS (SELECT event_type AS next_type,
        |    lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_type
        |  FROM events)
        |SELECT prev_type, next_type, CAST(count(*) AS BIGINT) AS n,
        |  CAST(count(*) / sum(count(*)) OVER (PARTITION BY prev_type) AS DECIMAL(18,6)) AS p
        |FROM p WHERE prev_type IS NOT NULL
        |GROUP BY prev_type, next_type ORDER BY prev_type, next_type""".stripMargin
  )
}
