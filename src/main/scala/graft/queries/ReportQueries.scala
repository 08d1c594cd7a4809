package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables.load
import graft.api.GraftOps

/** Family Z — pipeline-composition reports (ref: n/a, SURVEY §0 —
  * the reference repo is empty): the rollups a data team actually
  * ships, composed from the library's own primitives.
  *
  * Scale shapes (the 100 TB contract):
  *  - Z1 sessionize_hist: GraftOps.sessionize (one user_id exchange)
  *    → per-session partial counts collapse map-side → the histogram
  *    shuffle carries one row per distinct session length.
  *  - Z2 corpus_quality_sweep: token-density scoring is map-only
  *    exact integer math; bucketing uses a broadcast 1-row min/max
  *    (never a global sort/ntile — a rank-based decile would funnel
  *    the corpus through one partition); the cumulative sweep runs
  *    on the 10-row bucket table.
  */
object ReportQueries {

  val queries: Map[String, Q] = Map(
    // Z1: session-length distribution — how many sessions have k
    // events, the first histogram every behavioral pipeline ships.
    "sessionize_hist" -> ((s, d) => {
      val ev = load(s, d, "events")
        .withColumn("ep_us", expr("unix_micros(cast(ts as timestamp))"))
        .select("user_id", "ep_us", "event_id")
      GraftOps.sessionize(ev, "user_id", "ep_us", "event_id",
        gapMicros = 1800L * 1000000L)
        .groupBy("user_id", "sess").agg(count(lit(1)).as("n"))
        .groupBy("n").agg(count(lit(1)).as("n_sessions"))
        .orderBy("n")
    }),

    // Z2: quality-threshold sweep — docs/tokens per token-density
    // band plus the cumulative token budget a filter at that band
    // would keep. Density is exact integer fixed-point
    // (tokens·100000 DIV chars); bands are equal-width over the
    // observed range via a broadcast min/max.
    "corpus_quality_sweep" -> ((s, d) => {
      val scored = load(s, d, "documents")
        .select(col("doc_id"),
          expr("CAST(size(split(text, ' ')) AS BIGINT)").as("tok"),
          col("n_chars"))
        .withColumn("score", expr("(tok * 100000) DIV n_chars"))
      val bounds = scored.agg(min(col("score")).as("mn"), max(col("score")).as("mx"))
      val banded = scored.crossJoin(broadcast(bounds))
        .withColumn("band",
          expr("least(CAST(9 AS BIGINT), ((score - mn) * 10) DIV (mx - mn + 1))"))
        .groupBy("band")
        .agg(count(lit(1)).as("n_docs"), sum(col("tok")).cast("long").as("n_tokens"))
      val cum = Window.orderBy(col("band").desc)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      banded
        .withColumn("cum_tokens_at_or_above", sum(col("n_tokens")).over(cum).cast("long"))
        .select("band", "n_docs", "n_tokens", "cum_tokens_at_or_above")
        .orderBy("band")
    })
  )

  val oracle: Map[String, String] = Map(
    "sessionize_hist" ->
      """WITH e AS (SELECT user_id, event_id, epoch_us(CAST(ts AS TIMESTAMP)) AS ep_us
        |           FROM events),
        | f AS (SELECT *, CASE WHEN lag(ep_us) OVER w IS NULL
        |          OR ep_us - lag(ep_us) OVER w > 1800000000 THEN 1 ELSE 0 END AS new_sess
        |   FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ep_us, event_id)),
        | g AS (SELECT *, CAST(sum(new_sess) OVER (PARTITION BY user_id ORDER BY ep_us, event_id
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS sess
        |   FROM f),
        | sl AS (SELECT user_id, sess, CAST(count(*) AS BIGINT) AS n FROM g GROUP BY 1, 2)
        |SELECT n, CAST(count(*) AS BIGINT) AS n_sessions
        |FROM sl GROUP BY n ORDER BY n""".stripMargin,
    "corpus_quality_sweep" ->
      """WITH s AS (SELECT doc_id,
        |    CAST(len(string_split(text, ' ')) AS BIGINT) AS tok, n_chars,
        |    (CAST(len(string_split(text, ' ')) AS BIGINT) * 100000) // n_chars AS score
        |  FROM documents),
        | b AS (SELECT min(score) AS mn, max(score) AS mx FROM s),
        | banded AS (SELECT least(CAST(9 AS BIGINT),
        |      ((score - mn) * 10) // (mx - mn + 1)) AS band,
        |    CAST(count(*) AS BIGINT) AS n_docs,
        |    CAST(sum(tok) AS BIGINT) AS n_tokens
        |  FROM s, b GROUP BY 1)
        |SELECT band, n_docs, n_tokens,
        |  CAST(sum(n_tokens) OVER (ORDER BY band DESC
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |    AS cum_tokens_at_or_above
        |FROM banded ORDER BY band""".stripMargin
  )
}
