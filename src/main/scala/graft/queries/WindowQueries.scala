package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.Tables.{dec, load}

/** Family E — window functions (SURVEY.md §2.E).
  *
  * Every window's orderBy carries a unique-key tie-breaker so rank and
  * frame contents are deterministic across shuffle orders (SURVEY
  * §7.4.3). Ranking outputs are cast to bigint to match DuckDB's
  * window-function result type. Scale note: a window shuffles once on
  * its partition key; all five queries reuse per-key partitioning and
  * never materialize a cross product.
  */
object WindowQueries {

  val queries: Map[String, Q] = Map(
    // E1: ranking family. w1 has a total order (rank == row_number);
    // w2 ranks a low-cardinality key so real ties exercise rank vs
    // dense_rank semantics.
    "win_rank" -> ((s, d) => {
      val w1 = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      val w2 = Window.partitionBy(col("o_custkey")).orderBy(col("o_orderstatus").asc)
      load(s, d, "orders")
        .select(
          col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
          row_number().over(w1).cast("bigint").as("rn"),
          rank().over(w1).cast("bigint").as("rnk"),
          rank().over(w2).cast("bigint").as("rnk_status"),
          dense_rank().over(w2).cast("bigint").as("drnk_status"))
        .filter(col("rn") <= 3)
        .orderBy("o_custkey", "rn")
    }),

    // E2: running (cumulative) revenue per customer in date order.
    "win_running" -> ((s, d) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate").asc, col("o_orderkey").asc)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      load(s, d, "orders")
        .select(
          col("o_custkey"), col("o_orderkey"), col("o_orderdate"),
          sum(dec(col("o_totalprice"))).over(w)
            .cast(DecimalType(38, 2)).as("running_rev"))
        .orderBy("o_custkey", "o_orderdate", "o_orderkey")
    }),

    // E3: 7-day sliding sum per user — RANGE frame over epoch seconds.
    // Range frames are tie-insensitive (peers by value), so no
    // tie-breaker is needed inside the frame spec.
    "win_range_frame" -> ((s, d) => {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("epoch_s"))
        .rangeBetween(-604800L, 0L)
      load(s, d, "events")
        .withColumn("epoch_s", col("ts").cast("timestamp").cast("long"))
        .select(
          col("event_id"), col("user_id"), col("epoch_s"),
          sum(dec(col("value"))).over(w).cast(DecimalType(38, 2)).as("win_7d"))
        .orderBy("event_id")
    }),

    // E4: lead/lag/first/last per user in event-time order.
    "win_lead_lag" -> ((s, d) => {
      val ord = Window.partitionBy(col("user_id"))
        .orderBy(col("ts").asc, col("event_id").asc)
      val full = ord.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      load(s, d, "events")
        .select(
          col("event_id"), col("user_id"),
          lag(col("event_id"), 1).over(ord).as("prev_id"),
          lead(col("event_id"), 1).over(ord).as("next_id"),
          first(col("event_id")).over(full).as("first_id"),
          last(col("event_id")).over(full).as("last_id"),
          (col("ts").cast("timestamp").cast("long")
            - lag(col("ts"), 1).over(ord).cast("timestamp").cast("long")).as("gap_s"))
        .orderBy("event_id")
    }),

    // E5: ntile / percent_rank / cume_dist over a total order, so the
    // ratio outputs are exact integer fractions — identical doubles in
    // both engines.
    "win_ntile_cume" -> ((s, d) => {
      val w = Window.orderBy(col("o_totalprice").asc, col("o_orderkey").asc)
      load(s, d, "orders")
        .select(
          col("o_orderkey"), col("o_totalprice"),
          ntile(4).over(w).cast("bigint").as("quartile"),
          percent_rank().over(w).as("pct_rank"),
          cume_dist().over(w).as("cume"))
        .orderBy("o_orderkey")
    }),
  )

  val oracle: Map[String, String] = Map(
    "win_rank" ->
      """SELECT * FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |   row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn,
        |   rank()       OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey ASC) AS rnk,
        |   rank()       OVER (PARTITION BY o_custkey ORDER BY o_orderstatus ASC) AS rnk_status,
        |   dense_rank() OVER (PARTITION BY o_custkey ORDER BY o_orderstatus ASC) AS drnk_status
        |  FROM orders) t
        | WHERE rn <= 3 ORDER BY o_custkey, rn""".stripMargin,
    "win_running" ->
      """SELECT o_custkey, o_orderkey, o_orderdate,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2)))
        |    OVER (PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DECIMAL(38,2)) AS running_rev
        | FROM orders ORDER BY o_custkey, o_orderdate, o_orderkey""".stripMargin,
    "win_range_frame" ->
      """SELECT event_id, user_id, epoch_s,
        |  CAST(sum(CAST(value AS DECIMAL(18,2)))
        |    OVER (PARTITION BY user_id ORDER BY epoch_s
        |          RANGE BETWEEN 604800 PRECEDING AND CURRENT ROW) AS DECIMAL(38,2)) AS win_7d
        | FROM (SELECT event_id, user_id, value,
        |         CAST(floor(epoch(CAST(ts AS TIMESTAMP))) AS BIGINT) AS epoch_s
        |       FROM events) e
        | ORDER BY event_id""".stripMargin,
    "win_lead_lag" ->
      """SELECT event_id, user_id,
        |  lag(event_id, 1)  OVER w AS prev_id,
        |  lead(event_id, 1) OVER w AS next_id,
        |  first_value(event_id) OVER (PARTITION BY user_id
        |    ORDER BY CAST(ts AS TIMESTAMP) ASC, event_id ASC
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS first_id,
        |  last_value(event_id) OVER (PARTITION BY user_id
        |    ORDER BY CAST(ts AS TIMESTAMP) ASC, event_id ASC
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS last_id,
        |  CAST(floor(epoch(CAST(ts AS TIMESTAMP))) AS BIGINT)
        |    - CAST(floor(epoch(CAST(lag(ts, 1) OVER w AS TIMESTAMP))) AS BIGINT) AS gap_s
        | FROM events
        | WINDOW w AS (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP) ASC, event_id ASC)
        | ORDER BY event_id""".stripMargin,
    "win_ntile_cume" ->
      """SELECT o_orderkey, o_totalprice,
        |  ntile(4)       OVER w AS quartile,
        |  percent_rank() OVER w AS pct_rank,
        |  cume_dist()    OVER w AS cume
        | FROM orders
        | WINDOW w AS (ORDER BY o_totalprice ASC, o_orderkey ASC)
        | ORDER BY o_orderkey""".stripMargin,
  )
}
