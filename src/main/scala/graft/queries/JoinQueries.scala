package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.Tables.{dec, load}

/** Family C — joins (SURVEY.md §2.C).
  *
  * Physical-join choices are pinned with hints where the test contract
  * needs a specific exec (C1 shuffle-hash, C2 broadcast, C3 sort-merge)
  * so plan-shape tests stay stable under AQE. Scale notes:
  *  - C2 broadcasts the dimension side — the star-join pattern that
  *    avoids shuffling the 100 TB fact table entirely.
  *  - C8 keeps the theta-join key-equi on user_id so it executes as a
  *    hash join + residual range filter, not a nested-loop cartesian.
  *  - C10 implements as-of via union-free running window (one shuffle,
  *    O(n log n)) instead of a self-join, the only formulation that
  *    survives dense per-key event streams at scale.
  */
object JoinQueries {

  val queries: Map[String, Q] = Map(
    "tpch_q3" -> q3,
    // C1: equi inner join, shuffle-hash pinned via hint on the build side.
    "join_inner_hash" -> ((s, d) => {
      val li = load(s, d, "lineitem")
      val o = load(s, d, "orders").hint("SHUFFLE_HASH")
      li.join(o, li("l_orderkey") === o("o_orderkey"), "inner")
        .select("l_orderkey", "l_linenumber", "o_custkey", "o_orderstatus")
        .orderBy("l_orderkey", "l_linenumber")
    }),

    // C2: star join with broadcast dimension (Q14 shape).
    "join_broadcast" -> ((s, d) => {
      val li = load(s, d, "lineitem")
      val p = load(s, d, "part")
      li.join(broadcast(p), li("l_partkey") === p("p_partkey"), "inner")
        .groupBy("p_brand")
        .agg(
          sum(dec(col("l_extendedprice"))
            * (lit(1) - dec(col("l_discount"))).cast(DecimalType(4, 2)))
            .cast(DecimalType(38, 4)).as("revenue"),
          count(lit(1)).as("n"))
        .orderBy("p_brand")
    }),

    // C3: large-large sort-merge join pinned with MERGE hint.
    "join_sort_merge" -> ((s, d) => {
      val li = load(s, d, "lineitem")
      val o = load(s, d, "orders").hint("MERGE")
      li.join(o, li("l_orderkey") === o("o_orderkey"), "inner")
        .groupBy("o_orderstatus")
        .agg(
          sum(dec(col("l_quantity"))).cast(DecimalType(38, 2)).as("sum_qty"),
          count(lit(1)).as("n"))
        .orderBy("o_orderstatus")
    }),

    // C4: left outer — customers keep their row with null order cols.
    "join_left_outer" -> ((s, d) => {
      val c = load(s, d, "customer")
      val o = load(s, d, "orders")
      c.join(o, c("c_custkey") === o("o_custkey"), "left")
        .select("c_custkey", "o_orderkey", "o_totalprice")
        .orderBy(col("c_custkey").asc, col("o_orderkey").asc_nulls_first)
    }),

    // C4b (round 4): right outer — the filtered order side right-joined
    // to customer, so customers without qualifying orders surface with
    // NULL order columns (the mirror of C4).
    "join_right_outer" -> ((s, d) => {
      val o = load(s, d, "orders").filter(col("o_totalprice") > 150000.0)
      val c = load(s, d, "customer")
      o.join(c, o("o_custkey") === c("c_custkey"), "right")
        .select("c_custkey", "o_orderkey", "o_totalprice")
        .orderBy(col("c_custkey").asc, col("o_orderkey").asc_nulls_first)
    }),

    // C4c (round 4): null-safe equi-join (<=> / IS NOT DISTINCT FROM):
    // per-priority counts joined back to the distinct priority set with
    // one priority NULLed out on both sides — a plain equi-join drops
    // the NULL group, the null-safe join keeps it (the row that proves
    // the semantics).
    "join_null_safe" -> ((s, d) => {
      val o = load(s, d, "orders")
        .withColumn("p", nullif(col("o_orderpriority"), lit("3-MEDIUM")))
      val counts = o.groupBy("p").agg(count(lit(1)).as("n"))
      val keys = o.select(col("p").as("pk")).distinct()
      counts.join(keys, col("p") <=> col("pk"))
        .select(col("pk").as("priority"), col("n"))
        .orderBy(col("priority").asc_nulls_first)
    }),

    // C5: full outer over two partially overlapping key subsets.
    "join_full_outer" -> ((s, d) => {
      val o = load(s, d, "orders")
      val a = o.filter(col("o_totalprice") > 150000.0)
        .select(col("o_orderkey").as("k"), col("o_totalprice").as("price_a"))
      val b = o.filter(col("o_orderstatus") === "F")
        .select(col("o_orderkey").as("k2"), col("o_orderpriority").as("pri_b"))
      a.join(b, col("k") === col("k2"), "full")
        .select(coalesce(col("k"), col("k2")).as("okey"), col("price_a"), col("pri_b"))
        .orderBy("okey")
    }),

    // C6: left semi = EXISTS.
    "join_left_semi" -> ((s, d) => {
      val c = load(s, d, "customer")
      val o = load(s, d, "orders")
      c.join(o, c("c_custkey") === o("o_custkey"), "left_semi")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    }),

    // C7: left anti = NOT EXISTS.
    "join_left_anti" -> ((s, d) => {
      val c = load(s, d, "customer")
      val o = load(s, d, "orders")
      c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    }),

    // C8: theta/range self-join: successor events of the same user
    // within 5 minutes. Key-equi on user_id keeps it a hash join with
    // a residual range predicate (never a cartesian).
    "join_theta_range" -> ((s, d) => {
      val ev = load(s, d, "events")
      val a = ev.select(col("event_id").as("a_id"), col("user_id").as("a_user"), col("ts").as("a_ts"))
      val b = ev.select(col("event_id").as("b_id"), col("user_id").as("b_user"), col("ts").as("b_ts"))
      a.join(b,
        col("a_user") === col("b_user")
          && col("b_ts") > col("a_ts")
          && col("b_ts") <= col("a_ts") + expr("INTERVAL 5 MINUTES"))
        .select("a_id", "b_id")
        .orderBy("a_id", "b_id")
    }),

    // C9: cartesian product (deliberately bounded: 25 × 5 rows).
    "join_cross" -> ((s, d) => {
      val n = load(s, d, "nation")
      val r = load(s, d, "region")
      n.crossJoin(r)
        .select("n_name", "r_name")
        .orderBy("n_name", "r_name")
    }),

    // C10: as-of join — for every event, the latest purchase of the
    // same user at-or-before it. Running last_value(ignoreNulls) over
    // a (ts, event_id) ordering: no self-join, single shuffle.
    "join_asof" -> ((s, d) =>
      graft.api.GraftOps.asofLastMatch(load(s, d, "events"),
        partitionCol = "user_id", tsCol = "ts", idCol = "event_id",
        marker = col("event_type") === "purchase", outCol = "last_purchase_id")
        .select("event_id", "user_id", "last_purchase_id")
        .orderBy("event_id")),
  )

  /** TPC-H Q3 shape (BASELINE.md's 3-way-join headline): selective dim
    * filter → two hash joins → group-by → top-10. Catalyst broadcasts
    * the filtered customer side; the revenue aggregate runs decimal-
    * exact; the final top-10 is TakeOrderedAndProject (O(k) per task).
    */
  private def q3: Q = (s, d) => {
    val c = load(s, d, "customer").filter(col("c_mktsegment") === "BUILDING")
    val o = load(s, d, "orders")
      .filter(col("o_orderdate") < lit("1998-07-01").cast("timestamp"))
    val l = load(s, d, "lineitem")
      .filter(col("l_shipdate") > lit("1998-07-01").cast("timestamp"))
    c.join(o, c("c_custkey") === o("o_custkey"))
      .join(l, o("o_orderkey") === l("l_orderkey"))
      .groupBy(l("l_orderkey"), o("o_orderdate"), o("o_orderpriority"))
      .agg(sum(dec(col("l_extendedprice"))
          * (lit(1) - dec(col("l_discount"))).cast(DecimalType(4, 2)))
        .cast(DecimalType(38, 4)).as("revenue"))
      .orderBy(col("revenue").desc, col("o_orderdate").asc, col("l_orderkey").asc)
      .limit(10)
  }

  val oracle: Map[String, String] = Map(
    "join_null_safe" ->
      """WITH o AS (SELECT nullif(o_orderpriority, '3-MEDIUM') AS p FROM orders),
        | counts AS (SELECT p, count(*) AS n FROM o GROUP BY p),
        | keys AS (SELECT DISTINCT p AS pk FROM o)
        | SELECT pk AS priority, n
        | FROM counts JOIN keys ON counts.p IS NOT DISTINCT FROM keys.pk
        | ORDER BY priority ASC NULLS FIRST""".stripMargin,
    "join_right_outer" ->
      """SELECT c_custkey, o_orderkey, o_totalprice
        | FROM (SELECT * FROM orders WHERE o_totalprice > 150000.0) o
        | RIGHT JOIN customer c ON o.o_custkey = c.c_custkey
        | ORDER BY c_custkey ASC, o_orderkey ASC NULLS FIRST""".stripMargin,
    "tpch_q3" ->
      """SELECT l_orderkey, o_orderdate, o_orderpriority,
        | CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
        |   * CAST(1 - CAST(l_discount AS DECIMAL(18,2)) AS DECIMAL(4,2))) AS DECIMAL(38,4)) AS revenue
        | FROM customer, orders, lineitem
        | WHERE c_mktsegment = 'BUILDING' AND c_custkey = o_custkey AND o_orderkey = l_orderkey
        |   AND o_orderdate < TIMESTAMP '1998-07-01 00:00:00'
        |   AND l_shipdate > TIMESTAMP '1998-07-01 00:00:00'
        | GROUP BY l_orderkey, o_orderdate, o_orderpriority
        | ORDER BY revenue DESC, o_orderdate ASC, l_orderkey ASC
        | LIMIT 10""".stripMargin,
    "join_inner_hash" ->
      """SELECT l_orderkey, l_linenumber, o_custkey, o_orderstatus
        | FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        | ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "join_broadcast" ->
      """SELECT p_brand,
        | CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
        |   * CAST(1 - CAST(l_discount AS DECIMAL(18,2)) AS DECIMAL(4,2))) AS DECIMAL(38,4)) AS revenue,
        | count(*) AS n
        | FROM lineitem JOIN part ON l_partkey = p_partkey
        | GROUP BY p_brand ORDER BY p_brand""".stripMargin,
    "join_sort_merge" ->
      """SELECT o_orderstatus,
        | CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DECIMAL(38,2)) AS sum_qty,
        | count(*) AS n
        | FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        | GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,
    "join_left_outer" ->
      """SELECT c_custkey, o_orderkey, o_totalprice
        | FROM customer LEFT JOIN orders ON c_custkey = o_custkey
        | ORDER BY c_custkey, o_orderkey NULLS FIRST""".stripMargin,
    "join_full_outer" ->
      """SELECT coalesce(a.k, b.k2) AS okey, a.price_a, b.pri_b FROM
        |  (SELECT o_orderkey AS k, o_totalprice AS price_a FROM orders
        |    WHERE o_totalprice > 150000.0) a
        |  FULL JOIN
        |  (SELECT o_orderkey AS k2, o_orderpriority AS pri_b FROM orders
        |    WHERE o_orderstatus = 'F') b
        |  ON a.k = b.k2
        | ORDER BY okey""".stripMargin,
    "join_left_semi" ->
      """SELECT c_custkey, c_name FROM customer
        | WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        | ORDER BY c_custkey""".stripMargin,
    "join_left_anti" ->
      """SELECT c_custkey, c_name FROM customer
        | WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        | ORDER BY c_custkey""".stripMargin,
    "join_theta_range" ->
      """SELECT a.event_id AS a_id, b.event_id AS b_id
        | FROM events a JOIN events b
        |   ON a.user_id = b.user_id
        |  AND CAST(b.ts AS TIMESTAMP) > CAST(a.ts AS TIMESTAMP)
        |  AND CAST(b.ts AS TIMESTAMP) <= CAST(a.ts AS TIMESTAMP) + INTERVAL 5 MINUTE
        | ORDER BY a_id, b_id""".stripMargin,
    "join_cross" ->
      """SELECT n_name, r_name FROM nation CROSS JOIN region
        | ORDER BY n_name, r_name""".stripMargin,
    "join_asof" ->
      """SELECT event_id, user_id,
        |  last_value(CASE WHEN event_type = 'purchase' THEN event_id END IGNORE NULLS)
        |    OVER (PARTITION BY user_id
        |          ORDER BY CAST(ts AS TIMESTAMP) ASC, event_id ASC
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS last_purchase_id
        | FROM events ORDER BY event_id""".stripMargin,
  )
}
