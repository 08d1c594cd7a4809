package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.Tables.{dec, load}

/** Family P — the TPC-H completion wave (ref: n/a, SURVEY §0 — the
  * reference repo is empty; the TPC-H spec itself is the public
  * contract here). Together with the already-shipped q3/q5/q7/q10/
  * q14/q18 this closes every TPC-H query expressible over the driver's
  * simplified schema. q2/q9/q11/q16/q20 need the `partsupp` table,
  * which the driver does not generate — they are out of scope by data
  * model, not by engine capability (their shapes — min-scalar
  * subquery, multi-fact join-agg, HAVING over sum, grouped NOT IN,
  * nested semi-joins — all appear in other shipped queries).
  *
  * Columns the driver schema lacks are substituted with semantics-
  * preserving twins (each noted per query): lateness is measured
  * ship-vs-order date instead of receipt-vs-commit, q19's container
  * predicate becomes a size predicate, q13's comment filter becomes a
  * priority filter, q22's phone-prefix country code becomes the
  * nation key.
  *
  * Scale shapes (the 100 TB contract):
  *  - q1/q6 are single-scan map+agg: pushed filters, partial
  *    aggregation, group count independent of fact size.
  *  - q4/q12/q21 join the two facts (orders × lineitem) on orderkey
  *    exactly once; q21's per-order profile and its join back to the
  *    late rows hash on that same key, so the whole query rides one
  *    Exchange of each fact.
  *  - q8/q17/q19 broadcast every dimension (part/customer/nation/
  *    supplier); the fact is never re-partitioned for a dim lookup.
  *  - q15's "max revenue" scalar is a broadcast cross-join of a
  *    1-row aggregate — no unpartitioned window over all suppliers.
  *  - q22's threshold is likewise a broadcast 1-row aggregate, and
  *    the "has no recent orders" test is a left-anti shuffle join on
  *    custkey (date filter pushed to the orders scan first).
  *
  * Exactness: money math follows the repo-wide decimal discipline
  * (Tables.dec, SURVEY §7.4.2) so every sum is shuffle-order-
  * independent; averages and shares are emitted as IEEE doubles
  * computed from exact decimal sums via the same division tree as the
  * DuckDB oracle.
  */
object TpchQueries {

  /** Exact revenue term: extendedprice * (1 - discount). */
  private def volume = (dec(col("l_extendedprice"))
    * (lit(1) - dec(col("l_discount"))).cast(DecimalType(4, 2)))

  val queries: Map[String, Q] = Map(
    // P1: TPC-H Q1 pricing summary — the canonical scan+agg. Six
    // groups regardless of fact size; every aggregate decimal-exact,
    // the three averages derived as double(sum)/double(count).
    "tpch_q1" -> ((s, d) => {
      val charge = (volume * (lit(1) + dec(col("l_tax"))).cast(DecimalType(4, 2)))
      load(s, d, "lineitem")
        .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          sum(dec(col("l_quantity"))).cast(DecimalType(38, 2)).as("sum_qty"),
          sum(dec(col("l_extendedprice"))).cast(DecimalType(38, 2)).as("sum_base_price"),
          sum(volume).cast(DecimalType(38, 4)).as("sum_disc_price"),
          sum(charge).cast(DecimalType(38, 6)).as("sum_charge"),
          (sum(dec(col("l_quantity"))).cast("double")
            / count(lit(1)).cast("double")).as("avg_qty"),
          (sum(dec(col("l_extendedprice"))).cast("double")
            / count(lit(1)).cast("double")).as("avg_price"),
          (sum(dec(col("l_discount"))).cast("double")
            / count(lit(1)).cast("double")).as("avg_disc"),
          count(lit(1)).as("count_order"))
        .orderBy("l_returnflag", "l_linestatus")
    }),

    // P2: TPC-H Q4 order-priority check — semi-join: orders in 1996Q1
    // with at least one lineitem shipped >90 days after order date
    // (lateness twin for the missing commit/receipt dates). One
    // orderkey shuffle per fact; the date filter prunes orders first.
    "tpch_q4" -> ((s, d) => {
      val o = load(s, d, "orders")
        .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp")
          && col("o_orderdate") < lit("1996-04-01").cast("timestamp"))
      val li = load(s, d, "lineitem").select("l_orderkey", "l_shipdate")
      o.join(li, col("l_orderkey") === col("o_orderkey")
          && col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 90 DAY"),
          "left_semi")
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("order_count"))
        .orderBy("o_orderpriority")
    }),

    // P3: TPC-H Q6 forecast revenue change — pure scan+filter+global
    // agg; discount bounds written as open intervals (0.04, 0.08) so
    // no double-equality boundary exists on either engine.
    "tpch_q6" -> ((s, d) =>
      load(s, d, "lineitem")
        .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp")
          && col("l_shipdate") < lit("1997-01-01").cast("timestamp")
          && col("l_discount") > 0.04 && col("l_discount") < 0.08
          && col("l_quantity") < 24.0)
        .agg(sum(dec(col("l_extendedprice")) * dec(col("l_discount")))
            .cast(DecimalType(38, 4)).as("revenue"),
          count(lit(1)).as("n"))),

    // P4: TPC-H Q8 national market share — five broadcast dims around
    // one orders×lineitem shuffle; share of region-2 customer revenue
    // on STANDARD parts supplied by nation 7, by order year.
    "tpch_q8" -> ((s, d) => {
      val pt = load(s, d, "part").filter(col("p_type") === "STANDARD")
        .select("p_partkey")
      val cust = load(s, d, "customer")
        .join(broadcast(load(s, d, "nation").filter(col("n_regionkey") === 2)),
          col("c_nationkey") === col("n_nationkey"))
        .select("c_custkey")
      val sup = load(s, d, "supplier")
        .select(col("s_suppkey"), (col("s_nationkey") === 7).as("is_target"))
      val o = load(s, d, "orders")
        .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp")
          && col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
      load(s, d, "lineitem")
        .join(o, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(pt), col("l_partkey") === col("p_partkey"))
        .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
        .join(broadcast(sup), col("l_suppkey") === col("s_suppkey"))
        .select(year(col("o_orderdate")).cast("bigint").as("yr"),
          volume.as("volume"), col("is_target"))
        .groupBy("yr")
        .agg(
          sum(when(col("is_target"), col("volume"))
              .otherwise(lit(0).cast(DecimalType(23, 4))))
            .cast(DecimalType(38, 4)).as("nation_rev"),
          sum(col("volume")).cast(DecimalType(38, 4)).as("total_rev"),
          (sum(when(col("is_target"), col("volume"))).cast("double")
            / sum(col("volume")).cast("double")).as("mkt_share"))
        .orderBy("yr")
    }),

    // P5: TPC-H Q12 shipping-mode priority split — returnflag stands
    // in for the missing shipmode; "late" is ship >60 days after
    // order. Facts join once on orderkey, three output groups.
    "tpch_q12" -> ((s, d) => {
      val hi = col("o_orderpriority").isin("1-URGENT", "2-HIGH")
      load(s, d, "orders")
        .join(load(s, d, "lineitem"), col("o_orderkey") === col("l_orderkey"))
        .filter(col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 60 DAY")
          && col("l_shipdate") >= lit("1996-01-01").cast("timestamp")
          && col("l_shipdate") < lit("1997-01-01").cast("timestamp"))
        .groupBy(col("l_returnflag").as("mode"))
        .agg(sum(when(hi, 1L).otherwise(0L)).as("high_line_count"),
          sum(when(!hi, 1L).otherwise(0L)).as("low_line_count"))
        .orderBy("mode")
    }),

    // P6: TPC-H Q13 customer order-count distribution — left join so
    // zero-order customers survive with c_count 0; the comment filter
    // becomes a priority filter. Two shuffles: custkey, then the
    // (tiny) count-of-counts re-agg.
    "tpch_q13" -> ((s, d) => {
      val o = load(s, d, "orders")
        .filter(col("o_orderpriority") =!= "4-NOT SPECIFIED")
        .select("o_custkey", "o_orderkey")
      load(s, d, "customer")
        .join(o, col("c_custkey") === col("o_custkey"), "left")
        .groupBy("c_custkey")
        .agg(count(col("o_orderkey")).as("c_count"))
        .groupBy("c_count")
        .agg(count(lit(1)).as("custdist"))
        .orderBy(col("custdist").desc, col("c_count").desc)
    }),

    // P7: TPC-H Q15 top supplier — 1996Q1 revenue per supplier; the
    // max-revenue scalar is a broadcast 1-row cross join (never an
    // unpartitioned window), then exact-decimal equality selects the
    // winner(s).
    "tpch_q15" -> ((s, d) => {
      val rev = load(s, d, "lineitem")
        .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp")
          && col("l_shipdate") < lit("1996-04-01").cast("timestamp"))
        .groupBy("l_suppkey")
        .agg(sum(volume).cast(DecimalType(38, 4)).as("total_revenue"))
      val mx = rev.agg(max(col("total_revenue")).as("mx"))
      load(s, d, "supplier")
        .join(rev, col("s_suppkey") === col("l_suppkey"))
        .join(broadcast(mx))
        .filter(col("total_revenue") === col("mx"))
        .select("s_suppkey", "s_name", "total_revenue")
        .orderBy("s_suppkey")
    }),

    // P8: TPC-H Q17 small-quantity revenue — per-part average
    // quantity (exact: integer-valued doubles) gates the fact rows;
    // the Brand#23/MEDIUM part filter broadcasts, and the per-part
    // limit is computed from the already-filtered fact (identical
    // per-part averages, far fewer rows than averaging every part).
    "tpch_q17" -> ((s, d) => {
      val target = load(s, d, "part")
        .filter(col("p_brand") === "Brand#23" && col("p_type") === "MEDIUM")
        .select("p_partkey")
      val li = load(s, d, "lineitem")
        .join(broadcast(target), col("l_partkey") === col("p_partkey"))
      val qavg = li.groupBy(col("l_partkey").as("qk"))
        .agg((lit(0.2) * (sum(col("l_quantity")).cast("double")
          / count(lit(1)).cast("double"))).as("lim"))
      li.join(qavg, col("l_partkey") === col("qk"))
        .filter(col("l_quantity") < col("lim"))
        .agg(count(lit(1)).as("n"),
          sum(dec(col("l_extendedprice"))).cast(DecimalType(38, 2)).as("total_price"),
          (sum(dec(col("l_extendedprice"))).cast("double") / lit(7.0)).as("avg_yearly"))
    }),

    // P9: TPC-H Q19 disjunctive predicate pushback — three brand/
    // size/quantity bands OR-ed together (size twins the missing
    // container column); part broadcasts, the disjunction runs as a
    // post-join filter over codegen'd columns.
    "tpch_q19" -> ((s, d) => {
      val band = (col("p_brand") === "Brand#12" && col("p_size").between(1, 5)
          && col("l_quantity") >= 1.0 && col("l_quantity") <= 11.0) ||
        (col("p_brand") === "Brand#23" && col("p_size").between(1, 10)
          && col("l_quantity") >= 10.0 && col("l_quantity") <= 20.0) ||
        (col("p_brand") === "Brand#34" && col("p_size").between(1, 15)
          && col("l_quantity") >= 20.0 && col("l_quantity") <= 30.0)
      load(s, d, "lineitem")
        .join(broadcast(load(s, d, "part")), col("l_partkey") === col("p_partkey"))
        .filter(band)
        .agg(sum(volume).cast(DecimalType(38, 4)).as("revenue"),
          count(lit(1)).as("n"))
    }),

    // P10: TPC-H Q21 suppliers who kept orders waiting — late rows
    // (ship >60 days after order, status-F orders) in multi-supplier
    // orders where that supplier was the ONLY late one. The classic
    // double-EXISTS is restated as a per-order profile (distinct
    // suppliers / distinct late suppliers) joined back to the late
    // rows: lineitem is exchanged on orderkey once and the profile,
    // the join-back, and the row filter all ride that partitioning.
    "tpch_q21" -> ((s, d) => {
      val l = load(s, d, "lineitem")
        .join(load(s, d, "orders").filter(col("o_orderstatus") === "F"),
          col("l_orderkey") === col("o_orderkey"))
        .select(col("l_orderkey"), col("l_suppkey"),
          (col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 60 DAY")).as("late"))
      // two-level distinct: (order, supplier) partial-aggregates
      // map-side then folds to the per-order profile — no Expand
      // doubling the fact rows the way a double countDistinct would.
      val po = l.groupBy(col("l_orderkey").as("ok"), col("l_suppkey").as("sk"))
        .agg(max(col("late")).as("supp_late"))
        .groupBy("ok")
        .agg(count(lit(1)).as("n_supp"),
          sum(when(col("supp_late"), 1L).otherwise(0L)).as("n_late_supp"))
      l.filter(col("late"))
        .join(po, col("l_orderkey") === col("ok"))
        .filter(col("n_supp") >= 2 && col("n_late_supp") === 1)
        .join(broadcast(load(s, d, "supplier")), col("l_suppkey") === col("s_suppkey"))
        .groupBy("s_name")
        .agg(count(lit(1)).as("numwait"))
        .orderBy(col("numwait").desc, col("s_name"))
        .limit(100)
    }),

    // P11: TPC-H Q22 dormant high-balance customers — nation key
    // twins the phone-prefix country code; "no recent orders" is a
    // left-anti join against 1999+ orders. The above-average-balance
    // threshold is applied by exact cross-multiplication
    // (bal * n > total) so no engine ever divides.
    "tpch_q22" -> ((s, d) => {
      val pool = load(s, d, "customer")
        .filter(col("c_nationkey").isin(1, 3, 5, 7, 9, 11, 13))
        .select(col("c_custkey"), col("c_nationkey"), dec(col("c_acctbal")).as("bal"))
      val thr = pool.filter(col("bal") > 0.00)
        .agg(sum(col("bal")).cast(DecimalType(38, 2)).as("s"),
          count(lit(1)).as("n"))
      val recent = load(s, d, "orders")
        .filter(col("o_orderdate") >= lit("1999-01-01").cast("timestamp"))
        .select("o_custkey")
      pool.join(broadcast(thr))
        .filter(col("bal") * col("n") > col("s"))
        .join(recent, col("c_custkey") === col("o_custkey"), "left_anti")
        .groupBy(col("c_nationkey").as("cntry"))
        .agg(count(lit(1)).as("numcust"),
          sum(col("bal")).cast(DecimalType(38, 2)).as("totacctbal"))
        .orderBy("cntry")
    })
  )

  val oracle: Map[String, String] = Map(
    "tpch_q1" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DECIMAL(38,2)) AS sum_qty,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DECIMAL(38,2)) AS sum_base_price,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
        |    * CAST(1 - CAST(l_discount AS DECIMAL(18,2)) AS DECIMAL(4,2))) AS DECIMAL(38,4)) AS sum_disc_price,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
        |    * CAST(1 - CAST(l_discount AS DECIMAL(18,2)) AS DECIMAL(4,2))
        |    * CAST(1 + CAST(l_tax AS DECIMAL(18,2)) AS DECIMAL(4,2))) AS DECIMAL(38,6)) AS sum_charge,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS avg_qty,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS avg_price,
        |  CAST(sum(CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS avg_disc,
        |  CAST(count(*) AS BIGINT) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "tpch_q4" ->
      """SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS order_count
        |FROM orders
        |WHERE o_orderdate >= TIMESTAMP '1996-01-01'
        |  AND o_orderdate < TIMESTAMP '1996-04-01'
        |  AND EXISTS (SELECT 1 FROM lineitem
        |    WHERE l_orderkey = o_orderkey
        |      AND l_shipdate > o_orderdate + INTERVAL 90 DAY)
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    "tpch_q6" ->
      """SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
        |    * CAST(l_discount AS DECIMAL(18,2))) AS DECIMAL(38,4)) AS revenue,
        |  CAST(count(*) AS BIGINT) AS n
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        |  AND l_shipdate < TIMESTAMP '1997-01-01'
        |  AND l_discount > 0.04 AND l_discount < 0.08 AND l_quantity < 24.0""".stripMargin,
    "tpch_q8" ->
      """WITH vol AS (
        |  SELECT CAST(year(o_orderdate) AS BIGINT) AS yr,
        |    CAST(l_extendedprice AS DECIMAL(18,2))
        |      * CAST(1 - CAST(l_discount AS DECIMAL(18,2)) AS DECIMAL(4,2)) AS volume,
        |    (s_nationkey = 7) AS is_target
        |  FROM lineitem
        |  JOIN orders ON l_orderkey = o_orderkey
        |  JOIN part ON l_partkey = p_partkey
        |  JOIN customer ON o_custkey = c_custkey
        |  JOIN nation n ON c_nationkey = n.n_nationkey
        |  JOIN supplier ON l_suppkey = s_suppkey
        |  WHERE n.n_regionkey = 2 AND p_type = 'STANDARD'
        |    AND o_orderdate >= TIMESTAMP '1996-01-01'
        |    AND o_orderdate < TIMESTAMP '1998-01-01')
        |SELECT yr,
        |  CAST(sum(CASE WHEN is_target THEN volume ELSE CAST(0.0 AS DECIMAL(22,4)) END) AS DECIMAL(38,4)) AS nation_rev,
        |  CAST(sum(volume) AS DECIMAL(38,4)) AS total_rev,
        |  CAST(sum(CASE WHEN is_target THEN volume END) AS DOUBLE)
        |    / CAST(sum(volume) AS DOUBLE) AS mkt_share
        |FROM vol GROUP BY yr ORDER BY yr""".stripMargin,
    "tpch_q12" ->
      """SELECT l_returnflag AS mode,
        |  CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
        |    THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
        |  CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
        |    THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
        |FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        |WHERE l_shipdate > o_orderdate + INTERVAL 60 DAY
        |  AND l_shipdate >= TIMESTAMP '1996-01-01'
        |  AND l_shipdate < TIMESTAMP '1997-01-01'
        |GROUP BY mode ORDER BY mode""".stripMargin,
    "tpch_q13" ->
      """SELECT c_count, CAST(count(*) AS BIGINT) AS custdist
        |FROM (SELECT c_custkey, CAST(count(o_orderkey) AS BIGINT) AS c_count
        |      FROM customer LEFT JOIN orders
        |        ON c_custkey = o_custkey AND o_orderpriority <> '4-NOT SPECIFIED'
        |      GROUP BY c_custkey)
        |GROUP BY c_count ORDER BY custdist DESC, c_count DESC""".stripMargin,
    "tpch_q15" ->
      """WITH rev AS (SELECT l_suppkey,
        |    CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
        |      * CAST(1 - CAST(l_discount AS DECIMAL(18,2)) AS DECIMAL(4,2))) AS DECIMAL(38,4)) AS total_revenue
        |  FROM lineitem
        |  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        |    AND l_shipdate < TIMESTAMP '1996-04-01'
        |  GROUP BY l_suppkey)
        |SELECT s_suppkey, s_name, total_revenue
        |FROM supplier JOIN rev ON s_suppkey = l_suppkey
        |WHERE total_revenue = (SELECT max(total_revenue) FROM rev)
        |ORDER BY s_suppkey""".stripMargin,
    "tpch_q17" ->
      """WITH target AS (SELECT p_partkey FROM part
        |    WHERE p_brand = 'Brand#23' AND p_type = 'MEDIUM'),
        | qavg AS (SELECT l_partkey,
        |    0.2 * (CAST(sum(l_quantity) AS DOUBLE) / CAST(count(*) AS DOUBLE)) AS lim
        |  FROM lineitem GROUP BY l_partkey)
        |SELECT CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DECIMAL(38,2)) AS total_price,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / 7.0 AS avg_yearly
        |FROM lineitem
        |JOIN target ON p_partkey = l_partkey
        |JOIN qavg ON qavg.l_partkey = lineitem.l_partkey
        |WHERE l_quantity < lim""".stripMargin,
    "tpch_q19" ->
      """SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
        |    * CAST(1 - CAST(l_discount AS DECIMAL(18,2)) AS DECIMAL(4,2))) AS DECIMAL(38,4)) AS revenue,
        |  CAST(count(*) AS BIGINT) AS n
        |FROM lineitem JOIN part ON p_partkey = l_partkey
        |WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5
        |    AND l_quantity >= 1.0 AND l_quantity <= 11.0)
        |  OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10
        |    AND l_quantity >= 10.0 AND l_quantity <= 20.0)
        |  OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 15
        |    AND l_quantity >= 20.0 AND l_quantity <= 30.0)""".stripMargin,
    "tpch_q21" ->
      """WITH l AS (SELECT l_orderkey, l_suppkey,
        |    (l_shipdate > o_orderdate + INTERVAL 60 DAY) AS late
        |  FROM lineitem JOIN orders ON o_orderkey = l_orderkey
        |  WHERE o_orderstatus = 'F'),
        | po AS (SELECT l_orderkey,
        |    CAST(count(DISTINCT l_suppkey) AS BIGINT) AS n_supp,
        |    CAST(count(DISTINCT CASE WHEN late THEN l_suppkey END) AS BIGINT) AS n_late_supp
        |  FROM l GROUP BY l_orderkey)
        |SELECT s_name, CAST(count(*) AS BIGINT) AS numwait
        |FROM l JOIN po ON l.l_orderkey = po.l_orderkey
        |JOIN supplier ON s_suppkey = l_suppkey
        |WHERE l.late AND po.n_supp >= 2 AND po.n_late_supp = 1
        |GROUP BY s_name ORDER BY numwait DESC, s_name LIMIT 100""".stripMargin,
    "tpch_q22" ->
      """WITH pool AS (SELECT c_custkey, c_nationkey,
        |    CAST(c_acctbal AS DECIMAL(18,2)) AS bal
        |  FROM customer WHERE c_nationkey IN (1, 3, 5, 7, 9, 11, 13)),
        | thr AS (SELECT CAST(sum(bal) AS DECIMAL(38,2)) AS s,
        |    CAST(count(*) AS BIGINT) AS n
        |  FROM pool WHERE bal > 0.00)
        |SELECT c_nationkey AS cntry, CAST(count(*) AS BIGINT) AS numcust,
        |  CAST(sum(bal) AS DECIMAL(38,2)) AS totacctbal
        |FROM pool, thr
        |WHERE bal * thr.n > thr.s
        |  AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
        |    AND o_orderdate >= TIMESTAMP '1999-01-01')
        |GROUP BY c_nationkey ORDER BY c_nationkey""".stripMargin
  )
}
