package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.Tables.{dec, load, tune}

/** Family D — aggregation (SURVEY.md §2.D).
  *
  * Scale notes: every groupBy here compiles to HashAggregateExec with
  * automatic partial (map-side) aggregation before the shuffle, so the
  * exchange carries one row per (partition, group), not per input row.
  * D8 deliberately groups on a ~n-row-cardinality key to exercise the
  * sort-aggregate / spill fallback path that a 100 TB job would hit.
  *
  * Cross-engine determinism: sums run over decimal (exact, order-
  * independent); averages are expressed as exact-decimal-sum divided
  * by count in double (one correctly-rounded IEEE division on both
  * engines) — `avg(double)` directly would be shuffle-order-dependent.
  */
object AggQueries {

  val queries: Map[String, Q] = Map(
    // D1: ungrouped global aggregate.
    "agg_hash_global" -> ((s, d) =>
      load(s, d, "lineitem").agg(
        sum(dec(col("l_quantity"))).cast(DecimalType(38, 2)).as("sum_qty"),
        min(col("l_extendedprice")).as("min_price"),
        max(col("l_extendedprice")).as("max_price"),
        count(lit(1)).as("n_rows"),
        (sum(dec(col("l_extendedprice"))).cast("double")
          / count(col("l_extendedprice"))).as("avg_price"))),

    // D2: TPC-H Q1 — the flagship query (SparkEntry.entry).
    "agg_groupby" -> ((s, d) =>
      load(s, d, "lineitem")
        .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          sum(dec(col("l_quantity"))).cast(DecimalType(38, 2)).as("sum_qty"),
          sum(dec(col("l_extendedprice"))).cast(DecimalType(38, 2)).as("sum_base_price"),
          sum(dec(col("l_extendedprice"))
            * (lit(1) - dec(col("l_discount"))).cast(DecimalType(4, 2)))
            .cast(DecimalType(38, 4)).as("sum_disc_price"),
          sum(dec(col("l_extendedprice"))
            * (lit(1) - dec(col("l_discount"))).cast(DecimalType(4, 2))
            * (lit(1) + dec(col("l_tax"))).cast(DecimalType(4, 2)))
            .cast(DecimalType(38, 6)).as("sum_charge"),
          (sum(dec(col("l_quantity"))).cast("double") / count(col("l_quantity"))).as("avg_qty"),
          (sum(dec(col("l_extendedprice"))).cast("double") / count(col("l_extendedprice"))).as("avg_price"),
          (sum(dec(col("l_discount"))).cast("double") / count(col("l_discount"))).as("avg_disc"),
          count(lit(1)).as("count_order"))
        .orderBy("l_returnflag", "l_linestatus")),

    // D3: distinct aggregates (expand-based rewrite, two shuffles).
    "agg_distinct" -> ((s, d) =>
      load(s, d, "lineitem")
        .groupBy("l_returnflag")
        .agg(
          countDistinct(col("l_partkey")).as("n_parts"),
          countDistinct(col("l_suppkey")).as("n_supps"),
          sum_distinct(dec(col("l_quantity"))).cast(DecimalType(38, 2)).as("sum_dist_qty"))
        .orderBy("l_returnflag")),

    // D4: HLL sketch distinct — approx, engine-specific ⇒ no oracle;
    // the unit test bounds it against the exact count instead.
    "agg_approx_distinct" -> ((s, d) =>
      load(s, d, "lineitem")
        .groupBy("l_returnflag")
        .agg(approx_count_distinct(col("l_partkey")).as("approx_parts"))
        .orderBy("l_returnflag")),

    // D5: ROLLUP with grouping markers (both cast to int: Spark's
    // grouping() is tinyint, DuckDB's GROUPING is bigint).
    "agg_rollup" -> ((s, d) => {
      val c = load(s, d, "customer")
      val n = load(s, d, "nation")
      c.join(n, c("c_nationkey") === n("n_nationkey"))
        .rollup(col("n_name"), col("c_mktsegment"))
        .agg(
          count(lit(1)).as("n_cust"),
          sum(dec(col("c_acctbal"))).cast(DecimalType(38, 2)).as("total_bal"),
          grouping(col("n_name")).cast("int").as("g_nation"),
          grouping(col("c_mktsegment")).cast("int").as("g_seg"))
        .orderBy(col("n_name").asc_nulls_first, col("c_mktsegment").asc_nulls_first)
    }),

    // D6: CUBE over two low-cardinality dims.
    "agg_cube" -> ((s, d) =>
      load(s, d, "lineitem")
        .cube(col("l_returnflag"), col("l_linestatus"))
        .agg(
          count(lit(1)).as("n"),
          sum(dec(col("l_quantity"))).cast(DecimalType(38, 2)).as("sum_qty"))
        .orderBy(col("l_returnflag").asc_nulls_first, col("l_linestatus").asc_nulls_first)),

    // D7: explicit GROUPING SETS — same SQL text feeds both engines
    // (SURVEY §3.2's shared-dialect rule).
    "agg_grouping_sets" -> ((s, d) => {
      tune(s)
      load(s, d, "orders").createOrReplaceTempView("orders")
      s.sql(groupingSetsSql)
    }),

    // D7b (round 4): grouping_id()/grouping() metadata — the bitmask
    // that lets a consumer of a rollup cube tell a real NULL group key
    // from a rolled-up one (both engines use the same per-column bit
    // encoding, verified: 0 detail, 1 linestatus rolled, 3 grand total).
    "agg_grouping_id" -> ((s, d) =>
      load(s, d, "lineitem")
        .rollup("l_returnflag", "l_linestatus")
        .agg(count(lit(1)).as("n"),
          grouping_id().cast("bigint").as("gid"),
          grouping(col("l_returnflag")).cast("bigint").as("g_flag"))
        .select("l_returnflag", "l_linestatus", "n", "gid", "g_flag")
        .orderBy(col("gid").asc, col("l_returnflag").asc_nulls_first,
          col("l_linestatus").asc_nulls_first)),

    // D8: high-cardinality group key — forces the hash-agg fallback /
    // spill path a petabyte-scale job lives in.
    "agg_sort_fallback" -> ((s, d) =>
      load(s, d, "lineitem")
        .groupBy("l_orderkey")
        .agg(
          sum(dec(col("l_quantity"))).cast(DecimalType(38, 2)).as("qty"),
          count(lit(1)).as("n"))
        .orderBy("l_orderkey")),

    // Exact interpolated percentiles (both engines define p-quantile as
    // linear interpolation at p·(n−1); 6-dp decimal cast absorbs any
    // last-ulp interpolation difference).
    "agg_percentile" -> ((s, d) =>
      load(s, d, "lineitem")
        .groupBy("l_returnflag")
        .agg(
          expr("CAST(percentile(l_quantity, 0.25) AS DECIMAL(18,6))").as("p25"),
          expr("CAST(percentile(l_quantity, 0.5) AS DECIMAL(18,6))").as("p50"),
          expr("CAST(percentile(l_quantity, 0.95) AS DECIMAL(18,6))").as("p95"),
          count(lit(1)).as("n"))
        .orderBy("l_returnflag")),

    // Mergeable HLL sketches (Apache DataSketches): per-month partial
    // sketches unioned into a per-flag estimate — THE 100 TB distinct-
    // count pattern (store tiny sketches per partition/day, merge at
    // query time; never re-scan raw data). Approx ⇒ no oracle;
    // bound-tested against the exact distinct count.
    "agg_sketch" -> ((s, d) =>
      load(s, d, "lineitem")
        .withColumn("mo", date_trunc("month", col("l_shipdate")).cast("date"))
        .groupBy("l_returnflag", "mo")
        .agg(expr("hll_sketch_agg(l_partkey, 12)").as("sk"))
        .groupBy("l_returnflag")
        .agg(
          expr("hll_sketch_estimate(hll_union_agg(sk, false))").as("approx_parts"),
          count(lit(1)).as("n_sketches"))
        .orderBy("l_returnflag")),

    // Ordered string aggregation (Spark 4 listagg WITHIN GROUP ≡
    // DuckDB string_agg ORDER BY): the reporting-layer concat with a
    // deterministic element order.
    "agg_listagg" -> ((s, d) => {
      load(s, d, "orders").createOrReplaceTempView("orders")
      s.sql(
        """SELECT o_orderstatus,
          | listagg(DISTINCT o_orderpriority, '|') WITHIN GROUP (ORDER BY o_orderpriority) AS prios,
          | count(*) AS n
          | FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin)
    }),

    // Conditional-aggregate family: count_if / bool_and / bool_or /
    // max_by / min_by (DuckDB: FILTER / bool_and / bool_or / arg_max /
    // arg_min). The *_by selectors order on the UNIQUE o_orderkey so
    // ties can't make the picked value engine-dependent.
    "agg_conditional" -> ((s, d) =>
      load(s, d, "orders")
        .groupBy("o_orderpriority")
        .agg(
          count_if(col("o_totalprice") > 200000).as("n_big"),
          bool_and(col("o_totalprice") > 0).as("all_pos"),
          bool_or(col("o_orderstatus") === "F").as("any_f"),
          max_by(col("o_totalprice"), col("o_orderkey")).as("last_price"),
          min_by(col("o_totalprice"), col("o_orderkey")).as("first_price"))
        .orderBy("o_orderpriority")),

    // D9: collect_list/collect_set, sorted for determinism.
    "agg_collect" -> ((s, d) =>
      load(s, d, "orders")
        .groupBy("o_custkey")
        .agg(
          array_sort(collect_list(col("o_orderstatus"))).as("statuses"),
          array_sort(collect_set(col("o_orderstatus"))).as("status_set"),
          array_sort(collect_list(col("o_orderkey"))).as("okeys"))
        .orderBy("o_custkey")),
  )

  private val groupingSetsSql: String =
    """SELECT o_orderstatus, o_orderpriority, count(*) AS n,
      | CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DECIMAL(38,2)) AS total
      | FROM orders
      | GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority), (o_orderstatus), ())
      | ORDER BY o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST""".stripMargin

  val oracle: Map[String, String] = Map(
    "agg_conditional" ->
      """SELECT o_orderpriority,
        | CAST(count(*) FILTER (WHERE o_totalprice > 200000) AS BIGINT) AS n_big,
        | bool_and(o_totalprice > 0) AS all_pos,
        | bool_or(o_orderstatus = 'F') AS any_f,
        | arg_max(o_totalprice, o_orderkey) AS last_price,
        | arg_min(o_totalprice, o_orderkey) AS first_price
        | FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    "agg_hash_global" ->
      """SELECT CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DECIMAL(38,2)) AS sum_qty,
        | min(l_extendedprice) AS min_price,
        | max(l_extendedprice) AS max_price,
        | count(*) AS n_rows,
        | CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / count(l_extendedprice) AS avg_price
        | FROM lineitem""".stripMargin,
    "agg_groupby" ->
      """SELECT l_returnflag, l_linestatus,
        | CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DECIMAL(38,2)) AS sum_qty,
        | CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DECIMAL(38,2)) AS sum_base_price,
        | CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
        |   * CAST(1 - CAST(l_discount AS DECIMAL(18,2)) AS DECIMAL(4,2))) AS DECIMAL(38,4)) AS sum_disc_price,
        | CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
        |   * CAST(1 - CAST(l_discount AS DECIMAL(18,2)) AS DECIMAL(4,2))
        |   * CAST(1 + CAST(l_tax AS DECIMAL(18,2)) AS DECIMAL(4,2))) AS DECIMAL(38,6)) AS sum_charge,
        | CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / count(l_quantity) AS avg_qty,
        | CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / count(l_extendedprice) AS avg_price,
        | CAST(sum(CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) / count(l_discount) AS avg_disc,
        | count(*) AS count_order
        | FROM lineitem
        | WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        | GROUP BY l_returnflag, l_linestatus
        | ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "agg_distinct" ->
      """SELECT l_returnflag,
        | count(DISTINCT l_partkey) AS n_parts,
        | count(DISTINCT l_suppkey) AS n_supps,
        | CAST(sum(DISTINCT CAST(l_quantity AS DECIMAL(18,2))) AS DECIMAL(38,2)) AS sum_dist_qty
        | FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "agg_rollup" ->
      """SELECT n_name, c_mktsegment, count(*) AS n_cust,
        | CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DECIMAL(38,2)) AS total_bal,
        | CAST(GROUPING(n_name) AS INTEGER) AS g_nation,
        | CAST(GROUPING(c_mktsegment) AS INTEGER) AS g_seg
        | FROM customer JOIN nation ON c_nationkey = n_nationkey
        | GROUP BY ROLLUP(n_name, c_mktsegment)
        | ORDER BY n_name ASC NULLS FIRST, c_mktsegment ASC NULLS FIRST""".stripMargin,
    "agg_cube" ->
      """SELECT l_returnflag, l_linestatus, count(*) AS n,
        | CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DECIMAL(38,2)) AS sum_qty
        | FROM lineitem
        | GROUP BY CUBE(l_returnflag, l_linestatus)
        | ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""".stripMargin,
    "agg_grouping_sets" -> groupingSetsSql,
    "agg_grouping_id" ->
      """SELECT l_returnflag, l_linestatus, count(*) AS n,
        | CAST(GROUPING(l_returnflag, l_linestatus) AS BIGINT) AS gid,
        | CAST(GROUPING(l_returnflag) AS BIGINT) AS g_flag
        | FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)
        | ORDER BY gid ASC, l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""".stripMargin,
    "agg_sort_fallback" ->
      """SELECT l_orderkey,
        | CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DECIMAL(38,2)) AS qty,
        | count(*) AS n
        | FROM lineitem GROUP BY l_orderkey ORDER BY l_orderkey""".stripMargin,
    "agg_percentile" ->
      """SELECT l_returnflag,
        | CAST(quantile_cont(l_quantity, 0.25) AS DECIMAL(18,6)) AS p25,
        | CAST(quantile_cont(l_quantity, 0.5) AS DECIMAL(18,6)) AS p50,
        | CAST(quantile_cont(l_quantity, 0.95) AS DECIMAL(18,6)) AS p95,
        | count(*) AS n
        | FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "agg_listagg" ->
      """SELECT o_orderstatus,
        | string_agg(DISTINCT o_orderpriority, '|' ORDER BY o_orderpriority) AS prios,
        | count(*) AS n
        | FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,
    // Collection outputs travel as compact JSON text (Canon dumps the
    // Spark side through to_json; DuckDB's to_json is byte-identical
    // for string/bigint lists).
    "agg_collect" ->
      """SELECT o_custkey,
        | CAST(to_json(list(o_orderstatus ORDER BY o_orderstatus)) AS VARCHAR) AS statuses,
        | CAST(to_json(list(DISTINCT o_orderstatus ORDER BY o_orderstatus)) AS VARCHAR) AS status_set,
        | CAST(to_json(list(o_orderkey ORDER BY o_orderkey)) AS VARCHAR) AS okeys
        | FROM orders GROUP BY o_custkey ORDER BY o_custkey""".stripMargin,
  )
}
