package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables.load

/** Family F — sort / limit / top-k / sampling (SURVEY.md §2.F).
  *
  * Scale notes: a global orderBy is a range-partitioned SortExec
  * (sampled boundaries, no single-node sort); orderBy+limit collapses
  * to TakeOrderedAndProjectExec, which keeps only k rows per partition
  * before the final merge — the only top-k formulation that survives
  * 100 TB. Top-k *per group* (F3) uses a rank window + filter, which
  * shuffles once on the group key.
  */
object SortQueries {

  val queries: Map[String, Q] = Map(
    // F1: multi-key global sort, mixed directions, explicit null order.
    "sort_multi" -> ((s, d) =>
      load(s, d, "orders")
        .select(
          col("o_orderkey"),
          expr("nullif(o_orderstatus, 'P')").as("st"),
          col("o_totalprice"))
        .orderBy(col("st").desc_nulls_last, col("o_totalprice").asc, col("o_orderkey").asc)),

    // F2: ORDER BY + LIMIT k → TakeOrderedAndProjectExec.
    "topk_limit" -> ((s, d) =>
      load(s, d, "orders")
        .select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
        .limit(10)),

    // F3: top-3 per customer via row_number window (rank cast to
    // bigint: DuckDB's row_number() is BIGINT).
    "topk_per_group" -> ((s, d) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      load(s, d, "orders")
        .withColumn("rn", row_number().over(w).cast("bigint"))
        .filter(col("rn") <= 3)
        .select("o_custkey", "o_orderkey", "o_totalprice", "rn")
        .orderBy("o_custkey", "rn")
    }),

    // F3b (round 5): the same top-3-per-customer answer through the
    // custom TopKPerGroup physical operator (bounded per-group heaps,
    // partial+final around one exchange — no window, no sort; see
    // graft.plans.TopKPerGroup). Ordering is total per group
    // (totalprice desc, orderkey asc), so output is deterministic and
    // bit-equal to the row_number formulation — TopKSpec asserts both.
    "topk_physical" -> ((s, d) => {
      val orders = load(s, d, "orders")
        .select("o_custkey", "o_orderkey", "o_totalprice")
      graft.api.GraftOps.topKPerGroup(
          orders, Seq("o_custkey"),
          Seq(("o_totalprice", true), ("o_orderkey", false)), 3)
        .orderBy(col("o_custkey"), col("o_totalprice").desc, col("o_orderkey"))
    }),

    // F4 (round 6): seeded Bernoulli sample via PORTABLE md5 bucketing
    // — keep a row iff the first 8 hex chars of md5('42:'||key) sort
    // below 0x1999999A (0.1 of the 32-bit space; lexicographic
    // comparison of equal-length lowercase hex IS numeric comparison).
    // Engine-independent, so this entry is now driver-ORACLED where
    // the df.sample formulation's engine-specific RNG couldn't be;
    // df.sample itself stays the exercised primitive in GoldenSpec.
    // Same scale shape either way: a map-only filter on the scan.
    "sample_seeded" -> ((s, d) =>
      load(s, d, "lineitem")
        .filter(substring(md5(concat(lit("42:"),
          col("l_orderkey").cast("string"), lit(":"),
          col("l_linenumber").cast("string"))), 1, 8) < "1999999a")
        .select("l_orderkey", "l_linenumber", "l_quantity")
        .orderBy("l_orderkey", "l_linenumber")),
  )

  val oracle: Map[String, String] = Map(
    "sample_seeded" ->
      """SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem
        | WHERE substr(md5('42:' || CAST(l_orderkey AS VARCHAR) || ':'
        |     || CAST(l_linenumber AS VARCHAR)), 1, 8) < '1999999a'
        | ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "sort_multi" ->
      """SELECT o_orderkey, nullif(o_orderstatus, 'P') AS st, o_totalprice
        | FROM orders
        | ORDER BY st DESC NULLS LAST, o_totalprice ASC, o_orderkey ASC""".stripMargin,
    "topk_limit" ->
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
        | ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 10""".stripMargin,
    "topk_per_group" ->
      """SELECT o_custkey, o_orderkey, o_totalprice, rn FROM (
        |   SELECT o_custkey, o_orderkey, o_totalprice,
        |     row_number() OVER (PARTITION BY o_custkey
        |       ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
        |   FROM orders) t
        | WHERE rn <= 3 ORDER BY o_custkey, rn""".stripMargin,
    "topk_physical" ->
      """SELECT o_custkey, o_orderkey, o_totalprice FROM (
        |   SELECT o_custkey, o_orderkey, o_totalprice,
        |     row_number() OVER (PARTITION BY o_custkey
        |       ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
        |   FROM orders) t
        | WHERE rn <= 3
        | ORDER BY o_custkey, o_totalprice DESC, o_orderkey""".stripMargin,
  )
}
