package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.Tables.{dec, load}

/** Family B — projection, filters, predicates (SURVEY.md §2.B).
  *
  * All arithmetic on money columns runs in decimal (SURVEY §7.4.2):
  * the doubles are cast once at the leaf, every factor is renormalized
  * to a small decimal type so the multiply chain stays inside
  * precision 38 in both Spark and DuckDB, and the result is cast to an
  * explicit final type so the two engines agree on the output schema.
  */
object FilterQueries {

  val queries: Map[String, Q] = Map(
    // B1: derived-column arithmetic, the TPC-H net-price expression.
    "project_arith" -> ((s, d) =>
      load(s, d, "lineitem").select(
        col("l_orderkey"), col("l_linenumber"),
        (dec(col("l_extendedprice"))
          * (lit(1) - dec(col("l_discount"))).cast(DecimalType(4, 2))
          * (lit(1) + dec(col("l_tax"))).cast(DecimalType(4, 2)))
          .cast(DecimalType(38, 6)).as("net_price"))
        .orderBy("l_orderkey", "l_linenumber")),

    // B2: conjunction/disjunction with IN-list, BETWEEN, LIKE.
    "filter_conj" -> ((s, d) =>
      load(s, d, "part").filter(
        (col("p_brand").like("Brand#1%") && col("p_size").between(1, 25))
          || (col("p_type").like("PROMO%") && col("p_retailprice") > 1200.0)
          || col("p_partkey").isin(1L, 2L, 3L))
        .select("p_partkey", "p_brand", "p_type", "p_size")
        .orderBy("p_partkey")),

    // B3: three-valued logic. The tables are null-free, so nulls are
    // manufactured with nullif; <=> is Spark's null-safe equality
    // (oracle: IS NOT DISTINCT FROM).
    "filter_null_semantics" -> ((s, d) =>
      load(s, d, "orders")
        .select(col("o_orderkey"), expr("nullif(o_orderstatus, 'P')").as("st"))
        .select(
          col("o_orderkey"), col("st"),
          col("st").isNull.as("st_is_null"),
          col("st").isNotNull.as("st_not_null"),
          (col("st") <=> lit("F")).as("st_nsafe_f"),
          (col("st") <=> lit(null).cast("string")).as("st_nsafe_null"))
        .orderBy("o_orderkey")),

    // B4: CASE WHEN bucketing + aggregate over the buckets.
    "case_when" -> ((s, d) =>
      load(s, d, "orders").withColumn("tier",
        when(col("o_orderpriority") === "1-URGENT", lit(1))
          .when(col("o_orderpriority") === "2-HIGH", lit(2))
          .when(col("o_orderpriority").isin("3-MEDIUM", "4-NOT SPECIFIED"), lit(3))
          .otherwise(lit(4)))
        .groupBy("tier")
        .agg(
          count(lit(1)).as("n"),
          sum(dec(col("o_totalprice"))).cast(DecimalType(38, 2)).as("total"))
        .orderBy("tier")),
  )

  val oracle: Map[String, String] = Map(
    "project_arith" ->
      """SELECT l_orderkey, l_linenumber,
        | CAST(CAST(l_extendedprice AS DECIMAL(18,2))
        |   * CAST(1 - CAST(l_discount AS DECIMAL(18,2)) AS DECIMAL(4,2))
        |   * CAST(1 + CAST(l_tax AS DECIMAL(18,2)) AS DECIMAL(4,2)) AS DECIMAL(38,6)) AS net_price
        | FROM lineitem ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "filter_conj" ->
      """SELECT p_partkey, p_brand, p_type, p_size FROM part
        | WHERE (p_brand LIKE 'Brand#1%' AND p_size BETWEEN 1 AND 25)
        |    OR (p_type LIKE 'PROMO%' AND p_retailprice > 1200.0)
        |    OR p_partkey IN (1, 2, 3)
        | ORDER BY p_partkey""".stripMargin,
    "filter_null_semantics" ->
      """SELECT o_orderkey, nullif(o_orderstatus, 'P') AS st,
        | nullif(o_orderstatus, 'P') IS NULL AS st_is_null,
        | nullif(o_orderstatus, 'P') IS NOT NULL AS st_not_null,
        | nullif(o_orderstatus, 'P') IS NOT DISTINCT FROM 'F' AS st_nsafe_f,
        | nullif(o_orderstatus, 'P') IS NOT DISTINCT FROM NULL AS st_nsafe_null
        | FROM orders ORDER BY o_orderkey""".stripMargin,
    "case_when" ->
      """SELECT CASE WHEN o_orderpriority = '1-URGENT' THEN 1
        |   WHEN o_orderpriority = '2-HIGH' THEN 2
        |   WHEN o_orderpriority IN ('3-MEDIUM', '4-NOT SPECIFIED') THEN 3
        |   ELSE 4 END AS tier,
        | count(*) AS n,
        | CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DECIMAL(38,2)) AS total
        | FROM orders GROUP BY 1 ORDER BY tier""".stripMargin,
  )
}
