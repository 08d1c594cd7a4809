package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.Tables.{dec, load}
import graft.functions.{Aggregators, GraftFunctions}

/** Family J — UDF / UDAF / UDTF / custom expression (SURVEY.md §2.J).
  *
  * J1 is a deliberate closure UDF (opaque to codegen) to cover the API;
  * J5 is the contrast: the same kind of scalar logic as a native
  * Catalyst expression with doGenCode, which stays inside the fused
  * whole-stage pipeline. Prefer the J5 pattern in hot paths.
  */
object UdfQueries {

  val queries: Map[String, Q] = Map(
    // J1: Scala closure UDF, registered and applied.
    "udf_scalar" -> ((s, d) => {
      val band = udf((disc: Double) =>
        if (disc < 0.03) "low" else if (disc < 0.07) "mid" else "high")
      s.udf.register("disc_band", band)
      load(s, d, "lineitem")
        .withColumn("band", band(col("l_discount")))
        .groupBy("band")
        .agg(
          count(lit(1)).as("n"),
          sum(dec(col("l_quantity"))).cast(DecimalType(38, 2)).as("qty"))
        .orderBy("band")
    }),

    // J2: typed Aggregator — weighted average with exact decimal buffer.
    "udaf_typed" -> ((s, d) => {
      val wavg = udaf(Aggregators.WeightedAvg)
      load(s, d, "lineitem")
        .groupBy("l_returnflag")
        .agg(wavg(col("l_extendedprice"), col("l_quantity")).as("wavg_price"))
        .orderBy("l_returnflag")
    }),

    // J3: mergeable-buffer aggregate — exact-moment sample variance.
    "udaf_imperative" -> ((s, d) => {
      val evar = udaf(Aggregators.ExactVariance)
      load(s, d, "lineitem")
        .groupBy("l_returnflag")
        .agg(evar(col("l_discount")).as("var_disc"))
        .orderBy("l_returnflag")
    }),

    // J4: generator / UDTF surface — words with positions.
    "udtf_generator" -> ((s, d) =>
      load(s, d, "documents")
        .select(col("doc_id"), posexplode(split(col("text"), " ")).as(Seq("pos", "word")))
        .withColumn("pos", col("pos").cast("bigint"))
        .orderBy("doc_id", "pos")),

    // J5: custom Catalyst expression with codegen, via the registry.
    "expr_custom" -> ((s, d) => {
      GraftFunctions.register(s)
      load(s, d, "lineitem")
        .selectExpr(
          "l_orderkey", "l_linenumber",
          "null_safe_div(l_extendedprice, l_discount) AS price_per_disc")
        .orderBy("l_orderkey", "l_linenumber")
    }),

    // J6: typed Dataset API — case-class Encoder + groupByKey +
    // mapGroups, the tier for GENUINE per-group imperative logic
    // (design preference (d): reach it deliberately, not by default).
    // Per-group state is one user's bounded history; the aggregates
    // here are chosen to be order-insensitive so the result is
    // partition-count independent. The DuckDB oracle is declarative
    // SQL over the same semantics.
    "typed_mapgroups" -> ((s, d) => {
      import s.implicits._
      val ds = load(s, d, "events")
        .selectExpr("event_id", "user_id", "event_type",
          "unix_micros(cast(ts as timestamp)) AS ep_us")
        .as[UdfQueries.Ev]
      ds.groupByKey(_.user_id)
        .mapGroups { (uid, it) =>
          val evs = it.toArray
          val types = evs.groupBy(_.event_type).view.mapValues(_.length)
          // deterministic top type: max count, then lexicographic
          val top = types.toSeq.maxBy { case (t, c) => (c, t) }
          UdfQueries.UserStats(uid, evs.length.toLong,
            evs.map(_.ep_us).max - evs.map(_.ep_us).min,
            types.size.toLong, top._1, top._2.toLong)
        }
        .toDF()
        .orderBy("user_id")
    }),
  )

  /** Typed-API row shapes for J6 (top level so Encoders derive cleanly). */
  case class Ev(event_id: Long, user_id: Long, event_type: String, ep_us: Long)
  case class UserStats(user_id: Long, n: Long, span_us: Long,
      n_types: Long, top_type: String, top_n: Long)

  val oracle: Map[String, String] = Map(
    "typed_mapgroups" ->
      """WITH e AS (SELECT event_id, user_id, event_type,
        |    epoch_us(CAST(ts AS TIMESTAMP)) AS ep_us FROM events),
        | s AS (SELECT user_id, CAST(count(*) AS BIGINT) AS n,
        |    max(ep_us) - min(ep_us) AS span_us,
        |    CAST(count(DISTINCT event_type) AS BIGINT) AS n_types
        |  FROM e GROUP BY 1),
        | t AS (SELECT user_id, event_type, CAST(count(*) AS BIGINT) AS c
        |  FROM e GROUP BY 1, 2),
        | r AS (SELECT *, row_number() OVER (PARTITION BY user_id
        |    ORDER BY c DESC, event_type DESC) AS rn FROM t)
        |SELECT s.user_id, n, span_us, n_types,
        |  r.event_type AS top_type, c AS top_n
        |FROM s JOIN r USING (user_id) WHERE rn = 1
        |ORDER BY user_id""".stripMargin,
    "udf_scalar" ->
      """SELECT CASE WHEN l_discount < 0.03 THEN 'low'
        |   WHEN l_discount < 0.07 THEN 'mid' ELSE 'high' END AS band,
        | count(*) AS n,
        | CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DECIMAL(38,2)) AS qty
        | FROM lineitem GROUP BY 1 ORDER BY band""".stripMargin,
    "udaf_typed" ->
      """SELECT l_returnflag,
        | CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
        |   / CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS wavg_price
        | FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "udaf_imperative" ->
      """SELECT l_returnflag,
        | (CAST(sum(CAST(l_discount AS DECIMAL(18,2)) * CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE)
        |   - CAST(sum(CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE)
        |     * CAST(sum(CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) / count(*))
        |  / (count(*) - 1) AS var_disc
        | FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "udtf_generator" ->
      """SELECT doc_id,
        | unnest(generate_series(0, len(string_split(text, ' ')) - 1)) AS pos,
        | unnest(string_split(text, ' ')) AS word
        | FROM documents ORDER BY doc_id, pos""".stripMargin,
    "expr_custom" ->
      """SELECT l_orderkey, l_linenumber,
        | CASE WHEN l_discount = 0 THEN NULL
        |      ELSE l_extendedprice / l_discount END AS price_per_disc
        | FROM lineitem ORDER BY l_orderkey, l_linenumber""".stripMargin,
  )
}
