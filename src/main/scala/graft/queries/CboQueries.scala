package graft.queries

import org.apache.spark.sql.SparkSession

/** COST-BASED OPTIMIZATION exercised end-to-end (round 13 — VERDICT
  * r12 #6; ref: n/a, SURVEY §0). Every other multi-join in the engine
  * is shaped by hand (broadcast hints, join order); at ad-hoc-query
  * scale nobody hand-orders joins, so this module proves the catalog
  * path works: the TPC-H tables are registered as external catalog
  * tables, `ANALYZE TABLE ... FOR ALL COLUMNS` persists row counts +
  * column NDV/min/max into the session catalog, `spark.sql.cbo.*`
  * turns on stats-driven planning, and the q8-shape 6-table join runs
  * HINT-FREE — Catalyst's join reorder and stats-based broadcast
  * decisions replace the hand-tuned plan (Round13OpsSpec pins that
  * the row-count stats are visible to the optimizer and that the
  * hint-free plan broadcasts every dimension exactly like the
  * hand-hinted tpch_q8 does).
  *
  * At 100 TB the same recipe is one `ANALYZE` per table per ingest
  * cadence — O(table scan) once, amortized over every ad-hoc query —
  * which is the standard warehouse operating practice.
  */
object CboQueries {

  private val cboTables =
    Seq("region", "nation", "customer", "supplier", "part", "orders",
      "lineitem")

  // The g_cbo_* catalog tables are SESSION-GLOBAL — only ONE data dir
  // can be registered at a time. The cache therefore tracks the single
  // currently-registered (appId, dir, fingerprint) triple (ADVICE r13:
  // a per-(app,dir) map would stay 'ready' for dir A after dir B
  // repointed the tables, silently querying B's data with B's stats
  // under A's name). Any change of app, dir, or data fingerprint
  // re-registers; synchronized because registration must be atomic
  // with the cache write.
  private val catalogState =
    new java.util.concurrent.atomic.AtomicReference[(String, String, String)]()

  /** Register the external catalog tables + statistics (idempotent
    * while the SAME dir+fingerprint stays current) and enable CBO. The
    * confs stay set: they only change plans for catalog tables
    * carrying stats, which are exactly the g_cbo_* tables.
    */
  private[graft] def ensureCatalog(s: SparkSession, d: String): Unit = {
    val fp = cboTables.map(t => graft.Tables.fingerprint(d, t)).mkString(";")
    val want = (s.sparkContext.applicationId, d, fp)
    catalogState.synchronized {
      if (catalogState.get != want) {
        s.conf.set("spark.sql.cbo.enabled", "true")
        s.conf.set("spark.sql.cbo.joinReorder.enabled", "true")
        cboTables.foreach { t =>
          s.sql(s"DROP TABLE IF EXISTS g_cbo_$t")
          s.sql(s"CREATE TABLE g_cbo_$t USING parquet LOCATION '$d/$t.parquet'")
          // TIMESTAMP_NTZ columns are EXCLUDED from column statistics:
          // Spark 4.1's FilterEstimation.evaluateBinary MatchErrors on
          // TimestampNTZType when a range predicate meets column stats
          // (upstream gap — the type postdates the estimator). Without
          // stats the predicate estimates at default selectivity; join
          // reorder still sees every row count and join-key NDV, which
          // is what drives the plan.
          val cols = s.table(s"g_cbo_$t").schema.fields
            .filterNot(_.dataType ==
              org.apache.spark.sql.types.TimestampNTZType)
            .map(_.name).mkString(", ")
          s.sql(s"ANALYZE TABLE g_cbo_$t COMPUTE STATISTICS FOR COLUMNS $cols")
        }
        catalogState.set(want)
      }
    }
  }

  /** The q8-shape market-share query, HINT-FREE, deliberately written
    * fact-first in a naive join order — the optimizer must find the
    * selective-dims-early broadcast plan from statistics alone.
    * `prefix` parameterizes table names so the Spark text (g_cbo_*)
    * and the DuckDB oracle (bare names) cannot drift.
    */
  private[graft] def q8Sql(prefix: String): String =
    s"""WITH vol AS (
       |  SELECT CAST(year(o_orderdate) AS BIGINT) AS yr,
       |    CAST(l_extendedprice AS DECIMAL(18,2))
       |      * CAST(1 - CAST(l_discount AS DECIMAL(18,2)) AS DECIMAL(4,2)) AS volume,
       |    (s_nationkey = 7) AS is_target
       |  FROM ${prefix}lineitem
       |  JOIN ${prefix}orders ON l_orderkey = o_orderkey
       |  JOIN ${prefix}part ON l_partkey = p_partkey
       |  JOIN ${prefix}customer ON o_custkey = c_custkey
       |  JOIN ${prefix}nation n ON c_nationkey = n.n_nationkey
       |  JOIN ${prefix}supplier ON l_suppkey = s_suppkey
       |  WHERE n.n_regionkey = 2 AND p_type = 'STANDARD'
       |    AND o_orderdate >= TIMESTAMP '1996-01-01'
       |    AND o_orderdate < TIMESTAMP '1998-01-01')
       |SELECT yr,
       |  CAST(sum(CASE WHEN is_target THEN volume ELSE CAST(0.0 AS DECIMAL(22,4)) END) AS DECIMAL(38,4)) AS nation_rev,
       |  CAST(sum(volume) AS DECIMAL(38,4)) AS total_rev,
       |  CAST(sum(CASE WHEN is_target THEN volume END) AS DOUBLE)
       |    / CAST(sum(volume) AS DOUBLE) AS mkt_share
       |FROM vol GROUP BY yr ORDER BY yr""".stripMargin

  val queries: Map[String, Q] = Map(
    // P8-CBO (round 13): the tpch_q8 semantics with every hint
    // removed, planned from catalog statistics. Values must equal the
    // hand-tuned tpch_q8 (same oracle body).
    "tpch_q8_cbo" -> ((s, d) => { ensureCatalog(s, d); s.sql(q8Sql("g_cbo_")) })
  )

  val oracle: Map[String, String] = Map(
    "tpch_q8_cbo" -> q8Sql(""))
}
