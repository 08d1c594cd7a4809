package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.Tables.{dec, load}

/** Pivot/unpivot reshaping and subquery operators.
  *
  * The subquery family exercises Catalyst's decorrelation rules
  * (RewriteCorrelatedScalarSubquery / RewritePredicateSubquery, SURVEY
  * §4): the SQL texts are shared-dialect — the identical string is the
  * DuckDB oracle — while the physical plans rewrite to broadcast /
  * semi-join shapes with no per-row subquery execution, which is what
  * makes them viable at 100 TB.
  *
  * The scalar-subquery threshold is computed with the exact-decimal
  * average recipe (SURVEY §7.4.2) so the predicate boundary is
  * bit-identical across engines.
  */
object SubqueryQueries {

  private val pivotSql =
    """SELECT l_returnflag,
      | CAST(sum(CASE WHEN l_linestatus = 'F' THEN CAST(l_quantity AS DECIMAL(18,2)) END) AS DECIMAL(38,2)) AS F,
      | CAST(sum(CASE WHEN l_linestatus = 'O' THEN CAST(l_quantity AS DECIMAL(18,2)) END) AS DECIMAL(38,2)) AS O
      | FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  private val unpivotSql =
    """SELECT o_orderkey, metric, val FROM (
      |  SELECT o_orderkey, 'custkey' AS metric, CAST(o_custkey AS DOUBLE) AS val FROM orders
      |  UNION ALL
      |  SELECT o_orderkey, 'totalprice' AS metric, o_totalprice AS val FROM orders
      | ) t ORDER BY o_orderkey, metric""".stripMargin

  private val subqScalarSql =
    """SELECT o_orderkey, o_totalprice FROM orders
      | WHERE o_totalprice > (SELECT CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) / count(*) FROM orders)
      | ORDER BY o_orderkey""".stripMargin

  private val subqInSql =
    """SELECT o_orderkey, o_custkey FROM orders
      | WHERE o_custkey IN (SELECT o_custkey FROM orders WHERE o_totalprice > 250000.0)
      | ORDER BY o_orderkey""".stripMargin

  private val subqCorrSql =
    """SELECT o_orderkey, o_orderstatus FROM orders o
      | WHERE EXISTS (SELECT 1 FROM lineitem l
      |   WHERE l.l_orderkey = o.o_orderkey AND l.l_quantity >= 49.0)
      | ORDER BY o_orderkey""".stripMargin

  private val subqNotExistsSql =
    """SELECT c_custkey, c_name FROM customer c
      | WHERE NOT EXISTS (SELECT 1 FROM orders o
      |   WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 300000.0)
      | ORDER BY c_custkey""".stripMargin

  private val subqLateralSql =
    """SELECT c_custkey, o_orderkey, o_totalprice
      | FROM customer c, LATERAL (SELECT o_orderkey, o_totalprice FROM orders o
      |   WHERE o.o_custkey = c.c_custkey
      |   ORDER BY o_totalprice DESC, o_orderkey LIMIT 1) t
      | ORDER BY c_custkey""".stripMargin

  // Recursive CTE (Spark 4's UnionLoop): a monthly date spine from the
  // anchor to the domain end, left-joined to per-month order counts —
  // the gap-free calendar every reporting pipeline needs. The spark
  // text differs from the oracle only in the final NTZ cast (date
  // literals are LTZ in Spark, naive in DuckDB).
  private def recursiveBody(ntzCast: String): String =
    s"""WITH RECURSIVE months(m) AS (
       |  SELECT TIMESTAMP '1995-01-01 00:00:00'
       |  UNION ALL SELECT m + INTERVAL 1 MONTH FROM months
       |  WHERE m < TIMESTAMP '2001-08-01 00:00:00')
       | SELECT $ntzCast AS m, CAST(coalesce(n, 0) AS BIGINT) AS n FROM months
       | LEFT JOIN (SELECT CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS mo,
       |              count(*) AS n FROM orders GROUP BY mo) c
       |   ON months.m = c.mo
       | ORDER BY m""".stripMargin

  private def viaSql(sql: String, tables: String*): Q = (s, d) => {
    tables.foreach(n => load(s, d, n).createOrReplaceTempView(n))
    s.sql(sql)
  }

  val queries: Map[String, Q] = Map(
    // Pivot via the DataFrame relational-groupBy API with pinned pivot
    // values (no extra distinct-values job — important at scale).
    "agg_pivot" -> ((s, d) =>
      load(s, d, "lineitem")
        .groupBy("l_returnflag")
        .pivot("l_linestatus", Seq("F", "O"))
        .agg(sum(dec(col("l_quantity"))).cast(DecimalType(38, 2)))
        .orderBy("l_returnflag")),

    // Unpivot via the Dataset melt API (long-form for ML pipelines).
    "set_unpivot" -> ((s, d) =>
      load(s, d, "orders")
        .select(col("o_orderkey"),
          col("o_custkey").cast("double").as("custkey"),
          col("o_totalprice").as("totalprice"))
        .unpivot(Array(col("o_orderkey")), Array(col("custkey"), col("totalprice")),
          "metric", "val")
        .orderBy("o_orderkey", "metric")),

    // Subqueries: shared-dialect SQL via the spark.sql entry (§3.2).
    "subq_scalar" -> viaSql(subqScalarSql, "orders"),
    "subq_in" -> viaSql(subqInSql, "orders"),
    "subq_correlated" -> viaSql(subqCorrSql, "orders", "lineitem"),
    // NOT EXISTS with a correlated residual predicate — Catalyst
    // rewrites to a left-anti join with the condition pushed in.
    "subq_not_exists" -> viaSql(subqNotExistsSql, "customer", "orders"),
    // LATERAL correlated derived table (top-1-per-row): Catalyst
    // decorrelates the limit into a window/DomainJoin shape — no
    // per-row subquery execution.
    "subq_lateral" -> viaSql(subqLateralSql, "customer", "orders"),
    "subq_recursive" -> viaSql(recursiveBody("CAST(m AS TIMESTAMP_NTZ)"), "orders"),

    // Parameterized SQL (Spark 4 named-parameter API): the injection-
    // safe entry path an application embeds — parameters bind as
    // literals in the plan, so pushdown/pruning see constants.
    "sql_parameterized" -> ((s, d) => {
      load(s, d, "orders").createOrReplaceTempView("orders")
      s.sql(
        """SELECT o_orderstatus, CAST(count(*) AS BIGINT) AS n,
          |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DECIMAL(38,2)) AS rev
          |FROM orders WHERE o_totalprice > :minPrice AND o_orderpriority = :prio
          |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,
        Map("minPrice" -> 50000, "prio" -> "1-URGENT"))
    }),

    // SQL-defined scalar function (Spark 4 SQL UDF: CREATE FUNCTION
    // ... RETURN <expr>): the declarative extension path for SQL-only
    // users. The body inlines into the plan as an expression — full
    // codegen, pushdown-transparent — unlike a JVM UDF black box. The
    // oracle states the inlined expression directly, which is exactly
    // what the optimizer sees.
    "sql_udf" -> ((s, d) => {
      load(s, d, "lineitem").createOrReplaceTempView("lineitem")
      // exact-decimal product at scale 4, never re-rounded to 2 (the
      // HALF_UP vs half-even cross-engine trap, SURVEY §7.4.2)
      s.sql("""CREATE OR REPLACE TEMPORARY FUNCTION disc_price(p DOUBLE, dd DOUBLE)
              |RETURNS DECIMAL(23,4)
              |RETURN CAST(p AS DECIMAL(18,2))
              |  * CAST(1 - CAST(dd AS DECIMAL(18,2)) AS DECIMAL(4,2))""".stripMargin)
      s.sql(
        """SELECT l_returnflag,
          |  CAST(sum(disc_price(l_extendedprice, l_discount)) AS DECIMAL(38,4)) AS rev
          |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin)
    }),
  )

  val oracle: Map[String, String] = Map(
    "agg_pivot" -> pivotSql,
    "set_unpivot" -> unpivotSql,
    "subq_scalar" -> subqScalarSql,
    "subq_in" -> subqInSql,
    "subq_correlated" -> subqCorrSql,
    "subq_not_exists" -> subqNotExistsSql,
    "subq_lateral" -> subqLateralSql,
    "subq_recursive" -> recursiveBody("m"),
    "sql_parameterized" ->
      """SELECT o_orderstatus, CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DECIMAL(38,2)) AS rev
        |FROM orders WHERE o_totalprice > 50000 AND o_orderpriority = '1-URGENT'
        |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,
    "sql_udf" ->
      """SELECT l_returnflag,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
        |    * CAST(1 - CAST(l_discount AS DECIMAL(18,2)) AS DECIMAL(4,2))) AS DECIMAL(38,4)) AS rev
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
  )
}
