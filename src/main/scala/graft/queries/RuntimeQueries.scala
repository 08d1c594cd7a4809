package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.Tables.{dec, load}

/** Family V — runtime-optimization surfaces (ref: n/a, SURVEY §0 —
  * the reference repo is empty): dynamic partition pruning over a
  * partitioned fact table, and exact heavy-hitter detection.
  *
  * Scale shapes (the 100 TB contract):
  *  - V1 join_dpp: the fact table is laid out partitioned by the join
  *    key's dimension (the lakehouse norm); a filter that only exists
  *    on the DIM side (derived column — not statically pushable)
  *    still prunes fact partitions at runtime via Spark's
  *    DynamicPartitionPruning subquery, reusing the join's broadcast.
  *    At 100 TB this is the difference between scanning 2/5 of the
  *    fact and scanning all of it. PlanShape asserted in RuntimeSpec
  *    (`dynamicpruning` partition filter present).
  *  - V2 agg_heavy_hitters: the exact φ-frequent-items query (share >
  *    1/k): one partial-agg shuffle to the value histogram + a
  *    broadcast 1-row total. Histogram-sized state, never input-sized
  *    — the exact counterpart to a Misra-Gries sketch, preferable
  *    whenever the value domain (languages, domains, licenses) is
  *    bounded.
  */
object RuntimeQueries {

  /** One partitioned copy of `orders` per (JVM, sfDir) — the layout
    * cost a lakehouse pays once at ingest, amortized over every
    * pruned query after (same attribution rule as join_bucketed).
    */
  private val dppDir =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  val queries: Map[String, Q] = Map(
    // V1: dim-side filter prunes fact partitions at runtime. The dim
    // carries a DERIVED filter column (leading digit of the priority)
    // so static partition pruning can't see it — only the DPP
    // subquery, fed by the dim broadcast, can.
    "join_dpp" -> ((s, d) => {
      val dir = ScaleQueries.freshDir(dppDir, d, "orders") {
        val out = java.nio.file.Files.createTempDirectory("graft_dpp").toString
        load(s, d, "orders")
          .write.mode("overwrite").partitionBy("o_orderpriority").parquet(out)
        out
      }
      val fact = s.read.parquet(dir)
      val dim = load(s, d, "orders").select("o_orderpriority").distinct()
        .select(col("o_orderpriority").as("p"),
          expr("CAST(substring(o_orderpriority, 1, 1) AS INT)").as("pr"))
        .filter(col("pr") <= 2)
      fact.join(broadcast(dim), fact("o_orderpriority") === dim("p"))
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("n"),
          sum(dec(col("o_totalprice"))).cast(DecimalType(38, 2)).as("rev"))
        .orderBy("o_orderpriority")
    }),

    // V2: exact heavy hitters — values whose share exceeds 1/k
    // (k = 5) with their exact share. Histogram + broadcast total;
    // never collects, never approximates.
    "agg_heavy_hitters" -> ((s, d) => {
      val docs = load(s, d, "documents")
      val tot = docs.agg(count(lit(1)).as("n_tot"))
      docs.groupBy("lang").agg(count(lit(1)).as("c"))
        .crossJoin(broadcast(tot))
        .filter(col("c") * 5 > col("n_tot"))
        .select(col("lang"), col("c"), col("n_tot"),
          expr("CAST(CAST(c AS DOUBLE) / CAST(n_tot AS DOUBLE) AS DECIMAL(18,6))").as("share"))
        .orderBy("lang")
    }),

    // V3 (round 5): Count-Min sketch — agg_heavy_hitters' approximate,
    // MERGEABLE sibling, built from deterministic md5 hashes so the
    // whole sketch (unlike engine HLL/datasketch registers) is
    // cross-engine-checkable. Build: each key row contributes d=4
    // (row, col) cells; the 4×64-cell table collapses in one
    // combinable shuffle regardless of corpus size, and sketches from
    // different shards/days MERGE by cell-wise addition — the property
    // that makes CM the streaming heavy-hitter structure. Probe:
    // est(k) = min over rows of cell(r, hash_r(k)), with the one-sided
    // guarantee est >= true asserted per probe.
    "agg_count_min" -> ((s, d) => {
      val keyed = load(s, d, "events")
        .select(col("user_id").cast("string").as("k"))
      keyed.createOrReplaceTempView("cm_keyed")
      s.sql(cmSql("cm_keyed"))
    })
  )

  /** Count-Min pipeline over a one-column view `k` — identical text on
    * both engines (instr/substr/md5/% are portable), which IS the
    * determinism argument. Split into cells/probe parts so the
    * streaming variant (stream_count_min) can build per-batch partial
    * sketches and merge them cell-wise.
    */
  private def cmHash(i: Int): String = {
    val m = s"md5('$i:' || k)"
    s"((instr('0123456789abcdef', substr($m, 1, 1)) - 1) * 16" +
      s" + (instr('0123456789abcdef', substr($m, 2, 1)) - 1)) % 64"
  }

  /** The d×w cell table of a Count-Min sketch over `table`(k). */
  private[graft] def cmCellsSql(table: String): String =
    s"""SELECT r, c, CAST(count(*) AS BIGINT) AS n FROM (
       |    SELECT 0 AS r, ${cmHash(0)} AS c FROM $table
       |    UNION ALL SELECT 1, ${cmHash(1)} FROM $table
       |    UNION ALL SELECT 2, ${cmHash(2)} FROM $table
       |    UNION ALL SELECT 3, ${cmHash(3)} FROM $table) t GROUP BY r, c""".stripMargin

  /** Probe lookups of five known keys against a cell table. */
  private[graft] def cmProbeSql(cellsRef: String, keyedTable: String): String =
    s"""WITH probes AS (
       |  SELECT k, CAST(count(*) AS BIGINT) AS true_n FROM $keyedTable
       |  WHERE k IN ('3', '7', '11', '13', '14') GROUP BY k),
       | lookups AS (
       |  SELECT k, true_n, 0 AS r, ${cmHash(0)} AS c FROM probes
       |  UNION ALL SELECT k, true_n, 1, ${cmHash(1)} FROM probes
       |  UNION ALL SELECT k, true_n, 2, ${cmHash(2)} FROM probes
       |  UNION ALL SELECT k, true_n, 3, ${cmHash(3)} FROM probes)
       | SELECT l.k, min(l.true_n) AS true_n, min($cellsRef.n) AS est_n,
       |   min($cellsRef.n) >= min(l.true_n) AS ge_ok
       | FROM lookups l JOIN $cellsRef ON l.r = $cellsRef.r AND l.c = $cellsRef.c
       | GROUP BY l.k ORDER BY l.k""".stripMargin

  private[graft] def cmSql(table: String): String = {
    val probe = cmProbeSql("cells", table)
    s"""WITH cells AS (
       |  ${cmCellsSql(table)}),
       | ${probe.stripPrefix("WITH ")}""".stripMargin
  }

  val oracle: Map[String, String] = Map(
    "join_dpp" ->
      """SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DECIMAL(38,2)) AS rev
        |FROM orders
        |WHERE CAST(substring(o_orderpriority, 1, 1) AS INT) <= 2
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "agg_heavy_hitters" ->
      """WITH t AS (SELECT CAST(count(*) AS BIGINT) AS n_tot FROM documents),
        | h AS (SELECT lang, CAST(count(*) AS BIGINT) AS c FROM documents GROUP BY 1)
        |SELECT lang, c, n_tot,
        |  CAST(CAST(c AS DOUBLE) / CAST(n_tot AS DOUBLE) AS DECIMAL(18,6)) AS share
        |FROM h, t WHERE c * 5 > n_tot ORDER BY lang""".stripMargin,
    "agg_count_min" ->
      ("WITH cm_keyed AS (SELECT CAST(user_id AS VARCHAR) AS k FROM events),\n " +
        cmSql("cm_keyed").stripPrefix("WITH "))
  )
}
