package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables.load

/** Family G — set operations (SURVEY.md §2.G).
  *
  * union is a zero-shuffle concatenation of partition lists; the
  * distinct/intersect/except variants each add one hash-partition
  * shuffle on the full row. Outputs are sorted on every column so
  * duplicate rows (bag semantics, G1/G5) still order deterministically.
  */
object SetQueries {

  private def hi(s: org.apache.spark.sql.SparkSession, d: String) =
    load(s, d, "orders")
      .filter(col("o_totalprice") > 150000.0)
      .select("o_orderkey", "o_orderstatus", "o_totalprice")

  private def fin(s: org.apache.spark.sql.SparkSession, d: String) =
    load(s, d, "orders")
      .filter(col("o_orderstatus") === "F")
      .select("o_orderkey", "o_orderstatus", "o_totalprice")

  private def custA(s: org.apache.spark.sql.SparkSession, d: String) =
    load(s, d, "orders").filter(col("o_orderstatus") === "F").select("o_custkey")

  private def custB(s: org.apache.spark.sql.SparkSession, d: String) =
    load(s, d, "orders").filter(col("o_totalprice") > 100000.0).select("o_custkey")

  val queries: Map[String, Q] = Map(
    // G1: bag union of two overlapping predicates.
    "set_union_all" -> ((s, d) =>
      hi(s, d).union(fin(s, d))
        .orderBy("o_orderkey", "o_orderstatus", "o_totalprice")),

    // G2: set union (distinct over the concatenation).
    "set_union_distinct" -> ((s, d) =>
      hi(s, d).union(fin(s, d)).distinct()
        .orderBy("o_orderkey", "o_orderstatus", "o_totalprice")),

    // G3: INTERSECT (set semantics in both engines).
    "set_intersect" -> ((s, d) =>
      custA(s, d).intersect(custB(s, d)).orderBy("o_custkey")),

    // G4: EXCEPT / MINUS.
    "set_except" -> ((s, d) =>
      custA(s, d).except(custB(s, d)).orderBy("o_custkey")),

    // G5: INTERSECT ALL (bag semantics — min multiplicity).
    "set_intersect_all" -> ((s, d) =>
      custA(s, d).intersectAll(custB(s, d)).orderBy("o_custkey")),
    // G6 (round 4): bag difference — the multiplicity-preserving dual
    // of G4's EXCEPT DISTINCT.
    "set_except_all" -> ((s, d) =>
      custA(s, d).exceptAll(custB(s, d)).orderBy("o_custkey")),
  )

  private val hiSql = "SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders WHERE o_totalprice > 150000.0"
  private val finSql = "SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders WHERE o_orderstatus = 'F'"
  private val custASql = "SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'"
  private val custBSql = "SELECT o_custkey FROM orders WHERE o_totalprice > 100000.0"

  val oracle: Map[String, String] = Map(
    "set_union_all" ->
      s"""SELECT * FROM ($hiSql UNION ALL $finSql) t
         | ORDER BY o_orderkey, o_orderstatus, o_totalprice""".stripMargin,
    "set_union_distinct" ->
      s"""SELECT * FROM ($hiSql UNION $finSql) t
         | ORDER BY o_orderkey, o_orderstatus, o_totalprice""".stripMargin,
    "set_intersect" ->
      s"SELECT * FROM ($custASql INTERSECT $custBSql) t ORDER BY o_custkey",
    "set_except" ->
      s"SELECT * FROM ($custASql EXCEPT $custBSql) t ORDER BY o_custkey",
    "set_intersect_all" ->
      s"SELECT * FROM ($custASql INTERSECT ALL $custBSql) t ORDER BY o_custkey",
    "set_except_all" ->
      s"SELECT * FROM ($custASql EXCEPT ALL $custBSql) t ORDER BY o_custkey",
  )
}
