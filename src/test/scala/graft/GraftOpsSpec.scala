package graft

import org.apache.spark.sql.functions._
import graft.api.GraftOps

/** API-genericity tests: GraftOps must work on arbitrary DataFrames
  * with arbitrary column names, not just the test tables (catches
  * hardcoded column references).
  */
class GraftOpsSpec extends GraftSpec {

  import spark.implicits._

  private lazy val tiny = Seq(
    (1L, "alpha beta gamma delta epsilon zeta"),
    (2L, "alpha beta gamma delta epsilon zeta"), // exact dup of 1
    (3L, "alpha beta gamma delta epsilon eta"),  // near dup of 1
    (4L, "one two three four five six seven")
  ).toDF("rid", "body")

  test("exactDedup on custom column names") {
    val out = GraftOps.exactDedup(tiny, "rid", "body").orderBy("rid").collect()
    assert(out.map(r => (r.getLong(0), r.getLong(1))).toSeq ===
      Seq((1L, 2L), (3L, 1L), (4L, 1L)))
  }

  test("ngramJaccardPairs on custom column names finds the near-dup") {
    val pairs = GraftOps.ngramJaccardPairs(tiny, "rid", "body", minJaccard = 0.3)
      .select("a_id", "b_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 2L)) && pairs.contains((1L, 3L)))
    assert(!pairs.exists { case (a, b) => a == 4L || b == 4L })
  }

  test("simhashPairs on custom column names pairs the exact dup") {
    graft.functions.GraftFunctions.register(spark)
    val pairs = GraftOps.simhashPairs(tiny, "rid", "body", maxHamming = 3)
      .select("a_id", "b_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 2L)))
  }

  test("asofLastMatch on custom column names") {
    val log = Seq(
      (10L, 1L, 1L, "view"), (11L, 1L, 2L, "buy"),
      (12L, 1L, 3L, "view"), (13L, 2L, 1L, "view")
    ).toDF("row_id", "who", "seq", "action")
    val out = GraftOps.asofLastMatch(log, "who", "seq", "row_id",
      col("action") === "buy", "last_buy")
      .orderBy("row_id").collect()
    assert(out.map(r => (r.getLong(0), if (r.isNullAt(4)) -1L else r.getLong(4))).toSeq ===
      Seq((10L, -1L), (11L, 11L), (12L, 11L), (13L, -1L)))
  }

  test("cosineTopK on custom column names") {
    graft.functions.GraftFunctions.register(spark)
    val vecs = Seq(
      (1L, Array(1.0f, 0.0f)), (2L, Array(0.9f, 0.1f)),
      (3L, Array(0.0f, 1.0f)), (4L, Array(-1.0f, 0.0f))
    ).toDF("vid", "v")
    val top1 = GraftOps.cosineTopK(vecs, "vid", "v", col("vid") === 1L, k = 1)
      .select("c_id").head().getLong(0)
    assert(top1 === 2L)
  }
}
