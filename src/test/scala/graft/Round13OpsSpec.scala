package graft

import org.apache.spark.sql.functions._

/** Round-13 pins: the ADVICE r12 CommitLog hardening (drop-shadow
  * adds, constant-only defaults, data-only purge receipts).
  */
class Round13OpsSpec extends GraftSpec {

  import graft.sources.CommitLog

  private def freshDir(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  test("addColumn cannot shadow a dropped physical column (no tombstone resurrection)") {
    import spark.implicits._
    val t = freshDir("graft_r13_addback")
    Seq((1L, "secret-a"), (2L, "secret-b")).toDF("k", "pii")
      .coalesce(1).write.parquet(s"$t/u0")
    CommitLog.commit(t, 0L, Seq("u0"))
    CommitLog.dropColumn(spark, t, "pii") // v1: tombstoned
    // ADVICE r12 (medium): re-adding the dropped NAME used to pass the
    // logical-schema check, and snapshotMapped then REQUESTED the name
    // from the scan — pre-drop files' physical values resurfaced
    // instead of the default, resurrecting erased data. Must refuse.
    val e = intercept[IllegalArgumentException] {
      CommitLog.addColumn(spark, t, "pii", "string", "'redacted'")
    }
    assert(e.getMessage.contains("resurrect"), e.getMessage)
    // a FRESH name is the sanctioned flow and must still work
    val v2 = CommitLog.addColumn(spark, t, "pii_masked", "string", "'redacted'")
    val s2 = CommitLog.snapshotMapped(spark, t, v2)
    assert(s2.columns.toSeq == Seq("k", "pii_masked"))
    assert(s2.filter(col("pii_masked") =!= "redacted").limit(1).isEmpty)
  }

  test("addColumn cannot shadow a renamed-away physical name") {
    import spark.implicits._
    val t = freshDir("graft_r13_addrenamed")
    Seq((1L, 10.0), (2L, 20.0)).toDF("k", "p").coalesce(1)
      .write.parquet(s"$t/u0")
    CommitLog.commit(t, 0L, Seq("u0"))
    CommitLog.renameColumn(spark, t, "p", "price") // v1: physical p stays
    // logical schema is (k, price), so "p" looks free — but the
    // physical field p still backs price; an added column named p
    // would collide in the requested scan schema and evict price
    val e = intercept[IllegalArgumentException] {
      CommitLog.addColumn(spark, t, "p", "double", "0.0")
    }
    assert(e.getMessage.contains("reserved"), e.getMessage)
    val s1 = CommitLog.snapshotMapped(spark, t, 1L)
    assert(s1.columns.toSeq == Seq("k", "price"))
  }

  test("addColumn refuses non-constant defaults (reads must never drift)") {
    import spark.implicits._
    val t = freshDir("graft_r13_addnondet")
    Seq((1L, 1.0)).toDF("k", "v").coalesce(1).write.parquet(s"$t/u0")
    CommitLog.commit(t, 0L, Seq("u0"))
    // ADVICE r12: snapshotMapped re-evaluates the default on EVERY
    // read, so rand()/current_timestamp would yield different values
    // per read and per engine; DDL-time validation must reject them.
    for (bad <- Seq("rand()", "current_timestamp()", "now()")) {
      val e = intercept[IllegalArgumentException] {
        CommitLog.addColumn(spark, t, s"c${bad.length}", "double",
          s"cast($bad AS double)")
      }
      assert(e.getMessage.contains("constant"), s"$bad: ${e.getMessage}")
    }
    // foldable expressions of literals remain fine
    val v = CommitLog.addColumn(spark, t, "c_ok", "double", "1.5 + 2.5")
    assert(CommitLog.snapshotMapped(spark, t, v)
      .filter(col("c_ok") =!= 4.0).limit(1).isEmpty)
  }

  test("purge receipt counts data rows once when a key also sits in a dv sidecar") {
    import spark.implicits._
    val t = freshDir("graft_r13_purgecount")
    (0L until 50L).map(k => (k, k * 10L)).toDF("k", "p")
      .coalesce(1).write.parquet(s"$t/u0")
    CommitLog.commit(t, 0L, Seq("u0"))
    // v1: MoR-delete keys 5..9 — they now exist in BOTH a data unit
    // and the dv sidecar
    (5L until 10L).map(Tuple1(_)).toDF("k").coalesce(1)
      .write.parquet(s"$t/t0")
    CommitLog.commit(t, 1L, Seq("u0"))
    CommitLog.writeDeletes(t, 1L, Seq("t0"))
    // purging keys 5..7: 3 data rows erased; the 3 tombstone rows are
    // scrubbed from the dv too but are NOT data (ADVICE r12 — the old
    // sum over data++dv units reported 6)
    val rep = CommitLog.purgeKeys(spark, t, "k", Seq(5L, 6L, 7L))
    assert(rep.rowsPurged == 3L, rep.toString)
    // semantics unchanged: 8..9 still MoR-deleted, 5..7 gone everywhere
    val v1 = CommitLog.snapshotMoR(spark, t, 1L, "k")
    assert(v1.filter(col("k").between(5L, 9L)).limit(1).isEmpty)
    assert(v1.count() == 45L)
  }
}
