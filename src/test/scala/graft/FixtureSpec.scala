package graft

import org.apache.spark.sql.functions._

/** Testdata invariants (FIXTURES.md): drift here means the driver
  * regenerated the fixtures — every golden value downstream would be
  * suspect, so fail loudly and early.
  */
class FixtureSpec extends GraftSpec {

  private val expectedRows = Map(
    "region" -> 5L, "nation" -> 25L, "customer" -> 150L, "supplier" -> 10L,
    "part" -> 200L, "orders" -> 1500L, "lineitem" -> 6000L, "events" -> 1000L,
    "documents" -> 500L, "embeddings" -> 500L)

  test("row counts at sf0.001 match FIXTURES.md") {
    expectedRows.foreach { case (t, n) =>
      assert(Tables.load(spark, sf, t).count() === n, s"table $t")
    }
  }

  test("key columns are unique and non-null") {
    Seq("orders" -> "o_orderkey", "customer" -> "c_custkey", "part" -> "p_partkey",
      "events" -> "event_id", "documents" -> "doc_id", "embeddings" -> "vec_id")
      .foreach { case (t, k) =>
        val df = Tables.load(spark, sf, t)
        assert(df.filter(col(k).isNull).count() === 0L, s"$t.$k has nulls")
        assert(df.select(k).distinct().count() === df.count(), s"$t.$k not unique")
      }
  }

  test("foreign keys resolve (no orphans)") {
    val li = Tables.load(spark, sf, "lineitem")
    val o = Tables.load(spark, sf, "orders")
    val c = Tables.load(spark, sf, "customer")
    assert(li.join(o, li("l_orderkey") === o("o_orderkey"), "left_anti").count() === 0L)
    assert(o.join(c, o("o_custkey") === c("c_custkey"), "left_anti").count() === 0L)
  }

  test("all embeddings have exactly 64 dimensions") {
    assert(Tables.load(spark, sf, "embeddings")
      .filter(size(col("embedding")) =!= 64).count() === 0L)
  }

  test("events.ts physical type is a known generation and loads as TIMESTAMP_NTZ") {
    import org.apache.spark.sql.types.{LongType, TimestampNTZType}
    // The driver has regenerated events.parquet with different ts
    // encodings across rounds (timestamp[ns] → read as BIGINT under
    // nanosAsLong; timestamp[us] → read as TIMESTAMP_NTZ). Tables.load
    // handles both; anything else is a NEW generation this repo has
    // never seen — fail here, in one named test, instead of in the 59
    // downstream query families that consume events.ts.
    Tables.tune(spark)
    val raw = spark.read.parquet(s"$sf/events.parquet")
    val physical = raw.schema("ts").dataType
    assert(physical == LongType || physical == TimestampNTZType,
      s"events.ts arrived as $physical — driver regenerated testdata with an unknown ts encoding; update Tables.load")
    val loaded = Tables.load(spark, sf, "events")
    assert(loaded.schema("ts").dataType == TimestampNTZType,
      s"Tables.load must normalize events.ts to TIMESTAMP_NTZ, got ${loaded.schema("ts").dataType}")
    // and the values must actually be readable (plan-time type errors
    // surface on action, not on schema inspection)
    assert(loaded.select(min("ts"), max("ts")).collect().head.get(0) != null)
  }

  test("Tables.load legacy nanos-era events branch still truncates exactly") {
    // The regenerated testdata is µs-era, so the LongType branch of
    // Tables.load (ns-era parquet read as BIGINT under nanosAsLong)
    // would otherwise go untested until a driver regen flips back.
    // Synthesize an events.parquet whose ts is epoch-NANOS int64 and
    // load it through the real path.
    import spark.implicits._
    import org.apache.spark.sql.types.TimestampNTZType
    val dir = java.nio.file.Files.createTempDirectory("graft_nsera").toString
    val ns = 1700000000L * 1000000000L + 123456789L // ...123456.789µs
    Seq((1L, ns), (2L, ns + 210L)) // .789µs + 210ns = .999µs: SAME µs
      .toDF("event_id", "ts")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val loaded = Tables.load(spark, dir, "events")
    assert(loaded.schema("ts").dataType == TimestampNTZType)
    val micros = loaded.orderBy("event_id")
      .select(expr("unix_micros(cast(ts as timestamp))")).collect().map(_.getLong(0))
    assert(micros(0) === ns / 1000L, "ns must truncate (not round) to µs")
    assert(micros(0) === micros(1), "sub-µs difference must truncate away")
  }

  test("events span 30 days with the documented type domain") {
    val ev = Tables.load(spark, sf, "events")
    val types = ev.select("event_type").distinct().collect().map(_.getString(0)).toSet
    assert(types === Set("click", "error", "purchase", "signup", "view"))
  }
}
