package graft

/** SQL-entry parity (SURVEY §3.2): for every operator whose oracle SQL
  * is written in the shared ANSI dialect subset, running that text
  * through `spark.sql` must reproduce the DataFrame implementation's
  * result exactly. Oracles using DuckDB-only functions (list_*,
  * string_split, len, …) fail to parse/analyze and are skipped — the
  * test asserts the shared-dialect set stays large.
  */
class SqlParitySpec extends GraftSpec {

  test("shared-dialect oracle SQL reproduces the DataFrame results via spark.sql") {
    Tables.names.foreach(n => Tables.load(spark, sf, n).createOrReplaceTempView(n))
    var matched = 0
    var skipped = 0
    val diffs = scala.collection.mutable.ListBuffer[String]()
    // scan_events_ns's CAST(ts AS TIMESTAMP) exists to force DuckDB's
    // ns→µs truncation; on the Spark view ts is already µs NTZ and the
    // same cast shifts it to LTZ — deliberately dialect-specific.
    // subq_recursive differs the same way in reverse: the Spark text
    // ends in CAST(m AS TIMESTAMP_NTZ) (a type DuckDB doesn't name),
    // its oracle twin leaves m naive — running the oracle through
    // spark.sql yields LTZ timestamps by design.
    // The streaming twins below emit event-time columns: on the Spark
    // views `ts` is already µs NTZ, so the twin's CAST(ts AS TIMESTAMP)
    // (DuckDB's ns→µs truncation) shifts them to LTZ — same split as
    // scan_events_ns. The id/count-only streaming twins stay in the
    // shared dialect and ARE parity-checked.
    // olap_rank_delta outputs the month boundary itself: the Spark
    // side pins it NTZ (.cast("timestamp_ntz") after date_trunc), the
    // oracle's bare date_trunc stays naive on DuckDB but promotes to
    // LTZ through spark.sql — the same split as scan_events_ns.
    val dialectSpecific = Set("scan_events_ns", "subq_recursive",
      "stream_tumbling", "stream_sliding", "stream_session", "stream_late_drop",
      "olap_rank_delta")
    SparkEntry.oracleSql.toSeq.sortBy(_._1)
      .filterNot(kv => dialectSpecific(kv._1)).foreach { case (name, sql) =>
      val viaSql =
        try Some(spark.sql(sql).collect().toSeq)
        catch { case _: Throwable => None } // DuckDB-only dialect
      viaSql match {
        case None => skipped += 1
        case Some(rows) =>
          val viaDf = SparkEntry.queries(name)(spark, sf).collect().toSeq
          // compare as strings: literal-type width (int vs bigint) may
          // differ between the two Spark paths; values must not
          if (rows.map(_.toString) == viaDf.map(_.toString)) matched += 1
          else diffs += name
      }
    }
    assert(diffs.isEmpty, s"spark.sql vs DataFrame mismatch: $diffs")
    assert(matched >= 25, s"shared-dialect coverage shrank: only $matched oracles are Spark-runnable (skipped $skipped)")
  }
}
