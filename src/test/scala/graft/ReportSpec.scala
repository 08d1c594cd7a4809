package graft

/** Family Z invariants (composition reports): conservation laws tie
  * the reports back to their inputs.
  */
class ReportSpec extends GraftSpec {

  test("sessionize_hist conserves both sessions and events") {
    import org.apache.spark.sql.functions._
    val rows = q("sessionize_hist").collect()
    assert(rows.nonEmpty)
    val events = Tables.load(spark, sf, "events").count()
    // sum(k * sessions-with-k-events) == total events
    val eventsFromHist = rows.map(r => r.getAs[Long]("n") * r.getAs[Long]("n_sessions")).sum
    assert(eventsFromHist == events, s"histogram loses events: $eventsFromHist != $events")
    // session count matches the sessionizer's own output
    val sessions = q("sessionize_batch").count()
    assert(rows.map(_.getAs[Long]("n_sessions")).sum == sessions)
  }

  test("corpus_quality_sweep: bands partition docs, cumulative column is a suffix sum") {
    val rows = q("corpus_quality_sweep").collect().sortBy(_.getAs[Long]("band"))
    val docs = Tables.load(spark, sf, "documents").count()
    assert(rows.map(_.getAs[Long]("n_docs")).sum == docs, "bands must partition the corpus")
    rows.foreach(r => assert(r.getAs[Long]("band") >= 0 && r.getAs[Long]("band") <= 9))
    // cum(band) = sum of n_tokens over bands >= band
    val byBand = rows.map(r => r.getAs[Long]("band") -> r.getAs[Long]("n_tokens")).toMap
    rows.foreach { r =>
      val b = r.getAs[Long]("band")
      val expected = byBand.filter(_._1 >= b).values.sum
      assert(r.getAs[Long]("cum_tokens_at_or_above") == expected, s"bad suffix sum at band $b")
    }
  }
}
