package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * One entry per implemented operator from SURVEY.md §2; oracleSql
  * carries the DuckDB-runnable twin for every SQL-expressible query
  * (column names aliased identically on both sides — the driver's
  * compare is name-sorted).
  */
object SparkEntry {

  /** Flagship query (TPC-H Q1 shape, SURVEY §2 D2) on sf0.001;
    * driver smoke-checks rows > 0.
    */
  def entry(spark: SparkSession): DataFrame =
    AggQueries.queries("agg_groupby")(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    ScanQueries.queries ++
      FilterQueries.queries ++
      JoinQueries.queries ++
      AggQueries.queries ++
      WindowQueries.queries ++
      SortQueries.queries ++
      SetQueries.queries ++
      ScalarFnQueries.queries ++
      UdfQueries.queries ++
      LlmQueries.queries ++
      TextQueries.queries ++
      CurationQueries.queries ++
      PrepQueries.queries ++
      MultimodalQueries.queries ++
      ScaleQueries.queries ++
      SubqueryQueries.queries ++
      PipelineQueries.queries ++
      OlapQueries.queries ++
      TpchQueries.queries ++
      StatsQueries.queries ++
      ProfileQueries.queries ++
      LakehouseQueries.queries ++
      FeatureQueries.queries ++
      AnalyticsQueries.queries ++
      RuntimeQueries.queries ++
      SequenceQueries.queries ++
      RobustQueries.queries ++
      IntervalQueries.queries ++
      ReportQueries.queries ++
      RetrievalQueries.queries ++
      CboQueries.queries ++
      graft.streaming.StreamQueries.queries

  def oracleSql: Map[String, String] =
    ScanQueries.oracle ++
      FilterQueries.oracle ++
      JoinQueries.oracle ++
      AggQueries.oracle ++
      WindowQueries.oracle ++
      SortQueries.oracle ++
      SetQueries.oracle ++
      ScalarFnQueries.oracle ++
      UdfQueries.oracle ++
      LlmQueries.oracle ++
      TextQueries.oracle ++
      CurationQueries.oracle ++
      PrepQueries.oracle ++
      MultimodalQueries.oracle ++
      ScaleQueries.oracle ++
      SubqueryQueries.oracle ++
      PipelineQueries.oracle ++
      OlapQueries.oracle ++
      TpchQueries.oracle ++
      StatsQueries.oracle ++
      ProfileQueries.oracle ++
      LakehouseQueries.oracle ++
      FeatureQueries.oracle ++
      AnalyticsQueries.oracle ++
      RuntimeQueries.oracle ++
      SequenceQueries.oracle ++
      RobustQueries.oracle ++
      IntervalQueries.oracle ++
      ReportQueries.oracle ++
      RetrievalQueries.oracle ++
      CboQueries.oracle ++
      graft.streaming.StreamQueries.oracle
}
