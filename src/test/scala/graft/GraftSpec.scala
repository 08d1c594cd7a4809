package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.scalatest.funsuite.AnyFunSuite

/** Shared session fixture: one SparkSession per JVM, pinned UTC,
  * small shuffle-partition count for test speed.
  */
object TestSession {
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    Tables.tune(s)
  }
  val sf: String = "/root/testdata/sf0.001"
}

abstract class GraftSpec extends AnyFunSuite {
  protected lazy val spark: SparkSession = TestSession.spark
  protected val sf: String = TestSession.sf
  protected def q(name: String): DataFrame =
    SparkEntry.queries(name)(spark, sf)

  /** Plan-text subtree scoping: the column where a tree line's node
    * label starts (child lines indent deeper) — shared by the
    * broadcast-subtree assertions so the parsing heuristic lives in
    * one place.
    */
  protected def nodeStart(l: String): Int = {
    val i = l.indexWhere(c => !" :+-".contains(c))
    if (i < 0) Int.MaxValue else i
  }
}
