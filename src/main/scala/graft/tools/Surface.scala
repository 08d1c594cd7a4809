package graft.tools

import graft.SparkEntry

/** Dev tool: print query/oracle counts and any oracle keys without a
  * matching query (drift detector for the driver contract).
  */
object Surface {
  def main(args: Array[String]): Unit = {
    val q = SparkEntry.queries
    val o = SparkEntry.oracleSql
    println(s"queries=${q.size} oracles=${o.size}")
    val orphans = o.keySet.diff(q.keySet)
    if (orphans.nonEmpty) println(s"ORPHAN_ORACLES=${orphans.mkString(",")}")
    val noOracle = q.keySet.diff(o.keySet).toSeq.sorted
    println(s"no_oracle(${noOracle.size})=${noOracle.mkString(",")}")
  }
}
