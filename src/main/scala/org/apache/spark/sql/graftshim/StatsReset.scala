package org.apache.spark.sql.graftshim

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.classic.{Dataset => CDataset}
import org.apache.spark.sql.execution.LogicalRDD

/** Drops the origin statistics/constraints a `checkpoint`/
  * `localCheckpoint` Dataset carries (ref: n/a, SURVEY §0; Spark's own
  * `LogicalRDD.fromDataset` copies the optimized plan's stats into the
  * checkpointed relation so one-shot checkpoints keep their estimates).
  *
  * Why graft needs the opposite for ITERATIVE loops: size-only join
  * estimation multiplies child `sizeInBytes`
  * (`SizeInBytesOnlyStatsPlanVisitor.visitJoin` → product of
  * children), so a Pregel-style loop whose round output feeds the next
  * round's joins COMPOUNDS the BigInt: with two joins per round the
  * bit-length of `sizeInBytes` roughly quadruples every round, and by
  * round ~12 the driver spends MINUTES in `BigInteger.multiply`
  * (ToomCook on 10⁸-bit operands) computing statistics nobody uses —
  * measured this round as a 15-minute hang of a 200k-vertex
  * connected-components test. Checkpoints already erase lineage;
  * erasing the stats with them resets the estimate to the leaf default
  * each round, keeping every stats computation O(plan) with
  * word-sized numbers. AQE re-derives real sizes from runtime shuffle
  * statistics anyway, so plan quality at execution time is unchanged.
  *
  * Lives under `org.apache.spark.sql` because `LogicalRDD` and
  * `Dataset.ofRows` are `private[sql]`; the shim reuses the SAME
  * attributes, RDD, partitioning and ordering — only the two origin
  * fields are cleared.
  */
object StatsReset {
  def apply(df: DataFrame): DataFrame = {
    val ds = df.asInstanceOf[CDataset[Row]]
    val session = ds.sparkSession
    ds.queryExecution.analyzed match {
      case l: LogicalRDD =>
        CDataset.ofRows(session, l.copy()(session, None, None))
      case _ => df // not a checkpoint scan: nothing to strip
    }
  }
}
