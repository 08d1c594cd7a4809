package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, Expression, RowOrdering, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning, UnspecifiedDistribution}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}
import org.apache.spark.sql.execution.metric.{SQLMetric, SQLMetrics}

/** Whole-operator Catalyst extension showcase (SURVEY §4 tier (c)):
  * top-k rows per group as a first-class logical node + planner
  * strategy + physical operator, instead of the `row_number()` window
  * formulation.
  *
  * Why it earns a custom operator: the window formulation materializes
  * and SORTS every group in full (WindowExec buffers a whole partition,
  * SortExec pays n·log n and spills at scale) only to discard all but k
  * rows. This operator keeps a bounded heap of k rows per group and
  * runs TWICE — once map-side before the exchange (a partition's local
  * top-k is a superset of its contribution to the global top-k, the
  * same algebra that makes partial aggregation sound), once after — so
  * the shuffle carries at most `k × groups-per-partition` rows, not the
  * corpus, and nothing is ever globally sorted. At 100 TB this is the
  * difference between shuffling ~everything (window) and shuffling
  * `k × |groups|` rows.
  *
  * Semantics: returns the child's rows (schema unchanged) that rank in
  * the first k of their group under `order`; output row order is
  * unspecified, like any unsorted relational result. Callers needing
  * determinism make `order` total per group (tie-break on a key
  * column) — same contract as `row_number`. Null ordering follows
  * Spark's SortOrder defaults (ASC → nulls first, DESC → nulls last);
  * note DuckDB's defaults are the mirror image, so oracle SQL spells
  * NULLS FIRST/LAST explicitly when order columns are nullable.
  */
case class TopKPerGroup(
    groupExprs: Seq[Expression],
    order: Seq[SortOrder],
    k: Int,
    child: LogicalPlan) extends UnaryNode {
  require(k > 0, s"topKPerGroup needs k > 0, got $k")
  override def output: Seq[Attribute] = child.output
  override def maxRows: Option[Long] = child.maxRows
  override protected def withNewChildInternal(newChild: LogicalPlan): TopKPerGroup =
    copy(child = newChild)
}

/** Plans [[TopKPerGroup]] as partial + final [[TopKPerGroupExec]].
  * Registered per-session via `experimental.extraStrategies`
  * ([[graft.api.GraftOps.topKPerGroup]] does this lazily) or
  * cluster-wide via [[graft.GraftExtensions]] (`injectPlannerStrategy`).
  */
object TopKPerGroupStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerGroup(g, o, k, child) =>
      TopKPerGroupExec(g, o, k, partial = false,
        TopKPerGroupExec(g, o, k, partial = true, planLater(child))) :: Nil
    case _ => Nil
  }
}

/** Bounded per-group heap selection. `partial = true` runs on the
  * child's existing partitioning (map-side prune); `partial = false`
  * declares ClusteredDistribution on the group keys so EnsureRequirements
  * inserts the single hash exchange between the two phases.
  *
  * Memory: one k-row heap per distinct group key per partition —
  * heap rows and map keys are copied out of the scan's reused row
  * buffers, everything else streams.
  */
case class TopKPerGroupExec(
    groupExprs: Seq[Expression],
    order: Seq[SortOrder],
    k: Int,
    partial: Boolean,
    child: SparkPlan) extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output
  override def outputPartitioning: Partitioning = child.outputPartitioning
  override def nodeName: String =
    if (partial) "TopKPerGroupPartial" else "TopKPerGroupFinal"

  override def requiredChildDistribution: Seq[Distribution] =
    if (partial) UnspecifiedDistribution :: Nil
    else ClusteredDistribution(groupExprs) :: Nil

  override lazy val metrics: Map[String, SQLMetric] = Map(
    "numOutputRows" -> SQLMetrics.createMetric(sparkContext, "number of output rows"))

  protected override def doExecute(): RDD[InternalRow] = {
    val childOutput = child.output
    val numOutputRows = longMetric("numOutputRows")
    val kLocal = k
    val groupE = groupExprs
    val orderE = order
    child.execute().mapPartitions({ iter =>
      val groupProj = UnsafeProjection.create(groupE, childOutput)
      val ord: Ordering[InternalRow] =
        RowOrdering.create(orderE, childOutput).asInstanceOf[Ordering[InternalRow]]
      // java PriorityQueue as a max-heap on the sort order: head is the
      // WORST row currently kept, so admission is one compare.
      val heaps = new java.util.HashMap[UnsafeRow, java.util.PriorityQueue[InternalRow]]()
      while (iter.hasNext) {
        val row = iter.next()
        val key = groupProj(row)
        var heap = heaps.get(key)
        if (heap == null) {
          heap = new java.util.PriorityQueue[InternalRow](kLocal + 1, ord.reverse)
          heaps.put(key.copy(), heap)
        }
        if (heap.size < kLocal) heap.add(row.copy())
        else if (ord.compare(row, heap.peek()) < 0) {
          heap.poll(); heap.add(row.copy())
        }
      }
      import scala.jdk.CollectionConverters._
      heaps.values.asScala.iterator.flatMap { h =>
        numOutputRows.add(h.size.toLong)
        h.iterator().asScala
      }
    }, preservesPartitioning = true)
  }

  override protected def withNewChildInternal(newChild: SparkPlan): TopKPerGroupExec =
    copy(child = newChild)
}
