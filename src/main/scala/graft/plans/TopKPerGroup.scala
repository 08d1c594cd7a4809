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
    child: LogicalPlan,
    maxPartialGroups: Int = TopKPerGroup.DefaultMaxPartialGroups) extends UnaryNode {
  require(k > 0, s"topKPerGroup needs k > 0, got $k")
  require(groupExprs.nonEmpty,
    "topKPerGroup needs at least one group column; for a global top-k " +
      "use df.orderBy(...).limit(k), which Spark already plans as TakeOrderedAndProject")
  override def output: Seq[Attribute] = child.output
  override def maxRows: Option[Long] = child.maxRows
  override protected def withNewChildInternal(newChild: LogicalPlan): TopKPerGroup =
    copy(child = newChild)
}

object TopKPerGroup {
  /** Partial-phase group-cap default: ~128k groups × k rows bounds the
    * map-side heap table to executor-memory scale whatever the data's
    * group cardinality; groups past the cap stream through unpruned
    * (correct by the partial/final algebra, just unoptimized).
    */
  val DefaultMaxPartialGroups: Int = 1 << 17
}

/** Plans [[TopKPerGroup]] as partial + final [[TopKPerGroupExec]].
  * Registered per-session via `experimental.extraStrategies`
  * ([[graft.api.GraftOps.topKPerGroup]] does this lazily) or
  * cluster-wide via [[graft.GraftExtensions]] (`injectPlannerStrategy`).
  */
object TopKPerGroupStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerGroup(g, o, k, child, cap) =>
      // Float/double group keys get -0.0/NaN bit patterns canonicalized
      // here: Spark's NormalizeFloatingNumbers rule covers its own
      // Aggregate/Window/Join keys but never visits this custom node,
      // and both the exchange hash and the exec's UnsafeRow group map
      // compare keys bytewise.
      val ng = g.map(org.apache.spark.sql.graft.GraftSqlInternals.normalizeFloatingNumbers)
      TopKPerGroupExec(ng, o, k, partial = false, cap,
        TopKPerGroupExec(ng, o, k, partial = true, cap, planLater(child))) :: Nil
    case _ => Nil
  }
}

/** Bounded per-group heap selection. `partial = true` runs on the
  * child's existing partitioning (map-side prune); `partial = false`
  * declares ClusteredDistribution on the group keys so EnsureRequirements
  * inserts the single hash exchange between the two phases.
  *
  * Memory: one k-row heap per distinct group key per partition. The
  * PARTIAL phase is hard-capped at `maxPartialGroups` heaps — rows of
  * groups beyond the cap stream through unpruned (correct: the final
  * phase recomputes exact top-k; only the shuffle-payload optimization
  * degrades), so map-side memory is bounded whatever the data looks
  * like. The FINAL phase must hold every group of its reduce
  * partition (groups / shuffle-partitions × k rows) — the same
  * distributed-memory model as hash aggregation; size
  * `spark.sql.shuffle.partitions` to the group count as you would for
  * a group-by.
  */
case class TopKPerGroupExec(
    groupExprs: Seq[Expression],
    order: Seq[SortOrder],
    k: Int,
    partial: Boolean,
    maxPartialGroups: Int,
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
    val isPartial = partial
    val groupCap = maxPartialGroups
    child.execute().mapPartitions({ iter =>
      val groupProj = UnsafeProjection.create(groupE, childOutput)
      val ord: Ordering[InternalRow] =
        RowOrdering.create(orderE, childOutput).asInstanceOf[Ordering[InternalRow]]
      // java PriorityQueue as a max-heap on the sort order: head is the
      // WORST row currently kept, so admission is one compare.
      val heaps = new java.util.HashMap[UnsafeRow, java.util.PriorityQueue[InternalRow]]()
      import scala.jdk.CollectionConverters._
      def admit(heap: java.util.PriorityQueue[InternalRow], row: InternalRow): Unit =
        if (heap.size < kLocal) heap.add(row.copy())
        else if (ord.compare(row, heap.peek()) < 0) {
          heap.poll(); heap.add(row.copy())
        }
      // Hot path: allocation-free while loop until the partial-phase
      // group cap is hit (never, for the final phase and for sane group
      // cardinalities). Past the cap, rows of UNSEEN groups stream out
      // unpruned (O(1) memory) while rows of capped groups keep
      // pruning; heap contents follow once the input is exhausted
      // (`++` rhs is by-name, so `heaps` is fully built by then).
      var overflow: InternalRow = null
      // `overflow == null` MUST be checked BEFORE `iter.hasNext`, and
      // the overflow row MUST be copied (round-13 fix, caught by the
      // sf1 probe as one wrong group in 150k): a WholeStageCodegen
      // child's `hasNext` PRODUCES the next row into its shared
      // UnsafeRow buffer, so evaluating `iter.hasNext` after capturing
      // the cap-crossing row overwrote it with the following row — the
      // overflow row silently became a duplicate of its successor and
      // its group could lose a true top-k member. Row counts stayed
      // right, values didn't; only a >cap-group dataset (sf1) could
      // catch it.
      while (overflow == null && iter.hasNext) {
        val row = iter.next()
        val key = groupProj(row)
        var heap = heaps.get(key)
        if (heap == null) {
          if (isPartial && heaps.size >= groupCap) overflow = row.copy()
          else {
            heap = new java.util.PriorityQueue[InternalRow](kLocal + 1, ord.reverse)
            heaps.put(key.copy(), heap)
            admit(heap, row)
          }
        } else admit(heap, row)
      }
      val streamed: Iterator[InternalRow] =
        if (overflow == null) Iterator.empty
        else (Iterator.single(overflow) ++ iter).flatMap { row =>
          val heap = heaps.get(groupProj(row))
          if (heap == null) { numOutputRows.add(1L); Iterator.single(row) }
          else { admit(heap, row); Iterator.empty }
        }
      streamed ++ heaps.values.asScala.iterator.flatMap { h =>
        numOutputRows.add(h.size.toLong)
        h.iterator().asScala
      }
    }, preservesPartitioning = true)
  }

  override protected def withNewChildInternal(newChild: SparkPlan): TopKPerGroupExec =
    copy(child = newChild)
}
