package graft.plans

import scala.collection.mutable

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, Expression, RowOrdering, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning, UnspecifiedDistribution}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}

/** Grouped top-k as a first-class operator: logical plan + planner
  * strategy + physical plan, registered through
  * `SparkSessionExtensions`/`experimental.extraStrategies` — the
  * "whole-operator" extension path (SURVEY §2 preference ladder (c)),
  * demonstrated on an operator where it genuinely beats composition.
  *
  * The composable form (`row_number().over(window) <= k`) sorts every
  * partition fully: O(n log n) per group and the whole group's rows
  * shuffle. This operator keeps a k-bounded heap per group — O(n log k)
  * — in TWO phases: a partial pass on each input partition cuts every
  * partition's contribution to ≤ k rows per group BEFORE the shuffle
  * (the heap analogue of map-side partial aggregation), then a final
  * pass after clustering by the group keys. At 100 TB the shuffle
  * carries ≤ k·partitions rows per group instead of the full table.
  *
  * Top-k = the first k rows of each group under `order` (exactly
  * `row_number() OVER (PARTITION BY group ORDER BY order) <= k`); ties
  * beyond the order columns are arbitrary, so callers wanting
  * determinism end `order` with a unique key, as with row_number.
  *
  * Memory bound: the partial phase FLUSHES its heap map whenever it
  * holds more than `graft.topk.maxPartialGroups` groups (session conf,
  * default 65536) — emitting the current heaps downstream and starting
  * fresh. Correctness is unaffected (the final phase merges all partial
  * fragments of a group after the shuffle), so partial-phase memory is
  * ≤ maxPartialGroups × k rows even when one input partition sees
  * millions of distinct groups; each flush just forfeits some pre-
  * shuffle pruning (≤ k rows per group PER FLUSH cross the wire). The
  * FINAL phase holds NO group map at all: it requires its (already
  * k·partitions-pruned) input sorted within partitions on
  * (group, order) — EnsureRequirements plans a SortExec, which spills
  * through UnsafeExternalSorter — and streams a first-k-per-run
  * counter in O(1) heap. No group cardinality can overflow an
  * executor in either phase (the same partial-heap + sorted-final
  * shape as Spark's own WindowGroupLimit rank-limit pushdown).
  */
final case class GroupedTopKPlan(
    groupExprs: Seq[Expression],
    order: Seq[SortOrder],
    k: Int,
    child: LogicalPlan) extends UnaryNode {
  override def output: Seq[Attribute] = child.output
  override protected def withNewChildInternal(newChild: LogicalPlan): GroupedTopKPlan =
    copy(child = newChild)
}

object GroupedTopKStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case g: GroupedTopKPlan =>
      // partial-phase group-map bound; the final phase streams sorted
      // group runs and keeps no group map (flushGroups unused there)
      val flushGroups = SparkSession.getActiveSession
        .flatMap(s => scala.util.Try(
          s.conf.get("graft.topk.maxPartialGroups").toInt).toOption)
        .getOrElse(65536)
      val partial =
        GroupedTopKExec(g.groupExprs, g.order, g.k, partial = true,
          flushGroups, planLater(g.child))
      GroupedTopKExec(g.groupExprs, g.order, g.k, partial = false,
        Int.MaxValue, partial) :: Nil
    case _ => Nil
  }
}

/** Two-phase top-k. `partial = true` runs a bounded-heap pass on raw
  * input partitions (no distribution requirement), cutting each
  * partition's contribution to ≤ k rows per group. The final phase
  * requires clustering on the group keys AND a within-partition sort
  * on (group, order) — EnsureRequirements inserts the one shuffle (of
  * the pruned partial output) plus a spillable SortExec — and then
  * emits the first k rows of each sorted group run with a plain
  * counter: O(1) memory regardless of group cardinality. */
final case class GroupedTopKExec(
    groupExprs: Seq[Expression],
    order: Seq[SortOrder],
    k: Int,
    partial: Boolean,
    flushGroups: Int,
    child: SparkPlan) extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output

  // Group keys normalized (NaN canonical, -0.0 → 0.0) in BOTH the
  // distribution and the heap key: the optimizer's
  // NormalizeFloatingNumbers rule only rewrites built-in operators, so
  // without this 0.0 and -0.0 would hash-partition and bucket as two
  // groups where the window form sees one.
  private def normalizedGroup: Seq[Expression] =
    groupExprs.map(GroupedTopK.normalizeFloats)

  override def requiredChildDistribution: Seq[Distribution] =
    if (partial) Seq(UnspecifiedDistribution)
    else Seq(ClusteredDistribution(normalizedGroup))

  /** Final phase streams sorted group runs, so it asks for the
    * within-partition (group, order) sort — planned as a SortExec,
    * which spills; the sorted property also flows downstream. */
  private def finalOrdering: Seq[SortOrder] =
    normalizedGroup.map(e => SortOrder(e, Ascending)) ++ order

  override def requiredChildOrdering: Seq[Seq[SortOrder]] =
    if (partial) Seq(Nil) else Seq(finalOrdering)

  override def outputOrdering: Seq[SortOrder] =
    if (partial) child.outputOrdering else finalOrdering

  override def outputPartitioning: Partitioning = child.outputPartitioning

  protected override def doExecute(): RDD[InternalRow] =
    if (partial) doExecutePartial() else doExecuteFinal()

  /** First k of every sorted (group, order) run — a counter over the
    * spill-sorted input, no per-group state. */
  private def doExecuteFinal(): RDD[InternalRow] = {
    val childOutput = child.output
    val (g, limit) = (normalizedGroup, k)
    child.execute().mapPartitions { iter =>
      val groupProj = UnsafeProjection.create(g, childOutput)
      var currentGroup: UnsafeRow = null
      var emitted = 0
      iter.filter { row =>
        val key = groupProj(row)
        if (currentGroup == null || currentGroup != key) {
          currentGroup = key.copy()
          emitted = 0
        }
        emitted += 1
        emitted <= limit
      }
    }
  }

  private def doExecutePartial(): RDD[InternalRow] = {
    val childOutput = child.output
    val (g, o, limit, maxGroups) = (normalizedGroup, order, k, flushGroups)
    child.execute().mapPartitions { iter =>
      val groupProj = UnsafeProjection.create(g, childOutput)
      val rowOrd = RowOrdering.create(o, childOutput)
      // PriorityQueue dequeues the MAX under rowOrd = the worst of the
      // kept k (rowOrd already encodes per-column direction, so "first
      // k rows in sort order" = "k least rows under rowOrd").
      val heaps = mutable.LinkedHashMap.empty[UnsafeRow, mutable.PriorityQueue[InternalRow]]
      def insert(row: InternalRow): Unit = {
        val heap = heaps.getOrElseUpdate(groupProj(row).copy(),
          mutable.PriorityQueue.empty[InternalRow](rowOrd))
        if (heap.size < limit) heap.enqueue(row.copy())
        else if (rowOrd.compare(row, heap.head) < 0) {
          heap.dequeue()
          heap.enqueue(row.copy())
        }
      }
      def drain(): Iterator[InternalRow] = {
        val vs = heaps.values.toArray // snapshot: heaps map is reused
        heaps.clear()
        vs.iterator.flatMap(_.iterator)
      }
      // Streams flushes instead of building one giant map: whenever the
      // group map exceeds the bound, current heaps are emitted and the
      // map restarts. The final phase's sorted merge makes fragments
      // per group safe.
      new Iterator[InternalRow] {
        private var out: Iterator[InternalRow] = Iterator.empty
        override def hasNext: Boolean = {
          while (!out.hasNext && (iter.hasNext || heaps.nonEmpty)) {
            if (!iter.hasNext) out = drain()
            else {
              insert(iter.next())
              if (heaps.size > maxGroups) out = drain()
            }
          }
          out.hasNext
        }
        override def next(): InternalRow = {
          if (!hasNext) throw new NoSuchElementException("empty iterator")
          out.next()
        }
      }
    }
  }

  override protected def withNewChildInternal(newChild: SparkPlan): GroupedTopKExec =
    copy(child = newChild)
}

object GroupedTopK {

  private[plans] def normalizeFloats(e: Expression): Expression =
    e.dataType match {
      case org.apache.spark.sql.types.FloatType |
           org.apache.spark.sql.types.DoubleType =>
        org.apache.spark.sql.catalyst.optimizer.NormalizeNaNAndZero(e)
      case _ => e
    }

  /** First k rows per group under `orderCols` (use `.desc`/`.asc`
    * Columns; bare Columns sort ascending). Registers the planner
    * strategy on the session idempotently, so externally-built sessions
    * work without `spark.sql.extensions`. */
  def topK(df: DataFrame, groupCols: Seq[Column], orderCols: Seq[Column],
      k: Int): DataFrame = {
    require(k > 0, "k must be positive")
    ensureRegistered(df.sparkSession)
    val g = groupCols.map(GraftBridge.catalystExpression)
    val o = orderCols.map(c => GraftBridge.catalystExpression(c) match {
      case s: SortOrder => s
      case e => SortOrder(e, Ascending)
    })
    GraftBridge.ofRows(df.sparkSession,
      GroupedTopKPlan(g, o, k, df.queryExecution.analyzed))
  }

  def ensureRegistered(spark: SparkSession): Unit =
    if (!spark.experimental.extraStrategies.contains(GroupedTopKStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ GroupedTopKStrategy
}
