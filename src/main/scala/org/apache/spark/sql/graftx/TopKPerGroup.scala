// Hosted under org.apache.spark.sql for the private[sql] plan/session
// bridges (classic.Dataset.ofRows, ExpressionUtils) — see
// CosineSimilarity.scala for the rationale.
package org.apache.spark.sql.graftx

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, Expression, RowOrdering, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning, UnspecifiedDistribution}
import org.apache.spark.sql.classic.{Dataset, ExpressionUtils, SparkSession}
import org.apache.spark.sql.execution.{SparkPlan, UnaryExecNode}

/** Whole-operator extension point (SURVEY.md §7 preference order c):
  * a custom LogicalPlan + planner Strategy + SparkPlan pair, injected
  * through `SparkSessionExtensions.injectPlannerStrategy` — grouped
  * top-k without the sort Spark's own plan pays.
  *
  * `row_number() OVER (PARTITION BY g ORDER BY o) <= k` plans as
  * Exchange(g) → **Sort(g, o) of every row** → Window → Filter: the
  * sort is O(n log n) per partition, buffers the full partition (spill
  * at scale), and every input row crosses the exchange. This operator
  * keeps a bounded k-heap per group instead — O(n log k), no sort
  * buffer — and runs TWICE like a hash aggregate: a PARTIAL pass
  * before the exchange cuts each partition's contribution to ≤ k rows
  * per group, so the shuffle moves ≤ k·partitions rows per group
  * rather than all of them; the FINAL pass after the
  * `ClusteredDistribution` exchange merges the survivors exactly.
  * That partial-combine is the piece no window rewrite can express —
  * windows are all-or-nothing per partition key.
  *
  * Memory contract (documented, like hash aggregate pre-spill): state
  * is (groups-in-partition × k) row copies; k is small by construction
  * and the partial pass bounds the final pass's input, but a
  * pathological groups-per-partition × k product should spill — this
  * implementation doesn't, it is the no-spill regime operator.
  *
  * Determinism: callers must pass a TOTAL ordering (tie-break column
  * included), same as every judged query's ORDER BY contract.
  */
case class TopKPerGroupNode(
    groupExprs: Seq[Expression],
    ordering: Seq[SortOrder],
    k: Int,
    child: LogicalPlan) extends UnaryNode {
  require(k >= 1, s"k must be >= 1, got $k")
  require(groupExprs.nonEmpty, "need at least one grouping expression")
  override def output: Seq[Attribute] = child.output
  override def maxRows: Option[Long] = child.maxRows
  override protected def withNewChildInternal(
      newChild: LogicalPlan): TopKPerGroupNode = copy(child = newChild)
}

/** Plans [[TopKPerGroupNode]] as final(exchange(partial(child))) — the
  * exchange materializes from the final exec's required distribution,
  * exactly how partial/final hash aggregation is assembled. */
object TopKPerGroupStrategy
    extends org.apache.spark.sql.execution.SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerGroupNode(g, ord, k, child) =>
      TopKPerGroupExec(g, ord, k, partial = false,
        TopKPerGroupExec(g, ord, k, partial = true, planLater(child))) :: Nil
    case _ => Nil
  }
}

case class TopKPerGroupExec(
    groupExprs: Seq[Expression],
    ordering: Seq[SortOrder],
    k: Int,
    partial: Boolean,
    child: SparkPlan) extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output
  override def outputPartitioning: Partitioning = child.outputPartitioning
  override def requiredChildDistribution: Seq[Distribution] =
    if (partial) UnspecifiedDistribution :: Nil
    else ClusteredDistribution(groupExprs) :: Nil
  override def nodeName: String =
    if (partial) "TopKPerGroupPartial" else "TopKPerGroupFinal"

  override protected def doExecute(): RDD[InternalRow] = {
    val groupE = groupExprs
    val orderE = ordering
    val out = output
    val kk = k
    child.execute().mapPartitionsInternal { iter =>
      val keyProj = UnsafeProjection.create(groupE, out)
      val ord = RowOrdering.create(orderE, out)
      // per group, a max-heap w.r.t. sort position: the root is the
      // WORST kept row, evicted when a better candidate arrives
      val worstFirst = new java.util.Comparator[InternalRow] {
        override def compare(a: InternalRow, b: InternalRow): Int =
          ord.compare(b, a)
      }
      val heaps = new java.util.LinkedHashMap[UnsafeRow,
        java.util.PriorityQueue[InternalRow]]()
      while (iter.hasNext) {
        val row = iter.next()
        val key = keyProj(row)
        var heap = heaps.get(key)
        if (heap == null) {
          heap = new java.util.PriorityQueue[InternalRow](kk, worstFirst)
          heaps.put(key.copy(), heap)
        }
        if (heap.size() < kk) {
          heap.add(row.copy())
        } else if (ord.compare(row, heap.peek()) < 0) {
          heap.poll()
          heap.add(row.copy())
        }
      }
      // emit each group's survivors in sort order (first-sorted first):
      // deterministic output, and the final pass gets presorted runs
      val groups = heaps.values().iterator()
      new Iterator[InternalRow] {
        private var current: Iterator[InternalRow] = Iterator.empty
        override def hasNext: Boolean = {
          while (!current.hasNext && groups.hasNext) {
            val arr = groups.next().toArray(Array.empty[InternalRow])
            java.util.Arrays.sort(arr, ord)
            current = arr.iterator
          }
          current.hasNext
        }
        override def next(): InternalRow = current.next()
      }
    }
  }

  override protected def withNewChildInternal(
      newChild: SparkPlan): TopKPerGroupExec = copy(child = newChild)
}

object TopKPerGroup {
  /** `topKPerGroup(df, Seq($"g"), Seq($"v".desc, $"id"), k)` — rows of
    * `df` ranking in the first k of their group under `orderBy` (which
    * must totally order rows for a deterministic result). */
  def apply(df: DataFrame, groupCols: Seq[Column], orderBy: Seq[Column],
      k: Int): DataFrame = {
    val spark = df.sparkSession.asInstanceOf[SparkSession]
    // EAGER Column→catalyst conversion (session.expression): the lazy
    // ExpressionUtils wrapper is a ColumnNode placeholder that a `.desc`
    // SortOrder must not be re-wrapped around — the session converter
    // returns a real catalyst SortOrder for sort columns.
    val groupExprs = groupCols.map(spark.expression)
    val sortOrders = orderBy.map(c => spark.expression(c) match {
      case so: SortOrder => so
      case e => SortOrder(e, Ascending)
    })
    Dataset.ofRows(spark,
      TopKPerGroupNode(groupExprs, sortOrders, k,
        df.queryExecution.analyzed))
  }
}
