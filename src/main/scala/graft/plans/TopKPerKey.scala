package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.{Attribute, Ascending, Expression, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.codegen.GenerateOrdering
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{AllTuples, ClusteredDistribution, Distribution}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}

/** Per-key top-k as a first-class operator: logical node + planner
  * strategy + heap-based physical exec — the deepest Spark extension point
  * ((c) in SURVEY §2's custom-operator ladder), used where composition
  * can't express the efficient plan.
  *
  * The composable spelling (`row_number().over(window) <= k`) SORTS every
  * key group (sort-based window exec: full shuffle + per-partition sort of
  * ALL rows). This operator keeps a size-k binary heap per key instead:
  * same one shuffle on the keys, but per-partition work drops from
  * O(n log n) to O(n log k) and memory from the whole partition to
  * #keys x k rows — the difference between "spills at 100 TB" and "never
  * materializes more than the answer".
  */
case class TopKPerKeyNode(keys: Seq[Expression], ordering: Seq[SortOrder],
                          k: Int, child: LogicalPlan) extends UnaryNode {
  require(k > 0, "k must be positive")
  override def output: Seq[Attribute] = child.output
  override protected def withNewChildInternal(newChild: LogicalPlan): TopKPerKeyNode =
    copy(child = newChild)
}

/** Planner strategy: injected via GraftExtensions.injectPlannerStrategy. */
object TopKPerKeyStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerKeyNode(keys, ordering, k, child) =>
      TopKPerKeyExec(keys, ordering, k, planLater(child)) :: Nil
    case _ => Nil
  }
}

/** Physical exec: requires clustering on `keys` (EnsureRequirements adds
  * the hash exchange), then one pass per partition maintaining a bounded
  * max-heap per key — head is the worst kept row, so a better row swaps in
  * O(log k). Emits each key's rows in `ordering` order. */
case class TopKPerKeyExec(keys: Seq[Expression], ordering: Seq[SortOrder],
                          k: Int, child: SparkPlan) extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output
  override def outputPartitioning = child.outputPartitioning

  override def requiredChildDistribution: Seq[Distribution] =
    if (keys.isEmpty) AllTuples :: Nil else ClusteredDistribution(keys) :: Nil

  override protected def doExecute(): RDD[InternalRow] = {
    val schema = child.output
    val keyExprs = keys
    val sortExprs = ordering
    val limit = k
    child.execute().mapPartitions({ iter =>
      val keyProj = UnsafeProjection.create(keyExprs, schema)
      val rowOrd = GenerateOrdering.generate(sortExprs, schema)
      // max-heap: head = worst (largest in sort order) kept row
      val heapCmp = rowOrd.reverse.asInstanceOf[java.util.Comparator[InternalRow]]
      val heaps = new java.util.HashMap[UnsafeRow, java.util.PriorityQueue[InternalRow]]()
      while (iter.hasNext) {
        val row = iter.next()
        val key = keyProj(row)
        var heap = heaps.get(key)
        if (heap == null) {
          heap = new java.util.PriorityQueue[InternalRow](limit + 1, heapCmp)
          heaps.put(key.copy(), heap)
        }
        if (heap.size() < limit) heap.add(row.copy())
        else if (rowOrd.compare(row, heap.peek()) < 0) {
          heap.poll()
          heap.add(row.copy())
        }
      }
      val out = scala.collection.mutable.ArrayBuffer.empty[InternalRow]
      val it = heaps.values().iterator()
      while (it.hasNext) {
        val heap = it.next()
        val rows = new Array[InternalRow](heap.size())
        var i = rows.length - 1
        while (i >= 0) { rows(i) = heap.poll(); i -= 1 } // drain worst-first
        out ++= rows
      }
      out.iterator
    }, preservesPartitioning = true)
  }

  override protected def withNewChildInternal(newChild: SparkPlan): TopKPerKeyExec =
    copy(child = newChild)
}

object TopKPerKey {
  import org.apache.spark.sql.catalyst.expressions.Alias
  import org.apache.spark.sql.catalyst.plans.logical.{Project, Sort}
  import org.apache.spark.sql.graft.bridge

  /** DataFrame API: first `k` rows per `keys` group in `order` (use
    * `.desc`/`.asc` on the columns). Equivalent to
    * `row_number().over(Window.partitionBy(keys).orderBy(order)) <= k`
    * but heap-based — see [[TopKPerKeyNode]].
    *
    * Columns resolve through the standard analyzer (a throwaway
    * sort/select over `df`), so the custom node is built from fully
    * resolved expressions bound to the analyzed child — a raw Column in a
    * custom node would stay an unevaluable ColumnNode wrapper in Spark 4. */
  def topKPerKey(df: DataFrame, keys: Seq[Column], order: Seq[Column],
                 k: Int): DataFrame = {
    // self-contained in any session: register the strategy idempotently
    // (GraftExtensions also injects it for spark.sql.extensions users)
    val cs = df.sparkSession.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    if (!cs.experimental.extraStrategies.contains(TopKPerKeyStrategy))
      cs.experimental.extraStrategies =
        TopKPerKeyStrategy +: cs.experimental.extraStrategies
    val sortPlan = df.sort(order: _*).queryExecution.analyzed match {
      case s: Sort => s
      case other => throw new IllegalArgumentException(
        s"order columns did not analyze to a Sort: ${other.nodeName}")
    }
    val keyExprs = df.select(keys: _*).queryExecution.analyzed match {
      case p: Project => p.projectList.map {
        case a: Alias => a.child
        case e        => e
      }
      case other => throw new IllegalArgumentException(
        s"key columns did not analyze to a Project: ${other.nodeName}")
    }
    bridge.ofRows(df.sparkSession,
      TopKPerKeyNode(keyExprs, sortPlan.order, k, sortPlan.child))
  }
}
