package graft.plans

import java.io.{BufferedInputStream, BufferedOutputStream, DataInputStream, DataOutputStream, EOFException, File, FileInputStream, FileOutputStream}

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.TaskContext
import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.{Attribute, Expression, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.codegen.GenerateOrdering
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.plans.physical.{AllTuples, ClusteredDistribution, Distribution}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}
import org.apache.spark.sql.execution.metric.SQLMetrics

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
  * #keys x k rows.
  *
  * MEMORY BOUND: the heap map holds at most
  * `spark.graft.topk.spillThreshold` retained rows per partition (default
  * 2^20). Past that — key cardinality in the hundreds of millions at
  * 100 TB would otherwise OOM where the slow sort-based window completes —
  * the partition falls back to an external merge sort on
  * (key bytes, ordering): already-retained heap rows plus all remaining
  * input rows are written as sorted size-bounded runs to local temp files,
  * k-way merged, and the first k rows per key emitted from the streaming
  * merge. Peak memory in fallback mode is one run (≤ threshold rows)
  * regardless of input size; spill files are deleted at task completion.
  * The `spilledPartitions` / `spilledRows` SQLMetrics make the fallback
  * observable in the UI and pinnable in specs.
  */
case class TopKPerKeyNode(keys: Seq[Expression], ordering: Seq[SortOrder],
                          k: Int, child: LogicalPlan) extends UnaryNode {
  require(k > 0, "k must be positive")
  override def output: Seq[Attribute] = child.output
  override protected def withNewChildInternal(newChild: LogicalPlan): TopKPerKeyNode =
    copy(child = newChild)
}

/** Planner strategy: injected via GraftExtensions.injectPlannerStrategy.
  * Reads the spill threshold from the session conf at planning time. */
object TopKPerKeyStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerKeyNode(keys, ordering, k, child) =>
      val threshold = org.apache.spark.sql.internal.SQLConf.get
        .getConfString("spark.graft.topk.spillThreshold", (1 << 20).toString)
        .toInt
      TopKPerKeyExec(keys, ordering, k, threshold, planLater(child)) :: Nil
    case _ => Nil
  }
}

/** Physical exec: requires clustering on `keys` (EnsureRequirements adds
  * the hash exchange), then one pass per partition maintaining a bounded
  * max-heap per key — head is the worst kept row, so a better row swaps in
  * O(log k). Emits each key's rows in `ordering` order. When the heap map
  * would retain more than `spillThreshold` rows, the partition falls back
  * to a spill-to-disk external sort (see [[TopKPerKeyNode]] scaladoc). */
case class TopKPerKeyExec(keys: Seq[Expression], ordering: Seq[SortOrder],
                          k: Int, spillThreshold: Int,
                          child: SparkPlan) extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output
  override def outputPartitioning = child.outputPartitioning

  override lazy val metrics = Map(
    "spilledPartitions" -> SQLMetrics.createMetric(sparkContext,
      "partitions that fell back to external sort"),
    "spilledRows" -> SQLMetrics.createMetric(sparkContext,
      "rows written to spill files"))

  override def requiredChildDistribution: Seq[Distribution] =
    if (keys.isEmpty) AllTuples :: Nil else ClusteredDistribution(keys) :: Nil

  override protected def doExecute(): RDD[InternalRow] = {
    val schema = child.output
    val keyExprs = keys
    val sortExprs = ordering
    val limit = k
    val threshold = math.max(spillThreshold, limit + 1)
    val spilledPartitions = longMetric("spilledPartitions")
    val spilledRows = longMetric("spilledRows")
    child.execute().mapPartitions({ iter =>
      val keyProj = UnsafeProjection.create(keyExprs, schema)
      val rowOrd = GenerateOrdering.generate(sortExprs, schema)
      // max-heap: head = worst (largest in sort order) kept row
      val heapCmp = rowOrd.reverse.asInstanceOf[java.util.Comparator[InternalRow]]
      val heaps = new java.util.HashMap[UnsafeRow, java.util.PriorityQueue[InternalRow]]()
      var held = 0L
      var breached = false
      while (iter.hasNext && !breached) {
        val row = iter.next()
        val key = keyProj(row)
        var heap = heaps.get(key)
        if (heap == null) {
          heap = new java.util.PriorityQueue[InternalRow](limit + 1, heapCmp)
          heaps.put(key.copy(), heap)
        }
        if (heap.size() < limit) {
          heap.add(row.copy())
          held += 1
          if (held > threshold) breached = true
        } else if (rowOrd.compare(row, heap.peek()) < 0) {
          heap.poll()
          heap.add(row.copy())
        }
      }
      if (!breached) {
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
      } else {
        spilledPartitions.add(1)
        TopKPerKeyExec.externalTopK(heaps, iter, keyProj, rowOrd, limit,
          threshold, schema, spilledRows)
      }
    }, preservesPartitioning = true)
  }

  override protected def withNewChildInternal(newChild: SparkPlan): TopKPerKeyExec =
    copy(child = newChild)
}

object TopKPerKeyExec {
  import org.apache.spark.sql.catalyst.expressions.BaseOrdering
  import org.apache.spark.sql.execution.metric.SQLMetric

  /** One spill run file read back as a stream of (key bytes, row). Each
    * record re-materializes into its own byte[], so emitted rows stay
    * valid after the reader advances. */
  private final class SpillReader(f: File, numFields: Int) {
    private val in = new DataInputStream(
      new BufferedInputStream(new FileInputStream(f), 1 << 16))
    var curKey: Array[Byte] = _
    var curRow: UnsafeRow = _
    def advance(): Boolean = {
      val keyLen = try in.readInt() catch {
        case _: EOFException => in.close(); return false
      }
      curKey = new Array[Byte](keyLen)
      in.readFully(curKey)
      val rowLen = in.readInt()
      val rowBytes = new Array[Byte](rowLen)
      in.readFully(rowBytes)
      val r = new UnsafeRow(numFields)
      r.pointTo(rowBytes, rowLen)
      curRow = r
      true
    }
  }

  /** Spill-mode evaluation: external merge sort on (key bytes, ordering),
    * then a streaming scan emitting the first `limit` rows per key. The
    * heap phase already pruned every row it rejected (strictly worse than
    * k retained rows of its key — provably not in the answer), so the sort
    * input is retained-heap rows + remaining input only. Grouping order is
    * unsigned-lexicographic on the UnsafeRow key bytes — any total order
    * with (equal keys ⇔ equal bytes) works for grouping, and UnsafeRow
    * equality IS byte equality. */
  private[plans] def externalTopK(
      heaps: java.util.HashMap[UnsafeRow, java.util.PriorityQueue[InternalRow]],
      rest: Iterator[InternalRow],
      keyProj: UnsafeProjection,
      rowOrd: BaseOrdering,
      limit: Int,
      runSize: Long,
      schema: Seq[Attribute],
      spilledRows: SQLMetric): Iterator[InternalRow] = {
    val numFields = schema.length
    val toUnsafe = UnsafeProjection.create(schema, schema)
    def asUnsafe(row: InternalRow): UnsafeRow = row match {
      case u: UnsafeRow => u
      case r            => toUnsafe(r)
    }
    def cmp(ka: Array[Byte], ra: InternalRow,
            kb: Array[Byte], rb: InternalRow): Int = {
      val c = java.util.Arrays.compareUnsigned(ka, kb)
      if (c != 0) c else rowOrd.compare(ra, rb)
    }

    val files = ArrayBuffer.empty[File]
    Option(TaskContext.get()).foreach(_.addTaskCompletionListener[Unit] { _ =>
      files.foreach(f => if (f.exists()) f.delete())
    })

    val run = ArrayBuffer.empty[(Array[Byte], UnsafeRow)]
    def flush(): Unit = if (run.nonEmpty) {
      val sorted = run.sortWith((a, b) => cmp(a._1, a._2, b._1, b._2) < 0)
      val f = File.createTempFile("graft-topk-", ".spill")
      files += f
      val out = new DataOutputStream(
        new BufferedOutputStream(new FileOutputStream(f), 1 << 16))
      try sorted.foreach { case (kb, row) =>
        out.writeInt(kb.length); out.write(kb)
        val rb = row.getBytes
        out.writeInt(rb.length); out.write(rb)
      } finally out.close()
      spilledRows.add(run.size)
      run.clear()
    }
    def add(kb: Array[Byte], row: UnsafeRow): Unit = {
      run += ((kb, row))
      if (run.size >= runSize) flush()
    }

    val he = heaps.entrySet().iterator()
    while (he.hasNext) {
      val e = he.next()
      val kb = e.getKey.getBytes
      val hit = e.getValue.iterator()
      while (hit.hasNext) add(kb, asUnsafe(hit.next()).copy())
      he.remove()
    }
    while (rest.hasNext) {
      val row = rest.next()
      // keyProj reuses its buffer and getBytes returns that LIVE array when
      // the backing array is exactly row-sized — copy() first so every run
      // entry owns its key bytes (aliasing here corrupts the run sort).
      add(keyProj(row).copy().getBytes, asUnsafe(row).copy())
    }
    flush()

    val readers = files.toArray.map(new SpillReader(_, numFields))
    val pq = new java.util.PriorityQueue[SpillReader](
      math.max(readers.length, 1),
      (a: SpillReader, b: SpillReader) => cmp(a.curKey, a.curRow, b.curKey, b.curRow))
    readers.foreach(r => if (r.advance()) pq.add(r))

    new Iterator[InternalRow] {
      private var lastKey: Array[Byte] = null
      private var emitted = 0
      private var nextRow: InternalRow = null
      private def computeNext(): Unit = {
        nextRow = null
        while (nextRow == null && !pq.isEmpty) {
          val r = pq.poll()
          val kb = r.curKey
          val row = r.curRow
          if (r.advance()) pq.add(r)
          if (lastKey == null || !java.util.Arrays.equals(lastKey, kb)) {
            lastKey = kb
            emitted = 0
          }
          if (emitted < limit) { emitted += 1; nextRow = row }
        }
      }
      computeNext()
      override def hasNext: Boolean = nextRow != null
      override def next(): InternalRow = {
        val r = nextRow; computeNext(); r
      }
    }
  }
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
