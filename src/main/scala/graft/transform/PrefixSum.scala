package graft.transform

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed prefix aggregation (running total / running max) — the
  * scale-safe replacement for
  * `sum(...).over(Window.partitionBy(group).orderBy(order))`.
  *
  * A window partitioned by a low-cardinality group (e.g. language) — or not
  * partitioned at all — funnels every row of each group through ONE task: at
  * 100 TB that is a single executor sorting terabytes. This operator is the
  * classic two-pass distributed prefix scan instead:
  *
  *   1. range-partition the rows on (group..., order...) — contiguous key
  *      ranges, parallelism = the full shuffle-partition count, never one
  *      task per group;
  *   2. aggregate per-(partition, group) value totals — a tiny frame
  *      (#partitions x #groups rows);
  *   3. turn the totals into per-partition starting offsets with an
  *      exclusive scan over that tiny frame (per group, in partition
  *      order);
  *   4. broadcast the offsets back and finish with a scan WITHIN each
  *      range partition (window on (partition-id, group) — each window
  *      group is one range-partition's slice, bounded by partition size,
  *      not by group size).
  *
  * The ranged, partition-tagged frame is pinned with a lazy
  * `localCheckpoint` INSIDE the operator: the `spark_partition_id()` tag is
  * materialized into the cached rows exactly once, so every consumer — the
  * two internal passes, and any number of downstream branches fanning off
  * the result — reads the same frozen tag as plain data. Without the pin,
  * correctness silently depended on Catalyst exchange reuse: two separately
  * planned instances of the range exchange (different column pruning, AQE
  * re-planning) could in principle disagree on partition ids, and r7's q298
  * showed three downstream branches re-running the upstream scan 3x. A lost
  * cached block fails the job rather than silently recomputing — exactly
  * the failure mode we want for a nondeterministic tag.
  *
  * The composite `orderCols` key must be unique within each group (ties
  * could straddle a range boundary and make the running total among tied
  * rows partition-dependent).
  *
  * NULL semantics match the single-pass window exactly: a running sum whose
  * whole preceding frame is empty (first row under `exclusive = true`) or
  * all-NULL yields NULL, not 0; running max likewise. Output dtype is the
  * dtype of `sum(valueCol)` over the input (for decimals: input precision
  * +10 capped at 38), identical to the window it replaces.
  */
object PrefixSum {

  /** The fold carried by the scan: ordinary running sum, or running max
    * (any commutative semigroup whose per-partition combine is the same
    * operator works with the identical two-pass shape). */
  sealed trait RunKind
  case object RunSum extends RunKind
  case object RunMax extends RunKind

  /** Adds `cumCol` = running sum of `valueCol` per `groupCols` group in
    * `orderCol` order (inclusive of the current row). Column order of `df`
    * is preserved; `cumCol` is appended. */
  def groupedRunningSum(df: DataFrame, groupCols: Seq[String], orderCol: String,
                        valueCol: String, cumCol: String): DataFrame =
    groupedRunningAggs(df, groupCols, Seq(col(orderCol)),
      Seq(valueCol -> cumCol), RunSum)

  /** Ungrouped (corpus-global) running sums over one ordered pass:
    * each `(valueCol, cumCol)` pair appends an inclusive running total. */
  def runningSums(df: DataFrame, orderCols: Seq[Column],
                  values: Seq[(String, String)]): DataFrame =
    groupedRunningAggs(df, Nil, orderCols, values, RunSum)

  /** Appends `rnCol` = 1-based dense position of each row in `orderCols`
    * order within its `groupCols` group (== `row_number()` because the
    * order key is required unique) as BIGINT — without a single-partition
    * global sort. */
  def rowNumber(df: DataFrame, groupCols: Seq[String], orderCols: Seq[Column],
                rnCol: String): DataFrame = {
    requireNamespace(df)
    val one = "__psum_one"
    groupedRunningAggsImpl(df.withColumn(one, lit(1L)), groupCols, orderCols,
      Seq(one -> rnCol), RunSum)
      .drop(one)
  }

  /** General form: appends, for every `(valueCol, cumCol)` pair, the
    * running `kind`-fold of `valueCol` per `groupCols` group in
    * `orderCols` order. All folds share ONE range exchange and one tiny
    * offsets frame — adding value columns is free. `exclusive = true`
    * folds strictly-preceding rows only (sum AND max: NULL for each
    * group's first row — matching a
    * `rowsBetween(unboundedPreceding, -1)` window exactly). */
  def groupedRunningAggs(df: DataFrame, groupCols: Seq[String],
                         orderCols: Seq[Column], values: Seq[(String, String)],
                         kind: RunKind = RunSum,
                         exclusive: Boolean = false): DataFrame = {
    requireNamespace(df)
    groupedRunningAggsImpl(df, groupCols, orderCols, values, kind, exclusive)
  }

  private def requireNamespace(df: DataFrame): Unit =
    require(!df.columns.exists(_.startsWith("__psum")),
      "PrefixSum reserves the __psum* column namespace")

  private def groupedRunningAggsImpl(df: DataFrame, groupCols: Seq[String],
                                     orderCols: Seq[Column],
                                     values: Seq[(String, String)],
                                     kind: RunKind,
                                     exclusive: Boolean = false): DataFrame = {
    require(values.nonEmpty, "at least one (valueCol, cumCol) pair")
    require(orderCols.nonEmpty, "at least one order column")
    val outCols = df.columns.filterNot(_ == "__psum_one").map(col)
    val gcols = groupCols.map(col)
    // Lazy checkpoint = the partition tag is computed once and frozen as
    // data; every consumer (both passes here, any downstream fan-out)
    // reads the same materialization. See the class scaladoc.
    val ranged = df
      .repartitionByRange((gcols ++ orderCols): _*)
      .withColumn("__psum_pid", spark_partition_id())
      .localCheckpoint(eager = false)
    def fold(c: Column): Column = kind match {
      case RunSum => sum(c)
      case RunMax => max(c)
    }
    // pass 1: per-(range-partition, group) totals — #partitions x #groups rows
    val totalAggs = values.zipWithIndex.map { case ((v, _), i) =>
      fold(col(v)).as(s"__psum_t$i")
    }
    val partTotals = ranged
      .groupBy((col("__psum_pid") +: gcols): _*)
      .agg(totalAggs.head, totalAggs.tail: _*)
    // exclusive scan over the tiny totals frame = each partition's offset
    val wOff = Window.partitionBy(gcols: _*).orderBy(col("__psum_pid"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = values.indices.foldLeft(partTotals) { (d, i) =>
      d.withColumn(s"__psum_o$i", fold(col(s"__psum_t$i")).over(wOff))
    }.drop(values.indices.map(i => s"__psum_t$i"): _*)
    // pass 2: within-partition scan + broadcast offset = global running fold
    val wIn = Window
      .partitionBy((col("__psum_pid") +: gcols): _*)
      .orderBy(orderCols: _*)
      .rowsBetween(Window.unboundedPreceding, if (exclusive) -1 else 0)
    // NULL-SAFE join back on the group keys: a plain equi-join would drop
    // every row whose group key is NULL, whereas the windows above (and
    // the single-pass Window this replaces) treat NULL as its own group.
    val offR = groupCols.foldLeft(
        offsets.withColumnRenamed("__psum_pid", "__psum_pid_r")) {
      (d, c) => d.withColumnRenamed(c, s"__psum_g_$c")
    }
    val cond = groupCols
      .map(c => col(c) <=> col(s"__psum_g_$c"))
      .foldLeft(col("__psum_pid") === col("__psum_pid_r"))(_ && _)
    val joined = ranged.join(broadcast(offR), cond)
    val withCums = values.zipWithIndex.foldLeft(joined) {
      case (d, ((v, cumCol), i)) =>
        val off = col(s"__psum_o$i")
        val within = fold(col(v)).over(wIn)
        val cum = kind match {
          case RunSum =>
            // dtype of a plain windowed sum over the INPUT column — not the
            // offsets frame's sum-of-sums, which widens narrow decimals a
            // second time (+20 digits instead of the window's +10)
            val sumType =
              df.select(sum(col(v)).as("__psum_s")).schema("__psum_s").dataType
            val zero = lit(0).cast(sumType)
            // window semantics: NULL only when the whole frame is empty
            // (exclusive first row) or all-NULL; otherwise a NULL-skipping
            // sum of the two halves
            when(within.isNull && off.isNull, lit(null).cast(sumType))
              .otherwise((coalesce(within, zero) + coalesce(off, zero))
                .cast(sumType))
          case RunMax =>
            greatest(within, off) // greatest skips NULLs (first offset,
                                  // and the first row's exclusive frame)
        }
        d.withColumn(cumCol, cum)
    }
    withCums.select((outCols ++ values.map(p => col(p._2))): _*)
  }
}
