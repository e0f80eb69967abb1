package graft.transform

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed prefix sum (running total) — the scale-safe replacement for
  * `sum(...).over(Window.partitionBy(group).orderBy(order))`.
  *
  * A window partitioned by a low-cardinality group (e.g. language) funnels
  * every row of each group through ONE task: at 100 TB that is a single
  * executor sorting terabytes. This operator is the classic two-pass
  * distributed prefix sum instead:
  *
  *   1. range-partition the rows on (group..., order) — contiguous key
  *      ranges, parallelism = the full shuffle-partition count, never one
  *      task per group;
  *   2. aggregate per-(partition, group) value totals — a tiny frame
  *      (#partitions x #groups rows);
  *   3. turn the totals into per-partition starting offsets with an
  *      exclusive cumsum over that tiny frame (per group, in partition
  *      order);
  *   4. broadcast the offsets back and finish with a cumsum WITHIN each
  *      range partition (window on (partition-id, group) — each window
  *      group is one range-partition's slice, bounded by partition size,
  *      not by group size).
  *
  * Both passes reference the same range exchange, so Spark's exchange reuse
  * executes it once and the `spark_partition_id()` tag is consistent across
  * the two consumers (single query execution, one shuffle materialization).
  *
  * `orderCol` must be unique within each group (ties could straddle a range
  * boundary and make the running total among tied rows partition-dependent).
  */
object PrefixSum {

  /** Adds `cumCol` = running sum of `valueCol` per `groupCols` group in
    * `orderCol` order (inclusive of the current row). Column order of `df`
    * is preserved; `cumCol` is appended. */
  def groupedRunningSum(df: DataFrame, groupCols: Seq[String], orderCol: String,
                        valueCol: String, cumCol: String): DataFrame = {
    require(!df.columns.exists(_.startsWith("__psum")),
      "groupedRunningSum reserves the __psum* column namespace")
    val gcols = groupCols.map(col)
    val ranged = df
      .repartitionByRange((gcols :+ col(orderCol)): _*)
      .withColumn("__psum_pid", spark_partition_id())
    // pass 1: per-(range-partition, group) totals — #partitions x #groups rows
    val partTotals = ranged
      .groupBy((col("__psum_pid") +: gcols): _*)
      .agg(sum(col(valueCol)).as("__psum_total"))
    // exclusive cumsum over the tiny totals frame = each partition's offset
    val wOff = Window.partitionBy(gcols: _*).orderBy(col("__psum_pid"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = partTotals
      .withColumn("__psum_off",
        coalesce(sum(col("__psum_total")).over(wOff), lit(0L).cast("bigint")))
      .drop("__psum_total")
    // pass 2: within-partition cumsum + broadcast offset = global running sum
    val wIn = Window
      .partitionBy((col("__psum_pid") +: gcols): _*)
      .orderBy(col(orderCol))
      .rowsBetween(Window.unboundedPreceding, 0)
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
    ranged
      .join(broadcast(offR), cond)
      .withColumn(cumCol, sum(col(valueCol)).over(wIn) + col("__psum_off"))
      .select((df.columns.map(col) :+ col(cumCol)): _*)
  }
}
