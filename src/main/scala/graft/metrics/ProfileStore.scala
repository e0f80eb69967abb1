package graft.metrics

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ByteType, IntegerType, LongType, ShortType, StringType}

/** Mergeable (monoid) per-column table profiles — the incremental
  * complement of [[TableMetrics]]' single-batch observation: profile each
  * ingest batch ONCE as it lands, append the tiny per-batch summary to a
  * parquet state dir, and fold summaries whenever a current profile is
  * needed. The 100 TB property: a table ingested over a year is profiled
  * by touching each byte exactly once at ingest time — the fold input is
  * #batches × #columns rows of metadata, never the data again (the
  * [[graft.similarity.DedupIndex]] lifecycle, for metrics).
  *
  * Every statistic kept is a commutative monoid (counts and sums add,
  * min/max fold by least/greatest, HLL sketches union via Spark's
  * DataSketches builtins), so batch profiles merge associatively in any
  * order — the algebraic property that makes incremental maintenance
  * EXACT for counts/sums/min/max, not an approximation. Comparable
  * stats (min/max) fold in the column's native type and are cast to
  * string only for display, so "10" < "9" string traps can't bite.
  *
  * Storage row: (column, dtype, n_rows, n_null, min_s, max_s, sum_l,
  * hll binary). Integral columns carry exact sums; `n_distinct` is a
  * mergeable HLL sketch (estimate surfaced on read).
  */
object ProfileStore {

  private def isIntegral(dt: org.apache.spark.sql.types.DataType): Boolean =
    dt == LongType || dt == IntegerType || dt == ShortType || dt == ByteType

  /** One aggregate pass over a batch → one profile row per column. */
  def profile(df: DataFrame, columns: Seq[String]): DataFrame = {
    val rows = columns.map { c =>
      val dt = df.schema(c).dataType
      val native = col(c)
      df.agg(
        count(lit(1)).cast("long").as("n_rows"),
        sum(when(native.isNull, 1L).otherwise(0L)).cast("long").as("n_null"),
        min(native).cast("string").as("min_s"),
        max(native).cast("string").as("max_s"),
        (if (isIntegral(dt)) sum(native).cast("long")
         else lit(null).cast("long")).as("sum_l"),
        hll_sketch_agg(native.cast("string")).as("hll"))
        .select(lit(c).as("column"), lit(dt.simpleString).as("dtype"),
          col("n_rows"), col("n_null"), col("min_s"), col("max_s"),
          col("sum_l"), col("hll"))
    }
    rows.reduce(_ unionByName _)
  }

  /** Append a batch profile to the state dir (tiny metadata write). */
  def append(df: DataFrame, columns: Seq[String], stateDir: String): Unit =
    profile(df, columns).write.mode("append").parquet(stateDir)

  /** True iff [[appendAtomic]] fully published batch `batchKey` — the
    * rename-published `batch-<key>` unit exists, or the pointer-mode
    * `_commits/<key>` file does. */
  def batchApplied(spark: SparkSession, stateDir: String,
                   batchKey: String): Boolean = {
    val root = new org.apache.hadoop.fs.Path(stateDir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.exists(new org.apache.hadoop.fs.Path(s"$stateDir/batch-$batchKey")) ||
      graft.core.AppendCommits.isCommitted(fs, root, batchKey)
  }

  /** CRASH-ATOMIC batch append. `publish = "rename"` (POSIX default):
    * the batch's profile rows land as one `batch-<key>` directory moved
    * into place with a single rename, so appliedness ([[batchApplied]])
    * travels inside the published unit. `publish = "pointer"` (object
    * stores without atomic rename): rows land under a deterministic
    * `batch-p-<key>` directory a rerun overwrites in place, and ONE
    * create-no-overwrite `_commits/<key>` file makes them visible —
    * [[current]] never reads an uncommitted pointer unit (see
    * [[graft.core.AppendCommits]]). Either way a crash leaves either
    * nothing visible (the rerun re-profiles) or the whole batch (the
    * rerun skips); no window duplicates a batch's rows in the fold. The
    * maintenance-task twin of [[append]]. */
  def appendAtomic(df: DataFrame, columns: Seq[String], stateDir: String,
                   batchKey: String, publish: String = "rename"): Unit = {
    val spark = df.sparkSession
    val root = new org.apache.hadoop.fs.Path(stateDir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    publish match {
      case "rename" =>
        val tmp = new org.apache.hadoop.fs.Path(s"$stateDir/.tmp-$batchKey")
        val dest = new org.apache.hadoop.fs.Path(s"$stateDir/batch-$batchKey")
        fs.delete(tmp, true)
        profile(df, columns).write.mode("overwrite").parquet(tmp.toString)
        fs.delete(dest, true) // stale partial unit from a crashed attempt
        if (!fs.rename(tmp, dest)) throw new IllegalStateException(
          s"atomic profile publish failed: $tmp -> $dest")
      case "pointer" =>
        val data = s"$stateDir/${graft.core.AppendCommits.PointerPrefix}$batchKey"
        profile(df, columns).write.mode("overwrite").parquet(data)
        graft.core.AppendCommits.commit(fs, root, batchKey)
      case other => throw new IllegalArgumentException(
        s"unknown profile publish mode '$other' (rename/pointer)")
    }
  }

  /** Fold all stored batch profiles into the current table profile.
    * Monoid fold: one #batches×#columns-row aggregate — the data itself
    * is never re-read. Published-unit enumeration covers every layout:
    * [[append]]'s root files, [[appendAtomic]]'s rename-published
    * `batch-<key>` units, and COMMITTED pointer units (an uncommitted or
    * torn `batch-p-*` directory is never read). */
  def current(spark: SparkSession, stateDir: String): DataFrame = {
    val root = new org.apache.hadoop.fs.Path(stateDir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val paths = graft.core.AppendCommits.readablePaths(fs, root,
      graft.core.AppendCommits.committedKeys(fs, root)).map(_.toString)
    if (paths.isEmpty) throw new IllegalStateException(
      s"no published profile batches under $stateDir")
    merge(spark.read.parquet(paths: _*))
  }

  /** Merge profile rows (from any number of batches) by column. min/max
    * compare in the recorded native type; integral sums add exactly. */
  def merge(profiles: DataFrame): DataFrame = {
    val numeric = col("dtype").isin("bigint", "int", "smallint", "tinyint")
    val floatish = col("dtype").isin("double", "float")
      .or(col("dtype").like("decimal%"))
    // fold comparables in native type: integral columns via long cast;
    // float/double/decimal ordered by their double value but KEEPING the
    // recorded string (a struct min/max orders by the numeric key first,
    // so decimal renderings like "10.50" survive the fold un-rewritten
    // and min("10.5","9.5") can never resolve lexicographically);
    // everything else lexicographically (correct for strings; dates and
    // timestamps rendered ISO-style also order lexicographically). The
    // dtype guard sits INSIDE the aggregate so the casts only ever
    // touch matching rows (ANSI cast of 'de' would throw otherwise);
    // a group is single-dtype, so exactly one branch is non-null.
    def keyed(c: Column) = struct(c.cast("double").as("k"), c.as("s"))
    val minNative = coalesce(
      min(when(numeric, col("min_s").cast("long"))).cast("string"),
      min(when(floatish, keyed(col("min_s")))).getField("s"),
      min(when(!numeric && !floatish, col("min_s"))))
    val maxNative = coalesce(
      max(when(numeric, col("max_s").cast("long"))).cast("string"),
      max(when(floatish, keyed(col("max_s")))).getField("s"),
      max(when(!numeric && !floatish, col("max_s"))))
    profiles.groupBy(col("column"), col("dtype"))
      .agg(sum(col("n_rows")).cast("long").as("n_rows"),
        sum(col("n_null")).cast("long").as("n_null"),
        minNative.as("min_s"),
        maxNative.as("max_s"),
        sum(col("sum_l")).cast("long").as("sum_l"),
        hll_union_agg(col("hll")).as("hll"))
  }

  /** Human/driver-facing view: sketch replaced by its estimate. */
  def summary(merged: DataFrame): DataFrame =
    merged.select(col("column"), col("dtype"), col("n_rows"), col("n_null"),
      col("min_s"), col("max_s"), col("sum_l"),
      hll_sketch_estimate(col("hll")).cast("long").as("n_distinct_approx"))
      .orderBy(col("column"))
}
