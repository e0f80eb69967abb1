package graft.transform

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Silver-layer deduplication (reference declares it as a future capability:
  * `schemas/music_school/cdc/README.md` "Silver Layer (Future)",
  * `docs/00-architecture-overview.md:223-232`; never implemented).
  *
  * Scale notes: `latestByKey` is one hash-shuffle on the key columns; the
  * window scans each partition once (no sort-spill when the per-key group
  * fits memory — keys here are user/entity ids, so groups are tiny). At
  * 100 TB with a skewed key, pre-aggregate with `max_by` instead — provided
  * as `latestByKeyAgg`, which enables partial (map-side) aggregation and is
  * robust to key skew.
  */
object Dedup {

  /** Keep the newest row per key, deterministic via tiebreak columns. */
  def latestByKey(df: DataFrame, keys: Seq[String],
                  orderBy: Seq[Column]): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(orderBy: _*)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }

  /** Agg-based variant: map-side combinable, skew-tolerant. Keeps the row
    * with max (orderCol, tiebreak) per key via max_by on a packed struct. */
  def latestByKeyAgg(df: DataFrame, keys: Seq[String], orderCol: String,
                     tiebreak: String): DataFrame = {
    val payload = struct(df.columns.map(col): _*)
    val ord = struct(col(orderCol), col(tiebreak))
    df.groupBy(keys.map(col): _*)
      .agg(max_by(payload, ord).as("__row"))
      .select(col("__row.*"))
  }

  /** Exact duplicate removal on a full row or column subset. */
  def exact(df: DataFrame, columns: Seq[String] = Seq.empty): DataFrame =
    if (columns.isEmpty) df.distinct() else df.dropDuplicates(columns)

  /** Content dedup: keep one representative (min of `idCol`) per value of
    * `contentHash` (e.g. md5 of normalized text). One shuffle on the hash. */
  def byContentHash(df: DataFrame, contentHash: Column, idCol: String): DataFrame = {
    val payload = struct(df.columns.map(col): _*)
    df.groupBy(contentHash.as("__h"))
      .agg(min_by(payload, col(idCol)).as("__row"), count(lit(1)).as("dup_count"))
      .select(col("__row.*"), col("dup_count"))
  }
}
