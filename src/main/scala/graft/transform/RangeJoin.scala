package graft.transform

import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.functions._

/** Range (interval) joins without the quasi-cartesian: the inequality
  * predicate is banded into an equi-join key, so Spark shuffles on
  * (key, time-bucket) instead of nested-looping over each key group.
  * (§2C lists range/interval among the join types absent from the
  * reference; same banding idea as q29's length-tolerance join.)
  */
object RangeJoin {

  /** Self-join: pairs of rows with the same `key` whose `ts` values lie
    * within `maxGapMicros` of each other (idCol_a < idCol_b). Left side
    * explodes into its bucket ±1, so any qualifying pair lands in exactly
    * one equi-match (bucket width == gap bounds |bucket diff| <= 1).
    * Output: key, id_a, id_b, gap_us (signed b-a). */
  def pairsWithinGap(df: DataFrame, key: String, ts: String, idCol: String,
                     maxGapMicros: Long): DataFrame = {
    val a = df.select(col(key), col(idCol).as("id_a"),
      unix_micros(col(ts)).as("us_a"))
      .withColumn("__bucket", explode(array(
        floor(col("us_a") / maxGapMicros) - 1,
        floor(col("us_a") / maxGapMicros),
        floor(col("us_a") / maxGapMicros) + 1)))
    val b = df.select(col(key), col(idCol).as("id_b"),
      unix_micros(col(ts)).as("us_b"))
      .withColumn("__bucket", floor(col("us_b") / maxGapMicros))
    a.join(b, Seq(key, "__bucket"))
      .filter(col("id_a") < col("id_b") &&
        abs(col("us_b") - col("us_a")) <= maxGapMicros)
      .select(col(key), col("id_a"), col("id_b"),
        (col("us_b") - col("us_a")).as("gap_us"))
  }

  /** Point-in-interval join: left rows land in right intervals
    * [loCol, hiCol] on the same key. Intervals explode into the buckets
    * they overlap; points carry one bucket. Interval width should be
    * O(bucketMicros) for the fan-out to stay bounded. */
  def pointInInterval(points: DataFrame, intervals: DataFrame, key: String,
                      ptTs: String, loCol: String, hiCol: String,
                      bucketMicros: Long): DataFrame = {
    val p = points.withColumn("__bucket",
      floor(unix_micros(col(ptTs)) / bucketMicros))
    val iv = intervals.withColumn("__bucket", explode(sequence(
      floor(unix_micros(col(loCol)) / bucketMicros),
      floor(unix_micros(col(hiCol)) / bucketMicros))))
    p.join(iv, Seq(key, "__bucket"))
      .filter(col(ptTs) >= col(loCol) && col(ptTs) <= col(hiCol))
      .drop("__bucket")
  }
}
