package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Count-min sketch (Cormode & Muthukrishnan 2005) as Spark aggregates:
  * depth × width counters keyed by the engine-portable [[StableHash]]
  * family (row d hashes `"d:" + token`, so every engine — and the DuckDB
  * oracle — derives identical bucket assignments). The point of the
  * sketch at corpus scale: frequency estimates with depth·width rows of
  * aggregation state instead of a vocabulary-sized hash map, and sketches
  * from disjoint slices MERGE by counter-wise addition (the property the
  * streaming maintenance in [[graft.streaming.StreamOps.cmsBatch]] uses).
  * Estimates are one-sided: est ≥ true count, pinned by q108's oracle.
  */
object CountMinSketch {

  /** Per-row array of (d, b) counter coordinates, one per sketch row. */
  def bucketKeys(tok: Column, depth: Int, width: Int): Column =
    array((0 until depth).map(d =>
      struct(lit(d.toLong).as("d"),
        StableHash.bucket(concat(lit(s"$d:"), tok), width).as("b"))): _*)

  /** Build the sketch: (d, b, cnt) counters via ONE combinable aggregate —
    * partial aggregation caps every map task's output at depth × width
    * rows regardless of token count. */
  def counters(rows: DataFrame, tokenCol: String, depth: Int = 4,
               width: Int = 256): DataFrame =
    rows.select(explode(bucketKeys(col(tokenCol), depth, width)).as("db"))
      .groupBy(col("db.d").as("d"), col("db.b").as("b"))
      .agg(count(lit(1)).as("cnt"))

  /** Point estimates for a (bounded) token set: min over the sketch's
    * rows of the matching counters; the sketch side broadcasts. */
  def estimate(tokens: DataFrame, tokenCol: String, cms: DataFrame,
               depth: Int = 4, width: Int = 256): DataFrame =
    tokens.select(col(tokenCol),
        explode(bucketKeys(col(tokenCol), depth, width)).as("db"))
      .select(col(tokenCol), col("db.d").as("d"), col("db.b").as("b"))
      .join(broadcast(cms), Seq("d", "b"))
      .groupBy(col(tokenCol))
      .agg(min(col("cnt")).cast("long").as("est"))
}
