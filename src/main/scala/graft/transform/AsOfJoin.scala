package graft.transform

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join: for every left row, the newest right row with
  * `right.ts <= left.ts` on the same key (time-series point-in-time
  * semantics — quotes-for-trades, latest-config-for-event).
  *
  * Absent from both the reference and Spark's built-ins (SURVEY.md §2C
  * lists as-of among the missing join types). Implemented Spark-first as
  * the UNION + ordered-window pattern rather than a custom SparkPlan:
  * both sides are tagged and unioned, one hash shuffle on the key, one
  * in-partition sort by (ts, side), then `last(right_payload, ignoreNulls)`
  * over the unbounded-preceding frame carries the newest right row forward
  * into each left row. No range explosion, no per-row probe: cost is the
  * same one shuffle + sort a sort-merge join would pay, at any scale, and
  * skew handling falls out of AQE like any other shuffle.
  */
object AsOfJoin {

  /** Left as-of join. Right columns (minus key/ts) are carried into the
    * left rows as `prefix<col>`; left rows with no prior right row get
    * nulls. Ties (equal ts) take the right row (<=  semantics), resolved
    * deterministically by `rightTiebreak` (max wins). */
  def leftAsOf(left: DataFrame, right: DataFrame, key: String,
               leftTs: String, rightTs: String,
               rightTiebreak: String, prefix: String = "asof_"): DataFrame = {
    val rightPayloadCols = right.columns.filterNot(c => c == key || c == rightTs)
    // one struct column carries the whole right payload through the window;
    // tiebreak leads so `last` picks the max-tiebreak row among equal ts
    val rightPacked = right.select(
      col(key), col(rightTs).as("__ts"),
      struct((col(rightTiebreak).as("__tb") +:
        rightPayloadCols.map(col(_))): _*).as("__payload"))
    val leftTagged = left.withColumn("__ts", col(leftTs))
      .withColumn("__side", lit(1))
      .withColumn("__payload", lit(null).cast(rightPacked.schema("__payload").dataType))
    val rightTagged = rightPacked
      .withColumn("__side", lit(0))
      .select((left.columns.map(c =>
        if (c == key) col(key) else lit(null).cast(left.schema(c).dataType).as(c))
        :+ col("__ts") :+ col("__side") :+ col("__payload")): _*)

    val unioned = leftTagged.unionByName(rightTagged)
    // right rows sort before left rows at equal ts (side 0 < 1), so `<=`
    // holds; among equal-ts right rows the later __tb wins via sort order
    val w = Window.partitionBy(col(key))
      .orderBy(col("__ts").asc, col("__side").asc, col("__payload.__tb").asc_nulls_first)
      .rowsBetween(Window.unboundedPreceding, 0)
    unioned
      .withColumn("__carried", last(col("__payload"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .select((left.columns.map(col) ++
        rightPayloadCols.map(c => col(s"__carried.$c").as(s"$prefix$c"))): _*)
  }
}
