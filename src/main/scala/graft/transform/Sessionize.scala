package graft.transform

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Gap-based sessionization (batch form of a session window).
  *
  * A new session starts when the gap to the previous event of the same key
  * exceeds `gapMicros`. Session ids are a running sum of session-start
  * flags — one shuffle on the key, one ordered pass per key partition.
  * The streaming equivalent lives in graft.streaming (session windows /
  * flatMapGroupsWithState).
  */
object Sessionize {

  def byGap(df: DataFrame, key: String, ts: String, gapMicros: Long,
            tiebreak: String): DataFrame = {
    val w = Window.partitionBy(col(key)).orderBy(col(ts).asc, col(tiebreak).asc)
    val tsUs = unix_micros(col(ts))
    val prevUs = lag(tsUs, 1).over(w)
    df.withColumn("__new_session",
        when(prevUs.isNull || (tsUs - prevUs) > lit(gapMicros), 1L).otherwise(0L))
      .withColumn("session_seq",
        sum(col("__new_session")).over(w.rowsBetween(Window.unboundedPreceding, 0)))
      .drop("__new_session")
  }

  /** Aggregate per (key, session): bounds + event count + value sum. */
  def sessions(df: DataFrame, key: String, ts: String, gapMicros: Long,
               tiebreak: String): DataFrame =
    byGap(df, key, ts, gapMicros, tiebreak)
      .groupBy(col(key), col("session_seq"))
      .agg(
        min(unix_micros(col(ts))).as("session_start_us"),
        max(unix_micros(col(ts))).as("session_end_us"),
        count(lit(1)).as("n_events"))
}
