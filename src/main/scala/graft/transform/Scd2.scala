package graft.transform

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** SCD Type-2 history build + CDC apply.
  *
  * The reference only sketches these in prose (`schemas/music_school/cdc/
  * README.md` "Silver Layer (Future)": op=c insert, op=u close+insert,
  * op=d soft delete, valid_from/valid_to/is_current columns). Implemented
  * here as declarative window transforms: one shuffle on the business key.
  */
object Scd2 {

  /** 9999-12-31 00:00:00 UTC in epoch micros — open-ended validity marker. */
  val HighDateMicros: Long = 253402214400000000L

  /** Build an SCD2 dimension from a full change history: each version row
    * gets [valid_from, valid_to) micros and an is_current flag. */
  def fromHistory(df: DataFrame, key: Seq[String], ts: String,
                  tiebreak: Seq[String] = Seq.empty): DataFrame = {
    val ord = (col(ts) +: tiebreak.map(col)).map(_.asc)
    val w = Window.partitionBy(key.map(col): _*).orderBy(ord: _*)
    df.withColumn("valid_from_us", unix_micros(col(ts)))
      .withColumn("valid_to_us",
        coalesce(unix_micros(lead(col(ts), 1).over(w)), lit(HighDateMicros)))
      .withColumn("is_current", col("valid_to_us") === lit(HighDateMicros))
  }

  /** Apply a CDC stream to produce current state: latest op per key wins;
    * keys whose latest op is a delete drop out. Op column values follow the
    * Debezium convention the reference ingests (c/u/d,
    * `/root/reference/schemas/music_school/cdc/v1.json`). */
  def cdcLatestState(df: DataFrame, key: Seq[String], ts: String,
                     opCol: String, deleteOp: String = "d",
                     tiebreak: Seq[String] = Seq.empty): DataFrame = {
    val ord = (col(ts).desc +: tiebreak.map(col(_).desc))
    val latest = Dedup.latestByKey(df, key, ord)
    latest.filter(col(opCol) =!= lit(deleteOp))
  }
}
