package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.tables.Tables
import Parity._

/** Queries exercising the reference's implemented operator surface
  * (SURVEY.md §2A): projection, filters, aggregation, distinct counts.
  * Each entry here has a matching DuckDB oracle in [[graft.Oracles]].
  */
object RefQueries {

  /** Pricing summary (TPC-H Q1 shape): filter + groupBy + exact-decimal
    * aggregates. Scale notes: single scan, map-side partial aggregation on
    * a 6-value grouping key — shuffle is O(groups), not O(rows); the
    * shipdate filter and 5-column projection push down to the parquet scan.
    */
  def q01_agg_summary(spark: SparkSession, dir: String): DataFrame = {
    Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") <= lit(java.sql.Timestamp.valueOf("1998-09-02 00:00:00")))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sumMoney(col("l_quantity")).as("sum_qty"),
        sumMoney(col("l_extendedprice")).as("sum_base_price"),
        sum(dec(col("l_extendedprice")) * (lit(1).cast("decimal(18,2)") - dec(col("l_discount"))))
          .cast("double").as("sum_disc_price"),
        avgMoney(col("l_quantity")).as("avg_qty"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))
  }
}
