package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.tables.Tables
import graft.dq._
import graft.metrics.TableMetrics
import Parity._

/** Data-quality operator queries (reference §2A checks #5-#11, compiled
  * through the single-pass [[graft.dq.DQRuleSet]] engine instead of the
  * reference's scan-per-check loop) plus quarantine (§2B TODO made real).
  */
object DqQueries {

  /** Range check as one-pass aggregate (ref: dq/checks/RangeCheck.scala). */
  def q04_range_check(spark: SparkSession, dir: String): DataFrame =
    DQRuleSet(Seq(RangeCheck("l_quantity", Some(5.0), Some(45.0))))
      .metricsDF(Tables.lineitem(spark, dir))

  /** Null-count check (ref: dq/checks/NotNullCheck.scala) — two columns,
    * still one scan. */
  def q05_notnull_check(spark: SparkSession, dir: String): DataFrame =
    DQRuleSet(Seq(NotNullCheck("o_custkey"), NotNullCheck("o_orderdate")))
      .metricsDF(Tables.orders(spark, dir))

  /** Regex conformance check (ref: dq/checks/RegexCheck.scala). */
  def q06_regex_check(spark: SparkSession, dir: String): DataFrame =
    DQRuleSet(Seq(RegexCheck("c_name", "^Customer#[0-9]{9}$")))
      .metricsDF(Tables.customer(spark, dir))

  /** Composite-key uniqueness (ref: dq/checks/UniqueKeyCheck.scala). */
  def q07_unique_key(spark: SparkSession, dir: String): DataFrame =
    DQRuleSet(Seq(UniqueKeyCheck(Seq("l_orderkey", "l_linenumber"))))
      .metricsDF(Tables.lineitem(spark, dir))

  /** Full ruleset — 5 heterogeneous checks, ONE scan (SURVEY §4.3). */
  def q08_dq_summary(spark: SparkSession, dir: String): DataFrame =
    DQRuleSet(Seq(
      NotNullCheck("l_orderkey"),
      RangeCheck("l_quantity", Some(1.0), Some(50.0)),
      RangeCheck("l_discount", Some(0.0), Some(0.08)),
      RegexCheck("l_returnflag", "^[ARN]$"),
      UniqueKeyCheck(Seq("l_orderkey", "l_linenumber"))))
      .metricsDF(Tables.lineitem(spark, dir))

  /** Quarantine split: rows violating any row-expressible check, tagged with
    * CSV reasons (implements the reference's TODO at
    * core/IngestionJob.scala:110-113). */
  def q22_quarantine(spark: SparkSession, dir: String): DataFrame = {
    val checks: Seq[DQCheck] = Seq(
      RangeCheck("l_quantity", Some(2.0), Some(48.0)),
      RangeCheck("l_discount", Some(0.0), Some(0.08)))
    val (_, bad) = Quarantine.split(Tables.lineitem(spark, dir), checks)
    bad.select(col("l_orderkey"), col("l_linenumber"), col("dq_reasons"))
      .orderBy(col("l_orderkey"), col("l_linenumber"))
  }

  /** Table profiling metrics, one pass (ref: metrics/Metrics.scala traits). */
  def q21_table_metrics(spark: SparkSession, dir: String): DataFrame = {
    import TableMetrics._
    TableMetrics.profile(Tables.orders(spark, dir), Seq(
      RowCount(),
      DistinctCount("o_custkey", "n_customers"),
      NullCount("o_totalprice", "null_totalprice"),
      MinTsMicros("o_orderdate", "min_orderdate_us"),
      MaxTsMicros("o_orderdate", "max_orderdate_us"),
      MoneySum("o_totalprice", "total_revenue")))
  }
}
