package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.tables.Tables
import graft.transform.RefIntegrity
import Parity._

/** Join / set-op / window / gold-layer queries (reference §2B gold
  * aggregations + referential integrity; §2C gaps closed: joins, windows,
  * sorts/limits, set operations, rollup).
  *
  * Scale notes: dimension sides (region/nation/customer/part/supplier) are
  * broadcast — lineitem/orders never shuffle for these joins; only
  * aggregations shuffle, on their (small-cardinality) grouping keys.
  */
object JoinQueries {

  /** Star-join enrichment with broadcast dims; revenue rollup by brand. */
  def q13_enrich_join(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
    val part = broadcast(Tables.part(spark, dir))
    li.join(part, li("l_partkey") === part("p_partkey"))
      .groupBy(col("p_brand"))
      .agg(
        sum(dec(col("l_extendedprice")) * (lit(1).cast("decimal(18,2)") - dec(col("l_discount"))))
          .cast("double").as("revenue"),
        sumMoney(col("l_quantity")).as("sum_qty"),
        count(lit(1)).as("n_lines"))
      .orderBy(col("p_brand"))
  }

  /** Hierarchical rollup (region → nation → grand total) over a broadcast
    * dim chain (§2B gold "aggregations and roll-ups"). */
  def q11_gold_rollup(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(spark, dir)
    val n = broadcast(Tables.nation(spark, dir))
    val r = broadcast(Tables.region(spark, dir))
    c.join(n, c("c_nationkey") === n("n_nationkey"))
      .join(r, n("n_regionkey") === r("r_regionkey"))
      .rollup(col("r_name"), col("n_name"))
      .agg(sumMoney(col("c_acctbal")).as("sum_bal"), count(lit(1)).as("n_cust"))
      .select(coalesce(col("r_name"), lit("ALL")).as("region_name"),
        coalesce(col("n_name"), lit("ALL")).as("nation_name"),
        col("sum_bal"), col("n_cust"))
      .orderBy(col("region_name"), col("nation_name"))
  }

  /** Referential-integrity orphan counts via left-anti joins (§2B).
    * customer is a dimension → broadcast its keyset; orders is a fact →
    * shuffle anti-join (AQE still auto-broadcasts it when genuinely small,
    * without the executor-memory bomb a forced broadcast is at scale). */
  def q12_ri_orphans(spark: SparkSession, dir: String): DataFrame = {
    val orders = Tables.orders(spark, dir)
    val customer = Tables.customer(spark, dir)
    val lineitem = Tables.lineitem(spark, dir)
    RefIntegrity.orphanCount(orders, customer, "o_custkey", "c_custkey", "order_orphans",
        broadcastParent = true)
      .crossJoin(
        RefIntegrity.orphanCount(lineitem, orders, "l_orderkey", "o_orderkey", "lineitem_orphans"))
  }

  /** Semi/anti join counts: customers with vs without orders. */
  def q14_semi_anti(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(spark, dir)
    val o = Tables.orders(spark, dir).select(col("o_custkey"))
    val withOrders = c.join(o, c("c_custkey") === o("o_custkey"), "left_semi")
      .agg(count(lit(1)).as("with_orders"))
    val withoutOrders = c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
      .agg(count(lit(1)).as("without_orders"))
    withOrders.crossJoin(withoutOrders)
  }

  /** Top-K by sort+limit — Spark plans TakeOrderedAndProject: per-partition
    * heap + driver merge, no full sort at any scale. */
  def q15_topk(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      .limit(10)

  /** Set operations: distinct union / intersect / except cardinalities. */
  def q16_set_ops(spark: SparkSession, dir: String): DataFrame = {
    val building = Tables.customer(spark, dir)
      .filter(col("c_mktsegment") === "BUILDING")
      .select(col("c_custkey").as("k"))
    val bigSpenders = Tables.orders(spark, dir)
      .filter(col("o_totalprice") > 250000.0)
      .select(col("o_custkey").as("k"))
    val nUnion = building.union(bigSpenders).distinct()
      .agg(count(lit(1)).as("n_union"))
    val nIntersect = building.intersect(bigSpenders)
      .agg(count(lit(1)).as("n_intersect"))
    val nExcept = building.except(bigSpenders)
      .agg(count(lit(1)).as("n_except"))
    nUnion.crossJoin(nIntersect).crossJoin(nExcept)
  }

  /** Analytic window functions: per-customer order rank + running spend. */
  def q17_window_running(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate").asc, col("o_orderkey").asc)
    Tables.orders(spark, dir)
      .select(col("o_custkey"), col("o_orderkey"),
        row_number().over(w).cast("bigint").as("rk"),
        sum(dec(col("o_totalprice")))
          .over(w.rowsBetween(Window.unboundedPreceding, 0))
          .cast("double").as("running_spend"))
      .orderBy(col("o_custkey"), col("o_orderkey"))
  }
}
