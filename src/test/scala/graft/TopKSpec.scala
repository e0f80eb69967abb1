package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.plans.TopKPerKey

class TopKSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  test("TopKPerKey equals the window-rank form, without a Window/full sort") {
    val orders = graft.tables.Tables.orders(spark, dir)
      .select($"o_custkey", $"o_orderkey", $"o_totalprice")
    val topk = TopKPerKey.topKPerKey(orders,
      keys = Seq($"o_custkey"),
      order = Seq($"o_totalprice".desc, $"o_orderkey".asc), k = 3)
    val w = Window.partitionBy($"o_custkey")
      .orderBy($"o_totalprice".desc, $"o_orderkey".asc)
    val ref = orders.withColumn("rn", row_number().over(w))
      .filter($"rn" <= 3).drop("rn")
    topk.collect().toSet shouldBe ref.collect().toSet
    topk.count() shouldBe ref.count()
    val plan = topk.queryExecution.executedPlan.toString
    plan should include("TopKPerKey")
    plan should not include "Window"
  }

  test("groups smaller than k emit entirely; heap keeps exactly k on ties") {
    val df = Seq(
      ("a", 1, 10.0), ("a", 2, 10.0), ("a", 3, 10.0), ("a", 4, 10.0),
      ("b", 5, 1.0)).toDF("key", "id", "score")
    val topk = TopKPerKey.topKPerKey(df,
      Seq($"key"), Seq($"score".desc, $"id".asc), k = 2)
      .orderBy($"key", $"id")
    // ties broken by id: a keeps ids 1,2; b keeps its single row
    topk.select($"key", $"id").as[(String, Int)].collect() shouldBe
      Array(("a", 1), ("a", 2), ("b", 5))
  }

  test("past the spill threshold, a partition falls back to external sort " +
       "and still equals the window form") {
    // o_custkey is high-cardinality (most groups are tiny), so the heap map
    // retains ~one row per key and a 64-row cap forces the spill path in
    // every partition. Equality with the window form proves the external
    // merge + per-key emit is exact; the SQLMetrics prove it actually
    // engaged (not a vacuous pass through the in-memory path).
    val orders = graft.tables.Tables.orders(spark, dir)
      .select($"o_custkey", $"o_orderkey", $"o_totalprice")
    spark.conf.set("spark.graft.topk.spillThreshold", "64")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val topk = TopKPerKey.topKPerKey(orders,
        keys = Seq($"o_custkey"),
        order = Seq($"o_totalprice".desc, $"o_orderkey".asc), k = 2)
      val got = topk.collect().toSet
      val w = Window.partitionBy($"o_custkey")
        .orderBy($"o_totalprice".desc, $"o_orderkey".asc)
      val ref = orders.withColumn("rn", row_number().over(w))
        .filter($"rn" <= 2).drop("rn").collect().toSet
      got shouldBe ref
      val exec = topk.queryExecution.executedPlan.collectFirst {
        case e: graft.plans.TopKPerKeyExec => e
      }.getOrElse(fail("no TopKPerKeyExec in executed plan"))
      exec.spillThreshold shouldBe 64
      exec.metrics("spilledPartitions").value should be > 0L
      exec.metrics("spilledRows").value should be > 64L
    } finally {
      spark.conf.unset("spark.graft.topk.spillThreshold")
      spark.conf.unset("spark.sql.adaptive.enabled")
    }
  }

  test("default threshold keeps the in-memory heap path (no spill)") {
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val orders = graft.tables.Tables.orders(spark, dir)
        .select($"o_custkey", $"o_orderkey", $"o_totalprice")
      val topk = TopKPerKey.topKPerKey(orders, Seq($"o_custkey"),
        Seq($"o_totalprice".desc, $"o_orderkey".asc), 2)
      topk.count() should be > 0L
      val exec = topk.queryExecution.executedPlan.collectFirst {
        case e: graft.plans.TopKPerKeyExec => e
      }.getOrElse(fail("no TopKPerKeyExec in executed plan"))
      exec.metrics("spilledPartitions").value shouldBe 0L
      exec.metrics("spilledRows").value shouldBe 0L
    } finally spark.conf.unset("spark.sql.adaptive.enabled")
  }

  test("TopKPerKey output is stable under repartitioning") {
    val orders = graft.tables.Tables.orders(spark, dir)
      .select($"o_custkey", $"o_orderkey", $"o_totalprice")
    val a = TopKPerKey.topKPerKey(orders, Seq($"o_custkey"),
      Seq($"o_totalprice".desc, $"o_orderkey".asc), 2).collect().toSet
    val b = TopKPerKey.topKPerKey(orders.repartition(13), Seq($"o_custkey"),
      Seq($"o_totalprice".desc, $"o_orderkey".asc), 2).collect().toSet
    a shouldBe b
  }
}
