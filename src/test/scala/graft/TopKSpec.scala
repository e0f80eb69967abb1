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
