package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

class PrefixSumSpec extends SparkSpec {

  test("PrefixSum.runningSums multi-value matches single-pass window") {
    import spark.implicits._
    val df = (1 to 500).map(i => ((i * 37) % 501L, (i % 13).toLong,
      (i % 5).toLong)).toDF("k", "a", "b")
    val got = graft.transform.PrefixSum.runningSums(df, Seq(col("k")),
        Seq("a" -> "ca", "b" -> "cb"))
      .orderBy("k").collect().toSeq
    val w = Window.orderBy(col("k")).rowsBetween(Window.unboundedPreceding, 0)
    val ref = df.withColumn("ca", sum(col("a")).over(w))
      .withColumn("cb", sum(col("b")).over(w))
      .orderBy("k").collect().toSeq
    assert(got == ref)
  }

  test("PrefixSum.runningSums desc order matches window desc") {
    import spark.implicits._
    val df = (1 to 300).map(i => ((i * 91) % 301L, 1L)).toDF("k", "one")
    val got = graft.transform.PrefixSum.runningSums(df, Seq(col("k").desc),
        Seq("one" -> "c"))
      .orderBy("k").collect().toSeq
    val w = Window.orderBy(col("k").desc)
      .rowsBetween(Window.unboundedPreceding, 0)
    val ref = df.withColumn("c", sum(col("one")).over(w))
      .orderBy("k").collect().toSeq
    assert(got == ref)
  }

  test("PrefixSum.rowNumber matches row_number over unique keys") {
    import spark.implicits._
    val df = (1 to 400).map(i => ((i * 173) % 401L, s"s${i % 3}"))
      .toDF("k", "g")
    val got = graft.transform.PrefixSum.rowNumber(df, Seq("g"),
        Seq(col("k")), "rn")
      .orderBy("g", "k").collect().toSeq
    val w = Window.partitionBy(col("g")).orderBy(col("k"))
    val ref = df.withColumn("rn", row_number().over(w).cast("long"))
      .orderBy("g", "k").collect().toSeq
    assert(got == ref)
  }

  test("PrefixSum RunMax running max matches window max") {
    import spark.implicits._
    val df = (1 to 400).map(i => ((i * 173) % 401L, ((i * 29) % 97).toLong))
      .toDF("k", "v")
    val got = graft.transform.PrefixSum.groupedRunningAggs(df, Nil,
        Seq(col("k")), Seq("v" -> "m"), graft.transform.PrefixSum.RunMax)
      .orderBy("k").collect().toSeq
    val w = Window.orderBy(col("k")).rowsBetween(Window.unboundedPreceding, 0)
    val ref = df.withColumn("m", max(col("v")).over(w))
      .orderBy("k").collect().toSeq
    assert(got == ref)
  }

  test("PrefixSum NULL group keys form their own group (null-safe join-back)") {
    import spark.implicits._
    val df = (1 to 300).map(i => (if (i % 5 == 0) None else Some(s"g${i % 3}"),
      (i * 37L) % 301L, 1L)).toDF("g", "k", "one")
    val got = graft.transform.PrefixSum.groupedRunningAggs(df, Seq("g"),
        Seq(col("k")), Seq("one" -> "c"))
      .orderBy(col("g"), col("k")).collect().toSeq
    val w = Window.partitionBy(col("g")).orderBy(col("k"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val ref = df.withColumn("c", sum(col("one")).over(w))
      .orderBy(col("g"), col("k")).collect().toSeq
    assert(got == ref)
  }

  private def flattenPlan(p: org.apache.spark.sql.execution.SparkPlan)
      : Seq[org.apache.spark.sql.execution.SparkPlan] = {
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    val kids = p match {
      case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
      case q: QueryStageExec => Seq(q.plan)
      case o => o.children
    }
    p +: kids.flatMap(flattenPlan)
  }

  private def rangeExchangeCount(df: org.apache.spark.sql.DataFrame): Int = {
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    import org.apache.spark.sql.catalyst.plans.physical.RangePartitioning
    flattenPlan(df.queryExecution.executedPlan).count {
      case s: ShuffleExchangeExec =>
        s.outputPartitioning.isInstanceOf[RangePartitioning]
      case _ => false
    }
  }

  test("PrefixSum pins its ranged frame: the partition tag is materialized " +
       "ONCE (checkpoint), consumer plans carry no range exchange") {
    import spark.implicits._
    val df = (1 to 2000).map(i => ((i * 37L) % 2001L, 1L)).toDF("k", "one")
    val out = graft.transform.PrefixSum.runningSums(df, Seq(col("k")),
      Seq("one" -> "c"))
    out.collect()
    // the single range exchange lives inside the pinned (checkpointed) RDD
    // lineage — re-planning a consumer can never re-execute it, so the
    // consumer's own plan must contain ZERO range exchanges
    assert(rangeExchangeCount(out) == 0,
      "range exchange must be pinned inside the checkpointed lineage")
    // and the pin is real: the ranged frame's partitions are cached
    assert(spark.sparkContext.getRDDStorageInfo
      .exists(_.numCachedPartitions > 0),
      "checkpointed ranged frame should be cached after the first action")
  }

  test("PrefixSum multi-consumer fan-out: 3 consumers, separate actions, " +
       "all hash-equal to the window form, zero re-shuffles of the tag") {
    import spark.implicits._
    val df = (1 to 3000).map(i => (s"g${i % 3}", (i * 37L) % 3001L,
      (i % 17).toLong)).toDF("g", "k", "v").repartition(7)
    val ps = graft.transform.PrefixSum.groupedRunningAggs(df, Seq("g"),
      Seq(col("k")), Seq("v" -> "c"))
    val w = Window.partitionBy(col("g")).orderBy(col("k"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val ref = df.withColumn("c", sum(col("v")).over(w))
    // three consumers, three separate actions — the hazard class q298 hit
    val c1 = ps.orderBy(col("g"), col("k")).collect().toSeq
    val c2 = ps.groupBy(col("g")).agg(max(col("c")).as("mx"))
      .orderBy(col("g")).collect().toSeq
    val c3 = ps.filter(col("c") % 2 === 0)
      .agg(count(lit(1)).as("n"), sum(col("c")).as("s")).collect().toSeq
    assert(c1 == ref.orderBy(col("g"), col("k")).collect().toSeq,
      "fan-out consumer 1 (full rows)")
    assert(c2 == ref.groupBy(col("g")).agg(max(col("c")).as("mx"))
      .orderBy(col("g")).collect().toSeq, "fan-out consumer 2 (per-group max)")
    assert(c3 == ref.filter(col("c") % 2 === 0)
      .agg(count(lit(1)).as("n"), sum(col("c")).as("s")).collect().toSeq,
      "fan-out consumer 3 (parity slice)")
    // none of the three consumer plans re-executed the range exchange
    assert(rangeExchangeCount(ps) == 0, "consumer plans must not re-shuffle")
  }

  test("PrefixSum randomized property: grouped/desc/exclusive/max all " +
       "match single-pass windows on random data") {
    import spark.implicits._
    val rnd = new scala.util.Random(20260815L)
    for (trial <- 1 to 3) {
      val n = 200 + rnd.nextInt(400)
      // unique order key k per group; values include negatives
      val rows = (0 until n).map { i =>
        (if (rnd.nextInt(7) == 0) None else Some(s"g${rnd.nextInt(4)}"),
          i.toLong, rnd.nextInt(1000) - 500L)
      }
      val df = rnd.shuffle(rows).toDF("g", "k", "v").repartition(5)
      val dir = if (trial % 2 == 0) col("k").desc else col("k").asc
      val wDir = if (trial % 2 == 0) col("k").desc else col("k").asc
      // inclusive sum
      val gotS = graft.transform.PrefixSum.groupedRunningAggs(df, Seq("g"),
          Seq(dir), Seq("v" -> "c")).orderBy(col("g"), col("k"))
        .collect().toSeq
      val w = Window.partitionBy(col("g")).orderBy(wDir)
        .rowsBetween(Window.unboundedPreceding, 0)
      val refS = df.withColumn("c", sum(col("v")).over(w))
        .orderBy(col("g"), col("k")).collect().toSeq
      assert(gotS == refS, s"inclusive sum trial $trial")
      // exclusive max (null first frame)
      val gotM = graft.transform.PrefixSum.groupedRunningAggs(df, Seq("g"),
          Seq(dir), Seq("v" -> "m"), graft.transform.PrefixSum.RunMax,
          exclusive = true).orderBy(col("g"), col("k")).collect().toSeq
      val wx = Window.partitionBy(col("g")).orderBy(wDir)
        .rowsBetween(Window.unboundedPreceding, -1)
      val refM = df.withColumn("m", max(col("v")).over(wx))
        .orderBy(col("g"), col("k")).collect().toSeq
      assert(gotM == refM, s"exclusive max trial $trial")
    }
  }

  test("PrefixSum NULL value semantics match the window: all-NULL prefixes " +
       "and empty exclusive frames yield NULL, not 0") {
    import spark.implicits._
    // group gA starts with two NULL values, gB is entirely NULL
    val rows = Seq(("gA", 1L, None), ("gA", 2L, None), ("gA", 3L, Some(5L)),
      ("gA", 4L, None), ("gB", 1L, None), ("gB", 2L, None))
    val df = rows.toDF("g", "k", "v").repartition(3)
    for (excl <- Seq(false, true)) {
      val got = graft.transform.PrefixSum.groupedRunningAggs(df, Seq("g"),
          Seq(col("k")), Seq("v" -> "c"), exclusive = excl)
        .orderBy(col("g"), col("k")).collect().toSeq
      val w = Window.partitionBy(col("g")).orderBy(col("k"))
        .rowsBetween(Window.unboundedPreceding, if (excl) -1 else 0)
      val ref = df.withColumn("c", sum(col("v")).over(w))
        .orderBy(col("g"), col("k")).collect().toSeq
      assert(got == ref, s"exclusive=$excl")
    }
  }

  test("PrefixSum narrow-decimal running sum has the window's dtype " +
       "(precision +10, not the offsets frame's +20)") {
    import spark.implicits._
    val df = (1 to 50).map(i => (i.toLong, BigDecimal(i) / 100))
      .toDF("k", "v")
      .select(col("k"), col("v").cast("decimal(10,2)").as("v"))
    val got = graft.transform.PrefixSum.runningSums(df, Seq(col("k")),
      Seq("v" -> "c"))
    val w = Window.orderBy(col("k")).rowsBetween(Window.unboundedPreceding, 0)
    val ref = df.withColumn("c", sum(col("v")).over(w))
    assert(got.schema("c").dataType == ref.schema("c").dataType,
      s"got ${got.schema("c").dataType}, window ${ref.schema("c").dataType}")
    assert(got.orderBy("k").collect().toSeq == ref.orderBy("k").collect().toSeq)
  }

  test("PrefixSum decimal running sum matches window sum values") {
    import spark.implicits._
    val df = (1 to 200).map(i => ((i * 57) % 201L, BigDecimal(i) / 100))
      .toDF("k", "v")
      .select(col("k"), col("v").cast("decimal(18,2)").as("v"))
    val got = graft.transform.PrefixSum.runningSums(df, Seq(col("k")),
        Seq("v" -> "c"))
      .select(col("k"), col("c").cast("decimal(38,2)"))
      .orderBy("k").collect().toSeq
    val w = Window.orderBy(col("k")).rowsBetween(Window.unboundedPreceding, 0)
    val ref = df.withColumn("c", sum(col("v")).over(w))
      .select(col("k"), col("c").cast("decimal(38,2)"))
      .orderBy("k").collect().toSeq
    assert(got == ref)
  }
}
