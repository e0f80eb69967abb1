package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SaveMode

import graft.catalog.{NoopCatalogAdapter, SparkCatalogAdapter}
import graft.config.ConfigLoader
import graft.core._
import graft.dq._
import graft.io.FileReader
import graft.lakehouse.{LakehouseTable, ParquetSink}

class IngestionSpec extends SparkSpec {
  import spark.implicits._

  private def writeSource(dir: String): Unit =
    Seq(
      (1L, 10.0, "USD"), (2L, -3.0, "USD"), (3L, 5.0, "EUR"), (4L, 7.0, "XXX"),
    ).toDF("id", "amount", "currency")
      .write.mode(SaveMode.Overwrite).parquet(dir)

  test("batch job: read -> DQ quarantine -> write clean + quarantined") {
    val src = tmpDir("job") + "/src"
    val out = tmpDir("job") + "/bronze"
    val quar = tmpDir("job") + "/quarantine"
    writeSource(src)
    val job = IngestionJob(
      domain = "payments", dataset = "tx", layer = MedallionLayer.Bronze,
      reader = FileReader("parquet", src),
      writer = ParquetSink(),
      target = LakehouseTable(out, MedallionLayer.Bronze),
      ruleSet = Some(DQRuleSet(
        Seq(RangeCheck("amount", Some(0.0), None),
          AllowedValuesCheck("currency", Seq("USD", "EUR"))),
        DQPolicy.QuarantineRows)),
      quarantine = Some(LakehouseTable(quar, MedallionLayer.Bronze)))
    val result = job.run(spark)
    result.streamingQuery shouldBe None
    result.batchSummary.get.overall shouldBe DQStatus.Fail
    spark.read.parquet(out).count() shouldBe 2 // ids 1, 3
    val q = spark.read.parquet(quar)
    q.count() shouldBe 2 // ids 2 (range), 4 (allowed)
    q.columns should contain("dq_reasons")
  }

  test("batch job without DQ writes everything") {
    val src = tmpDir("plain") + "/src"
    val out = tmpDir("plain") + "/out"
    writeSource(src)
    val job = IngestionJob("d", "s", MedallionLayer.Bronze,
      FileReader("parquet", src), ParquetSink(),
      LakehouseTable(out, MedallionLayer.Bronze))
    job.run(spark)
    spark.read.parquet(out).count() shouldBe 4
  }

  test("config-driven runner executes a pipeline end to end") {
    val src = tmpDir("runner") + "/src"
    val out = tmpDir("runner") + "/out"
    writeSource(src)
    val cfgJson =
      s"""{"env": "test", "jobs": [{
         |  "domain": "payments", "dataset": "tx", "layer": "bronze",
         |  "validateSchema": false,
         |  "source": {"type": "parquet", "path": "$src"},
         |  "target": {"format": "parquet", "identifier": "$out", "mode": "overwrite"},
         |  "dq": {"policy": "log_only",
         |         "checks": [{"type": "not_null", "column": "id"}]}
         |}]}""".stripMargin
    val f = Paths.get(tmpDir("runnercfg"), "p.json")
    Files.writeString(f, cfgJson)
    val results = IngestionRunner.runPipeline(spark, ConfigLoader.loadFromFile(f.toString))
    results.length shouldBe 1
    results.head.batchSummary.get.results.head.violations shouldBe 0
    spark.read.parquet(out).count() shouldBe 4
  }

  test("streaming job: file source, per-micro-batch DQ, non-blocking") {
    val src = tmpDir("stream") + "/in"
    val out = tmpDir("stream") + "/out"
    val quar = tmpDir("stream") + "/quar"
    val cp = tmpDir("stream") + "/cp"
    Files.createDirectories(Paths.get(src))
    val schema = Seq((1L, 1.0)).toDF("id", "amount").schema
    val job = IngestionJob(
      "events", "clicks", MedallionLayer.Bronze,
      FileReader("parquet", src, Some(schema), streaming = true),
      ParquetSink(),
      LakehouseTable(out, MedallionLayer.Bronze),
      ruleSet = Some(DQRuleSet(Seq(RangeCheck("amount", Some(0.0), None)),
        DQPolicy.QuarantineRows)),
      quarantine = Some(LakehouseTable(quar, MedallionLayer.Bronze)),
      checkpoint = Some(cp), triggerInterval = "1 seconds")
    // stage a file BEFORE starting so the first batch has data
    Seq((1L, 5.0), (2L, -1.0)).toDF("id", "amount")
      .write.mode(SaveMode.Overwrite).parquet(src)
    val result = job.run(spark)
    val query = result.streamingQuery.get
    try {
      query.processAllAvailable()
      spark.read.parquet(out).as[(Long, Double)].collect().toSet shouldBe Set((1L, 5.0))
      spark.read.parquet(quar).count() shouldBe 1
    } finally query.stop()
  }

  test("catalog adapters: spark-backed works, noop does nothing") {
    val cat = new SparkCatalogAdapter(spark)
    cat.tableExists("definitely_not_here") shouldBe false
    val schema = Seq((1L, "x")).toDF("id", "v").schema
    cat.createTableIfNotExists("graft_cat_tbl", schema, Seq.empty)
    cat.tableExists("graft_cat_tbl") shouldBe true
    spark.sql("DROP TABLE graft_cat_tbl")
    NoopCatalogAdapter.tableExists("anything") shouldBe false
  }

  test("checkpoint path derivation matches the reference layout") {
    IngestionJob("d", "s", MedallionLayer.Gold,
      FileReader("parquet", "/x"), ParquetSink(),
      LakehouseTable("/y", MedallionLayer.Gold))
      .defaultCheckpoint shouldBe "/tmp/checkpoints/d/s/gold"
  }
}
