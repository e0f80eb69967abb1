package graft

import java.nio.file.{Files, Paths}

import graft.config.ConfigLoader
import graft.core.IngestionRunner
import graft.dq.MetadataChecks
import graft.schema.SchemaRegistry

/** The shipped examples/ pipeline must stay loadable and runnable — it
  * doubles as living documentation of the config surface. */
class ExamplesSpec extends SparkSpec {
  import spark.implicits._

  test("examples/pipeline.json loads with eager schema validation") {
    val cfg = ConfigLoader.loadFromFile("examples/pipeline.json")
    cfg.env shouldBe "example"
    cfg.jobs.head.dq.get.checks.length shouldBe 4
  }

  test("registry schema resolves and yields metadata-derived checks") {
    val schema = new SchemaRegistry("examples/schemas")
      .getSchema("payments", "transactions")
    schema.fieldNames shouldBe Array("transaction_id", "amount", "currency", "merchant")
    val derived = MetadataChecks.fromSchema(schema).map(_.name)
    derived should contain allOf (
      "notnull_transaction_id", "notnull_amount", "range_amount", "allowed_currency")
  }

  test("the example pipeline runs end to end with quarantine") {
    // quarantine appends by design; start from a clean slate
    def rmrf(p: java.io.File): Unit = {
      if (p.isDirectory) p.listFiles.foreach(rmrf)
      p.delete(); ()
    }
    rmrf(new java.io.File("/tmp/graft-example"))
    Files.createDirectories(Paths.get("/tmp/graft-example/in"))
    Files.writeString(Paths.get("/tmp/graft-example/in/data.json"),
      """{"transaction_id": 1, "amount": 10.5, "currency": "USD", "merchant": "a"}
        |{"transaction_id": 2, "amount": -4.0, "currency": "USD", "merchant": "b"}
        |{"transaction_id": 3, "amount": 7.0, "currency": "ZZZ", "merchant": "c"}""".stripMargin)
    val cfg = ConfigLoader.loadFromFile("examples/pipeline.json")
    val results = IngestionRunner.runPipeline(spark, cfg)
    results.head.batchSummary.get.rowCount shouldBe 3
    spark.read.parquet("/tmp/graft-example/bronze/transactions")
      .select("transaction_id").as[Long].collect() shouldBe Array(1L)
    spark.read.parquet("/tmp/graft-example/quarantine/transactions")
      .count() shouldBe 2
  }
}
