package graft

import java.nio.file.{Files, Paths}

import graft.config._
import graft.dq.{DQPolicy, NotNullCheck, RangeCheck, UniqueKeyCheck}

class ConfigSpec extends SparkSpec {

  private val json =
    """{
      |  "env": "dev",
      |  "jobs": [{
      |    "domain": "payments", "dataset": "tx", "layer": "bronze",
      |    "validateSchema": false,
      |    "source": {"type": "parquet", "path": "/data/in", "streaming": false},
      |    "target": {"format": "parquet", "identifier": "/data/out",
      |               "partitions": ["day"], "mode": "overwrite"},
      |    "dq": {
      |      "policy": "quarantine",
      |      "quarantine": "/data/quarantine",
      |      "checks": [
      |        {"type": "not_null", "column": "id"},
      |        {"type": "range", "column": "amount", "min": 0},
      |        {"type": "unique_key", "columns": ["id", "day"]}
      |      ]
      |    }
      |  }]
      |}""".stripMargin

  test("parses models, checks, and policy") {
    val cfg = ConfigLoader.parse(json)
    cfg.env shouldBe "dev"
    val job = cfg.jobs.head
    job.target.partitions shouldBe Seq("day")
    val rs = job.dq.get.toRuleSet
    rs.policy shouldBe DQPolicy.QuarantineRows
    rs.checks should contain allOf (
      NotNullCheck("id"),
      RangeCheck("amount", Some(0.0), None),
      UniqueKeyCheck(Seq("id", "day")),
    )
  }

  test("unknown check type and policy fail loudly") {
    an[IllegalArgumentException] should be thrownBy
      CheckConfig("nonsense").toCheck
    an[IllegalArgumentException] should be thrownBy
      DQConfig(policy = "bogus").toRuleSet
  }

  test("eager schema validation points at the missing file") {
    val base = tmpDir("cfgreg")
    val cfgJson =
      s"""{"env": "dev", "schemaRegistry": "$base",
         |  "jobs": [{"domain": "d", "dataset": "missing", "layer": "bronze",
         |    "source": {"type": "parquet", "path": "/x"},
         |    "target": {"format": "parquet", "identifier": "/y"}}]}""".stripMargin
    val f = Paths.get(tmpDir("cfg"), "p.json")
    Files.writeString(f, cfgJson)
    val e = intercept[ConfigLoader.ConfigValidationException](
      ConfigLoader.loadFromFile(f.toString))
    e.getMessage should include("d/missing")
  }

  test("runner factories reject unknown types") {
    an[IllegalArgumentException] should be thrownBy
      graft.core.IngestionRunner.buildWriter("mongodb")
    an[IllegalArgumentException] should be thrownBy
      graft.core.IngestionRunner.parseMode("sideways")
  }
}
