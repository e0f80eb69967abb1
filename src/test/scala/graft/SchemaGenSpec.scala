package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.types.{LongType, StringType, StructType}

import graft.schema.{SchemaRegistry, SchemaValidator}

/** Round-trip gate for the schema-generation tool (r5 verdict task 7):
  * generate from a sample → SchemaRegistry.getSchema → validate the
  * source — the exact onboarding workflow the reference documents
  * (`docs/08-schema-governance.md:703-711`) but never builds. */
class SchemaGenSpec extends SparkSpec {

  private def write(path: String, content: String): String = {
    val p = Paths.get(path)
    Files.createDirectories(p.getParent)
    Files.writeString(p, content)
    path
  }

  test("generate from a JSON sample round-trips through the registry and " +
       "validates the source") {
    val dir = tmpDir("schemagen")
    val sample = write(s"$dir/sample/events.json",
      """{"event_id": 1, "user_id": 10, "event_type": "click", "amount": 1.5}
        |{"event_id": 2, "user_id": 11, "event_type": "view", "amount": null}
        |""".stripMargin)
    val v = SchemaGen.generate(spark, "json", sample, s"$dir/registry",
      "web", "events")
    v shouldBe 1
    val schema = new SchemaRegistry(s"$dir/registry").getSchema("web", "events")
    schema.fieldNames.sorted shouldBe
      Array("amount", "event_id", "event_type", "user_id")
    // metadata scaffolding: every field carries a description placeholder
    schema.fields.foreach(f =>
      f.metadata.contains("description") shouldBe true)
    // the generated schema validates the very source it was sampled from
    val src = spark.read.json(sample)
    SchemaValidator.validate(src, schema).isValid shouldBe true
  }

  test("re-generating with an additive sample publishes v2; a breaking " +
       "sample is rejected without the explicit override") {
    val dir = tmpDir("schemagen-compat")
    val reg = s"$dir/registry"
    val s1 = write(s"$dir/s1.json", """{"id": 1, "name": "a"}""" + "\n")
    SchemaGen.generate(spark, "json", s1, reg, "d", "t") shouldBe 1
    // additive: extra nullable column → v2 publishes
    val s2 = write(s"$dir/s2.json", """{"id": 2, "name": "b", "tag": "x"}""" + "\n")
    SchemaGen.generate(spark, "json", s2, reg, "d", "t") shouldBe 2
    // breaking: dropped column → rejected, then published with override
    val s3 = write(s"$dir/s3.json", """{"id": 3}""" + "\n")
    an[IllegalArgumentException] should be thrownBy
      SchemaGen.generate(spark, "json", s3, reg, "d", "t")
    SchemaGen.generate(spark, "json", s3, reg, "d", "t",
      allowBreaking = true) shouldBe 3
    new SchemaRegistry(reg).listVersions("d", "t") shouldBe Seq(1, 2, 3)
  }

  test("parquet samples use the exact embedded schema (no inference)") {
    import spark.implicits._
    val dir = tmpDir("schemagen-parquet")
    Seq((1L, "a"), (2L, "b")).toDF("id", "label")
      .write.parquet(s"$dir/sample.pq")
    SchemaGen.generate(spark, "parquet", s"$dir/sample.pq", s"$dir/reg",
      "d", "t") shouldBe 1
    val got = new SchemaRegistry(s"$dir/reg").getSchema("d", "t")
    got("id").dataType shouldBe LongType
    got("label").dataType shouldBe StringType
  }

  test("orc samples use the exact embedded schema") {
    import spark.implicits._
    val dir = tmpDir("schemagen-orc")
    Seq((1L, 2.5), (2L, 3.5)).toDF("id", "score")
      .write.orc(s"$dir/sample.orc")
    SchemaGen.generate(spark, "orc", s"$dir/sample.orc", s"$dir/reg",
      "d", "t") shouldBe 1
    val got = new SchemaRegistry(s"$dir/reg").getSchema("d", "t")
    got("id").dataType shouldBe LongType
    got("score").dataType shouldBe org.apache.spark.sql.types.DoubleType
  }

  test("an empty sample never publishes") {
    val dir = tmpDir("schemagen-empty")
    val empty = write(s"$dir/empty.json", "\n")
    an[IllegalArgumentException] should be thrownBy
      SchemaGen.generate(spark, "json", empty, s"$dir/reg", "d", "t")
  }

  test("scaffold preserves existing metadata and recurses into nested types") {
    import org.apache.spark.sql.types._
    val nested = StructType(Seq(
      StructField("outer", StructType(Seq(
        StructField("inner", StringType))), nullable = true,
        new MetadataBuilder().putString("description", "kept").build()),
      StructField("xs", ArrayType(StructType(Seq(
        StructField("leaf", LongType)))))))
    val out = SchemaGen.scaffold(nested)
    out("outer").metadata.getString("description") shouldBe "kept"
    out("outer").dataType.asInstanceOf[StructType]("inner")
      .metadata.contains("description") shouldBe true
    out("xs").dataType.asInstanceOf[ArrayType].elementType
      .asInstanceOf[StructType]("leaf")
      .metadata.contains("description") shouldBe true
  }
}
