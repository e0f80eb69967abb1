package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.types._

import graft.schema.{SchemaNotFoundException, SchemaRegistry, SchemaValidator}

class SchemaSpec extends SparkSpec {

  private def writeSchema(base: String, domain: String, dataset: String,
                          v: Int, schema: StructType): Unit = {
    val dir = Paths.get(base, domain, dataset)
    Files.createDirectories(dir)
    Files.writeString(dir.resolve(s"v$v.json"), schema.json)
  }

  private val v1 = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("amount", DecimalType(10, 2)),
  ))
  private val v2 = v1.add("currency", StringType)

  test("registry resolves explicit and latest versions, numerically sorted") {
    val base = tmpDir("registry")
    writeSchema(base, "payments", "tx", 1, v1)
    writeSchema(base, "payments", "tx", 2, v2)
    writeSchema(base, "payments", "tx", 10, v2.add("extra", StringType))
    val reg = new SchemaRegistry(base)
    reg.listVersions("payments", "tx") shouldBe Seq(1, 2, 10)
    reg.getSchema("payments", "tx", Some(1)) shouldBe v1
    // latest must be v10 (numeric sort), not v2 (lexicographic)
    reg.getSchema("payments", "tx").fieldNames should contain("extra")
  }

  test("registry throws with the expected path for missing schemas") {
    val reg = new SchemaRegistry(tmpDir("empty"))
    val e = intercept[SchemaNotFoundException](reg.getSchema("no", "such"))
    e.getMessage should include("no/such")
  }

  test("classpath registry lists via generated manifest, beyond v10") {
    val base = Paths.get(tmpDir("cpreg"))
    // v11 exists so the reference's v1..v10 probe would miss the latest
    for (v <- Seq(1, 9, 10, 11))
      writeSchema(base.toString, "pay", "tx", v,
        v1.add(s"since_v$v", StringType))
    val lines = SchemaRegistry.writeManifest(base)
    lines should contain("pay/tx/v11.json")
    // the manifest + schema tree as classpath resources
    val loader = new java.net.URLClassLoader(
      Array(base.getParent.toUri.toURL), null)
    val reg = SchemaRegistry.classpath(base.getFileName.toString, loader)
    reg.listVersions("pay", "tx") shouldBe Seq(1, 9, 10, 11)
    reg.latestVersion("pay", "tx") shouldBe Some(11)
    reg.getSchema("pay", "tx").fieldNames should contain("since_v11")
    reg.getSchema("pay", "tx", Some(9)).fieldNames should contain("since_v9")
    val e = intercept[SchemaNotFoundException](reg.getSchema("pay", "tx", Some(12)))
    e.getMessage should include("classpath:")
  }

  test("registry caches resolved schemas") {
    val base = tmpDir("cache")
    writeSchema(base, "d", "s", 1, v1)
    val reg = new SchemaRegistry(base)
    val first = reg.getSchema("d", "s", Some(1))
    // deleting the file doesn't evict the cache
    Files.delete(Paths.get(base, "d", "s", "v1.json"))
    reg.getSchema("d", "s", Some(1)) shouldBe first
  }

  test("validator: missing / extra / type mismatch / nullability") {
    val actual = StructType(Seq(
      StructField("id", StringType, nullable = true), // type mismatch + nullability
      StructField("unexpected", StringType),
    ))
    val r = SchemaValidator.validateStruct(actual, v1)
    r.isValid shouldBe false
    r.missingColumns shouldBe Seq("amount")
    r.extraColumns shouldBe Seq("unexpected")
    r.typeMismatches.map(_.column) shouldBe Seq("id")
    r.nullabilityDiffs.head should include("id")
  }

  test("validator: decimal precision lenient by default, strict on demand") {
    val actual = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("amount", DecimalType(38, 10)),
    ))
    SchemaValidator.validateStruct(actual, v1).isValid shouldBe true
    SchemaValidator.validateStruct(actual, v1, strictDecimal = true)
      .typeMismatches.map(_.column) shouldBe Seq("amount")
  }

  test("validator: nested struct and array compatibility") {
    val expected = StructType(Seq(
      StructField("payload", StructType(Seq(StructField("a", IntegerType)))),
      StructField("tags", ArrayType(StringType)),
    ))
    val compatible = StructType(Seq(
      StructField("payload", StructType(Seq(StructField("a", IntegerType, nullable = false)))),
      StructField("tags", ArrayType(StringType, containsNull = false)),
    ))
    SchemaValidator.validateStruct(compatible, expected).isValid shouldBe true
    val wrong = StructType(Seq(
      StructField("payload", StructType(Seq(StructField("a", StringType)))),
      StructField("tags", ArrayType(StringType)),
    ))
    SchemaValidator.validateStruct(wrong, expected)
      .typeMismatches.map(_.column) shouldBe Seq("payload")
  }

  test("SchemaEvolution.conform: null-fill, cast, drop, and hard errors") {
    import spark.implicits._
    import graft.schema.SchemaEvolution
    val target = StructType(Seq(
      StructField("id", LongType),
      StructField("amount", DoubleType),
      StructField("note", StringType)))
    val v1 = Seq((1, 5.0, "x")).toDF("id", "amount", "legacy") // int id, extra col
    val out = SchemaEvolution.conform(v1, target)
    out.schema.fieldNames shouldBe Array("id", "amount", "note")
    out.schema("id").dataType shouldBe LongType
    val r = out.collect()(0)
    r.getLong(0) shouldBe 1L
    r.isNullAt(2) shouldBe true
    an[SchemaEvolution.EvolutionException] should be thrownBy
      SchemaEvolution.conform(v1, target, failOnExtra = true)
    val notNullTarget = StructType(Seq(StructField("must", LongType, nullable = false)))
    an[SchemaEvolution.EvolutionException] should be thrownBy
      SchemaEvolution.conform(v1, notNullTarget)
    val clash = StructType(Seq(StructField("amount", ArrayType(LongType))))
    an[SchemaEvolution.EvolutionException] should be thrownBy
      SchemaEvolution.conform(v1, clash)
  }

  test("conform widens decimals but refuses lossy narrowing") {
    import graft.schema.SchemaEvolution
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val df = Seq("12345678901234.5678").toDF("amount")
      .select(col("amount").cast(DecimalType(18, 4)).as("amount"))
    val widened = SchemaEvolution.conform(df,
      StructType(Seq(StructField("amount", DecimalType(24, 6)))))
    widened.schema.head.dataType shouldBe DecimalType(24, 6)
    widened.as[BigDecimal].collect().head shouldBe BigDecimal("12345678901234.567800")
    // decimal(18,4) -> decimal(8,0): scale rounds silently, precision
    // overflows to null at runtime — must fail at conform time instead
    an[SchemaEvolution.EvolutionException] should be thrownBy
      SchemaEvolution.conform(df,
        StructType(Seq(StructField("amount", DecimalType(8, 0)))))
    an[SchemaEvolution.EvolutionException] should be thrownBy
      SchemaEvolution.conform(df,
        StructType(Seq(StructField("amount", DecimalType(18, 2)))))
  }

  test("validateOrThrow raises on invalid frames") {
    import spark.implicits._
    val df = Seq((1, "x")).toDF("id", "other")
    a[SchemaValidator.SchemaValidationException] should be thrownBy
      SchemaValidator.validateOrThrow(df, v1)
  }

  test("SchemaCompat: the governance matrix (add/drop/retype/nullability)") {
    import graft.schema.SchemaCompat
    val base = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("amount", IntegerType, nullable = true),
      StructField("note", StringType, nullable = true)))
    def retype(name: String, t: DataType) =
      StructType(base.fields.map(f => if (f.name == name) f.copy(dataType = t) else f))
    def renull(name: String, n: Boolean) =
      StructType(base.fields.map(f => if (f.name == name) f.copy(nullable = n) else f))

    // additive nullable column: same-version OK
    val addOk = SchemaCompat.check(base, base.add(StructField("extra", StringType, nullable = true)))
    addOk.ok shouldBe true
    addOk.additions should have size 1
    // additive REQUIRED column: breaking
    SchemaCompat.check(base,
      base.add(StructField("extra", StringType, nullable = false))).ok shouldBe false
    // dropped column: breaking
    val dropped = StructType(base.fields.filterNot(_.name == "note"))
    SchemaCompat.check(base, dropped).ok shouldBe false
    // lossless widening int -> long: allowed but flagged
    val widened = SchemaCompat.check(base, retype("amount", LongType))
    widened.ok shouldBe true
    widened.widenings should have size 1
    // narrowing long -> int: breaking
    SchemaCompat.check(base, retype("id", IntegerType)).ok shouldBe false
    // incompatible retype string -> long: breaking
    SchemaCompat.check(base, retype("note", LongType)).ok shouldBe false
    // relax NOT NULL -> nullable: OK, reported
    val relaxed = SchemaCompat.check(base, renull("id", true))
    relaxed.ok shouldBe true
    relaxed.relaxedNullability should have size 1
    // tighten nullable -> NOT NULL: breaking
    SchemaCompat.check(base, renull("note", false)).ok shouldBe false
    // metadata-only change: OK
    SchemaCompat.check(base, StructType(base.fields.map(f =>
      f.copy(metadata = new MetadataBuilder().putString("description", "x").build())))
    ).ok shouldBe true
    // identical: OK with nothing to report
    val same = SchemaCompat.check(base, base)
    (same.additions ++ same.widenings ++ same.relaxedNullability ++ same.breaking) shouldBe empty
    // publish gate throws on breaking changes
    an[IllegalArgumentException] should be thrownBy
      SchemaCompat.validateOrThrow(base, dropped)
  }

  test("publish gates on SchemaCompat: additive ok, breaking needs the override") {
    val base = tmpDir("publish")
    val reg = new SchemaRegistry(base)
    // first publish: no previous version, anything goes
    reg.publish("d", "t", v1) shouldBe 1
    reg.getSchema("d", "t") shouldBe v1
    // additive nullable column: compatible, publishes v2
    reg.publish("d", "t", v2) shouldBe 2
    reg.latestVersion("d", "t") shouldBe Some(2)
    // dropping a column: rejected without the override...
    val dropped = StructType(v2.fields.filterNot(_.name == "currency"))
    an[IllegalArgumentException] should be thrownBy reg.publish("d", "t", dropped)
    reg.latestVersion("d", "t") shouldBe Some(2) // nothing written
    // ...and publishes as an explicit breaking major version with it
    reg.publish("d", "t", dropped, allowBreaking = true) shouldBe 3
    reg.getSchema("d", "t").fieldNames should not contain "currency"
    // classpath stores are read-only
    an[UnsupportedOperationException] should be thrownBy
      SchemaRegistry.classpath("nonexistent").publish("d", "t", v1)
  }

  test("SchemaCompat recurses into nested structs") {
    import graft.schema.SchemaCompat
    val inner = StructType(Seq(
      StructField("street", StringType, nullable = true),
      StructField("zip", IntegerType, nullable = true)))
    val outer = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("address", inner, nullable = true)))
    // nested widening flags, nested drop breaks — with dotted paths
    val widenedInner = StructType(Seq(
      StructField("street", StringType, nullable = true),
      StructField("zip", LongType, nullable = true)))
    val w = SchemaCompat.check(outer, StructType(Seq(
      outer.fields(0), StructField("address", widenedInner, nullable = true))))
    w.ok shouldBe true
    w.widenings.head should include("address.zip")
    val droppedInner = StructType(Seq(StructField("street", StringType, nullable = true)))
    val d = SchemaCompat.check(outer, StructType(Seq(
      outer.fields(0), StructField("address", droppedInner, nullable = true))))
    d.ok shouldBe false
    d.breaking.head should include("address.zip")
  }
}
