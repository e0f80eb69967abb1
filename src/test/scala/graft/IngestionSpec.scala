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

  test("config-driven runner ingests to ORC: format string -> OrcSink ->" +
      " real .orc files") {
    val src = tmpDir("orc-run") + "/src"
    val out = tmpDir("orc-run") + "/out"
    writeSource(src)
    val cfgJson =
      s"""{"env": "test", "jobs": [{
         |  "domain": "payments", "dataset": "tx", "layer": "bronze",
         |  "validateSchema": false,
         |  "source": {"type": "parquet", "path": "$src"},
         |  "target": {"format": "orc", "identifier": "$out", "mode": "overwrite"}
         |}]}""".stripMargin
    val f = Paths.get(tmpDir("orc-runcfg"), "p.json")
    Files.writeString(f, cfgJson)
    IngestionRunner.runPipeline(spark, ConfigLoader.loadFromFile(f.toString))
      .length shouldBe 1
    val back = spark.read.orc(out)
    back.count() shouldBe 4
    new java.io.File(out).listFiles().map(_.getName)
      .count(_.endsWith(".orc")) should be >= 1
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

  test("watermark advances after a successful batch write (incremental loop)") {
    val src = tmpDir("wm") + "/src"
    val out = tmpDir("wm") + "/out"
    writeSource(src)
    val store = new graft.io.WatermarkStore(tmpDir("wmstore") + "/marks.json")
    val job = IngestionJob("d", "s", MedallionLayer.Bronze,
      FileReader("parquet", src), ParquetSink(),
      LakehouseTable(out, MedallionLayer.Bronze),
      watermarkAdvance = Some((store, "id", "d.s")))
    job.run(spark)
    // the mark is the batch max, so the next incremental read starts past it
    store.get("d.s") shouldBe Some("4")
  }

  test("quarantine split with NO quarantine sink advances the mark from clean rows only") {
    val src = tmpDir("wmq") + "/src"
    val out = tmpDir("wmq") + "/out"
    writeSource(src) // clean ids 1,3; bad ids 2,4
    val store = new graft.io.WatermarkStore(tmpDir("wmqstore") + "/marks.json")
    val job = IngestionJob("d", "s", MedallionLayer.Bronze,
      FileReader("parquet", src), ParquetSink(),
      LakehouseTable(out, MedallionLayer.Bronze),
      ruleSet = Some(DQRuleSet(
        Seq(RangeCheck("amount", Some(0.0), None),
          AllowedValuesCheck("currency", Seq("USD", "EUR"))),
        DQPolicy.QuarantineRows)),
      quarantine = None, // bad rows are stored NOWHERE in this config...
      watermarkAdvance = Some((store, "id", "d.s")))
    job.run(spark)
    // ...so the mark must not move past them: clean max (3), not read max (4)
    store.get("d.s") shouldBe Some("3")
  }

  test("runPipeline threads the watermark store through config (advance wired)") {
    val src = tmpDir("wmloop") + "/src"
    val out = tmpDir("wmloop") + "/out"
    val marks = tmpDir("wmloop") + "/marks.json"
    writeSource(src)
    val cfgJson =
      s"""{"env": "test", "watermarkStore": "$marks", "jobs": [{
         |  "domain": "payments", "dataset": "tx", "layer": "bronze",
         |  "validateSchema": false,
         |  "source": {"type": "parquet", "path": "$src", "watermarkColumn": "id"},
         |  "target": {"format": "parquet", "identifier": "$out", "mode": "overwrite"}
         |}]}""".stripMargin
    val f = Paths.get(tmpDir("wmloopcfg"), "p.json")
    Files.writeString(f, cfgJson)
    IngestionRunner.runPipeline(spark, ConfigLoader.loadFromFile(f.toString))
    new graft.io.WatermarkStore(marks).get("payments.tx") shouldBe Some("4")
  }

  test("piiMask hashes flagged strings, nulls non-strings, keeps the rest") {
    import org.apache.spark.sql.types._
    import graft.dq.PiiMask
    val schema = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("email", StringType, nullable = true,
        metadata = new MetadataBuilder().putBoolean("pii", true).build()),
      StructField("age", IntegerType, nullable = true,
        metadata = new MetadataBuilder().putBoolean("pii", true).build()),
      StructField("country", StringType, nullable = true,
        metadata = new MetadataBuilder().putBoolean("pii", false).build())))
    val df = Seq((1L, "a@example.com", 30, "DE"), (2L, null.asInstanceOf[String], 41, "US"))
      .toDF("id", "email", "age", "country")
    val out = PiiMask.mask(df, schema).orderBy("id").collect()
    out(0).getString(1) should fullyMatch regex "[0-9a-f]{64}" // sha2-256, type kept
    out(0).getString(1) should not be "a@example.com"
    out(0).getInt(2) should not be 30  // integral pii: xxhash64 fold, type kept
    out(0).getInt(2) should be >= 0    // ...and still joinable (deterministic)
    out(0).getString(3) shouldBe "DE"  // pii:false untouched
    out(1).isNullAt(1) shouldBe true   // null stays null (no minted hash)
    // deterministic: same input -> same digest (joinability survives)
    PiiMask.mask(df, schema).orderBy("id").collect()(0).getString(1) shouldBe
      out(0).getString(1)
    // redact strategy scrubs embedded pii instead of replacing the value
    val red = PiiMask.mask(df, schema,
      PiiMask.Strategy.RedactText(PiiMask.Strategy.defaultRules))
      .orderBy("id").collect()
    red(0).getString(1) shouldBe "<EMAIL>"
    an[IllegalArgumentException] should be thrownBy
      PiiMask.Strategy.fromString("rot13")
    // keyed hash: deterministic, but NOT equal to the unsalted digest —
    // the salt defeats dictionary attacks on low-entropy values
    PiiMask.Strategy.fromString("hash:S3cret") shouldBe
      PiiMask.Strategy.KeyedHash("S3cret")
    val keyed = PiiMask.mask(df, schema, PiiMask.Strategy.KeyedHash("S3cret"))
      .orderBy("id").collect()
    keyed(0).getString(1) should fullyMatch regex "[0-9a-f]{64}"
    keyed(0).getString(1) should not be out(0).getString(1)
    keyed(0).getInt(2) should not be out(0).getInt(2)
    keyed(1).isNullAt(1) shouldBe true
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

  test("streaming job masks pii per micro-batch (foreachBatch path)") {
    import org.apache.spark.sql.types._
    val in = tmpDir("spii") + "/in"
    val out = tmpDir("spii") + "/out"
    val cp = tmpDir("spii") + "/cp"
    Files.createDirectories(Paths.get(in))
    Seq((1L, "alice@x.com"), (2L, "bob@y.org")).toDF("id", "email")
      .write.mode(SaveMode.Overwrite).parquet(in)
    val schema = StructType(Seq(
      StructField("id", LongType, nullable = true),
      StructField("email", StringType, nullable = true,
        metadata = new MetadataBuilder().putBoolean("pii", true).build())))
    val job = IngestionJob("d", "s", MedallionLayer.Bronze,
      FileReader("parquet", in, schema = Some(schema), streaming = true),
      ParquetSink(),
      LakehouseTable(out, MedallionLayer.Bronze),
      expectedSchema = Some(schema),
      checkpoint = Some(cp),
      triggerInterval = "1 seconds",
      piiMask = Some(graft.dq.PiiMask.Strategy.Hash))
    val q = job.run(spark).streamingQuery.get
    q.processAllAvailable()
    q.stop()
    val rows = spark.read.parquet(out).orderBy("id").collect()
    rows should have length 2
    all(rows.map(_.getString(1))) should fullyMatch regex "[0-9a-f]{64}"
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

  test("runPipeline registers plugin catalogs; qualified DDL resolves via catalogManager") {
    val src = tmpDir("catreg") + "/src"
    val out = tmpDir("catreg") + "/out"
    writeSource(src)
    val cfgJson =
      s"""{"env": "test",
         |  "catalogs": [{"name": "extcat", "type": "iceberg",
         |    "options": {"type": "hive", "uri": "thrift://ms:9083"}}],
         |  "jobs": [{
         |  "domain": "d", "dataset": "s", "layer": "bronze",
         |  "validateSchema": false,
         |  "source": {"type": "parquet", "path": "$src"},
         |  "target": {"format": "parquet", "identifier": "$out", "mode": "overwrite"}
         |}]}""".stripMargin
    val f = Paths.get(tmpDir("catregcfg"), "p.json")
    Files.writeString(f, cfgJson)
    IngestionRunner.runPipeline(spark, ConfigLoader.loadFromFile(f.toString))
    // the catalog conf pairs are on the session (plugins instantiate only
    // on first reference, so an unreachable metastore costs nothing here)
    spark.conf.get("spark.sql.catalog.extcat") shouldBe
      "org.apache.iceberg.spark.SparkCatalog"
    spark.conf.get("spark.sql.catalog.extcat.uri") shouldBe "thrift://ms:9083"
    spark.read.parquet(out).count() shouldBe 4
    // ...and the adapter's catalog-QUALIFIED identifiers route through the
    // session's catalog manager (here against the built-in catalog)
    val cat = new SparkCatalogAdapter(spark)
    val schema = Seq((1L, "x")).toDF("id", "v").schema
    cat.createTableIfNotExists("spark_catalog.default.cat_e2e", schema, Seq.empty)
    cat.tableExists("spark_catalog.default.cat_e2e") shouldBe true
    spark.sql("DROP TABLE spark_catalog.default.cat_e2e")
  }

  test("checkpoint path derivation matches the reference layout") {
    IngestionJob("d", "s", MedallionLayer.Gold,
      FileReader("parquet", "/x"), ParquetSink(),
      LakehouseTable("/y", MedallionLayer.Gold))
      .defaultCheckpoint shouldBe "/tmp/checkpoints/d/s/gold"
  }

  test("ivm batch keys are injective: sources that SANITIZE identically " +
       "fold as distinct batches (no silent replace or skip)") {
    import org.apache.spark.sql.functions._
    // /deltas/b1 and /deltas_b1 both sanitize to _deltas_b1 — before the
    // raw-path hash suffix, the second group-fold silently REPLACED the
    // first one's partition and min/topk skipped the second batch entirely
    val root = tmpDir("graft-ivm-inj")
    val a = s"$root/deltas/b1"
    val b = s"$root/deltas_b1"
    Seq(("x", 10L), ("y", 5L)).toDF("k", "v")
      .write.mode("overwrite").parquet(a)
    Seq(("x", 7L), ("z", 2L)).toDF("k", "v")
      .write.mode("overwrite").parquet(b)
    def task(src: String, agg: String) = graft.config.MaintenanceConfig(
      `type` = "ivm", path = s"$root/state-$agg", source = Some(src),
      keys = Seq("k"), sums = if (agg == "group") Seq("v") else Seq.empty,
      columns = if (agg == "group") Seq.empty else Seq("v"), agg = agg,
      viewPath = Some(s"$root/view-$agg"))
    for (agg <- Seq("group", "min")) {
      IngestionRunner.runMaintenance(spark, task(a, agg))
      IngestionRunner.runMaintenance(spark, task(b, agg))
    }
    val grp = spark.read.parquet(s"$root/view-group")
      .collect().map(r => r.getAs[String]("k") ->
        r.getAs[Number]("v").longValue()).toMap
    grp shouldBe Map("x" -> 17L, "y" -> 5L, "z" -> 2L)
    val mn = spark.read.parquet(s"$root/view-min")
      .collect().map(r => r.getAs[String]("k") ->
        r.getAs[Number]("min_v").longValue()).toMap
    mn shouldBe Map("x" -> 7L, "y" -> 5L, "z" -> 2L)
    // replaying either batch is still a no-op
    IngestionRunner.runMaintenance(spark, task(a, "min"))
    spark.read.parquet(s"$root/view-min").collect()
      .map(r => r.getAs[String]("k") -> r.getAs[Number]("min_v").longValue())
      .toMap shouldBe mn
  }

  test("ivm snapshot protocol heals every crash window: leftover tmp dirs " +
       "are ignored, a published snapshot is never refolded, a lost view " +
       "re-publishes from state") {
    import org.apache.spark.sql.functions._
    val root = tmpDir("graft-ivm-crash")
    val src = s"$root/batch"
    Seq(("x", 10L), ("y", 5L)).toDF("k", "v")
      .write.mode("overwrite").parquet(src)
    val cfg = graft.config.MaintenanceConfig(
      `type` = "ivm", path = s"$root/st", source = Some(src),
      keys = Seq("k"), columns = Seq("v"), agg = "min",
      viewPath = Some(s"$root/view"))
    // crash BEFORE the atomic rename: a fully-written tmp dir exists but
    // no snapshot — the rerun must refold from nothing and publish once
    val tmp = new java.io.File(s"$root/st/.state-tmp-stale")
    tmp.mkdirs()
    java.nio.file.Files.writeString(tmp.toPath.resolve("junk"), "partial")
    IngestionRunner.runMaintenance(spark, cfg)
    val snaps = new java.io.File(s"$root/st").listFiles()
      .filter(_.getName.startsWith("state-")).map(_.getName).sorted
    snaps shouldBe Array("state-000001")
    def view() = spark.read.parquet(s"$root/view").collect()
      .map(r => r.getAs[String]("k") -> r.getAs[Number]("min_v").longValue())
      .toMap
    view() shouldBe Map("x" -> 10L, "y" -> 5L)
    // crash AFTER snapshot + marker but BEFORE the view write: rerun must
    // NOT refold (no state-000002), yet must re-publish the view
    rmrfDir(new java.io.File(s"$root/view"))
    IngestionRunner.runMaintenance(spark, cfg)
    new java.io.File(s"$root/st").listFiles()
      .filter(_.getName.startsWith("state-"))
      .map(_.getName).sorted shouldBe Array("state-000001")
    view() shouldBe Map("x" -> 10L, "y" -> 5L)
  }

  test("pointer-publish ivm heals every crash window without a directory " +
       "rename: orphan data dirs are invisible, a committed pointer is " +
       "never refolded, rename-published history still reads") {
    import org.apache.spark.sql.functions._
    val root = tmpDir("graft-ivm-ptr")
    val src1 = s"$root/b1"
    val src2 = s"$root/b2"
    Seq(("x", 10L), ("y", 5L)).toDF("k", "v").write.parquet(src1)
    Seq(("x", 7L), ("z", 2L)).toDF("k", "v").write.parquet(src2)
    def cfg(src: String) = graft.config.MaintenanceConfig(
      `type` = "ivm", path = s"$root/st", source = Some(src),
      keys = Seq("k"), columns = Seq("v"), agg = "min",
      viewPath = Some(s"$root/view"), publish = "pointer")
    // crash BEFORE the commit pointer: a fully-written data dir exists
    // but no _commits entry — it must stay invisible and the rerun must
    // overwrite it in place (same deterministic name) and commit once
    val orphan = new java.io.File(s"$root/st/state-p-000001-deadbe")
    orphan.mkdirs()
    java.nio.file.Files.writeString(orphan.toPath.resolve("junk"), "partial")
    IngestionRunner.runMaintenance(spark, cfg(src1))
    def view() = spark.read.parquet(s"$root/view").collect()
      .map(r => r.getAs[String]("k") -> r.getAs[Number]("min_v").longValue())
      .toMap
    view() shouldBe Map("x" -> 10L, "y" -> 5L)
    val commits1 = new java.io.File(s"$root/st/_commits").list()
      .filterNot(_.startsWith(".")).sorted
    commits1 shouldBe Array("000001")
    // the orphan name was unrelated (different key hash) — still exactly
    // one POINTED snapshot; the orphan is ignored by readers
    // crash AFTER commit but BEFORE the view write: rerun must NOT refold
    // (no second commit), yet must re-publish the view
    rmrfDir(new java.io.File(s"$root/view"))
    IngestionRunner.runMaintenance(spark, cfg(src1))
    new java.io.File(s"$root/st/_commits").list().filterNot(_.startsWith(".")).sorted shouldBe Array("000001")
    view() shouldBe Map("x" -> 10L, "y" -> 5L)
    // a second batch folds on top as commit 000002
    IngestionRunner.runMaintenance(spark, cfg(src2))
    new java.io.File(s"$root/st/_commits").list()
      .filterNot(_.startsWith(".")).sorted shouldBe
      Array("000001", "000002")
    view() shouldBe Map("x" -> 7L, "y" -> 5L, "z" -> 2L)
    // mixed-protocol history: a store with a rename-published snapshot
    // continues under pointer publish, reading the rename snapshot as base
    val root2 = tmpDir("graft-ivm-ptr2")
    Seq(("x", 10L), ("y", 5L)).toDF("k", "v").write.parquet(s"$root2/b1")
    Seq(("x", 7L), ("z", 2L)).toDF("k", "v").write.parquet(s"$root2/b2")
    def cfg2(src: String, publish: String) = graft.config.MaintenanceConfig(
      `type` = "ivm", path = s"$root2/st", source = Some(src),
      keys = Seq("k"), columns = Seq("v"), agg = "min",
      viewPath = Some(s"$root2/view"), publish = publish)
    IngestionRunner.runMaintenance(spark, cfg2(s"$root2/b1", "rename"))
    IngestionRunner.runMaintenance(spark, cfg2(s"$root2/b2", "pointer"))
    spark.read.parquet(s"$root2/view").collect()
      .map(r => r.getAs[String]("k") -> r.getAs[Number]("min_v").longValue())
      .toMap shouldBe Map("x" -> 7L, "y" -> 5L, "z" -> 2L)
    new java.io.File(s"$root2/st").list().count(_ == "state-000001") shouldBe 1
    new java.io.File(s"$root2/st/_commits").list().filterNot(_.startsWith(".")).sorted shouldBe Array("000002")
  }

  test("dedup-index and profile maintenance are crash-atomic: appliedness " +
       "travels inside the renamed batch unit, partial units heal, " +
       "replays skip, legacy root-file stores still fold") {
    import org.apache.spark.sql.functions._
    val root = tmpDir("graft-atomic-append")
    val src = s"$root/docs"
    Seq((1L, "alpha beta gamma delta"), (2L, "epsilon zeta eta theta"))
      .toDF("doc_id", "text").write.parquet(src)
    // --- dedup-index: crash AFTER fingerprints but BEFORE bands — the
    // batch reads as not-applied, the rerun overwrites the partial unit
    val idx = s"$root/idx"
    val partial = new java.io.File(s"$idx/fingerprints/batch-garbage")
    partial.mkdirs() // unrelated partial unit must not block anything
    def idxTask = graft.config.MaintenanceConfig(
      `type` = "dedup-index", path = idx, source = Some(src),
      columns = Seq("doc_id", "text"))
    IngestionRunner.runMaintenance(spark, idxTask)
    graft.similarity.DedupIndex.exists(spark, idx) shouldBe true
    val (fps, bands) = graft.similarity.DedupIndex.load(spark, idx)
    fps.count() shouldBe 2
    val bandCount = bands.count()
    // replay: nothing re-appended (appliedness is the bands batch dir)
    IngestionRunner.runMaintenance(spark, idxTask)
    val (fps2, bands2) = graft.similarity.DedupIndex.load(spark, idx)
    fps2.count() shouldBe 2
    bands2.count() shouldBe bandCount
    // crash window: bands unit missing -> not applied -> rerun completes
    rmrfDir(new java.io.File(s"$idx/bands"))
    IngestionRunner.runMaintenance(spark, idxTask)
    graft.similarity.DedupIndex.load(spark, idx)._2.count() shouldBe bandCount
    // --- profile: batch unit is atomic, replay skips, legacy root files
    // (pre-r9 plain append) still participate in the fold
    val store = s"$root/prof"
    graft.metrics.ProfileStore.append(
      Seq((9L, "legacy")).toDF("doc_id", "text"), Seq("doc_id"), store)
    def profTask = graft.config.MaintenanceConfig(
      `type` = "profile", path = store, source = Some(src),
      columns = Seq("doc_id"))
    IngestionRunner.runMaintenance(spark, profTask)
    def nRows() = graft.metrics.ProfileStore.current(spark, store)
      .filter(col("column") === "doc_id").collect()
      .head.getAs[Number]("n_rows").longValue()
    nRows() shouldBe 3 // 1 legacy + 2 batch rows folded together
    IngestionRunner.runMaintenance(spark, profTask) // replay: no change
    nRows() shouldBe 3
    // leftover tmp dir from a crashed attempt is invisible to the fold
    new java.io.File(s"$store/.tmp-stale").mkdirs()
    nRows() shouldBe 3
  }

  test("pointer-publish appends heal every crash window on dedup-index " +
       "and profile stores: uncommitted units invisible, reruns complete, " +
       "replays skip, lost commit races surface, modes mix on one store") {
    import org.apache.spark.sql.functions._
    import graft.similarity.DedupIndex
    import graft.metrics.ProfileStore
    val root = tmpDir("graft-pointer-append")
    val idx = s"$root/idx"
    val b1 = Seq((1L, "alpha beta gamma delta"),
      (2L, "epsilon zeta eta theta")).toDF("doc_id", "text")
    // --- dedup-index, pointer mode: publish, read, replay-skip
    DedupIndex.appendAtomic(b1, "doc_id", "text", idx, "k1",
      publish = "pointer")
    DedupIndex.batchApplied(spark, idx, "k1") shouldBe true
    DedupIndex.load(spark, idx)._1.count() shouldBe 2
    // crash window: data dirs fully written but the commit file missing —
    // the batch reads as NOT applied and its rows are INVISIBLE
    val b2 = Seq((3L, "iota kappa lambda mu")).toDF("doc_id", "text")
    DedupIndex.appendAtomic(b2, "doc_id", "text", idx, "k2",
      publish = "pointer")
    new java.io.File(s"$idx/_commits/k2").delete() shouldBe true
    DedupIndex.batchApplied(spark, idx, "k2") shouldBe false
    DedupIndex.load(spark, idx)._1.count() shouldBe 2
    // the rerun overwrites the orphaned unit in place and commits it
    DedupIndex.appendAtomic(b2, "doc_id", "text", idx, "k2",
      publish = "pointer")
    DedupIndex.batchApplied(spark, idx, "k2") shouldBe true
    DedupIndex.load(spark, idx)._1.count() shouldBe 3
    // lost commit race: someone else published this key concurrently
    val marker = new java.io.File(s"$idx/_commits/k3")
    marker.createNewFile() shouldBe true
    val b3 = Seq((4L, "nu xi omicron pi")).toDF("doc_id", "text")
    intercept[IllegalStateException] {
      DedupIndex.appendAtomic(b3, "doc_id", "text", idx, "k3",
        publish = "pointer")
    }.getMessage should include("commit race")
    // modes mix on one store: a rename-published unit reads alongside
    // the committed pointer units (it is its own commit)
    marker.delete() shouldBe true
    DedupIndex.appendAtomic(b3, "doc_id", "text", idx, "k4")
    DedupIndex.load(spark, idx)._1.count() shouldBe 4
    // runMaintenance drives the pointer mode through config
    val src = s"$root/docs"
    Seq((9L, "rho sigma tau upsilon")).toDF("doc_id", "text")
      .write.parquet(src)
    val task = graft.config.MaintenanceConfig(
      `type` = "dedup-index", path = idx, source = Some(src),
      columns = Seq("doc_id", "text"), publish = "pointer")
    IngestionRunner.runMaintenance(spark, task)
    DedupIndex.load(spark, idx)._1.count() shouldBe 5
    IngestionRunner.runMaintenance(spark, task) // replay: no change
    DedupIndex.load(spark, idx)._1.count() shouldBe 5
    // --- profile store, pointer mode: same three windows
    val store = s"$root/prof"
    ProfileStore.appendAtomic(b1, Seq("doc_id"), store, "p1",
      publish = "pointer")
    def nRows2() = ProfileStore.current(spark, store)
      .filter(col("column") === "doc_id").collect()
      .head.getAs[Number]("n_rows").longValue()
    nRows2() shouldBe 2
    ProfileStore.appendAtomic(b2, Seq("doc_id"), store, "p2",
      publish = "pointer")
    new java.io.File(s"$store/_commits/p2").delete() shouldBe true
    ProfileStore.batchApplied(spark, store, "p2") shouldBe false
    nRows2() shouldBe 2 // uncommitted unit invisible to the fold
    ProfileStore.appendAtomic(b2, Seq("doc_id"), store, "p2",
      publish = "pointer")
    nRows2() shouldBe 3
    new java.io.File(s"$store/_commits/p9").createNewFile() shouldBe true
    intercept[IllegalStateException] {
      ProfileStore.appendAtomic(b3, Seq("doc_id"), store, "p9",
        publish = "pointer")
    }.getMessage should include("commit race")
  }

  test("pre-r8 stores (unsuffixed batch keys) are not refolded: legacy " +
       "group partitions overwrite in place, legacy min snapshots and " +
       "_applied markers still count as applied") {
    import org.apache.spark.sql.functions._
    val root = tmpDir("graft-ivm-legacy")
    val src = s"$root/deltas/b1"
    val legacyKey = src.replaceAll("[^A-Za-z0-9._-]", "_") // pre-r8 format
    Seq(("x", 10L), ("y", 5L)).toDF("k", "v")
      .write.mode("overwrite").parquet(src)
    // --- group: a legacy partition exists for this source; the rerun must
    // REPLACE it (same key), not write a second sha-suffixed partition
    // that double-counts the batch in the fold
    graft.transform.Ivm.appendIdempotent(
      graft.transform.Ivm.viewDelta(
        graft.transform.Ivm.asZ(spark.read.parquet(src)),
        Seq("k"), Seq("v" -> col("v"))),
      s"$root/stg", legacyKey)
    IngestionRunner.runMaintenance(spark, graft.config.MaintenanceConfig(
      `type` = "ivm", path = s"$root/stg", source = Some(src),
      keys = Seq("k"), sums = Seq("v"), agg = "group",
      viewPath = Some(s"$root/view-g")))
    spark.read.parquet(s"$root/view-g").collect()
      .map(r => r.getAs[String]("k") -> r.getAs[Number]("v").longValue())
      .toMap shouldBe Map("x" -> 10L, "y" -> 5L)
    new java.io.File(s"$root/stg").listFiles()
      .count(_.getName.startsWith("_batch_key=")) shouldBe 1
    // --- min: a legacy snapshot whose _batch_key holds the UNSUFFIXED key
    // must read as already-applied (no state-000002, no double-counted
    // n_rows), and the view must re-publish from it
    val snap = s"$root/stm/state-000001"
    Seq(("x", 10L, 1L), ("y", 5L, 1L)).toDF("k", "min_v", "n_rows")
      .write.mode("overwrite").parquet(snap)
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(snap, "_batch_key"), legacyKey)
    IngestionRunner.runMaintenance(spark, graft.config.MaintenanceConfig(
      `type` = "ivm", path = s"$root/stm", source = Some(src),
      keys = Seq("k"), columns = Seq("v"), agg = "min",
      viewPath = Some(s"$root/view-m")))
    new java.io.File(s"$root/stm").listFiles()
      .filter(_.getName.startsWith("state-"))
      .map(_.getName).sorted shouldBe Array("state-000001")
    spark.read.parquet(s"$root/view-m").collect()
      .map(r => r.getAs[String]("k") ->
        (r.getAs[Number]("min_v").longValue(),
          r.getAs[Number]("n_rows").longValue()))
      .toMap shouldBe Map("x" -> (10L, 1L), "y" -> (5L, 1L))
    // --- profile (ifNotApplied): a legacy marker must skip the append
    val store = s"$root/prof"
    new java.io.File(s"$store/_applied").mkdirs()
    java.nio.file.Files.createFile(
      java.nio.file.Paths.get(store, "_applied", legacyKey))
    IngestionRunner.runMaintenance(spark, graft.config.MaintenanceConfig(
      `type` = "profile", path = store, source = Some(src),
      columns = Seq("k", "v")))
    // skipped: no profile data landed beyond the marker dir
    new java.io.File(store).listFiles().map(_.getName).toSet shouldBe
      Set("_applied")
  }

  test("maintenance: dedup-index-compact and dedup-index-rebucket run the " +
       "index maintenance from pipeline config") {
    import graft.core.IngestionRunner
    val root = tmpDir("mnt-idx")
    val idx = s"$root/index"
    val docs = (0L until 40L)
      .map(i => (i, s"nu xi omicron doc $i tail ${i * 17}"))
      .toDF("doc_id", "text")
    graft.similarity.DedupIndex.build(docs, "doc_id", "text", idx)
    (1 to 3).foreach(b => graft.similarity.DedupIndex.append(
      docs.withColumn("doc_id",
        org.apache.spark.sql.functions.col("doc_id") + b * 1000L),
      "doc_id", "text", idx))
    IngestionRunner.runMaintenance(spark, graft.config.MaintenanceConfig(
      `type` = "dedup-index-compact", path = idx))
    graft.lakehouse.Compaction.parquetFileCount(spark, s"$idx/bands") shouldBe 8
    IngestionRunner.runMaintenance(spark, graft.config.MaintenanceConfig(
      `type` = "dedup-index-rebucket", path = idx, buckets = 16))
    graft.similarity.DedupIndex.manifest(spark, idx).numBuckets shouldBe 16
    graft.similarity.DedupIndex.load(spark, idx)._1.count() shouldBe 160L
    // rebucket without a bucket count refuses loudly
    an[IllegalArgumentException] should be thrownBy
      IngestionRunner.runMaintenance(spark, graft.config.MaintenanceConfig(
        `type` = "dedup-index-rebucket", path = idx))
  }

  private def rmrfDir(p: java.io.File): Unit = {
    if (p.isDirectory) p.listFiles.foreach(rmrfDir)
    p.delete(); ()
  }
}
