package graft

import org.apache.spark.sql.DataFrame

import graft.dq._

class DQSpec extends SparkSpec {
  import spark.implicits._

  private def df: DataFrame = Seq(
    (1L, Some(10.0), "USD", "a@x.com"),
    (2L, Some(-5.0), "USD", "bad-email"),
    (3L, None, "EUR", "c@x.com"),
    (3L, Some(2.0), "XXX", "d@x.com"),
  ).toDF("id", "amount", "currency", "email")

  private val checks = Seq(
    NotNullCheck("amount"),
    RangeCheck("amount", Some(0.0), None),
    AllowedValuesCheck("currency", Seq("USD", "EUR")),
    RegexCheck("email", "^[^@]+@[^@]+$"),
    UniqueKeyCheck(Seq("id")),
    RowCountCheck(2),
  )

  test("single-pass ruleset counts violations per check") {
    val summary = DQRuleSet(checks).run(df)
    summary.rowCount shouldBe 4
    val byName = summary.results.map(r => r.check -> r.violations).toMap
    byName("notnull_amount") shouldBe 1
    byName("range_amount") shouldBe 1
    byName("allowed_currency") shouldBe 1
    byName("regex_email") shouldBe 1
    byName("unique_id") shouldBe 1 // 4 rows, 3 distinct ids
    byName("row_count_min") shouldBe 0
    summary.overall shouldBe DQStatus.Fail
  }

  test("metricsDF is one aggregate job (one row, k+1 columns)") {
    val m = DQRuleSet(checks).metricsDF(df)
    m.columns.length shouldBe checks.length + 1
    m.count() shouldBe 1
  }

  test("NotNullCheck tolerates null fraction up to its threshold") {
    // 1 null in 4 rows = 25%
    DQRuleSet(Seq(NotNullCheck("amount", maxNullFraction = 0.30)))
      .run(df).overall shouldBe DQStatus.Pass
    DQRuleSet(Seq(NotNullCheck("amount", maxNullFraction = 0.20)))
      .run(df).overall shouldBe DQStatus.Fail
  }

  test("warnOnly demotes failures to warnings") {
    val rs = DQRuleSet(Seq(NotNullCheck("amount")), warnOnly = Set("notnull_amount"))
    rs.run(df).overall shouldBe DQStatus.Warning
  }

  test("FailFast throws DQException") {
    val rs = DQRuleSet(Seq(NotNullCheck("amount")), DQPolicy.FailFast)
    a[DQException] should be thrownBy rs.enforce(df)
  }

  test("LogOnly passes everything through") {
    val (clean, bad, summary) = DQRuleSet(Seq(NotNullCheck("amount"))).enforce(df)
    clean.count() shouldBe 4
    bad shouldBe None
    summary.overall shouldBe DQStatus.Fail
  }

  test("Quarantine splits rows and tags reasons") {
    val rs = DQRuleSet(checks, DQPolicy.QuarantineRows)
    val (clean, bad, _) = rs.enforce(df)
    clean.count() shouldBe 1 // only id=1 passes every row-level check
    val badRows = bad.get.collect()
    badRows.length shouldBe 3
    val reasons = badRows.map(r =>
      r.getLong(r.fieldIndex("id")) -> r.getString(r.fieldIndex("dq_reasons"))).toMap
    reasons(2L) should include("range_amount")
    reasons(2L) should include("regex_email")
    reasons(3L) should (include("notnull_amount") or include("allowed_currency"))
  }

  test("approximate unique check uses HLL and stays close") {
    val big = (1L to 1000L).toDF("id")
    val rs = DQRuleSet(Seq(UniqueKeyCheck(Seq("id"), exact = false)))
    val v = rs.run(big).results.head.violations
    math.abs(v) should be <= 50L // HLL error margin around 0 duplicates
  }

  test("Observed metrics ride along a batch action at zero extra scans") {
    import graft.metrics.{Observed, TableMetrics}
    val (observed, obs) = Observed.withMetrics(df,
      Seq(TableMetrics.RowCount(), TableMetrics.NullCount("amount", "amount_nulls")))
    observed.write.mode("overwrite").parquet(tmpDir("obs") + "/out")
    val row = obs.get
    row("row_count") shouldBe 4L
    row("amount_nulls") shouldBe 1L
  }

  test("metadata-derived checks from StructField metadata") {
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("amount", DoubleType, nullable = false,
        new MetadataBuilder().putDouble("min_value", 0.0).build()),
      StructField("currency", StringType, nullable = true,
        new MetadataBuilder().putStringArray("allowed_values", Array("USD", "EUR")).build()),
    ))
    val derived = MetadataChecks.fromSchema(schema)
    derived.map(_.name) should contain allOf ("notnull_amount", "range_amount", "allowed_currency")
  }
}
