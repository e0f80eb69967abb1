package graft

import org.apache.spark.sql.functions._

import graft.plans.JaccardRewrite

class RewriteSpec extends SparkSpec {
  import spark.implicits._

  private def withRule[A](f: => A): A = {
    val prev = spark.experimental.extraOptimizations
    spark.experimental.extraOptimizations = prev :+ JaccardRewrite
    try f finally spark.experimental.extraOptimizations = prev
  }

  // parquet-backed (a LocalRelation source would be constant-folded away
  // before the plan can be inspected)
  private lazy val df = {
    val p = tmpDir("rw") + "/t"
    Seq(("a b c d", "b c d e"), ("x y", "x y")).toDF("ta", "tb")
      .write.mode("overwrite").parquet(p)
    spark.read.parquet(p)
      .select(array_distinct(split(col("ta"), " ")).as("a"),
        array_distinct(split(col("tb"), " ")).as("b"))
  }

  private val declarative =
    org.apache.spark.sql.functions.size(array_intersect(col("a"), col("b"))).cast("double") /
      org.apache.spark.sql.functions.size(array_union(col("a"), col("b"))).cast("double")

  test("declarative jaccard idiom is rewritten to the compiled expression") {
    withRule {
      val q = df.select(declarative.as("j"))
      q.queryExecution.optimizedPlan.toString should include("jaccard_sim")
    }
  }

  test("rewrite preserves results exactly") {
    val before = df.select(declarative.as("j")).collect().map(_.getDouble(0))
    val after = withRule(df.select(declarative.as("j")).collect().map(_.getDouble(0)))
    after shouldBe before
  }

  test("rewrite does NOT fire on possibly-duplicated inputs") {
    withRule {
      val p = tmpDir("rwdup") + "/t"
      Seq((Seq("a", "a"), Seq("a"))).toDF("a", "b")
        .write.mode("overwrite").parquet(p)
      val raw = spark.read.parquet(p)
      val q = raw.select(
        (org.apache.spark.sql.functions.size(array_intersect(col("a"), col("b"))).cast("double") /
          org.apache.spark.sql.functions.size(array_union(col("a"), col("b"))).cast("double")).as("j"))
      q.queryExecution.optimizedPlan.toString should not include "jaccard_sim"
      // built-in semantics on duplicated input: intersect/union dedup -> 1/1
      q.collect()(0).getDouble(0) shouldBe 1.0
    }
  }

  test("graft expressions are SQL-callable via the extension registry") {
    // shared test session is built by GraftSession -> extensions installed
    val row = spark.sql(
      """SELECT jaccard_sim(array('a','b'), array('b','c')) AS j,
        |  dot_product(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS d,
        |  rolling_hash('abc') AS rh,
        |  size(word_ngrams(array('x','y','z'), 2)) AS ng,
        |  size(minhash_sig(array('s1','s2'), 4)) AS ms,
        |  winnow(array(5L, 3L, 8L, 1L), 2) AS wn,
        |  search_sorted(15.0d, array(10.0d, 20.0d, 30.0d)) AS ss,
        |  decodable_media(CAST('junk' AS BINARY), 'image/png') AS dm,
        |  stable_bucket(42, 1000) AS sb,
        |  modal_count(array('a','b','a','a')) AS mc,
        |  CAST(entropy_term_sum(array('a','a','b')) AS DOUBLE) AS ets
        |""".stripMargin).collect()(0)
    row.getDouble(0) shouldBe (1.0 / 3.0)
    row.getDouble(1) shouldBe 11.0
    row.getLong(2) shouldBe "abc".codePoints().toArray
      .foldLeft(0L)((a, c) => (a * 131 + c) % 2147483647L)
    row.getInt(3) shouldBe 2
    row.getInt(4) shouldBe 4
    row.getSeq[Long](5) shouldBe Seq(3L, 1L)
    row.getInt(6) shouldBe 1
    row.getBoolean(7) shouldBe false // junk bytes don't decode as PNG
    // stable_bucket must agree with the Column API (same md5-derived hash)
    val viaColumn = spark.range(1).select(
      graft.functions.StableHash.bucket(org.apache.spark.sql.functions.lit(42), 1000))
      .collect()(0).getLong(0)
    row.getLong(8) shouldBe viaColumn
    row.getLong(9) shouldBe 3L
    row.getDouble(10) shouldBe (2.0 * math.log(2.0) +- 1e-9)
  }

  test("search_sorted accepts plain SQL decimal and integer literal bounds") {
    // array(0.25, 0.5, 0.75) is ArrayType(DecimalType) — elements are Spark
    // Decimal (not java.lang.Number), the natural spelling a SQL user writes
    val row = spark.sql(
      """SELECT search_sorted(0.6d, array(0.25, 0.5, 0.75)) AS dec_ss,
        |  search_sorted(15.0d, array(10, 20, 30)) AS int_ss
        |""".stripMargin).collect()(0)
    row.getInt(0) shouldBe 2
    row.getInt(1) shouldBe 1
    // NULL boundary elements fail with a pointed error, not an NPE
    val err = intercept[Exception] {
      spark.sql("SELECT search_sorted(1.0d, array(1.0d, NULL))").collect()
    }
    err.getMessage should include("must not contain NULL")
  }

  test("GraftExtensions injects the rule at session build time") {
    // separate session so withExtensions applies cleanly
    val s2 = org.apache.spark.sql.SparkSession.builder()
      .master("local[2]").appName("ext-test")
      .withExtensions(new graft.plans.GraftExtensions)
      .getOrCreate()
    // getOrCreate may return the shared session; only assert when it's new
    if (s2 ne spark) {
      import s2.implicits._
      val d2 = Seq(("a b", "a c")).toDF("ta", "tb")
        .select(array_distinct(split(col("ta"), " ")).as("a"),
          array_distinct(split(col("tb"), " ")).as("b"))
        .select((org.apache.spark.sql.functions.size(array_intersect(col("a"), col("b"))).cast("double") /
          org.apache.spark.sql.functions.size(array_union(col("a"), col("b"))).cast("double")).as("j"))
      d2.queryExecution.optimizedPlan.toString should include("jaccard_sim")
    }
  }
}
