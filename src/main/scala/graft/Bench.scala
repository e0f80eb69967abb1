package graft
import org.apache.spark.sql.SparkSession
import scala.util.{Failure, Success, Try}

object Bench {
  private def jsonEscape(s: String): String =
    s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Untimed warmup: JIT/codegen/session init + parquet footers, so the
    // first measured query isn't charged for cold-start. Goes through the
    // Tables loaders (not raw spark.read) because events.parquet has shipped
    // as TIMESTAMP(NANOS) in some testdata generations and the loader holds
    // the compat handling; a warmup failure is a harness bug and must be
    // visible, not swallowed.
    Seq("lineitem", "orders", "documents", "embeddings").foreach(t =>
      tables.Tables.load(spark, sfDir, t).count())
    tables.Tables.events(spark, sfDir).count()
    // ...and one composite untimed pipeline: scan → regex normalize → md5 →
    // hash aggregate → join → window → sort. Counts alone leave the common
    // operator kernels un-JITed, so whichever query ran FIRST was charged
    // seconds of Janino/C2 compilation (r4 recorded q44 at 9.2s first
    // sample vs 0.21s steady — a 44x artifact spread, not a plan cost).
    locally {
      import org.apache.spark.sql.functions._
      import org.apache.spark.sql.expressions.Window
      val docs = tables.Tables.documents(spark, sfDir).limit(2000)
      val norm = docs.select(col("doc_id"),
        md5(regexp_replace(lower(col("text")), "[^\\p{L}\\p{Nd} ]", " ")).as("h"))
      norm.groupBy(col("h"))
        .agg(count(lit(1)).as("c"), min(col("doc_id")).as("doc_id"))
        .join(docs, "doc_id")
        .withColumn("rn", row_number().over(
          Window.partitionBy(col("c")).orderBy(col("doc_id"))))
        .orderBy(col("doc_id")).count()
    }
    // best-of-2 normally: the first execution pays one-off plan compilation
    // + JIT (constant at any data scale); the min approximates steady-state
    // cost. When the two runs disagree >3x, one slot was machine noise
    // (another tenant on the box) — take a third run so a single noisy slot
    // can't dominate the reported number. Per-query run spread (max/min) is
    // recorded so a noisy session is visible in the output itself.
    // A query that throws is recorded as an error entry — never as a time.
    // SPARK_GRAFT_ONLY=q226,q283 restricts the timed set — dev-loop
    // convenience mirroring Verify; the driver leaves it unset.
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    def selected(name: String): Boolean =
      only.forall(_.exists(name.startsWith))
    val results: Seq[(String, Either[String, (Double, Double)])] =
      SparkEntry.queries.toSeq.filter(kv => selected(kv._1))
        .map { case (name, fn) =>
        def once(): Either[String, Double] = {
          val t0 = System.nanoTime()
          Try(fn(spark, sfDir).count()) match {
            case Success(_)  => Right((System.nanoTime() - t0) / 1e9)
            case Failure(ex) => Left(s"${ex.getClass.getSimpleName}: ${Option(ex.getMessage).getOrElse("").take(200)}")
          }
        }
        val two = Seq(once(), once())
        val noisy = two.collect { case Right(t) => t } match {
          case ts if ts.size == 2 => ts.max / ts.min > 3.0
          case _                  => false
        }
        val runs = if (noisy) two :+ once() else two
        val ok = runs.collect { case Right(t) => t }
        name -> (if (ok.nonEmpty) Right((ok.min, ok.max / ok.min))
                 else Left(runs.collectFirst { case Left(e) => e }.getOrElse("unknown")))
      }
    val qs = results.map {
      case (k, Right((t, _))) => s"\"$k\":$t"
      case (k, Left(e))       => s"\"$k\":{\"error\":\"${jsonEscape(e)}\"}"
    }.mkString("{", ",", "}")
    val spreads = results.collect { case (k, Right((_, s))) =>
      s"\"$k\":${math.round(s * 100) / 100.0}" }.mkString("{", ",", "}")
    val errors = results.collect { case (k, Left(e)) => k -> e }
    val total = results.collect { case (_, Right((t, _))) => t }.sum
    val full = s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"run_spread":$spreads,"n_errors":${errors.size},"sf":"$sfDir"}"""
    // The full per-query JSON (361 queries) overflows what the driver's
    // stdout capture retains (r5 recorded "parsed": null with only the tail
    // ~80 timings) — so the complete record goes to a FILE artifact, and
    // stdout carries one short parseable line: totals + the slowest 25
    // queries (the ones a perf judge needs), always well under any capture
    // window. target/ is git-ignored; bench_full.json is committed per
    // round as tools/bench_full_r{N}.json by the round bookkeeping.
    val artifact = java.nio.file.Paths.get("target/bench_full.json")
    java.nio.file.Files.createDirectories(artifact.getParent)
    java.nio.file.Files.writeString(artifact, full + "\n")
    val slowest = results.collect { case (k, Right((t, _))) => k -> t }
      .sortBy(-_._2).take(25)
      .map { case (k, t) => s"\"$k\":$t" }.mkString("{", ",", "}")
    val errJson = errors.take(10)
      .map { case (k, e) => s"\"$k\":\"${jsonEscape(e)}\"" }.mkString("{", ",", "}")
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$slowest,"n_queries":${results.size},"n_errors":${errors.size},"errors":$errJson,"sf":"$sfDir","full_json":"target/bench_full.json"}""")
    spark.stop()
    if (errors.nonEmpty) {
      errors.foreach { case (k, e) => System.err.println(s"[bench] FAILED $k: $e") }
      sys.exit(1)
    }
  }
}
