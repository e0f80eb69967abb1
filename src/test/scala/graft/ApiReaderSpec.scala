package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType, StructType}

import graft.config.{JobConfig, SourceConfig, TargetConfig}
import graft.core.IngestionRunner
import graft.io.{ApiReader, FileFetcher, KinesisReader, Pagination}

/** API-dump + Kinesis sources (the last open §2B row): pagination modes,
  * corrupt-record policy, cursor chaining, and the config factory wiring —
  * all e2e against on-disk API dumps via FileFetcher. */
class ApiReaderSpec extends SparkSpec {

  private val recSchema = new StructType()
    .add("id", LongType).add("lang", StringType).add("n", LongType)

  private def writePage(dir: String, name: String, content: String): Unit = {
    Files.createDirectories(Paths.get(dir))
    Files.writeString(Paths.get(dir, name), content)
  }

  test("page-number mode fans pages across partitions and stops at the end") {
    val dir = tmpDir("api-pages")
    for (p <- 0 until 4)
      writePage(dir, s"page-$p.json",
        s"""{"data": [{"id": ${p * 2}, "lang": "en", "n": 1},
           |          {"id": ${p * 2 + 1}, "lang": "de", "n": 2}]}""".stripMargin)
    val df = ApiReader(
      Pagination.PageNumber(s"$dir/page-{page}.json", maxPages = 50),
      recSchema, recordsField = Some("data"), fetcher = FileFetcher(),
      parallelism = 4).read(spark)
    df.count() shouldBe 8 // maxPages=50 but only 4 pages exist
    df.filter(col("_corrupt_record").isNotNull).count() shouldBe 0
    df.agg(sum(col("id"))).head.getLong(0) shouldBe (0 until 8).sum
  }

  test("a malformed page surfaces as _corrupt_record, not a silent drop") {
    val dir = tmpDir("api-corrupt")
    writePage(dir, "page-0.json", """{"data": [{"id": 1, "lang": "en", "n": 1}]}""")
    writePage(dir, "page-1.json", """this is not json {{{""")
    val df = ApiReader(
      Pagination.PageNumber(s"$dir/page-{page}.json", maxPages = 10),
      recSchema, recordsField = Some("data"), fetcher = FileFetcher()).read(spark)
    val good = df.filter(col("_corrupt_record").isNull)
    val bad = df.filter(col("_corrupt_record").isNotNull)
    good.count() shouldBe 1
    bad.count() shouldBe 1
    bad.head.getAs[String]("_corrupt_record") should include("not json")
  }

  test("bare-array bodies parse without a records field") {
    val dir = tmpDir("api-bare")
    writePage(dir, "page-0.json", """[{"id": 7, "lang": "fr", "n": 3}]""")
    val df = ApiReader(
      Pagination.PageNumber(s"$dir/page-{page}.json", maxPages = 5),
      recSchema, recordsField = None, fetcher = FileFetcher()).read(spark)
    df.select("id", "lang", "n").head shouldBe
      org.apache.spark.sql.Row(7L, "fr", 3L)
  }

  test("cursor mode walks the next-field chain sequentially and honors maxPages") {
    val dir = tmpDir("api-cursor")
    writePage(dir, "a.json",
      s"""{"items": [{"id": 1, "lang": "en", "n": 1}], "next": "$dir/b.json"}""")
    writePage(dir, "b.json",
      s"""{"items": [{"id": 2, "lang": "en", "n": 1}], "next": "$dir/c.json"}""")
    writePage(dir, "c.json",
      """{"items": [{"id": 3, "lang": "en", "n": 1}]}""")
    val all = ApiReader(
      Pagination.Cursor(s"$dir/a.json", nextField = "next"),
      recSchema, recordsField = Some("items"), fetcher = FileFetcher(),
      spoolDir = Some(tmpDir("api-spool-all"))).read(spark)
    all.select("id").as[Long](org.apache.spark.sql.Encoders.scalaLong)
      .collect().sorted shouldBe Array(1L, 2L, 3L)
    val capped = ApiReader(
      Pagination.Cursor(s"$dir/a.json", nextField = "next", maxPages = 2),
      recSchema, recordsField = Some("items"), fetcher = FileFetcher(),
      spoolDir = Some(tmpDir("api-spool-cap"))).read(spark)
    capped.count() shouldBe 2
  }

  test("cursor token mode substitutes the next token into the url template") {
    val dir = tmpDir("api-token")
    writePage(dir, "tok-start.json",
      """{"items": [{"id": 10, "lang": "en", "n": 1}], "cursor": "t2"}""")
    writePage(dir, "tok-t2.json",
      """{"items": [{"id": 11, "lang": "en", "n": 1}], "cursor": null}""")
    val df = ApiReader(
      Pagination.Cursor(s"$dir/tok-{cursor}.json", nextField = "cursor",
        firstCursor = "start"),
      recSchema, recordsField = Some("items"), fetcher = FileFetcher(),
      spoolDir = Some(tmpDir("api-token-spool"))).read(spark)
    df.select("id").as[Long](org.apache.spark.sql.Encoders.scalaLong)
      .collect().sorted shouldBe Array(10L, 11L)
  }

  test("a reused spoolDir never resurrects a prior (longer) run's pages") {
    val dir = tmpDir("api-stale")
    writePage(dir, "a.json",
      s"""{"items": [{"id": 1, "lang": "en", "n": 1}], "next": "$dir/b.json"}""")
    writePage(dir, "b.json",
      """{"items": [{"id": 2, "lang": "en", "n": 1}]}""")
    val spool = tmpDir("api-stale-spool")
    def reader() = ApiReader(
      Pagination.Cursor(s"$dir/a.json", nextField = "next"),
      recSchema, recordsField = Some("items"), fetcher = FileFetcher(),
      spoolDir = Some(spool))
    reader().read(spark).count() shouldBe 2
    // the chain SHRINKS to one page; the stale page-000001 from run 1
    // must not be re-read as a phantom record
    writePage(dir, "a.json", """{"items": [{"id": 7, "lang": "en", "n": 1}]}""")
    val r2 = reader().read(spark)
    r2.count() shouldBe 1
    r2.select("id").head.getLong(0) shouldBe 7L
  }

  test("cursor store closes the incremental loop: resume, at-least-once, " +
       "commit only after the caller says so") {
    val dir = tmpDir("api-incr")
    writePage(dir, "a.json",
      s"""{"items": [{"id": 1, "lang": "en", "n": 1}], "next": "$dir/b.json"}""")
    writePage(dir, "b.json",
      """{"items": [{"id": 2, "lang": "en", "n": 1}]}""")
    val store = new graft.io.WatermarkStore(s"$dir/marks.json")
    def reader(spool: String) = ApiReader(
      Pagination.Cursor(s"$dir/a.json", nextField = "next"),
      recSchema, recordsField = Some("items"), fetcher = FileFetcher(),
      spoolDir = Some(spool), cursorStore = Some((store, "k")))
    val r1 = reader(tmpDir("api-incr-s1"))
    r1.read(spark).count() shouldBe 2
    store.get("k") shouldBe None // nothing persisted before commit
    r1.commitCursor()
    store.get("k") shouldBe Some(s"$dir/b.json") // final page's own cursor
    // the API grows: page b gains a successor
    writePage(dir, "b.json",
      s"""{"items": [{"id": 2, "lang": "en", "n": 1}], "next": "$dir/c.json"}""")
    writePage(dir, "c.json",
      """{"items": [{"id": 3, "lang": "en", "n": 1}]}""")
    val r2 = reader(tmpDir("api-incr-s2"))
    // resumes AT the stored page (b refetched — at-least-once), walks to c,
    // and never refetches page a
    r2.read(spark).select("id")
      .as[Long](org.apache.spark.sql.Encoders.scalaLong)
      .collect().sorted shouldBe Array(2L, 3L)
    r2.commitCursor()
    store.get("k") shouldBe Some(s"$dir/c.json")
  }

  test("config-built api job commits the cursor only after the sink write") {
    val dir = tmpDir("api-job")
    writePage(dir, "p.json", """{"items": [{"id": 9, "lang": "en", "n": 4}]}""")
    val reg = s"$dir/registry"
    new graft.schema.SchemaRegistry(reg).publish("d", "ds", recSchema)
    val store = new graft.io.WatermarkStore(s"$dir/marks.json")
    val job = IngestionRunner.buildJob(
      JobConfig("d", "ds", "bronze",
        SourceConfig("api", url = Some(s"$dir/p.json"),
          options = Map("recordsField" -> "items", "fetcher" -> "file")),
        TargetConfig("parquet", s"$dir/out")),
      Some(new graft.schema.SchemaRegistry(reg)),
      watermarks = Some(store))
    job.postCommit should have size 1
    job.run(spark)
    spark.read.parquet(s"$dir/out").count() shouldBe 1
    store.get("d.ds.cursor") shouldBe Some(s"$dir/p.json")
  }

  test("dotted next-field paths resolve through nested objects") {
    ApiReader.extractField(
      """{"meta": {"paging": {"next": "u2"}}, "data": []}""",
      "meta.paging.next") shouldBe Some("u2")
    ApiReader.extractField("""{"meta": {}}""", "meta.paging.next") shouldBe None
    ApiReader.extractField("""{"next": ""}""", "next") shouldBe None
  }

  test("config factory builds the api reader for both pagination modes") {
    def job(src: SourceConfig) = JobConfig("d", "ds", "bronze", src,
      TargetConfig("parquet", "t"))
    val paged = IngestionRunner.buildReader(
      job(SourceConfig("api", url = Some("http://x/items?page={page}"),
        options = Map("recordsField" -> "data", "maxPages" -> "7"))),
      Some(recSchema))
    paged shouldBe a[ApiReader]
    paged.asInstanceOf[ApiReader].pagination shouldBe
      Pagination.PageNumber("http://x/items?page={page}", 0, 7)
    val cursor = IngestionRunner.buildReader(
      job(SourceConfig("api", url = Some("http://x/items"),
        options = Map("nextField" -> "meta.next", "fetcher" -> "file"))),
      Some(recSchema))
    cursor.asInstanceOf[ApiReader].pagination shouldBe
      Pagination.Cursor("http://x/items", "meta.next", 10000)
    cursor.asInstanceOf[ApiReader].fetcher shouldBe FileFetcher()
    an[IllegalArgumentException] should be thrownBy IngestionRunner
      .buildReader(job(SourceConfig("api", url = Some("http://x"))), None)
  }

  test("kinesis reader maps the aws-kinesis connector option contract") {
    val r = KinesisReader("events", "us-east-1", recSchema,
      startingPosition = "LATEST",
      endpointUrl = Some("https://kinesis.local"),
      options = Map("kinesis.consumerType" -> "GetRecords"))
    r.readerOptions shouldBe Map(
      "streamName" -> "events", "region" -> "us-east-1",
      "startingPosition" -> "LATEST",
      "endpointUrl" -> "https://kinesis.local",
      "kinesis.consumerType" -> "GetRecords")
    val viaConfig = IngestionRunner.buildReader(
      JobConfig("d", "ds", "bronze",
        SourceConfig("kinesis", streaming = true, options = Map(
          "streamName" -> "events", "region" -> "eu-west-1")),
        TargetConfig("parquet", "t")),
      Some(recSchema))
    viaConfig.asInstanceOf[KinesisReader].readerOptions("region") shouldBe "eu-west-1"
    // streaming-only: a batch kinesis config is rejected, not silently
    // turned into a stream
    an[IllegalArgumentException] should be thrownBy IngestionRunner
      .buildReader(JobConfig("d", "ds", "bronze",
        SourceConfig("kinesis", options = Map(
          "streamName" -> "events", "region" -> "eu-west-1")),
        TargetConfig("parquet", "t")), Some(recSchema))
  }

  test("http fetcher: 200 body, 404 end-of-pagination, 5xx retry, 4xx fail-fast") {
    import com.sun.net.httpserver.HttpServer
    val server = HttpServer.create(new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    val flaky = new java.util.concurrent.atomic.AtomicInteger(0)
    def respond(ex: com.sun.net.httpserver.HttpExchange, code: Int, body: String): Unit = {
      val bytes = body.getBytes("UTF-8")
      ex.sendResponseHeaders(code, if (bytes.isEmpty) -1 else bytes.length)
      if (bytes.nonEmpty) ex.getResponseBody.write(bytes)
      ex.close()
    }
    server.createContext("/ok", ex => respond(ex, 200, """{"fine": true}"""))
    server.createContext("/gone", ex => respond(ex, 404, ""))
    server.createContext("/flaky", ex =>
      if (flaky.incrementAndGet() <= 2) respond(ex, 500, "boom")
      else respond(ex, 200, "recovered"))
    server.createContext("/bad", ex => respond(ex, 400, "bad request"))
    server.start()
    val base = s"http://127.0.0.1:${server.getAddress.getPort}"
    try {
      val f = graft.io.HttpFetcher(maxRetries = 3, backoffMs = 1)
      f.fetch(s"$base/ok") shouldBe Some("""{"fine": true}""")
      f.fetch(s"$base/gone") shouldBe None
      f.fetch(s"$base/flaky") shouldBe Some("recovered") // two 500s then 200
      flaky.get() shouldBe 3
      // 4xx is a caller bug: no retry budget burned, immediate failure
      an[java.io.IOException] should be thrownBy f.fetch(s"$base/bad")
      // retry budget exhausts into a pointed error
      val f0 = graft.io.HttpFetcher(maxRetries = 1, backoffMs = 1)
      flaky.set(0)
      the[java.io.IOException] thrownBy
        f0.fetch(s"$base/flaky") should have message
        s"API request failed after 1 retries: HTTP 500 for $base/flaky"
    } finally server.stop(0)
  }

  test("http fetcher honors 429 Retry-After (capped), then succeeds") {
    import com.sun.net.httpserver.HttpServer
    val server = HttpServer.create(new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    val hits = new java.util.concurrent.atomic.AtomicInteger(0)
    server.createContext("/limited", ex => {
      if (hits.incrementAndGet() == 1) {
        ex.getResponseHeaders.add("Retry-After", "1") // 1s, capped to 50ms below
        ex.sendResponseHeaders(429, -1)
      } else {
        val b = "ok".getBytes("UTF-8")
        ex.sendResponseHeaders(200, b.length)
        ex.getResponseBody.write(b)
      }
      ex.close()
    })
    server.start()
    try {
      val base = s"http://127.0.0.1:${server.getAddress.getPort}"
      val f = graft.io.HttpFetcher(maxRetries = 2, backoffMs = 1,
        maxRetryAfterMs = 50)
      val t0 = System.nanoTime()
      f.fetch(s"$base/limited") shouldBe Some("ok")
      val ms = (System.nanoTime() - t0) / 1e6
      hits.get() shouldBe 2
      ms should be >= 45.0  // waited the capped Retry-After
      ms should be < 900.0  // NOT the full 1s header value
    } finally server.stop(0)
  }

  test("kinesis payload parse shares the kafka corrupt-record policy") {
    import spark.implicits._
    val raw = Seq(
      """{"id": 5, "lang": "en", "n": 9}""",
      "broken {"
    ).toDF("s").select(col("s").cast("binary").as("data"))
    val parsed = KinesisReader.parsePayload(raw, recSchema)
    parsed.columns should contain("_corrupt_record")
    parsed.filter(col("_corrupt_record").isNull)
      .select("id", "n").head shouldBe org.apache.spark.sql.Row(5L, 9L)
    parsed.filter(col("_corrupt_record").isNotNull).count() shouldBe 1
  }
}
