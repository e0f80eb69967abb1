package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Source adapters. Schema is always explicit (registry-resolved) — never
  * inferred (reference design tenet,
  * `/root/reference/docs/01-problem-statement.md:100-104`; reader contract
  * `/root/reference/src/main/scala/com/lakehouse/ingestion/io/
  * BaseReader.scala:24-28`).
  */
trait SourceReader {
  def read(spark: SparkSession): DataFrame
}

/** CSV / JSON / Parquet / text file source, batch or streaming
  * (the reference only documents these as future `FileReader`,
  * `/root/reference/docs/02-tech-spec.md:45-46`).
  *
  * Malformed-record policy for the semi-structured formats: PERMISSIVE with
  * a `_corrupt_record` column appended to the schema, so bad rows are
  * quarantine-able instead of silently null (the reference's `from_json`
  * nulls them, `io/KafkaReader.scala:47-53`).
  */
final case class FileReader(format: String, path: String,
                            schema: Option[StructType] = None,
                            options: Map[String, String] = Map.empty,
                            streaming: Boolean = false,
                            corruptColumn: Option[String] = None)
    extends SourceReader {

  private def effectiveSchema: Option[StructType] = schema.map { s =>
    corruptColumn match {
      case Some(c) if Seq("csv", "json").contains(format.toLowerCase) =>
        s.add(c, "string", nullable = true)
      case _ => s
    }
  }

  override def read(spark: SparkSession): DataFrame = {
    val opts = corruptColumn match {
      case Some(c) => options + ("mode" -> "PERMISSIVE", "columnNameOfCorruptRecord" -> c)
      case None    => options
    }
    if (streaming) {
      val r = spark.readStream.format(format).options(opts)
      effectiveSchema.foreach(r.schema)
      r.load(path)
    } else {
      val r = spark.read.format(format).options(opts)
      effectiveSchema.foreach(r.schema)
      r.load(path)
    }
  }
}

/** Partitioned / incremental JDBC source
  * (`/root/reference/docs/02-tech-spec.md:46`; watermark + partitioned read
  * example `docs/07-developer-guide.md:665-671`).
  *
  * Scale: `partitionColumn/lowerBound/upperBound/numPartitions` fan the read
  * out across executors; `watermark` turns into a pushed-down predicate so
  * incremental loads only scan new rows on the database side.
  */
final case class JdbcReader(url: String, table: String,
                            options: Map[String, String] = Map.empty,
                            partitionColumn: Option[String] = None,
                            lowerBound: Option[Long] = None,
                            upperBound: Option[Long] = None,
                            numPartitions: Int = 8,
                            watermark: Option[(String, String)] = None)
    extends SourceReader {

  /** The dbtable expression, with the watermark predicate pushed into the
    * database as a subquery so Spark never sees old rows. */
  def dbtable: String = watermark match {
    case Some((column, lastValue)) =>
      s"(SELECT * FROM $table WHERE $column > '$lastValue') AS graft_incr"
    case None => table
  }

  def readerOptions: Map[String, String] = {
    val base = options ++ Map("url" -> url, "dbtable" -> dbtable)
    (partitionColumn, lowerBound, upperBound) match {
      case (Some(c), Some(lo), Some(hi)) =>
        base ++ Map(
          "partitionColumn" -> c, "lowerBound" -> lo.toString,
          "upperBound" -> hi.toString, "numPartitions" -> numPartitions.toString)
      case _ => base
    }
  }

  override def read(spark: SparkSession): DataFrame =
    spark.read.format("jdbc").options(readerOptions).load()
}

/** Kafka source with a CORRECT batch/streaming branch — the reference parses
  * the flag but unconditionally calls `readStream`
  * (`/root/reference/src/main/scala/com/lakehouse/ingestion/io/
  * KafkaReader.scala:32-42`), so its batch mode never works.
  *
  * The value-parsing stage is factored out as [[KafkaReader.parseJsonPayload]]
  * so it is unit-testable without Kafka jars (which this environment lacks).
  */
final case class KafkaReader(bootstrapServers: String, topic: String,
                             payloadSchema: StructType,
                             streaming: Boolean = true,
                             startingOffsets: String = "earliest",
                             endingOffsets: String = "latest",
                             options: Map[String, String] = Map.empty)
    extends SourceReader {

  def readerOptions: Map[String, String] = {
    val base = options ++ Map(
      "kafka.bootstrap.servers" -> bootstrapServers,
      "subscribe" -> topic,
      "startingOffsets" -> startingOffsets)
    if (streaming) base else base + ("endingOffsets" -> endingOffsets)
  }

  override def read(spark: SparkSession): DataFrame = {
    val raw =
      if (streaming)
        spark.readStream.format("kafka").options(readerOptions).load()
      else
        spark.read.format("kafka").options(readerOptions).load()
    KafkaReader.parseJsonPayload(raw, payloadSchema)
  }
}

/** Kinesis source, implemented to the public AWS connector contract
  * (`spark-streaming-sql-kinesis-connector`: format `aws-kinesis`, options
  * `streamName`/`region`/`endpointUrl`/`startingPosition`, record payload
  * in a binary `data` column) — the reference lists Kinesis as a planned
  * source (`/root/reference/docs/00-architecture-overview.md:380`,
  * `docs/01-problem-statement.md:24`) and ships nothing. Same status as
  * Delta/Iceberg/Kafka here: exact format-string + option + parse contract,
  * spec-tested; e2e needs the connector jar this sandbox lacks.
  *
  * Kinesis has no batch read in the connector, so this reader is
  * streaming-only; the config factory rejects a non-streaming kinesis
  * source instead of silently going streaming (the inverse of the
  * reference's always-readStream Kafka bug). */
final case class KinesisReader(streamName: String, region: String,
                               payloadSchema: StructType,
                               startingPosition: String = "TRIM_HORIZON",
                               endpointUrl: Option[String] = None,
                               options: Map[String, String] = Map.empty)
    extends SourceReader {

  def readerOptions: Map[String, String] =
    options ++ Map(
      "streamName" -> streamName,
      "region" -> region,
      "startingPosition" -> startingPosition) ++
      endpointUrl.map("endpointUrl" -> _)

  override def read(spark: SparkSession): DataFrame =
    KinesisReader.parsePayload(
      spark.readStream.format("aws-kinesis").options(readerOptions).load(),
      payloadSchema)
}

object KinesisReader {
  /** Kinesis records carry the payload in `data` (binary); reuse the
    * Kafka JSON-parse stage on that column — one corrupt-record policy
    * across every payload-bearing source. */
  def parsePayload(raw: DataFrame, schema: StructType): DataFrame =
    KafkaReader.parseJsonPayload(
      raw.withColumn("value", col("data")), schema)
}

object KafkaReader {
  /** binary `value` -> string -> `from_json` against the registry schema ->
    * flattened columns, plus `_corrupt_record` holding the raw payload when
    * the parse failed (reference silently nulls these,
    * `io/KafkaReader.scala:47-53`). Uses from_json's PERMISSIVE
    * corrupt-record column (Spark 4 yields an all-null struct, not a null
    * struct, so an isNull probe can't detect parse failure). */
  def parseJsonPayload(raw: DataFrame, schema: StructType): DataFrame = {
    val withCorrupt = schema.add("_corrupt_record", "string", nullable = true)
    raw
      .select(col("value").cast("string").as("_raw"))
      .select(from_json(col("_raw"), withCorrupt,
        Map("mode" -> "PERMISSIVE",
            "columnNameOfCorruptRecord" -> "_corrupt_record")).as("data"))
      .select(col("data.*"))
  }
}
