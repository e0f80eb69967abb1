package graft.lakehouse

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.core.MedallionLayer

/** Logical table: identifier + medallion layer + partition columns
  * (reference `/root/reference/src/main/scala/com/lakehouse/ingestion/
  * lakehouse/LakehouseTable.scala:8-12`). `identifier` is a path for
  * path-based sinks and a (possibly multi-part) catalog name otherwise.
  */
final case class LakehouseTable(identifier: String, layer: MedallionLayer,
                                partitions: Seq[String] = Seq.empty) {
  def isPath: Boolean =
    identifier.contains("/") || identifier.contains("://")
}

/** Sink adapters. Two deliberate departures from the reference:
  *
  *  1. No logging `df.count()` before the write — that was a full extra
  *     source scan per batch (`lakehouse/DeltaLakeWriter.scala:105`); row
  *     counts come free from `Observation` metrics instead (see
  *     [[graft.metrics.TableMetrics]]).
  *  2. Streaming writes RETURN the started [[StreamingQuery]] instead of
  *     blocking in `awaitTermination` — the reference stalls job 2+ of any
  *     multi-job pipeline on the first streaming job
  *     (`lakehouse/DeltaLakeWriter.scala:89`, SURVEY.md §3.2); the runner
  *     awaits ALL queries at the end (`spark.streams.awaitAnyTermination`).
  */
trait SinkWriter {
  def formatName: String

  /** Batch write. */
  def write(df: DataFrame, table: LakehouseTable,
            mode: SaveMode = SaveMode.Append): Unit = {
    val w = df.write.format(formatName).mode(mode)
    val wp = if (table.partitions.nonEmpty) w.partitionBy(table.partitions: _*) else w
    if (table.isPath) wp.save(table.identifier)
    else wp.saveAsTable(table.identifier)
  }

  /** Streaming write: checkpointed append micro-batches; non-blocking.
    * Trigger interval mirrors the reference default of 30s
    * (`lakehouse/DeltaLakeWriter.scala:62-70`). */
  def writeStream(df: DataFrame, table: LakehouseTable, checkpoint: String,
                  triggerInterval: String = "30 seconds"): StreamingQuery = {
    val w = df.writeStream.format(formatName)
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.ProcessingTime(triggerInterval))
    val wp = if (table.partitions.nonEmpty) w.partitionBy(table.partitions: _*) else w
    if (table.isPath) wp.start(table.identifier)
    else wp.toTable(table.identifier)
  }
}

/** Plain parquet lakehouse sink (reference
  * `io/S3ParquetWriter.scala:37-40`). */
final case class ParquetSink() extends SinkWriter {
  val formatName = "parquet"
}

/** ORC lakehouse sink — the other columnar format Spark ships natively
  * (vectorized reader, predicate pushdown, zstd). Unlike Delta/Iceberg/
  * Kafka this one is fully e2e-testable in this sandbox (orc-core ships
  * in /opt/spark/jars), so the batch path is oracle-gated end-to-end
  * (q390) rather than contract-spec-only. */
final case class OrcSink() extends SinkWriter {
  val formatName = "orc"
}

/** Delta Lake sink — same `format("delta")` string contract as the reference
  * (`lakehouse/DeltaLakeWriter.scala:96-129`). Compiles against vanilla
  * spark-sql; runs only where delta jars + extensions are deployed, so local
  * e2e coverage goes through [[ParquetSink]] (SURVEY.md §7.4). */
final case class DeltaSink() extends SinkWriter {
  val formatName = "delta"
}

/** Iceberg sink. Batch uses the V2 `writeTo(...).append()` path like the
  * reference (`lakehouse/IcebergAppendWriter.scala:48-51`); streaming is the
  * checkpointed `toTable` append (`:29-46`, non-blocking here). */
final case class IcebergSink() extends SinkWriter {
  val formatName = "iceberg"

  override def write(df: DataFrame, table: LakehouseTable,
                     mode: SaveMode = SaveMode.Append): Unit =
    if (table.isPath || mode == SaveMode.Overwrite)
      super.write(df, table, mode)
    else
      df.writeTo(table.identifier).append()
}
