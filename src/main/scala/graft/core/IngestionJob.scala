package graft.core

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.types.StructType

import graft.dq.{DQRuleSet, DQSummary}
import graft.io.SourceReader
import graft.lakehouse.{LakehouseTable, SinkWriter}
import graft.schema.SchemaValidator

/** One ingestion job: read -> validate -> DQ -> write
  * (reference `/root/reference/src/main/scala/com/lakehouse/ingestion/core/
  * IngestionJob.scala:31-163`), with three behavioral upgrades:
  *
  *  1. DQ runs as ONE aggregate pass ([[graft.dq.DQRuleSet]]), not 2k scans.
  *  2. QUARANTINE is implemented: violating rows (tagged with `dq_reasons`)
  *     land in a quarantine table; clean rows proceed. The micro-batch is
  *     persisted across the two-branch write so the source isn't rescanned.
  *  3. Streaming jobs run validation + DQ per micro-batch via `foreachBatch`
  *     (the reference skips both on streams, `IngestionJob.scala:73,87`) and
  *     return the [[StreamingQuery]] instead of blocking.
  */
final case class IngestionJob(domain: String, dataset: String,
                              layer: MedallionLayer,
                              reader: SourceReader, writer: SinkWriter,
                              target: LakehouseTable,
                              expectedSchema: Option[StructType] = None,
                              ruleSet: Option[DQRuleSet] = None,
                              quarantine: Option[LakehouseTable] = None,
                              mode: SaveMode = SaveMode.Append,
                              checkpoint: Option[String] = None,
                              triggerInterval: String = "30 seconds") {

  def run(spark: SparkSession): JobResult = {
    val df = reader.read(spark)
    if (df.isStreaming) JobResult(None, Some(runStreaming(df)))
    else JobResult(Some(runBatch(df)), None)
  }

  /** Batch path; also the body of each streaming micro-batch. */
  private[core] def runBatch(df: DataFrame): DQSummary = {
    expectedSchema.foreach(SchemaValidator.validateOrThrow(df, _))
    ruleSet match {
      case None =>
        writer.write(df, target, mode)
        DQSummary(Seq.empty, -1L)
      case Some(rs) =>
        val needsSplit = rs.policy == graft.dq.DQPolicy.QuarantineRows
        val input = if (needsSplit) df.persist() else df
        try {
          val (clean, bad, summary) = rs.enforce(input)
          writer.write(clean, target, mode)
          (bad, quarantine) match {
            case (Some(b), Some(q)) => writer.write(b, q, SaveMode.Append)
            case _                  => ()
          }
          summary
        } finally {
          if (needsSplit) input.unpersist()
        }
    }
  }

  private def runStreaming(df: DataFrame): StreamingQuery = {
    val cp = checkpoint.getOrElse(defaultCheckpoint)
    if (expectedSchema.isEmpty && ruleSet.isEmpty)
      writer.writeStream(df, target, cp, triggerInterval)
    else
      df.writeStream
        .option("checkpointLocation", cp)
        .trigger(org.apache.spark.sql.streaming.Trigger.ProcessingTime(triggerInterval))
        .foreachBatch { (batch: DataFrame, _: Long) => runBatch(batch); () }
        .start()
  }

  /** `/tmp/checkpoints/{domain}/{dataset}/{layer}` (reference
    * `core/IngestionJob.scala:136-141`). */
  def defaultCheckpoint: String =
    s"/tmp/checkpoints/$domain/$dataset/${layer.name}"
}

final case class JobResult(batchSummary: Option[DQSummary],
                           streamingQuery: Option[StreamingQuery])
