package graft.multimodal

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: media as opaque `binary` payloads + typed
  * metadata, with decode/feature steps stubbed deterministically.
  *
  * The Spark-side contract is real — schema, partitioning, batch shape —
  * while the actual codec work is a clearly-marked stub (image/audio codec
  * libraries are not available in this environment). A production deploy
  * swaps [[DecodeStub.decodeImage]] for a real decoder inside the same
  * mapPartitions signature; nothing else changes.
  *
  * Scale notes: payloads stay columnar (parquet binary) end-to-end; decode
  * runs once per partition batch via mapPartitions (codec init amortized,
  * the same batching rationale as Python's mapInPandas); feature columns
  * are pruned independently of payload bytes, so metadata-only queries
  * never read the blobs thanks to parquet column pruning.
  */
object Multimodal {

  final case class MediaRecord(media_id: Long, payload: Array[Byte],
                               media_type: String, source: String)
  final case class ImageFeatures(media_id: Long, width: Int, height: Int,
                                 channels: Int, sha: String)

  /** Pack a text corpus into the binary-media shape (payload + metadata) —
    * stands in for reading real image/audio bytes. */
  def packBinary(df: DataFrame, idCol: String, textCol: String,
                 mediaType: String, sourceCol: String): DataFrame =
    df.select(
      col(idCol).cast("long").as("media_id"),
      encode(col(textCol), "UTF-8").as("payload"),
      lit(mediaType).as("media_type"),
      col(sourceCol).as("source"))

  /** Pure-column deterministic "decode": pseudo-dimensions derived from the
    * payload hash. Engine-portable (ascii/md5 only) so it can be
    * oracle-checked; the mapPartitions variant below is the real plumbing. */
  def fakeDimensions(payload: Column): (Column, Column) = {
    val h = md5(payload)
    val w = (ascii(substring(h, 1, 1)) * lit(256) + ascii(substring(h, 2, 1))) % lit(1857) + lit(64)
    val ht = (ascii(substring(h, 3, 1)) * lit(256) + ascii(substring(h, 4, 1))) % lit(1017) + lit(64)
    (w, ht)
  }

  /** Sample every `stride`-th fixed-size frame from a payload — the
    * video-frame-sampling batch shape (slice + explode, no driver loop). */
  def sampleFrames(df: DataFrame, payloadCol: String, frameBytes: Int,
                   stride: Int): DataFrame = {
    val nFrames = floor(length(col(payloadCol)) / lit(frameBytes)).cast("int")
    df.withColumn("frame_idx",
        explode(sequence(lit(0), greatest(nFrames - 1, lit(0)), lit(stride))))
      .withColumn("frame",
        expr(s"substring($payloadCol, frame_idx * $frameBytes + 1, $frameBytes)"))
  }

  /** Aspect-preserving resize arithmetic — the longer side becomes
    * `target`, the shorter scales by the same ratio (round-half-up via
    * cross-multiplied integers, so every engine agrees exactly; a real
    * deployment feeds these dims to the codec in [[DecodeStub]]).
    * Returns (out_w, out_h). */
  def resizeDims(w: Column, h: Column, target: Int): (Column, Column) = {
    val t = lit(target)
    val outW = when(w >= h, t).otherwise(
      greatest(floor((w * t * 2 + h).cast("double") / (h * 2).cast("double"))
        .cast("int"), lit(1)))
    val outH = when(w >= h,
      greatest(floor((h * t * 2 + w).cast("double") / (w * 2).cast("double"))
        .cast("int"), lit(1))).otherwise(t)
    (outW, outH)
  }
}

object DecodeStub {
  import Multimodal._
  import org.apache.spark.sql.{Dataset, SparkSession}

  final case class MediaFeatures(media_id: Long, features: Array[Float])

  /** STUB — deterministic fake feature extraction (the embed-the-image
    * batch shape): fixed-length float vector per payload, partition-
    * batched so a real model session initializes once per partition
    * (exactly the mapInPandas contract). A real deployment swaps the
    * digest for an ONNX/JNI forward pass behind the same signature. */
  def extractFeatures(records: Dataset[MediaRecord], dim: Int = 8)
      : Dataset[MediaFeatures] = {
    val spark: SparkSession = records.sparkSession
    import spark.implicits._
    records.mapPartitions { it =>
      // per-partition model init would happen here (amortized batch cost)
      val md = java.security.MessageDigest.getInstance("MD5")
      it.map { r =>
        md.reset()
        val d = md.digest(r.payload)
        val f = Array.tabulate(dim)(i => ((d(i % 16) & 0xff) - 128) / 128.0f)
        MediaFeatures(r.media_id, f)
      }
    }
  }

  /** STUB — deterministic fake image decode. A real deployment replaces the
    * body (e.g. TwelveMonkeys/ImageIO) behind the identical signature; the
    * partition-batched dataflow is the part under test. */
  def decodeImage(records: Dataset[MediaRecord]): Dataset[ImageFeatures] = {
    val spark: SparkSession = records.sparkSession
    import spark.implicits._
    records.mapPartitions { it =>
      // per-partition codec init would happen here (amortized, like
      // mapInPandas batch init)
      val md = java.security.MessageDigest.getInstance("MD5")
      it.map { r =>
        md.reset()
        val d = md.digest(r.payload)
        val w = (((d(0) & 0xff) << 8) | (d(1) & 0xff)) % 1857 + 64
        val h = (((d(2) & 0xff) << 8) | (d(3) & 0xff)) % 1017 + 64
        ImageFeatures(r.media_id, w, h, 3, d.map("%02x".format(_)).mkString)
      }
    }
  }
}
