package graft.multimodal

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: media as opaque `binary` payloads + typed
  * metadata.
  *
  * IMAGE decode is REAL — [[MediaCodec.decodeImage]] runs the JDK's
  * `javax.imageio` (PNG/JPEG/BMP/GIF, zero extra dependencies) inside a
  * partition-batched mapPartitions; [[encodePng]] produces genuine PNG
  * bytes for fixtures. AUDIO decode is REAL the same way —
  * [[MediaCodec.decodeAudio]] parses WAV containers through
  * `javax.sound.sampled.AudioSystem` and [[encodeWav]] writes them, both
  * JDK codecs. Feature extraction is REAL too — [[MediaCodec
  * .imageEmbedding]] (4×4 centered-luma vector from the decoded raster)
  * and [[MediaCodec.audioEmbedding]] (33-window energy vector from the
  * decoded stream) embed actual media bytes; a model forward pass slots
  * behind the same `Dataset[MediaEmbedding]` signature when an inference
  * runtime is available.
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

  /** Encode a deterministic solid-pattern PNG of the given dimensions —
    * REAL codec work (JDK `javax.imageio`), used by fixtures so
    * [[MediaCodec.decodeImage]] has genuine image bytes to decode. Pixel
    * values derive from (seed, x, y) only; Java's PNG writer emits no
    * timestamp chunks, so the bytes are reproducible. */
  def encodePng(width: Int, height: Int, seed: Long): Array[Byte] =
    encodePngPerturbed(width, height, seed, perturb = false)

  /** [[encodePng]] with an optional 1-bit pixel perturbation: every pixel
    * where `(x + y)` is even gets the low bit of each channel flipped
    * (`rgb ^ 0x010101`, so grayscale moves by at most ±1). Same seed +
    * perturb = a genuine NEAR-duplicate image (tiny Hamming distance under
    * a perceptual hash) whose bytes differ — the fixture shape for image
    * dedup (q382/q383).
    *
    * Pixel values are a NONLINEARLY mixed pseudo-random function of
    * (seed, x, y): `u² mod p` with `u = (seed·2654435761 + 31x + 131y)
    * mod p` and `p = 16777213` (prime, < 2²⁴; every intermediate fits a
    * signed 64-bit, so DuckDB replays it exactly). The mix must be
    * nonlinear IN u: any affine map leaves two seeds' pixel values
    * differing by a constant, whose grayscales stay correlated — at sf0.1
    * an affine plant produced ~14 cross-seed Hamming-≤6 pairs per image
    * (superlinear pair growth and long-chain dup components), where the
    * square keeps non-planted pairs at the random-64-bit coincidence
    * level, so the pair count scales with the PLANTED duplicates, like a
    * real corpus. */
  def encodePngPerturbed(width: Int, height: Int, seed: Long,
                         perturb: Boolean): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(width, height,
      java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
    var y = 0
    while (y < height) {
      var x = 0
      while (x < width) {
        val u = (seed * 2654435761L + x * 31L + y * 131L) % 16777213L
        val base = ((u * u) % 16777213L).toInt
        val v = if (perturb && (x + y) % 2 == 0) base ^ 0x010101 else base
        img.setRGB(x, y, v)
        x += 1
      }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** Encode 16-bit signed little-endian mono PCM samples as a genuine WAV
    * container through the JDK codec (`javax.sound.sampled.AudioSystem
    * .write`, zero extra dependencies) — the audio twin of [[encodePng]]:
    * fixtures plant real RIFF/WAVE bytes so [[MediaCodec.decodeAudio]] has
    * an actual container to parse. The writer emits no timestamps, so the
    * bytes are reproducible. */
  def encodeWav(sampleRate: Int, samples: Array[Short]): Array[Byte] = {
    val fmt = new javax.sound.sampled.AudioFormat(
      sampleRate.toFloat, 16, 1, true, false)
    val raw = new Array[Byte](samples.length * 2)
    var i = 0
    while (i < samples.length) {
      raw(2 * i) = (samples(i) & 0xff).toByte
      raw(2 * i + 1) = ((samples(i) >> 8) & 0xff).toByte
      i += 1
    }
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(raw), fmt, samples.length.toLong)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  /** The deterministic planted PCM sample: nonlinearly mixed in
    * (seed, t) — `((u·u) mod 65533) − 32766` with `u = (seed·2654435761 +
    * t·9176) mod 16777213` — for the same reason [[encodePngPerturbed]]'s
    * pixel mix is nonlinear: an affine plant leaves two seeds' samples
    * differing by a constant, whose window ENERGIES stay rank-correlated,
    * so distinct-seed clips would collide under the energy-delta
    * fingerprint; the square keeps cross-seed fingerprints at the
    * random-bit coincidence level. Range [-32766, 32766] leaves headroom
    * so the near-dup +1 perturbation can never overflow int16. Every
    * intermediate fits a signed 64-bit, so DuckDB replays it exactly. */
  def plantedSample(seed: Long, t: Int, perturb: Boolean): Short = {
    val u = (seed * 2654435761L + t * 9176L) % 16777213L
    val s = ((u * u) % 65533L - 32766L).toInt
    (if (perturb && t % 2 == 0) s + 1 else s).toShort
  }

  /** 256-entry grayscale palette (r=g=b=k). Animated-GIF fixtures encode
    * through an explicit IndexColorModel so the round-trip is LOSSLESS
    * and engine-portable: the GIF writer adopts the index palette
    * verbatim (no quantization), and `getRGB` on the decoded frame
    * returns exactly (k, k, k) — whereas TYPE_BYTE_GRAY would pass
    * through a gray→sRGB colorspace conversion that is NOT the identity
    * ramp, breaking bit-exact oracle replay. */
  private def grayPalette: java.awt.image.IndexColorModel = {
    val ramp = Array.tabulate[Byte](256)(i => i.toByte)
    new java.awt.image.IndexColorModel(8, 256, ramp, ramp, ramp)
  }

  /** Encode `frames` grayscale frames (pixel value `gray(x, y, f)` in
    * 0..255) as a genuine multi-frame animated GIF through the JDK codec
    * (`ImageIO` gif writer, `writeToSequence` — zero extra dependencies):
    * the video twin of [[encodePng]]/[[encodeWav]]. Each frame is written
    * FULL-SIZE (the writer does no inter-frame delta optimization), so
    * [[MediaCodec.frameHashes]] reads each frame back standalone. The
    * writer emits no timestamps and the palette is the fixed gray ramp,
    * so the bytes are reproducible. */
  def encodeGif(width: Int, height: Int, frames: Int,
                gray: (Int, Int, Int) => Int): Array[Byte] = {
    val writer = javax.imageio.ImageIO
      .getImageWritersByFormatName("gif").next()
    val bos = new java.io.ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
    try {
      writer.setOutput(ios)
      writer.prepareWriteSequence(null)
      var f = 0
      while (f < frames) {
        val img = new java.awt.image.BufferedImage(width, height,
          java.awt.image.BufferedImage.TYPE_BYTE_INDEXED, grayPalette)
        val raster = img.getRaster
        var y = 0
        while (y < height) {
          var x = 0
          while (x < width) {
            raster.setSample(x, y, 0, gray(x, y, f))
            x += 1
          }
          y += 1
        }
        writer.writeToSequence(new javax.imageio.IIOImage(img, null, null), null)
        f += 1
      }
      writer.endWriteSequence()
    } finally {
      writer.dispose()
      ios.close()
    }
    bos.toByteArray
  }

  /** Pure-column deterministic PSEUDO-decode: dimensions derived from the
    * payload hash. Engine-portable (ascii/md5 only) so it can be
    * oracle-checked column-for-column; [[MediaCodec.decodeImage]] is the
    * real decoder. */
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
    * deployment feeds these dims to the codec in [[MediaCodec]]).
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

object MediaCodec {
  import Multimodal._
  import org.apache.spark.sql.{Dataset, SparkSession}

  final case class MediaEmbedding(media_id: Long, embedding: Array[Double])

  /** REAL image embedding from decoded pixels — a 4×4 point-sampled
    * integer-luma vector, MEAN-CENTERED in exact integer arithmetic
    * (`e_k = 16·g_k − Σg`, so the vector sums to zero without a division
    * and every value stays an exact integer any engine replays
    * bit-for-bit). Sampling and grayscale follow the [[dHash]]
    * discipline — `gray(i·w/4, j·h/4)`, element order `k = j·4 + i` —
    * so the embedding is pure arithmetic over the planted raster and an
    * oracle can replay it. Centering is what makes the vectors usable
    * downstream: raw luma is all-positive (random pairs' cosine ≈ 0.75,
    * no contrast), centered luma puts unrelated rasters near cosine 0
    * while a ±1-per-pixel near-duplicate stays above 0.999 — the
    * separation SemDeDup-style clustering ([[graft.similarity.LshAnn]],
    * `KMeansCosine`) needs. A real deployment swaps this for a model
    * forward pass behind the same `Dataset[MediaEmbedding]` signature;
    * the Spark shape — partition-batched decode, fixed-dim vector,
    * payload bytes never crossing a shuffle — is identical.
    * Undecodable payloads drop (the [[decodeImage]] audit contract). */
  def imageEmbedding(records: Dataset[MediaRecord]): Dataset[MediaEmbedding] = {
    val spark: SparkSession = records.sparkSession
    import spark.implicits._
    records.mapPartitions { it =>
      javax.imageio.ImageIO.setUseCache(false)
      it.flatMap { r =>
        val img = javax.imageio.ImageIO.read(
          new java.io.ByteArrayInputStream(r.payload))
        if (img == null) None
        else {
          val w = img.getWidth
          val h = img.getHeight
          val g = new Array[Long](16)
          var k = 0
          var sum = 0L
          while (k < 16) {
            val v = img.getRGB((k % 4) * w / 4, (k / 4) * h / 4)
            g(k) = (((v >> 16) & 0xff) * 299 + ((v >> 8) & 0xff) * 587 +
              (v & 0xff) * 114) / 1000
            sum += g(k)
            k += 1
          }
          Some(MediaEmbedding(r.media_id,
            Array.tabulate(16)(k => (16L * g(k) - sum).toDouble)))
        }
      }
    }
  }

  /** REAL audio embedding from decoded samples — the 33-window exact
    * int64 energy vector [[audioFingerprint]] computes, MEAN-CENTERED in
    * exact integer arithmetic (`e'_w = 33·e_w − Σe`, the
    * [[imageEmbedding]] discipline: every value stays an exact integer
    * any engine replays bit-for-bit, and the vector sums to zero without
    * a division). Centering is load-bearing for cosine use: raw window
    * energies are all-positive AND pattern-correlated across unrelated
    * clips (windows covering ⌈n/33⌉ samples systematically out-energy
    * ⌊n/33⌋ ones — measured cross-clip cosine up to 0.996 raw vs 0.972
    * centered at sf0.1), while a ±1-per-sample near-duplicate moves each
    * energy by O(Σ|s|) ≪ the spread, staying above 0.9999. Cosine is
    * scale-invariant, so no lossy normalization is applied. Undecodable /
    * non-16-bit-mono / <33-sample payloads drop. */
  def audioEmbedding(records: Dataset[MediaRecord]): Dataset[MediaEmbedding] = {
    val spark: SparkSession = records.sparkSession
    import spark.implicits._
    records.mapPartitions { it =>
      it.flatMap { r =>
        readWavSamples(r.payload).collect {
          case (_, s) if s.length >= 33 =>
            val e = new Array[Long](33)
            var i = 0
            while (i < s.length) {
              e((i.toLong * 33 / s.length).toInt) += s(i).toLong * s(i)
              i += 1
            }
            val sum = e.sum
            MediaEmbedding(r.media_id,
              e.map(x => (33L * x - sum).toDouble))
        }
      }
    }
  }

  final case class ImageHash(media_id: Long, dhash: Long)

  /** REAL perceptual hash over decoded rasters: difference-hash (dHash) on
    * a 9x8 point-sampled integer-grayscale grid. Decode runs through the
    * same partition-batched `javax.imageio` path as [[decodeImage]]; the
    * downsample is nearest-neighbor point sampling and the grayscale is
    * exact integer arithmetic (`(299r + 587g + 114b) / 1000`), so an
    * oracle can replay the hash bit-for-bit from planted pixel functions.
    * Bit `j*8 + i` is set iff `gray(i, j) > gray(i+1, j)`. A 1-bit pixel
    * perturbation moves each sampled gray by at most ±1, so near-dup
    * variants land within a few Hamming bits — the image analogue of
    * SimHash text dedup. Undecodable payloads are dropped (same audit
    * contract as [[decodeImage]]). */
  def dHash(records: Dataset[MediaRecord]): Dataset[ImageHash] = {
    val spark: SparkSession = records.sparkSession
    import spark.implicits._
    records.mapPartitions { it =>
      javax.imageio.ImageIO.setUseCache(false)
      it.flatMap { r =>
        val img = javax.imageio.ImageIO.read(
          new java.io.ByteArrayInputStream(r.payload))
        if (img == null) None
        else Some(ImageHash(r.media_id, dHashOf(img)))
      }
    }
  }

  /** The dHash core over one decoded raster — shared by the single-image
    * [[dHash]] and the per-frame [[frameHashes]], so the sampling grid,
    * integer grayscale and bit layout exist in exactly one place. */
  private[multimodal] def dHashOf(img: java.awt.image.BufferedImage): Long = {
    val w = img.getWidth
    val h = img.getHeight
    val gray = Array.ofDim[Int](9, 8)
    var i = 0
    while (i < 9) {
      var j = 0
      while (j < 8) {
        val v = img.getRGB(i * w / 9, j * h / 8)
        gray(i)(j) = (((v >> 16) & 0xff) * 299 +
          ((v >> 8) & 0xff) * 587 + (v & 0xff) * 114) / 1000
        j += 1
      }
      i += 1
    }
    var hash = 0L
    var j = 0
    while (j < 8) {
      var k = 0
      while (k < 8) {
        if (gray(k)(j) > gray(k + 1)(j)) hash |= 1L << (j * 8 + k)
        k += 1
      }
      j += 1
    }
    hash
  }

  final case class FrameHash(media_id: Long, frame_idx: Int, dhash: Long)

  /** Decode a multi-frame GIF payload into its frames via the JDK's
    * `ImageIO` GIF reader (`getNumImages(true)` + per-index `read` — zero
    * extra dependencies). Single-frame GIFs come back as one frame;
    * payloads the reader rejects (non-GIF, truncated mid-stream) return
    * None — the same drop-and-audit contract as [[decodeImage]]. */
  def readGifFrames(payload: Array[Byte])
      : Option[IndexedSeq[java.awt.image.BufferedImage]] = {
    val reader = javax.imageio.ImageIO
      .getImageReadersByFormatName("gif").next()
    // the stream must be closed explicitly — reader.dispose() does not
    // close its input, and outside frameHashes' setUseCache(false) scope
    // an unclosed FileCacheImageInputStream leaks a temp file until GC
    var iis: javax.imageio.stream.ImageInputStream = null
    try {
      iis = javax.imageio.ImageIO.createImageInputStream(
        new java.io.ByteArrayInputStream(payload))
      reader.setInput(iis, false, true)
      // allowSearch=true forces a full stream scan, so a truncated
      // payload fails HERE (one exception) rather than on a later read
      val n = reader.getNumImages(true)
      if (n <= 0) None
      else Some((0 until n).map(reader.read(_)))
    } catch {
      case scala.util.control.NonFatal(_) => None
    } finally {
      reader.dispose()
      if (iis != null) iis.close()
    }
  }

  /** REAL multi-frame video-style decode: each GIF payload's frames →
    * per-frame perceptual hashes `(media_id, frame_idx, dhash)` — the
    * temporal fingerprint [[graft.similarity.BandedHamming
    * .frameSequencePairs]] dedups on. Decode and hashing run in one
    * narrow partition-batched pass ([[dHash]]'s discipline): payload
    * bytes never cross a shuffle, only (id, frame_idx, 8-byte hash) rows
    * leave the scan — at 100 TB of video the downstream dedup is
    * corpus-size-bounded by hashes, not media bytes. Undecodable or
    * truncated payloads drop whole (callers audit counts). */
  def frameHashes(records: Dataset[MediaRecord]): Dataset[FrameHash] = {
    val spark: SparkSession = records.sparkSession
    import spark.implicits._
    records.mapPartitions { it =>
      javax.imageio.ImageIO.setUseCache(false)
      it.flatMap { r =>
        readGifFrames(r.payload) match {
          case Some(frames) =>
            frames.iterator.zipWithIndex.map { case (img, f) =>
              FrameHash(r.media_id, f, dHashOf(img))
            }
          case None => Iterator.empty
        }
      }
    }
  }

  final case class AudioFeatures(media_id: Long, sample_rate: Int,
                                 n_samples: Long, abs_sum: Long,
                                 sq_sum: Long, zero_crossings: Long)
  final case class AudioPrint(media_id: Long, fp: Long)

  /** Parse a WAV payload through the REAL JDK audio codec
    * (`javax.sound.sampled.AudioSystem` — RIFF/WAVE + AIFF/AU, no external
    * dependency) into signed 16-bit samples. Returns None for payloads the
    * codec rejects (same drop-and-audit contract as [[decodeImage]]). */
  private def readWavSamples(payload: Array[Byte]): Option[(Int, Array[Int])] =
    try {
      val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(payload))
      val fmt = ais.getFormat
      if (fmt.getSampleSizeInBits != 16 || fmt.getChannels != 1 ||
          fmt.isBigEndian) None
      else {
        val raw = ais.readAllBytes()
        val n = raw.length / 2
        val out = new Array[Int](n)
        var i = 0
        while (i < n) {
          out(i) = ((raw(2 * i + 1) << 8) | (raw(2 * i) & 0xff))
          i += 1
        }
        Some((fmt.getSampleRate.toInt, out))
      }
    } catch {
      case _: javax.sound.sampled.UnsupportedAudioFileException |
           _: java.io.IOException => None
    }

  /** REAL audio decode via the JDK's `javax.sound.sampled` — the audio
    * twin of [[decodeImage]]: sample rate and sample values come from the
    * actual parsed container, partition-batched so codec probing
    * initializes once per partition. Features are EXACT INTEGER
    * arithmetic over the decoded int16 stream (|s| sum, s² energy, strict
    * sign-flip zero crossings), so an oracle can replay them
    * bit-for-bit from a planted sample function — no float in the path.
    * Undecodable / non-16-bit-mono payloads are dropped for the caller to
    * audit, the quarantine shape a training pipeline uses. */
  def decodeAudio(records: Dataset[MediaRecord]): Dataset[AudioFeatures] = {
    val spark: SparkSession = records.sparkSession
    import spark.implicits._
    records.mapPartitions { it =>
      it.flatMap { r =>
        readWavSamples(r.payload).map { case (rate, s) =>
          var abs = 0L; var sq = 0L; var zc = 0L
          var i = 0
          while (i < s.length) {
            abs += math.abs(s(i).toLong)
            sq += s(i).toLong * s(i)
            if (i > 0 && s(i).toLong * s(i - 1) < 0) zc += 1
            i += 1
          }
          AudioFeatures(r.media_id, rate, s.length.toLong, abs, sq, zc)
        }
      }
    }
  }

  /** REAL acoustic fingerprint over decoded samples — the audio analogue
    * of [[dHash]] (the simplified Chromaprint/Shazam shape): split the
    * decoded stream into 33 contiguous windows (sample t → window
    * `t·33 / n`, integer division — exactly the dHash point-sampling
    * discipline), per-window energy `Σ s²` in exact int64, and bit `w` of
    * the 32-bit fingerprint is set iff `E(w+1) > E(w)`. Energy DELTAS are
    * robust to small amplitude perturbations (a ±1-per-sample near-dup
    * moves each window energy by O(Σ|s|) ≪ the inter-window spread), so
    * near-duplicate clips land within a few Hamming bits while
    * distinct-seed clips differ in ~16 — the property the banded
    * candidate join (q385) exploits. Clips shorter than 33 samples are
    * dropped (no stable windowing). */
  def audioFingerprint(records: Dataset[MediaRecord]): Dataset[AudioPrint] = {
    val spark: SparkSession = records.sparkSession
    import spark.implicits._
    records.mapPartitions { it =>
      it.flatMap { r =>
        readWavSamples(r.payload).collect {
          case (_, s) if s.length >= 33 =>
            val e = new Array[Long](33)
            var i = 0
            while (i < s.length) {
              // window index in Long: i * 33 overflows Int past ~65M
              // samples (2.3h at 8kHz) and would index negative
              e((i.toLong * 33 / s.length).toInt) += s(i).toLong * s(i)
              i += 1
            }
            var fp = 0L
            var w = 0
            while (w < 32) {
              if (e(w + 1) > e(w)) fp |= 1L << w
              w += 1
            }
            AudioPrint(r.media_id, fp)
        }
      }
    }
  }

  /** REAL image decode via the JDK's `javax.imageio` (PNG/JPEG/BMP/GIF —
    * no external codec dependency): width/height/band-count come from the
    * actual decoded raster, partition-batched so codec state (and the
    * in-executor disk-cache opt-out) initializes once per partition.
    * Payloads ImageIO cannot decode are dropped — callers audit counts
    * (a training pipeline quarantines them the same way). */
  def decodeImage(records: Dataset[MediaRecord]): Dataset[ImageFeatures] = {
    val spark: SparkSession = records.sparkSession
    import spark.implicits._
    records.mapPartitions { it =>
      // per-partition codec init (amortized, like mapInPandas batch init)
      javax.imageio.ImageIO.setUseCache(false)
      val md = java.security.MessageDigest.getInstance("MD5")
      it.flatMap { r =>
        val img = javax.imageio.ImageIO.read(
          new java.io.ByteArrayInputStream(r.payload))
        if (img == null) None
        else {
          md.reset()
          val d = md.digest(r.payload)
          Some(ImageFeatures(r.media_id, img.getWidth, img.getHeight,
            img.getRaster.getNumBands, d.map("%02x".format(_)).mkString))
        }
      }
    }
  }
}
