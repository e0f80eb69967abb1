package graft.similarity

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persistent banded-Hamming dedup index for MEDIA fingerprint codes
  * (image dHash, acoustic fingerprints — any ≤64-bit code) — the
  * [[DedupIndex]] lifecycle with [[BandedHamming]] as the candidate
  * engine instead of MinHash: fingerprint each batch ONCE as it arrives,
  * match it against the stored corpus at O(batch) cost, and fold it into
  * the index; the corpus codes are never recomputed and the media bytes
  * themselves are never stored or re-decoded.
  *
  * Layout (two parquet tables + manifest under one root):
  *   <path>/codes  — (id, code)                 verify / id anti-join side
  *   <path>/bands  — (id, code, band, bkey)     candidate side
  *   <path>/index.json — band constants, pinned at build time
  *
  * Scale shape: both tables are a few dozen bytes per media item. At
  * 100 TB the bands table would additionally be bucketed BY (band, bkey)
  * so the per-batch candidate join co-locates without a corpus-side
  * shuffle (the batch side alone is repartitioned to the bucket layout).
  */
object MediaDedupIndex {

  final case class Manifest(nBands: Int, bandBits: Int)

  private def manifestPath(path: String) =
    new org.apache.hadoop.fs.Path(path, "index.json")

  private def writeManifest(spark: SparkSession, path: String, m: Manifest): Unit = {
    val p = manifestPath(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = fs.create(p, true)
    try out.write(s"""{"nBands": ${m.nBands}, "bandBits": ${m.bandBits}}"""
      .getBytes("UTF-8"))
    finally out.close()
  }

  /** True iff an index (manifest) is already present at `path`. */
  def exists(spark: SparkSession, path: String): Boolean = {
    val p = manifestPath(path)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(p)
  }

  /** Read the band constants the index was built with. */
  def manifest(spark: SparkSession, path: String): Manifest = {
    val p = manifestPath(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val in = fs.open(p)
    val text = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
    finally in.close()
    def field(name: String): Int =
      s""""$name"\\s*:\\s*(\\d+)""".r.findFirstMatchIn(text)
        .getOrElse(throw new IllegalStateException(
          s"media dedup index manifest at $p missing field $name"))
        .group(1).toInt
    Manifest(field("nBands"), field("bandBits"))
  }

  /** Write a fresh index from (id, code) rows (overwrites any existing). */
  def build(codes: DataFrame, idCol: String, codeCol: String, path: String,
            nBands: Int = 4, bandBits: Int = 16): Unit = {
    val spark = codes.sparkSession
    val normalized = codes.select(col(idCol).as("id"), col(codeCol).as("code"))
    normalized.write.mode("overwrite").parquet(s"$path/codes")
    // re-read instead of recompute: the band explode must not re-run the
    // caller's (possibly decode-backed) lineage per reference
    val stored = spark.read.parquet(s"$path/codes")
    BandedHamming.bandKeys(stored, "id", "code", nBands, bandBits)
      .write.mode("overwrite").parquet(s"$path/bands")
    writeManifest(spark, path, Manifest(nBands, bandBits))
  }

  /** Append new (id, code) rows using the index's band constants. */
  def append(codes: DataFrame, idCol: String, codeCol: String,
             path: String): Unit = {
    val spark = codes.sparkSession
    val m = manifest(spark, path)
    val normalized = codes.select(col(idCol).as("id"), col(codeCol).as("code"))
    normalized.write.mode("append").parquet(s"$path/codes")
    BandedHamming.bandKeys(normalized, "id", "code", m.nBands, m.bandBits)
      .write.mode("append").parquet(s"$path/bands")
  }

  /** Stored ids, column-pruned — the anti-join side for idempotent
    * appends. */
  def indexedIds(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(s"$path/codes").select(col("id"))

  /** Near-duplicates of `batch` (id, code) rows against the stored index
    * at O(batch) cost: `(corpus_id, batch_id, hamming)` for Hamming ≤
    * `maxHamming`, candidates from the persisted band keys, never
    * all-pairs. */
  def dedupBatch(spark: SparkSession, path: String, batch: DataFrame,
                 idCol: String, codeCol: String, maxHamming: Int,
                 maxBucket: Option[Int] = None): DataFrame = {
    val m = manifest(spark, path)
    val corpusBands = spark.read.parquet(s"$path/bands")
    BandedHamming.pairsAgainstIndex(corpusBands,
      batch.select(col(idCol).as("id"), col(codeCol).as("code")),
      "id", "code", m.nBands, m.bandBits, maxHamming, maxBucket)
  }
}
