package graft.similarity

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persistent banded-Hamming dedup index for MEDIA fingerprint codes
  * (image dHash, acoustic fingerprints, per-frame clip hashes — any
  * ≤64-bit code) — the [[DedupIndex]] lifecycle with [[BandedHamming]]
  * as the candidate engine instead of MinHash: fingerprint each batch
  * ONCE as it arrives, match it against the stored corpus at O(batch)
  * shuffle cost, and fold it into the index; the corpus codes are never
  * recomputed and the media bytes themselves are never stored or
  * re-decoded.
  *
  * Layout (three tables + manifest under one root):
  *   <path>/codes      — (id, code), BUCKETED by id
  *                       (idempotent-append anti-join side)
  *   <path>/bands      — (id, code, band, bkey), BUCKETED by (band, bkey)
  *                       (candidate join side)
  *   <path>/band_sizes — (band, bkey, n) append-only per-batch size
  *                       deltas (the cap fold's corpus half, [[CapFold]])
  *   <path>/index.json — band constants + bucket count, pinned at build
  *
  * The two big tables are external BUCKETED catalog tables
  * ([[IndexCatalog]]), so [[dedupBatch]]'s candidate join and the
  * streaming sink's indexed-id anti-join co-locate on the bucket layout
  * and exchange ONLY the batch side — per-micro-batch shuffle cost is
  * O(batch) regardless of corpus size (both tables are a few dozen
  * bytes per media item; `numBuckets` = 8 at test scale, O(thousands)
  * at 100 TB).
  */
object MediaDedupIndex {

  final case class Manifest(nBands: Int, bandBits: Int, numBuckets: Int = 8)

  private def codesName(path: String) = IndexCatalog.tableName("graft_media_codes", path)
  private def bandsName(path: String) = IndexCatalog.tableName("graft_media_bands", path)

  private def manifestPath(path: String) =
    new org.apache.hadoop.fs.Path(path, "index.json")

  private def writeManifest(spark: SparkSession, path: String, m: Manifest): Unit = {
    val p = manifestPath(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = fs.create(p, true)
    try out.write(
      s"""{"nBands": ${m.nBands}, "bandBits": ${m.bandBits}, "numBuckets": ${m.numBuckets}}"""
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
    def field(name: String): Option[Int] =
      s""""$name"\\s*:\\s*(\\d+)""".r.findFirstMatchIn(text).map(_.group(1).toInt)
    def required(name: String): Int = field(name).getOrElse(
      throw new IllegalStateException(
        s"media dedup index manifest at $p missing field $name"))
    // pre-bucketing manifests carry no numBuckets; those indexes were
    // plain parquet dirs — re-build to adopt the bucketed layout
    Manifest(required("nBands"), required("bandBits"),
      field("numBuckets").getOrElse(0))
  }

  /** Write a fresh index from (id, code) rows (overwrites any existing). */
  def build(codes: DataFrame, idCol: String, codeCol: String, path: String,
            nBands: Int = 4, bandBits: Int = 16, numBuckets: Int = 8): Unit = {
    val spark = codes.sparkSession
    val normalized = codes.select(col(idCol).as("id"), col(codeCol).as("code"))
    IndexCatalog.writeFresh(normalized, codesName(path), s"$path/codes",
      Seq("id"), numBuckets)
    // re-read instead of recompute: the band explode must not re-run the
    // caller's (possibly decode-backed) lineage per reference
    val stored = spark.table(codesName(path))
    IndexCatalog.writeFresh(
      BandedHamming.bandKeys(stored, "id", "code", nBands, bandBits),
      bandsName(path), s"$path/bands", Seq("band", "bkey"), numBuckets)
    spark.table(bandsName(path)).groupBy(col("band"), col("bkey"))
      .agg(count(lit(1)).as("n"))
      .write.mode("overwrite").parquet(s"$path/band_sizes")
    writeManifest(spark, path, Manifest(nBands, bandBits, numBuckets))
  }

  /** Append new (id, code) rows using the index's band constants; each
    * table gains only the batch's rows in its bucket layout, band_sizes
    * gains the batch's per-bucket delta rows. */
  def append(codes: DataFrame, idCol: String, codeCol: String,
             path: String): Unit = {
    val spark = codes.sparkSession
    val m = manifest(spark, path)
    require(m.numBuckets > 0,
      s"media index at $path predates the bucketed layout; re-build it")
    // pin the batch BEFORE mutating any index table: the caller's frame
    // may reference the index itself (the idempotent-append anti-join in
    // StreamOps does), and the codes append refreshes the table's file
    // index IN PLACE — a lazy recompute after it would see the batch's
    // own ids as already indexed and silently append zero band rows
    val normalized = codes.select(col(idCol).as("id"), col(codeCol).as("code"))
      .localCheckpoint(true)
    IndexCatalog.appendTo(normalized, codesName(path), s"$path/codes",
      Seq("id"), m.numBuckets)
    // one band pass (over the pinned batch) feeds both the bands table
    // and the size deltas
    val bandRows = BandedHamming.bandKeys(normalized, "id", "code",
      m.nBands, m.bandBits)
    IndexCatalog.appendTo(bandRows, bandsName(path), s"$path/bands",
      Seq("band", "bkey"), m.numBuckets)
    bandRows.groupBy(col("band"), col("bkey")).agg(count(lit(1)).as("n"))
      .write.mode("append").parquet(s"$path/band_sizes")
  }

  /** Stored ids, column-pruned and bucketed — the anti-join side for
    * idempotent appends exchanges only the incoming batch. */
  def indexedIds(spark: SparkSession, path: String): DataFrame = {
    val m = manifest(spark, path)
    IndexCatalog.table(spark, codesName(path), s"$path/codes",
      Seq("id"), m.numBuckets).select(col("id"))
  }

  /** Near-duplicates of `batch` (id, code) rows against the stored index
    * at O(batch) shuffle cost: `(corpus_id, batch_id, hamming)` for
    * Hamming ≤ `maxHamming`, candidates from the persisted bucketed band
    * keys (corpus side never exchanged — pinned by PlanSpec), never
    * all-pairs; the cap fold reads the precomputed band_sizes deltas,
    * never the bands table. */
  def dedupBatch(spark: SparkSession, path: String, batch: DataFrame,
                 idCol: String, codeCol: String, maxHamming: Int,
                 maxBucket: Option[Int] = None): DataFrame = {
    val m = manifest(spark, path)
    val corpusBands = IndexCatalog.table(spark, bandsName(path),
      s"$path/bands", Seq("band", "bkey"), m.numBuckets)
    val sizes = spark.read.parquet(s"$path/band_sizes")
    BandedHamming.pairsAgainstIndex(corpusBands,
      batch.select(col(idCol).as("id"), col(codeCol).as("code")),
      "id", "code", m.nBands, m.bandBits, maxHamming, maxBucket, Some(sizes))
  }
}
