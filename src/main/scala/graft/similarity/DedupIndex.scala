package graft.similarity

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persistent MinHash dedup index — the lifecycle around
  * [[MinHashLsh.nearDuplicatesAgainstIndex]] that makes "fingerprint the
  * corpus ONCE" real across runs: build → write → load → dedup a batch →
  * append the batch → dedup the next batch, with the corpus never
  * re-shingled AND never re-shuffled.
  *
  * Layout (three tables + manifest under one root):
  *   <path>/fingerprints — (idCol, shingle_set), BUCKETED by idCol
  *                         (verify join / indexed-id anti-join side)
  *   <path>/bands        — (idCol, band), BUCKETED by band
  *                         (candidate join side)
  *   <path>/band_sizes   — (band, n) append-only per-batch size deltas
  *                         (the cap fold's corpus half — see [[CapFold]])
  *
  * The two big tables are external BUCKETED catalog tables
  * ([[IndexCatalog]]): each per-batch join against them co-locates on
  * the bucket layout, so [[dedupBatch]] exchanges ONLY the batch side —
  * per-batch shuffle cost is O(batch), not O(corpus + batch), which is
  * the property that keeps continuous-ingestion dedup alive at 100 TB
  * (a frequent micro-batch cadence re-shuffling a TB-scale band table
  * was the r9 scale finding this layout removes). Scans of the corpus
  * tables are still O(index) I/O per batch — the index is a few percent
  * of the text it covers — and the cap fold reads only the small
  * band_sizes deltas, never the bands table.
  *
  * Appends are bucketed table appends — each batch adds its own files
  * per bucket, no rewrite of existing index data. Band constants
  * (shingleN/bands/rowsPerBand) and the bucket count are fixed at build
  * time and enforced via a JSON manifest written next to the tables.
  * `numBuckets` sizes the per-batch join width: 8 suits test scale; a
  * 100 TB corpus would use O(thousands) so each bucket's band rows fit
  * an executor.
  *
  * LEGACY layout (manifest without `numBuckets`): flat/recursive parquet
  * dirs as written by [[appendAtomic]]'s rename-published batch units —
  * still read by [[load]]/[[dedupBatch]], but without the bucketing
  * guarantee (the corpus side shuffles per batch). The two layouts don't
  * mix on one root: [[appendAtomic]] refuses a bucketed index and
  * [[append]] refuses a legacy one, because a rename-published subdir
  * inside a bucketed table location would corrupt the bucket layout.
  */
object DedupIndex {

  final case class Manifest(shingleN: Int, bands: Int, rowsPerBand: Int,
                            numBuckets: Int = 0) {
    def bucketed: Boolean = numBuckets > 0
  }

  private def fpsName(path: String) = IndexCatalog.tableName("graft_dedup_fps", path)
  private def bandsName(path: String) = IndexCatalog.tableName("graft_dedup_bands", path)

  private def manifestPath(path: String) = new org.apache.hadoop.fs.Path(path, "index.json")

  private def writeManifest(spark: SparkSession, path: String, m: Manifest): Unit = {
    val p = manifestPath(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = fs.create(p, true)
    val buckets = if (m.bucketed) s""", "numBuckets": ${m.numBuckets}""" else ""
    try out.write(
      s"""{"shingleN": ${m.shingleN}, "bands": ${m.bands}, "rowsPerBand": ${m.rowsPerBand}$buckets}"""
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
    val text = try scala.io.Source.fromInputStream(in, "UTF-8").mkString finally in.close()
    def field(name: String): Option[Int] =
      s""""$name"\\s*:\\s*(\\d+)""".r.findFirstMatchIn(text).map(_.group(1).toInt)
    def required(name: String): Int = field(name).getOrElse(
      throw new IllegalStateException(
        s"dedup index manifest at $p missing field $name"))
    Manifest(required("shingleN"), required("bands"), required("rowsPerBand"),
      field("numBuckets").getOrElse(0))
  }

  /** The stored fingerprints table's id column (the bucket column) —
    * derived from the stored schema so re-registration in a fresh
    * session needs no extra manifest field. */
  private def storedIdCol(spark: SparkSession, path: String): String =
    spark.read.parquet(s"$path/fingerprints").schema.head.name

  /** Fingerprint `docs` and write a fresh bucketed index (overwrites any
    * existing index at `path`). */
  def build(docs: DataFrame, idCol: String, textCol: String, path: String,
            shingleN: Int = 3, bands: Int = 16, rowsPerBand: Int = 4,
            numBuckets: Int = 8): Unit = {
    val spark = docs.sparkSession
    val fps = MinHashLsh.fingerprints(docs, idCol, textCol, shingleN)
    IndexCatalog.writeFresh(fps, fpsName(path), s"$path/fingerprints",
      Seq(idCol), numBuckets)
    // band keys from the STORED fingerprints (no re-shingle via lineage)
    val stored = spark.table(fpsName(path))
    IndexCatalog.writeFresh(
      MinHashLsh.bandIndex(stored, idCol, bands, rowsPerBand),
      bandsName(path), s"$path/bands", Seq("band"), numBuckets)
    // size snapshot from the STORED bands (no recompute)
    spark.table(bandsName(path)).groupBy(col("band"))
      .agg(count(lit(1)).as("n"))
      .write.mode("overwrite").parquet(s"$path/band_sizes")
    writeManifest(spark, path, Manifest(shingleN, bands, rowsPerBand, numBuckets))
  }

  /** The legacy layout's readable paths for one table: root-level files
    * (pre-atomic plain appends), rename-published `batch-*` units, and
    * COMMITTED pointer-published `batch-p-*` units — a crashed rename's
    * `.tmp-*` or an uncommitted pointer directory is never read. */
  private def legacyPaths(spark: SparkSession, path: String,
                          table: String): Seq[String] = {
    val root = new org.apache.hadoop.fs.Path(path)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val commits = graft.core.AppendCommits.committedKeys(fs, root)
    val paths = graft.core.AppendCommits.readablePaths(fs,
      new org.apache.hadoop.fs.Path(root, table), commits).map(_.toString)
    if (paths.isEmpty) throw new IllegalStateException(
      s"index at $path has no published $table batches")
    paths
  }

  /** Load the two index tables: (fingerprints, bands). Bucketed indexes
    * come back as catalog tables (partitioning-aware); legacy indexes by
    * enumerating published units — [[appendAtomic]] publishes per-batch
    * `batch-<key>` (rename) or committed `batch-p-<key>` (pointer)
    * subdirectories, one read covers every legacy shape. */
  def load(spark: SparkSession, path: String): (DataFrame, DataFrame) = {
    val m = manifest(spark, path)
    if (m.bucketed)
      (IndexCatalog.table(spark, fpsName(path), s"$path/fingerprints",
        Seq(storedIdCol(spark, path)), m.numBuckets),
        IndexCatalog.table(spark, bandsName(path), s"$path/bands",
          Seq("band"), m.numBuckets))
    else
      (spark.read.parquet(legacyPaths(spark, path, "fingerprints"): _*),
        spark.read.parquet(legacyPaths(spark, path, "bands"): _*))
  }

  /** Stored ids, column-pruned — the anti-join side for idempotent
    * appends; bucketed by this column, so the anti-join exchanges only
    * the incoming batch. */
  def indexedIds(spark: SparkSession, path: String): DataFrame = {
    val m = manifest(spark, path)
    if (m.bucketed) {
      val idCol = storedIdCol(spark, path)
      IndexCatalog.table(spark, fpsName(path), s"$path/fingerprints",
        Seq(idCol), m.numBuckets).select(col(idCol))
    } else {
      val df = spark.read.option("recursiveFileLookup", "true")
        .parquet(s"$path/fingerprints")
      df.select(col(df.schema.head.name))
    }
  }

  /** Append a new batch to an existing bucketed index using ITS band
    * constants — the batch is shingled per written table (O(batch));
    * both big tables gain only the batch's rows in their bucket layout,
    * and band_sizes gains the batch's per-band delta rows. */
  def append(batch: DataFrame, idCol: String, textCol: String, path: String): Unit = {
    val spark = batch.sparkSession
    val m = manifest(spark, path)
    require(m.bucketed,
      s"index at $path uses the legacy rename-published layout; append via appendAtomic")
    // pin the batch (shingled ONCE) BEFORE mutating any index table: the
    // caller's frame may reference the index itself (the idempotent-
    // append anti-join in StreamOps does), and the fingerprints append
    // refreshes the table's file index IN PLACE — a lazy recompute after
    // it would see the batch's own ids as already indexed and silently
    // append zero band rows
    val fps = MinHashLsh.fingerprints(batch, idCol, textCol, m.shingleN)
      .localCheckpoint(true)
    IndexCatalog.appendTo(fps, fpsName(path), s"$path/fingerprints",
      Seq(idCol), m.numBuckets)
    val bandRows = MinHashLsh.bandIndex(fps, idCol, m.bands, m.rowsPerBand)
    IndexCatalog.appendTo(bandRows, bandsName(path), s"$path/bands",
      Seq("band"), m.numBuckets)
    bandRows.groupBy(col("band")).agg(count(lit(1)).as("n"))
      .write.mode("append").parquet(s"$path/band_sizes")
  }

  /** True iff [[appendAtomic]] fully published batch `batchKey`: under
    * rename publish, the bands batch directory is renamed LAST, so its
    * presence (plus the manifest) certifies the whole batch; under
    * pointer publish, the `_commits/<key>` file is created last and IS
    * the appliedness. */
  def batchApplied(spark: SparkSession, path: String, batchKey: String): Boolean = {
    val root = new org.apache.hadoop.fs.Path(path)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val renamed = fs.exists(
      new org.apache.hadoop.fs.Path(s"$path/bands/batch-$batchKey"))
    (renamed || graft.core.AppendCommits.isCommitted(fs, root, batchKey)) &&
      exists(spark, path)
  }

  /** CRASH-ATOMIC batch append on the LEGACY (rename-published) layout:
    * each table gains the batch's rows as one `batch-<key>` directory
    * moved into place with a single rename (bands last, manifest last of
    * all), so appliedness ([[batchApplied]]) travels inside the
    * published unit — a crash at any point leaves a rerun that either
    * completes the batch (deterministic content overwrites any partial
    * unit in place) or skips it; there is no window that double-appends.
    * Creates the index (manifest, without `numBuckets`) on first use.
    * The maintenance-task twin of [[append]]; the tradeoff vs the
    * bucketed layout: rename-unit atomicity, at the cost of per-batch
    * corpus-side shuffles in [[dedupBatch]] (no bucket co-location). */
  def appendAtomic(batch: DataFrame, idCol: String, textCol: String,
                   path: String, batchKey: String,
                   shingleN: Int = 3, bands: Int = 16,
                   rowsPerBand: Int = 4, publish: String = "rename"): Unit = {
    val spark = batch.sparkSession
    val m = if (exists(spark, path)) manifest(spark, path)
            else Manifest(shingleN, bands, rowsPerBand)
    require(!m.bucketed,
      s"index at $path is bucketed; appendAtomic's rename-published batch " +
        "units would corrupt the bucket layout — append via append")
    val root = new org.apache.hadoop.fs.Path(path)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    publish match {
      case "rename" =>
        def publishUnit(df: DataFrame, table: String): org.apache.hadoop.fs.Path = {
          val tmp = new org.apache.hadoop.fs.Path(s"$path/$table/.tmp-$batchKey")
          val dest = new org.apache.hadoop.fs.Path(s"$path/$table/batch-$batchKey")
          fs.delete(tmp, true)
          df.write.mode("overwrite").parquet(tmp.toString)
          fs.delete(dest, true) // stale partial unit from a crashed attempt
          if (!fs.rename(tmp, dest)) throw new IllegalStateException(
            s"atomic index publish failed: $tmp -> $dest")
          dest
        }
        val fpsDir = publishUnit(
          MinHashLsh.fingerprints(batch, idCol, textCol, m.shingleN),
          "fingerprints")
        // band keys from the PUBLISHED fingerprints (no re-shingle via lineage)
        val stored = spark.read.parquet(fpsDir.toString)
        publishUnit(MinHashLsh.bandIndex(stored, idCol, m.bands, m.rowsPerBand),
          "bands")
        if (!exists(spark, path)) writeManifest(spark, path, m)
      case "pointer" =>
        // object-store-safe (no rename): data lands under deterministic
        // batch-p-<key> dirs a rerun overwrites IN PLACE, then ONE
        // create-no-overwrite _commits/<key> publishes both tables at
        // once; readers ([[load]]) skip uncommitted pointer dirs, so a
        // torn attempt is never read — see [[graft.core.AppendCommits]]
        val prefix = graft.core.AppendCommits.PointerPrefix
        val fpsDir = s"$path/fingerprints/$prefix$batchKey"
        MinHashLsh.fingerprints(batch, idCol, textCol, m.shingleN)
          .write.mode("overwrite").parquet(fpsDir)
        val stored = spark.read.parquet(fpsDir)
        MinHashLsh.bandIndex(stored, idCol, m.bands, m.rowsPerBand)
          .write.mode("overwrite").parquet(s"$path/bands/$prefix$batchKey")
        if (!exists(spark, path)) writeManifest(spark, path, m)
        graft.core.AppendCommits.commit(fs, root, batchKey)
      case other => throw new IllegalArgumentException(
        s"unknown index publish mode '$other' (rename/pointer)")
    }
  }

  /** Near-duplicates of `batch` against the stored index. Never re-reads
    * or re-shingles the indexed corpus; on a bucketed index the corpus
    * side is never re-SHUFFLED either (only the batch side exchanges to
    * the bucket layout — pinned by PlanSpec) and the cap fold reads the
    * precomputed band_sizes deltas instead of re-counting the bands
    * table. */
  def dedupBatch(spark: SparkSession, path: String, batch: DataFrame,
                 idCol: String, textCol: String, threshold: Double = 0.5,
                 maxBucket: Option[Int] = None): DataFrame = {
    val m = manifest(spark, path)
    val (fps, bands) = load(spark, path)
    val sizes =
      if (m.bucketed) Some(spark.read.parquet(s"$path/band_sizes"))
      else None
    MinHashLsh.nearDuplicatesAgainstIndex(fps, bands, batch, idCol, textCol,
      m.shingleN, m.bands, m.rowsPerBand, threshold, maxBucket, sizes)
  }
}
