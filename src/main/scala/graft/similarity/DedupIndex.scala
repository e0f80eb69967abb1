package graft.similarity

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Persistent MinHash dedup index — the lifecycle around
  * [[MinHashLsh.nearDuplicatesAgainstIndex]] that makes "fingerprint the
  * corpus ONCE" real across runs: build → write → load → dedup a batch →
  * append the batch → dedup the next batch, with the corpus never
  * re-shingled.
  *
  * Layout (two parquet tables under one root):
  *   <path>/fingerprints  — (idCol, shingle_set)   verify side
  *   <path>/bands         — (idCol, band)          candidate side
  *
  * Scale shape: both tables are a few percent the size of the text they
  * index (shingle hashes and band keys, never raw text). Appends are
  * plain parquet appends — each batch adds its own files, no rewrite of
  * existing index data; at 100 TB the bands table would additionally be
  * bucketed BY band so the per-batch candidate join co-locates without a
  * corpus-side shuffle (the batch side alone is repartitioned to the
  * bucket layout). Band constants (shingleN/bands/rowsPerBand) are fixed
  * at build time and must match on append — enforced via a tiny JSON
  * manifest written next to the tables.
  */
object DedupIndex {

  final case class Manifest(shingleN: Int, bands: Int, rowsPerBand: Int)

  private def manifestPath(path: String) = new org.apache.hadoop.fs.Path(path, "index.json")

  private def writeManifest(spark: SparkSession, path: String, m: Manifest): Unit = {
    val p = manifestPath(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = fs.create(p, true)
    try out.write(
      s"""{"shingleN": ${m.shingleN}, "bands": ${m.bands}, "rowsPerBand": ${m.rowsPerBand}}"""
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
    def field(name: String): Int =
      s""""$name"\\s*:\\s*(\\d+)""".r.findFirstMatchIn(text)
        .getOrElse(throw new IllegalStateException(
          s"dedup index manifest at $p missing field $name"))
        .group(1).toInt
    Manifest(field("shingleN"), field("bands"), field("rowsPerBand"))
  }

  /** Fingerprint `docs` and write a fresh index (overwrites any existing). */
  def build(docs: DataFrame, idCol: String, textCol: String, path: String,
            shingleN: Int = 3, bands: Int = 16, rowsPerBand: Int = 4): Unit = {
    val fps = MinHashLsh.fingerprints(docs, idCol, textCol, shingleN)
    fps.write.mode("overwrite").parquet(s"$path/fingerprints")
    // re-read instead of recompute: the band explode below must not
    // re-shingle the text (lineage would recompute fps per reference)
    val spark = docs.sparkSession
    val stored = spark.read.parquet(s"$path/fingerprints")
    MinHashLsh.bandIndex(stored, idCol, bands, rowsPerBand)
      .write.mode("overwrite").parquet(s"$path/bands")
    writeManifest(spark, path, Manifest(shingleN, bands, rowsPerBand))
  }

  /** Load the two index tables: (fingerprints, bands). Recursive lookup:
    * [[build]]/[[append]] write files at each table root, while
    * [[appendAtomic]] publishes per-batch `batch-<key>` subdirectories —
    * one read covers both layouts. */
  def load(spark: SparkSession, path: String): (DataFrame, DataFrame) =
    (spark.read.option("recursiveFileLookup", "true")
      .parquet(s"$path/fingerprints"),
      spark.read.option("recursiveFileLookup", "true")
        .parquet(s"$path/bands"))

  /** Append a new batch to an existing index using ITS band constants —
    * the batch is shingled once, both tables gain only the batch's rows. */
  def append(batch: DataFrame, idCol: String, textCol: String, path: String): Unit = {
    val spark = batch.sparkSession
    val m = manifest(spark, path)
    val fps = MinHashLsh.fingerprints(batch, idCol, textCol, m.shingleN)
    fps.write.mode("append").parquet(s"$path/fingerprints")
    MinHashLsh.bandIndex(fps, idCol, m.bands, m.rowsPerBand)
      .write.mode("append").parquet(s"$path/bands")
  }

  /** True iff [[appendAtomic]] fully published batch `batchKey`: the
    * bands batch directory is renamed LAST, so its presence (plus the
    * manifest) certifies the whole batch — data and appliedness are one
    * unit, the crash-atomicity [[append]]'s separate marker lacks. */
  def batchApplied(spark: SparkSession, path: String, batchKey: String): Boolean = {
    val bands = new org.apache.hadoop.fs.Path(s"$path/bands/batch-$batchKey")
    val fs = bands.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.exists(bands) && exists(spark, path)
  }

  /** CRASH-ATOMIC batch append: each table gains the batch's rows as one
    * `batch-<key>` directory moved into place with a single rename
    * (bands last, manifest last of all), so appliedness
    * ([[batchApplied]]) travels inside the published unit — a crash at
    * any point leaves a rerun that either completes the batch
    * (deterministic content overwrites any partial unit in place) or
    * skips it; there is no window that double-appends. Creates the index
    * (manifest) on first use. The maintenance-task twin of [[append]]
    * (which stays the cheap plain-append for callers with their own
    * exactly-once envelope, e.g. streaming foreachBatch). */
  def appendAtomic(batch: DataFrame, idCol: String, textCol: String,
                   path: String, batchKey: String,
                   shingleN: Int = 3, bands: Int = 16,
                   rowsPerBand: Int = 4): Unit = {
    val spark = batch.sparkSession
    val m = if (exists(spark, path)) manifest(spark, path)
            else Manifest(shingleN, bands, rowsPerBand)
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    def publish(df: DataFrame, table: String): org.apache.hadoop.fs.Path = {
      val tmp = new org.apache.hadoop.fs.Path(s"$path/$table/.tmp-$batchKey")
      val dest = new org.apache.hadoop.fs.Path(s"$path/$table/batch-$batchKey")
      fs.delete(tmp, true)
      df.write.mode("overwrite").parquet(tmp.toString)
      fs.delete(dest, true) // stale partial unit from a crashed attempt
      if (!fs.rename(tmp, dest)) throw new IllegalStateException(
        s"atomic index publish failed: $tmp -> $dest")
      dest
    }
    val fpsDir = publish(
      MinHashLsh.fingerprints(batch, idCol, textCol, m.shingleN),
      "fingerprints")
    // band keys from the PUBLISHED fingerprints (no re-shingle via lineage)
    val stored = spark.read.parquet(fpsDir.toString)
    publish(MinHashLsh.bandIndex(stored, idCol, m.bands, m.rowsPerBand),
      "bands")
    if (!exists(spark, path)) writeManifest(spark, path, m)
  }

  /** Near-duplicates of `batch` against the stored index (never re-reads
    * or re-shingles the indexed corpus). */
  def dedupBatch(spark: SparkSession, path: String, batch: DataFrame,
                 idCol: String, textCol: String, threshold: Double = 0.5,
                 maxBucket: Option[Int] = None): DataFrame = {
    val m = manifest(spark, path)
    val (fps, bands) = load(spark, path)
    MinHashLsh.nearDuplicatesAgainstIndex(fps, bands, batch, idCol, textCol,
      m.shingleN, m.bands, m.rowsPerBand, threshold, maxBucket)
  }
}
