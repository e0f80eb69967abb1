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

  /** Band constants + bucketed-layout metadata, persisted as
    * `<path>/index.json`. `version` names the live table directories
    * ([[IndexCatalog.tableDir]]) so a rebucket switches layouts through
    * ONE atomic manifest replace; `idCol` + the two schema DDLs make
    * fresh-session re-registration O(1) metadata instead of a full
    * file-listing footer read of a possibly-huge index (r10 advice).
    * Legacy manifests (pre-r11) lack the new fields — `idCol`/DDLs fall
    * back to a footer read, `version` to 0 (the unsuffixed dirs). */
  final case class Manifest(shingleN: Int, bands: Int, rowsPerBand: Int,
                            numBuckets: Int = 0, version: Int = 0,
                            idCol: String = "", fpsDdl: String = "",
                            bandsDdl: String = "", epoch: Int = 0) {
    def bucketed: Boolean = numBuckets > 0
  }

  private def fpsDir(path: String, m: Manifest): String =
    IndexCatalog.tableDir(path, "fingerprints", m.version)
  private def bandsDir(path: String, m: Manifest): String =
    IndexCatalog.tableDir(path, "bands", m.version)
  // table names hash the LIVE table dir: a rebucketed layout (new dir)
  // gets a fresh name, so no session can confuse the two registrations
  private def fpsName(dir: String) = IndexCatalog.tableName("graft_dedup_fps", dir)
  private def bandsName(dir: String) = IndexCatalog.tableName("graft_dedup_bands", dir)
  private def opt(s: String): Option[String] = Some(s).filter(_.nonEmpty)

  private def manifestPath(path: String) = new org.apache.hadoop.fs.Path(path, "index.json")

  private def manifestJson(m: Manifest): String = {
    val buckets = if (m.bucketed)
      s""", "numBuckets": ${m.numBuckets}, "version": ${m.version}""" +
        s""", "epoch": ${m.epoch}""" +
        s""", "idCol": "${IndexCatalog.jsonEscape(m.idCol)}"""" +
        s""", "fpsDdl": "${IndexCatalog.jsonEscape(m.fpsDdl)}"""" +
        s""", "bandsDdl": "${IndexCatalog.jsonEscape(m.bandsDdl)}""""
    else ""
    s"""{"shingleN": ${m.shingleN}, "bands": ${m.bands}, "rowsPerBand": ${m.rowsPerBand}$buckets}"""
  }

  private def writeManifest(spark: SparkSession, path: String, m: Manifest): Unit =
    IndexCatalog.replaceManifest(spark, manifestPath(path), manifestJson(m))

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
    def sfield(name: String): String =
      IndexCatalog.stringField(text, name).getOrElse("")
    Manifest(required("shingleN"), required("bands"), required("rowsPerBand"),
      field("numBuckets").getOrElse(0), field("version").getOrElse(0),
      sfield("idCol"), sfield("fpsDdl"), sfield("bandsDdl"),
      field("epoch").getOrElse(0))
  }

  /** The stored fingerprints table's id column (the bucket column) —
    * from the manifest when present (r11+), else from the stored schema
    * (legacy bucketed manifests without `idCol`). */
  private def storedIdCol(spark: SparkSession, path: String,
                          m: Manifest): String =
    if (m.idCol.nonEmpty) m.idCol
    else spark.read.parquet(fpsDir(path, m)).schema.head.name

  /** Fingerprint `docs` and write a fresh bucketed index (overwrites any
    * existing index at `path`). */
  def build(docs: DataFrame, idCol: String, textCol: String, path: String,
            shingleN: Int = 3, bands: Int = 16, rowsPerBand: Int = 4,
            numBuckets: Int = 8): Unit = {
    val spark = docs.sparkSession
    // a rebuild over a rebucketed index must not orphan its _v<N> dirs
    if (exists(spark, path)) {
      val old = manifest(spark, path)
      if (old.bucketed && old.version > 0) {
        spark.sql(s"DROP TABLE IF EXISTS `${fpsName(fpsDir(path, old))}`")
        spark.sql(s"DROP TABLE IF EXISTS `${bandsName(bandsDir(path, old))}`")
        val fs = new org.apache.hadoop.fs.Path(path)
          .getFileSystem(spark.sparkContext.hadoopConfiguration)
        fs.delete(new org.apache.hadoop.fs.Path(fpsDir(path, old)), true)
        fs.delete(new org.apache.hadoop.fs.Path(bandsDir(path, old)), true)
      }
    }
    val m0 = Manifest(shingleN, bands, rowsPerBand, numBuckets, version = 0,
      idCol = idCol)
    val fps = MinHashLsh.fingerprints(docs, idCol, textCol, shingleN)
    IndexCatalog.writeFresh(fps, fpsName(fpsDir(path, m0)), fpsDir(path, m0),
      Seq(idCol), numBuckets)
    // band keys from the STORED fingerprints (no re-shingle via lineage)
    val stored = spark.table(fpsName(fpsDir(path, m0)))
    IndexCatalog.writeFresh(
      MinHashLsh.bandIndex(stored, idCol, bands, rowsPerBand),
      bandsName(bandsDir(path, m0)), bandsDir(path, m0), Seq("band"), numBuckets)
    // size snapshot from the STORED bands (no recompute)
    val bandsT = spark.table(bandsName(bandsDir(path, m0)))
    bandsT.groupBy(col("band"))
      .agg(count(lit(1)).as("n"))
      .write.mode("overwrite").parquet(s"$path/band_sizes")
    writeManifest(spark, path, m0.copy(
      fpsDdl = stored.schema.toDDL, bandsDdl = bandsT.schema.toDDL))
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
      (IndexCatalog.table(spark, fpsName(fpsDir(path, m)), fpsDir(path, m),
        Seq(storedIdCol(spark, path, m)), m.numBuckets, opt(m.fpsDdl),
        m.epoch),
        IndexCatalog.table(spark, bandsName(bandsDir(path, m)),
          bandsDir(path, m), Seq("band"), m.numBuckets, opt(m.bandsDdl),
          m.epoch))
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
      val idCol = storedIdCol(spark, path, m)
      IndexCatalog.table(spark, fpsName(fpsDir(path, m)), fpsDir(path, m),
        Seq(idCol), m.numBuckets, opt(m.fpsDdl), m.epoch).select(col(idCol))
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
    IndexCatalog.appendTo(fps, fpsName(fpsDir(path, m)), fpsDir(path, m),
      Seq(idCol), m.numBuckets, opt(m.fpsDdl), m.epoch)
    val bandRows = MinHashLsh.bandIndex(fps, idCol, m.bands, m.rowsPerBand)
    IndexCatalog.appendTo(bandRows, bandsName(bandsDir(path, m)),
      bandsDir(path, m), Seq("band"), m.numBuckets, opt(m.bandsDdl), m.epoch)
    bandRows.groupBy(col("band")).agg(count(lit(1)).as("n"))
      .write.mode("append").parquet(s"$path/band_sizes")
  }

  /** Bucket-preserving maintenance compaction of a bucketed index: both
    * big tables rewrite to ~1 file per bucket per `targetFileBytes`
    * ([[IndexCatalog.compactBucketed]] — the bucket layout, and with it
    * the no-corpus-Exchange join property, survives the rewrite), and the
    * append-only `band_sizes` delta table folds to one snapshot
    * ([[IndexCatalog.foldSizeDeltas]] — the cap fold sums deltas, so the
    * fold is semantics-free). Each table swaps independently under the
    * crash-safe two-rename; a crash mid-run leaves at most one table
    * uncompacted, never a mixed layout (compaction changes neither the
    * bucket count nor the schema). Run on a maintenance cadence (or via
    * the sink's `compactEveryNBatches` knob) — per-bucket file counts
    * otherwise grow without bound under streaming appends. */
  def compact(spark: SparkSession, path: String,
              targetFileBytes: Long = 128L * 1024 * 1024)
      : Map[String, IndexCatalog.TableCompaction] = {
    val m = manifest(spark, path)
    require(m.bucketed,
      s"index at $path uses the legacy rename-published layout; compact " +
        "it with lakehouse.Compaction.compact per batch directory")
    val idCol = storedIdCol(spark, path, m)
    // the epoch bump is what tells OTHER long-lived sessions (via the
    // shared catalog metadata) that the files under this layout were
    // rewritten and their cached listings must refresh
    val pub = m.epoch + 1
    val stats = Map(
      "fingerprints" -> IndexCatalog.compactBucketed(spark,
        fpsName(fpsDir(path, m)), fpsDir(path, m), Seq(idCol), m.numBuckets,
        targetFileBytes, opt(m.fpsDdl), m.epoch, pub),
      "bands" -> IndexCatalog.compactBucketed(spark,
        bandsName(bandsDir(path, m)), bandsDir(path, m), Seq("band"),
        m.numBuckets, targetFileBytes, opt(m.bandsDdl), m.epoch, pub),
      "band_sizes" -> IndexCatalog.foldSizeDeltas(spark, s"$path/band_sizes",
        Seq("band"), targetFileBytes))
    writeManifest(spark, path, m.copy(epoch = pub, idCol = idCol))
    stats
  }

  /** Re-bucket an index whose corpus outgrew its build-time `numBuckets`
    * (each bucket's band rows must fit an executor; a 100 TB corpus wants
    * O(thousands)). Rewrites both tables from the STORED rows — O(index),
    * never a re-shingle of the corpus — into fresh `_v<N>` directories,
    * then publishes the switch through ONE atomic manifest replace: a
    * crash before the publish leaves the old layout fully live (orphan
    * `_v<N>` dirs are overwritten by the retry); after it, the new layout
    * is fully live and the old dirs are deleted best-effort. Appends and
    * dedupBatch pick up the new bucket count from the manifest; stale
    * same-session registrations of the OLD layout are dropped. */
  def rebucket(spark: SparkSession, path: String, newBuckets: Int): Unit = {
    val m = manifest(spark, path)
    require(m.bucketed,
      s"index at $path uses the legacy rename-published layout; re-build it")
    require(newBuckets > 0, s"newBuckets must be positive, got $newBuckets")
    val idCol = storedIdCol(spark, path, m)
    val next = m.copy(numBuckets = newBuckets, version = m.version + 1,
      idCol = idCol, epoch = 0)
    val (fps, bands) = load(spark, path)
    IndexCatalog.writeFresh(fps, fpsName(fpsDir(path, next)),
      fpsDir(path, next), Seq(idCol), newBuckets)
    IndexCatalog.writeFresh(bands, bandsName(bandsDir(path, next)),
      bandsDir(path, next), Seq("band"), newBuckets)
    writeManifest(spark, path, next.copy(
      fpsDdl = spark.table(fpsName(fpsDir(path, next))).schema.toDDL,
      bandsDdl = spark.table(bandsName(bandsDir(path, next))).schema.toDDL))
    // the switch is published: retire the old layout (metadata first, so
    // no stale registration outlives its files)
    spark.sql(s"DROP TABLE IF EXISTS `${fpsName(fpsDir(path, m))}`")
    spark.sql(s"DROP TABLE IF EXISTS `${bandsName(bandsDir(path, m))}`")
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(fpsDir(path, m)), true)
    fs.delete(new org.apache.hadoop.fs.Path(bandsDir(path, m)), true)
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
