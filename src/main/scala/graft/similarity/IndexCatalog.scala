package graft.similarity

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Catalog plumbing shared by [[DedupIndex]] and [[MediaDedupIndex]]'s
  * BUCKETED layouts: persistent index tables are written with
  * `bucketBy(numBuckets, joinKeys...)` as EXTERNAL tables (data stays
  * under the index root; only metadata lives in the session catalog), so
  * every per-batch join against the corpus side — band-key candidate
  * join, fingerprint verify join, indexed-id anti-join — co-locates on
  * the bucket layout WITHOUT a corpus-side shuffle: Spark's
  * EnsureRequirements sees `HashPartitioning(keys, numBuckets)` on the
  * bucketed scan and exchanges only the batch side to match. This is
  * what makes the incremental dedup path genuinely O(batch) per
  * micro-batch at 100 TB: before bucketing, the full corpus band index
  * was repartitioned on every batch (r9 verdict finding #1).
  *
  * Session-catalog notes: table metadata is session-scoped (in-memory
  * catalog), so [[ensureRegistered]] re-creates the table definition over
  * the existing bucketed files on first touch in a new session — bucket
  * ids are carried in the file names Spark's bucketed writer produced, so
  * a re-registered table reads them back with the same layout guarantee.
  */
private[similarity] object IndexCatalog {

  /** Deterministic per-path table name: same index root → same table in
    * any session; distinct roots can never collide. */
  def tableName(prefix: String, path: String): String = {
    val digest = java.security.MessageDigest.getInstance("MD5")
      .digest(new org.apache.hadoop.fs.Path(path).toString.getBytes("UTF-8"))
    prefix + "_" + digest.map("%02x".format(_)).mkString.take(12)
  }

  /** Drop any stale definition and write `df` as a fresh bucketed
    * external table at `location` (deleting leftover files first, so a
    * rebuild over a previous index is exact). */
  def writeFresh(df: DataFrame, name: String, location: String,
                 bucketCols: Seq[String], numBuckets: Int): Unit = {
    val spark = df.sparkSession
    spark.sql(s"DROP TABLE IF EXISTS `$name`")
    val loc = new org.apache.hadoop.fs.Path(location)
    loc.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(loc, true)
    df.write.format("parquet")
      .bucketBy(numBuckets, bucketCols.head, bucketCols.tail: _*)
      .sortBy(bucketCols.head, bucketCols.tail: _*)
      .option("path", location)
      .saveAsTable(name)
  }

  /** Append `df` to the bucketed table (re-registering it in this
    * session's catalog first if needed); the bucketed writer validates
    * that the bucket spec matches the table's. */
  def appendTo(df: DataFrame, name: String, location: String,
               bucketCols: Seq[String], numBuckets: Int,
               schemaDdl: Option[String] = None, epoch: Int = 0): Unit = {
    ensureRegistered(df.sparkSession, name, location, bucketCols, numBuckets,
      schemaDdl, epoch)
    df.write.format("parquet")
      .bucketBy(numBuckets, bucketCols.head, bucketCols.tail: _*)
      .sortBy(bucketCols.head, bucketCols.tail: _*)
      .mode("append")
      .saveAsTable(name)
  }

  /** Table property carrying the layout EPOCH — bumped by every
    * compaction (which DELETES the pre-swap files, so any session holding
    * a pre-compaction file listing would hard-fail mid-scan). Appends
    * never bump it: an appended-to table only ever GAINS files, so a
    * stale listing reads a consistent older snapshot, never a missing
    * file. */
  private val EpochProp = "graft.layout.epoch"

  /** True iff the session's registration for `name` no longer matches the
    * EXPECTED spec — another JVM can rebuild/rebucket/compact the index
    * at the same path, and a long-lived session that merely trusted
    * `tableExists` would keep the stale `HashPartitioning` (or a deleted
    * file listing) over the new files: bucketed joins would then assume
    * the wrong layout and silently miss duplicate pairs. Metadata-only
    * (one in-memory catalog lookup), checked on every touch. */
  private def staleRegistration(spark: SparkSession, name: String,
                                location: String, bucketCols: Seq[String],
                                numBuckets: Int, epoch: Int): Boolean = {
    if (!spark.catalog.tableExists(name)) return false
    val t = spark.sessionState.catalog.getTableMetadata(
      org.apache.spark.sql.catalyst.TableIdentifier(name))
    val want = new org.apache.hadoop.fs.Path(location).toUri.getPath
    val got = new org.apache.hadoop.fs.Path(t.location).toUri.getPath
    !t.bucketSpec.exists(b => b.numBuckets == numBuckets &&
      b.bucketColumnNames == bucketCols) || got != want ||
      t.properties.getOrElse(EpochProp, "0") != epoch.toString
  }

  /** The last layout epoch at which each SESSION refreshed each table's
    * relation cache. The session catalog caches a resolved relation (with
    * its file listing) per table name; DDL in ANOTHER session updates the
    * shared external catalog but not this session's relation cache, so a
    * post-compaction epoch change must trigger a local `refreshTable` or
    * this session keeps scanning deleted files. Weak keys: sessions drop
    * out when they are collected. */
  private val seenEpochs =
    new java.util.WeakHashMap[SparkSession,
      scala.collection.mutable.Map[String, Int]]
  private def epochMoved(spark: SparkSession, name: String,
                         epoch: Int): Boolean = seenEpochs.synchronized {
    var m = seenEpochs.get(spark)
    if (m == null) { m = scala.collection.mutable.Map.empty; seenEpochs.put(spark, m) }
    val prev = m.put(name, epoch)
    // None counts as moved: the session may hold a relation cached by a
    // code path that never recorded an epoch (build's saveAsTable, a
    // direct spark.table) — refreshTable on first observation is cheap
    // (cache invalidation only; re-listing is lazy) and restores
    // coherence no matter who rewrote the files in between
    prev.forall(_ != epoch)
  }

  /** Make sure the session catalog has the (current) table definition —
    * a NEW session re-creates it over the existing bucketed files; a
    * STALE definition (different bucket count / columns / location /
    * layout epoch than the manifest expects) is dropped and re-created
    * rather than trusted; and a same-definition table whose layout epoch
    * MOVED since this session last looked gets a `refreshTable` (the
    * compaction ran in another session — the metadata is shared, the
    * relation cache is not). `schemaDdl` is the manifest-persisted column
    * DDL: with it, registration is O(1) metadata; without it (legacy
    * manifests) the schema is read from the parquet footers — a full file
    * listing of the index, which at O(thousands) of buckets × many
    * appends is a real stall (bucket ids come from file names either
    * way). */
  def ensureRegistered(spark: SparkSession, name: String, location: String,
                       bucketCols: Seq[String], numBuckets: Int,
                       schemaDdl: Option[String] = None,
                       epoch: Int = 0): Unit = {
    if (staleRegistration(spark, name, location, bucketCols, numBuckets, epoch))
      spark.sql(s"DROP TABLE IF EXISTS `$name`")
    if (!spark.catalog.tableExists(name)) {
      val ddl = schemaDdl.filter(_.nonEmpty)
        .getOrElse(spark.read.parquet(location).schema.toDDL)
      val cols = bucketCols.map(c => s"`$c`").mkString(", ")
      spark.sql(
        s"""CREATE TABLE `$name` ($ddl) USING PARQUET
           |CLUSTERED BY ($cols) SORTED BY ($cols) INTO $numBuckets BUCKETS
           |LOCATION '$location'
           |TBLPROPERTIES ('$EpochProp' = '$epoch')""".stripMargin)
      epochMoved(spark, name, epoch) // record; registration is fresh
    } else if (epochMoved(spark, name, epoch)) {
      spark.catalog.refreshTable(name)
    }
  }

  /** The bucketed table as a DataFrame (registering on first touch in
    * this session). Reads via `spark.table` — a plain path read would
    * lose the bucketing metadata and with it the shuffle-free join. */
  def table(spark: SparkSession, name: String, location: String,
            bucketCols: Seq[String], numBuckets: Int,
            schemaDdl: Option[String] = None, epoch: Int = 0): DataFrame = {
    ensureRegistered(spark, name, location, bucketCols, numBuckets,
      schemaDdl, epoch)
    spark.table(name)
  }

  final case class TableCompaction(filesBefore: Int, filesAfter: Int,
                                   bytes: Long)

  /** BUCKET-PRESERVING small-file compaction — the operational other half
    * of the bucketed-index design: every [[appendTo]] adds ≥1 file per
    * bucket per batch, so at streaming cadence per-bucket file counts
    * grow without bound and every scan pays the open/footer cost.
    * [[graft.lakehouse.Compaction.compact]] can't be used here: its plain
    * `repartition(n)` rewrite would discard the bucket layout and with it
    * the shuffle-free joins.
    *
    * Strategy: read THROUGH the registered table with the bucketed scan
    * FORCED (`autoBucketedScan` off — the planner would otherwise first
    * eliminate the aligning repartition against the scan's
    * HashPartitioning and THEN disable the bucketed scan, leaving raw
    * file-splits that scatter every bucket across tasks again), so each
    * task reads exactly one bucket's files and the bucketed writer emits
    * ONE file per bucket — a ZERO-SHUFFLE rewrite (the
    * `repartition(numBuckets, bucketCols)` collapses into the scan's own
    * partitioning). The new layout lands in a sibling temp dir and swaps
    * via the crash-safe two-rename
    * ([[graft.lakehouse.Compaction.swapRewrite]] discipline: the pre-swap
    * layout survives any crash); the original name re-registers over the
    * swapped files. When a bucket outgrows `targetFileBytes`, a
    * content-hash salt widens the layout to ~k files per bucket (that
    * path does shuffle — still O(index), run on a maintenance cadence,
    * never per batch). */
  def compactBucketed(spark: SparkSession, name: String, location: String,
                      bucketCols: Seq[String], numBuckets: Int,
                      targetFileBytes: Long = 128L * 1024 * 1024,
                      schemaDdl: Option[String] = None, epoch: Int = 0,
                      publishEpoch: Int = 0): TableCompaction = {
    import graft.lakehouse.Compaction
    ensureRegistered(spark, name, location, bucketCols, numBuckets,
      schemaDdl, epoch)
    val before = Compaction.parquetFileCount(spark, location)
    val (bytes, _) = Compaction.plannedFiles(spark, location, targetFileBytes)
    val src = spark.table(name)
    val ddl = src.schema.toDDL
    val perBucket = math.max(1L, math.ceil(
      bytes.toDouble / (targetFileBytes.toDouble * numBuckets)).toLong).toInt
    val keys = bucketCols.map(col)
    val laid =
      if (perBucket == 1) src.repartition(numBuckets, keys: _*)
      else src.repartition(numBuckets * perBucket,
        keys :+ pmod(hash(src.columns.map(col): _*), lit(perBucket)): _*)
    val tmpName = name + "_ctmp"
    Compaction.swapRewrite(spark, location) { tmp =>
      spark.sql(s"DROP TABLE IF EXISTS `$tmpName`")
      // a CRASHED earlier attempt leaves a stale tmp dir; saveAsTable over
      // an existing external location would adopt its files into the new
      // table (silent row duplication) — clear it first
      val tp = new org.apache.hadoop.fs.Path(tmp)
      tp.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(tp, true)
      // pinned for this one write: AQE re-coalescing and the
      // DisableUnnecessaryBucketedScan rule each undo the task↔bucket
      // alignment (measured: 6 files/bucket survive the rewrite with the
      // defaults, exactly 1 with both pinned)
      val aqe = spark.conf.get("spark.sql.adaptive.enabled")
      val abs = spark.conf.get(
        "spark.sql.sources.bucketing.autoBucketedScan.enabled")
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      spark.conf.set(
        "spark.sql.sources.bucketing.autoBucketedScan.enabled", "false")
      try
        laid.write.format("parquet")
          .bucketBy(numBuckets, bucketCols.head, bucketCols.tail: _*)
          .sortBy(bucketCols.head, bucketCols.tail: _*)
          .option("path", tmp)
          .saveAsTable(tmpName)
      finally {
        spark.conf.set("spark.sql.adaptive.enabled", aqe)
        spark.conf.set(
          "spark.sql.sources.bucketing.autoBucketedScan.enabled", abs)
      }
      // the write is done; drop the temp METADATA before the dir moves
      // out from under it (external table — files stay)
      spark.sql(s"DROP TABLE `$tmpName`")
      // ...and the live name, so no cached relation survives the swap
      spark.sql(s"DROP TABLE IF EXISTS `$name`")
    }
    // re-register at the PUBLISH epoch: other sessions see the epoch move
    // in the shared metadata and refresh their own relation caches before
    // touching the rewritten files
    ensureRegistered(spark, name, location, bucketCols, numBuckets,
      Some(ddl), publishEpoch)
    TableCompaction(before, Compaction.parquetFileCount(spark, location),
      bytes)
  }

  /** Fold an append-only per-batch size-delta table ((keys..., n) rows,
    * one delta row per bucket per append — the [[CapFold]] corpus half)
    * into a single snapshot: same semantics (the cap fold SUMS deltas, so
    * a one-row-per-key snapshot is just the degenerate delta set), but
    * the monotonic one-tiny-file-per-batch growth resets. Same crash-safe
    * swap as [[compactBucketed]]. */
  def foldSizeDeltas(spark: SparkSession, dir: String, keyCols: Seq[String],
                     targetFileBytes: Long = 128L * 1024 * 1024)
      : TableCompaction = {
    import graft.lakehouse.Compaction
    val before = Compaction.parquetFileCount(spark, dir)
    val (bytes, nFiles) = Compaction.plannedFiles(spark, dir, targetFileBytes)
    Compaction.swapRewrite(spark, dir) { tmp =>
      spark.read.parquet(dir)
        .groupBy(keyCols.map(col): _*).agg(sum(col("n")).as("n"))
        .repartition(nFiles)
        .write.mode("overwrite").parquet(tmp)
    }
    TableCompaction(before, Compaction.parquetFileCount(spark, dir), bytes)
  }

  /** JSON string-field escape/unescape for manifest-persisted schema DDL
    * (the regex-parsed manifests stay dependency-free). */
  def jsonEscape(s: String): String = s.flatMap {
    case '"'  => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case c    => c.toString
  }
  def jsonUnescape(s: String): String = {
    val b = new StringBuilder
    var i = 0
    while (i < s.length) {
      if (s(i) == '\\' && i + 1 < s.length) {
        b.append(s(i + 1) match {
          case 'n' => '\n'
          case c   => c
        })
        i += 2
      } else { b.append(s(i)); i += 1 }
    }
    b.toString
  }

  /** Extract a JSON string field from regex-parsed manifest text. */
  def stringField(text: String, name: String): Option[String] =
    ("\"" + name + "\"\\s*:\\s*\"((?:[^\"\\\\]|\\\\.)*)\"").r
      .findFirstMatchIn(text).map(m => jsonUnescape(m.group(1)))

  /** Versioned table directory: version 0 is the original `<path>/<base>`
    * layout; a rebucket bumps the version and lands at
    * `<path>/<base>_v<N>` so the switch publishes through ONE atomic
    * manifest replace (see [[DedupIndex.rebucket]]). */
  def tableDir(path: String, base: String, version: Int): String =
    if (version == 0) s"$path/$base" else s"$path/${base}_v$version"

  /** Replace the index manifest at `p`: write a sibling temp file, then
    * delete + rename into place. The delete→rename window fails LOUD (a
    * reader sees "no manifest", never a manifest/layout mismatch) — that
    * is the property the rebucket publish needs, since a manifest that
    * said the OLD bucket count over NEW files would silently misregister
    * the bucket spec. */
  def replaceManifest(spark: SparkSession, p: org.apache.hadoop.fs.Path,
                      json: String): Unit = {
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val tmp = new org.apache.hadoop.fs.Path(p.getParent, p.getName + ".tmp")
    val out = fs.create(tmp, true)
    try out.write(json.getBytes("UTF-8")) finally out.close()
    fs.delete(p, false)
    if (!fs.rename(tmp, p)) throw new IllegalStateException(
      s"manifest publish failed: $tmp -> $p")
  }
}

/** The cap fold for dedup-against-index: which of the BATCH's band
  * buckets survive the degenerate-bucket cap, computed WITHOUT touching
  * the corpus band table.
  *
  * Pair-equivalence argument (this is why the restated cap matches the
  * oracle's combined-cap semantics exactly): a candidate pair needs one
  * row from EACH side of a bucket, so dropping a too-big bucket's pairs
  * only requires dropping ONE side's rows in it. Filtering the batch
  * side by "combined size ≤ cap" removes precisely the pairs the old
  * union-both-sides-then-cap spelling removed — corpus rows of a dropped
  * bucket simply find no batch partner — while the corpus index is never
  * unioned, re-counted, or reshuffled.
  *
  * The corpus half of the combined size comes from `corpusSizes`, a
  * (keys..., n) frame: the persistent indexes append one delta row per
  * bucket per batch (summed here), one-shot callers pass the equivalent
  * `groupBy(keys).count`. The fold broadcasts the batch's distinct keys
  * into the sizes scan, so the only rows that ever shuffle are the
  * matched size deltas — O(batch-distinct-bands × appends), never
  * O(corpus). */
private[similarity] object CapFold {

  /** Buckets of `batchBands` (keyed by `keyCols`) whose corpus+batch row
    * count is ≤ `cap` — a small frame of the key columns, for a broadcast
    * semi-join back onto the batch side. */
  def okBuckets(batchBands: DataFrame, keyCols: Seq[String], cap: Int,
                corpusSizes: DataFrame): DataFrame = {
    val keys = keyCols.map(col)
    val batchCounts = batchBands.groupBy(keys: _*)
      .agg(count(lit(1)).as("__bn"))
    val corpusN = corpusSizes
      .join(broadcast(batchCounts.select(keys: _*)), keyCols)
      .groupBy(keys: _*).agg(sum(col("n")).as("__cn"))
    batchCounts.join(broadcast(corpusN), keyCols, "left")
      .filter(col("__bn") + coalesce(col("__cn"), lit(0L)) <= cap)
      .select(keys: _*)
  }

  /** `batchBands` restricted to surviving buckets. */
  def applyCap(batchBands: DataFrame, keyCols: Seq[String],
               maxBucket: Option[Int], corpusSizes: DataFrame): DataFrame =
    maxBucket match {
      case Some(cap) =>
        batchBands.join(broadcast(okBuckets(batchBands, keyCols, cap,
          corpusSizes)), keyCols, "left_semi")
      case None => batchBands
    }
}
