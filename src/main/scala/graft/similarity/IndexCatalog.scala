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
               bucketCols: Seq[String], numBuckets: Int): Unit = {
    ensureRegistered(df.sparkSession, name, location, bucketCols, numBuckets)
    df.write.format("parquet")
      .bucketBy(numBuckets, bucketCols.head, bucketCols.tail: _*)
      .sortBy(bucketCols.head, bucketCols.tail: _*)
      .mode("append")
      .saveAsTable(name)
  }

  /** Make sure the session catalog has the table definition — a NEW
    * session re-creates it over the existing bucketed files (schema read
    * from the parquet footers; bucket ids from the file names). */
  def ensureRegistered(spark: SparkSession, name: String, location: String,
                       bucketCols: Seq[String], numBuckets: Int): Unit =
    if (!spark.catalog.tableExists(name)) {
      val schemaDdl = spark.read.parquet(location).schema.toDDL
      val cols = bucketCols.map(c => s"`$c`").mkString(", ")
      spark.sql(
        s"""CREATE TABLE `$name` ($schemaDdl) USING PARQUET
           |CLUSTERED BY ($cols) SORTED BY ($cols) INTO $numBuckets BUCKETS
           |LOCATION '$location'""".stripMargin)
    }

  /** The bucketed table as a DataFrame (registering on first touch in
    * this session). Reads via `spark.table` — a plain path read would
    * lose the bucketing metadata and with it the shuffle-free join. */
  def table(spark: SparkSession, name: String, location: String,
            bucketCols: Seq[String], numBuckets: Int): DataFrame = {
    ensureRegistered(spark, name, location, bucketCols, numBuckets)
    spark.table(name)
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
