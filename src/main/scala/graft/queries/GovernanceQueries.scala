package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, Metadata, StringType, StructField, StructType}

import graft.dq.PiiMask
import graft.lakehouse.Retention
import graft.tables.Tables

/** Governance operators as driver-gated queries: the reference DECLARES
  * `pii` and `retention_days` in its schema registry
  * (`/root/reference/schemas/README.md:127,132`) but never consumes either;
  * here both run as data operations with DuckDB oracles.
  */
object GovernanceQueries {

  private def pii(desc: String) = Metadata.fromJson(
    s"""{"description": "$desc", "pii": true}""")

  /** Registry-style schema for the documents table with `text` and
    * `source` flagged pii — the metadata [[PiiMask]] consumes. */
  private val docsPiiSchema = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("text", StringType, nullable = true, pii("document body")),
    StructField("source", StringType, nullable = true, pii("origin url-ish")),
    StructField("lang", StringType, nullable = true)))

  /** Metadata-driven PII hash-masking: flagged string columns become
    * sha2-256 digests (deterministic — joins/dedup still work on the
    * masked value), unflagged columns pass through. Per-row narrow,
    * codegen'd; zero shuffles before the output sort. */
  def q65_pii_mask(spark: SparkSession, dir: String): DataFrame =
    PiiMask.mask(
      Tables.documents(spark, dir).select(col("doc_id"), col("text"),
        col("source"), col("lang")),
      docsPiiSchema, PiiMask.Strategy.Hash)
      .orderBy(col("doc_id"))

  /** K-anonymity audit over quasi-identifiers: any (lang, source)
    * combination identifying fewer than k=5 documents is a re-identification
    * risk — the privacy counterpart to [[PiiMask]]'s direct-identifier
    * masking. Two-level combinable aggregate (group sizes, then the
    * per-lang minimum and violating-group count); at 100 TB both levels
    * shuffle O(groups), not O(rows). */
  def q73_k_anonymity(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .groupBy(col("lang"), col("source"))
      .agg(count(lit(1)).as("n"))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_groups"),
        min(col("n")).cast("long").as("min_group_size"),
        sum(when(col("n") < 5, 1L).otherwise(0L)).cast("long").as("n_below_k"),
        (min(col("n")) >= 5).as("k_anonymous"))
      .orderBy(col("lang"))

  /** `retention_days` enforcement as a query: the read-side filter at a
    * pinned as-of date (reproducible), aggregated per event type. The
    * cutoff is a literal comparison, so on a time-partitioned table it
    * prunes partitions — expired data is never read. */
  def q66_retention(spark: SparkSession, dir: String): DataFrame =
    Retention.currentRows(Tables.events(spark, dir), "ts", days = 14,
        asOf = java.time.LocalDate.of(2024, 2, 1))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_kept"),
        unix_micros(min(col("ts"))).as("min_kept_ts_us"))
      .orderBy(col("event_type"))

  /** Local differential privacy via per-bit randomized response (the
    * RAPPOR primitive, Erlingsson et al. CCS'14): each document reports
    * a ONE-HOT language vector whose every bit flips with probability
    * 1/4 — ε = ln(3) per bit — and the collector debiases the observed
    * counts back to frequency estimates without ever trusting an
    * individual row. The flip coins are [[graft.functions.StableHash]]
    * buckets of (doc_id, bit), so the whole mechanism is a pure function
    * of the data (engine-portable, rerun-stable) and the oracle replays
    * it coin for coin; the debias `t̂ = (4·obs − n)/2` is exact integer
    * arithmetic with one final /2.0. Reported per language: true count,
    * observed ones, debiased estimate, absolute error — the
    * privacy/utility trade the pipeline audits before shipping LDP
    * telemetry.
    *
    * Scale shape: the bit table is corpus × #langs with the language
    * list a plan-bounded broadcast (distinct → ordered limit 32 — the
    * audit's language budget), folded by ONE combinable aggregate; no
    * window, no per-doc state. */
  def q392_randomized_response(spark: SparkSession,
                               dir: String): DataFrame = {
    import graft.functions.StableHash
    val docs = Tables.documents(spark, dir)
      .select(col("doc_id"), col("lang"))
    val langs = docs.select(col("lang").as("k")).distinct()
      .orderBy(col("k")).limit(32) // plan-provably-bounded build side
    docs.crossJoin(broadcast(langs))
      .select(col("k"),
        (col("lang") === col("k")).cast("long").as("t"),
        (StableHash.bucket(
          concat_ws("#", col("doc_id"), lit("rr"), col("k")), 1000) < 250)
          .cast("long").as("flip"))
      .select(col("k"), col("t"),
        ((col("t") + col("flip")) % 2).as("rep"))
      .groupBy(col("k"))
      .agg(count(lit(1)).cast("long").as("n_bits"),
        sum(col("rep")).cast("long").as("reported_ones"),
        sum(col("t")).cast("long").as("true_count"))
      .select(col("k").as("lang"), col("true_count"),
        col("reported_ones"),
        ((lit(4L) * col("reported_ones") - col("n_bits")).cast("double")
          / lit(2.0d)).as("est_count"))
      .withColumn("abs_err",
        abs(col("est_count") - col("true_count").cast("double")))
      .orderBy(col("lang"))
  }
}
