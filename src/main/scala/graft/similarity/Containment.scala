package graft.similarity

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.text.TextOps
import graft.functions.{RollingHash, Winnow}

/** Containment near-duplicate detection: candidate pairs from shared
  * winnowing fingerprints, verified on `|A∩B| / min(|A|,|B|)` — the
  * asymmetric overlap that catches a document QUOTED OR EMBEDDED inside a
  * larger one (Jaccard punishes the size gap: a perfect subset at 10% of
  * the host's length scores J≈0.1 but containment 1.0). Used for
  * quote/template-host detection and page-in-site dedup in CC-style
  * pipelines.
  *
  * Why candidates do NOT come from the q27 minhash banding: LSH band
  * collision probability is an S-curve in JACCARD, so jaccard-tuned bands
  * almost never surface exactly the subset pairs containment exists for.
  * Winnowing fingerprints ([[graft.functions.Winnow]], the MOSS scheme)
  * are position-local: every fingerprint selected inside the contained
  * span is also selected in the host, so a subset pair shares ~all of the
  * smaller side's fingerprints regardless of the size gap.
  *
  * Scale shape (100 TB): fingerprints shuffle as (hash, id); the
  * frequency cap drops boilerplate fingerprints BEFORE the self-join
  * (a fingerprint in s docs is s²/2 candidate pairs — the only quadratic
  * risk, same guard as q74); the shared-count aggregate is combinable;
  * shingle sets ship only for surviving candidates. All ratios are exact
  * integer divisions — engine-portable with no rounding discipline.
  */
object Containment {

  def containmentPairs(df: DataFrame, idCol: String, textCol: String,
                       shingleN: Int = 3, gramLen: Int = 8,
                       winnowWindow: Int = 4, fpFreqCap: Int = 50,
                       minShared: Int = 10, threshold: Double = 0.7): DataFrame = {
    val fps = df.select(col(idCol),
      explode(Winnow.winnow(
        RollingHash.rollingHashGrams(col(textCol), gramLen), winnowWindow)).as("fp"))
    val kept = fps.join(
      fps.groupBy(col("fp")).agg(count(lit(1)).as("__c"))
        .filter(col("__c") <= fpFreqCap).select(col("fp")),
      "fp")
    val cands = kept.select(col("fp"), col(idCol).as("id_a"))
      .join(kept.select(col("fp"), col(idCol).as("id_b")), "fp")
      .filter(col("id_a") < col("id_b"))
      .groupBy(col("id_a"), col("id_b"))
      .agg(count(lit(1)).cast("long").as("n_shared"))
      .filter(col("n_shared") >= minShared)
    val sets = df.select(col(idCol),
      TextOps.shingles(col(textCol), shingleN).as("shingle_set"))
    val sa = sets.select(col(idCol).as("id_a"), col("shingle_set").as("set_a"))
    val sb = sets.select(col(idCol).as("id_b"), col("shingle_set").as("set_b"))
    cands.join(sa, "id_a").join(sb, "id_b")
      .withColumn("n_common",
        size(array_intersect(col("set_a"), col("set_b"))).cast("long"))
      .withColumn("n_a", size(col("set_a")).cast("long"))
      .withColumn("n_b", size(col("set_b")).cast("long"))
      .withColumn("containment", col("n_common").cast("double") /
        least(col("n_a"), col("n_b")).cast("double"))
      .withColumn("jaccard", col("n_common").cast("double") /
        (col("n_a") + col("n_b") - col("n_common")).cast("double"))
      .filter(col("containment") >= threshold)
      .select(col("id_a"), col("id_b"), col("n_shared"), col("n_a"), col("n_b"),
        col("containment"), col("jaccard"))
  }
}
