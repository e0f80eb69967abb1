package graft.similarity

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.text.TextOps

/** MinHash + LSH near-duplicate detection over word-shingle sets.
  *
  * Permutation hashes are salted md5 (engine-portable, so the whole pipeline
  * is oracle-verifiable); `min(md5(salt|shingle))` is a valid minwise hash
  * per salt. Banding: each signature slot is its own band (b bands of r=1),
  * so a pair collides if ANY slot matches — P(candidate) = 1-(1-j)^b, which
  * at j>=0.9, b=6 misses ~1e-6 of true pairs.
  *
  * Scale design (100 TB): the candidate join is a shuffle on band value —
  * cardinality O(docs x bands), each bucket small for realistic vocabularies.
  * The verify step re-joins shingle sets only for candidate pairs (tiny
  * relative to the corpus). Skewed buckets (boilerplate shingles) can be
  * capped by filtering bucket size upstream; `ml.feature.MinHashLSH` offers
  * the same via approxSimilarityJoin but isn't hash-portable for our oracle.
  */
object MinHashLsh {

  /** k salted-md5 minhash values over a distinct-shingle array column.
    * Native one-pass expression; semantically equal to
    * `array_min(transform(sg, g => md5(concat(lit("s<p>|"), g))))` per slot
    * (see [[graft.functions.MinHashSig]] for why HOFs were 25x slower). */
  def signature(shingleSet: Column, perms: Int): Column =
    graft.functions.MinHashSig.minhashSig(shingleSet, perms)

  /** doc_id, shingles, sig — shingle + signature stage. */
  def withSignatures(df: DataFrame, idCol: String, textCol: String,
                     shingleN: Int, perms: Int): DataFrame =
    df.select(col(idCol),
      TextOps.shingles(col(textCol), shingleN).as("shingle_set"))
      .withColumn("sig", signature(col("shingle_set"), perms))

  /** Candidate pairs (idA < idB) sharing at least one signature band. */
  def candidatePairs(sigs: DataFrame, idCol: String, perms: Int): DataFrame = {
    val bands = sigs.select(col(idCol), posexplode(col("sig")).as(Seq("band_idx", "band_val")))
      .select(col(idCol), concat_ws("|", col("band_idx"), col("band_val")).as("band"))
    val a = bands.as("a")
    val b = bands.as("b")
    a.join(b, col("a.band") === col("b.band") && col(s"a.$idCol") < col(s"b.$idCol"))
      .select(col(s"a.$idCol").as("id_a"), col(s"b.$idCol").as("id_b"))
      .distinct()
  }

  /** Full pipeline: near-dup pairs with exact shingle-Jaccard >= threshold. */
  def nearDuplicatePairs(df: DataFrame, idCol: String, textCol: String,
                         shingleN: Int = 3, perms: Int = 6,
                         threshold: Double = 0.5): DataFrame = {
    val sigs = withSignatures(df, idCol, textCol, shingleN, perms)
    val cands = candidatePairs(sigs, idCol, perms)
    val sets = sigs.select(col(idCol), col("shingle_set"))
    val sa = sets.withColumnRenamed(idCol, "id_a").withColumnRenamed("shingle_set", "set_a")
    val sb = sets.withColumnRenamed(idCol, "id_b").withColumnRenamed("shingle_set", "set_b")
    cands.join(sa, "id_a").join(sb, "id_b")
      .withColumn("jaccard",
        graft.functions.JaccardSim.jaccardSim(col("set_a"), col("set_b")))
      .filter(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), col("jaccard"))
  }
}
