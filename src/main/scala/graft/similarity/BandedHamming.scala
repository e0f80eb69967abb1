package graft.similarity

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Banded Hamming-distance near-duplicate join over integer fingerprint
  * codes (dHash, SimHash, acoustic fingerprints — any ≤64-bit code where
  * "near-duplicate" means small Hamming distance).
  *
  * ONE implementation of the banding discipline the perceptual-hash image
  * dedup (q382/q383), the acoustic-fingerprint audio dedup (q385) and any
  * future code-valued modality share — previously each query re-spelled
  * explode-bands → degenerate-bucket cap → self-join → `bit_count(xor)`
  * inline, and the cap semantics had to stay mirrored across every copy
  * (r8 verdict task 3: drift in one spelling is the bug class the oracle
  * catches late and painfully).
  *
  * The pigeonhole guarantee: splitting a code into `nBands` contiguous
  * bands means any pair within Hamming distance `< nBands` shares at
  * least one unchanged band — so for `maxHamming ≤ nBands - 1` the band
  * equi-join has PERFECT recall (q382: 4 bands, ≤6 Hamming keeps ≥98% of
  * planted pairs because perturbations concentrate; q385: 2×16 over a
  * 32-bit code, ≤4 needs 3+ bits to split across both bands to miss).
  *
  * Scale shape (100 TB): candidates come ONLY from an equi-join on
  * (band, bandKey) — never all-pairs; `maxBucket` drops degenerate
  * buckets (a solid-color/silent corpus hashing thousands of items to one
  * band key contributes s²/2 candidate pairs) via a combinable
  * `groupBy.count` joined back, never a window over the band (a window
  * would buffer the whole degenerate bucket in ONE task before the cap
  * could drop it — same reasoning as [[MinHashLsh.candidatePairs]]);
  * Hamming verification touches band candidates only.
  */
object BandedHamming {

  /** Exploded (id, code, [carry...,] band, bkey) band-key rows: band `b`
    * is bits `[b·bandBits, (b+1)·bandBits)` of the code, extracted
    * unsigned so bit 63 can't sign-smear into the key. `carryCols` ride
    * along unchanged (the frame index in [[frameSequencePairs]]). */
  def bandKeys(df: DataFrame, idCol: String, codeCol: String,
               nBands: Int, bandBits: Int,
               carryCols: Seq[String] = Nil): DataFrame = {
    val mask = (1L << bandBits) - 1
    val keep = Seq(col(idCol).as("id"), col(codeCol).as("code")) ++
      carryCols.map(col)
    df.select(keep :+
        explode(array((0 until nBands).map(b =>
          struct(lit(b).as("band"),
            shiftrightunsigned(col(codeCol), bandBits * b)
              .bitwiseAND(lit(mask)).as("bkey"))): _*)).as("bk"): _*)
      .select(Seq(col("id"), col("code")) ++ carryCols.map(col) ++
        Seq(col("bk.band").as("band"), col("bk.bkey").as("bkey")): _*)
  }

  /** Drop rows in `keyCols` buckets larger than `cap` — the skew guard
    * for degenerate corpora. Combinable count, joined back. */
  private def capBuckets(banded: DataFrame, keyCols: Seq[String],
                         maxBucket: Option[Int]): DataFrame =
    maxBucket match {
      case Some(cap) =>
        val keys = keyCols.map(col)
        val ok = banded.groupBy(keys: _*)
          .agg(count(lit(1)).as("__bsz"))
          .filter(col("__bsz") <= cap)
          .select(keys: _*)
        banded.join(ok, keyCols)
      case None => banded
    }

  /** Verified near-duplicate pairs `(id_a, id_b, hamming)` with
    * `id_a < id_b` and `hamming ≤ maxHamming`, candidates restricted to
    * pairs sharing at least one capped band key. */
  def nearDuplicatePairs(df: DataFrame, idCol: String, codeCol: String,
                         nBands: Int, bandBits: Int, maxHamming: Int,
                         maxBucket: Option[Int] = None): DataFrame = {
    val capped = capBuckets(bandKeys(df, idCol, codeCol, nBands, bandBits),
      Seq("band", "bkey"), maxBucket)
    val cand = capped.as("a")
      .join(capped.as("b"),
        col("a.band") === col("b.band") && col("a.bkey") === col("b.bkey") &&
          col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        col("a.code").as("__ca"), col("b.code").as("__cb"))
      .distinct()
    cand
      .withColumn("hamming",
        bit_count(col("__ca").bitwiseXOR(col("__cb"))).cast("long"))
      .filter(col("hamming") <= maxHamming)
      .select(col("id_a"), col("id_b"), col("hamming"))
  }

  /** Near-duplicates of `batch` codes against a prebuilt corpus band
    * index — the incremental/streaming shape (per-batch SHUFFLE cost
    * O(batch) when `corpusBands` is a table bucketed by (band, bkey),
    * the [[MediaDedupIndex]] layout — only the batch side is exchanged;
    * the media twin of [[MinHashLsh.nearDuplicatesAgainstIndex]]).
    * `corpusBands` is a persisted [[bandKeys]] frame
    * (id, code, band, bkey) built with the SAME nBands/bandBits; the
    * bucket cap applies to the COMBINED (index + batch) bucket size — a
    * degenerate band is quadratic regardless of which side fills it —
    * enforced on the batch side only (pair-equivalent, see [[CapFold]]),
    * with the corpus half of the size read from `corpusBandSizes`
    * ((band, bkey, n) delta rows the persistent index maintains) or
    * counted from `corpusBands` for one-shot callers. Returns
    * `(corpus_id, batch_id, hamming)` with `hamming ≤ maxHamming`. */
  def pairsAgainstIndex(corpusBands: DataFrame, batch: DataFrame,
                        idCol: String, codeCol: String,
                        nBands: Int, bandBits: Int, maxHamming: Int,
                        maxBucket: Option[Int] = None,
                        corpusBandSizes: Option[DataFrame] = None): DataFrame = {
    val batchBands = bandKeys(batch, idCol, codeCol, nBands, bandBits)
    val sizes = corpusBandSizes.getOrElse(
      corpusBands.groupBy(col("band"), col("bkey"))
        .agg(count(lit(1)).as("n")))
    val bi = CapFold.applyCap(batchBands, Seq("band", "bkey"), maxBucket, sizes)
      .select(col("id").as("batch_id"), col("code").as("__cb"),
        col("band"), col("bkey"))
    val ci = corpusBands.select(col("id").as("corpus_id"),
      col("code").as("__ca"), col("band"), col("bkey"))
    ci.join(bi, Seq("band", "bkey"))
      .select(col("corpus_id"), col("batch_id"), col("__ca"), col("__cb"))
      .distinct()
      .withColumn("hamming",
        bit_count(col("__ca").bitwiseXOR(col("__cb"))).cast("long"))
      .filter(col("hamming") <= maxHamming)
      .select(col("corpus_id"), col("batch_id"), col("hamming"))
  }

  /** Near-duplicate CLIP pairs over FRAME SEQUENCES — the temporal
    * (video-style) modality: `frames` holds one row per
    * (clip id, frame index, ≤64-bit per-frame code) and two clips are
    * near-duplicates when at least `minCloseNum/minCloseDen` of their
    * aligned frames (same frame index) are within `maxHamming` — the
    * "same clip, one frame retouched" shape. Integer threshold
    * arithmetic (`n_close·den ≥ n_total·num`, `n_total` = the LONGER
    * clip's frame count) keeps the decision engine-portable for the
    * oracle.
    *
    * Scale shape: candidates come ONLY from an equi-join on
    * (frame_idx, band, bkey) — a pair is considered iff SOME aligned
    * frame shares an unchanged band (the [[nearDuplicatePairs]]
    * pigeonhole, per frame) — with the same degenerate-bucket cap
    * (solid-color frames across a corpus land in one bucket; the cap
    * keys include the frame index so a title-card frame common at one
    * position caps independently per position). Per-frame Hamming
    * verification touches candidate pairs' aligned frames only, and
    * frame counts are a combinable groupBy — nothing is ever all-pairs
    * and clip payload bytes never enter (only hashes arrive here).
    * Returns `(id_a, id_b, n_close, n_total)` with `id_a < id_b`. */
  def frameSequencePairs(frames: DataFrame, idCol: String, frameCol: String,
                         codeCol: String, nBands: Int, bandBits: Int,
                         maxHamming: Int, minCloseNum: Int, minCloseDen: Int,
                         maxBucket: Option[Int] = None): DataFrame = {
    val norm = frames.select(col(idCol).as("id"),
      col(frameCol).as("fidx"), col(codeCol).as("code"))
    val banded = bandKeys(norm, "id", "code", nBands, bandBits,
      carryCols = Seq("fidx"))
    val capped = capBuckets(banded, Seq("fidx", "band", "bkey"), maxBucket)
    val cand = capped.as("a")
      .join(capped.as("b"),
        col("a.fidx") === col("b.fidx") && col("a.band") === col("b.band") &&
          col("a.bkey") === col("b.bkey") && col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .distinct()
    val fa = norm.select(col("id").as("id_a"), col("fidx"),
      col("code").as("__ca"))
    val fb = norm.select(col("id").as("id_b"), col("fidx"),
      col("code").as("__cb"))
    val perFrame = cand.join(fa, "id_a").join(fb, Seq("id_b", "fidx"))
      .withColumn("__ham",
        bit_count(col("__ca").bitwiseXOR(col("__cb"))).cast("long"))
    val nf = norm.groupBy(col("id")).agg(count(lit(1)).as("__nf"))
    perFrame.groupBy(col("id_a"), col("id_b"))
      .agg(sum(when(col("__ham") <= maxHamming, 1L).otherwise(0L))
        .as("n_close"))
      .join(nf.select(col("id").as("id_a"), col("__nf").as("__na")), "id_a")
      .join(nf.select(col("id").as("id_b"), col("__nf").as("__nb")), "id_b")
      .withColumn("n_total", greatest(col("__na"), col("__nb")))
      .filter(col("n_close") * minCloseDen >= col("n_total") * minCloseNum)
      .select(col("id_a"), col("id_b"), col("n_close"), col("n_total"))
  }

  /** SHIFT-TOLERANT frame-sequence near-duplicate pairs — the trimmed/
    * re-cut clip variant of [[frameSequencePairs]] (that operator aligns
    * frames by exact index, so a clip with one frame trimmed from the
    * head — the commonest real-world video near-dup after re-encoding —
    * misses every alignment). Two clips match when, at the BEST frame
    * alignment shift Δ with |Δ| ≤ `maxShift` (b's frame `f+Δ` compared
    * against a's frame `f`), at least `minCloseNum/minCloseDen` of the
    * expected aligned frames are within `maxHamming`. The expectation
    * denominator is `n_total = greatest(na, nb) − |Δ|` — the aligned
    * overlap length for equal-length clips and for head/tail trims — so
    * at `maxShift = 0` the decision rule reduces EXACTLY to
    * [[frameSequencePairs]]' (spec-pinned; the only residual difference
    * is the cap key, which here drops the frame index — see below).
    *
    * A (pair, Δ) qualifies only if its own threshold passes; among
    * qualifying shifts the reported one maximizes n_close (ties → the
    * smallest Δ) — an arg-max by combinable `max(struct)`, no window.
    *
    * Scale shape: candidates come from an equi-join on (band, bkey) —
    * the frame index deliberately NOT in the key (a shifted twin shares
    * the unchanged band at a DIFFERENT index), with the |Δ| ≤ S bound as
    * a join-residual filter and the degenerate-bucket cap now per
    * (band, bkey) (a solid-color frame anywhere in the corpus is one
    * bucket; the cap drops it before it can contribute s²/2 pairs).
    * Per-(pair, Δ) verification joins candidate pairs' frames at
    * `fidx_b = fidx_a + Δ` — equi-join on (id, fidx) — and every
    * aggregate is combinable; nothing is all-pairs and payload bytes
    * never enter. Returns `(id_a, id_b, shift, n_close, n_total)` with
    * `id_a < id_b`. */
  def frameSequencePairsShifted(frames: DataFrame, idCol: String,
                                frameCol: String, codeCol: String,
                                nBands: Int, bandBits: Int, maxHamming: Int,
                                minCloseNum: Int, minCloseDen: Int,
                                maxShift: Int,
                                maxBucket: Option[Int] = None): DataFrame = {
    val norm = frames.select(col(idCol).as("id"),
      col(frameCol).as("fidx"), col(codeCol).as("code"))
    val banded = bandKeys(norm, "id", "code", nBands, bandBits,
      carryCols = Seq("fidx"))
    val capped = capBuckets(banded, Seq("band", "bkey"), maxBucket)
    val cand = capped.as("a")
      .join(capped.as("b"),
        col("a.band") === col("b.band") && col("a.bkey") === col("b.bkey") &&
          col("a.id") < col("b.id") &&
          abs(col("b.fidx") - col("a.fidx")) <= maxShift)
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        (col("b.fidx") - col("a.fidx")).cast("long").as("shift"))
      .distinct()
    val fa = norm.select(col("id").as("id_a"), col("fidx").as("__fa"),
      col("code").as("__ca"))
    val fb = norm.select(col("id").as("id_b"), col("fidx").as("__fb"),
      col("code").as("__cb"))
    val aligned = cand.join(fa, "id_a")
      .withColumn("__fbkey", col("__fa") + col("shift"))
      .join(fb.withColumnRenamed("__fb", "__fbkey"), Seq("id_b", "__fbkey"))
      .withColumn("__ham",
        bit_count(col("__ca").bitwiseXOR(col("__cb"))).cast("long"))
    val nf = norm.groupBy(col("id")).agg(count(lit(1)).as("__nf"))
    val scored = aligned.groupBy(col("id_a"), col("id_b"), col("shift"))
      .agg(sum(when(col("__ham") <= maxHamming, 1L).otherwise(0L))
        .as("n_close"))
      .join(nf.select(col("id").as("id_a"), col("__nf").as("__na")), "id_a")
      .join(nf.select(col("id").as("id_b"), col("__nf").as("__nb")), "id_b")
      .withColumn("n_total",
        greatest(col("__na"), col("__nb")) - abs(col("shift")))
      .filter(col("n_close") * minCloseDen >= col("n_total") * minCloseNum)
    scored.groupBy(col("id_a"), col("id_b"))
      .agg(max(struct(col("n_close"), (lit(0L) - col("shift")).as("__negs"),
        col("shift"), col("n_total"))).as("__best"))
      .select(col("id_a"), col("id_b"), col("__best.shift").as("shift"),
        col("__best.n_close").as("n_close"),
        col("__best.n_total").as("n_total"))
  }
}
