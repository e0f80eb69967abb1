package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Unigram-LM (SentencePiece, Kudo 2018) tokenizer primitives — the
  * likelihood-based counterpart of the greedy BPE family (q93 merge
  * mining / q367 apply). Three stages, every one on dictionary or vocab
  * grain after a single corpus aggregate:
  *
  *  1. [[dictionary]] — corpus → distinct normalized words with
  *     frequencies (the q93/q367 dictionary-encode trick: all later
  *     character work is over word TYPES, never token occurrences).
  *  2. [[seedVocab]] — substring seed masses → NLL piece costs. Costs
  *     are `round(ln(total) − ln(mass), 9)` DECIMAL(20,9): exact-integer
  *     `ln` inputs + 9-decimal rounding absorb any libm last-ulp split
  *     (the q363 Naive-Bayes rule), so the downstream DP is an exact
  *     DECIMAL fold in every engine.
  *  3. [[viterbi]] — the E-step: per-word best segmentation under the
  *     piece costs, as a codegen'd nested higher-order `aggregate` (no
  *     UDF, no driver loop), ties broken by the lexicographically
  *     smallest segmentation string — a pure function of the masses.
  *
  * The reference has no tokenizer surface at all; this implements the
  * training loop its LLM-ingestion brief needs (compare
  * `/root/reference/docs/02-tech-spec.md:45-46`, which stops at file
  * readers). Oracle replays drive the same arithmetic as recursive CTEs
  * with a lateral min-per-step (see `Oracles.q388/q389`).
  */
object UnigramLm {

  /** Longest candidate piece, in characters. */
  val MaxPiece = 4

  /** Words longer than this are excluded from training and encoding (in
    * both engines — keeps the DP bounded per row at any corpus scale). */
  val MaxWordLen = 16

  /** Corpus → (w, freq) dictionary over normalized whitespace tokens.
    * Pinned ([[DataFrame.localCheckpoint]], lazy): every caller fans it
    * into at least the substring pass, the edge pass and a weighting
    * join — unpinned, each subtree would re-run the corpus scan. */
  def dictionary(docs: DataFrame, textCol: String = "text"): DataFrame =
    docs
      .select(explode(TextOps.tokens(TextOps.normalize(col(textCol))))
        .as("w"))
      .filter(length(col("w")).between(1, MaxWordLen))
      .groupBy("w").agg(count(lit(1)).cast("long").as("freq"))
      .localCheckpoint(eager = false)

  /** Substring seed masses over the dictionary: every 1..[[MaxPiece]]-char
    * substring occurrence inside each word, frequency-weighted. */
  def substringMasses(words: DataFrame): DataFrame =
    words
      .select(col("freq"), explode(expr(
        s"""flatten(transform(sequence(1, length(w)), i ->
           |  transform(sequence(1, least($MaxPiece, length(w) - i + 1)),
           |    l -> substr(w, i, l))))""".stripMargin)).as("piece"))
      .groupBy("piece").agg(sum(col("freq")).cast("long").as("seed_mass"))

  /** Seed vocabulary with NLL costs: every single char (guarantees
    * segmentability of in-alphabet words) plus the top-`keepMulti`
    * multi-char pieces by (mass desc, piece asc) — a bounded
    * TakeOrdered. Output: (piece, seed_mass, cost DECIMAL(20,9)).
    * Pinned: consumed by the edge join and callers' reporting joins. */
  def seedVocab(words: DataFrame, keepMulti: Int = 64): DataFrame = {
    val subs = substringMasses(words)
    val vocab0 = subs.filter(length(col("piece")) === 1)
      .unionByName(subs.filter(length(col("piece")) >= 2)
        .orderBy(col("seed_mass").desc, col("piece")).limit(keepMulti))
    val tot = vocab0.agg(sum(col("seed_mass")).as("t")) // 1-row
    vocab0.crossJoin(broadcast(tot))
      .select(col("piece"), col("seed_mass"), nllCost(col("t"),
        col("seed_mass")).as("cost"))
      .localCheckpoint(eager = false)
  }

  /** `round(ln(total) − ln(mass), 9)` as DECIMAL(20,9) — the engine-
    * portable NLL cost (see class doc). */
  def nllCost(total: Column, mass: Column): Column =
    round(ln(total.cast("double")) - ln(mass.cast("double")), 9)
      .cast("decimal(20,9)")

  /** Viterbi E-step: best segmentation of each dictionary word under
    * `vocab`'s (piece, cost) table. Edges (span j→i whose substring is a
    * vocab piece) attach by an equi-join on the piece string — at scale
    * the heavy side hash-partitions on real keys; nothing broadcasts but
    * 1-row totals upstream. Words with an out-of-vocab character (no
    * complete path) are dropped — callers that must keep them union an
    * unk char table into `vocab` first (see q389). Output: (w, seg)
    * where `seg` joins the winning pieces with '|'. */
  def viterbi(words: DataFrame, vocab: DataFrame): DataFrame = {
    val edges = words
      .select(col("w"), explode(expr(
        s"""flatten(transform(sequence(1, length(w)), i ->
           |  transform(sequence(1, least($MaxPiece, i)), l ->
           |    named_struct('j', i - l, 'i', i,
           |      'piece', substr(w, i - l + 1, l)))))""".stripMargin))
        .as("e"))
      .select(col("w"), col("e.j").as("j"), col("e.i").as("i"),
        col("e.piece").as("piece"))
      .join(vocab.select(col("piece"), col("cost")), Seq("piece"))
      .groupBy("w").agg(sort_array(collect_list(struct(col("i"),
        col("j"), col("piece"), col("cost")))).as("edges"))
    // state[i+1] = best (cost, seg) into position i — min by exact
    // DECIMAL cost then lexicographic segmentation, identical to the
    // oracle's lateral ORDER BY cost, seg LIMIT 1
    words.join(edges, Seq("w"))
      .withColumn("st", expr(
        // the zero's fields are spelled NULLABLE via a non-foldable IF
        // (always true): dead positions hold NULL cost/seg, and if the
        // st array ever materializes in its own projection, a zero
        // declared non-null would make the unsafe writer NPE on them
        """aggregate(sequence(1, length(w)),
          |  array(named_struct(
          |    'cost', IF(length(w) IS NOT NULL, CAST(0 AS DECIMAL(20,9)),
          |               CAST(NULL AS DECIMAL(20,9))),
          |    'seg',  IF(length(w) IS NOT NULL, '', CAST(NULL AS STRING)))),
          |  (st, i) -> concat(st, array(
          |    aggregate(filter(edges, e -> e.i = i),
          |      named_struct('cost', CAST(NULL AS DECIMAL(20,9)),
          |                   'seg', CAST(NULL AS STRING)),
          |      (best, e) -> IF(best.cost IS NULL
          |          OR CAST(element_at(st, e.j + 1).cost + e.cost
          |               AS DECIMAL(20,9)) < best.cost
          |          OR (CAST(element_at(st, e.j + 1).cost + e.cost
          |                AS DECIMAL(20,9)) = best.cost
          |              AND IF(e.j = 0, e.piece,
          |                concat(element_at(st, e.j + 1).seg, '|',
          |                  e.piece)) < best.seg),
          |        named_struct(
          |          'cost', CAST(element_at(st, e.j + 1).cost + e.cost
          |            AS DECIMAL(20,9)),
          |          'seg', IF(e.j = 0, e.piece,
          |            concat(element_at(st, e.j + 1).seg, '|',
          |              e.piece))),
          |        best)))))""".stripMargin))
      // an out-of-vocab char leaves a NULL hole some suffix can't bridge
      .filter(expr("element_at(st, length(w) + 1).cost IS NOT NULL"))
      .select(col("w"), col("freq"),
        expr("element_at(st, length(w) + 1).seg").as("seg"),
        expr("element_at(st, length(w) + 1).cost").as("cost"))
  }

  /** M-step: piece masses under the winning segmentations, renormalized
    * into the NEXT round's NLL costs — with [[viterbi]] this closes the
    * hard-EM loop (Kudo 2018's Viterbi-EM variant). Two deliberate
    * properties:
    *
    *  - pieces NO winning segmentation used drop out (their EM mass is
    *    zero) — provably free for the NLL-monotone chain, since no
    *    retained segmentation references them;
    *  - single-char pieces of the previous vocab's alphabet are retained
    *    with floor mass 1 (the q389 unk discipline) and INCLUDED in the
    *    normalization total, so (a) every currently-segmentable word
    *    stays segmentable in every later round and (b) the piece scores
    *    remain a true probability distribution — the Gibbs-inequality
    *    step of the monotonicity argument needs Σp ≤ 1.
    *
    * Monotonicity (the q395 gate): corpus NLL under round r+1's costs ≤
    * corpus NLL under round r's, because the E-step is exact
    * minimization per word and the M-step's renormalized masses minimize
    * the cross-entropy of the round-r segmentation distribution (up to
    * the ≤1e-9-per-piece cost rounding and the alphabet floor's
    * ln(1+u/T) dilution, both orders of magnitude below a real EM
    * improvement). Output: (piece, em_mass, cost), pinned. */
  def mStep(dp: DataFrame, vocab: DataFrame): DataFrame = {
    val em = dp
      .select(col("freq"), explode(split(col("seg"), "\\|")).as("piece"))
      .groupBy("piece").agg(sum(col("freq")).cast("long").as("em_mass"))
    val floor = vocab.filter(length(col("piece")) === 1)
      .select(col("piece"))
      .join(em.select(col("piece")), Seq("piece"), "left_anti")
      .withColumn("em_mass", lit(1L))
    val all = em.unionByName(floor)
    val tot = all.agg(sum(col("em_mass")).as("t")) // 1-row
    all.crossJoin(broadcast(tot))
      .select(col("piece"), col("em_mass"),
        nllCost(col("t"), col("em_mass")).as("cost"))
      .localCheckpoint(eager = false)
  }

  /** The SERVING path: segment every document of `docs` under a FROZEN
    * trained vocab — "train a tokenizer" ends at a vocab; tokenizing the
    * corpus under it is the job a training-data pipeline actually runs at
    * 100 TB, and the one the trainer queries (q388/q395) stop short of.
    * `vocab` is a trained (piece, em_mass, cost) frame ([[mStep]] /
    * [[prune]] output, or [[seedVocab]] with `seed_mass` renamed).
    * Characters the vocab never saw enter as mass-1 unk pieces costed
    * against the vocab's own mass total (the q389 unk discipline), so
    * every word still segments and unk exposure is an exact count, not a
    * dropped-row artifact.
    *
    * Scale shape: the Viterbi DP runs ONCE per distinct word (the
    * dictionary-encode trick — [[viterbi]] is dictionary-grain); the
    * per-occurrence work is an equi-join of the (doc, pos, word) token
    * stream onto the per-word result plus one per-document aggregate.
    * The `pieces` string reassembles in token order via a sorted
    * `collect_list` bounded by the document's own token count — the same
    * per-document grain the raw text already occupies, never a window
    * over corpus rows. Words longer than [[MaxWordLen]] are excluded
    * exactly as in training (both engines).
    *
    * Output, one row per document: (idCol, n_tokens, n_pieces,
    * n_unk_pieces, nll, pieces) — `nll` the exact-DECIMAL sum of best-
    * path costs rounded once to 6, `pieces` the per-token '|'-joined
    * segmentations joined by spaces in original token order. */
  def encode(docs: DataFrame, idCol: String, textCol: String,
             vocab: DataFrame): DataFrame = {
    // (doc, pos, w) token stream — pinned: it feeds both the dictionary
    // aggregate and the per-occurrence join-back
    val toks = docs.select(col(idCol).as("__did"),
        posexplode(TextOps.tokens(TextOps.normalize(col(textCol))))
          .as(Seq("pos", "w")))
      .filter(length(col("w")).between(1, MaxWordLen))
      .localCheckpoint(eager = false)
    val words = toks.groupBy("w")
      .agg(count(lit(1)).cast("long").as("freq"))
    // unseen chars → mass-1 unk pieces against the vocab's own total
    // (bounded: one row per novel character, anti-joined on the piece)
    val tot = vocab.agg(sum(col("em_mass")).as("t")) // 1-row
    val unk = words
      .select(explode(expr(
        "transform(sequence(1, length(w)), i -> substr(w, i, 1))"))
        .as("piece")).distinct()
      .join(vocab.select(col("piece")), Seq("piece"), "left_anti")
      .crossJoin(broadcast(tot))
      .select(col("piece"), nllCost(col("t"), lit(1L)).as("cost"),
        lit(true).as("is_unk"))
    val fullVocab = vocab.select(col("piece"), col("cost"),
        lit(false).as("is_unk"))
      .unionByName(unk)
      .localCheckpoint(eager = false) // consumed by the DP edges AND the
                                      // per-piece unk flags below
    val dp = viterbi(words, fullVocab.select(col("piece"), col("cost")))
    val unkPerWord = dp
      .select(col("w"), explode(split(col("seg"), "\\|")).as("piece"))
      .join(fullVocab.select(col("piece"), col("is_unk")), Seq("piece"))
      .groupBy("w")
      .agg(sum(when(col("is_unk"), 1L).otherwise(0L)).as("__n_unk_w"))
    val perWord = dp
      .withColumn("__n_pieces_w",
        size(split(col("seg"), "\\|")).cast("long"))
      .join(unkPerWord, Seq("w"))
      .select(col("w"), col("seg"), col("cost"),
        col("__n_pieces_w"), col("__n_unk_w"))
    toks.join(perWord, Seq("w"))
      .groupBy(col("__did"))
      .agg(count(lit(1)).cast("long").as("n_tokens"),
        sum(col("__n_pieces_w")).cast("long").as("n_pieces"),
        sum(col("__n_unk_w")).cast("long").as("n_unk_pieces"),
        round(sum(col("cost")), 6).cast("double").as("nll"),
        array_join(transform(
          array_sort(collect_list(struct(col("pos"), col("seg")))),
          x => x.getField("seg")), " ").as("pieces"))
      .select(col("__did").as(idCol), col("n_tokens"), col("n_pieces"),
        col("n_unk_pieces"), col("nll"), col("pieces"))
  }

  /** Vocab pruning between EM rounds: drop the bottom-`k` MULTI-char
    * pieces by EM mass (mass asc, piece asc — deterministic; in hard-EM
    * a piece's removal loss is proportional to its mass, the
    * SentencePiece loss proxy), keep every single-char piece (the
    * segmentability floor), and renormalize the survivors' masses into
    * fresh costs. A bounded TakeOrdered — `k` rows cross the driver,
    * never the vocab. NOTE: pruning a USED piece can legitimately raise
    * the next round's corpus NLL (that is the vocab-size-for-likelihood
    * trade SentencePiece makes), so the q395 monotone gate does not span
    * a prune. */
  def prune(vocab: DataFrame, k: Int): DataFrame = {
    val drop = vocab.filter(length(col("piece")) >= 2)
      .orderBy(col("em_mass").asc, col("piece")).limit(k)
    val kept = vocab.join(drop.select(col("piece")), Seq("piece"), "left_anti")
    val tot = kept.agg(sum(col("em_mass")).as("t")) // 1-row
    kept.crossJoin(broadcast(tot))
      .select(col("piece"), col("em_mass"),
        nllCost(col("t"), col("em_mass")).as("cost"))
      .localCheckpoint(eager = false)
  }
}
