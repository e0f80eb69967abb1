package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.tables.Tables
import graft.functions.{DamerauLevenshtein, JaroWinkler, MinHashSig}

/** Entity-resolution / record-linkage wave: the string-similarity
  * comparators and probabilistic-matching machinery (Fellegi-Sunter,
  * JASA'69) a dedup-at-scale stack needs beyond token-set metrics —
  * typo-class distances for NAMES rather than shingle Jaccard for
  * DOCUMENTS. The reference engine has nothing in this family (its DQ
  * layer stops at regex predicates); these queries are gated against
  * DuckDB's NATIVE jaro_winkler_similarity / damerau_levenshtein, so the
  * oracle is a fully independent engine implementation, not recomputed
  * SQL of our own formula.
  *
  * Scale shapes: every pair space is on the VOCABULARY or sampled-entity
  * grain (bounded, ≪ corpus rows), blocked by an equi-join key (first
  * character / brand) exactly as a 100 TB linkage run would block; the
  * corpus-sized tables are touched only by one distinct-building scan.
  */
object LinkageQueries {

  /** Distinct word-bigram vocabulary of the corpus — the bounded string
    * grain the similarity waves pair over. */
  private def bigramVocab(spark: SparkSession, dir: String): DataFrame = {
    val tk = Tables.documents(spark, dir)
      .select(split(col("text"), " ").as("tk"))
      .filter(size(col("tk")) >= 2)
    tk.select(explode(expr(
        "transform(sequence(1, size(tk) - 1), i -> concat_ws(' ', slice(tk, i, 2)))"))
        .as("s"))
      .filter(length(col("s")) > 0)
      .distinct()
  }

  /** The deterministic md5-uniform channel (house idiom, cf. q287): upper
    * 64 md5 bits of `tag#key` mod 2^61-1, as a BIGINT column. */
  private def md5Channel(tag: String, key: Column): Column =
    element_at(MinHashSig.minhashSig(
      array(concat(lit(tag + "#"), key)), 1), 1)

  /** Jaro / Jaro-Winkler near-name pairs over the bigram vocabulary,
    * first-character-blocked — the comparator shootout behind picking a
    * linkage threshold. Gated against DuckDB's native implementations.
    * Scale shape: one corpus scan builds the distinct vocabulary; the
    * self-join is on the bounded vocab grain with an equi block key. */
  def q295_jaro_vocab(spark: SparkSession, dir: String): DataFrame = {
    val v = bigramVocab(spark, dir)
      .select(col("s"), substring(col("s"), 1, 1).as("blk"),
        length(col("s")).as("ln"))
    val a = v.select(col("blk"), col("s").as("a"), col("ln").as("la"))
    val b = v.select(col("blk"), col("s").as("b"), col("ln").as("lb"))
    a.join(b, Seq("blk"))
      .filter(col("a") < col("b") && abs(col("la") - col("lb")) <= 4)
      .select(col("a"), col("b"),
        round(JaroWinkler.jaroSim(col("a"), col("b")), 6).as("jaro"),
        round(JaroWinkler.jaroWinklerSim(col("a"), col("b")), 6).as("jw"))
      .filter(col("jw") >= 0.88)
      .orderBy(col("a"), col("b"))
  }

  /** Typo-injection round-trip audit of TRUE Damerau-Levenshtein: each
    * vocabulary string gets one deterministic adjacent-character swap (the
    * most common human keystroke error), and the report shows dl counting
    * it as ONE edit where plain levenshtein charges two — the evidence
    * that the transposition modality works, pair by pair, against
    * DuckDB's native damerau_levenshtein. Scale shape: per-row compiled
    * kernels on the bounded vocabulary grain; no join at all. */
  def q296_damerau_typos(spark: SparkSession, dir: String): DataFrame = {
    val p = 2305843009213693951L
    val v = bigramVocab(spark, dir).filter(length(col("s")) >= 4)
      .withColumn("pos",
        (lit(1L) + pmod(pmod(md5Channel("typo", col("s")), lit(p)),
          (length(col("s")) - 1).cast("long"))).cast("int"))
    val typo = concat(
      col("s").substr(lit(1), col("pos") - 1),
      col("s").substr(col("pos") + 1, lit(1)),
      col("s").substr(col("pos"), lit(1)),
      col("s").substr(col("pos") + 2, length(col("s"))))
    v.select(col("s"), typo.as("typo"))
      .select(col("s"), col("typo"),
        levenshtein(col("s"), col("typo")).cast("long").as("lev"),
        DamerauLevenshtein.damerauLevenshtein(col("s"), col("typo")).as("dl"))
      .withColumn("transposition_gain", col("lev") - col("dl"))
      .orderBy(col("s"))
  }

  /** Fellegi-Sunter probabilistic record linkage, end to end: a sampled
    * part-record set against a deterministically dirtied replica (one
    * adjacent-char name typo; size drifts +1 on a 1-in-3 channel), blocked
    * on (brand, name first char), scored with fixed log-odds agreement
    * weights over three field comparators (Jaro-Winkler name ≥ 0.95,
    * |size diff| ≤ 1, first-token equality), and classified
    * match / possible / non_match. The report is the per-decision
    * confusion summary — n_pairs, how many are the true same-entity pairs,
    * precision — i.e. the linkage-quality evidence, not just scores.
    * Weights fold as exact DECIMAL(4,2), so class boundaries are never FP
    * artifacts. Scale shape: entity grain, equi-blocked; block sizes are
    * bounded by (brand × initial) fan-in, the classic linkage layout. */
  def q297_linkage_score(spark: SparkSession, dir: String): DataFrame = {
    val p = 2305843009213693951L
    val sample = Tables.part(spark, dir)
      .filter(col("p_partkey") % 7 === 0)
      .select(col("p_partkey"), col("p_name"), col("p_brand"), col("p_size"))
    val pos = (lit(1L) + pmod(pmod(md5Channel("typo", col("p_name")), lit(p)),
      (length(col("p_name")) - 1).cast("long"))).cast("int")
    val dirty = sample
      .withColumn("pos", pos)
      .select(col("p_partkey").as("d_key"), col("p_brand").as("d_brand"),
        concat(
          col("p_name").substr(lit(1), col("pos") - 1),
          col("p_name").substr(col("pos") + 1, lit(1)),
          col("p_name").substr(col("pos"), lit(1)),
          col("p_name").substr(col("pos") + 2, length(col("p_name"))))
          .as("d_name"),
        (col("p_size") + when(pmod(pmod(md5Channel("sz", col("p_partkey")),
          lit(p)), lit(3L)) === 0, 1).otherwise(0)).as("d_size"))
    val pairs = sample.join(dirty,
      col("p_brand") === col("d_brand") &&
        substring(col("p_name"), 1, 1) === substring(col("d_name"), 1, 1))
    val nameAgree = JaroWinkler.jaroWinklerSim(col("p_name"), col("d_name")) >= 0.95
    val sizeAgree = abs(col("p_size") - col("d_size")) <= 1
    val adjAgree = element_at(split(col("p_name"), " "), 1) ===
      element_at(split(col("d_name"), " "), 1)
    def w(agree: Column, yes: String, no: String): Column =
      when(agree, lit(yes).cast("decimal(4,2)"))
        .otherwise(lit(no).cast("decimal(4,2)"))
    val score = (w(nameAgree, "4.00", "-2.00") +
      w(sizeAgree, "1.00", "-1.50") +
      w(adjAgree, "1.50", "-1.00")).cast("decimal(6,2)")
    pairs.select(col("p_partkey"), col("d_key"), score.as("score"))
      .withColumn("decision",
        when(col("score") >= lit("6.00").cast("decimal(4,2)"), "match")
          .when(col("score") >= lit("3.50").cast("decimal(4,2)"), "possible")
          .otherwise("non_match"))
      .groupBy(col("decision"))
      .agg(count(lit(1)).cast("long").as("n_pairs"),
        sum(when(col("p_partkey") === col("d_key"), 1L).otherwise(0L))
          .cast("long").as("n_true"),
        round(sum(when(col("p_partkey") === col("d_key"), 1L).otherwise(0L))
          .cast("double") / count(lit(1)).cast("double"), 6).as("precision"))
      .orderBy(col("decision"))
  }
}
