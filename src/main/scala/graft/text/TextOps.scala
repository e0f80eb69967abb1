package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis column functions for LLM-data-pipeline preprocessing.
  *
  * Everything here is built from codegen'd `functions._` primitives — no
  * UDFs — so the expressions inline into whole-stage codegen and run at
  * scan speed on any cluster size.
  */
object TextOps {

  /** Sequential regex redaction: each (pattern, replacement) applies in
    * order (PII scrubbing — emails, phone numbers, ids, IPs). Pure
    * `regexp_replace` chain: per-row narrow, codegen'd, and portable (use
    * RE2-compatible patterns — no lookbehind — and the same rewrite runs
    * on any engine). */
  def redact(text: Column, rules: Seq[(String, String)]): Column =
    rules.foldLeft(text) { case (c, (pattern, repl)) =>
      regexp_replace(c, pattern, repl)
    }

  /** Count of matches of `pattern` (redaction audit metric). */
  def matchCount(text: Column, pattern: String): Column =
    size(regexp_extract_all(text, lit(pattern), lit(0))).cast("long")

  /** Whitespace tokens (single-space convention of the corpus). */
  def tokens(text: Column): Column = split(text, " ")

  /** Dedup-preprocessing normalization: casefold, strip punctuation,
    * collapse whitespace. Run BEFORE hashing/shingling so near-dups that
    * differ only in case/punctuation/spacing collide. */
  def normalize(text: Column): Column =
    trim(regexp_replace(
      regexp_replace(lower(text), "[^\\p{L}\\p{Nd} ]", " "),
      " +", " "))

  def distinctTokens(text: Column): Column = array_distinct(tokens(text))

  def tokenCount(text: Column): Column = size(tokens(text)).cast("long")

  /** BPE-ish token estimate: ~4 chars/token heuristic. floor() of an exact
    * small quotient is engine-portable (DuckDB `//` equivalent). */
  def bpeTokenEstimate(text: Column): Column =
    floor((length(text) + lit(3)) / lit(4)).cast("long")

  /** Word n-gram shingles (distinct), the unit for MinHash/Jaccard dedup.
    * Compiled expression; the HOF form (`transform` over `sequence`) is
    * interpreted per element and was the MinHash bottleneck. */
  def shingles(text: Column, n: Int): Column =
    graft.functions.WordNgrams.wordNgrams(tokens(text), n)

  /** How many tokens appear in `words` (with repeats — a frequency signal,
    * not set overlap). */
  def vocabHits(text: Column, words: Seq[String]): Column = {
    val vocab = array(words.map(lit): _*)
    size(filter(tokens(text), t => array_contains(vocab, t))).cast("long")
  }

  /** Average token length as a deterministic double: total token chars are
    * derivable from text length (single-space corpus), so no float sums. */
  def avgTokenLen(text: Column): Column = {
    val nTok = size(tokens(text))
    ((length(text) - nTok + lit(1)).cast("double")) / nTok.cast("double")
  }

  /** Simple quality score in [0,1]: stopword-ratio band + length band.
    * Deterministic arithmetic only. */
  def qualityScore(text: Column, stopwords: Seq[String]): Column = {
    val nTok = tokenCount(text)
    val stopRatio = vocabHits(text, stopwords).cast("double") / nTok.cast("double")
    val lenOk = when(nTok.between(10, 10000), lit(0.5)).otherwise(lit(0.0))
    val stopOk = when(stopRatio.between(0.01, 0.6), lit(0.5)).otherwise(lit(0.0))
    lenOk + stopOk
  }
}
