package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Heuristic language identification via stopword-hit scoring.
  *
  * Real-world profiles would carry the top-k character n-grams per language;
  * the mechanism (score per profile in one pass, argmax with deterministic
  * tie-break on profile order) is identical. On the synthetic corpus the
  * vocabulary is English-ish so `en` dominates — the operator is exercised,
  * the data just isn't multilingual.
  */
object LangId {

  final case class Profile(lang: String, markers: Seq[String])

  val default: Seq[Profile] = Seq(
    Profile("en", Seq("the", "and", "of", "to", "in", "is", "it", "that")),
    Profile("es", Seq("el", "la", "los", "las", "de", "que", "y", "en")),
    Profile("fr", Seq("le", "la", "les", "des", "et", "que", "qui", "dans")))

  /** Per-profile hit count columns, aliased `hits_<lang>`. */
  def scores(text: Column, profiles: Seq[Profile] = default): Seq[Column] =
    profiles.map(p => TextOps.vocabHits(text, p.markers).as(s"hits_${p.lang}"))

  /** Argmax over profiles; earlier profile wins ties (>= chain). */
  def predict(text: Column, profiles: Seq[Profile] = default): Column = {
    val hits = profiles.map(p => TextOps.vocabHits(text, p.markers))
    val pred = profiles.indices.foldRight(lit(profiles.last.lang)) { (i, acc) =>
      if (i == profiles.length - 1) acc
      else {
        val geAll = profiles.indices.drop(i + 1)
          .map(j => hits(i) >= hits(j)).reduce(_ && _)
        when(geAll, lit(profiles(i).lang)).otherwise(acc)
      }
    }
    pred
  }
}
