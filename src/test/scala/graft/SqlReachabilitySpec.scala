package graft

import org.apache.spark.sql.functions._

/** SQL-reachability sweep of the custom Catalyst expression surface (r9
  * verdict task 4): the reference's users live in SQL-ish config, so an
  * expression only reachable from Scala is half-shipped. Three gates:
  *
  *  1. INVENTORY — every `case class … extends *Expression` in
  *     `src/main/scala/graft/functions/` is either registered in
  *     [[graft.plans.GraftExtensions]] under a SQL name or carries a
  *     documented exemption here; a NEW expression class fails this spec
  *     until it is consciously classified.
  *  2. REGISTRY — every function GraftExtensions registers (ExpressionInfo
  *     source "graft") appears in the sweep table below, so a registered
  *     name can't ship un-exercised.
  *  3. PARITY — each SQL spelling evaluates on a fixture and must equal
  *     the Scala Column-API twin row-for-row (same expression, two
  *     construction paths: the registry's builder wiring is what's under
  *     test).
  */
class SqlReachabilitySpec extends SparkSpec {
  import spark.implicits._

  /** Expression class → its registered SQL name(s), or an exemption
    * reason prefixed "EXEMPT:". */
  private val classification: Map[String, String] = Map(
    "JaccardSim" -> "jaccard_sim",
    "DotProduct" -> "dot_product",
    "SimHash64" -> "simhash64",
    "RollingHash" -> "rolling_hash",
    "RollingHashGrams" -> "rolling_hash_grams",
    "WordNgrams" -> "word_ngrams",
    "CharNgrams" -> "char_ngrams",
    "MinHashSig" -> "minhash_sig",
    "MinHashBands" -> "minhash_bands",
    "Winnow" -> "winnow",
    "DecodableMedia" -> "decodable_media",
    "SearchSortedDouble" -> "search_sorted",
    "JaroWinkler" -> "jaro_sim,jaro_winkler_sim",
    "DamerauLevenshtein" -> "damerau_levenshtein",
    "MultiPatternCount" -> "multi_pattern_count,multi_pattern_distinct",
    "DtwDistance" -> "dtw_distance",
    "ModalCount" -> "modal_count",
    "EntropyTermSum" -> "entropy_term_sum",
    "HyperplaneBits" -> "hyperplane_bits",
    "BloomMightContainLong" -> ("EXEMPT: bound to a driver-built BloomFilter " +
      "runtime object (the engine's bloom-join internals inject it); a " +
      "sketch is not a SQL literal, and the SQL-facing spelling is the " +
      "stable_bucket/filter pipeline that builds it")
  )

  /** Non-expression `case class`es living in functions/ (sketch payloads,
    * automata, aggregator state) — listed so gate 1's parser can insist
    * every case class is consciously classified. */
  private val notExpressions = Set(
    "Sketch", "TopItem", "Node", "Digest")

  test("gate 1: every Expression case class in functions/ is registered " +
       "or carries a documented exemption") {
    val dir = new java.io.File("src/main/scala/graft/functions")
    assert(dir.isDirectory, s"run from the repo root: $dir missing")
    // anchored to a declaration at line start (optionally indented or
    // `final`) so prose like "this case class is …" in scaladoc can't match
    val caseClass = """(?m)^\s*(?:final\s+)?case class (\w+)""".r
    val found = dir.listFiles().filter(_.getName.endsWith(".scala"))
      .flatMap { f =>
        val src = java.nio.file.Files.readString(f.toPath)
        caseClass.findAllMatchIn(src).map(_.group(1))
      }.toSet
    val unclassified = found -- classification.keySet -- notExpressions
    withClue("new case classes in functions/ must be registered for SQL " +
      "or exempted/declared-non-expression in SqlReachabilitySpec: ") {
      unclassified shouldBe Set.empty
    }
    // and the lists don't rot: everything classified still exists
    (classification.keySet -- found) shouldBe Set.empty
    (notExpressions -- found) shouldBe Set.empty
  }

  // (sql spelling, Column twin) per registered name, evaluated on `fx`
  private lazy val fx = Seq(
    ("alpha beta gamma beta alpha", "alpha beta delta", Array(1.0, -2.0, 0.5),
      Array(0.5, 1.0, -1.0), Array(3L, 1L, 4L, 1L, 5L), Array(2L, 7L, 1L)),
    ("one two three four five six", "one two three seven", Array(0.0, 0.0, 1.0),
      Array(1.0, 0.0, 0.0), Array(9L, 9L, 9L), Array(9L, 8L, 9L))
  ).toDF("text", "text2", "vec", "vec2", "xs", "ys")

  import graft.functions._
  private val planes = Array(Array(1.0, 0.0, 0.0), Array(0.0, 1.0, -1.0))
  private val sweep: Seq[(String, String, org.apache.spark.sql.Column)] = Seq(
    ("jaccard_sim",
      "jaccard_sim(word_ngrams(split(text, ' '), 2), word_ngrams(split(text2, ' '), 2))",
      JaccardSim.jaccardSim(WordNgrams.wordNgrams(split(col("text"), " "), 2),
        WordNgrams.wordNgrams(split(col("text2"), " "), 2))),
    ("dot_product", "dot_product(vec, vec2)",
      DotProduct.dotProduct(col("vec"), col("vec2"))),
    ("simhash64", "simhash64(split(text, ' '))",
      SimHash64.simhash64(split(col("text"), " "))),
    ("rolling_hash", "rolling_hash(text)", RollingHash.rollingHash(col("text"))),
    ("rolling_hash_grams", "rolling_hash_grams(text, 4)",
      RollingHash.rollingHashGrams(col("text"), 4)),
    ("word_ngrams", "word_ngrams(split(text, ' '), 3)",
      WordNgrams.wordNgrams(split(col("text"), " "), 3)),
    ("char_ngrams", "char_ngrams(text, 3)", CharNgrams.charNgrams(col("text"), 3)),
    ("minhash_sig", "minhash_sig(char_ngrams(text, 3), 8)",
      MinHashSig.minhashSig(CharNgrams.charNgrams(col("text"), 3), 8)),
    ("minhash_bands", "minhash_bands(char_ngrams(text, 3), 4, 2)",
      MinHashBands.minhashBands(CharNgrams.charNgrams(col("text"), 3), 4, 2)),
    ("winnow", "winnow(rolling_hash_grams(text, 4), 3)",
      Winnow.winnow(RollingHash.rollingHashGrams(col("text"), 4), 3)),
    ("decodable_media", "decodable_media(encode(text, 'UTF-8'), 'text/plain')",
      DecodableMedia.decodableMedia(encode(col("text"), "UTF-8"), "text/plain")),
    ("search_sorted", "search_sorted(vec[0], array(-1.0, 0.25, 2.0))",
      SearchSortedDouble.searchSorted(col("vec").getItem(0), Array(-1.0, 0.25, 2.0))),
    ("stable_bucket", "stable_bucket(text, 7)", StableHash.bucket(col("text"), 7)),
    ("jaro_sim", "jaro_sim(text, text2)", JaroWinkler.jaroSim(col("text"), col("text2"))),
    ("jaro_winkler_sim", "jaro_winkler_sim(text, text2)",
      JaroWinkler.jaroWinklerSim(col("text"), col("text2"))),
    ("damerau_levenshtein", "damerau_levenshtein(text, text2)",
      DamerauLevenshtein.damerauLevenshtein(col("text"), col("text2"))),
    ("multi_pattern_count", "multi_pattern_count(text, array('alpha', 'two'))",
      MultiPatternCount.totalMatches(col("text"), Seq("alpha", "two"))),
    ("multi_pattern_distinct", "multi_pattern_distinct(text, array('alpha', 'two'))",
      MultiPatternCount.distinctPatterns(col("text"), Seq("alpha", "two"))),
    ("dtw_distance", "dtw_distance(xs, ys)", DtwDistance.dtwDistance(col("xs"), col("ys"))),
    ("modal_count", "modal_count(split(text, ' '))",
      ModalCount.modalCount(split(col("text"), " "))),
    ("entropy_term_sum", "entropy_term_sum(split(text, ' '))",
      EntropyTermSum.entropyTermSum(split(col("text"), " "))),
    ("hyperplane_bits",
      "hyperplane_bits(vec, array(array(1.0D, 0.0D, 0.0D), array(0.0D, 1.0D, -1.0D)))",
      HyperplaneBits.bits(col("vec"), planes))
  )

  test("gate 2: every graft-registered SQL function is in the sweep table") {
    val registered = spark.sessionState.functionRegistry.listFunction()
      .flatMap(f => spark.sessionState.functionRegistry.lookupFunction(f))
      .filter(_.getClassName == "graft").map(_.getName).toSet
    registered shouldBe sweep.map(_._1).toSet
    registered.size should be >= 22
  }

  test("gate 3: each SQL spelling equals its Column-API twin row-for-row") {
    fx.createOrReplaceTempView("sql_sweep_fx")
    sweep.foreach { case (name, sqlExpr, column) =>
      withClue(s"$name: ") {
        val viaSql = spark.sql(
          s"SELECT $sqlExpr AS v FROM sql_sweep_fx ORDER BY text")
          .collect().map(_.get(0)).toSeq
        val viaApi = fx.select(column.as("v")).orderBy(col("text"))
          .collect().map(_.get(0)).toSeq
        normalize(viaSql) shouldBe normalize(viaApi)
      }
    }
  }

  /** Array results come back as WrappedArray vs ArraySeq depending on the
    * path — compare on Seq content. */
  private def normalize(vs: Seq[Any]): Seq[Any] = vs.map {
    case a: scala.collection.Seq[_] => a.toList
    case other => other
  }
}
