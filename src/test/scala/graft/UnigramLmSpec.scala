package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import graft.text.UnigramLm

/** Unit pins for the unigram-LM tokenizer primitives (q388/q389). The
  * oracle proves engine parity on the corpus; these prove the DP is a
  * real Viterbi on hand cases where the optimum is checkable by eye.
  */
class UnigramLmSpec extends SparkSpec {
  import spark.implicits._

  private def vocabOf(rows: (String, Long)*) = {
    val df = rows.toSeq.toDF("piece", "seed_mass")
    val tot = df.agg(sum(col("seed_mass")).as("t"))
    df.crossJoin(broadcast(tot))
      .select(col("piece"), col("seed_mass"),
        UnigramLm.nllCost(col("t"), col("seed_mass")).as("cost"))
  }

  test("viterbi picks the cheaper multi-char piece over char-by-char") {
    // masses: 'ab' is frequent (cheap), singles are rare (expensive) —
    // one 'ab' piece (1 NLL) must beat 'a'+'b' (2 larger NLLs)
    val words = Seq(("ab", 5L)).toDF("w", "freq")
    val vocab = vocabOf("a" -> 1L, "b" -> 1L, "ab" -> 8L)
    val out = UnigramLm.viterbi(words, vocab).collect()
    out.map(r => (r.getString(0), r.getString(2))).toSeq shouldBe
      Seq(("ab", "ab"))
  }

  test("viterbi splits when the long piece is rarer than its parts") {
    val words = Seq(("ab", 5L)).toDF("w", "freq")
    val vocab = vocabOf("a" -> 8L, "b" -> 8L, "ab" -> 1L)
    UnigramLm.viterbi(words, vocab).collect()
      .head.getString(2) shouldBe "a|b"
  }

  test("exact-DECIMAL cost ties break on the lexicographically smallest" +
      " segmentation") {
    // all pieces share one mass → 'abc' as 2 pieces ties both ways:
    // 'ab|c' vs 'a|bc' — 'ab|c' is lexicographically smaller because
    // 'b' (0x62) sorts before '|' (0x7c)
    val words = Seq(("abc", 1L)).toDF("w", "freq")
    val vocab = vocabOf("a" -> 4L, "b" -> 4L, "c" -> 4L,
      "ab" -> 4L, "bc" -> 4L)
    UnigramLm.viterbi(words, vocab).collect()
      .head.getString(2) shouldBe "ab|c"
  }

  test("a word with an out-of-vocab char drops (callers union unk chars" +
      " to keep it)") {
    val words = Seq(("ax", 1L), ("aa", 1L)).toDF("w", "freq")
    val vocab = vocabOf("a" -> 4L) // no 'x'
    val out = UnigramLm.viterbi(words, vocab).collect()
    out.map(_.getString(0)).toSeq shouldBe Seq("aa")
    out.head.getString(2) shouldBe "a|a"
  }

  test("a long piece bridges a position no short edge reaches") {
    // 'x' alone is out-of-vocab but 'xa' is a piece: position 1 is a
    // dead state yet the 2-char edge spans it — the DP must not require
    // every intermediate position to be reachable
    val words = Seq(("xa", 1L)).toDF("w", "freq")
    val vocab = vocabOf("a" -> 4L, "xa" -> 2L)
    UnigramLm.viterbi(words, vocab).collect()
      .head.getString(2) shouldBe "xa"
  }

  test("the q389 unk-union flow keeps words with chars the train split" +
      " never saw") {
    // train vocab has no 'z'; the held-out caller unions a mass-1 unk
    // piece (the q389 rule) so the word still segments — and the unk
    // piece is identifiable afterwards
    val held = Seq(("az", 2L)).toDF("w", "freq")
    val train = vocabOf("a" -> 8L, "b" -> 8L)
    val tot = train.agg(sum(col("seed_mass")).as("t"))
    val unk = held
      .select(explode(expr(
        "transform(sequence(1, length(w)), i -> substr(w, i, 1))"))
        .as("piece")).distinct()
      .join(train.select(col("piece")), Seq("piece"), "left_anti")
      .crossJoin(broadcast(tot))
      .select(col("piece"), UnigramLm.nllCost(col("t"), lit(1L)).as("cost"))
    val full = train.select(col("piece"), col("cost")).unionByName(unk)
    val out = UnigramLm.viterbi(held, full).collect()
    out.head.getString(2) shouldBe "a|z"
    unk.collect().map(_.getString(0)).toSeq shouldBe Seq("z")
  }

  test("dictionary normalizes, bounds word length, and counts corpus" +
      " frequency") {
    val docs = Seq("The cat, the CAT!", "cat " + "y" * 20)
      .toDF("text")
    val out = UnigramLm.dictionary(docs).orderBy("w").collect()
    // 'the' twice, 'cat' three times, the 20-char word excluded
    out.map(r => (r.getString(0), r.getLong(1))).toSeq shouldBe
      Seq(("cat", 3L), ("the", 2L))
  }

  test("property: the DP equals brute-force min over ALL segmentations" +
      " (cost, then lexicographic seg) on generated words") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    val gWord = for {
      n <- Gen.choose(1, 6)
      cs <- Gen.listOfN(n, Gen.oneOf('a', 'b', 'c'))
    } yield cs.mkString
    val words = (0 until 40)
      .flatMap(i => gWord(Gen.Parameters.default, Seed(1234L + i)))
      .distinct
    // vocab: all chars + a few multi-char pieces with assorted masses
    val vocab = vocabOf("a" -> 3L, "b" -> 5L, "c" -> 2L,
      "ab" -> 7L, "bc" -> 7L, "ca" -> 1L, "abc" -> 4L, "bb" -> 6L)
    val costs = vocab.collect()
      .map(r => r.getString(0) -> BigDecimal(r.getDecimal(2))).toMap
    def segmentations(w: String): Seq[List[String]] =
      if (w.isEmpty) Seq(Nil)
      else (1 to math.min(UnigramLm.MaxPiece, w.length)).flatMap { l =>
        val p = w.take(l)
        if (costs.contains(p)) segmentations(w.drop(l)).map(p :: _)
        else Seq.empty
      }
    val expected = words.flatMap { w =>
      val segs = segmentations(w)
      if (segs.isEmpty) None
      else Some(w -> segs
        .map(s => (s.map(costs).sum, s.mkString("|")))
        .minBy(identity)._2)
    }.toMap
    val got = UnigramLm.viterbi(
        words.map(w => (w, 1L)).toDF("w", "freq"), vocab)
      .collect().map(r => r.getString(0) -> r.getString(2)).toMap
    got shouldBe expected
  }

  test("seedVocab keeps every single char and caps multi-char pieces" +
      " deterministically") {
    val words = Seq(("aab", 10L), ("ba", 3L)).toDF("w", "freq")
    val vocab = UnigramLm.seedVocab(words, keepMulti = 2).collect()
    val singles = vocab.filter(_.getString(0).length == 1).map(_.getString(0))
    singles.sorted.toSeq shouldBe Seq("a", "b")
    val multi = vocab.filter(_.getString(0).length > 1)
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    // masses: 'aa'=10, 'ab'=10, 'aab'=10, 'ba'=3 → top-2 by (mass desc,
    // piece asc) = 'aa', 'aab'
    multi.map(_._1).sorted.toSeq shouldBe Seq("aa", "aab")
    // costs are non-negative DECIMAL(20,9) and larger for rarer pieces
    val byPiece = UnigramLm.seedVocab(words, keepMulti = 2)
      .collect().map(r => r.getString(0) -> r.getDecimal(2)).toMap
    byPiece("b").compareTo(byPiece("a")) should be > 0
  }

  test("property: one EM round never increases corpus NLL (random corpora)") {
    // the q395 monotone gate's mathematical core, pinned on seeded
    // random corpora: E-step is exact per-word minimization, M-step's
    // renormalized masses minimize the segmentation distribution's
    // cross-entropy (Gibbs) — so NLL(round 2) <= NLL(round 1). mStep's
    // alphabet floor and the 1e-9 cost rounding are orders of magnitude
    // below any real EM improvement on corpora like these.
    def corpusNll(dp: org.apache.spark.sql.DataFrame): BigDecimal =
      dp.select(sum(col("freq").cast("decimal(10,0)") * col("cost"))
          .as("nll"))
        .collect().head.getDecimal(0)
    (1 to 5).foreach { trial =>
      val rnd = new scala.util.Random(7919L * trial)
      val alphabet = "abcdef"
      val words = Seq.fill(120) {
        val len = 1 + rnd.nextInt(10)
        (Seq.fill(len)(alphabet(rnd.nextInt(alphabet.length))).mkString,
          1L + rnd.nextInt(20).toLong)
      }.groupBy(_._1).map { case (w, fs) => (w, fs.map(_._2).sum) }
        .toSeq.toDF("w", "freq").localCheckpoint(true)
      val v1 = UnigramLm.seedVocab(words)
        .select(col("piece"), col("seed_mass").as("em_mass"), col("cost"))
      val dp1 = UnigramLm.viterbi(words, v1).localCheckpoint(true)
      val v2 = UnigramLm.mStep(dp1, v1)
      val dp2 = UnigramLm.viterbi(words, v2)
      withClue(s"trial $trial: ") {
        // every word stays segmentable (the mStep alphabet floor)
        dp2.count() shouldBe dp1.count()
        corpusNll(dp2) should be <= corpusNll(dp1)
      }
    }
  }

  test("prune drops exactly the bottom-k multi-char pieces and keeps " +
      "every single char") {
    val vocab = Seq(("a", 50L), ("b", 1L), ("ab", 9L), ("ba", 3L),
      ("aab", 3L), ("bb", 30L))
      .toDF("piece", "em_mass")
      .withColumn("cost", UnigramLm.nllCost(lit(96L), col("em_mass")))
    val kept = UnigramLm.prune(vocab, 2).collect()
      .map(_.getString(0)).sorted.toSeq
    // bottom-2 multi by (mass asc, piece asc): 'aab'(3), 'ba'(3) drop;
    // singles survive regardless of mass
    kept shouldBe Seq("a", "ab", "b", "bb")
  }

  test("encode: per-word segmentations equal the trainer's under the same " +
       "frozen vocab, pieces reassemble in token order, nll is the exact " +
       "sum of best-path costs") {
    val docs = Seq((1L, "abab banana"), (2L, "banana"), (3L, "abab"))
      .toDF("id", "text")
    val words = UnigramLm.dictionary(docs)
    val v = UnigramLm.seedVocab(words)
      .select(col("piece"), col("seed_mass").as("em_mass"), col("cost"))
    // ground truth: the trainer's E-step on the same vocab
    val dp = UnigramLm.viterbi(words, v).collect()
      .map(r => r.getString(0) ->
        (r.getString(2), r.getDecimal(3))).toMap
    val enc = UnigramLm.encode(docs, "id", "text", v).collect()
      .map(r => r.getLong(0) -> r).toMap
    enc(2L).getString(5) shouldBe dp("banana")._1
    enc(3L).getString(5) shouldBe dp("abab")._1
    // multi-token doc: segs joined by spaces in ORIGINAL token order
    enc(1L).getString(5) shouldBe s"${dp("abab")._1} ${dp("banana")._1}"
    enc(1L).getLong(1) shouldBe 2L // n_tokens
    enc(1L).getLong(3) shouldBe 0L // no unk
    // nll = round(sum of the words' exact DECIMAL costs, 6)
    val want = (dp("abab")._2.add(dp("banana")._2))
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue
    enc(1L).getDouble(4) shouldBe want +- 1e-12
  }

  test("encode: never-seen characters enter as mass-1 unk pieces — the " +
       "word still segments and the unk count is exact") {
    val train = Seq((1L, "abab abba baab")).toDF("id", "text")
    val v = UnigramLm.seedVocab(UnigramLm.dictionary(train))
      .select(col("piece"), col("seed_mass").as("em_mass"), col("cost"))
    // 'q' and 'z' never appeared in training
    val enc = UnigramLm.encode(Seq((9L, "abqz ab")).toDF("id", "text"),
      "id", "text", v).collect()
    enc.length shouldBe 1
    val r = enc.head
    r.getLong(1) shouldBe 2L                 // n_tokens
    r.getLong(3) shouldBe 2L                 // n_unk_pieces: q, z
    r.getString(5) should include("q")
    r.getString(5) should include("z")
    r.getString(5).split(" ").length shouldBe 2
  }
}
