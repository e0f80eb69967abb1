package graft

import org.apache.spark.sql.functions._

import graft.similarity.{CosineKnn, IvfAnn, LshAnn, MinHashLsh, Pca}

class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  test("Als.solve matches the Sherman-Morrison closed form for a single rating") {
    import org.apache.spark.sql.functions._
    import graft.similarity.Als
    // one user, one rating: (qq^T + λI)^{-1} q r  ==  q r / (|q|² + λ),
    // an independent derivation of the same solve (rank-1 update identity)
    val q0 = BigDecimal("1.200000000"); val q1 = BigDecimal("0.700000000")
    val r = 5L
    val ratings = Seq((1L, 10L)).toDF("u", "i")
      .select($"u", $"i", lit(r).cast("decimal(9,0)").as("r"))
    val factors = Seq((10L, q0, q1)).toDF("i", "f0", "f1")
      .select($"i", $"f0".cast("decimal(18,9)").as("f0"),
        $"f1".cast("decimal(18,9)").as("f1"))
    val got = Als.solve(ratings, "i", "u", factors)
      .select($"f0".cast("double"), $"f1".cast("double"))
      .as[(Double, Double)].collect().head
    val scale = r.toDouble / ((q0 * q0 + q1 * q1).toDouble + Als.Lambda)
    got._1 shouldBe (q0.toDouble * scale) +- 1e-8 // nano-quantized
    got._2 shouldBe (q1.toDouble * scale) +- 1e-8
  }

  test("MinHashLsh candidates superset the high-jaccard pairs it reports") {
    val docs = graft.tables.Tables.documents(spark, dir)
    val pairs = MinHashLsh.nearDuplicatePairs(docs, "doc_id", "text",
      shingleN = 3, bands = 8, rowsPerBand = 2, threshold = 0.5).collect()
    pairs.foreach { r =>
      r.getDouble(2) should be >= 0.5
      r.getLong(0) should be < r.getLong(1)
    }
  }

  test("r>=2 banding bounds the candidate set far below all-pairs") {
    val docs = graft.tables.Tables.documents(spark, dir)
    val n = docs.count()
    val sets = docs.select(col("doc_id"),
      graft.text.TextOps.shingles(col("text"), 3).as("shingle_set"))
    val nCand = MinHashLsh.candidatePairs(sets, "doc_id",
      bands = 16, rowsPerBand = 4, maxBucket = Some(100)).count()
    val allPairs = n * (n - 1) / 2
    // r=4 rows per band: dissimilar pairs need 4 simultaneous minhash
    // collisions to become candidates — the set must stay a tiny fraction
    // of all-pairs (r=1 banding admitted most of them).
    nCand should be < allPairs / 20
  }

  test("maxBucket drops oversized band buckets from the candidate join") {
    import spark.implicits._
    // 30 docs sharing one text → every band bucket has size 30
    val clones = (1L to 30L).map(i => (i, "the same boilerplate text repeated here"))
      .toDF("doc_id", "text")
    val sets = clones.select(col("doc_id"),
      graft.text.TextOps.shingles(col("text"), 3).as("shingle_set"))
    MinHashLsh.candidatePairs(sets, "doc_id", bands = 4, rowsPerBand = 2,
      maxBucket = Some(10)).count() shouldBe 0L
    MinHashLsh.candidatePairs(sets, "doc_id", bands = 4, rowsPerBand = 2,
      maxBucket = None).count() shouldBe 30L * 29 / 2
  }

  test("index path equals the batch-vs-corpus slice of the full pipeline") {
    val docs = graft.tables.Tables.documents(spark, dir)
    val isBatch = col("doc_id") % 10 === 0
    val corpusFps = MinHashLsh.fingerprints(docs.filter(!isBatch), "doc_id", "text")
    val corpusBands = MinHashLsh.bandIndex(corpusFps, "doc_id")
    val incremental = MinHashLsh.nearDuplicatesAgainstIndex(
        corpusFps, corpusBands, docs.filter(isBatch), "doc_id", "text",
        threshold = 0.5, maxBucket = Some(100))
      .select("corpus_id", "batch_id").as[(Long, Long)].collect().toSet
    // ground truth: the full all-docs pipeline, restricted to pairs that
    // cross the corpus/batch boundary (same band constants + bucket cap)
    val full = MinHashLsh.nearDuplicatePairs(docs, "doc_id", "text",
        threshold = 0.5, maxBucket = Some(100))
      .select("id_a", "id_b").as[(Long, Long)].collect()
      .filter { case (a, b) => (a % 10 == 0) != (b % 10 == 0) }
      .map { case (a, b) => if (a % 10 == 0) (b, a) else (a, b) }.toSet
    incremental shouldBe full
    incremental should not be empty
  }

  test("index path edges: empty batch, batch with no near-dups, cap spans sides") {
    import spark.implicits._
    val corpus = Seq(
      (1L, "alpha beta gamma delta epsilon zeta"),
      (2L, "alpha beta gamma delta epsilon zeta"),
      (3L, "totally unrelated content lives here now")).toDF("doc_id", "text")
    val cfps = MinHashLsh.fingerprints(corpus, "doc_id", "text")
    val cbands = MinHashLsh.bandIndex(cfps, "doc_id")
    // empty batch -> no pairs, no failure
    val empty = Seq.empty[(Long, String)].toDF("doc_id", "text")
    MinHashLsh.nearDuplicatesAgainstIndex(cfps, cbands, empty, "doc_id", "text")
      .count() shouldBe 0L
    // a batch duplicating corpus doc 1 finds exactly docs 1 and 2
    val batch = Seq((10L, "alpha beta gamma delta epsilon zeta")).toDF("doc_id", "text")
    MinHashLsh.nearDuplicatesAgainstIndex(cfps, cbands, batch, "doc_id", "text")
      .select("corpus_id").as[Long].collect().sorted shouldBe Array(1L, 2L)
    // combined-side cap: 2 corpus + 1 batch copies of one text = bucket of
    // 3 on every band; cap 2 drops them all -> no candidates
    MinHashLsh.nearDuplicatesAgainstIndex(cfps, cbands, batch, "doc_id", "text",
      maxBucket = Some(2)).count() shouldBe 0L
  }

  test("LshAnn maxBucket drops a degenerate embedding bucket before the pair join") {
    import spark.implicits._
    // 20 near-identical embeddings (the SemDeDup worst case: a dup-heavy
    // corpus piles into ONE band bucket per table → s^2/2 candidate pairs)
    val vec = Array.tabulate(64)(i => 0.3f + i * 0.01f)
    val clones = (1L to 20L).map(i => (i, vec)).toDF("vec_id", "embedding")
    LshAnn.pairsAbove(clones, "vec_id", "embedding", threshold = 0.9,
      maxBucket = Some(10)).count() shouldBe 0L
    LshAnn.pairsAbove(clones, "vec_id", "embedding", threshold = 0.9,
      maxBucket = None).count() shouldBe 20L * 19 / 2
    // a non-degenerate corpus is untouched by a cap above its bucket sizes
    val emb = graft.tables.Tables.embeddings(spark, dir)
    val uncapped = LshAnn.pairsAbove(emb, "vec_id", "embedding", threshold = 0.35)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val capped = LshAnn.pairsAbove(emb, "vec_id", "embedding", threshold = 0.35,
        maxBucket = Some(200))
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    capped shouldBe uncapped
    capped should not be empty
  }

  test("DedupIndex round-trips disk: build -> dedup -> append -> dedup sees the appended batch") {
    import spark.implicits._
    import graft.similarity.DedupIndex
    val path = java.nio.file.Files.createTempDirectory("dedup-index-spec").toString
    val corpus = Seq(
      (1L, "alpha beta gamma delta epsilon zeta"),
      (2L, "one two three four five six seven")).toDF("doc_id", "text")
    DedupIndex.build(corpus, "doc_id", "text", path)
    DedupIndex.manifest(spark, path) shouldBe DedupIndex.Manifest(3, 16, 4, 8,
      idCol = "doc_id", fpsDdl = "doc_id BIGINT,shingle_set ARRAY<STRING>",
      bandsDdl = "doc_id BIGINT,band STRING")
    // batch 1 duplicates corpus doc 1
    val b1 = Seq((10L, "alpha beta gamma delta epsilon zeta")).toDF("doc_id", "text")
    DedupIndex.dedupBatch(spark, path, b1, "doc_id", "text")
      .select("corpus_id", "batch_id").as[(Long, Long)].collect() shouldBe Array((1L, 10L))
    DedupIndex.append(b1, "doc_id", "text", path)
    // batch 2 duplicates BATCH 1's doc — only findable if the append landed
    val b2 = Seq((20L, "alpha beta gamma delta epsilon zeta")).toDF("doc_id", "text")
    DedupIndex.dedupBatch(spark, path, b2, "doc_id", "text")
      .select("corpus_id", "batch_id").as[(Long, Long)].collect()
      .sorted shouldBe Array((1L, 20L), (10L, 20L))
    // index tables grew by exactly the batch: 3 fingerprint rows total
    DedupIndex.load(spark, path)._1.count() shouldBe 3L
  }

  test("containment catches a subset pair that jaccard-LSH dedup misses") {
    val words = (0 until 120).map(i => s"w${i * 7 % 113}q${i}z")
    val host = words.mkString(" ")                 // 120 tokens
    val quoted = words.slice(30, 80).mkString(" ") // contiguous 50-token span
    val other = (0 until 100).map(i => s"u${i}k").mkString(" ")
    val docs = Seq((10L, quoted), (20L, host), (30L, other)).toDF("id", "text")

    val pairs = graft.similarity.Containment
      .containmentPairs(docs, "id", "text")
      .select(col("id_a"), col("id_b"), col("containment"), col("jaccard"))
      .as[(Long, Long, Double, Double)].collect()
    pairs.map(p => (p._1, p._2)).toSet shouldBe Set((10L, 20L))
    val (_, _, cont, jac) = pairs.head
    cont shouldBe 1.0 // every shingle of the quoted span is in the host
    jac should be < 0.5 // ...but jaccard scores the pair below dedup cut

    // the jaccard-verified q27 pipeline reports nothing here — the metric
    // (not just the candidate path) is what misses subset pairs
    MinHashLsh.nearDuplicatePairs(docs, "id", "text", threshold = 0.5)
      .count() shouldBe 0L
  }

  test("containment fpFreqCap drops boilerplate fingerprints before the self-join") {
    // 60 copies of one template: every fingerprint appears in 60 docs,
    // far over a cap of 50, so no candidate pairs survive — the guard
    // that keeps a degenerate template from exploding quadratically
    val tmpl = (0 until 80).map(i => s"t${i}v").mkString(" ")
    val docs = (0L until 60L).map(i => (i, tmpl)).toDF("id", "text")
    graft.similarity.Containment.containmentPairs(docs, "id", "text")
      .count() shouldBe 0L
  }

  test("brute-force topK is self-consistent: rank 1 has max cosine") {
    val emb = graft.tables.Tables.embeddings(spark, dir)
    val knn = CosineKnn.topK(emb, "vec_id", "embedding", col("id") < 5, k = 3)
      .collect().groupBy(_.getLong(0))
    knn.foreach { case (_, rows) =>
      val byRank = rows.sortBy(_.getLong(2))
      byRank.map(_.getDouble(3)).toSeq shouldBe
        byRank.map(_.getDouble(3)).sortBy(-_).toSeq
    }
  }

  test("IVF ANN achieves high recall@3 vs brute force on clustered data") {
    val emb = graft.tables.Tables.embeddings(spark, dir)
    val exact = CosineKnn.topK(emb, "vec_id", "embedding", col("id") < 20, k = 3)
      .collect().groupBy(_.getLong(0))
      .view.mapValues(_.map(_.getLong(1)).toSet).toMap
    val ivf = IvfAnn.topKProbed(emb, "vec_id", "embedding", col("id") < 20,
        k = 3, nLists = 8, nProbe = 3)
      .collect().groupBy(_.getLong(0))
      .view.mapValues(_.map(_.getLong(1)).toSet).toMap
    val recalls = exact.map { case (q, truth) =>
      ivf.getOrElse(q, Set.empty).intersect(truth).size.toDouble / truth.size
    }
    (recalls.sum / recalls.size) should be >= 0.6
  }

  test("LSH buckets agree with brute force on the easiest neighbor") {
    val emb = graft.tables.Tables.embeddings(spark, dir)
    val lsh = LshAnn.topKBucketed(emb, "vec_id", "embedding", col("id") < 10,
      k = 1, nBits = 2)
    // with 2 bits (4 buckets) nearly everything is probed; rank-1 must be
    // a genuinely high-cosine neighbor
    lsh.collect().foreach(r => r.getDouble(3) should be > 0.0)
  }

  test("Pca.topEigen converges on the distributed covariance (residual ~ 0)") {
    val cov = Pca.covariance(graft.tables.Tables.embeddings(spark, dir),
        "embedding")
      .collect()
      .map(r => (r.getLong(0).toInt, r.getLong(1).toInt, r.getDouble(2)))
    val m = Pca.toDense(cov, 64)
    val (lambda, v) = Pca.topEigen(m)
    lambda should be > 0.0
    // unit eigenvector, Mv = lambda v to within power-iteration tolerance
    math.sqrt(v.map(x => x * x).sum) shouldBe 1.0 +- 1e-9
    Pca.residual(m, lambda, v) should be < 1e-8
    // leading component explains a sane share of total variance
    val trace = (0 until 64).map(i => m(i)(i)).sum
    lambda / trace should (be > 0.0 and be <= 1.0)
  }

  test("Pca.topEigen matches a dense two-dim hand case") {
    // cov [[2,1],[1,2]] -> eigenvalues 3 and 1, leading vector (1,1)/sqrt2
    val m = Array(Array(2.0, 1.0), Array(1.0, 2.0))
    val (lambda, v) = Pca.topEigen(m)
    lambda shouldBe 3.0 +- 1e-9
    math.abs(v(0)) shouldBe (1.0 / math.sqrt(2.0)) +- 1e-9
    math.abs(v(1)) shouldBe (1.0 / math.sqrt(2.0)) +- 1e-9
  }

  test("RpTree median splits produce balanced leaves (±1 per level)") {
    val base = graft.tables.Tables.embeddings(spark, dir)
      .select(col("vec_id").as("id"),
        CosineKnn.toDouble(col("embedding")).as("v"))
    val n = base.count()
    val leaves = graft.similarity.RpTree.assignLeaves(base, depth = 3)
      .groupBy(col("leaf")).count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    leaves.keySet should have size 8 // all 2^3 leaves populated
    // each median split is floor/ceil-balanced, so leaf sizes differ by
    // at most 1 from n/8 after three levels
    leaves.values.foreach { c =>
      c should (be >= n / 8 - 1L and be <= n / 8 + 2L)
    }
    // sign-LSH over the same planes has no such guarantee — this is the
    // operator's reason to exist
    leaves.values.sum shouldBe n
  }

  test("RpTree routing is deterministic across invocations") {
    val base = graft.tables.Tables.embeddings(spark, dir)
      .select(col("vec_id").as("id"),
        CosineKnn.toDouble(col("embedding")).as("v"))
    val a = graft.similarity.RpTree.assignLeaves(base, depth = 3)
      .select("id", "leaf").collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val b = graft.similarity.RpTree.assignLeaves(base, depth = 3)
      .select("id", "leaf").collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    a shouldBe b
  }

  test("MediaCodec.dHash: near-dup PNGs (same seed, 1-bit perturbation) land " +
       "within Hamming 6; distinct seeds are far; bits replay arithmetically") {
    import graft.multimodal.{MediaCodec, Multimodal}
    // encode real PNGs on the driver, hash them distributed
    val recs = Seq(
      Multimodal.MediaRecord(0L, Multimodal.encodePngPerturbed(25, 20, 7L, perturb = false), "image/png", "t"),
      Multimodal.MediaRecord(1L, Multimodal.encodePngPerturbed(25, 20, 7L, perturb = true), "image/png", "t"),
      Multimodal.MediaRecord(2L, Multimodal.encodePngPerturbed(25, 20, 8L, perturb = false), "image/png", "t"),
      Multimodal.MediaRecord(3L, Array[Byte](1, 2, 3), "image/png", "t")).toDS()
    val hs = MediaCodec.dHash(recs).collect().map(h => h.media_id -> h.dhash).toMap
    assert(hs.size == 3, "undecodable payload dropped")
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(ham(hs(0L), hs(1L)) <= 6, s"near-dup pair too far: ${ham(hs(0L), hs(1L))}")
    assert(ham(hs(0L), hs(2L)) > 6, s"distinct seeds too close: ${ham(hs(0L), hs(2L))}")
    // replay the pristine image's dHash from the planted pixel function —
    // proves the decode→sample→grayscale→compare chain is the documented
    // arithmetic, not incidental codec behavior
    val (w, h, seed) = (25, 20, 7L)
    def gray(i: Int, j: Int): Int = {
      val x = i * w / 9; val y = j * h / 8
      val u = (seed * 2654435761L + x * 31L + y * 131L) % 16777213L
      val v = ((u * u) % 16777213L).toInt
      (((v >> 16) & 0xff) * 299 + ((v >> 8) & 0xff) * 587 + (v & 0xff) * 114) / 1000
    }
    var expected = 0L
    for (j <- 0 until 8; i <- 0 until 8)
      if (gray(i, j) > gray(i + 1, j)) expected |= 1L << (j * 8 + i)
    assert(hs(0L) == expected, "dHash must equal the arithmetic replay")
  }

  test("MediaCodec.audioFingerprint: near-dup clips (same seed, +1 even-" +
       "sample perturbation) land within Hamming 4; distinct seeds are " +
       "far; sub-33-sample clips drop; bits replay arithmetically") {
    import graft.multimodal.{MediaCodec, Multimodal}
    def clip(seed: Long, n: Int, perturb: Boolean) =
      Multimodal.encodeWav(8000,
        Array.tabulate(n)(t => Multimodal.plantedSample(seed, t, perturb)))
    val recs = Seq(
      Multimodal.MediaRecord(0L, clip(11L, 90, perturb = false), "audio/wav", "t"),
      Multimodal.MediaRecord(1L, clip(11L, 90, perturb = true), "audio/wav", "t"),
      Multimodal.MediaRecord(2L, clip(12L, 90, perturb = false), "audio/wav", "t"),
      Multimodal.MediaRecord(3L, clip(13L, 32, perturb = false), "audio/wav", "t"),
      Multimodal.MediaRecord(4L, "junk".getBytes("UTF-8"), "audio/wav", "t")).toDS()
    val fps = MediaCodec.audioFingerprint(recs).collect()
      .map(p => p.media_id -> p.fp).toMap
    // <33 samples (no stable windowing) and undecodable both dropped
    fps.keySet shouldBe Set(0L, 1L, 2L)
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(ham(fps(0L), fps(1L)) <= 4,
      s"near-dup clip too far: ${ham(fps(0L), fps(1L))}")
    assert(ham(fps(0L), fps(2L)) >= 8,
      s"distinct seeds too close: ${ham(fps(0L), fps(2L))}")
    // replay the pristine clip's fingerprint from the planted sample
    // function — proves decode→window→energy→compare is the documented
    // arithmetic (the q385 oracle's replay, in miniature)
    val n = 90
    val e = new Array[Long](33)
    for (t <- 0 until n) {
      val s = Multimodal.plantedSample(11L, t, perturb = false).toLong
      e((t.toLong * 33 / n).toInt) += s * s
    }
    var expected = 0L
    for (w <- 0 until 32) if (e(w + 1) > e(w)) expected |= 1L << w
    assert(fps(0L) == expected, "fingerprint must equal the arithmetic replay")
  }

  test("BandedHamming: pigeonhole recall within nBands-1 bits, Hamming " +
       "cutoff enforced, degenerate buckets capped, index variant agrees") {
    import graft.similarity.BandedHamming
    val codes = Seq(
      10L -> 0x1234567890abcdefL,
      11L -> (0x1234567890abcdefL ^ 0x3L),      // 2 bits, one band -> found
      12L -> (0x1234567890abcdefL ^ 0x10001L),  // 2 bits across 2 of 4 bands -> found
      13L -> (0x1234567890abcdefL ^ 0x7fL),     // 7 bits from 10 -> cut; 5 from 11 -> kept
      20L -> 0x5555555555555555L
    ).toDF("id", "code")
    val pairs = BandedHamming.nearDuplicatePairs(codes, "id", "code",
        nBands = 4, bandBits = 16, maxHamming = 6)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    pairs.keySet shouldBe Set((10L, 11L), (10L, 12L), (11L, 12L), (11L, 13L))
    pairs((10L, 11L)) shouldBe 2L
    pairs((10L, 12L)) shouldBe 2L
    // (11,12): differs by 0x3 ^ 0x10001
    pairs((11L, 12L)) shouldBe java.lang.Long.bitCount(0x3L ^ 0x10001L).toLong
    pairs((11L, 13L)) shouldBe java.lang.Long.bitCount(0x3L ^ 0x7fL).toLong
    // a degenerate bucket (many identical codes) is dropped by the cap —
    // identical codes pair ONLY through their shared buckets, so capping
    // removes all of them; the distinct near-dup pair elsewhere survives
    val degen = (0 until 50).map(i => (100L + i) -> 0L) ++
      Seq(200L -> 0x00ff00ff00ff00ffL, 201L -> 0x00ff00ff00ff00feL)
    val capped = BandedHamming.nearDuplicatePairs(
        degen.toDF("id", "code"), "id", "code",
        nBands = 4, bandBits = 16, maxHamming = 6, maxBucket = Some(10))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    capped shouldBe Set((200L, 201L))
    // index variant: batch codes vs the persisted corpus band frame give
    // the same verified pairs as a self-join restricted across sides
    val corpus = Seq(10L -> 0x1234567890abcdefL, 20L -> 0x5555555555555555L)
      .toDF("id", "code")
    val corpusBands = BandedHamming.bandKeys(corpus, "id", "code", 4, 16)
    val batch = Seq(31L -> (0x1234567890abcdefL ^ 0x3L)).toDF("id", "code")
    val hits = BandedHamming.pairsAgainstIndex(corpusBands, batch,
        "id", "code", nBands = 4, bandBits = 16, maxHamming = 6)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    hits shouldBe Map((10L, 31L) -> 2L)
  }
}
