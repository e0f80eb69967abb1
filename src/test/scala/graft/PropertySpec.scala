package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.dq._

/** Property-style invariants over generated inputs (raw ScalaCheck Gen —
  * the scalatest bridge isn't on the offline classpath). Fixed seeds keep
  * failures reproducible. */
class PropertySpec extends SparkSpec {

  private def samples[A](g: Gen[A], n: Int, seed: Long = 42L): Seq[A] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(seed + i)))

  test("registry version sort is numeric for any version set (v10 > v9)") {
    import java.nio.file.{Files, Paths}
    samples(Gen.nonEmptyListOf(Gen.choose(1, 500)), 20).foreach { vs =>
      val base = tmpDir("prop")
      val dir = Paths.get(base, "d", "s")
      Files.createDirectories(dir)
      val schema = org.apache.spark.sql.types.StructType(
        Seq(org.apache.spark.sql.types.StructField("id",
          org.apache.spark.sql.types.LongType)))
      vs.distinct.foreach(v => Files.writeString(dir.resolve(s"v$v.json"), schema.json))
      val reg = new graft.schema.SchemaRegistry(base)
      reg.listVersions("d", "s") shouldBe vs.distinct.sorted
      reg.latestVersion("d", "s") shouldBe Some(vs.max)
    }
  }

  test("RangeCheck violations match the reference count for any data") {
    import spark.implicits._
    samples(Gen.nonEmptyListOf(Gen.option(Gen.choose(-100.0, 100.0))), 8)
      .foreach { xs =>
        val df = xs.toDF("x")
        val summary = DQRuleSet(Seq(RangeCheck("x", Some(-10.0), Some(10.0)))).run(df)
        val expected = xs.flatten.count(v => v < -10.0 || v > 10.0)
        summary.results.head.violations shouldBe expected
      }
  }

  test("ModalCount equals the naive max-multiplicity on any token array") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val arrGen = Gen.listOf(Gen.oneOf("a", "b", "c", "dd", "e f", "", "ü"))
    val arrays = samples(arrGen, 60)
    val df = arrays.zipWithIndex.map { case (a, i) => (i.toLong, a) }.toDF("id", "arr")
      .select(col("id"), graft.functions.ModalCount.modalCount(col("arr")).as("m"))
    val got = df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    arrays.zipWithIndex.foreach { case (a, i) =>
      val expected =
        if (a.isEmpty) 0L else a.groupBy(identity).values.map(_.size).max.toLong
      got(i.toLong) shouldBe expected
    }
  }

  test("EntropyTermSum equals the quantized reference sum on any token array") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    import java.math.{BigDecimal => JBD, RoundingMode}
    val arrGen = Gen.nonEmptyListOf(Gen.oneOf("x", "y", "z", "w1", "w2"))
    val arrays = samples(arrGen, 60)
    val df = arrays.zipWithIndex.map { case (a, i) => (i.toLong, a) }.toDF("id", "arr")
      .select(col("id"),
        graft.functions.EntropyTermSum.entropyTermSum(col("arr")).as("s"))
    val got = df.collect()
      .map(r => r.getLong(0) -> r.getDecimal(1).stripTrailingZeros).toMap
    arrays.zipWithIndex.foreach { case (a, i) =>
      val expected = a.groupBy(identity).values.map(_.size)
        .filter(_ > 1)
        .foldLeft(JBD.ZERO) { (acc, c) =>
          acc.add(JBD.valueOf(c.toDouble * Math.log(c.toDouble))
            .setScale(12, RoundingMode.HALF_UP))
        }
      got(i.toLong) shouldBe expected.stripTrailingZeros
    }
  }

  test("rolling hash stays within [0, 2^31-1), is stable, and matches Spark") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val strs = samples(Gen.asciiPrintableStr, 40).distinct
    def fold(t: String): Long = t.codePoints().toArray
      .foldLeft(0L)((a, c) => (a * 131 + c) % 2147483647L)
    strs.foreach { s =>
      val h = fold(s)
      h should be >= 0L
      h should be < 2147483647L
    }
    val viaSpark = strs.toDF("s")
      .select(col("s"), functions.RollingHash.rollingHash(col("s")).as("h"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    strs.foreach(s => viaSpark(s) shouldBe fold(s))
  }

  test("Quarantine split partitions rows exactly for any violation pattern") {
    import spark.implicits._
    samples(Gen.nonEmptyListOf(Gen.choose(-50L, 50L)), 8).foreach { xs =>
      val df = xs.toDF("v")
      val checks = Seq(RangeCheck("v", Some(0.0), None))
      val (clean, bad) = Quarantine.split(df, checks)
      clean.count() + bad.count() shouldBe xs.length.toLong
      val cleanVals = clean.as[Long].collect()
      cleanVals.foreach(_ should be >= 0L)
      bad.select("v").as[Long].collect().foreach(_ should be < 0L)
    }
  }

  test("CMS estimate is one-sided (est >= exact) on any token multiset") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val toksGen = Gen.nonEmptyListOf(Gen.oneOf(
      "a", "b", "c", "dd", "e", "f", "gg", "h", "ü", "long-token"))
    samples(toksGen, 6).foreach { toks =>
      val df = toks.toDF("tok")
      val cms = graft.functions.CountMinSketch.counters(df, "tok",
        depth = 3, width = 8) // tiny width forces collisions: the bound
                              // must hold anyway
      val est = graft.functions.CountMinSketch.estimate(
          df.distinct(), "tok", cms, depth = 3, width = 8)
        .as[(String, Long)].collect().toMap
      val exact = toks.groupBy(identity).view.mapValues(_.size.toLong)
      exact.foreach { case (t, c) => est(t) should be >= c }
    }
  }

  test("Pca.covariance equals the naive driver computation on any vectors") {
    import spark.implicits._
    val dim = 4
    val vecGen = Gen.listOfN(dim, Gen.choose(-5.0f, 5.0f))
    samples(Gen.nonEmptyListOf(vecGen), 4).foreach { vs =>
      val df = vs.map(v => Tuple1(v.toArray)).toDF("embedding")
      val got = graft.similarity.Pca.covariance(df, "embedding")
        .collect()
        .map(r => (r.getLong(0).toInt, r.getLong(1).toInt) -> r.getDouble(2))
        .toMap
      val n = vs.size.toDouble
      val xs = vs.map(_.map(_.toDouble))
      for (i <- 0 until dim; j <- i until dim) {
        val eij = xs.map(v => v(i) * v(j)).sum / n
        val ei = xs.map(_(i)).sum / n
        val ej = xs.map(_(j)).sum / n
        got((i, j)) shouldBe (eij - ei * ej) +- 1e-4 // 6-dp round + decimal
                                                     // quantization slack
      }
    }
  }

  test("Ivm: folded signed batches equal recompute for any waves and deletes") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    import graft.transform.Ivm
    // (key, value, insert wave 0-2, retracted afterwards?)
    val gen = Gen.nonEmptyListOf(Gen.zip(
      Gen.choose(0, 5), Gen.choose(1L, 100L), Gen.choose(0, 2),
      Gen.oneOf(true, false)))
    samples(gen, 5, seed = 11L).foreach { rows =>
      def delta(rs: Seq[(Int, Long)], sign: org.apache.spark.sql.DataFrame
          => org.apache.spark.sql.DataFrame) =
        Ivm.viewDelta(sign(rs.toDF("k", "v")), Seq("k"), Seq("sv" -> col("v")))
      val deltas = (0 until 3).map(w =>
        delta(rows.filter(_._3 == w).map(r => (r._1, r._2)), Ivm.inserts)) :+
        delta(rows.filter(_._4).map(r => (r._1, r._2)), Ivm.retracts)
      val folded = Ivm.merge(deltas.reduce(_ unionByName _), Seq("k"))
        .select($"k", $"n_rows", $"sv".cast("long"))
        .as[(Int, Long, Long)].collect().toSet
      val kept = rows.filterNot(_._4)
      val expect = kept.groupBy(_._1).map { case (k, vs) =>
        (k, vs.size.toLong, vs.map(_._2).sum) }.toSet
      folded shouldBe expect
    }
  }

  test("QDigest: rank bound and mass conservation on arbitrary distributions") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    import graft.functions.QDigest
    val gen = Gen.nonEmptyListOf(Gen.oneOf(
      Gen.choose(0L, 50L), Gen.choose(0L, 1000000L), Gen.const(7L)))
    samples(gen, 4, seed = 23L).foreach { vs =>
      val digest = vs.toDF("v").repartition(5)
        .agg(QDigest.sketch(col("v"))).collect()(0).getStruct(0)
      val n = digest.getLong(0)
      n shouldBe vs.size.toLong
      val nodes = digest.getSeq[org.apache.spark.sql.Row](1)
        .map(r => (r.getLong(0), r.getLong(1)))
      nodes.map(_._2).sum shouldBe n
      val sorted = vs.sorted
      for (q <- Seq(0.1, 0.5, 0.9)) {
        val est = QDigest.quantile(nodes, n, q)
        val rank = sorted.count(_ <= est).toLong
        val target = math.max(1L, math.ceil(q * n).toLong)
        math.abs(rank - target) should be <= QDigest.rankBound(n)
      }
    }
  }

  test("driver contract: every query has an oracle — zero asterisks") {
    // r6 closed the last two rows-only queries: q28 now emits the
    // permutation-invariant SimHash projections (popcount + partner
    // Hamming) and q38 its pinnable IVF recall curve. Any NEW query
    // landing without an oracle must be an explicit decision, not an
    // oversight — this guard makes the drift loud.
    val queries = graft.queries.Queries.all.keySet
    val oracles = Oracles.sql.keySet
    (queries -- oracles) shouldBe empty
    // and no orphan oracle points at a query that doesn't exist
    (oracles -- queries) shouldBe empty
  }
}
