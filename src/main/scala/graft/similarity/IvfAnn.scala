package graft.similarity

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** IVF (inverted-file) approximate nearest neighbors: a coarse quantizer
  * assigns every vector to one of `nLists` cells; a query probes only its
  * `nProbe` nearest cells.
  *
  * This is the third point on the ANN cost/recall curve alongside
  * [[CosineKnn]] (exact, O(corpus) per query) and [[LshAnn]] (hash buckets,
  * no training): IVF trades a one-off training pass for much better bucket
  * balance than LSH on clustered real-world embeddings.
  *
  * Scale design — the FAISS recipe, Spark-shaped: centroids train on a
  * BOUNDED deterministic sample collected to the driver (you never train a
  * quantizer on 100 TB; ~100k sampled vectors suffice for any nLists), and
  * Lloyd's iterations on that sample are microseconds of driver CPU — no
  * per-iteration cluster jobs. Cell assignment is then a pure compiled
  * column expression over broadcast centroid literals (one map pass, no
  * shuffle); search shuffles on cell id only, so every executor scans just
  * its cells' inverted lists.
  */
object IvfAnn {

  /** Lloyd's k-means on a driver-side sample. Deterministic: sample = first
    * `sampleN` vectors by id, init = first k of those. Empty clusters keep
    * their previous centroid. */
  def trainCentroids(vectors: DataFrame, idCol: String, vecCol: String,
                     k: Int, iters: Int = 8,
                     sampleN: Int = 4096): Array[Array[Double]] = {
    val sample = vectors
      .orderBy(col(idCol))
      .limit(sampleN)
      .select(CosineKnn.toDouble(col(vecCol)).as("v"))
      .collect()
      .map(_.getSeq[Double](0).toArray)
    require(sample.length >= k, s"need >= $k sample vectors, got ${sample.length}")
    val dim = sample.head.length
    var cents = sample.take(k).map(_.clone())
    var it = 0
    while (it < iters) {
      val sums = Array.fill(k)(new Array[Double](dim))
      val counts = new Array[Long](k)
      sample.foreach { v =>
        var best = 0
        var bestD = Double.MaxValue
        var c = 0
        while (c < k) {
          var d = 0.0
          var i = 0
          while (i < dim) { val t = v(i) - cents(c)(i); d += t * t; i += 1 }
          if (d < bestD) { bestD = d; best = c }
          c += 1
        }
        var i = 0
        while (i < dim) { sums(best)(i) += v(i); i += 1 }
        counts(best) += 1
      }
      cents = Array.tabulate(k) { c =>
        if (counts(c) == 0) cents(c)
        else { val m = sums(c); var i = 0; while (i < dim) { m(i) /= counts(c); i += 1 }; m }
      }
      it += 1
    }
    cents
  }

  private def litArray(xs: Array[Double]): Column = array(xs.map(lit): _*)

  /** Nearest-centroid cell id as a compiled column expression: argmin over
    * `-2*v.c + c.c` (the `v.v` term is constant per row). Centroid arrays
    * fold to literals — broadcast by the plan itself. */
  def cellColumn(v: Column, cents: Array[Array[Double]]): Column = {
    val scores = cents.map { c =>
      val cc = c.map(x => x * x).sum
      lit(-2.0) * CosineKnn.dot(v, litArray(c)) + lit(cc)
    }
    val arr = array(scores: _*)
    (array_position(arr, array_min(arr)) - lit(1)).cast("int")
  }

  /** Per-query top-k from the probed cells.
    * Output: query_id, neighbor_id, rank, cosine. */
  def topKProbed(vectors: DataFrame, idCol: String, vecCol: String,
                 queryPredicate: Column, k: Int, nLists: Int = 16,
                 nProbe: Int = 2, iters: Int = 8,
                 sampleN: Int = 4096): DataFrame = {
    val cents = trainCentroids(vectors, idCol, vecCol, nLists, iters, sampleN)
    val base = vectors
      .select(col(idCol).as("id"), CosineKnn.toDouble(col(vecCol)).as("v"))
      .withColumn("nrm", sqrt(CosineKnn.dot(col("v"), col("v"))))
      .withColumn("cell", cellColumn(col("v"), cents))

    // nProbe nearest cells per query (same centroid scores, top-n kept)
    val probed = base.filter(queryPredicate)
      .select(col("id").as("query_id"), col("v").as("qv"), col("nrm").as("qn"),
        posexplode(probeCells(col("v"), cents, nProbe)).as(Seq("probe_rank", "cell")))
      .select(col("query_id"), col("qv"), col("qn"), col("cell"))

    val pairs = probed.join(base, Seq("cell"))
      .filter(col("id") =!= col("query_id"))
      .withColumn("cosine",
        CosineKnn.dot(col("qv"), col("v")) / (col("qn") * col("nrm")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("id").asc)
    pairs.withColumn("rank", row_number().over(w).cast("bigint"))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("id").as("neighbor_id"), col("rank"), col("cosine"))
  }

  /** Array of the `nProbe` nearest cell ids, closest first. */
  def probeCells(v: Column, cents: Array[Array[Double]], nProbe: Int): Column = {
    val scored = cents.zipWithIndex.map { case (c, i) =>
      val cc = c.map(x => x * x).sum
      struct((lit(-2.0) * CosineKnn.dot(v, litArray(c)) + lit(cc)).as("score"),
        lit(i).as("cell"))
    }
    slice(transform(array_sort(array(scored: _*)), s => s.getField("cell")),
      1, nProbe)
  }
}
