package graft.similarity

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Distributed PCA, split the way the arithmetic actually scales: the O(n·d²)
  * moment accumulation is a Spark aggregate (the only part that touches the
  * corpus), and the O(d³) eigen step runs on the driver over the d×d result —
  * bounded by construction for embedding-sized d, the same split
  * spark.mllib's RowMatrix.computePrincipalComponents uses.
  *
  * The covariance aggregate shuffles at most d·(d+1)/2 + d rows per map task
  * (partial aggregation collapses each partition to the moment vectors before
  * anything crosses the wire), so the corpus is read exactly once and the
  * shuffle is constant-size regardless of row count. Products fold through
  * DECIMAL(27,12) so the sums are order-independent — the same result on any
  * partitioning, and bit-identical to a single-threaded oracle.
  */
object Pca {

  /** Upper-triangle covariance entries `(i, j, cov)`, 0-based dims, i <= j.
    * cov = E[x_i·x_j] − E[x_i]·E[x_j] (population form). One corpus scan:
    * second moments from a within-row pair explode (codegen pipelines the
    * generate into the partial hash aggregate — the n·d² intermediate never
    * materializes), first moments and the count from two cheap side aggs. */
  def covariance(vectors: DataFrame, vecCol: String): DataFrame = {
    val emb = vectors.select(CosineKnn.toDouble(col(vecCol)).as("v"))
    val ex1 = emb.select(col("v"), posexplode(col("v"))).toDF("v", "i", "xi")
    val s2 = ex1
      .select(col("i"), col("xi"), posexplode(col("v")))
      .toDF("i", "xi", "j", "xj")
      .filter(col("j") >= col("i"))
      .groupBy(col("i"), col("j"))
      .agg(sum((col("xi") * col("xj")).cast("decimal(27,12)")).as("s2"))
    val s1 = emb.select(posexplode(col("v")).as(Seq("i", "xi")))
      .groupBy(col("i"))
      .agg(sum(col("xi").cast("decimal(27,12)")).as("s1"))
    val n = emb.agg(count(lit(1)).cast("double").as("n"))
    s2.join(broadcast(s1.select(col("i"), col("s1").as("s1i"))), "i")
      .join(broadcast(s1.select(col("i").as("j"), col("s1").as("s1j"))), "j")
      .crossJoin(broadcast(n))
      .select(col("i").cast("long").as("i"), col("j").cast("long").as("j"),
        (round(col("s2").cast("double") / col("n") -
          (col("s1i").cast("double") / col("n")) *
          (col("s1j").cast("double") / col("n")), 6) + lit(0.0)).as("cov"))
  }

  /** Dense symmetric matrix from [[covariance]] output rows (driver-side;
    * input is d·(d+1)/2 rows, bounded by the embedding width). */
  def toDense(rows: Array[(Int, Int, Double)], dim: Int): Array[Array[Double]] = {
    val m = Array.fill(dim)(new Array[Double](dim))
    rows.foreach { case (i, j, v) => m(i)(j) = v; m(j)(i) = v }
    m
  }

  /** Leading eigenpair by deterministic power iteration (fixed start vector,
    * fixed round count — no RNG, so every run agrees). Returns
    * (eigenvalue, unit eigenvector). d×d driver work, never sees the corpus. */
  def topEigen(m: Array[Array[Double]], iters: Int = 1000): (Double, Array[Double]) = {
    val d = m.length
    var v = Array.fill(d)(1.0 / math.sqrt(d.toDouble))
    var lambda = 0.0
    var it = 0
    while (it < iters) {
      val w = m.map(row => row.indices.foldLeft(0.0)((acc, k) => acc + row(k) * v(k)))
      val nrm = math.sqrt(w.foldLeft(0.0)((a, x) => a + x * x))
      if (nrm > 0) v = w.map(_ / nrm)
      lambda = nrm
      it += 1
    }
    (lambda, v)
  }

  /** ‖Mv − λv‖ — convergence evidence for [[topEigen]]. */
  def residual(m: Array[Array[Double]], lambda: Double, v: Array[Double]): Double = {
    val r = m.map(row => row.indices.foldLeft(0.0)((acc, k) => acc + row(k) * v(k)))
      .zip(v).map { case (mv, vi) => mv - lambda * vi }
    math.sqrt(r.foldLeft(0.0)((a, x) => a + x * x))
  }
}
