package graft.similarity

import scala.util.Random

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Random-hyperplane LSH for approximate nearest neighbors at scale.
  *
  * Sign-random-projection: `nBits` fixed hyperplanes (deterministic seed)
  * map each vector to a bucket key; cosine-close vectors land in the same
  * bucket with probability 1 - theta/pi per bit. Search only compares within
  * the query's bucket — the corpus-side shuffle is a hash partition on
  * bucket id, and per-bucket candidate lists are small and independent
  * (embarrassingly parallel across 1000 executors).
  *
  * Bucketing loses recall vs [[CosineKnn]] brute force (the trade the
  * operator exists to make); multi-probe = lower nBits or several hash
  * tables unioned.
  */
object LshAnn {

  /** Deterministic hyperplanes: dim x nBits coefficients in [-1,1). */
  def hyperplanes(dim: Int, nBits: Int, seed: Long = 42L): Array[Array[Double]] = {
    val rnd = new Random(seed)
    Array.fill(nBits)(Array.fill(dim)(rnd.nextDouble() * 2 - 1))
  }

  /** Bucket key column: sign bits packed into a long. */
  def bucket(vec: Column, planes: Array[Array[Double]]): Column = {
    val bits = planes.zipWithIndex.map { case (plane, i) =>
      val planeCol = array(plane.map(lit): _*)
      val d = CosineKnn.dot(vec, planeCol)
      when(d >= 0, lit(1L) * lit(1L << i)).otherwise(lit(0L))
    }
    bits.reduce(_ + _)
  }

  /** Per-query top-k within the query's LSH bucket.
    * Output: query_id, neighbor_id, rank, cosine. */
  def topKBucketed(vectors: DataFrame, idCol: String, vecCol: String,
                   queryPredicate: Column, k: Int, nBits: Int = 8,
                   dim: Int = 64, seed: Long = 42L): DataFrame = {
    val planes = hyperplanes(dim, nBits, seed)
    val base = vectors
      .select(col(idCol).as("id"), CosineKnn.toDouble(col(vecCol)).as("v"))
      .withColumn("nrm", sqrt(CosineKnn.dot(col("v"), col("v"))))
      .withColumn("bkt", bucket(col("v"), planes))
    val queries = broadcast(base.filter(queryPredicate)
      .select(col("id").as("query_id"), col("v").as("qv"),
        col("nrm").as("qn"), col("bkt").as("qbkt")))
    val pairs = queries
      .join(base, col("bkt") === col("qbkt") && col("id") =!= col("query_id"))
      .withColumn("cosine",
        CosineKnn.dot(col("qv"), col("v")) / (col("qn") * col("nrm")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("id").asc)
    pairs.withColumn("rank", row_number().over(w).cast("bigint"))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("id").as("neighbor_id"), col("rank"), col("cosine"))
  }
}
