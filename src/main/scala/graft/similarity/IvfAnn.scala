package graft.similarity

import org.apache.spark.ml.clustering.KMeans
import org.apache.spark.ml.functions.array_to_vector
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** IVF (inverted-file) approximate nearest neighbors: a KMeans coarse
  * quantizer assigns every vector to one of `nLists` cells; a query probes
  * only its `nProbe` nearest cells.
  *
  * This is the third point on the ANN cost/recall curve alongside
  * [[CosineKnn]] (exact, O(corpus) per query) and [[LshAnn]] (hash buckets,
  * no training): IVF trades a one-off training pass for much better
  * bucket balance than LSH on clustered real-world embeddings.
  *
  * Scale design: training fits on a sample (KMeans over nLists << corpus);
  * cell assignment is one broadcast-model map pass; search shuffles on
  * cell id only — each (query, cell) pair is independent, so 1000 executors
  * each scan only their cells' inverted lists. Centroids (nLists x dim) are
  * broadcast — tiny. Seeded KMeans keeps runs deterministic.
  */
object IvfAnn {

  /** Per-query top-k from the probed cells.
    * Output: query_id, neighbor_id, rank, cosine. */
  def topKProbed(vectors: DataFrame, idCol: String, vecCol: String,
                 queryPredicate: Column, k: Int, nLists: Int = 16,
                 nProbe: Int = 2, seed: Long = 42L,
                 trainFraction: Double = 1.0): DataFrame = {
    val base = vectors
      .select(col(idCol).as("id"), CosineKnn.toDouble(col(vecCol)).as("v"))
      .withColumn("nrm", sqrt(CosineKnn.dot(col("v"), col("v"))))
      .withColumn("fv", array_to_vector(col("v")))

    val trainSet =
      if (trainFraction >= 1.0) base
      else base.sample(withReplacement = false, trainFraction, seed)
    // Few Lloyd iterations suffice: cells only need rough balance, not
    // converged centroids — recall comes from nProbe, not cell quality.
    val model = new KMeans()
      .setK(nLists).setSeed(seed).setMaxIter(8)
      .setFeaturesCol("fv").setPredictionCol("cell")
      .fit(trainSet)

    val assigned = model.transform(base).drop("fv")

    // centroid table: nLists rows, broadcast everywhere
    val centroids = broadcast(
      assigned.sparkSession.createDataFrame(
        model.clusterCenters.zipWithIndex.toSeq
          .map { case (c, i) => (i, c.toArray) })
        .toDF("cent_cell", "cent"))

    // nProbe nearest cells per query (by euclidean distance to centroid)
    val queries = assigned.filter(queryPredicate)
      .select(col("id").as("query_id"), col("v").as("qv"), col("nrm").as("qn"))
    val probeW = Window.partitionBy(col("query_id"))
      .orderBy(col("cent_dist").asc, col("cent_cell").asc)
    val probed = queries.crossJoin(centroids)
      .withColumn("cent_dist",
        CosineKnn.dot(col("qv"), col("qv")) - lit(2.0) * CosineKnn.dot(col("qv"), col("cent"))
          + CosineKnn.dot(col("cent"), col("cent")))
      .withColumn("probe_rank", row_number().over(probeW))
      .filter(col("probe_rank") <= nProbe)
      .select(col("query_id"), col("qv"), col("qn"), col("cent_cell").as("cell"))

    // search only the probed inverted lists
    val pairs = probed.join(assigned, Seq("cell"))
      .filter(col("id") =!= col("query_id"))
      .withColumn("cosine",
        CosineKnn.dot(col("qv"), col("v")) / (col("qn") * col("nrm")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("id").asc)
    pairs.withColumn("rank", row_number().over(w).cast("bigint"))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("id").as("neighbor_id"), col("rank"), col("cosine"))
  }
}
