package graft.similarity

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.DotProduct

/** Distributed spherical k-means (Lloyd iterations, cosine assignment) —
  * the clustering pass behind SemDeDup-style pruning (q82 groups by
  * transitive similarity; this partitions the WHOLE corpus into k
  * semantic regions), IVF coarse quantizers, and data-map summaries.
  *
  * Deterministic by construction, so the full iteration is
  * oracle-checkable:
  *  - init = the k vectors with smallest id (no RNG; callers wanting
  *    kmeans++-style spread can pre-shuffle ids through
  *    [[graft.functions.StableHash]]);
  *  - assignment = argmax cosine, ties to the smallest centroid id, via
  *    one `max(struct(cos, -j))` aggregate — no window;
  *  - update = per-(cluster, component) means with DECIMAL(27,12) sums
  *    (order-independent on any partitioning — float sums would drift),
  *    then L2 re-normalization.
  *
  * Scale shape (100 TB): centroids are k rows and BROADCAST to every
  * assignment; the per-vector argmax collapses the k-fan-out map-side
  * (partial `max`), so each Lloyd round shuffles one partial row per
  * (vector-partition, cluster, component) — never vectors. Per-round
  * `localCheckpoint` truncates the iterative lineage (k rows). Unlike
  * `ml.clustering.KMeans` (RNG init, float sums, RDD impl), every
  * arithmetic step here is engine-portable.
  */
object KMeansCosine {

  /** L2-normalized view: (idCol, v: unit-norm array<double>). */
  def normalized(df: DataFrame, idCol: String, vecCol: String): DataFrame =
    df.select(col(idCol), CosineKnn.toDouble(col(vecCol)).as("__v0"))
      .withColumn("__nrm", sqrt(DotProduct.dotProduct(col("__v0"), col("__v0"))))
      .select(col(idCol), transform(col("__v0"), x => x / col("__nrm")).as("v"))

  /** Nearest-centroid assignment: (idCol, cluster, cos) against a small
    * (j, c) centroid table. One broadcast + one combinable aggregate. */
  def assign(vh: DataFrame, idCol: String, centroids: DataFrame): DataFrame =
    vh.crossJoin(broadcast(centroids))
      .select(col(idCol), struct(
        DotProduct.dotProduct(col("v"), col("c")).as("cos"),
        (-col("j")).as("negj")).as("sc"))
      .groupBy(col(idCol))
      .agg(max(col("sc")).as("m"))
      .select(col(idCol), (-col("m.negj")).as("cluster"), col("m.cos").as("cos"))

  /** `iters` Lloyd rounds from first-k-ids init; returns the final
    * (j, c) centroid table (j = seed id of the initial centroid). A
    * cluster that loses every member drops out (deterministically on
    * any engine). */
  def fit(df: DataFrame, idCol: String, vecCol: String,
          k: Int, iters: Int): DataFrame = {
    // cache the normalized view across Lloyd rounds: every iteration reads
    // it twice (assignment + update join), so an uncached vh re-scans and
    // re-normalizes the corpus 2x per round — at 100 TB this persist (or a
    // pre-materialized normalized table) is the difference between one
    // corpus read and 2*iters of them. Safe to release after the loop:
    // each round's centroids are localCheckpoint-materialized.
    val vh = normalized(df, idCol, vecCol).persist()
    var cent = vh.orderBy(col(idCol)).limit(k)
      .select(col(idCol).as("j"), col("v").as("c"))
    var i = 0
    while (i < iters) {
      val asg = assign(vh, idCol, cent)
      val sums = asg.join(vh, idCol)
        .select(col("cluster"), posexplode(col("v")).as(Seq("pos", "x")))
        .groupBy(col("cluster"), col("pos"))
        .agg(sum(col("x").cast("decimal(27,12)")).as("s"), count(lit(1)).as("n"))
      cent = sums.groupBy(col("cluster"))
        .agg(sort_array(collect_list(struct(col("pos"),
          (col("s").cast("double") / col("n").cast("double")).as("m")))).as("arr"))
        .select(col("cluster").as("j"),
          transform(col("arr"), s => s.getField("m")).as("m"))
        .withColumn("__cn", sqrt(DotProduct.dotProduct(col("m"), col("m"))))
        .select(col("j"), transform(col("m"), x => x / col("__cn")).as("c"))
        .localCheckpoint(true)
      i += 1
    }
    vh.unpersist(blocking = false)
    cent
  }
}
