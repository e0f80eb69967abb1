package graft.transform

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Silver-layer deduplication (reference declares it as a future capability:
  * `schemas/music_school/cdc/README.md` "Silver Layer (Future)",
  * `docs/00-architecture-overview.md:223-232`; never implemented).
  *
  * Scale notes: `latestByKey` is one hash-shuffle on the key columns; the
  * window scans each partition once (no sort-spill when the per-key group
  * fits memory — keys here are user/entity ids, so groups are tiny). At
  * 100 TB with a skewed key, pre-aggregate with `max_by` instead — provided
  * as `latestByKeyAgg`, which enables partial (map-side) aggregation and is
  * robust to key skew.
  */
object Dedup {

  /** Keep the newest row per key, deterministic via tiebreak columns. */
  def latestByKey(df: DataFrame, keys: Seq[String],
                  orderBy: Seq[Column]): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(orderBy: _*)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }

  /** Agg-based variant: map-side combinable, skew-tolerant. Keeps the row
    * with max (orderCol, tiebreak) per key via max_by on a packed struct. */
  def latestByKeyAgg(df: DataFrame, keys: Seq[String], orderCol: String,
                     tiebreak: String): DataFrame = {
    val payload = struct(df.columns.map(col): _*)
    val ord = struct(col(orderCol), col(tiebreak))
    df.groupBy(keys.map(col): _*)
      .agg(max_by(payload, ord).as("__row"))
      .select(col("__row.*"))
  }

  /** Exact duplicate removal on a full row or column subset. */
  def exact(df: DataFrame, columns: Seq[String] = Seq.empty): DataFrame =
    if (columns.isEmpty) df.distinct() else df.dropDuplicates(columns)

  /** Content dedup: keep one representative (min of `idCol`) per value of
    * `contentHash` (e.g. md5 of normalized text). One shuffle on the hash. */
  def byContentHash(df: DataFrame, contentHash: Column, idCol: String): DataFrame = {
    val payload = struct(df.columns.map(col): _*)
    df.groupBy(contentHash.as("__h"))
      .agg(min_by(payload, col(idCol)).as("__row"), count(lit(1)).as("dup_count"))
      .select(col("__row.*"), col("dup_count"))
  }

  /** Connected components over a near-duplicate pair list: every node gets
    * `cluster_id` = the minimum id reachable through pair edges, so one
    * representative per duplicate CLUSTER survives (pairwise dedup alone
    * under-deletes: a~b, b~c keeps both a and c unless clustered).
    *
    * Min-label propagation: each iteration ships every node's current
    * label across its edges and keeps the minimum — one shuffle join per
    * iteration, converging in graph-diameter rounds (near-dup clusters are
    * shallow; `maxIters` bounds the loop). Labels only ever DECREASE, so
    * `sum(comp)` strictly decreases iff any label changed — convergence is
    * one tiny aggregate per round on the already-persisted labels, not an
    * extra next⋈previous join. Edges are materialized once up front so the
    * (possibly expensive) pair pipeline doesn't re-execute every
    * iteration. For graphs with whale components see the large-star/
    * small-star variant (Kiveris et al.) — same join primitive, fewer
    * rounds.
    *
    * Resource hygiene: the final labels are `localCheckpoint`ed (eager) so
    * every loop cache — including the last round's — is released before
    * returning; checkpoint blocks are context-cleaned once the result is
    * unreferenced, so repeated calls leave no CacheManager residue. (On a
    * real cluster prefer a reliable `checkpoint` dir: localCheckpoint
    * blocks die with their executor.)
    *
    * Input: `pairs(id_a, id_b)`; `nodes(idCol)` enumerates all ids so
    * singletons cluster as themselves. Output: (idCol, cluster_id).
    */
  def duplicateClusters(pairs: DataFrame, nodes: DataFrame, idCol: String,
                        maxIters: Int = 10): DataFrame = {
    val spark = pairs.sparkSession
    import spark.implicits._
    val edges = pairs.select(col("id_a").as("src"), col("id_b").as("dst"))
      .union(pairs.select(col("id_b").as("src"), col("id_a").as("dst")))
      .distinct()
      .as[(Long, Long)].persist()
    // the label loop runs ONLY on nodes that touch an edge — the dup
    // subgraph is tiny relative to the corpus, so iterations never
    // shuffle the full node set; singletons join back at the end
    var labels = edges.toDF("node", "dst").select(col("node")).distinct()
      .withColumn("comp", col("node")).as[(Long, Long)].persist()
    def labelSum(ds: org.apache.spark.sql.Dataset[(Long, Long)]): java.math.BigDecimal =
      Option(ds.toDF("node", "comp")
          .agg(sum(col("comp").cast("decimal(38,0)"))).first().getDecimal(0))
        .getOrElse(java.math.BigDecimal.ZERO)
    try {
      var prevSum = labelSum(labels)
      var iter = 0
      var converged = false
      while (iter < maxIters && !converged) {
        val viaEdges = edges.toDF("node", "dst")
          .join(labels.toDF("dst", "comp"), "dst")
          .select(col("node"), col("comp"))
        val next = labels.toDF("node", "comp").union(viaEdges)
          .groupBy("node").agg(min("comp").as("comp"))
          .as[(Long, Long)].persist()
        val nextSum = labelSum(next)
        labels.unpersist()
        labels = next
        converged = nextSum.compareTo(prevSum) == 0
        prevSum = nextSum
        iter += 1
      }
      if (!converged)
        throw new IllegalStateException(
          s"duplicateClusters did not converge in $maxIters iterations")
      // eager localCheckpoint materializes the loop result and truncates
      // lineage, so the finally-block unpersist can't trigger a recompute
      val finalLabels = labels.toDF(idCol, "cluster_id").localCheckpoint(true)
      nodes.select(col(idCol).cast("long").as(idCol))
        .join(finalLabels, Seq(idCol), "left")
        .select(col(idCol), coalesce(col("cluster_id"), col(idCol)).as("cluster_id"))
    } finally { edges.unpersist(); labels.unpersist(); () }
  }
}
