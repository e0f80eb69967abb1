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
    * Resource hygiene + lineage: each round's labels are eagerly
    * `localCheckpoint`ed — this BOTH truncates the logical plan (the union
    * references labels twice, so bare lazy chaining would double the plan
    * every round: exponential analyzer/explain cost long before the data
    * is big) AND keeps the loop out of the CacheManager entirely; blocks
    * are context-cleaned once unreferenced, so repeated calls leave no
    * cache residue. (On a real cluster prefer a reliable `checkpoint` dir:
    * localCheckpoint blocks die with their executor.)
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
    // shuffle the full node set; singletons join back at the end.
    // Init = min(node, min neighbor): identical to what round 1 would
    // compute from identity labels, but as ONE aggregate over the
    // symmetric edge list — no join, no extra checkpoint round. LSH dup
    // clusters are near-cliques, so most converge one loop round later.
    var labels = edges.toDF("node", "dst").groupBy(col("node"))
      .agg(least(col("node"), min(col("dst"))).as("comp"))
      .as[(Long, Long)].localCheckpoint(true)
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
          .as[(Long, Long)].localCheckpoint(true)
        val nextSum = labelSum(next)
        labels = next
        converged = nextSum.compareTo(prevSum) == 0
        prevSum = nextSum
        iter += 1
      }
      if (!converged)
        throw new IllegalStateException(
          s"duplicateClusters did not converge in $maxIters iterations")
      nodes.select(col(idCol).cast("long").as(idCol))
        .join(labels.toDF(idCol, "cluster_id"), Seq(idCol), "left")
        .select(col(idCol), coalesce(col("cluster_id"), col(idCol)).as("cluster_id"))
    } finally { edges.unpersist(); () }
  }

  /** Connected components via alternating LARGE-STAR / SMALL-STAR rounds
    * (Kiveris et al., "Connected Components in MapReduce and Beyond",
    * SoCC'14) — the whale-component scale path [[duplicateClusters]]'s
    * Scaladoc points at.
    *
    * Min-label propagation needs component-DIAMETER rounds and, on a hub-
    * and-spoke "whale", re-ships every member's label through the hub each
    * round. Star contraction instead converges in O(log² n) rounds on ANY
    * topology:
    *
    *  - large-star: every node links its LARGER neighbors to the minimum
    *    of its neighborhood (including itself);
    *  - small-star: every node links its smaller-or-equal neighbors (and
    *    itself) to that minimum.
    *
    * Each round is a groupBy(min) + an equi-join on node id — the same
    * shuffle primitive as label propagation, map-side combinable, no
    * per-component serialization. Terminal state: the edge set is a union
    * of stars centered on each component's minimum id.
    *
    * Same contract as [[duplicateClusters]]: `pairs(id_a, id_b)`,
    * `nodes(idCol)` enumerates all ids (singletons cluster as themselves),
    * output (idCol, cluster_id); every persist released on return.
    */
  def duplicateClustersBigStar(pairs: DataFrame, nodes: DataFrame,
                               idCol: String, maxIters: Int = 25): DataFrame = {
    val spark = pairs.sparkSession
    import spark.implicits._

    // (v, m) for every neighbor v of u with v > u, m = min(Γ(u) ∪ {u})
    def largeStar(e: DataFrame): DataFrame = {
      val sym = e.union(e.select(col("v").as("u"), col("u").as("v")))
      val mins = sym.groupBy("u").agg(min(col("v")).as("mn"))
        .select(col("u"), least(col("u"), col("mn")).as("m"))
      sym.join(mins, "u").filter(col("v") > col("u"))
        .select(col("v").as("u"), col("m").as("v"))
        .filter(col("u") =!= col("v")).distinct()
    }

    // orient edges big→small; (v, m) for the smaller neighbors plus (u, m)
    def smallStar(e: DataFrame): DataFrame = {
      val dir = e.select(greatest(col("u"), col("v")).as("u"),
          least(col("u"), col("v")).as("v"))
        .filter(col("u") =!= col("v")).distinct()
      val mins = dir.groupBy("u").agg(min(col("v")).as("m"))
      dir.join(mins, "u").filter(col("v") =!= col("m"))
        .select(col("v").as("u"), col("m").as("v"))
        .union(mins.select(col("u"), col("m").as("v")))
        .filter(col("u") =!= col("v")).distinct()
    }

    // Order-independent edge-SET signature: (count, sum of the pair's
    // 64-bit mix). Both rounds' edge lists are distinct() sets, so equal
    // signatures mean equal sets (up to a vanishing hash-collision
    // probability). ONE tiny aggregate job per round replaces the two
    // `except` anti-joins (each a full shuffle) the probe used before —
    // the same trick as duplicateClusters' sum(comp) delta.
    def edgeSig(e: DataFrame): (Long, java.math.BigDecimal) = {
      val r = e.agg(count(lit(1)),
          sum(xxhash64(col("u"), col("v")).cast("decimal(38,0)"))).first()
      (r.getLong(0), Option(r.getDecimal(1)).getOrElse(java.math.BigDecimal.ZERO))
    }

    // eager localCheckpoint per round: truncates lineage (largeStar
    // references its input twice — bare chaining doubles the plan per
    // round) and stays out of the CacheManager; see duplicateClusters.
    var edges = pairs.select(col("id_a").cast("long").as("u"),
        col("id_b").cast("long").as("v"))
      .filter(col("u") =!= col("v")).distinct().localCheckpoint(true)
    var prevSig = edgeSig(edges)
    var iter = 0
    var converged = false
    while (iter < maxIters && !converged) {
      val next = smallStar(largeStar(edges)).localCheckpoint(true)
      val nextSig = edgeSig(next)
      converged = nextSig == prevSig
      prevSig = nextSig
      edges = next
      iter += 1
    }
    if (!converged)
      throw new IllegalStateException(
        s"duplicateClustersBigStar did not converge in $maxIters iterations")
    // stars: (u, m) edges point at component minima; centers self-label.
    // groupBy-min is defensive — at convergence each u has one target.
    val labels = edges.select(col("u").as(idCol), col("v").as("cluster_id"))
      .union(edges.select(col("v").as(idCol), col("v").as("cluster_id")))
      .groupBy(idCol).agg(min(col("cluster_id")).as("cluster_id"))
    nodes.select(col(idCol).cast("long").as(idCol))
      .join(labels, Seq(idCol), "left")
      .select(col(idCol), coalesce(col("cluster_id"), col(idCol)).as("cluster_id"))
  }
}
