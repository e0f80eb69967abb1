package graft.similarity

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Balanced random-projection tree partitioner — the Annoy/FLANN building
  * block. Differs from sign-LSH ([[LshAnn]]) in the one way that matters
  * for serving: each level splits at the per-node MEDIAN of the projection,
  * not at zero, so leaves are balanced by construction (±1 row) no matter
  * how anisotropic the embedding distribution is. Sign-LSH buckets go
  * quadratic exactly on the dup-heavy corpora SemDeDup targets; a median
  * tree cannot, which is why Annoy routes with medians.
  *
  * Determinism: medians are exact order statistics — row_number over
  * (projection, id) and the value at position ceil(n/2) — so the oracle
  * recomputes the identical split from the same inlined plane literals.
  *
  * Scale: this exact form sorts each node's projections via a
  * node-partitioned window (fine up to ~10M vectors/leaf); at 100 TB the
  * medians come from `approx_quantile` on a per-node sample (the Annoy
  * construction itself is sample-based) and the routing/query side below is
  * unchanged. Depth d costs d projection passes; queries route through the
  * same splits and scan one leaf of ~n/2^d vectors.
  *
  * Reference behavior context: the reference repo has no vector ops at all
  * (its ANN surface is this repo's §2C extension); the operator follows the
  * public Annoy design (Bernhardsson) and Dasgupta-Freund's RP-tree
  * analysis.
  */
object RpTree {

  /** Projection columns p0..p(depth-1) for the fixed planes. */
  def planes(depth: Int, dim: Int = 64, seed: Long = 42L): Array[Array[Double]] =
    LshAnn.hyperplanes(dim, depth, seed)

  /** Assign every vector to a depth-`depth` leaf ("0"/"1" path string).
    * Input must have columns (id, v: array<double>). Output adds `leaf`.
    * One window pass per level, partitioned by the node prefix. */
  def assignLeaves(base: DataFrame, depth: Int, dim: Int = 64,
                   seed: Long = 42L): DataFrame = {
    val ps = planes(depth, dim, seed)
    var df = base.withColumn("leaf", lit(""))
    for (level <- 0 until depth) {
      val p = CosineKnn.dot(col("v"), array(ps(level).map(lit): _*))
      df = df.withColumn("p", p)
      val w = Window.partitionBy(col("leaf")).orderBy(col("p"), col("id"))
      val cnt = Window.partitionBy(col("leaf"))
      df = df
        .withColumn("rn", row_number().over(w).cast("long"))
        .withColumn("n_node", count(lit(1)).over(cnt).cast("long"))
      // lower-median VALUE of the node: the projection at position
      // ceil(n/2); every row compares its own projection against it
      val medPos = // ceil(n/2) via exact float floor (n ≪ 2^52)
        floor((col("n_node") + lit(1L)).cast("double") / lit(2.0d)).cast("long")
      val med = max(when(col("rn") === medPos, col("p"))).over(cnt)
      df = df
        .withColumn("leaf",
          concat(col("leaf"), when(col("p") >= med, lit("1")).otherwise(lit("0"))))
        .drop("p", "rn", "n_node")
    }
    df
  }

  /** Per-query top-k cosine within the query's leaf (self excluded).
    * Output: query_id, neighbor_id, rank, cosine. */
  def topKLeaf(vectors: DataFrame, idCol: String, vecCol: String,
               queryPredicate: Column, k: Int, depth: Int = 3,
               dim: Int = 64, seed: Long = 42L): DataFrame = {
    val base = vectors
      .select(col(idCol).as("id"), CosineKnn.toDouble(col(vecCol)).as("v"))
    val leaves = assignLeaves(base, depth, dim, seed)
      .withColumn("nrm", sqrt(CosineKnn.dot(col("v"), col("v"))))
      .localCheckpoint(true) // assignment runs once; queries re-join it
    val queries = broadcast(leaves.filter(queryPredicate)
      .select(col("id").as("query_id"), col("v").as("qv"),
        col("nrm").as("qn"), col("leaf").as("qleaf")))
    val pairs = queries
      .join(leaves, col("leaf") === col("qleaf") && col("id") =!= col("query_id"))
      .withColumn("cosine",
        CosineKnn.dot(col("qv"), col("v")) / (col("qn") * col("nrm")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("id").asc)
    pairs.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("id").as("neighbor_id"), col("rank"),
        col("cosine"), col("leaf"))
  }

  /** DuckDB SQL that recomputes [[assignLeaves]] bit-for-bit: per level,
    * the projection against the same plane literals, the same
    * (projection, id)-ordered rank, and the same ceil(n/2) median row. */
  def sqlAssignLeaves(depth: Int, dim: Int = 64, seed: Long = 42L): String = {
    val ps = planes(depth, dim, seed)
    def arr(p: Array[Double]) = p.mkString("[", ", ", "]")
    val ctes = new StringBuilder
    ctes.append(
      """l0 AS (
        |  SELECT vec_id AS id, CAST(embedding AS DOUBLE[]) AS v,
        |    '' AS leaf
        |  FROM embeddings
        |)""".stripMargin)
    for (level <- 0 until depth) {
      ctes.append(s""",
        |p$level AS (
        |  SELECT id, v, leaf,
        |    list_dot_product(v, ${arr(ps(level))}) AS p,
        |    CAST(row_number() OVER (PARTITION BY leaf
        |      ORDER BY list_dot_product(v, ${arr(ps(level))}), id)
        |      AS BIGINT) AS rn,
        |    CAST(COUNT(*) OVER (PARTITION BY leaf) AS BIGINT) AS n_node
        |  FROM l$level
        |),
        |m$level AS (
        |  SELECT leaf AS mleaf, p AS med FROM p$level
        |  WHERE rn = (n_node + 1) // 2
        |),
        |l${level + 1} AS (
        |  SELECT id, v,
        |    leaf || (CASE WHEN p >= med THEN '1' ELSE '0' END) AS leaf
        |  FROM p$level JOIN m$level ON mleaf = leaf
        |)""".stripMargin)
    }
    ctes.toString
  }
}
