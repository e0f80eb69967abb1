package graft.similarity

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed ALS primitives (rank 2, ridge): the closed-form per-key
  * 2×2 normal-equation solve used by q368 (training) and q372 (serving
  * fold-in). Everything is engineered for bit-reproducibility across
  * engines: normal equations accumulate in EXACT decimals (combinable
  * aggregates — map-side partial merge applies), the single division per
  * key runs in doubles derived from those exact decimals by identical
  * IEEE ops, and results are nano-quantized (floor(x·1e9+0.5)) back into
  * DECIMAL(18,9) so the next iteration's inputs are exact again.
  *
  * Scale: one solve = one equi-join of ratings to the other side's
  * factor table plus one grouped aggregate — the canonical ALS shuffle
  * pair. Rank is fixed, so per-row payload is O(1); factor tables are
  * #keys rows and broadcast when small.
  */
object Als {

  /** Ridge regularizer added to the Gram diagonal. */
  val Lambda = 0.1

  /** Deterministic nano-quantizer: floor(x·1e9 + 0.5) → DECIMAL(18,9). */
  def quant9(x: Column): Column =
    (floor(x * lit(1e9) + lit(0.5)).cast("decimal(18,0)") *
      lit(new java.math.BigDecimal("0.000000001"))).cast("decimal(18,9)")

  /** Deterministic factor init for one side keyed by `key`: two exact-
    * decimal residue ramps, non-collinear across keys. */
  def initFactors(keys: DataFrame, key: String): DataFrame = {
    val tenth = lit(new java.math.BigDecimal("0.1"))
    keys.select(col(key),
      ((lit(10) + col(key) % 7).cast("decimal(18,0)") * tenth)
        .cast("decimal(18,9)").as("f0"),
      ((lit(5) - col(key) % 5).cast("decimal(18,0)") * tenth)
        .cast("decimal(18,9)").as("f1"))
  }

  /** One half-iteration: solve the `outKey` side's factors against the
    * other side's fixed `factors` (columns: joinKey, f0, f1). `ratings`
    * columns: u, i, r with r an exact decimal. */
  def solve(ratings: DataFrame, joinKey: String, outKey: String,
      factors: DataFrame): DataFrame = {
    val lam = lit(Lambda)
    val det = (col("a11") + lam) * (col("a22") + lam) -
      col("a12") * col("a12")
    ratings.join(factors, joinKey)
      .groupBy(col(outKey))
      .agg(sum(col("f0") * col("f0")).cast("double").as("a11"),
        sum(col("f0") * col("f1")).cast("double").as("a12"),
        sum(col("f1") * col("f1")).cast("double").as("a22"),
        sum(col("f0") * col("r")).cast("double").as("b0"),
        sum(col("f1") * col("r")).cast("double").as("b1"))
      .select(col(outKey),
        quant9(((col("a22") + lam) * col("b0") -
          col("a12") * col("b1")) / det).as("f0"),
        quant9(((col("a11") + lam) * col("b1") -
          col("a12") * col("b0")) / det).as("f1"))
  }

  /** Exact squared error in squared milli-units over `ratings` joined to
    * user factors `p` (u, f0, f1) and item factors `q` (i, f0, f1). */
  def sseMilli2(ratings: DataFrame, p: DataFrame, q: DataFrame): DataFrame = {
    val em = floor((col("r") -
        (col("p0") * col("q0") + col("p1") * col("q1"))).cast("double")
      * lit(1000.0) + lit(0.5)).cast("long")
    ratings
      .join(p.select(col("u"), col("f0").as("p0"), col("f1").as("p1")), "u")
      .join(q.select(col("i"), col("f0").as("q0"), col("f1").as("q1")), "i")
      .select(em.as("em"))
      .agg(sum(col("em") * col("em")).cast("long").as("sse_m2"))
  }
}
