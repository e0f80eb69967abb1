package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Deterministic, engine-portable row hashing for sampling and dataset
  * splitting: `h(x) = (md5_upper64(x) mod M) mod buckets` with M = 2^61-1
  * (the [[MinHashSig]] hash family, so DuckDB computes the identical value
  * via `md5_number_upper`). Unlike `rand(seed)`, the assignment is a pure
  * function of the KEY: stable across reruns, partitionings, and engines —
  * the property train/val/test splits and reproducible corpus samples
  * need (a re-ingested document lands in the same split forever).
  */
object StableHash {

  /** Bucket in [0, buckets) from any key column (cast to string first). */
  def bucket(key: Column, buckets: Int): Column = {
    require(buckets > 0, "buckets must be positive")
    pmod(element_at(MinHashSig.minhashSig(array(key.cast("string")), 1), 1),
      lit(buckets.toLong))
  }

  /** Keep ~`permille`/1000 of rows, deterministically by key. */
  def samplePredicate(key: Column, permille: Int): Column =
    bucket(key, 1000) < permille

  /** Named split by per-mille cut points, e.g.
    * `split(key, Seq(800 -> "train", 900 -> "val"), "test")`. */
  def split(key: Column, cuts: Seq[(Int, String)], last: String): Column = {
    val b = bucket(key, 1000)
    cuts.sortBy(_._1).foldRight(lit(last): Column) { case ((cut, name), rest) =>
      when(b < cut, name).otherwise(rest)
    }
  }
}
