package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, Predicate, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.LongType
import org.apache.spark.util.sketch.BloomFilter

/** Membership probe of a 64-bit hash against a prebuilt [[BloomFilter]] —
  * the semi-join pre-prune every large-scale decontamination pipeline
  * runs before its exact join: the filter is built over the SMALL side's
  * key hashes once, rides to every task as a referenced object (one copy
  * per executor, not per row), and drops the BIG side's non-candidate
  * rows BEFORE they reach the exchange. False positives only let extra
  * rows through to the exact join that follows; they never change the
  * result.
  *
  * Codegen'd like the rest of `graft.functions` (no UDF in the hot path):
  * the generated Java calls `mightContainLong` straight on the referenced
  * filter object.
  */
case class BloomMightContainLong(child: Expression, bloom: BloomFilter)
    extends UnaryExpression with Predicate {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case LongType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"bloom_might_contain_long needs a bigint hash column, got $other")
    }

  override def nullSafeEval(input: Any): Any =
    bloom.mightContainLong(input.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bf = ctx.addReferenceObj("bloomFilter", bloom,
      classOf[BloomFilter].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $bf.mightContainLong($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): BloomMightContainLong =
    copy(child = newChild)

  override def prettyName: String = "bloom_might_contain_long"
}

object BloomMightContainLong {
  import org.apache.spark.sql.graft.bridge

  /** `true` when `hash64` (a bigint, e.g. `xxhash64(key)`) might be in
    * the filter; definitely-absent rows return `false`. */
  def mightContain(hash64: Column, bloom: BloomFilter): Column =
    bridge.column(BloomMightContainLong(bridge.expression(hash64), bloom))

  /** Build a filter over `xxhash64(keyCol)` of (small) `df` — the driver
    * holds one filter of ~9.6 bits/item at the default 1% fpp, so size
    * it from an exact count of the small side, not a guess. */
  def buildOverHashes(df: DataFrame, keyCol: Column,
                      expectedItems: Long, fpp: Double = 0.01): BloomFilter =
    df.select(org.apache.spark.sql.functions.xxhash64(keyCol).as("__bloom_h"))
      .stat.bloomFilter("__bloom_h", math.max(expectedItems, 1000L), fpp)
}
