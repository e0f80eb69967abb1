package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Polynomial (Karp-Rabin) rolling hash over a string's code points:
  * `acc = (acc * 131 + codepoint) mod (2^31 - 1)`, acc0 = 0.
  *
  * The document-fingerprinting primitive: equal texts get equal
  * fingerprints, and the windowed variant ([[RollingHashGrams]]) yields
  * per-position k-gram hashes for winnowing-style near-dup fingerprints.
  * The modulus is Mersenne-31 so every intermediate fits comfortably in a
  * 64-bit signed long (max ~2^39), which keeps the DuckDB oracle expressible
  * in plain BIGINT `list_reduce` arithmetic — cross-engine bit parity.
  */
case class RollingHash(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"rolling_hash needs string, got $other")
    }

  override def nullSafeEval(input: Any): Any =
    java.lang.Long.valueOf(RollingHash.compute(input.asInstanceOf[UTF8String]))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.RollingHash.compute($c);")

  override protected def withNewChildInternal(newChild: Expression): RollingHash =
    copy(child = newChild)

  override def prettyName: String = "rolling_hash"
}

/** All k-gram rolling hashes of a string (one per window position), the
  * input to winnowing: selecting the minimum per sliding window of hashes
  * gives a position-robust fingerprint set. Each window hash is the same
  * polynomial as [[RollingHash]] restricted to the window, computed
  * incrementally in one pass (classic Karp-Rabin roll: subtract the
  * outgoing code point's `131^(k-1)` term, shift, add the incoming one).
  */
case class RollingHashGrams(child: Expression, k: Int) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"rolling_hash_grams needs string, got $other")
    }

  override def nullSafeEval(input: Any): Any =
    RollingHashGrams.compute(input.asInstanceOf[UTF8String], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.RollingHashGrams.compute($c, $k);")

  override protected def withNewChildInternal(newChild: Expression): RollingHashGrams =
    copy(child = newChild)

  override def prettyName: String = "rolling_hash_grams"
}

object RollingHashGrams {

  /** The whole-string kernel — shared by interpreted eval and codegen. */
  def compute(str: UTF8String, k: Int): ArrayData = {
    val s = str.toString
    val cps = s.codePoints().toArray
    if (cps.length < k) return new GenericArrayData(Array.empty[Any])
    val mod = RollingHash.Mod
    // 131^(k-1) mod m, for rolling the leading term out
    var lead = 1L
    var i = 0
    while (i < k - 1) { lead = (lead * 131L) % mod; i += 1 }
    val out = new Array[Any](cps.length - k + 1)
    var acc = 0L
    i = 0
    while (i < cps.length) {
      acc = (acc * 131L + cps(i)) % mod
      if (i >= k - 1) {
        out(i - (k - 1)) = acc
        // roll out the leading code point for the next window
        acc = (acc - (cps(i - (k - 1)) * lead) % mod + mod) % mod
      }
      i += 1
    }
    new GenericArrayData(out)
  }
}

object RollingHash {
  import org.apache.spark.sql.graft.bridge

  /** Mersenne prime 2^31 - 1: intermediates stay < 2^39 (BIGINT-safe in any
    * engine, so oracles can replicate the fold). */
  val Mod: Long = 2147483647L

  /** The whole-string kernel — shared by interpreted eval and codegen. */
  def compute(str: UTF8String): Long = {
    val s = str.toString
    var acc = 0L
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      acc = (acc * 131L + cp) % Mod
      i += Character.charCount(cp)
    }
    acc
  }

  def rollingHash(s: Column): Column =
    bridge.column(RollingHash(bridge.expression(s)))

  def rollingHashGrams(s: Column, k: Int): Column =
    bridge.column(RollingHashGrams(bridge.expression(s), k))
}
