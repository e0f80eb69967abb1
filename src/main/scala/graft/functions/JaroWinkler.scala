package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Jaro / Jaro-Winkler string similarity as a native codegen'd Catalyst
  * expression — the record-linkage comparator (Winkler, Census SRD 1990)
  * Spark lacks (it ships only `levenshtein`). Semantics match DuckDB's
  * `jaro_similarity` / `jaro_winkler_similarity` exactly (verified
  * value-for-value against DuckDB 1.x on the corpus vocabulary): either
  * side empty → 0.0; match window `max(|a|,|b|)/2 - 1` (floor, min 0);
  * greedy left-to-right matching; half-transposition count; and the
  * Winkler prefix boost `j + l·0.1·(1-j)` (common prefix capped at 4)
  * applied only when jaro > 0.7.
  *
  * The reference engine has no string-similarity comparator at all
  * (`/root/reference/src/main/scala/com/lakehouse/ingestion/dq/DQ.scala`
  * stops at regex predicates); this powers the q295/q297 linkage wave.
  *
  * Scale shape: per-row compiled kernel, O(|a|·window) — no shuffle, no
  * allocation beyond two boolean flag arrays per call.
  */
case class JaroWinkler(left: Expression, right: Expression, winkler: Boolean)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, StringType) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"jaro needs (string, string), got $other")
    }

  override def nullSafeEval(a: Any, b: Any): Any =
    JaroWinkler.compute(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String],
      winkler)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.JaroWinkler.compute($a, $b, $winkler);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): JaroWinkler =
    copy(left = newLeft, right = newRight)

  override def prettyName: String =
    if (winkler) "jaro_winkler_sim" else "jaro_sim"
}

object JaroWinkler {
  import org.apache.spark.sql.graft.bridge

  /** The per-pair kernel — shared by interpreted eval and generated code.
    * Works on Java chars (UTF-16 units); identical to byte-wise engines on
    * the ASCII corpus and consistent with Spark's own char-based
    * `levenshtein`. */
  def compute(ua: UTF8String, ub: UTF8String, winkler: Boolean): Double = {
    val a = ua.toString
    val b = ub.toString
    val l1 = a.length
    val l2 = b.length
    if (l1 == 0 || l2 == 0) return 0.0
    var md = math.max(l1, l2) / 2 - 1
    if (md < 0) md = 0
    val m1 = new Array[Boolean](l1)
    val m2 = new Array[Boolean](l2)
    var m = 0
    var i = 0
    while (i < l1) {
      val c = a.charAt(i)
      val hi = math.min(l2, i + md + 1)
      var j = math.max(0, i - md)
      var done = false
      while (j < hi && !done) {
        if (!m2(j) && b.charAt(j) == c) {
          m1(i) = true; m2(j) = true; m += 1; done = true
        }
        j += 1
      }
      i += 1
    }
    if (m == 0) return 0.0
    var t = 0
    var k = 0
    i = 0
    while (i < l1) {
      if (m1(i)) {
        while (!m2(k)) k += 1
        if (a.charAt(i) != b.charAt(k)) t += 1
        k += 1
      }
      i += 1
    }
    t /= 2
    val dm = m.toDouble
    val j = (dm / l1 + dm / l2 + (dm - t) / dm) / 3.0
    if (!winkler || j <= 0.7) j
    else {
      var l = 0
      val pmax = math.min(4, math.min(l1, l2))
      while (l < pmax && a.charAt(l) == b.charAt(l)) l += 1
      j + l * 0.1 * (1.0 - j)
    }
  }

  /** Column API: plain Jaro similarity in [0, 1]. */
  def jaroSim(a: Column, b: Column): Column =
    bridge.column(JaroWinkler(bridge.expression(a), bridge.expression(b),
      winkler = false))

  /** Column API: Jaro-Winkler (prefix-boosted) similarity in [0, 1]. */
  def jaroWinklerSim(a: Column, b: Column): Column =
    bridge.column(JaroWinkler(bridge.expression(a), bridge.expression(b),
      winkler = true))
}
