package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** TRUE Damerau-Levenshtein edit distance (Lowrance-Wagner, JACM'75) as a
  * native codegen'd Catalyst expression: insert / delete / substitute /
  * transpose-with-intervening-edits. This is NOT the restricted
  * optimal-string-alignment variant — e.g. dl("CA","ABC") = 2, where OSA
  * gives 3. Semantics match DuckDB's `damerau_levenshtein` exactly
  * (verified value-for-value on the corpus vocabulary); Spark itself ships
  * only plain `levenshtein`, so transposition-heavy typos (the most common
  * human keystroke error class) are over-penalized by the built-in.
  *
  * Scale shape: per-row compiled kernel, O(|a|·|b|) time with the full
  * (|a|+2)×(|b|+2) Lowrance-Wagner matrix — fine for the vocabulary /
  * name grains it targets (tokens and entity names, not document bodies).
  */
case class DamerauLevenshtein(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, StringType) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"damerau_levenshtein needs (string, string), got $other")
    }

  override def nullSafeEval(a: Any, b: Any): Any =
    DamerauLevenshtein.compute(a.asInstanceOf[UTF8String],
      b.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.DamerauLevenshtein.compute($a, $b);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DamerauLevenshtein =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "damerau_levenshtein"
}

object DamerauLevenshtein {
  import org.apache.spark.sql.graft.bridge

  /** Lowrance-Wagner DP over Java chars. `da` maps each character to the
    * last row where it appeared in `a` (the transposition back-pointer);
    * a 128-slot array fast-paths ASCII, with a HashMap spill for anything
    * wider. Public because generated code calls it. */
  def compute(ua: UTF8String, ub: UTF8String): Long = {
    val a = ua.toString
    val b = ub.toString
    val n = a.length
    val m = b.length
    if (n == 0) return m.toLong
    if (m == 0) return n.toLong
    val inf = n + m
    val h = Array.ofDim[Int](n + 2, m + 2)
    h(0)(0) = inf
    var i = 0
    while (i <= n) { h(i + 1)(1) = i; h(i + 1)(0) = inf; i += 1 }
    var j = 0
    while (j <= m) { h(1)(j + 1) = j; h(0)(j + 1) = inf; j += 1 }
    val daAscii = new Array[Int](128)
    var daWide: java.util.HashMap[Character, Integer] = null
    def daGet(c: Char): Int =
      if (c < 128) daAscii(c)
      else if (daWide == null) 0
      else { val v = daWide.get(c); if (v == null) 0 else v.intValue() }
    def daPut(c: Char, v: Int): Unit =
      if (c < 128) daAscii(c) = v
      else {
        if (daWide == null) daWide = new java.util.HashMap[Character, Integer]()
        daWide.put(c, v); ()
      }
    i = 1
    while (i <= n) {
      var db = 0
      j = 1
      while (j <= m) {
        val i1 = daGet(b.charAt(j - 1))
        val j1 = db
        val cost = if (a.charAt(i - 1) == b.charAt(j - 1)) { db = j; 0 } else 1
        var best = h(i)(j) + cost                      // substitute / match
        val ins = h(i + 1)(j) + 1                      // insert
        if (ins < best) best = ins
        val del = h(i)(j + 1) + 1                      // delete
        if (del < best) best = del
        val tr = h(i1)(j1) + (i - i1 - 1) + 1 + (j - j1 - 1) // transpose
        if (tr < best) best = tr
        h(i + 1)(j + 1) = best
        j += 1
      }
      daPut(a.charAt(i - 1), i)
      i += 1
    }
    h(n + 1)(m + 1).toLong
  }

  /** Column API. */
  def damerauLevenshtein(a: Column, b: Column): Column =
    bridge.column(DamerauLevenshtein(bridge.expression(a), bridge.expression(b)))
}
