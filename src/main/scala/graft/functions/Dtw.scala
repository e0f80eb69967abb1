package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Dynamic-time-warping distance (Sakoe & Chiba, IEEE TASSP'78) between
  * two integer series, as a native codegen'd Catalyst expression: the
  * classic O(|a|·|b|) DP with unit steps (insert/delete/match) and L1
  * cell cost |a_i − b_j|. All arithmetic is Long, so the distance is
  * engine-portable with zero FP — the oracle can unroll the identical
  * recurrence in exact SQL.
  *
  * Intended for BOUNDED per-key profiles (monthly/weekly shape vectors,
  * ≤ a few hundred points), where the quadratic kernel is a per-row
  * constant and the pair space is the bounded key grain — never raw
  * event sequences (window the series to a profile first).
  */
case class DtwDistance(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"dtw_distance needs (array<bigint>, array<bigint>), got $other")
    }

  override def nullSafeEval(a: Any, b: Any): Any =
    DtwDistance.compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val r = ctx.freshName("dtwResult")
      s"""java.lang.Long $r = graft.functions.DtwDistance.compute($a, $b);
         |if ($r == null) { ${ev.isNull} = true; } else { ${ev.value} = $r.longValue(); }
         |""".stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DtwDistance =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "dtw_distance"
}

object DtwDistance {
  import org.apache.spark.sql.graft.bridge

  /** Rolling-row DP; null when either side is empty or contains null.
    * Public because generated code calls it. */
  def compute(x: ArrayData, y: ArrayData): java.lang.Long = {
    val n = x.numElements()
    val m = y.numElements()
    if (n == 0 || m == 0) return null
    var i = 0
    while (i < n) { if (x.isNullAt(i)) return null; i += 1 }
    var j = 0
    while (j < m) { if (y.isNullAt(j)) return null; j += 1 }
    val prev = new Array[Long](m)
    val cur = new Array[Long](m)
    // row 0: cumulative cost along b
    val a0 = x.getLong(0)
    prev(0) = Math.abs(a0 - y.getLong(0))
    j = 1
    while (j < m) { prev(j) = prev(j - 1) + Math.abs(a0 - y.getLong(j)); j += 1 }
    i = 1
    while (i < n) {
      val ai = x.getLong(i)
      cur(0) = prev(0) + Math.abs(ai - y.getLong(0))
      j = 1
      while (j < m) {
        val best = Math.min(cur(j - 1), Math.min(prev(j), prev(j - 1)))
        cur(j) = best + Math.abs(ai - y.getLong(j))
        j += 1
      }
      System.arraycopy(cur, 0, prev, 0, m)
      i += 1
    }
    prev(m - 1)
  }

  def dtwDistance(a: Column, b: Column): Column =
    bridge.column(DtwDistance(bridge.expression(a), bridge.expression(b)))
}
