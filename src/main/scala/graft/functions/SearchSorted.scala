package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType, NumericType}

/** Upper-bound binary search of a value against a SORTED literal boundary
  * array: returns how many boundaries are <= value, i.e. the bucket index
  * in [0, boundaries.length]. The boundary array lives in the expression
  * (one copy per task, not per row); assignment is O(log n) per row with
  * no shuffle — the scalable way to range-bucket against precomputed
  * quantile splits ([[graft.lakehouse.ZOrder]]).
  */
case class SearchSortedDouble(child: Expression, boundaries: Array[Double])
    extends UnaryExpression {

  override def dataType: DataType = IntegerType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case _: NumericType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"search_sorted needs a numeric column, got $other")
    }

  override def nullSafeEval(input: Any): Any = {
    val v = input match {
      case d: Double => d
      case dec: org.apache.spark.sql.types.Decimal => dec.toDouble
      case n: Number => n.doubleValue()
    }
    SearchSortedDouble.compute(v, boundaries)
  }

  /** Real codegen: the boundary array rides along as a referenced object.
    * Primitive numeric children widen to double with a Java cast; Decimal
    * children (whose Java type is Spark's Decimal, not a primitive) go
    * through toDouble(). */
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bounds = ctx.addReferenceObj("searchSortedBounds", boundaries, "double[]")
    val toDouble: String => String = child.dataType match {
      case _: org.apache.spark.sql.types.DecimalType => c => s"$c.toDouble()"
      case _                                         => c => s"(double) $c"
    }
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.SearchSortedDouble.compute(${toDouble(c)}, $bounds);")
  }

  override protected def withNewChildInternal(newChild: Expression): SearchSortedDouble =
    copy(child = newChild)

  override def prettyName: String = "search_sorted"
}

object SearchSortedDouble {
  import org.apache.spark.sql.graft.bridge

  /** Upper-bound binary search — shared by interpreted eval and codegen. */
  def compute(v: Double, boundaries: Array[Double]): Int = {
    var lo = 0
    var hi = boundaries.length
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (boundaries(mid) <= v) lo = mid + 1 else hi = mid
    }
    lo
  }

  def searchSorted(value: Column, boundaries: Array[Double]): Column =
    bridge.column(SearchSortedDouble(bridge.expression(value), boundaries))
}
