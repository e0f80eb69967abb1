package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Strict left-to-right float64 dot product of two array<double> columns, as
  * a native Catalyst expression. Bit-identical to
  * `aggregate(zip_with(a, b, (x,y) => x*y), 0.0d, (acc,x) => acc+x)` and to
  * DuckDB's `list_dot_product(DOUBLE[], DOUBLE[])` (all three are sequential
  * folds, so FP addition order matches) — but compiled, where the HOF form
  * is interpreted per element and dominated ANN runtime at 2M pairs.
  * Null if either side is null, any element is null, or lengths differ
  * (the zip_with form yields null via null propagation in those cases).
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), ArrayType(DoubleType, _)) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"dot_product needs (array<double>, array<double>), got $other")
    }

  override def nullSafeEval(a: Any, b: Any): Any =
    DotProduct.compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  /** Real `doGenCode` (not CodegenFallback) so projections using this stay
    * inside whole-stage codegen; the loop itself lives in the static
    * helper — one call, no per-element virtual dispatch. */
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val r = ctx.freshName("dotResult")
      s"""java.lang.Double $r = graft.functions.DotProduct.compute($a, $b);
         |if ($r == null) { ${ev.isNull} = true; } else { ${ev.value} = $r.doubleValue(); }
         |""".stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "dot_product"
}

object DotProduct {
  import org.apache.spark.sql.graft.bridge

  /** Strict sequential fold; null on length mismatch or null element.
    * Public because generated code calls it. */
  def compute(x: ArrayData, y: ArrayData): java.lang.Double = {
    val n = x.numElements()
    if (n != y.numElements()) return null
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      acc += x.getDouble(i) * y.getDouble(i)
      i += 1
    }
    java.lang.Double.valueOf(acc)
  }

  /** Column-API entry point: dotProduct(arrayDoubleCol, arrayDoubleCol). */
  def dotProduct(a: Column, b: Column): Column =
    bridge.column(DotProduct(bridge.expression(a), bridge.expression(b)))
}
