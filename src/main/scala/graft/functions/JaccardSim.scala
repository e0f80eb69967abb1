package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, StringType}

/** Jaccard similarity of two distinct-element array<string> columns, as a
  * native Catalyst expression. Equal to
  * `size(array_intersect(a,b)) / size(array_union(a,b))` for arrays that are
  * already duplicate-free (both sides here come from distinct shingle/n-gram
  * builders) — but one compiled pass instead of two interpreted set-builds
  * per pair: |A∪B| = |A| + |B| - |A∩B|.
  * Division is float64, matching the SQL form and DuckDB bit-for-bit.
  *
  * With `assumeSorted = true` the intersection is an allocation-free merge
  * walk over binary-ordered inputs (`array_sort` order == UTF8String
  * binary order) — the verify-join fast path: a hash set per candidate
  * pair is mostly allocation/boxing overhead when the same document meets
  * thousands of candidates. The count (and thus the similarity) is
  * identical either way.
  */
case class JaccardSim(left: Expression, right: Expression,
                      assumeSorted: Boolean = false)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(StringType, _), ArrayType(StringType, _)) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"jaccard_sim needs (array<string>, array<string>), got $other")
    }

  override def nullSafeEval(a: Any, b: Any): Any =
    if (assumeSorted)
      JaccardSim.computeSorted(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    else
      JaccardSim.compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  /** Real `doGenCode` so the surrounding projection stays in whole-stage
    * codegen; the intersection loop lives in the static helpers. */
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val r = ctx.freshName("jacResult")
      val helper = if (assumeSorted) "computeSorted" else "compute"
      s"""java.lang.Double $r = graft.functions.JaccardSim.$helper($a, $b);
         |if ($r == null) { ${ev.isNull} = true; } else { ${ev.value} = $r.doubleValue(); }
         |""".stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): JaccardSim =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "jaccard_sim"
}

object JaccardSim {
  import org.apache.spark.sql.graft.bridge

  /** |A∩B| / |A∪B| for duplicate-free arrays; null when both empty.
    * Public because generated code calls it. */
  def compute(x: ArrayData, y: ArrayData): java.lang.Double = {
    val nx = x.numElements()
    val ny = y.numElements()
    val setA = new java.util.HashSet[Any](Math.max(4, nx * 2))
    var i = 0
    while (i < nx) {
      if (!x.isNullAt(i)) setA.add(x.getUTF8String(i))
      i += 1
    }
    var inter = 0
    i = 0
    while (i < ny) {
      if (!y.isNullAt(i) && setA.contains(y.getUTF8String(i))) inter += 1
      i += 1
    }
    val union = nx + ny - inter
    if (union == 0) null
    else java.lang.Double.valueOf(inter.toDouble / union.toDouble)
  }

  /** Merge-walk intersection for binary-sorted duplicate-free arrays
    * (nulls sorted to either end are simply never equal). Public because
    * generated code calls it. */
  def computeSorted(x: ArrayData, y: ArrayData): java.lang.Double = {
    val nx = x.numElements()
    val ny = y.numElements()
    var i = 0
    var j = 0
    var inter = 0
    while (i < nx && j < ny) {
      if (x.isNullAt(i)) i += 1
      else if (y.isNullAt(j)) j += 1
      else {
        val c = x.getUTF8String(i).compareTo(y.getUTF8String(j))
        if (c == 0) { inter += 1; i += 1; j += 1 }
        else if (c < 0) i += 1
        else j += 1
      }
    }
    val union = nx + ny - inter
    if (union == 0) null
    else java.lang.Double.valueOf(inter.toDouble / union.toDouble)
  }

  /** Column-API entry point: jaccardSim(arrA, arrB) for distinct arrays. */
  def jaccardSim(a: Column, b: Column): Column =
    bridge.column(JaccardSim(bridge.expression(a), bridge.expression(b)))

  /** Fast path for inputs already in `array_sort` (binary) order. */
  def jaccardSimSorted(a: Column, b: Column): Column =
    bridge.column(JaccardSim(bridge.expression(a), bridge.expression(b),
      assumeSorted = true))
}
