package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Winnowing fingerprint selection (Schleimer/Wilkerson/Aiken, SIGMOD'03 —
  * the MOSS algorithm): from an array of k-gram hashes, keep the DISTINCT
  * minimum of every sliding window of `w` consecutive hashes. Guarantees
  * at least one shared fingerprint for any match of length >= w + k - 1
  * while storing ~2/(w+1) of the grams — the position-robust document
  * fingerprint set for near-dup detection at corpus scale.
  *
  * Inputs shorter than `w` contribute their single overall minimum (the
  * standard boundary convention), empty inputs yield an empty set.
  */
case class Winnow(child: Expression, w: Int) extends UnaryExpression {
  require(w > 0, "winnow window must be positive")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(LongType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"winnow needs array<bigint>, got $other")
    }

  override def nullSafeEval(input: Any): Any =
    Winnow.compute(input.asInstanceOf[ArrayData], w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.Winnow.compute($c, $w);")

  override protected def withNewChildInternal(newChild: Expression): Winnow =
    copy(child = newChild)

  override def prettyName: String = "winnow"
}

object Winnow {
  import org.apache.spark.sql.graft.bridge

  /** The whole-array kernel — shared by interpreted eval and codegen.
    * O(n·w) worst case but windows are tiny (w ~ 4-8); first-occurrence
    * order, distinct. Null elements are skipped (the type check admits
    * nullable arrays; a window of only nulls contributes nothing). */
  def compute(arr: ArrayData, w: Int): ArrayData = {
    val n = arr.numElements()
    if (n == 0) return new GenericArrayData(Array.empty[Any])
    val seen = new java.util.LinkedHashSet[java.lang.Long]()
    def windowMin(from: Int, until: Int): Unit = {
      var mn = Long.MaxValue
      var any = false
      var j = from
      while (j < until) {
        if (!arr.isNullAt(j)) {
          val v = arr.getLong(j)
          if (v < mn) mn = v
          any = true
        }
        j += 1
      }
      if (any) { seen.add(mn); () }
    }
    if (n < w) windowMin(0, n)
    else {
      var i = 0
      while (i <= n - w) { windowMin(i, i + w); i += 1 }
    }
    val out = new Array[Any](seen.size())
    val it = seen.iterator()
    var i = 0
    while (it.hasNext) { out(i) = it.next().longValue(); i += 1 }
    new GenericArrayData(out)
  }

  /** Column-API entry point: winnow(gramHashArrayColumn, w). */
  def winnow(gramHashes: Column, w: Int): Column =
    bridge.column(Winnow(bridge.expression(gramHashes), w))
}
