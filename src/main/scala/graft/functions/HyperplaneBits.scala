package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, Literal}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Fused LSH sign-bit string: one expression computing the '0'/'1' sign of
  * `vec · plane` for EVERY hyperplane in a constant plane matrix, replacing
  * the per-plane spelling
  * `concat(when(dot(vec, array(p...)) >= 0, "1").otherwise("0"), ...)`.
  *
  * Bit-identical to that spelling ([[DotProduct.compute]] is the same
  * strict sequential fold; a NULL dot — null vec, null element, length
  * mismatch — renders '0' exactly like `when`'s otherwise-branch), but it
  * collapses an nBits-plane bucket key from ~nBits·(dim+3) expression
  * nodes to ONE node. That matters twice at scale: Janino compiles a
  * 50x smaller whole-stage method (band-key planning dominated q82/q85's
  * r6 wall time — a constant cost, but paid per plan), and evaluation is
  * one tight loop over a cached constant matrix instead of nBits
  * interpreted literal-array constructions.
  */
case class HyperplaneBits(vec: Expression, planes: Expression)
    extends BinaryExpression {

  override def left: Expression = vec
  override def right: Expression = planes

  override def dataType: DataType = StringType
  override def nullable: Boolean = false

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (vec.dataType, planes.dataType) match {
      case (ArrayType(DoubleType, _), ArrayType(ArrayType(DoubleType, _), _)) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"hyperplane_bits needs (array<double>, array<array<double>>), got $other")
    }

  /** Handles nulls itself (null vec → all-'0' bits, matching the when()
    * spelling), so eval is NOT the nullSafe variant. */
  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val v = vec.eval(input)
    val p = planes.eval(input)
    HyperplaneBits.compute(
      if (v == null) null else v.asInstanceOf[ArrayData],
      p.asInstanceOf[ArrayData])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val v = vec.genCode(ctx)
    val p = planes.genCode(ctx)
    val code =
      code"""
        ${v.code}
        ${p.code}
        UTF8String ${ev.value} = graft.functions.HyperplaneBits.compute(
          ${v.isNull} ? null : ${v.value}, ${p.value});
      """
    ev.copy(code = code, isNull = FalseLiteral)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): HyperplaneBits =
    copy(vec = newLeft, planes = newRight)

  override def prettyName: String = "hyperplane_bits"
}

object HyperplaneBits {
  import org.apache.spark.sql.graft.bridge

  /** One byte per plane: '1' iff the strict sequential dot is non-null and
    * >= 0 (any NULL dot — NULL vec, NULL vec element, or a NULL plane row
    * in the matrix — renders '0', like
    * `when(dot >= 0, "1").otherwise("0")`). [[bits]] always passes a
    * dense literal matrix, but the case class is public, so a null inner
    * plane row is guarded here rather than left to NPE in DotProduct.
    * Public because generated code calls it. */
  def compute(vec: ArrayData, planes: ArrayData): UTF8String = {
    val nb = planes.numElements()
    val bits = new Array[Byte](nb)
    var i = 0
    while (i < nb) {
      val plane = if (planes.isNullAt(i)) null else planes.getArray(i)
      val d =
        if (vec == null || plane == null) null
        else DotProduct.compute(vec, plane)
      bits(i) = if (d != null && d.doubleValue() >= 0) '1' else '0'
      i += 1
    }
    UTF8String.fromBytes(bits)
  }

  /** Column entry point over a CONSTANT plane matrix (folded to one cached
    * literal, shared by every row). */
  def bits(vec: Column, planes: Array[Array[Double]]): Column =
    bridge.column(HyperplaneBits(bridge.expression(vec),
      Literal.create(planes.map(_.toSeq).toSeq,
        ArrayType(ArrayType(DoubleType)))))
}
