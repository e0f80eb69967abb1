package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Distinct character n-grams of a string, as a native Catalyst expression.
  * Equal to
  * `array_distinct(transform(sequence(1, length(s)-n+1), i -> substring(s, i, n)))`
  * (first-occurrence order) but compiled — the HOF form is interpreted and
  * re-slices via substring per element. n-grams are produced over Unicode
  * code points (UTF8String.substringSQL semantics), matching the SQL form.
  */
case class CharNgrams(child: Expression, n: Int) extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"char_ngrams needs string, got $other")
    }

  override def nullSafeEval(input: Any): Any =
    CharNgrams.compute(input.asInstanceOf[UTF8String], n)

  /** Real codegen (one static call, stage stays whole-stage compiled). */
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.CharNgrams.compute($c, $n);")

  override protected def withNewChildInternal(newChild: Expression): CharNgrams =
    copy(child = newChild)

  override def prettyName: String = "char_ngrams"
}

object CharNgrams {
  import org.apache.spark.sql.graft.bridge

  /** The whole-string kernel — shared by interpreted eval and codegen. */
  def compute(s: UTF8String, n: Int): ArrayData = {
    val bytes = s.getBytes
    // One pass to find code-point byte boundaries; substringSQL would rescan
    // from offset 0 per n-gram (quadratic in doc length).
    val offs = new Array[Int](bytes.length + 1)
    var nChars = 0
    var bi = 0
    while (bi < bytes.length) {
      offs(nChars) = bi
      val b = bytes(bi) & 0xff
      bi += (if (b < 0x80) 1 else if (b < 0xe0) 2 else if (b < 0xf0) 3 else 4)
      nChars += 1
    }
    offs(nChars) = bytes.length
    if (nChars < n) return new GenericArrayData(Array.empty[Any])
    val seen = new java.util.LinkedHashSet[UTF8String]()
    var i = 0
    while (i <= nChars - n) {
      val from = offs(i)
      seen.add(UTF8String.fromBytes(java.util.Arrays.copyOfRange(bytes, from, offs(i + n))))
      i += 1
    }
    val out = new Array[Any](seen.size())
    val it = seen.iterator()
    i = 0
    while (it.hasNext) { out(i) = it.next(); i += 1 }
    new GenericArrayData(out)
  }

  /** Column-API entry point: charNgrams(stringColumn, n). */
  def charNgrams(s: Column, n: Int): Column =
    bridge.column(CharNgrams(bridge.expression(s), n))
}
