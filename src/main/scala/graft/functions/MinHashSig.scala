package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** MinHash signature over a shingle-set column, as a native Catalyst
  * expression: slot p = min over shingles g of hex(md5("s&lt;p&gt;|" + g)).
  *
  * Semantically identical to
  * `array(array_min(transform(sg, g => md5(concat(lit("s0|"), g)))), ...)`
  * but ~25x faster: higher-order functions are interpreted per element in
  * Spark (and project-collapse re-inlines the shingle build into every
  * slot), whereas this runs one compiled pass with a reused MessageDigest.
  * Hex-string min == unsigned-byte min (hex digits are monotone in nibble
  * value), so only the k winning digests are hex-encoded.
  *
  * Scale: per-row, no shuffle, constant memory (k x 16 bytes).
  */
case class MinHashSig(child: Expression, perms: Int) extends UnaryExpression
    with CodegenFallback {

  override def dataType: DataType = ArrayType(StringType, containsNull = true)

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"minhash_sig needs array<string>, got $other")
    }

  private def unsignedLess(a: Array[Byte], b: Array[Byte]): Boolean = {
    var i = 0
    while (i < a.length) {
      val ai = a(i) & 0xff
      val bi = b(i) & 0xff
      if (ai != bi) return ai < bi
      i += 1
    }
    false
  }

  private def hex(d: Array[Byte]): UTF8String = {
    val digits = "0123456789abcdef"
    val out = new Array[Byte](d.length * 2)
    var i = 0
    while (i < d.length) {
      out(2 * i) = digits((d(i) >> 4) & 0xf).toByte
      out(2 * i + 1) = digits(d(i) & 0xf).toByte
      i += 1
    }
    UTF8String.fromBytes(out)
  }

  @transient private lazy val salts: Array[Array[Byte]] =
    Array.tabulate(perms)(p => s"s$p|".getBytes("UTF-8"))
  @transient private lazy val localMd =
    new ThreadLocal[MessageDigest] {
      override def initialValue(): MessageDigest = MessageDigest.getInstance("MD5")
    }

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val mins = new Array[Array[Byte]](perms)
    val md = localMd.get()
    var i = 0
    while (i < arr.numElements()) {
      if (!arr.isNullAt(i)) {
        val g = arr.getUTF8String(i).getBytes
        var p = 0
        while (p < perms) {
          md.reset()
          md.update(salts(p))
          md.update(g)
          val d = md.digest()
          if (mins(p) == null || unsignedLess(d, mins(p))) mins(p) = d
          p += 1
        }
      }
      i += 1
    }
    val out = new Array[Any](perms)
    var p = 0
    while (p < perms) {
      out(p) = if (mins(p) == null) null else hex(mins(p))
      p += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)

  override def prettyName: String = "minhash_sig"
}

object MinHashSig {
  import org.apache.spark.sql.graft.bridge

  /** Column-API entry point: minhash_sig(shingleSetColumn, k). */
  def minhashSig(shingleSet: Column, perms: Int): Column =
    bridge.column(MinHashSig(bridge.expression(shingleSet), perms))
}
