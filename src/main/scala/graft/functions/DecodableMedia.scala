package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, BooleanType, DataType, StringType}

/** `decodable_media(payload BINARY, media_type STRING) -> BOOLEAN`: does
  * the payload actually parse as its declared container? Runs the REAL
  * JDK codecs — `javax.imageio` for `image/` types, `javax.sound.sampled`
  * container probing for `audio/` types — as a native Catalyst expression
  * with codegen (one static call from generated code, the stage stays
  * whole-stage compiled), so a decodable-fraction DQ gate slots into the
  * engine's single-pass aggregate plan like any other check
  * ([[graft.dq.MediaDecodableCheck]]).
  *
  * Unknown/unsupported media types return false (a payload whose type
  * the pipeline can't verify is not decodable-as-declared). Null inputs
  * propagate null (standard null-intolerant semantics; the DQ check
  * coalesces nulls to violations).
  *
  * Scale note: probing decodes the container header/raster per row — the
  * same work the downstream decode chain does once anyway; for gate-only
  * pipelines at 100 TB the check runs inside the one DQ aggregate scan,
  * adding zero extra passes over the payload bytes. */
case class DecodableMedia(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = BooleanType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (BinaryType, StringType) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"decodable_media needs (binary, string), got $other")
    }

  override def nullSafeEval(payload: Any, mediaType: Any): Any =
    java.lang.Boolean.valueOf(DecodableMedia.decodes(
      payload.asInstanceOf[Array[Byte]], mediaType.toString))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (p, t) =>
      s"${ev.value} = graft.functions.DecodableMedia.decodes($p, $t.toString());")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DecodableMedia =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "decodable_media"
}

object DecodableMedia {
  import org.apache.spark.sql.graft.bridge

  // executor-side, once per JVM: never spill codec scratch to disk
  javax.imageio.ImageIO.setUseCache(false)

  /** The row kernel — shared by interpreted eval and codegen. */
  def decodes(payload: Array[Byte], mediaType: String): Boolean =
    try {
      if (mediaType.startsWith("image/"))
        javax.imageio.ImageIO.read(
          new java.io.ByteArrayInputStream(payload)) != null
      else if (mediaType.startsWith("audio/")) {
        javax.sound.sampled.AudioSystem.getAudioInputStream(
          new java.io.ByteArrayInputStream(payload)).close()
        true
      } else false
    } catch {
      case _: javax.sound.sampled.UnsupportedAudioFileException |
           _: java.io.IOException => false
    }

  /** Column-API entry point. */
  def decodableMedia(payload: Column, mediaType: Column): Column =
    bridge.column(DecodableMedia(
      bridge.expression(payload), bridge.expression(mediaType)))

  /** Overload for a constant declared type. */
  def decodableMedia(payload: Column, mediaType: String): Column =
    decodableMedia(payload, org.apache.spark.sql.functions.lit(mediaType))
}
