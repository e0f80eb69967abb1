package graft.dq

import org.apache.spark.sql.types.{Metadata, StructType}
import scala.util.Try

/** Derives DQ checks from schema-registry field metadata.
  *
  * The reference documents `allowed_values`, `min_value`/`max_value`, and
  * nullability in its schema JSON (`/root/reference/schemas/README.md:112-139`,
  * e.g. `schemas/payments/transactions/v1.json:41-49`) but never enforces any
  * of it (SURVEY.md §1.2). Here the metadata is compiled straight into the
  * single-pass [[DQRuleSet]], closing that gap.
  */
object MetadataChecks {

  def fromSchema(schema: StructType): Seq[DQCheck] =
    schema.fields.toSeq.flatMap { f =>
      val m = f.metadata
      val notNull =
        if (!f.nullable) Seq(NotNullCheck(f.name)) else Seq.empty
      val allowed = stringArray(m, "allowed_values")
        .map(vs => AllowedValuesCheck(f.name, vs)).toSeq
      val lo = numeric(m, "min_value")
      val hi = numeric(m, "max_value")
      val range =
        if (lo.isDefined || hi.isDefined) Seq(RangeCheck(f.name, lo, hi))
        else Seq.empty
      val pattern = Try(m.getString("pattern")).toOption
        .map(p => RegexCheck(f.name, p)).toSeq
      // media_type_column on a binary field: the payload must decode as
      // the container that column declares (min_decodable_fraction
      // tolerance, default all rows) — the multimodal DQ gate
      val media = Try(m.getString("media_type_column")).toOption
        .map(tc => MediaDecodableCheck(f.name, tc,
          numeric(m, "min_decodable_fraction").getOrElse(1.0))).toSeq
      notNull ++ allowed ++ range ++ pattern ++ media
    }

  private def numeric(m: Metadata, key: String): Option[Double] =
    if (!m.contains(key)) None
    else Try(m.getDouble(key)).toOption
      .orElse(Try(m.getLong(key).toDouble).toOption)

  private def stringArray(m: Metadata, key: String): Option[Seq[String]] =
    if (!m.contains(key)) None
    else Try(m.getStringArray(key).toSeq).toOption.filter(_.nonEmpty)
}
