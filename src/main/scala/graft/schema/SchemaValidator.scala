package graft.schema

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.types.{DataType, DecimalType, StructType}

/** Structural schema validation of a DataFrame against a registry schema.
  *
  * Re-expresses `/root/reference/src/main/scala/com/lakehouse/ingestion/
  * schema/SchemaValidator.scala:45-140`: strict on column presence and type,
  * lenient on extra columns and (configurably) on decimal precision/scale —
  * the reference hard-codes decimal leniency (`SchemaValidator.scala:131-136`);
  * here `strictDecimal` makes it a choice. Nullability differences are
  * reported but never fatal (reference behavior, `:69-74`). Pure driver-side
  * `StructType` comparison — no Spark job, any data scale.
  */
object SchemaValidator {

  final case class ValidationResult(missingColumns: Seq[String],
                                    extraColumns: Seq[String],
                                    typeMismatches: Seq[TypeMismatch],
                                    nullabilityDiffs: Seq[String]) {
    def isValid: Boolean = missingColumns.isEmpty && typeMismatches.isEmpty
    def describe: String = {
      val parts = Seq(
        if (missingColumns.nonEmpty) Some(s"missing: ${missingColumns.mkString(", ")}") else None,
        if (typeMismatches.nonEmpty)
          Some(s"type mismatches: ${typeMismatches.map(_.describe).mkString("; ")}") else None,
        if (extraColumns.nonEmpty) Some(s"extra: ${extraColumns.mkString(", ")}") else None,
        if (nullabilityDiffs.nonEmpty)
          Some(s"nullability: ${nullabilityDiffs.mkString(", ")}") else None,
      ).flatten
      if (parts.isEmpty) "valid" else parts.mkString(" | ")
    }
  }

  final case class TypeMismatch(column: String, expected: DataType, actual: DataType) {
    def describe: String =
      s"$column expected ${expected.simpleString} got ${actual.simpleString}"
  }

  final case class SchemaValidationException(result: ValidationResult)
      extends RuntimeException(s"schema validation failed: ${result.describe}")

  def validate(df: DataFrame, expected: StructType,
               strictDecimal: Boolean = false): ValidationResult =
    validateStruct(df.schema, expected, strictDecimal)

  def validateStruct(actual: StructType, expected: StructType,
                     strictDecimal: Boolean = false): ValidationResult = {
    val actualByName = actual.fields.map(f => f.name -> f).toMap
    val expectedNames = expected.fieldNames.toSet

    val missing = expected.fields.collect {
      case f if !actualByName.contains(f.name) => f.name
    }.toSeq
    val extra = actual.fields.collect {
      case f if !expectedNames.contains(f.name) => f.name
    }.toSeq
    val mismatches = expected.fields.flatMap { ef =>
      actualByName.get(ef.name).collect {
        case af if !typesCompatible(ef.dataType, af.dataType, strictDecimal) =>
          TypeMismatch(ef.name, ef.dataType, af.dataType)
      }
    }.toSeq
    val nullDiffs = expected.fields.flatMap { ef =>
      actualByName.get(ef.name).collect {
        case af if !ef.nullable && af.nullable =>
          s"${ef.name} declared NOT NULL but source is nullable"
      }
    }.toSeq
    ValidationResult(missing, extra, mismatches, nullDiffs)
  }

  /** Decimal-lenient recursive type compatibility
    * (reference `SchemaValidator.scala:126-140`). */
  def typesCompatible(expected: DataType, actual: DataType,
                      strictDecimal: Boolean): Boolean =
    (expected, actual) match {
      case (_: DecimalType, _: DecimalType) if !strictDecimal => true
      case (e: StructType, a: StructType) =>
        e.length == a.length && e.fields.zip(a.fields).forall { case (ef, af) =>
          ef.name == af.name && typesCompatible(ef.dataType, af.dataType, strictDecimal)
        }
      case (org.apache.spark.sql.types.ArrayType(e, _),
            org.apache.spark.sql.types.ArrayType(a, _)) =>
        typesCompatible(e, a, strictDecimal)
      case (org.apache.spark.sql.types.MapType(ek, ev, _),
            org.apache.spark.sql.types.MapType(ak, av, _)) =>
        typesCompatible(ek, ak, strictDecimal) && typesCompatible(ev, av, strictDecimal)
      case (e, a) => e == a
    }

  def validateOrThrow(df: DataFrame, expected: StructType,
                      strictDecimal: Boolean = false): Unit = {
    val r = validate(df, expected, strictDecimal)
    if (!r.isValid) throw SchemaValidationException(r)
  }
}
