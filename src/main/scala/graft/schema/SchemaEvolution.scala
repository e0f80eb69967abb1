package graft.schema

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Schema-evolution conformance: reshape a DataFrame to a target registry
  * schema so readers of mixed-version data (bronze files written under v1,
  * registry now at v2) see one stable shape.
  *
  * The reference validates version drift but offers no remediation
  * (`/root/reference/src/main/scala/com/lakehouse/ingestion/schema/
  * SchemaValidator.scala:45-92` only reports). Policy here mirrors its
  * leniency rules: missing nullable columns materialize as typed nulls,
  * compatible type drift casts, extra columns drop (or fail, configurably),
  * and a missing NON-nullable column is always an error — inventing
  * mandatory data would corrupt silver.
  *
  * Pure projection — no shuffle, fuses into whatever scan precedes it.
  */
object SchemaEvolution {

  final case class EvolutionException(message: String)
      extends RuntimeException(message)

  def conform(df: DataFrame, target: StructType,
              failOnExtra: Boolean = false): DataFrame = {
    val present = df.schema.fields.map(f => f.name -> f).toMap
    val targetNames = target.fieldNames.toSet
    val extras = df.columns.filterNot(targetNames.contains)
    if (failOnExtra && extras.nonEmpty)
      throw EvolutionException(s"extra columns: ${extras.mkString(", ")}")
    val cols = target.fields.map { tf =>
      present.get(tf.name) match {
        case Some(af) if af.dataType == tf.dataType => col(tf.name)
        case Some(af) if evolvableCast(af.dataType, tf.dataType) =>
          col(tf.name).cast(tf.dataType)
        case Some(af) =>
          throw EvolutionException(
            s"column ${tf.name}: cannot evolve ${af.dataType.simpleString} " +
              s"to ${tf.dataType.simpleString}")
        case None if tf.nullable =>
          lit(null).cast(tf.dataType).as(tf.name)
        case None =>
          throw EvolutionException(
            s"column ${tf.name} is NOT NULL in the target schema but absent " +
              "from the data — cannot materialize")
      }
    }
    df.select(cols.toIndexedSeq: _*)
  }

  /** Safe widenings only (int->long, float->double, decimal(10,2)->
    * decimal(18,4), ...): lossy narrowing must FAIL, not silently truncate.
    * Decimal pairs go through `Cast.canUpCast` alone — the blanket
    * decimal-decimal leniency of `typesCompatible(strictDecimal = false)`
    * is a validation-reporting rule, and using it here let
    * decimal(18,4) data cast down to a decimal(8,0) target (scale silently
    * rounds, overflow nulls at runtime). */
  private def evolvableCast(from: org.apache.spark.sql.types.DataType,
                            to: org.apache.spark.sql.types.DataType): Boolean = {
    import org.apache.spark.sql.types.DecimalType
    (from, to) match {
      case (_: DecimalType, _: DecimalType) =>
        org.apache.spark.sql.catalyst.expressions.Cast.canUpCast(from, to)
      case _ =>
        SchemaValidator.typesCompatible(to, from, strictDecimal = true) ||
          org.apache.spark.sql.catalyst.expressions.Cast.canUpCast(from, to)
    }
  }

  /** Conform every frame to the registry's latest schema and union them —
    * the mixed-version bronze read path. */
  def unionEvolved(frames: Seq[DataFrame], target: StructType): DataFrame = {
    require(frames.nonEmpty)
    frames.map(conform(_, target)).reduce(_.unionByName(_))
  }
}
