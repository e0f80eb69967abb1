package graft.schema

import org.apache.spark.sql.catalyst.expressions.Cast
import org.apache.spark.sql.types.{DataType, StructField, StructType}

/** Registry-level schema-compatibility gate — the check the reference's
  * governance doc specifies but leaves as a comment stub
  * (`/root/reference/docs/08-schema-governance.md:274-281` has
  * `validateSchemaCompatibility` with "// etc."; `:391-402` states the
  * rules). Within a schema version:
  *
  *  - allowed: add a NULLABLE column; relax NOT NULL -> nullable; widen a
  *    type along a lossless upcast (int -> long, float -> double — Spark's
  *    `Cast.canUpCast`); metadata/doc changes.
  *  - breaking (publish requires a NEW version): remove a column; add a
  *    required (non-nullable) column; narrow or incompatibly change a
  *    type; tighten nullable -> NOT NULL.
  *
  * Nested structs check recursively (a dropped nested field is just as
  * breaking as a dropped top-level one). Use [[check]] to gate a registry
  * publish: `ok` means same-version publishable; `widenings` are the
  * allowed-but-flagged type changes an operator should eyeball.
  */
object SchemaCompat {

  final case class CompatReport(additions: Seq[String],
                                widenings: Seq[String],
                                relaxedNullability: Seq[String],
                                breaking: Seq[String]) {
    /** Publishable under the SAME version (no breaking changes). */
    def ok: Boolean = breaking.isEmpty
    def describe: String =
      if (ok) "compatible" else s"needs new version: ${breaking.mkString("; ")}"
  }

  /** Gate `next` against the currently-published `current`. */
  def check(current: StructType, next: StructType): CompatReport =
    checkAt(current, next, prefix = "")

  /** Throwing spelling for publish paths. */
  def validateOrThrow(current: StructType, next: StructType): CompatReport = {
    val r = check(current, next)
    if (!r.ok) throw new IllegalArgumentException(
      s"schema change is not backward-compatible — ${r.describe}")
    r
  }

  private def checkAt(current: StructType, next: StructType,
                      prefix: String): CompatReport = {
    def path(n: String) = if (prefix.isEmpty) n else s"$prefix.$n"
    val nextByName = next.fields.map(f => f.name.toLowerCase -> f).toMap
    val curByName = current.fields.map(f => f.name.toLowerCase -> f).toMap

    val removed = current.fields.toSeq
      .filterNot(f => nextByName.contains(f.name.toLowerCase))
      .map(f => s"column ${path(f.name)} was removed (or renamed)")

    val added = next.fields.toSeq
      .filterNot(f => curByName.contains(f.name.toLowerCase))
    val (addedOk, addedBreaking) = added.partition(_.nullable)

    val common = current.fields.toSeq.flatMap { cf =>
      nextByName.get(cf.name.toLowerCase).map(nf => (cf, nf))
    }
    val reports = common.map { case (cf, nf) => fieldChange(cf, nf, path(cf.name)) }

    CompatReport(
      additions = addedOk.map(f => s"added nullable column ${path(f.name)}"),
      widenings = reports.flatMap(_.widenings),
      relaxedNullability = reports.flatMap(_.relaxedNullability) ++
        common.collect { case (cf, nf) if !cf.nullable && nf.nullable =>
          s"column ${path(cf.name)} relaxed NOT NULL -> nullable" },
      breaking = removed ++
        addedBreaking.map(f =>
          s"added REQUIRED column ${path(f.name)} (new columns must be nullable)") ++
        common.collect { case (cf, nf) if cf.nullable && !nf.nullable =>
          s"column ${path(cf.name)} tightened nullable -> NOT NULL" } ++
        reports.flatMap(_.breaking))
  }

  private def fieldChange(cf: StructField, nf: StructField,
                          path: String): CompatReport =
    (cf.dataType, nf.dataType) match {
      case (a, b) if a == b =>
        CompatReport(Nil, Nil, Nil, Nil)
      case (a: StructType, b: StructType) =>
        checkAt(a, b, path)
      case (a, b) if Cast.canUpCast(a, b) =>
        CompatReport(Nil,
          Seq(s"column $path widened ${a.simpleString} -> ${b.simpleString}"),
          Nil, Nil)
      case (a, b) =>
        CompatReport(Nil, Nil, Nil,
          Seq(s"column $path changed type ${a.simpleString} -> ${b.simpleString} " +
            "(not a lossless widening)"))
    }
}
