package graft.dq

import scala.util.Try

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructType}

import graft.text.TextOps

/** Metadata-driven PII protection: the reference marks fields `pii: true`
  * in its schema registry (`/root/reference/schemas/README.md:127`, e.g.
  * `schemas/payments/transactions/v1.json:116`) but never consumes the
  * flag — no masking, no redaction, nothing reads it. Here the flag drives
  * an on-write transform in [[graft.core.IngestionJob]]: every `pii: true`
  * column is masked before it can land in a sink (including the quarantine
  * sink — rejected rows are stored too).
  *
  * Strategies (all type-preserving, so the sink schema contract holds):
  *  - Hash: strings -> sha2-256; integral keys -> xxhash64 (long) or its
  *    31-bit fold (int). Deterministic, so a masked id still
  *    joins/groups/deduplicates. Other types (dates, floats, binaries)
  *    can't hold a digest and null out.
  *  - Nullify: every pii column -> NULL of its own type.
  *  - RedactText: strings -> regex scrub (for free-text columns where the
  *    VALUE is legitimate but may EMBED emails/phones/ids); non-strings
  *    null out.
  *
  * Per-row narrow and codegen'd — masking adds zero shuffles.
  */
object PiiMask {

  sealed trait Strategy
  object Strategy {
    case object Hash extends Strategy
    /** Hash with a secret salt prepended — use for LOW-ENTROPY identifiers
      * (emails, phone numbers), where an unsalted digest falls to a
      * dictionary attack; the salt keeps determinism (joins still work)
      * while binding the mapping to the key holder. */
    final case class KeyedHash(salt: String) extends Strategy
    case object Nullify extends Strategy
    final case class RedactText(rules: Seq[(String, String)]) extends Strategy

    /** Built-in scrub set for RedactText: emails, international-ish phone
      * numbers, IPv4 — RE2-safe (no lookbehind), engine-portable. */
    val defaultRules: Seq[(String, String)] = Seq(
      "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}" -> "<EMAIL>",
      "\\+?[0-9][0-9()\\- ]{7,}[0-9]" -> "<PHONE>",
      "\\b(?:[0-9]{1,3}\\.){3}[0-9]{1,3}\\b" -> "<IP>")

    /** Config spelling -> strategy ("hash" | "hash:<salt>" | "null" |
      * "redact"). */
    def fromString(s: String): Strategy =
      if (s.toLowerCase.startsWith("hash:") && s.length > 5)
        KeyedHash(s.substring(5)) // salt keeps its original case
      else s.toLowerCase match {
        case "hash"             => Hash
        case "null" | "nullify" => Nullify
        case "redact"           => RedactText(defaultRules)
        case other => throw new IllegalArgumentException(
          s"unknown pii mask strategy '$other' (hash|hash:<salt>|null|redact)")
      }
  }

  /** Field names flagged `pii: true` in the schema's field metadata. */
  def piiColumns(schema: StructType): Seq[String] =
    schema.fields.toSeq
      .filter(f => Try(f.metadata.getBoolean("pii")).getOrElse(false))
      .map(_.name)

  /** Masks every `pii: true` column of `schema` that is present in `df`
    * (case-insensitive match, like schema validation). Non-pii columns
    * pass through untouched; column order is preserved. */
  def mask(df: DataFrame, schema: StructType,
           strategy: Strategy = Strategy.Hash): DataFrame = {
    val flagged = piiColumns(schema).map(_.toLowerCase).toSet
    if (flagged.isEmpty) df
    else df.select(df.schema.fields.toSeq.map { f =>
      if (!flagged.contains(f.name.toLowerCase)) col(f.name)
      else maskColumn(col(f.name), f.dataType == StringType, f, strategy).as(f.name)
    }: _*)
  }

  private def maskColumn(c: Column, isString: Boolean,
                         f: org.apache.spark.sql.types.StructField,
                         strategy: Strategy): Column = {
    import org.apache.spark.sql.types.{IntegerType, LongType}
    strategy match {
      case Strategy.Hash if isString =>
        // preserve NULL (a hash of null would mint a value, breaking
        // not-null DQ semantics downstream)
        when(c.isNull, lit(null).cast(StringType)).otherwise(sha2(c, 256))
      case Strategy.KeyedHash(salt) if isString =>
        when(c.isNull, lit(null).cast(StringType))
          .otherwise(sha2(concat(lit(salt), c), 256))
      case Strategy.Hash | Strategy.KeyedHash(_) if f.dataType == LongType =>
        when(c.isNull, lit(null).cast(LongType)).otherwise(xxhash64(saltedLong(c, strategy)))
      case Strategy.Hash | Strategy.KeyedHash(_) if f.dataType == IntegerType =>
        when(c.isNull, lit(null).cast(IntegerType))
          .otherwise(pmod(xxhash64(saltedLong(c, strategy)), lit(Int.MaxValue.toLong))
            .cast(IntegerType))
      case Strategy.RedactText(rules) if isString => TextOps.redact(c, rules)
      case _ => lit(null).cast(f.dataType)
    }
  }

  private def saltedLong(c: Column, strategy: Strategy): Column = strategy match {
    case Strategy.KeyedHash(salt) => concat(lit(salt), c.cast(StringType))
    case _                        => c
  }
}
