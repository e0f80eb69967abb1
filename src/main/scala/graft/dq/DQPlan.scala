package graft.dq

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

sealed trait DQStatus
object DQStatus {
  case object Pass    extends DQStatus
  case object Warning extends DQStatus
  case object Fail    extends DQStatus
}

/** What to do when a ruleset fails (reference: `core/IngestionJob.scala:101-121`;
  * QUARANTINE there is an unimplemented TODO — here it is real, see
  * [[Quarantine]]). */
sealed trait DQPolicy
object DQPolicy {
  case object FailFast   extends DQPolicy
  case object LogOnly    extends DQPolicy
  case object QuarantineRows extends DQPolicy
}

final case class DQResult(check: String, violations: Long, rowCount: Long,
                          status: DQStatus)

final case class DQSummary(results: Seq[DQResult], rowCount: Long) {
  def overall: DQStatus =
    if (results.exists(_.status == DQStatus.Fail)) DQStatus.Fail
    else if (results.exists(_.status == DQStatus.Warning)) DQStatus.Warning
    else DQStatus.Pass
  def failed: Seq[DQResult] = results.filter(_.status != DQStatus.Pass)
}

final case class DQException(summary: DQSummary)
    extends RuntimeException(
      s"DQ failed: ${summary.failed.map(r => s"${r.check}=${r.violations}").mkString(", ")}")

/** Compiles a ruleset into ONE aggregate pass over the DataFrame.
  *
  * `metricsDF` is the declarative form — a one-row DataFrame with `row_count`
  * plus one violation/distinct metric per check. Catalyst turns this into a
  * single whole-stage-codegen'd scan with partial aggregation; on a cluster
  * the shuffle carries exactly one row per partition. This is the fix for the
  * reference's N+1-scans anti-pattern (SURVEY.md §4.2.1).
  */
final case class DQRuleSet(checks: Seq[DQCheck],
                           policy: DQPolicy = DQPolicy.LogOnly,
                           warnOnly: Set[String] = Set.empty) {

  def metricColumns: Seq[Column] = checks.map(_.aggExpr)

  /** One-row DataFrame: row_count + one metric column per check. */
  def metricsDF(df: DataFrame): DataFrame =
    df.agg(count(lit(1)).as("row_count"), metricColumns: _*)

  /** Execute the single-pass aggregate and evaluate each check. */
  def run(df: DataFrame): DQSummary = {
    val row = metricsDF(df).collect()(0)
    val rowCount = row.getAs[Long]("row_count")
    val results = checks.map { c =>
      val v = c.violations(row.getAs[Any](c.name), rowCount)
      val status =
        if (c.passes(v, rowCount)) DQStatus.Pass
        else if (warnOnly.contains(c.name)) DQStatus.Warning
        else DQStatus.Fail
      DQResult(c.name, v, rowCount, status)
    }
    DQSummary(results, rowCount)
  }

  /** run + policy enforcement. Returns (cleanRows, quarantinedRows?). */
  def enforce(df: DataFrame): (DataFrame, Option[DataFrame], DQSummary) = {
    val summary = run(df)
    policy match {
      case DQPolicy.FailFast if summary.overall == DQStatus.Fail =>
        throw DQException(summary)
      case DQPolicy.QuarantineRows if summary.overall == DQStatus.Fail =>
        val (clean, bad) = Quarantine.split(df, checks)
        (clean, Some(bad), summary)
      case _ =>
        (df, None, summary)
    }
  }
}

/** Row-level split of a DataFrame into (clean, quarantined) by the union of
  * row-expressible violation predicates, tagging quarantined rows with a
  * `dq_reasons` CSV column. Implements the reference's TODO
  * (`core/IngestionJob.scala:110-113`, `docs/02-tech-spec.md:124-131`).
  *
  * Single narrow projection per branch — no shuffle; callers writing both
  * branches should `persist()` upstream if the source is expensive to rescan.
  */
object Quarantine {
  def reasonsColumn(checks: Seq[DQCheck]): Column = {
    val tagged = checks.flatMap { c =>
      c.rowPredicate.map(p => when(p, lit(c.name)))
    }
    if (tagged.isEmpty) lit("")
    else concat_ws(",", tagged: _*)
  }

  def split(df: DataFrame, checks: Seq[DQCheck]): (DataFrame, DataFrame) = {
    val reasons = reasonsColumn(checks)
    val tagged = df.withColumn("dq_reasons", reasons)
    (tagged.filter(col("dq_reasons") === "").drop("dq_reasons"),
     tagged.filter(col("dq_reasons") =!= ""))
  }
}
