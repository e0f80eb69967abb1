package graft.config

import java.nio.file.{Files, Paths}

import com.fasterxml.jackson.databind.{DeserializationFeature, ObjectMapper}
import com.fasterxml.jackson.module.scala.DefaultScalaModule

import graft.dq._
import graft.schema.SchemaRegistry

/** Pipeline configuration: env + ordered jobs (reference
  * `/root/reference/src/main/scala/com/lakehouse/ingestion/config/
  * ConfigModels.scala:41-57`). Format is JSON rather than HOCON — the
  * deployment surface is identical (a file per pipeline) and JSON parses
  * with the Jackson already on Spark's classpath (offline build, no
  * typesafe-config jar).
  */
final case class PipelineConfig(env: String,
                                schemaRegistry: Option[String] = None,
                                jobs: Seq[JobConfig] = Seq.empty)

final case class JobConfig(domain: String, dataset: String, layer: String,
                           source: SourceConfig, target: TargetConfig,
                           schemaVersion: Option[Int] = None,
                           validateSchema: Boolean = true,
                           dq: Option[DQConfig] = None)

final case class SourceConfig(`type`: String,
                              path: Option[String] = None,
                              topic: Option[String] = None,
                              bootstrapServers: Option[String] = None,
                              url: Option[String] = None,
                              table: Option[String] = None,
                              streaming: Boolean = false,
                              options: Map[String, String] = Map.empty)

final case class TargetConfig(format: String, identifier: String,
                              partitions: Seq[String] = Seq.empty,
                              mode: String = "append",
                              checkpoint: Option[String] = None,
                              triggerInterval: String = "30 seconds")

final case class DQConfig(policy: String = "log_only",
                          quarantine: Option[String] = None,
                          warnOnly: Seq[String] = Seq.empty,
                          checks: Seq[CheckConfig] = Seq.empty) {

  def toRuleSet: DQRuleSet = DQRuleSet(
    checks.map(_.toCheck),
    policy.toLowerCase match {
      case "fail_fast"  => DQPolicy.FailFast
      case "quarantine" => DQPolicy.QuarantineRows
      case "log_only"   => DQPolicy.LogOnly
      case other => throw new IllegalArgumentException(s"unknown DQ policy '$other'")
    },
    warnOnly.toSet)
}

/** One check definition; `type` selects the [[graft.dq.DQCheck]] subclass —
  * this wiring is what the reference hardcoded to `None`
  * (`core/IngestionRunner.scala:118-119`), leaving its DQ dead. */
final case class CheckConfig(`type`: String,
                             column: Option[String] = None,
                             columns: Seq[String] = Seq.empty,
                             min: Option[Double] = None,
                             max: Option[Double] = None,
                             pattern: Option[String] = None,
                             allowed: Seq[String] = Seq.empty,
                             minRows: Option[Long] = None,
                             name: Option[String] = None,
                             sql: Option[String] = None,
                             exact: Boolean = true) {

  private def req[A](o: Option[A], what: String): A =
    o.getOrElse(throw new IllegalArgumentException(
      s"check '${`type`}' needs $what"))

  // Jackson + erasure can leave a boxed Integer inside Option[Double]
  // (e.g. `"min": 0`); normalize through Number without unboxing.
  private def asDouble(o: Option[Double]): Option[Double] =
    o.asInstanceOf[Option[Number]].map(_.doubleValue)
  private def asLong(o: Option[Long]): Option[Long] =
    o.asInstanceOf[Option[Number]].map(_.longValue)

  def toCheck: DQCheck = `type`.toLowerCase match {
    case "not_null"       => NotNullCheck(req(column, "column"))
    case "range"          => RangeCheck(req(column, "column"), asDouble(min), asDouble(max))
    case "regex"          => RegexCheck(req(column, "column"), req(pattern, "pattern"))
    case "allowed_values" => AllowedValuesCheck(req(column, "column"), allowed)
    case "unique_key"     => UniqueKeyCheck(if (columns.nonEmpty) columns else Seq(req(column, "column or columns")), exact)
    case "row_count_min"  => RowCountCheck(req(asLong(minRows), "minRows"))
    case "predicate"      => PredicateCheck(req(name, "name"), req(sql, "sql"))
    case other => throw new IllegalArgumentException(s"unknown check type '$other'")
  }
}

/** Loads + eagerly validates a pipeline config: every job's schema ref must
  * resolve at load time, failing with the expected path (reference
  * `config/ConfigLoader.scala:69-100`). */
object ConfigLoader {

  private val mapper: ObjectMapper = {
    val m = new ObjectMapper()
    m.registerModule(DefaultScalaModule)
    m.configure(DeserializationFeature.FAIL_ON_UNKNOWN_PROPERTIES, true)
    m
  }

  final case class ConfigValidationException(message: String)
      extends RuntimeException(message)

  def parse(json: String): PipelineConfig =
    mapper.readValue(json, classOf[PipelineConfig])

  def loadFromFile(path: String, validateSchemas: Boolean = true): PipelineConfig = {
    val cfg = parse(Files.readString(Paths.get(path)))
    if (validateSchemas) cfg.schemaRegistry.foreach { base =>
      val registry = new SchemaRegistry(base)
      cfg.jobs.filter(_.validateSchema).foreach { j =>
        try registry.getSchema(j.domain, j.dataset, j.schemaVersion)
        catch {
          case e: graft.schema.SchemaNotFoundException =>
            throw ConfigValidationException(
              s"job ${j.domain}/${j.dataset}: ${e.getMessage}")
        }
      }
    }
    cfg
  }
}
