package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.types.{ArrayType, DataType, MapType, MetadataBuilder, StructField, StructType}

import graft.schema.{SchemaCompat, SchemaRegistry}

/** Schema-generation CLI — the reference documents this tool but never
  * builds it (`/root/reference/docs/08-schema-governance.md:703-711`:
  * "generate schema from sample JSON file", plus the validator /
  * compat-checker scripts above it). Closes the onboarding workflow: a
  * team with a new dataset derives a registry-compatible `v{N}.json` from
  * a bounded sample file instead of hand-writing Spark DataType JSON.
  *
  * Scale note: inference runs ONLY here, on an explicit driver-side
  * sample file — never in the pipeline, where the registry remains the
  * sole schema source (the reference's design tenet,
  * `/root/reference/docs/01-problem-statement.md:100-104`). Publishing
  * goes through [[SchemaRegistry.publish]], so version numbering and the
  * backward-compatibility gate apply to generated schemas exactly as to
  * hand-written ones.
  *
  * {{{
  * runMain graft.SchemaGen generate --type json --sample s.json \
  *   --registry schemas --domain payments --dataset transactions
  * runMain graft.SchemaGen validate --registry schemas \
  *   --domain payments --dataset transactions [--version 2]
  * runMain graft.SchemaGen check-compat --old v1.json --new v2.json
  * }}}
  */
object SchemaGen {

  /** Infer a schema from a bounded sample file. `json`/`csv` run Spark's
    * inference over the sample; `parquet`/`orc` read the exact embedded
    * schema. */
  def infer(spark: SparkSession, format: String, samplePath: String): StructType =
    format match {
      case "json" =>
        spark.read.json(samplePath).schema
      case "csv" =>
        spark.read.option("header", "true").option("inferSchema", "true")
          .csv(samplePath).schema
      case "parquet" =>
        spark.read.parquet(samplePath).schema
      case "orc" =>
        spark.read.orc(samplePath).schema
      case other =>
        throw new IllegalArgumentException(
          s"unsupported sample type '$other' (json, csv, parquet, orc)")
    }

  /** Registry metadata scaffolding: every field (recursively) gets a
    * `description` metadata key if absent — the placeholder the
    * governance review fills in — without touching keys already set. */
  def scaffold(schema: StructType): StructType =
    StructType(schema.fields.map(scaffoldField))

  private def scaffoldField(f: StructField): StructField = {
    val meta =
      if (f.metadata.contains("description")) f.metadata
      else new MetadataBuilder().withMetadata(f.metadata)
        .putString("description", "").build()
    f.copy(dataType = scaffoldType(f.dataType), metadata = meta)
  }

  private def scaffoldType(dt: DataType): DataType = dt match {
    case s: StructType => scaffold(s)
    case a: ArrayType  => a.copy(elementType = scaffoldType(a.elementType))
    case m: MapType    => m.copy(valueType = scaffoldType(m.valueType))
    case other         => other
  }

  /** Infer → scaffold → publish as the dataset's next version (compat
    * gate included). Returns the published version number. */
  def generate(spark: SparkSession, format: String, samplePath: String,
               registryBase: String, domain: String, dataset: String,
               allowBreaking: Boolean = false): Int = {
    val schema = scaffold(infer(spark, format, samplePath))
    require(schema.fields.nonEmpty,
      s"inferred an empty schema from $samplePath — not publishing")
    new SchemaRegistry(registryBase)
      .publish(domain, dataset, schema, allowBreaking)
  }

  private def parseFlags(args: Seq[String]): Map[String, String] =
    args.grouped(2).map {
      case Seq(k, v) if k.startsWith("--") => k.stripPrefix("--") -> v
      case other => throw new IllegalArgumentException(
        s"expected --flag value pairs, got: ${other.mkString(" ")}")
    }.toMap

  private def required(flags: Map[String, String], key: String): String =
    flags.getOrElse(key,
      throw new IllegalArgumentException(s"missing required flag --$key"))

  def main(args: Array[String]): Unit = args.toSeq match {
    case Seq("generate", rest @ _*) =>
      val f = parseFlags(rest)
      val spark = SparkSession.builder()
        .master(sys.env.getOrElse("SPARK_MASTER", "local[4]"))
        .config("spark.ui.enabled", "false")
        .appName("graft-schema-gen").getOrCreate()
      try {
        val v = generate(spark, required(f, "type"), required(f, "sample"),
          required(f, "registry"), required(f, "domain"),
          required(f, "dataset"),
          allowBreaking = f.get("allow-breaking").contains("true"))
        println(s"published ${required(f, "domain")}/${required(f, "dataset")}/v$v.json")
      } finally spark.stop()

    case Seq("validate", rest @ _*) =>
      val f = parseFlags(rest)
      val reg = new SchemaRegistry(required(f, "registry"))
      val schema = reg.getSchema(required(f, "domain"), required(f, "dataset"),
        f.get("version").map(_.toInt))
      println(s"OK: ${schema.fields.length} fields — ${schema.simpleString}")

    case Seq("check-compat", rest @ _*) =>
      val f = parseFlags(rest)
      def load(p: String): StructType =
        DataType.fromJson(java.nio.file.Files.readString(
          java.nio.file.Paths.get(p))) match {
          case s: StructType => s
          case other => throw new IllegalArgumentException(
            s"$p is not a struct schema: ${other.simpleString}")
        }
      val report = SchemaCompat.check(load(required(f, "old")), load(required(f, "new")))
      println(report.describe)
      if (!report.ok) sys.exit(1)

    case other =>
      System.err.println(
        s"unknown command '${other.headOption.getOrElse("")}' — " +
        "use: generate | validate | check-compat")
      sys.exit(2)
  }
}
