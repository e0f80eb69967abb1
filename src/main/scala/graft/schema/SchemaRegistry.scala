package graft.schema

import java.nio.file.{Files, Path, Paths}

import scala.collection.concurrent.TrieMap
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.types.{DataType, StructType}

/** Versioned schema registry: `{base}/{domain}/{dataset}/v{N}.json` files
  * holding Spark `StructType` JSON (`DataType.fromJson`), newest = max N.
  *
  * Mirrors the reference's registry contract
  * (`/root/reference/src/main/scala/com/lakehouse/ingestion/schema/
  * SchemaRegistry.scala:71-150` — resolution, latest-version pick at
  * :132-150, JSON parse at :248-265, caching at :71-83) with two fixes:
  * version listing is directory-driven rather than probing v1..v10
  * (the reference's classpath mode, `SchemaRegistry.scala:118-126`), and
  * version sort is numeric so v10 > v9. Schema inference is never used —
  * the registry is the only schema source (design tenet,
  * `/root/reference/docs/01-problem-statement.md:100-104`).
  */
final class SchemaRegistry(basePath: String) {

  private val cache = TrieMap.empty[(String, String, Int), StructType]

  private def datasetDir(domain: String, dataset: String): Path =
    Paths.get(basePath, domain, dataset)

  /** Numeric versions present for a dataset, ascending. */
  def listVersions(domain: String, dataset: String): Seq[Int] = {
    val dir = datasetDir(domain, dataset)
    if (!Files.isDirectory(dir)) Seq.empty
    else
      Files.list(dir).iterator().asScala
        .map(_.getFileName.toString)
        .collect { case s if s.matches("v\\d+\\.json") =>
          s.stripPrefix("v").stripSuffix(".json").toInt
        }
        .toSeq.sorted
  }

  def latestVersion(domain: String, dataset: String): Option[Int] =
    listVersions(domain, dataset).lastOption

  /** Resolve a schema; `version=None` means latest. */
  def getSchema(domain: String, dataset: String,
                version: Option[Int] = None): StructType = {
    val v = version.orElse(latestVersion(domain, dataset)).getOrElse {
      throw SchemaNotFoundException(domain, dataset, version,
        datasetDir(domain, dataset).toString)
    }
    cache.getOrElseUpdate((domain, dataset, v), {
      val file = datasetDir(domain, dataset).resolve(s"v$v.json")
      if (!Files.isRegularFile(file))
        throw SchemaNotFoundException(domain, dataset, Some(v), file.toString)
      DataType.fromJson(Files.readString(file)) match {
        case s: StructType => s
        case other =>
          throw new IllegalArgumentException(
            s"$file is not a struct schema: ${other.simpleString}")
      }
    })
  }
}

final case class SchemaNotFoundException(domain: String, dataset: String,
                                         version: Option[Int], path: String)
    extends RuntimeException(
      s"schema $domain/$dataset${version.fold("")(v => s"/v$v")} not found (expected at $path)")
