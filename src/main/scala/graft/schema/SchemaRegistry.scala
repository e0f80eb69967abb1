package graft.schema

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths}

import scala.collection.concurrent.TrieMap
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.types.{DataType, StructType}

/** Where schema JSON lives: a filesystem tree or classpath resources. */
sealed trait SchemaStore {
  /** Content of `{domain}/{dataset}/{file}`, if present. */
  def read(rel: String): Option[String]
  /** File names under `{domain}/{dataset}/`. */
  def listDataset(domain: String, dataset: String): Seq[String]
  /** Human-readable location for error messages. */
  def describe(rel: String): String
}

final class FileSchemaStore(basePath: String) extends SchemaStore {
  private def resolve(rel: String): Path = Paths.get(basePath, rel)

  override def read(rel: String): Option[String] = {
    val p = resolve(rel)
    if (Files.isRegularFile(p)) Some(Files.readString(p)) else None
  }

  /** Write support for `SchemaRegistry.publish` (filesystem stores only). */
  private[schema] def write(rel: String, content: String): Unit = {
    val p = resolve(rel)
    Files.createDirectories(p.getParent)
    Files.writeString(p, content)
    ()
  }

  override def listDataset(domain: String, dataset: String): Seq[String] = {
    val dir = resolve(s"$domain/$dataset")
    if (!Files.isDirectory(dir)) Seq.empty
    else Files.list(dir).iterator().asScala.map(_.getFileName.toString).toSeq
  }

  override def describe(rel: String): String = resolve(rel).toString
}

/** Schemas baked into the JAR as resources under `basePrefix` — the
  * reference's classpath mode (`/root/reference/src/main/scala/com/
  * lakehouse/ingestion/schema/SchemaRegistry.scala:59-69`). The JVM can't
  * list classpath directories, so the reference PROBES v1..v10
  * (`:118-126`) and silently misses v11+; here a generated
  * `manifest.txt` resource (one `domain/dataset/vN.json` path per line,
  * written by [[SchemaRegistry.writeManifest]] at packaging time) makes
  * listing exact at any version count.
  */
final class ClasspathSchemaStore(basePrefix: String,
                                 loader: ClassLoader = classOf[ClasspathSchemaStore].getClassLoader)
    extends SchemaStore {

  private def resource(rel: String): String =
    s"${basePrefix.stripSuffix("/")}/$rel"

  override def read(rel: String): Option[String] =
    Option(loader.getResourceAsStream(resource(rel))).map { in =>
      try new String(in.readAllBytes(), StandardCharsets.UTF_8)
      finally in.close()
    }

  private lazy val manifest: Seq[String] =
    read(SchemaRegistry.ManifestName)
      .map(_.linesIterator.map(_.trim).filter(_.nonEmpty).toSeq)
      .getOrElse(throw new IllegalStateException(
        s"classpath schema store needs resource ${resource(SchemaRegistry.ManifestName)} " +
        "(generate with SchemaRegistry.writeManifest)"))

  override def listDataset(domain: String, dataset: String): Seq[String] = {
    val prefix = s"$domain/$dataset/"
    manifest.filter(_.startsWith(prefix)).map(_.stripPrefix(prefix))
      .filterNot(_.contains('/'))
  }

  override def describe(rel: String): String = s"classpath:${resource(rel)}"
}

/** Versioned schema registry: `{base}/{domain}/{dataset}/v{N}.json` files
  * holding Spark `StructType` JSON (`DataType.fromJson`), newest = max N.
  *
  * Mirrors the reference's registry contract
  * (`/root/reference/src/main/scala/com/lakehouse/ingestion/schema/
  * SchemaRegistry.scala:71-150` — resolution, latest-version pick at
  * :132-150, JSON parse at :248-265, caching at :71-83) with two fixes:
  * version listing is store-driven (directory listing / generated
  * manifest) rather than probing v1..v10, and version sort is numeric so
  * v10 > v9. Schema inference is never used — the registry is the only
  * schema source (design tenet,
  * `/root/reference/docs/01-problem-statement.md:100-104`).
  */
final class SchemaRegistry(store: SchemaStore) {

  /** Filesystem registry rooted at `basePath` (the common case). */
  def this(basePath: String) = this(new FileSchemaStore(basePath))

  private val cache = TrieMap.empty[(String, String, Int), StructType]

  /** Numeric versions present for a dataset, ascending. */
  def listVersions(domain: String, dataset: String): Seq[Int] =
    store.listDataset(domain, dataset)
      .collect { case s if s.matches("v\\d+\\.json") =>
        s.stripPrefix("v").stripSuffix(".json").toInt
      }
      .sorted

  def latestVersion(domain: String, dataset: String): Option[Int] =
    listVersions(domain, dataset).lastOption

  /** Resolve a schema; `version=None` means latest. */
  def getSchema(domain: String, dataset: String,
                version: Option[Int] = None): StructType = {
    val v = version.orElse(latestVersion(domain, dataset)).getOrElse {
      throw SchemaNotFoundException(domain, dataset, version,
        store.describe(s"$domain/$dataset"))
    }
    cache.getOrElseUpdate((domain, dataset, v), {
      val rel = s"$domain/$dataset/v$v.json"
      val text = store.read(rel).getOrElse(
        throw SchemaNotFoundException(domain, dataset, Some(v), store.describe(rel)))
      DataType.fromJson(text) match {
        case s: StructType => s
        case other =>
          throw new IllegalArgumentException(
            s"${store.describe(rel)} is not a struct schema: ${other.simpleString}")
      }
    })
  }

  /** Publish `schema` as the next version, GATED by [[SchemaCompat]] — the
    * check the reference's governance doc specifies but stubs out
    * (`/root/reference/docs/08-schema-governance.md:274-281,391-402`).
    * Backward-compatible changes (additive nullable, relaxed nullability,
    * lossless widenings) publish freely; breaking changes (drops, renames,
    * narrowings, tightened nullability) throw unless `allowBreaking=true`
    * — the explicit "this is a new major contract" override. Returns the
    * published version number. Requires a filesystem store. */
  def publish(domain: String, dataset: String, schema: StructType,
              allowBreaking: Boolean = false): Int = {
    val base = store match {
      case f: FileSchemaStore => f
      case other => throw new UnsupportedOperationException(
        s"publish needs a writable filesystem store, got ${other.getClass.getSimpleName}")
    }
    latestVersion(domain, dataset).foreach { v =>
      val report = SchemaCompat.check(getSchema(domain, dataset, Some(v)), schema)
      if (!report.ok && !allowBreaking)
        throw new IllegalArgumentException(
          s"schema publish for $domain/$dataset rejected — ${report.describe} " +
            "(pass allowBreaking=true to publish as a breaking major version)")
    }
    val next = latestVersion(domain, dataset).getOrElse(0) + 1
    base.write(s"$domain/$dataset/v$next.json", schema.json)
    next
  }
}

object SchemaRegistry {
  val ManifestName = "manifest.txt"

  /** Classpath-resource registry under `basePrefix` (e.g. "schemas"). */
  def classpath(basePrefix: String,
                loader: ClassLoader = classOf[ClasspathSchemaStore].getClassLoader): SchemaRegistry =
    new SchemaRegistry(new ClasspathSchemaStore(basePrefix, loader))

  /** Generate the classpath manifest for a filesystem schema tree: one
    * `domain/dataset/vN.json` line per schema, sorted. Run at packaging
    * time (before the tree is bundled as resources); returns the lines. */
  def writeManifest(baseDir: Path): Seq[String] = {
    val base = baseDir.toAbsolutePath
    val lines = Files.walk(base).iterator().asScala
      .filter(p => Files.isRegularFile(p) && p.getFileName.toString.matches("v\\d+\\.json"))
      .map(p => base.relativize(p).toString.replace('\\', '/'))
      .toSeq.sorted
    Files.writeString(base.resolve(ManifestName),
      lines.mkString("", "\n", "\n"))
    lines
  }
}

final case class SchemaNotFoundException(domain: String, dataset: String,
                                         version: Option[Int], path: String)
    extends RuntimeException(
      s"schema $domain/$dataset${version.fold("")(v => s"/v$v")} not found (expected at $path)")
