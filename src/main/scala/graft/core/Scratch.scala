package graft.core

/** Per-JVM scratch space for queries that model multi-step jobs (index
  * lifecycles, format migrations, IVM state): every scratch dir lives
  * under ONE root that a shutdown hook deletes, so repeated runs in a
  * long-lived driver (bench runs each query 3×; a notebook session runs
  * them indefinitely) cannot leak temp directories — the r9 hygiene
  * finding on q390. Production pipelines pass real durable paths through
  * config; this is only for self-contained query fixtures. */
object Scratch {

  private lazy val root: java.nio.file.Path = {
    val r = java.nio.file.Files.createTempDirectory("graft-scratch")
    Runtime.getRuntime.addShutdownHook(new Thread(() => delete(r.toFile)))
    r
  }

  private def delete(f: java.io.File): Unit = {
    val children = f.listFiles()
    if (children != null) children.foreach(delete)
    f.delete(): Unit
  }

  /** A fresh directory under the self-cleaning root. */
  def dir(prefix: String): String =
    java.nio.file.Files.createTempDirectory(root, prefix).toString
}
