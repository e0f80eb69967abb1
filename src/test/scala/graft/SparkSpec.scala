package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Shared local session for all suites (one JVM under Test/fork). */
object TestSpark {
  lazy val spark: SparkSession = GraftSession.local(4, "graft-test")
}

trait SparkSpec extends AnyFunSuite with Matchers {
  val spark: SparkSession = TestSpark.spark
  def tmpDir(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString
}
