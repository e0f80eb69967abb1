package graft
import org.apache.spark.sql.{SparkSession, DataFrame}
/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    graft.queries.Queries.all("q01_agg_summary")(spark, "/root/testdata/sf0.001")
  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    graft.queries.Queries.all
  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables — every query has an oracle (PropertySpec
    * pins queries.keySet == oracleSql.keySet, so the sets can't drift).
    * Oracles lives in the verify/ source tree, out of the engine's
    * src/main (see build.sbt); it compiles onto the same classpath so this
    * method and `runMain graft.Verify` keep working. */
  def oracleSql: Map[String, String] = Oracles.sql
}
