package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Registry of every named query the engine exposes through SparkEntry.
  * Keys match Oracles.sql where a DuckDB-expressible oracle exists.
  */
object Queries {
  type Q = (SparkSession, String) => DataFrame

  val all: Map[String, Q] = Map(
    "q01_agg_summary" -> (RefQueries.q01_agg_summary _),
  )
}
