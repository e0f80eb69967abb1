package graft

import org.apache.spark.sql.SparkSession

/** Session factory for the graft engine.
  *
  * Local-mode settings mirror what a production deploy would set via
  * `spark-submit --conf` on a real cluster (the reference injects these via
  * helm, `/root/reference/helm/values.yaml:59-61`): AQE on, shuffle width
  * sized to the parallelism actually available rather than the 200 default.
  */
object GraftSession {

  /** Build a local session with `cores` executor threads. */
  def local(cores: Int = Runtime.getRuntime.availableProcessors(),
            appName: String = "graft"): SparkSession =
    tuned(SparkSession.builder().master(s"local[$cores]"), cores, appName)

  /** Apply graft's standard conf to any builder (cluster or local).
    * Installs [[graft.plans.GraftExtensions]]: the jaccard rewrite rule and
    * SQL registration of the graft expressions. */
  def tuned(builder: SparkSession.Builder, parallelism: Int,
            appName: String): SparkSession = {
    val spark = builder
      .appName(appName)
      .withExtensions(new graft.plans.GraftExtensions)
      .config("spark.sql.shuffle.partitions", parallelism.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }
}
