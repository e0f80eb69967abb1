package graft.catalog

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.types.StructType

/** Catalog abstraction (reference trait `/root/reference/src/main/scala/com/
  * lakehouse/ingestion/catalog/CatalogAdapter.scala:11-43`, where only a
  * no-op impl exists and the runner always wires it
  * (`core/IngestionRunner.scala:90-96`) — here the Spark-backed adapter is
  * real and the no-op is the explicit opt-out).
  */
trait CatalogAdapter {
  def tableExists(identifier: String): Boolean
  def createTableIfNotExists(identifier: String, schema: StructType,
                             partitions: Seq[String]): Unit
  def createNamespaceIfNotExists(namespace: String): Unit
}

/** spark.catalog + SQL DDL implementation. Multi-part (V2 catalog)
  * identifiers route through SQL, which resolves via
  * `spark.sql.catalog.*`-registered plugins exactly as the reference's
  * Iceberg deployment does (`/root/reference/helm/values.yaml:43-46`). */
final class SparkCatalogAdapter(spark: SparkSession) extends CatalogAdapter {

  override def tableExists(identifier: String): Boolean =
    spark.catalog.tableExists(identifier)

  /** DDL from the StructType itself (`schema.toDDL`) — no empty-DataFrame
    * trick needed (reference builds a null-literal DF,
    * `lakehouse/DeltaLakeWriter.scala:151-153`). */
  override def createTableIfNotExists(identifier: String, schema: StructType,
                                      partitions: Seq[String]): Unit = {
    val partClause =
      if (partitions.isEmpty) ""
      else partitions.mkString(" PARTITIONED BY (", ", ", ")")
    spark.sql(
      s"CREATE TABLE IF NOT EXISTS $identifier (${schema.toDDL})$partClause")
  }

  /** `CREATE NAMESPACE IF NOT EXISTS` (reference
    * `lakehouse/IcebergAppendWriter.scala:62-82`). */
  override def createNamespaceIfNotExists(namespace: String): Unit =
    spark.sql(s"CREATE NAMESPACE IF NOT EXISTS $namespace")
}

/** Explicit no-op (reference `catalog/CatalogAdapter.scala:30-43`). */
object NoopCatalogAdapter extends CatalogAdapter {
  override def tableExists(identifier: String): Boolean = false
  override def createTableIfNotExists(identifier: String, schema: StructType,
                                      partitions: Seq[String]): Unit = ()
  override def createNamespaceIfNotExists(namespace: String): Unit = ()
}
