package graft.transform

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Upsert / merge-by-key (reference declares "Upserts (future)" with an
  * abstract writeInternal and no implementation,
  * `/root/reference/src/main/scala/com/lakehouse/ingestion/lakehouse/
  * LakehouseWriter.scala:27-31`, `docs/04-low-level-design.md:157-161`).
  *
  * On Delta/Iceberg deployments this is `MERGE INTO` (transactional, file
  * rewrite only for touched files). On plain parquet — the locally-runnable
  * path — merge is re-materialization: target rows whose key appears in the
  * updates are replaced, everything else is kept. One shuffle on the key
  * (the anti-join); the updates side is usually small → broadcast.
  */
object Merge {

  /** Pure-DataFrame upsert: rows of `updates` win over `target` on `keys`.
    * Latest-wins within `updates` itself is decided by `orderCol` desc. */
  def upsertByKey(target: DataFrame, updates: DataFrame, keys: Seq[String],
                  orderCol: String, tiebreak: String,
                  broadcastUpdates: Boolean = true): DataFrame = {
    val latestUpdates = Dedup.latestByKeyAgg(updates, keys, orderCol, tiebreak)
    val updateKeys0 = latestUpdates.select(keys.map(col): _*).distinct()
    val updateKeys = if (broadcastUpdates) broadcast(updateKeys0) else updateKeys0
    val kept = target.join(updateKeys, keys, "left_anti")
    kept.unionByName(latestUpdates)
  }

  /** Delete-aware variant: updates whose `opCol` equals `deleteOp` remove
    * the key instead of replacing it (CDC merge semantics). */
  def applyCdc(target: DataFrame, cdc: DataFrame, keys: Seq[String],
               orderCol: String, tiebreak: String, opCol: String,
               deleteOp: String = "d"): DataFrame = {
    val latest = Dedup.latestByKeyAgg(cdc, keys, orderCol, tiebreak)
    val updateKeys = broadcast(latest.select(keys.map(col): _*).distinct())
    val kept = target.join(updateKeys, keys, "left_anti")
    val upserts = latest.filter(col(opCol) =!= lit(deleteOp))
      .select(target.columns.map(col): _*)
    kept.unionByName(upserts)
  }

  /** The MERGE INTO SQL a Delta/Iceberg deployment would run for the same
    * semantics — emitted as text so deployments with those catalogs
    * configured can execute it directly. */
  def mergeSql(targetTable: String, sourceTable: String, keys: Seq[String],
               updateCols: Seq[String]): String = {
    val on = keys.map(k => s"t.$k = s.$k").mkString(" AND ")
    val setClause = updateCols.map(c => s"t.$c = s.$c").mkString(", ")
    val insertCols = (keys ++ updateCols).mkString(", ")
    val insertVals = (keys ++ updateCols).map(c => s"s.$c").mkString(", ")
    s"""MERGE INTO $targetTable t USING $sourceTable s ON $on
       |WHEN MATCHED THEN UPDATE SET $setClause
       |WHEN NOT MATCHED THEN INSERT ($insertCols) VALUES ($insertVals)""".stripMargin
  }
}

/** Key-salting for skewed shuffles. At 100 TB a handful of hot keys (null
  * ids, default values, bot users) can pin a single reducer; salting fans a
  * hot key across `buckets` partial groups, then a second, tiny aggregation
  * merges the partials. AQE's skew-join handles the join case; salting
  * covers aggregations and deliberate repartitioning.
  */
object Salt {

  /** Add a deterministic salt column in [0, buckets). */
  def withSalt(df: DataFrame, buckets: Int, salted: String = "__salt"): DataFrame =
    df.withColumn(salted, pmod(spark_partition_id() + monotonically_increasing_id(), lit(buckets)).cast("int"))

  /** Two-stage salted aggregation: aggregate by (keys, salt) — map-side
    * combinable, skew fanned out — then merge partials by keys.
    * `partialAggs` must be re-mergeable (sum/count/min/max style). */
  def saltedAgg(df: DataFrame, keys: Seq[String], buckets: Int,
                partialAggs: Seq[Column], merge: Seq[Column]): DataFrame = {
    val salted = withSalt(df, buckets)
    val partial = salted
      .groupBy((keys.map(col) :+ col("__salt")): _*)
      .agg(partialAggs.head, partialAggs.tail: _*)
    partial.groupBy(keys.map(col): _*).agg(merge.head, merge.tail: _*)
  }
}
