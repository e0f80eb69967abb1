package graft.transform

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Referential-integrity checks (reference declares them:
  * `docs/02-tech-spec.md:122`, `docs/00-architecture-overview.md:339`).
  *
  * Orphan detection is a left-anti join child→parent. The parent keyset is
  * NOT force-broadcast by default: a fact-table parent (lineitem→orders)
  * would OOM executors at scale, and for genuinely small dimension parents
  * Spark/AQE auto-broadcasts under `spark.sql.autoBroadcastJoinThreshold`
  * anyway. Pass `broadcastParent = true` only for parents known to be
  * dimension-sized regardless of data scale.
  */
object RefIntegrity {

  /** Rows of `child` whose `childKey` has no match in `parent.parentKey`. */
  def orphans(child: DataFrame, parent: DataFrame,
              childKey: String, parentKey: String,
              broadcastParent: Boolean = false): DataFrame = {
    val p0 = parent.select(col(parentKey)).distinct()
    val p = if (broadcastParent) broadcast(p0) else p0
    child.join(p, child(childKey) === p(parentKey), "left_anti")
  }

  /** Orphan count as a one-row DataFrame (composable into DQ summaries). */
  def orphanCount(child: DataFrame, parent: DataFrame, childKey: String,
                  parentKey: String, alias: String,
                  broadcastParent: Boolean = false): DataFrame =
    orphans(child, parent, childKey, parentKey, broadcastParent)
      .agg(count(lit(1)).cast("long").as(alias))
}
