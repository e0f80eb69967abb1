package graft.transform

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Referential-integrity checks (reference declares them:
  * `docs/02-tech-spec.md:122`, `docs/00-architecture-overview.md:339`).
  *
  * Orphan detection is a left-anti join child→parent. At scale the parent
  * side is usually a dimension — broadcast it; Spark does this automatically
  * under the 10 MB threshold, and callers can force it with the `broadcast`
  * flag for dims known to be small relative to cluster memory.
  */
object RefIntegrity {

  /** Rows of `child` whose `childKey` has no match in `parent.parentKey`. */
  def orphans(child: DataFrame, parent: DataFrame,
              childKey: String, parentKey: String,
              broadcastParent: Boolean = true): DataFrame = {
    val p0 = parent.select(col(parentKey)).distinct()
    val p = if (broadcastParent) broadcast(p0) else p0
    child.join(p, child(childKey) === p(parentKey), "left_anti")
  }

  /** Orphan count as a one-row DataFrame (composable into DQ summaries). */
  def orphanCount(child: DataFrame, parent: DataFrame, childKey: String,
                  parentKey: String, alias: String): DataFrame =
    orphans(child, parent, childKey, parentKey)
      .agg(count(lit(1)).cast("long").as(alias))
}
