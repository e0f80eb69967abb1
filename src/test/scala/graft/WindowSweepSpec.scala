package graft

import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.exchange.ReusedExchangeExec
import org.apache.spark.sql.execution.window.{WindowExec, WindowGroupLimitExec}

/** The single-partition-window gate: walks the physical plan of EVERY
  * gated query and fails on any `WindowExec` (or `WindowGroupLimitExec`)
  * whose partition spec is empty — the one plan shape that funnels all
  * rows through one task and dies at 100 TB — unless the query is in the
  * audited allowlist below with exactly the expected number of such
  * windows. Each allowlist entry is a frame that is bounded BY
  * CONSTRUCTION (a ≤10-bucket histogram, a top-k output, ≤25 nations, a
  * calendar of days, a fixed stage list), where a single-partition
  * ordered pass over ≲10⁴ rows is the correct, cheapest plan.
  *
  * Any NEW unpartitioned window — in a new query or added to an existing
  * one — changes the observed map and fails this spec; the fix is either
  * [[graft.transform.PrefixSum]] (unbounded grains) or an explicit,
  * justified allowlist bump (provably bounded frames).
  */
class WindowSweepSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  /** Full-plan traversal, crossing AQE query-stage boundaries
    * (QueryStageExec is a leaf to `collect`) plus subqueries. Reused
    * exchanges are NOT re-entered — the original subtree is already
    * reachable, and re-entering would double-count shared scans. */
  private def flatten(p: SparkPlan): Seq[SparkPlan] = {
    val kids: Seq[SparkPlan] = p match {
      case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
      case q: QueryStageExec        => Seq(q.plan)
      case _: ReusedExchangeExec    => Seq.empty
      case o                        => o.children
    }
    p +: (kids ++ p.subqueries).flatMap(flatten)
  }

  /** PrefixSum's internal exclusive-offsets window is unpartitioned but
    * runs on the per-(range-partition, group) TOTALS frame —
    * #shuffle-partitions × #groups rows by construction, never data.
    * It is identified by its reserved `__psum_pid` order key (PrefixSum
    * rejects input frames that use the `__psum` namespace, so no query
    * can smuggle a data-grain window past this exemption). */
  private def isPrefixSumOffsets(order: Seq[org.apache.spark.sql.catalyst
      .expressions.SortOrder]): Boolean =
    order.exists(_.child.references.exists(_.name == "__psum_pid"))

  private def unpartitionedWindows(p: SparkPlan): Int =
    flatten(p).count {
      case w: WindowExec =>
        w.partitionSpec.isEmpty && !isPrefixSumOffsets(w.orderSpec)
      case w: WindowGroupLimitExec =>
        w.partitionSpec.isEmpty && !isPrefixSumOffsets(w.orderSpec)
      case _ => false
    }

  /** Audited bounded-frame windows: query -> expected count. Every entry
    * was audited against its query's scaladoc; the bound classes are:
    *  - deciles / fixed histogram bins (≤40 rows): q110 q169 q290 q298
    *    q299 q310 q350
    *  - top-k / limit heads (≤100 rows): q139 q212
    *  - nation / lang / weekday×hour / probe-sweep catalogs: q171 q231
    *    q238 q293 q315 q334 q337 q38
    *  - calendar-of-days / time-block grains (≤ a few thousand rows —
    *    grow with time span, not data volume): q156 q157 q158 q250 q251
    *    q259 q263 q266 q271 q273 q284 q286 q289 q291 q300 q307 q353
    *  - fixed scenario / stage / shard / rule lists: q342 (4 stages)
    *    q358 (32 partitions × 3 scenarios) q367 (8 BPE rules) */
  private val allow: Map[String, Int] = Map(
    "q110_vocab_growth" -> 1,
    "q139_zipf_fit" -> 1,
    "q156_survival" -> 3,
    "q157_cumulative_uniques" -> 1,
    "q158_cusum_changepoint" -> 1,
    "q169_jaccard_histogram" -> 1,
    "q171_activity_heatmap" -> 1,
    "q198_daily_spearman" -> 2,
    "q212_top_movers" -> 2,
    "q231_heaps_fit" -> 1,
    "q238_wilson_rank" -> 1,
    "q250_ewma_control" -> 3,
    "q251_pacf" -> 2,
    "q259_rolling_range" -> 1,
    "q263_seasonal_decompose" -> 3,
    "q266_changepoint" -> 7,
    "q271_periodogram" -> 1,
    "q273_permutation_entropy" -> 12,
    "q284_nelson_aalen" -> 2,
    "q286_best_streak" -> 6,
    "q289_runs_test" -> 3,
    "q290_gains_table" -> 1,
    "q291_tail_dependence" -> 2,
    "q293_disparate_impact" -> 1,
    "q298_log2_quantile_sketch" -> 3,
    "q299_isotonic_calibration" -> 3,
    "q300_forecast_backtest" -> 3,
    "q307_logrank" -> 1,
    "q310_hoeffding_racing" -> 1,
    "q315_bh_fdr" -> 2,
    "q334_pagerank" -> 1,
    "q337_anonymity_audit" -> 1,
    "q342_dedup_funnel" -> 1,
    "q350_histogram_bakeoff" -> 2,
    "q353_join_state_advisor" -> 3,
    "q358_aqe_skew_sim" -> 3,
    "q367_bpe_encode" -> 1,
    "q38_ann_ivf" -> 1)

  test("no query plans an unpartitioned window outside the audited " +
       "bounded-frame allowlist") {
    val found = scala.collection.mutable.Map.empty[String, Int]
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      val n = unpartitionedWindows(fn(spark, dir).queryExecution.executedPlan)
      if (n > 0) found.update(name, n)
    }
    val actual = found.toMap
    if (actual != allow) {
      val render = actual.toSeq.sorted
        .map { case (k, v) => s"""    "$k" -> $v""" }
        .mkString(",\n")
      fail(s"unpartitioned-window map drifted from the allowlist.\n" +
        s"observed (audit each before accepting!):\n$render\n" +
        s"extra vs allowlist: ${(actual.toSet -- allow.toSet).toSeq.sorted}\n" +
        s"missing vs allowlist: ${(allow.toSet -- actual.toSet).toSeq.sorted}")
    }
  }
}
