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
  * windows. Each allowlist entry names its bound class — a frame that is
  * bounded BY CONSTRUCTION (a ≤40-bucket histogram, a top-k output, ≤25
  * nations, a calendar of days, a fixed stage list), where a single-
  * partition ordered pass over ≲10⁴ rows is the correct, cheapest plan —
  * and the second test MEASURES that claim: every allowlisted query runs
  * at sf0.1 and each unpartitioned window's actual input row count must
  * stay ≲10⁴ (scaladoc bound claims become observed numbers).
  *
  * Any NEW unpartitioned window — in a new query or added to an existing
  * one — changes the observed map and fails this spec; the fix is either
  * [[graft.transform.PrefixSum]] (unbounded grains) or an explicit,
  * justified allowlist bump (provably bounded frames, which the measured
  * test then re-checks).
  */
class WindowSweepSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"
  private val measureDir = "/root/testdata/sf0.1"

  /** Ceiling for a "bounded" frame at sf0.1 — ≲10⁴ order. Calendar-of-days
    * grains are the largest class (they grow with time span, never data
    * volume); everything else is hundreds of rows or less. */
  private val maxFrameRows = 20000L

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

  private def gatedWindows(p: SparkPlan): Seq[SparkPlan] =
    flatten(p).filter {
      case w: WindowExec =>
        w.partitionSpec.isEmpty && !isPrefixSumOffsets(w.orderSpec)
      case w: WindowGroupLimitExec =>
        w.partitionSpec.isEmpty && !isPrefixSumOffsets(w.orderSpec)
      case _ => false
    }

  /** Audited bounded-frame windows: query -> (expected count, bound
    * class). Bound classes:
    *  - `histogram`: deciles / fixed histogram bins (≤40 rows)
    *  - `topk`: top-k / limit heads (≤100 rows)
    *  - `catalog`: nation / lang / weekday×hour / probe-sweep catalogs
    *  - `calendar`: calendar-of-days / time-block grains (a few thousand
    *    rows — grow with time span, not data volume)
    *  - `stages`: fixed scenario / stage / shard / rule lists */
  private val allow: Map[String, (Int, String)] = Map(
    "q110_vocab_growth" -> (1, "histogram"),
    "q139_zipf_fit" -> (1, "topk"),
    "q156_survival" -> (3, "calendar"),
    "q157_cumulative_uniques" -> (1, "calendar"),
    "q158_cusum_changepoint" -> (1, "calendar"),
    "q169_jaccard_histogram" -> (1, "histogram"),
    "q171_activity_heatmap" -> (1, "catalog"),
    "q198_daily_spearman" -> (2, "calendar"),
    "q212_top_movers" -> (2, "topk"),
    "q231_heaps_fit" -> (1, "catalog"),
    "q238_wilson_rank" -> (1, "catalog"),
    "q250_ewma_control" -> (3, "calendar"),
    "q251_pacf" -> (2, "calendar"),
    "q259_rolling_range" -> (1, "calendar"),
    "q263_seasonal_decompose" -> (3, "calendar"),
    "q266_changepoint" -> (7, "calendar"),
    "q271_periodogram" -> (1, "calendar"),
    "q273_permutation_entropy" -> (12, "calendar"),
    "q284_nelson_aalen" -> (2, "calendar"),
    "q286_best_streak" -> (6, "calendar"),
    "q289_runs_test" -> (3, "calendar"),
    "q290_gains_table" -> (1, "histogram"),
    "q291_tail_dependence" -> (2, "calendar"),
    "q293_disparate_impact" -> (1, "catalog"),
    "q298_log2_quantile_sketch" -> (3, "histogram"),
    "q299_isotonic_calibration" -> (3, "histogram"),
    "q300_forecast_backtest" -> (3, "calendar"),
    "q307_logrank" -> (1, "calendar"),
    "q310_hoeffding_racing" -> (1, "histogram"),
    "q315_bh_fdr" -> (2, "catalog"),
    "q334_pagerank" -> (1, "catalog"),
    "q337_anonymity_audit" -> (1, "catalog"),
    "q342_dedup_funnel" -> (1, "stages"),
    "q350_histogram_bakeoff" -> (2, "histogram"),
    "q353_join_state_advisor" -> (3, "calendar"),
    "q358_aqe_skew_sim" -> (3, "stages"),
    "q367_bpe_encode" -> (1, "stages"),
    "q38_ann_ivf" -> (1, "catalog"),
    // r10: the EM-round report — lag(corpus_nll) over exactly 3
    // one-row-per-round aggregates (constant-size stage list)
    "q395_unigram_em_rounds" -> (1, "stages"))

  test("no query plans an unpartitioned window outside the audited " +
       "bounded-frame allowlist") {
    val found = scala.collection.mutable.Map.empty[String, Int]
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      val n = gatedWindows(fn(spark, dir).queryExecution.executedPlan).size
      if (n > 0) found.update(name, n)
    }
    val actual = found.toMap
    val expected = allow.map { case (k, (n, _)) => k -> n }
    if (actual != expected) {
      val render = actual.toSeq.sorted
        .map { case (k, v) => s"""    "$k" -> $v""" }
        .mkString(",\n")
      fail(s"unpartitioned-window map drifted from the allowlist.\n" +
        s"observed (audit each before accepting!):\n$render\n" +
        s"extra vs allowlist: ${(actual.toSet -- expected.toSet).toSeq.sorted}\n" +
        s"missing vs allowlist: ${(expected.toSet -- actual.toSet).toSeq.sorted}")
    }
  }

  /** Rows flowing INTO a window node: the nearest descendant that reports
    * a row-count metric. Windows preserve cardinality and the nodes that
    * lack row metrics (sort, shuffle-read wrappers, codegen adapters,
    * project) preserve it too, so the first reporting node below the
    * window equals the windowed frame size. */
  private def windowInputRows(w: SparkPlan): Option[Long] = {
    // metric-reading traversal: unlike the gate's flatten, FOLLOW reused
    // exchanges to their original (its metrics carry the row count that
    // fed this window; following cannot double-count a collectFirst)
    def walk(p: SparkPlan): Seq[SparkPlan] = {
      val kids: Seq[SparkPlan] = p match {
        case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
        case q: QueryStageExec        => Seq(q.plan)
        case r: ReusedExchangeExec    => Seq(r.child)
        case o                        => o.children
      }
      p +: kids.flatMap(walk)
    }
    walk(w.children.head).collectFirst {
      case n if n.metrics.contains("numOutputRows") &&
        n.metrics("numOutputRows").value > 0 =>
        n.metrics("numOutputRows").value
      case n if n.metrics.contains("shuffleRecordsWritten") &&
        n.metrics("shuffleRecordsWritten").value > 0 =>
        n.metrics("shuffleRecordsWritten").value
    }
  }

  test("every allowlisted unpartitioned window is MEASURABLY bounded at " +
       "sf0.1 (frame input <= ~10^4 rows)") {
    allow.keys.toSeq.sorted.foreach { name =>
      val df = SparkEntry.queries(name)(spark, measureDir)
      // execute the exact plan (no count()-style column pruning, which
      // would optimize unused windows away) so metrics populate
      val qe = df.queryExecution
      qe.executedPlan.execute().foreach(_ => ())
      val wins = gatedWindows(qe.executedPlan)
      assert(wins.nonEmpty, s"$name: allowlisted but no gated window found")
      wins.foreach { w =>
        windowInputRows(w) match {
          case Some(rows) =>
            assert(rows <= maxFrameRows,
              s"$name: unpartitioned window over $rows rows at sf0.1 — " +
              s"the '${allow(name)._2}' bound claim is violated; move this " +
              "grain onto PrefixSum")
          case None =>
            fail(s"$name: could not measure window input rows " +
              s"(no row metric below ${w.nodeName})")
        }
      }
    }
  }
}
