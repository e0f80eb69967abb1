package graft

import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.exchange.ReusedExchangeExec
import org.apache.spark.sql.execution.joins.{BroadcastNestedLoopJoinExec, CartesianProductExec}

/** The unbounded-nested-loop gate (the join twin of [[WindowSweepSpec]]):
  * walks the physical plan of EVERY gated query and fails on any
  * `CartesianProductExec` or `BroadcastNestedLoopJoinExec` unless the
  * query is in the audited allowlist below with exactly the expected
  * count. A nested-loop join whose build side is data-sized is O(n·m) at
  * 100 TB; every allowlisted site was audited to join a PROVABLY BOUNDED
  * frame — a 1-row global aggregate (`crossJoin(broadcast(agg))`, the
  * scalar-constant pattern), a ≤100-row catalog/parameter grid, or an
  * inequality-predicate join over two tiny aggregate frames.
  *
  * Any new nested-loop shape — a new query, or a join in an existing
  * query degrading to BNLJ because its equi-key was dropped — changes the
  * observed map and fails this spec before a bench round can even see it.
  */
class JoinSweepSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def flatten(p: SparkPlan): Seq[SparkPlan] = {
    val kids: Seq[SparkPlan] = p match {
      case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
      case q: QueryStageExec        => Seq(q.plan)
      case _: ReusedExchangeExec    => Seq.empty
      case o                        => o.children
    }
    p +: (kids ++ p.subqueries).flatMap(flatten)
  }

  /** TRUE iff this subtree provably produces a bounded (≤100-row) frame,
    * read off the plan itself:
    *  - a global aggregate (no grouping keys) is exactly 1 row;
    *  - a literal local relation is its row count;
    *  - unary operators preserve or reduce cardinality (project, filter,
    *    sort, limit, codegen wrappers, exchanges);
    *  - a cartesian/nested-loop of two bounded frames stays bounded
    *    (1-row × 1-row scalar composition);
    *  - binary joins are bounded if ONE side is a ≤1-row global aggregate
    *    (each probe row matches at most the bounded side... NOT true in
    *    general for outer multiplicities, so joins require BOTH sides
    *    bounded).
    * Anything else — grouped aggregates included, however small their
    * domain — is NOT provable here and must be allowlisted explicitly. */
  private def provablyBounded(p: SparkPlan): Boolean = p match {
    case a: AdaptiveSparkPlanExec => provablyBounded(a.executedPlan)
    case q: QueryStageExec        => provablyBounded(q.plan)
    case r: ReusedExchangeExec    => provablyBounded(r.child)
    case a: org.apache.spark.sql.execution.aggregate.HashAggregateExec =>
      a.groupingExpressions.isEmpty
    case a: org.apache.spark.sql.execution.aggregate.SortAggregateExec =>
      a.groupingExpressions.isEmpty
    case a: org.apache.spark.sql.execution.aggregate.ObjectHashAggregateExec =>
      a.groupingExpressions.isEmpty
    case l: org.apache.spark.sql.execution.LocalTableScanExec =>
      l.rows.lengthCompare(100) <= 0
    case r: org.apache.spark.sql.execution.RangeExec =>
      r.numElements <= java.math.BigInteger.valueOf(100)
    // a global limit bounds its OUTPUT no matter what the child is (a
    // local limit does not — it is per partition); same for the fused
    // TakeOrderedAndProject form
    case g: org.apache.spark.sql.execution.GlobalLimitExec =>
      g.limit >= 0 && g.limit <= 100 // -1 = offset-only form: unbounded
    case t: org.apache.spark.sql.execution.TakeOrderedAndProjectExec =>
      t.limit <= 100
    case j: BroadcastNestedLoopJoinExec =>
      provablyBounded(j.left) && provablyBounded(j.right)
    case j: CartesianProductExec =>
      provablyBounded(j.left) && provablyBounded(j.right)
    case u if u.children.size == 1 => provablyBounded(u.children.head)
    case _ => false
  }

  /** Nested-loop joins whose bounded-build claim the PLAN cannot prove. */
  private def unprovenNestedLoops(p: SparkPlan): Int =
    flatten(p).count {
      case j: CartesianProductExec =>
        !(provablyBounded(j.left) || provablyBounded(j.right))
      case j: BroadcastNestedLoopJoinExec =>
        import org.apache.spark.sql.catalyst.optimizer.{BuildLeft, BuildRight}
        val build = j.buildSide match {
          case BuildLeft  => j.left
          case BuildRight => j.right
        }
        !provablyBounded(build)
      case _ => false
    }

  /** Audited nested-loop sites the plan can't prove bounded — each joins a
    * frame bounded by CONSTRUCTION, just not by a plan shape this spec can
    * recognize (grouped aggregates over bounded domains, driver-built
    * sample frames). Audited bound classes:
    *  - `ann`: ANN / quantization constants — k-means centroids (k ≤ 64),
    *    PQ codebooks (16 × subspaces), RP/hyperplane matrices, fixed probe
    *    or query samples (≤ 100 vectors), nProbe sweep grids: q30 q38 q49
    *    q77 q89 q98 q100 q105 q205 q210 q249 q261 q328 q338
    *  - `grid`: catalog / statistic grids — lang × source contingency
    *    cells, ≤ 25 nations, deciles, scenario × partition lists, ranker
    *    catalogs: q120 q140 q199 q225 q227 q229 q256 q276 q299
    *    q320 q335 q358 (q293/q312 left this list when the prover learned
    *    global limits — their builds sit under explicit LIMITs)
    *  - `vocab-model`: the naive-bayes model grid (langs × vocabulary) —
    *    vocabulary-bounded (Heaps' law, sublinear in corpus), the
    *    standard NB materialization: q322 */
  private val allow: Map[String, Int] = Map(
    "q100_hard_negatives" -> 1,
    "q105_jl_distortion" -> 1,
    "q120_lang_source_chi2" -> 1,
    "q140_trend_test" -> 1,
    "q199_cluster_silhouette" -> 1,
    "q205_pq_codebooks" -> 4,
    "q210_pq_recall" -> 9,
    "q225_rrf_fusion" -> 2,
    "q227_label_mmd" -> 1,
    "q229_kendall_tau" -> 1,
    "q249_mips" -> 1,
    "q256_jonckheere" -> 1,
    "q261_mutual_knn" -> 2,
    "q276_tornado" -> 1,
    "q299_isotonic_calibration" -> 2,
    "q30_ann_cosine" -> 1,
    "q320_dtw_nations" -> 1,
    "q322_naive_bayes" -> 5,
    "q328_pca_power" -> 1,
    "q335_hll" -> 2,
    "q338_matryoshka_recall" -> 4,
    "q358_aqe_skew_sim" -> 3,
    "q38_ann_ivf" -> 6,
    "q49_ivf_recall" -> 2,
    "q77_semantic_decontam" -> 1,
    "q89_kmeans_clusters" -> 1,
    "q98_embed_outliers" -> 2)

  test("no query plans a cartesian/broadcast-nested-loop join outside " +
       "the audited bounded-build allowlist") {
    val found = scala.collection.mutable.Map.empty[String, Int]
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      val n = unprovenNestedLoops(fn(spark, dir).queryExecution.executedPlan)
      if (n > 0) found.update(name, n)
    }
    val actual = found.toMap
    if (actual != allow) {
      val render = actual.toSeq.sorted
        .map { case (k, v) => s"""    "$k" -> $v""" }
        .mkString(",\n")
      fail(s"nested-loop-join map drifted from the allowlist.\n" +
        s"observed (audit each before accepting!):\n$render\n" +
        s"extra vs allowlist: ${(actual.toSet -- allow.toSet).toSeq.sorted}\n" +
        s"missing vs allowlist: ${(allow.toSet -- actual.toSet).toSeq.sorted}")
    }
  }
}
