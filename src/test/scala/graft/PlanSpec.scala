package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec

/** Physical-plan shape assertions: the optimizations we rely on at 100 TB
  * must actually appear in the executed plan, not just in comments.
  * Runs on sf0.001 — plan shape is scale-independent here because the
  * broadcasts are explicit and the pushdowns are static.
  */
class PlanSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def executedPlan(df: DataFrame): SparkPlan = {
    df.collect() // materialize so AQE finalizes the plan
    df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p                        => p
    }
  }

  private def planString(df: DataFrame): String = executedPlan(df).toString

  private def countShuffles(df: DataFrame): Int =
    executedPlan(df).collect { case _: ShuffleExchangeExec => 1 }.sum

  test("q13 star join broadcasts the dimension, never shuffles lineitem") {
    val plan = planString(queries.JoinQueries.q13_enrich_join(spark, dir))
    plan should include("BroadcastHashJoin")
    plan should not include "SortMergeJoin"
  }

  test("q11 rollup's dim chain is all broadcast joins") {
    val plan = planString(queries.JoinQueries.q11_gold_rollup(spark, dir))
    plan should include("BroadcastHashJoin")
    plan should not include "SortMergeJoin"
  }

  test("q15 top-k plans TakeOrderedAndProject, not a global sort") {
    val plan = planString(queries.JoinQueries.q15_topk(spark, dir))
    plan should include("TakeOrderedAndProject")
  }

  test("filters and column pruning reach the parquet scan") {
    import org.apache.spark.sql.functions._
    val df = graft.tables.Tables.orders(spark, dir)
      .filter(col("o_totalprice") > 100000.0)
      .select("o_orderkey", "o_totalprice")
    val plan = planString(df)
    plan should include regex "PushedFilters: \\[.*GreaterThan\\(o_totalprice"
    plan should include regex "ReadSchema: struct<o_orderkey:bigint,o_totalprice:double>"
  }

  test("q216's cumulative weight rides a RANGE exchange (PrefixSum), " +
       "never a per-flag window partition") {
    // a partitionBy(flag) window would funnel each of 3 flags' whole price
    // grain through ONE task at 100 TB; the two-pass PrefixSum plans a
    // range repartition whose width is the shuffle-partition count
    val plan = planString(
      queries.CorpusQueries.q216_weighted_median(spark, dir))
    plan.toLowerCase should include("rangepartitioning")
  }

  test("map-only pipeline (q02) has zero shuffles before its sort") {
    // cast/project is narrow; the only exchange allowed is the final orderBy
    val df = queries.TransformQueries.q02_cast_project(spark, dir)
    countShuffles(df) should be <= 1
  }

  test("single-pass DQ is one aggregate job with no joins") {
    import graft.dq._
    val rs = DQRuleSet(Seq(NotNullCheck("o_custkey"),
      RangeCheck("o_totalprice", Some(0.0), None),
      RegexCheck("o_orderpriority", "^[0-9]-")))
    val m = rs.metricsDF(graft.tables.Tables.orders(spark, dir))
    val plan = planString(m)
    plan should not include "Join"
    // partial + final hash aggregate, at most one exchange between them
    countShuffles(m) should be <= 1
  }

  test("whole-stage codegen covers the lineitem aggregation hot path") {
    val plan = planString(queries.Queries.all("q01_agg_summary")(spark, dir))
    // codegen'd stages render as "*(n) Operator" in the executed plan
    plan should include regex """\*\(\d+\) HashAggregate"""
  }

  test("q29's band join is an equi-join (no nested-loop/cartesian)") {
    val plan = planString(queries.PipelineQueries.q29_ngram_jaccard(spark, dir))
    plan should not include "CartesianProduct"
    plan should not include "BroadcastNestedLoopJoin"
  }

  test("q32 top-pairs goes through LSH buckets (no all-pairs join)") {
    val plan = planString(queries.PipelineQueries.q32_embed_topk_pairs(spark, dir))
    plan should not include "CartesianProduct"
    plan should not include "BroadcastNestedLoopJoin"
  }

  test("q51 repetition profile is one narrow map — the only exchange is the sort") {
    // the ModalCount kernel replaced the explode -> agg(doc,tok) -> agg(doc)
    // spelling (which shuffled every token occurrence) with per-row codegen
    val df = queries.PipelineQueries.q51_repetition(spark, dir)
    countShuffles(df) should be <= 1
    planString(df) should not include "HashAggregate"
  }

  test("q57's RANGE window shuffles once on user_id before the sort") {
    val df = queries.PipelineQueries.q57_rolling_window(spark, dir)
    countShuffles(df) should be <= 2
    planString(df) should include("Window")
  }

  test("q56 split audit is map-side combinable (agg + final sort only)") {
    val df = queries.PipelineQueries.q56_split_sample(spark, dir)
    countShuffles(df) should be <= 2
  }

  test("q59 packing range-partitions on (lang, doc_id), no per-lang window") {
    val df = queries.PipelineQueries.q59_sequence_packing(spark, dir)
    val plan = planString(df)
    // two-pass prefix sum: since r8 the RANGE exchange on (lang, doc_id)
    // is PINNED inside PrefixSum's checkpoint — the consumer plan reads
    // the materialized frame as an RDD scan and must NOT re-shuffle it
    // (the one visible rangepartitioning is the final orderBy)
    plan should include("Scan ExistingRDD")
    plan should not include regex("rangepartitioning\\(lang.+doc_id")
    // ...and every Window partitions on (partition-id, lang), never lang
    // alone — no single task ever owns a whole language
    plan should include("__psum_pid")
    plan should not include regex("Window .*partitionBy.*\\[lang#")
  }

  test("q53 vocab top-k plans the heap TopKPerKeyExec, not a window sort") {
    val plan = planString(queries.PipelineQueries.q53_vocab_profile(spark, dir))
    plan should include("TopKPerKey")
    plan should not include "Window"
  }

  test("q27's bucket cap is a groupBy+join — no window buffers a degenerate band") {
    // a boilerplate bucket is exactly what maxBucket drops; a window over
    // band would buffer that whole bucket in one task before dropping it
    val plan = planString(queries.PipelineQueries.q27_minhash_dedup(spark, dir))
    plan should not include "Window"
  }

  test("q80 incremental dedup joins the batch to the index on band keys only") {
    val plan = planString(queries.PipelineQueries.q80_incremental_dedup(spark, dir))
    plan should not include "CartesianProduct"
    plan should not include "Window"
    plan should include regex "(BroadcastHashJoin|SortMergeJoin|ShuffledHashJoin) \\[band"
  }

  test("q82 semantic clusters: bucketed candidates, no all-pairs, no size window") {
    val plan = planString(queries.PipelineQueries.q82_semantic_clusters(spark, dir))
    plan should not include "CartesianProduct"
    plan should not include "Window"
  }

  test("q51/q92 repetition rules are per-row kernels — no token shuffle, no join") {
    // the ModalCount kernel keeps the modal-token count inside the scan's
    // codegen stage; the old spelling shuffled every token occurrence
    val q51 = queries.PipelineQueries.q51_repetition(spark, dir)
    planString(q51) should not include "HashAggregate"
    val q92 = queries.CorpusQueries.q92_gopher_rules(spark, dir)
    planString(q92) should not include "Join"
    countShuffles(q92) should be <= 1
  }

  test("q87 entropy is a narrow map via the EntropyTermSum kernel") {
    val df = queries.CorpusQueries.q87_doc_entropy(spark, dir)
    countShuffles(df) should be <= 1
    planString(df) should not include "HashAggregate"
  }

  test("q101 weighted sample plans TakeOrderedAndProject, not a global sort") {
    val plan = planString(queries.CorpusQueries.q101_weighted_sample(spark, dir))
    plan should include("TakeOrderedAndProject")
  }

  test("q100 hard negatives run through the heap TopKPerKeyExec, not a window") {
    val plan = planString(queries.CorpusQueries.q100_hard_negatives(spark, dir))
    plan should include("TopKPerKey")
    plan should not include "Window"
  }

  test("q86 tf-idf top terms plan the heap TopKPerKeyExec, not a window") {
    val plan = planString(queries.CorpusQueries.q86_tfidf_terms(spark, dir))
    plan should include("TopKPerKey")
    plan should not include "Window"
  }

  test("q89 k-means broadcasts centroids; no cartesian on data rows") {
    val plan = planString(queries.CorpusQueries.q89_kmeans_clusters(spark, dir))
    plan should not include "CartesianProduct"
    plan should not include "Window"
  }

  test("q90 DSIR joins the 256-row ratio table by broadcast") {
    val plan = planString(queries.CorpusQueries.q90_dsir_weights(spark, dir))
    plan should include("BroadcastHashJoin")
    plan should not include "CartesianProduct"
  }

  test("q91/q94 gram and chunk dedup never window and never cross-join") {
    for (q <- Seq(queries.CorpusQueries.q91_substring_dup _,
                  queries.CorpusQueries.q94_chunk_dedup _)) {
      val plan = planString(q(spark, dir))
      plan should not include "Window"
      plan should not include "CartesianProduct"
    }
  }

  test("q81 k-per-group sample plans the heap TopKPerKeyExec, not a window") {
    val plan = planString(queries.PipelineQueries.q81_group_sample(spark, dir))
    plan should include("TopKPerKey")
    plan should not include "Window"
  }

  test("q54/q67 cluster sizes are a groupBy+join, never a window over cluster_id") {
    // a window over cluster_id funnels a whale component's every member
    // through ONE task's buffer; groupBy+join is map-side combinable and
    // the join key (the CC output) is already well-distributed
    for (q <- Seq(queries.PipelineQueries.q54_dup_clusters _,
                  queries.PipelineQueries.q67_dup_clusters_bigstar _)) {
      val plan = planString(q(spark, dir))
      plan should not include "Window"
      plan should include("HashAggregate")
    }
  }

  test("q60 funnel's dedup flag is an id-only aggregate (no text window)") {
    val plan = planString(queries.PipelineQueries.q60_filter_funnel(spark, dir))
    plan should not include "Window"
  }

  test("q70 decontamination's gram join is an equi-join on the md5 hash") {
    val plan = planString(queries.PipelineQueries.q70_ngram_decontam(spark, dir))
    plan should not include "CartesianProduct"
    // the train x test gram join keys on the hash column (grams never
    // travel as text); the only nested-loop joins in the plan are the
    // final one-row x one-row report combines
    plan should include regex "(BroadcastHashJoin|SortMergeJoin|ShuffledHashJoin) \\[gh"
    // the bloom semi-join pre-prune sits on the TRAIN side, so non-
    // candidate grams die in the scan stage, BEFORE the join exchange —
    // at 100 TB the train-gram shuffle is the dominant cost
    plan should include("bloom_might_contain_long")
  }

  test("q71 unigram-LM keeps partial aggregation on both stages") {
    val df = queries.PipelineQueries.q71_unigram_lm(spark, dir)
    planString(df) should include("HashAggregate")
    // (doc,tok) agg -> head bcast join -> tail join -> doc agg -> sort
    countShuffles(df) should be <= 6
  }

  test("q71's stopword skew takes the broadcast head, not the tok shuffle") {
    val plan = planString(queries.PipelineQueries.q71_unigram_lm(spark, dir))
    // the Zipf head (top-frequency tokens) joins via broadcast — the
    // skewed keys never land on a single tok partition; only the
    // bounded-rows-per-key tail shuffle-joins on tok
    plan should include("BroadcastHashJoin")
  }

  test("q77 semantic decontam broadcasts the test side; partial max before the exchange") {
    val df = queries.PipelineQueries.q77_semantic_decontam(spark, dir)
    val plan = planString(df)
    // the held-out set broadcasts (that's what makes it a held-out set);
    // no shuffle ever carries the |train| x |test| pair fan-out — partial
    // aggregation collapses it to one row per train vector first
    plan should include("BroadcastNestedLoopJoin")
    plan should not include "SortMergeJoin"
    countShuffles(df) should be <= 3
  }

  test("q83 bucketed decontam: no broadcast of the test side, no pair fan-out join") {
    import org.apache.spark.sql.catalyst.plans.logical.Join
    val df = queries.PipelineQueries.q83_decontam_lsh(spark, dir)
    val plan = planString(df)
    // q77's scale path: every join is an equi-join on band key or id —
    // never the |train| x |test| nested loop, and no forced broadcast hint
    // anywhere (AQE may still auto-broadcast a genuinely small side)
    plan should not include "BroadcastNestedLoopJoin"
    plan should not include "CartesianProduct"
    val hints = df.queryExecution.optimizedPlan.collect { case j: Join => j.hint }
    all(hints.map(h => (h.leftHint, h.rightHint))) shouldBe (None, None)
  }

  test("q78/q79 profile queries are join-free combinable aggregations") {
    for (q <- Seq(queries.PipelineQueries.q78_length_buckets _,
                  queries.PipelineQueries.q79_blocklist_filter _)) {
      val df = q(spark, dir)
      val plan = planString(df)
      plan should not include "Join"
      plan should not include "Window"
      countShuffles(df) should be <= 2 // agg combine + final sort
    }
  }

  test("q65 pii masking adds zero shuffles (narrow per-row transform)") {
    val df = queries.GovernanceQueries.q65_pii_mask(spark, dir)
    // the only exchange allowed is the final orderBy's range partition
    countShuffles(df) should be <= 1
  }

  test("q72 quantization audit folds on the row: one combine exchange") {
    val df = queries.PipelineQueries.q72_embed_quantize(spark, dir)
    // per-label combine + final sort; NO per-element explode shuffle,
    // no vec_id self-join
    countShuffles(df) should be <= 2
    planString(df) should not include "Join"
  }

  test("q74 winnow self-join reuses the fingerprint subplan (no recompute)") {
    val plan = planString(queries.PipelineQueries.q74_winnow_dedup(spark, dir))
    plan should include("ReusedExchange")
    plan should not include "CartesianProduct"
  }

  test("q103 packing windows partition by (lang, shard) — never one global sort") {
    val plan = planString(queries.CorpusQueries.q103_seq_pack(spark, dir))
    // the running-total window must be keyed (hashpartitioning), not a
    // SinglePartition collapse — the shard key is what bounds it at scale
    plan should include ("hashpartitioning")
    plan should not include "SinglePartition, ENSURE_REQUIREMENTS"
  }

  test("q104 covariance shuffles moments, not rows (partial agg before exchange)") {
    val df = queries.CorpusQueries.q104_covariance(spark, dir)
    val plan = planString(df)
    // within-row pair generate pipelines into a partial HashAggregate:
    // each map task emits <= d*(d+1)/2 moment rows, so the exchange is
    // constant-size regardless of corpus rows
    plan should include ("HashAggregate")
    plan should not include "CartesianProduct"
    // moment tables join back broadcast — never a shuffled join of sums
    plan should include ("BroadcastHashJoin")
    plan should not include "SortMergeJoin"
  }

  test("q105 JL gate broadcasts the bounded query side only") {
    val plan = planString(queries.CorpusQueries.q105_jl_distortion(spark, dir))
    plan should include ("BroadcastNestedLoopJoin")
    plan should not include "CartesianProduct"
    plan should not include "SortMergeJoin"
  }

  test("q106 stratified quota: per-stratum windows plus one broadcast of quotas") {
    val plan = planString(queries.CorpusQueries.q106_stratified_sample(spark, dir))
    plan should include ("hashpartitioning")
    plan should include ("BroadcastHashJoin")
    plan should not include "SortMergeJoin"
  }

  test("q107 curriculum touches the corpus in exactly one aggregate pass") {
    val df = queries.CorpusQueries.q107_curriculum(spark, dir)
    val plan = planString(df)
    // one scan of documents; all schedule math runs on broadcast-sized sides
    plan.sliding("FileScan parquet".length)
      .count(_ == "FileScan parquet") shouldBe 1
    plan should not include "SortMergeJoin"
  }

  test("q108 CMS build keeps partial aggregation: 1024-counter state, broadcast probe") {
    val plan = planString(queries.CorpusQueries.q108_cms_estimate(spark, dir))
    // sketch counters join back to the top-20 probe side by broadcast;
    // the ground-truth top-20 is a TakeOrdered, not a global sort
    plan should include ("BroadcastHashJoin")
    plan should include ("TakeOrderedAndProject")
    plan should not include "SortMergeJoin"
  }

  test("q109 propagation rounds aggregate neighbors — no window over the graph") {
    val plan = planString(queries.CorpusQueries.q109_quality_prop(spark, dir))
    plan should not include "CartesianProduct"
    // per-round neighbor means are hash aggregates; the only windows
    // belong to the (checkpointed) LSH bucket-cap subplan, outside this plan
    plan should not include "Window"
  }

  test("q110 vocab growth shuffles (token, min-decile) once; window sees 10 rows") {
    val df = queries.CorpusQueries.q110_vocab_growth(spark, dir)
    val plan = planString(df)
    // one corpus scan feeding both aggregates; no join before aggregation
    plan should not include "SortMergeJoin"
    plan should not include "CartesianProduct"
  }

  test("q111 pagerank conserves probability mass and stays off cartesians") {
    val df = queries.CorpusQueries.q111_source_rank(spark, dir)
    planString(df) should not include "CartesianProduct"
    // damped PageRank with dangling teleport is a probability distribution
    val mass = df.agg(org.apache.spark.sql.functions.sum("pagerank"))
      .collect()(0).getDouble(0)
    mass shouldBe 1.0 +- 1e-3
  }

  test("q112 contamination spans: position explode only after the test-gram join") {
    val plan = planString(queries.CorpusQueries.q112_contam_spans(spark, dir))
    plan should not include "CartesianProduct"
    // grams meet the test set on an md5 equi-join — a keyed exchange
    plan should include ("hashpartitioning")
  }

  test("q113 embedding drift: per-dim means computed once, no cartesian") {
    val plan = planString(queries.CorpusQueries.q113_embed_drift(spark, dir))
    plan should not include "CartesianProduct"
    plan should not include "SortMergeJoin"
  }

  test("q115 budget selection: per-source windows only, no global sort") {
    val plan = planString(queries.CorpusQueries.q115_budget_select(spark, dir))
    plan should include ("hashpartitioning")
    plan should not include "SinglePartition, ENSURE_REQUIREMENTS"
    plan should not include "CartesianProduct"
  }

  test("q116 bigram LM: count tables join by key, never broadcast or cartesian") {
    val plan = planString(queries.CorpusQueries.q116_bigram_lm(spark, dir))
    plan should not include "CartesianProduct"
    // the only nested-loop is the one-row total; vocabulary-sized count
    // tables must meet the position rows on keyed exchanges
    plan should include ("hashpartitioning")
  }

  test("q117 RAG windows shuffle (hash, length) structs — chunk text stays put") {
    val plan = planString(queries.CorpusQueries.q117_rag_chunks(spark, dir))
    plan should not include "CartesianProduct"
    plan should include ("hashpartitioning")
  }

  test("q118 negative-sampling table: one vocab aggregate + TakeOrdered") {
    val plan = planString(queries.CorpusQueries.q118_neg_sampling(spark, dir))
    plan should include ("TakeOrderedAndProject")
    plan should not include "SortMergeJoin"
  }

  test("q119 winsorized stats: percentiles broadcast back, no cartesian on docs") {
    val plan = planString(queries.CorpusQueries.q119_robust_stats(spark, dir))
    plan should include ("BroadcastHashJoin")
    plan should not include "SortMergeJoin"
    plan should not include "CartesianProduct"
  }

  test("q120 chi-square: one corpus aggregate, grid math is broadcast-scale") {
    val plan = planString(queries.CorpusQueries.q120_lang_source_chi2(spark, dir))
    plan should not include "SortMergeJoin"
    // the only nested-loops are the marginal/dims one-row or L x S sides
    plan should not include "CartesianProduct"
  }

  test("q121 classifier inference: per-row fold, no joins at all") {
    val plan = planString(queries.CorpusQueries.q121_quality_classifier(spark, dir))
    plan should not include "Join"
    plan should not include "CartesianProduct"
  }

  test("q122 bootstrap: replica shuffle only, no cartesian on docs") {
    val plan = planString(queries.CorpusQueries.q122_bootstrap_se(spark, dir))
    plan should not include "SortMergeJoin"
    plan should not include "CartesianProduct"
  }

  test("q123 kappa: one corpus aggregate, marginal joins broadcast") {
    val plan = planString(queries.CorpusQueries.q123_langid_kappa(spark, dir))
    plan should not include "SortMergeJoin"
    plan should not include "CartesianProduct"
  }

  test("q124 leakage audit: cutoff broadcast back, one user aggregate") {
    val plan = planString(queries.CorpusQueries.q124_temporal_leakage(spark, dir))
    plan should not include "SortMergeJoin"
    plan should not include "CartesianProduct"
  }

  test("q125 LSH planner: config side broadcast, pairs never cartesian") {
    val plan = planString(queries.CorpusQueries.q125_lsh_planner(spark, dir))
    plan should not include "CartesianProduct"
    plan should include ("BroadcastNestedLoopJoin")
  }

  test("q126 skew profile: one key-count aggregate, nothing else") {
    val plan = planString(queries.CorpusQueries.q126_skew_profile(spark, dir))
    plan should not include "Join"
    plan should not include "Window"
  }

  test("q127 MAD outliers: percentiles broadcast back, no SMJ on events") {
    val plan = planString(queries.CorpusQueries.q127_mad_outliers(spark, dir))
    plan should include ("BroadcastHashJoin")
    plan should not include "SortMergeJoin"
    plan should not include "CartesianProduct"
  }

  test("q128 tail index: top-k is a TakeOrdered, never a global sort") {
    val plan = planString(queries.CorpusQueries.q128_tail_index(spark, dir))
    plan should include ("TakeOrderedAndProject")
    plan should not include "CartesianProduct"
  }

  test("q129 calibration: zero-shuffle scoring, one bin aggregate") {
    val plan = planString(queries.CorpusQueries.q129_score_calibration(spark, dir))
    plan should not include "Join"
    plan should not include "Window"
  }

  test("q130 Benford: one 9-group aggregate, total broadcast back") {
    val plan = planString(queries.CorpusQueries.q130_benford(spark, dir))
    plan should not include "SortMergeJoin"
    plan should not include "CartesianProduct"
  }

  test("q131 funnel: user_id-keyed joins, no cartesian") {
    val plan = planString(queries.CorpusQueries.q131_event_funnel(spark, dir))
    plan should not include "CartesianProduct"
  }

  test("q132 interarrival: lag window partitioned by user, never global") {
    val plan = planString(queries.CorpusQueries.q132_interarrival(spark, dir))
    plan should include ("Window")
    plan should not include "CartesianProduct"
    // partitioned lag — not the single-partition global window shape
    plan should not include "No Partition Defined"
  }

  test("q133 retention: user-keyed aggregates, cohort sizes broadcast") {
    val plan = planString(queries.CorpusQueries.q133_retention_cohorts(spark, dir))
    plan should not include "CartesianProduct"
    plan should include ("BroadcastHashJoin")
  }

  test("q134 isotropy: one posexplode aggregate, d-row math after") {
    val plan = planString(queries.CorpusQueries.q134_embed_isotropy(spark, dir))
    plan should not include "SortMergeJoin"
    plan should not include "CartesianProduct"
  }

  test("q135 markov: lag window partitioned by user, totals broadcast") {
    val plan = planString(queries.CorpusQueries.q135_markov_transitions(spark, dir))
    plan should include ("Window")
    plan should not include "No Partition Defined"
    plan should not include "SortMergeJoin"
  }

  test("q136 snowflake: dims broadcast, no cartesian; fact-fact may SMJ") {
    val plan = planString(queries.CorpusQueries.q136_regional_revenue(spark, dir))
    plan should include ("BroadcastHashJoin")
    plan should not include "CartesianProduct"
  }

  test("q137 basket: pair join keys on orderkey, frequencies broadcast") {
    val plan = planString(queries.CorpusQueries.q137_basket_lift(spark, dir))
    plan should not include "CartesianProduct"
    plan should include ("TakeOrderedAndProject")
  }

  test("q138 RFM: tercile cuts broadcast back, one customer aggregate") {
    val plan = planString(queries.CorpusQueries.q138_rfm_segments(spark, dir))
    plan should not include "SortMergeJoin"
    plan should not include "CartesianProduct"
  }

  test("q139 Zipf fit: vocabulary top-k is a TakeOrdered before the window") {
    val plan = planString(queries.CorpusQueries.q139_zipf_fit(spark, dir))
    plan should include ("TakeOrderedAndProject")
    plan should not include "CartesianProduct"
  }

  test("q140 Mann-Kendall: daily pair join is a broadcast, never cartesian on events") {
    val plan = planString(queries.CorpusQueries.q140_trend_test(spark, dir))
    plan should not include "CartesianProduct"
  }

  test("q141 ACF: spine left-join + lag equi-joins, no SMJ needed") {
    val plan = planString(queries.CorpusQueries.q141_acf_seasonality(spark, dir))
    plan should not include "CartesianProduct"
  }

  test("q142 pair histogram: strided equi-join sample, no cartesian on vectors") {
    val plan = planString(queries.CorpusQueries.q142_pair_histogram(spark, dir))
    plan should not include "CartesianProduct"
  }

  test("q143 dup degrees: capped pair list feeds two combinable aggregates") {
    val plan = planString(queries.CorpusQueries.q143_dup_degrees(spark, dir))
    plan should not include "CartesianProduct"
  }

  test("q144 join contract: anti-joins on the key, percentile on bounded groups") {
    val plan = planString(queries.CorpusQueries.q144_join_contract(spark, dir))
    plan should not include "CartesianProduct"
  }

  test("q145 unshipped revenue: top-10 plans TakeOrderedAndProject, no global sort") {
    val plan = planString(queries.CorpusQueries.q145_unshipped_revenue(spark, dir))
    plan should include("TakeOrderedAndProject")
    plan should not include "CartesianProduct"
  }

  test("q146 small-qty revenue: brand slice broadcasts, no cartesian") {
    val plan = planString(queries.CorpusQueries.q146_small_qty_revenue(spark, dir))
    plan should include("BroadcastHashJoin")
    plan should not include "CartesianProduct"
  }

  test("q147 last-touch: as-of union-window shape, no range-join explosion") {
    val plan = planString(queries.CorpusQueries.q147_last_touch(spark, dir))
    plan should not include "CartesianProduct"
    // the as-of is the union + ordered-window, not a theta join
    plan should include("Window")
  }

  test("q148 triangles: wedge join keys on shared vertex, no cartesian") {
    val plan = planString(queries.CorpusQueries.q148_dup_triangles(spark, dir))
    plan should not include "CartesianProduct"
  }

  test("q149 target encoding: one corpus aggregate, fold math on 25 rows") {
    val plan = planString(queries.CorpusQueries.q149_target_encoding(spark, dir))
    plan should not include "CartesianProduct"
  }

  test("q150 top supplier: argmax via broadcast max probe, no window sort") {
    val plan = planString(queries.CorpusQueries.q150_top_supplier(spark, dir))
    plan should include("BroadcastHashJoin")
    plan should not include "CartesianProduct"
    plan should not include "Window"
  }

  test("q151 order-count distribution: outer join keeps zero-order customers") {
    val plan = planString(queries.CorpusQueries.q151_order_count_dist(spark, dir))
    plan should include("LeftOuter")
    plan should not include "CartesianProduct"
  }

  test("q152 late orders: EXISTS plans as one semi-join, no double-count") {
    val plan = planString(queries.CorpusQueries.q152_late_orders(spark, dir))
    plan should include("LeftSemi")
    plan should not include "CartesianProduct"
  }

  test("q153 sole-late supplier: semi + anti self-joins on orderkey, top-10 heap") {
    val plan = planString(queries.CorpusQueries.q153_sole_late_supplier(spark, dir))
    plan should include("LeftSemi")
    plan should include("LeftAnti")
    plan should include("TakeOrderedAndProject")
    plan should not include "CartesianProduct"
  }

  test("q154 A/B test: two combinable aggregates, no joins at all") {
    val plan = planString(queries.CorpusQueries.q154_ab_test(spark, dir))
    plan should not include "Join"
    plan should not include "CartesianProduct"
  }

  test("q155 quantile map: bounded posexplode, broadcast global cuts") {
    val plan = planString(queries.CorpusQueries.q155_quantile_norm(spark, dir))
    plan should include("Generate")
    plan should not include "CartesianProduct"
  }

  test("q156 survival: windows only on the bounded day series") {
    val plan = planString(queries.CorpusQueries.q156_survival(spark, dir))
    plan should include("Window")
    plan should not include "CartesianProduct"
  }

  test("q157 cumulative uniques: dedup-then-cumsum, window on day series only") {
    val plan = planString(queries.CorpusQueries.q157_cumulative_uniques(spark, dir))
    plan should include("Window")
    plan should not include "CartesianProduct"
  }

  test("q158 CUSUM: corpus collapses to day counts, top-5 is TakeOrdered") {
    val plan = planString(queries.CorpusQueries.q158_cusum_changepoint(spark, dir))
    plan should include("TakeOrderedAndProject")
    plan should not include "CartesianProduct"
  }

  test("q159 table profile: single aggregate pass, Expand for exact distincts") {
    val plan = planString(queries.CorpusQueries.q159_table_profile(spark, dir))
    plan should include("Expand")
    plan should not include "Join"
  }

  test("q160 fuzzy vocab: levenshtein runs on the distinct dictionary, blocked") {
    val plan = planString(queries.CorpusQueries.q160_fuzzy_vocab_pairs(spark, dir))
    plan should not include "CartesianProduct"
  }

  test("q161 event paths: lead windows partition on user_id, top-10 heap") {
    val plan = planString(queries.CorpusQueries.q161_event_paths(spark, dir))
    plan should include("Window")
    plan should include("TakeOrderedAndProject")
    plan should not include "CartesianProduct"
  }

  test("q162 moments: one combinable aggregate, no joins, no windows") {
    val plan = planString(queries.CorpusQueries.q162_moment_profile(spark, dir))
    plan should not include "Join"
    plan should not include "Window"
  }

  test("q163 Lindley backlog: windows partition per supplier, no cartesian") {
    val plan = planString(queries.CorpusQueries.q163_backlog_lindley(spark, dir))
    plan should include("Window")
    plan should not include "CartesianProduct"
  }

  test("q164 revenue share: corpus collapses before windows run") {
    val plan = planString(queries.CorpusQueries.q164_revenue_share(spark, dir))
    plan should include("Window")
    plan should not include "CartesianProduct"
  }

  test("q165 stickiness: explode-dedup rolling distinct, no window distinct") {
    val plan = planString(queries.CorpusQueries.q165_stickiness(spark, dir))
    plan should include("Generate")
    plan should not include "Window"
  }

  test("q166 Gini: rank window sorts the customer dimension, not lineitem") {
    val plan = planString(queries.CorpusQueries.q166_revenue_gini(spark, dir))
    plan should include("Window")
    // the window input is the per-customer aggregate, not raw orders
    plan should not include "CartesianProduct"
  }

  test("q167 readability: regex counts in one combinable aggregate, no joins") {
    val plan = planString(queries.CorpusQueries.q167_readability(spark, dir))
    plan should not include "Join"
    plan should not include "Window"
  }

  test("q168 ship latency: one orderkey join, bounded percentile groups") {
    val plan = planString(queries.CorpusQueries.q168_ship_latency(spark, dir))
    plan should not include "CartesianProduct"
    plan should not include "Window"
  }

  test("q170 partition advisor: one Expand scan for all three candidate keys") {
    val plan = planString(queries.CorpusQueries.q170_partition_advisor(spark, dir))
    plan should include("Expand")
    plan should not include "Join"
  }

  test("q171/q169 heatmap + jaccard histogram: windows only over bounded cells") {
    val plan = planString(queries.CorpusQueries.q171_activity_heatmap(spark, dir))
    // the window input is the 7x24 cell aggregate, never raw events
    plan should not include "CartesianProduct"
  }

  test("q174/q185 agg-first joins: customer joins the aggregate, top-k is a heap") {
    val p174 = planString(queries.CorpusQueries.q174_returned_revenue(spark, dir))
    p174 should include("TakeOrderedAndProject")
    val p185 = planString(queries.CorpusQueries.q185_big_orders(spark, dir))
    p185 should include("TakeOrderedAndProject")
  }

  test("q175/q176 trade OLAP: nation dims broadcast, no cartesian on facts") {
    val p175 = planString(queries.CorpusQueries.q175_bilateral_volume(spark, dir))
    p175 should include("BroadcastHashJoin")
    p175 should not include "CartesianProduct"
    val p176 = planString(queries.CorpusQueries.q176_market_share(spark, dir))
    p176 should include("BroadcastHashJoin")
    p176 should not include "CartesianProduct"
  }

  test("q178 cluster canonical: per-cluster argmax is the heap, not a window") {
    val plan = planString(queries.CorpusQueries.q178_cluster_canonical(spark, dir))
    plan should include("TopKPerKey")
  }

  test("q181 join cardinality: histogram joins carry key counts, no cartesian") {
    val plan = planString(queries.CorpusQueries.q181_join_cardinality(spark, dir))
    plan should not include "CartesianProduct"
  }

  test("q183 prefix join: equi-join on prefix tokens, no nested-loop") {
    val plan = planString(queries.CorpusQueries.q183_prefix_join(spark, dir))
    plan should not include "CartesianProduct"
    plan should not include "BroadcastNestedLoopJoin"
  }

  test("q186 window profile: exactly one window operator spans all five frames") {
    val plan = planString(queries.CorpusQueries.q186_window_profile(spark, dir))
    // both frame variants share the (o_custkey, price-order) partitioning: one
    // exchange, window operators but no second shuffle
    countShuffles(queries.CorpusQueries.q186_window_profile(spark, dir)) should be <= 2
    plan should include("Window")
  }

  test("q187 min-cost supplier: decorrelated min + broadcast dims + heap top-100") {
    val plan = planString(queries.CorpusQueries.q187_min_cost_supplier(spark, dir))
    plan should include("TakeOrderedAndProject")
    plan should include("BroadcastHashJoin")
  }

  test("q188 forecast revenue: predicates reach the parquet scan") {
    val plan = planString(queries.CorpusQueries.q188_forecast_revenue(spark, dir))
    // the full pushed list is [IsNotNull..., GreaterThanOrEqual(l_discount,0.04),
    // LessThanOrEqual(l_discount,0.06), LessThan(l_quantity,24.0)] — the plan
    // string truncates it, so pin the prefix that always renders
    plan should include regex "PushedFilters: \\[.*GreaterThanOrEqual\\(l_discou"
    plan should not include "Join"
  }

  test("q189 product profit: all dims broadcast, single fact-fact shuffle join") {
    val plan = planString(queries.CorpusQueries.q189_product_profit(spark, dir))
    plan should include("BroadcastHashJoin")
    plan should not include "CartesianProduct"
  }

  test("q190 important stock: global threshold is a one-row broadcast, semi-join prune") {
    val plan = planString(queries.CorpusQueries.q190_important_stock(spark, dir))
    plan should include("BroadcastNestedLoopJoin") // 1-row total vs part values
    plan should not include "SortMergeJoin"
  }

  test("q192 supplier census: NOT IN runs as a broadcast anti-join") {
    val plan = planString(queries.CorpusQueries.q192_supplier_census(spark, dir))
    plan should include("BroadcastHashJoin")
  }

  test("q193 dominant supplier: share test feeds a semi-join, no window") {
    val plan = planString(queries.CorpusQueries.q193_dominant_supplier(spark, dir))
    plan should not include "Window"
    plan should not include "CartesianProduct"
  }

  test("q194/q195 exact-moment statistics: one scan, one combine, no joins") {
    val p194 = planString(queries.CorpusQueries.q194_correlation_matrix(spark, dir))
    p194 should not include "Join"
    countShuffles(queries.CorpusQueries.q194_correlation_matrix(spark, dir)) should be <= 1
    val p195 = planString(queries.CorpusQueries.q195_ols_regression(spark, dir))
    p195 should not include "Join"
  }

  test("q196 mutual information: corpus scanned once, marginals broadcast back") {
    val plan = planString(queries.CorpusQueries.q196_mutual_information(spark, dir))
    plan should not include "SortMergeJoin"
  }

  test("q197 decayed activity: integer decay weights, one-row max-day broadcast") {
    val plan = planString(queries.CorpusQueries.q197_decayed_activity(spark, dir))
    plan should not include "SortMergeJoin"
    plan should not include "Window"
  }

  test("q198 daily spearman: windows over the bounded day series only") {
    val df = queries.CorpusQueries.q198_daily_spearman(spark, dir)
    val plan = planString(df)
    // the window input is the per-day aggregate (≤31 rows), never raw events
    plan should include("Window")
    plan should not include "CartesianProduct"
  }

  test("q199 silhouette: centroids broadcast, no window, no second corpus join") {
    val plan = planString(queries.CorpusQueries.q199_cluster_silhouette(spark, dir))
    plan should not include "Window"
    plan should not include "SortMergeJoin"
  }

  test("q200 Theil-Sen: pair join and median window run on the day series only") {
    val plan = planString(queries.CorpusQueries.q200_theilsen_trend(spark, dir))
    // the self-join input is the per-(type, day) aggregate, never raw events
    plan should not include "CartesianProduct"
  }

  test("q201 BM25: query set broadcast, per-query top-10 is the heap") {
    val plan = planString(queries.CorpusQueries.q201_bm25_topk(spark, dir))
    plan should include("TopKPerKey")
    plan should include("BroadcastHashJoin")
  }

  test("q202 PSI: fixed bins, counts combinable, totals broadcast back") {
    val plan = planString(queries.CorpusQueries.q202_psi_drift(spark, dir))
    plan should not include "SortMergeJoin"
    plan should not include "Window"
  }

  test("q203 ARI: one assignment pass, contingency bounded, no window") {
    val plan = planString(queries.CorpusQueries.q203_rand_index(spark, dir))
    plan should not include "Window"
    plan should not include "SortMergeJoin"
  }

  test("q204 funnel latency: user-keyed joins, no cartesian, no window") {
    val plan = planString(queries.CorpusQueries.q204_funnel_latency(spark, dir))
    plan should not include "CartesianProduct"
    plan should not include "Window"
  }

  test("q205 PQ codebooks: centroid broadcast per subspace, no window, no SMJ") {
    val plan = planString(queries.CorpusQueries.q205_pq_codebooks(spark, dir))
    plan should not include "Window"
    plan should not include "SortMergeJoin"
  }

  test("q206 novelty curve: groupBy-min firsts, integer deciles, no window") {
    val plan = planString(queries.CorpusQueries.q206_novelty_curve(spark, dir))
    plan should not include "Window"
    plan should not include "CartesianProduct"
  }

  test("q207 shuffle planner: one combinable count per key, nothing else") {
    val plan = planString(queries.CorpusQueries.q207_shuffle_planner(spark, dir))
    plan should not include "Join"
    plan should not include "Window"
  }

  test("q208 postings: queries touch postings rows, never the corpus scan") {
    val plan = planString(queries.CorpusQueries.q208_postings_index(spark, dir))
    plan should not include "CartesianProduct"
    plan should not include "Window"
  }

  test("q209 QoQ growth: dims broadcast, lag window on the reporting grain") {
    val plan = planString(queries.CorpusQueries.q209_qoq_growth(spark, dir))
    plan should include("BroadcastHashJoin")
    plan should not include "SortMergeJoin"
  }

  test("q213 substring dup: hash equi-joins only, no window, no cartesian") {
    val plan = planString(queries.CorpusQueries.q213_substring_dup(spark, dir))
    plan should not include "Window"
    plan should not include "CartesianProduct"
  }

  test("q214 k-center: per-round state carries no join (centers are literals)") {
    val plan = planString(queries.CorpusQueries.q214_kcenter_coreset(spark, dir))
    // the emitted 8-row frame is driver-local; the heavy lifting happened in
    // the k rounds, each a literal-center scan — no join survives to the plan
    plan should not include "Join"
    plan should not include "CartesianProduct"
  }

  test("q215 interval merge: one supplier-keyed window, no cartesian") {
    val plan = planString(queries.CorpusQueries.q215_interval_merge(spark, dir))
    plan should include("Window")
    plan should not include "CartesianProduct"
  }

  test("q216 weighted median: window runs on the (flag, price) pre-aggregate") {
    val df = queries.CorpusQueries.q216_weighted_median(spark, dir)
    val plan = planString(df)
    plan should include("Window")
    plan should not include "CartesianProduct"
    // the grain collapse must happen: an aggregate exists below the window
    plan should include("HashAggregate")
  }

  test("q217 KMV: min-k via the heap operator, no window, no sort-all") {
    // the heap sits in an early AQE stage the finalized plan string doesn't
    // expand — assert on the full pre-execution tree instead
    val plan = queries.CorpusQueries.q217_kmv_distinct(spark, dir)
      .queryExecution.executedPlan.toString
    plan should include("TopKPerKey [")
    plan should not include "Window"
  }

  test("q218 dup BFS: no cartesian, no window in the round plan") {
    val plan = planString(queries.CorpusQueries.q218_dup_bfs(spark, dir))
    plan should not include "CartesianProduct"
    plan should not include "Window"
  }

  test("q219 water filling: corpus collapses before the source-table windows") {
    val plan = planString(queries.CorpusQueries.q219_water_filling(spark, dir))
    plan should include("HashAggregate")
    plan should not include "CartesianProduct"
  }

  test("q220 shapley: one user-grain aggregate, no window, no cartesian") {
    val plan = planString(
      queries.CorpusQueries.q220_shapley_attribution(spark, dir))
    plan should not include "Window"
    plan should not include "CartesianProduct"
  }

  test("q221 ROC-AUC: rank window runs on the value grain, not raw rows") {
    val plan = planString(queries.CorpusQueries.q221_roc_auc(spark, dir))
    plan should include("Window")
    plan should include("HashAggregate")
    plan should not include "CartesianProduct"
  }

  test("q222 BPE pairs: vocab-grain collapse, heap top-20, no window") {
    val plan = queries.CorpusQueries.q222_bpe_pairs(spark, dir)
      .queryExecution.executedPlan.toString
    plan should include("TopKPerKey [")
    plan should not include "Window"
  }

  test("q223 conformal: windows only on the per-type value grain") {
    val plan = planString(
      queries.CorpusQueries.q223_conformal_coverage(spark, dir))
    plan should include("Window")
    plan should not include "CartesianProduct"
  }

  test("q224 LOO influence: one grouped agg, broadcast global, no window") {
    val plan = planString(queries.CorpusQueries.q224_loo_influence(spark, dir))
    plan should not include "Window"
    plan should not include "SortMergeJoin"
  }

  test("q225 RRF: both retrieval passes broadcast the query side") {
    val plan = planString(queries.CorpusQueries.q225_rrf_fusion(spark, dir))
    plan should include("BroadcastHashJoin").or(include("BroadcastNestedLoopJoin"))
    plan should not include "CartesianProduct"
  }

  test("q226 dup spans: positional shuffles carry (doc, pos) only") {
    val plan = planString(queries.CorpusQueries.q226_dup_spans(spark, dir))
    plan should not include "CartesianProduct"
    plan should include("Window")
  }

  test("q227 label MMD: pairwise matrix is a broadcast self-join") {
    val plan = planString(queries.CorpusQueries.q227_label_mmd(spark, dir))
    plan should include("BroadcastNestedLoopJoin")
    plan should not include "CartesianProduct"
  }

  test("q228 SCD2 as-of: interval predicate sits above the history window") {
    val plan = planString(queries.CorpusQueries.q228_scd2_asof(spark, dir))
    plan should include("Window")
    plan should not include "CartesianProduct"
  }

  test("q229 Kendall tau: pair join bounded to the calendar grain") {
    val plan = planString(queries.CorpusQueries.q229_kendall_tau(spark, dir))
    // day-grain collapse must come first; the d1 < d2 pair join is broadcast
    plan should include("HashAggregate")
    plan should include("BroadcastNestedLoopJoin")
  }

  test("q230 grouped OLS: one combinable sums pass, dims broadcast") {
    val plan = planString(queries.CorpusQueries.q230_grouped_ols(spark, dir))
    plan should include("BroadcastHashJoin")
    plan should not include "Window"
    plan should not include "SortMergeJoin"
  }

  test("q231 Heaps fit: decile collapse before the 10-point regression") {
    val plan = planString(queries.CorpusQueries.q231_heaps_fit(spark, dir))
    plan should include("HashAggregate")
    plan should not include "SortMergeJoin"
  }

  test("q232 source JSD: bounded grid algebra, no corpus self-join") {
    val plan = planString(queries.CorpusQueries.q232_source_jsd(spark, dir))
    plan should not include "CartesianProduct"
    plan should not include "Window"
  }

  test("q233 exp KS: one user-keyed lag window plus the value-grain cum") {
    val plan = planString(queries.CorpusQueries.q233_exp_ks_fit(spark, dir))
    plan should include("Window")
    plan should not include "CartesianProduct"
  }

  test("q234 assortativity: id-keyed joins only, one moment aggregate") {
    val plan = planString(
      queries.CorpusQueries.q234_dup_assortativity(spark, dir))
    plan should not include "CartesianProduct"
    plan should not include "Window"
  }

  test("q235 FD binning: quantiles from the value-grain cum, no raw sort") {
    // the grain table is checkpointed (reused 3x), so the window sits behind
    // the checkpoint scan; the visible plan must stay join-light
    val plan = planString(queries.CorpusQueries.q235_fd_binning(spark, dir))
    plan should not include "CartesianProduct"
    plan should not include "SortMergeJoin"
  }

  test("q236 distinct-n: three combinable aggregates, no window") {
    val plan = planString(queries.CorpusQueries.q236_distinct_n(spark, dir))
    plan should not include "Window"
    plan should not include "SortMergeJoin"
  }

  test("q12's fact-parent anti-join carries no forced broadcast hint") {
    import org.apache.spark.sql.catalyst.plans.logical.Join
    val df = transform.RefIntegrity.orphans(
      graft.tables.Tables.lineitem(spark, dir),
      graft.tables.Tables.orders(spark, dir),
      "l_orderkey", "o_orderkey")
    // AQE may still auto-broadcast a genuinely small parent — the defect was
    // the unconditional broadcast() hint, which ignores size thresholds.
    val hints = df.queryExecution.optimizedPlan.collect {
      case j: Join => j.hint
    }
    all(hints.map(h => (h.leftHint, h.rightHint))) shouldBe (None, None)
  }

  test("q295 vocab pairing is an equi-join on the block key, not cartesian") {
    val plan = planString(queries.LinkageQueries.q295_jaro_vocab(spark, dir))
    plan should not include "CartesianProduct"
    plan should not include "BroadcastNestedLoopJoin"
  }

  test("q301 DBSCAN candidate generation is an equi-join on grid cells") {
    val plan = planString(queries.EvalQueries.q301_dbscan_regimes(spark, dir))
    plan should not include "CartesianProduct"
  }

  test("q302 HITS top-k plans TakeOrderedAndProject, not a global sort") {
    val plan = planString(queries.EvalQueries.q302_hits_bipartite(spark, dir))
    plan should include("TakeOrderedAndProject")
  }

  test("q298 sketch build shuffles only bucket-grain rows (no value sort)") {
    // the sketch side is groupBy on ~40 integer buckets; the exact audit
    // windows live on the distinct-cents grain — but no shuffle may carry
    // the raw order rows more than once
    val df = queries.EvalQueries.q298_log2_quantile_sketch(spark, dir)
    df.collect().foreach { r =>
      r.getAs[Boolean]("within_bucket") shouldBe true
      r.getAs[Boolean]("merged_ok") shouldBe true
    }
  }

  test("q319 held-out audit is an equi-join on the gram key, not cartesian") {
    val plan = planString(queries.EvalQueries.q319_good_turing(spark, dir))
    plan should not include "CartesianProduct"
    // the only nested-loop is the 1-row estimator assembly crossJoin
  }

  test("q321 run windows partition on the block key, never a global sort") {
    val df = queries.EvalQueries.q321_encoding_advisor(spark, dir)
    val plan = planString(df)
    // a window with an empty partition spec would plan a SinglePartition
    // exchange UNDER a Window node; assert every Window carries the
    // l_orderkey partition key instead
    plan should include("l_orderkey")
    val rows = df.collect()
    rows.length shouldBe queries.EvalQueries.encodingColumns.length
    rows.foreach { r =>
      r.getLong(r.fieldIndex("n_runs")) should be <= r.getLong(r.fieldIndex("n"))
      r.getLong(r.fieldIndex("n_runs")) should be > 0L
      Set("dict_rle", "dict", "rle", "plain") should contain(
        r.getString(r.fieldIndex("encoding")))
    }
    // the profiled corpus must exercise more than one decision branch
    rows.map(_.getString(rows(0).fieldIndex("encoding"))).toSet.size should be > 1
  }

  test("q322 NB scoring broadcasts the bounded model, never shuffles it") {
    val plan = planString(queries.EvalQueries.q322_naive_bayes(spark, dir))
    plan should include("BroadcastHashJoin")
    val rows = queries.EvalQueries.q322_naive_bayes(spark, dir).collect()
    val nTest = rows.map(_.getAs[Long]("n")).sum
    rows.foreach { r =>
      val acc = r.getAs[Double]("accuracy")
      acc should (be >= 0.0 and be <= 1.0)
    }
    nTest should be > 0L
  }

  test("q323 CV selects exactly one lambda and refits with it everywhere") {
    val rows = queries.EvalQueries.q323_ridge_cv(spark, dir).collect()
    rows.length shouldBe queries.EvalQueries.ridgeLambdas.length
    rows.count(_.getAs[Boolean]("chosen")) shouldBe 1
    rows.map(_.getAs[Double]("final_slope_per_unit_qty")).distinct.length shouldBe 1
  }

  test("q324 EM parameters stay a valid ordered two-component mixture") {
    val r = queries.EvalQueries.q324_gaussian_em(spark, dir).collect()(0)
    r.getAs[Double]("pi1") should (be > 0.0 and be < 1.0)
    r.getAs[Double]("mu1") should be < r.getAs[Double]("mu2")
    r.getAs[Double]("sigma1") should be > 0.0
    r.getAs[Double]("sigma2") should be > 0.0
  }

  test("q325 Holt state is a bounded-grain fold, no UDF and no extra shuffle") {
    val plan = planString(queries.EvalQueries.q325_holt_smoothing(spark, dir))
    plan should not include "BatchEvalPython"
    plan should not include "ScalaUDF"
    val rows = queries.EvalQueries.q325_holt_smoothing(spark, dir).collect()
    rows.count(_.getAs[String]("kind") == "forecast") shouldBe 3
    // one-step fits exist for every month after the first
    val fits = rows.filter(_.getAs[String]("kind") == "fit")
    fits.count(r => !r.isNullAt(r.fieldIndex("fitted"))) shouldBe (fits.length - 1)
  }

  test("q326 Neyman allocation sums to ~budget and beats proportional") {
    val rows = queries.EvalQueries.q326_neyman_allocation(spark, dir).collect()
    val ney = rows.map(_.getAs[Long]("n_neyman")).sum
    ney should (be >= 9990L and be <= 10010L) // rounding slack only
    val ratio = rows.head.getAs[Double]("neyman_vs_prop_var_ratio")
    ratio should (be > 0.0 and be <= 1.0) // Cauchy-Schwarz: optimal ≤ prop
  }

  test("q327 MDE shrinks with sample size within the result") {
    val rows = queries.EvalQueries.q327_ab_power(spark, dir).collect()
    val byN = rows.sortBy(_.getAs[Long]("n_orders"))
    // largest nation must have a no-larger absolute MDE than the smallest
    byN.last.getAs[Double]("mde_abs") should be <=
      byN.head.getAs[Double]("mde_abs")
    rows.foreach(r => r.getAs[Long]("n_req_per_arm_5pct") should be > 0L)
  }

  test("q328 power iteration yields a unit eigenvector and bounded share") {
    val rows = queries.EvalQueries.q328_pca_power(spark, dir).collect()
    rows.length shouldBe 8
    val share = rows.head.getAs[Double]("variance_share")
    share should (be > 0.0 and be <= 1.0)
    rows.head.getAs[Double]("top_eigenvalue") should be > 0.0
    // loadings are components of a unit vector
    rows.foreach(r =>
      math.abs(r.getAs[Double]("loading")) should be <= 1.0)
  }

  test("q329 SSSP relaxes monotonically and the source stays at zero") {
    val rows = queries.EvalQueries.q329_sssp_latency(spark, dir).collect()
    val bySide = rows.map(r => r.getAs[String]("side") -> r).toMap
    bySide("supplier").getAs[Long]("min_days") shouldBe 0L // the source
    bySide("customer").getAs[Long]("min_days") should be > 0L
    rows.foreach { r =>
      r.getAs[Long]("max_days") should be >= r.getAs[Long]("min_days")
    }
  }

  test("q330 frame dedup finds the planted dups and caps hash buckets") {
    import org.apache.spark.sql.functions.{col, count, expr, lit, md5}
    val rows = queries.EvalQueries.q330_frame_dedup(spark, dir).collect()
    rows.length should be > 0
    rows.foreach { r =>
      val c = r.getAs[Double]("containment")
      c should (be >= 0.5 and be <= 1.0)
      r.getAs[Long]("shared") should be <=
        math.min(r.getAs[Long]("n_a"), r.getAs[Long]("n_b"))
    }
    // a degenerate frame shared by >100 media must be dropped: re-run the
    // capped index build against a synthetic whale and assert it vanishes
    import spark.implicits._
    val whale = (1L to 150L).map(i => (i, "SAMEFRAMESAMEFRA" * 2))
      .toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("s"))
      .withColumn("n_chars", expr("length(text)"))
    val media = graft.multimodal.Multimodal.packBinary(
      whale, "doc_id", "text", "video", "source")
    val frames = graft.multimodal.Multimodal
      .sampleFrames(media, "payload", frameBytes = 16, stride = 1)
      .select(col("media_id"), md5(col("frame")).as("fh")).distinct()
    val capped = frames.join(
      frames.groupBy(col("fh")).agg(count(lit(1)).as("df"))
        .filter(col("df") <= 100).select(col("fh")), "fh")
    capped.count() shouldBe 0L // every frame hash is a 150-media whale
  }

  test("q331 v-optimal segments are contiguous, exhaustive, and optimal-ish") {
    val rows = queries.EvalQueries.q331_voptimal_histogram(spark, dir)
      .collect().sortBy(_.getAs[Long]("segment"))
    rows.length shouldBe 8
    // contiguous cover of the value domain
    rows.sliding(2).foreach { case Array(a, c) =>
      c.getAs[Long]("v_start") should be > a.getAs[Long]("v_end")
    }
    val segSum = rows.map(_.getAs[Double]("seg_sse")).sum
    segSum shouldBe rows.head.getAs[Double]("total_sse") +- 1e-3
    // the DP can never lose to the flat histogram
    rows.head.getAs[Double]("total_sse") should be <=
      rows.head.getAs[Double]("flat_sse")
  }

  test("q332 KMV sketches are bounded by k and estimates bracket sanely") {
    val rows = queries.EvalQueries.q332_kmv_setops(spark, dir).collect()
    rows.length shouldBe 2
    rows.foreach { r =>
      r.getAs[Long]("k_eff") should be <= 64L   // sketch never exceeds k
      val exact = r.getAs[Long]("n_exact").toDouble
      val est = r.getAs[Double]("n_est")
      est should be > 0.0
      // when the side is smaller than k the estimator must be near-exact;
      // otherwise allow the standard ~1/sqrt(k) relative-error band (3 sigma)
      if (r.getAs[Long]("k_eff") < 64L) est shouldBe exact +- (exact * 0.05)
      else math.abs(est - exact) / exact should be < 3.0 / math.sqrt(64.0)
      r.getAs[Long]("inter_exact") should be <= r.getAs[Long]("union_exact")
      r.getAs[Double]("inter_est") should be <= r.getAs[Double]("union_est")
    }
  }

  test("q333 FFD bins respect capacity and the volume lower bound") {
    val rows = queries.EvalQueries.q333_ffd_compaction(spark, dir).collect()
    rows.length should be > 0
    rows.foreach { r =>
      val bins = r.getAs[Long]("n_bins_ffd")
      bins should be >= r.getAs[Long]("lower_bound") // can't beat volume
      bins should be <= r.getAs[Long]("n_files")     // one bin per file max
      val w = r.getAs[Double]("waste_frac")
      w should (be >= 0.0 and be < 1.0) // no bin ever over capacity
      r.getAs[Boolean]("is_optimal") shouldBe
        (bins == r.getAs[Long]("lower_bound"))
    }
  }

  test("q334 pagerank mass is conserved up to dropped dangling/floor dust") {
    val rows = queries.EvalQueries.q334_pagerank(spark, dir).collect()
    rows.length should be > 0
    val total = rows.map(_.getAs[Long]("pr_nano")).sum
    total should be <= 1000000000L          // floors only ever lose mass
    total should be > 100000000L            // teleport floor alone guarantees this
    rows.map(_.getAs[Long]("rank")).sorted shouldBe
      (1L to rows.length.toLong).toArray    // rank is a permutation
    // a node that receives nothing holds exactly the teleport base
    rows.filter(_.getAs[Long]("in_cc") == 0L)
      .map(_.getAs[Long]("pr_nano")).distinct.length should be <= 1
  }

  test("q335 HLL registers bound by m and merge equals direct build") {
    val rows = queries.EvalQueries.q335_hll(spark, dir).collect()
    rows.length should be > 1
    rows.foreach { r =>
      r.getAs[Long]("n_filled") should be <= 256L
      r.getAs[Boolean]("merged_eq") shouldBe true
      r.getAs[Double]("rel_err") should be < 0.25 // ~4σ at m=256
    }
  }

  test("q336 greedy set-cover gains are non-increasing (submodularity)") {
    val rows = queries.EvalQueries.q336_set_cover(spark, dir).collect()
      .sortBy(_.getAs[Long]("round"))
    rows.length shouldBe 5
    rows.sliding(2).foreach { case Array(a, b) =>
      b.getAs[Long]("gained") should be <= a.getAs[Long]("gained")
      b.getAs[Long]("cum_covered") shouldBe
        a.getAs[Long]("cum_covered") + b.getAs[Long]("gained")
    }
    rows.last.getAs[Double]("coverage_frac") should be <= 1.0
  }

  test("q337 EMD is a [0,1] distance and l bounded by the band domain") {
    val rows = queries.EvalQueries.q337_anonymity_audit(spark, dir).collect()
    rows.length should be > 0
    rows.foreach { r =>
      val e = r.getAs[Double]("emd")
      e should (be >= 0.0 and be <= 1.0)
      r.getAs[Long]("l_diversity") should be <= 6L
      r.getAs[Long]("l_diversity") should be <= r.getAs[Long]("n_g")
    }
  }

  test("q338 truncation recall is monotone in d and exact at full dim") {
    val rows = queries.EvalQueries.q338_matryoshka_recall(spark, dir)
      .collect().sortBy(_.getAs[Long]("d"))
    rows.map(_.getAs[Long]("d")) shouldBe Array(8L, 16L, 32L, 64L)
    rows.sliding(2).foreach { case Array(a, b) =>
      b.getAs[Double]("mean_recall") should be >=
        a.getAs[Double]("mean_recall") - 0.05 // monotone up to tie noise
    }
    rows.last.getAs[Double]("mean_recall") shouldBe 1.0
    rows.last.getAs[Double]("min_recall") shouldBe 1.0
  }

  test("q339 Boruvka forest equals driver-side Prim on the same edges") {
    import org.apache.spark.sql.functions.{abs => fabs, broadcast => bc, _}
    val got = queries.EvalQueries.q339_boruvka_mst(spark, dir).collect()
      .map(r => (r.getAs[Long]("u"), r.getAs[Long]("v"), r.getAs[Long]("w")))
      .toSet
    // independent truth: collect the bounded nation-grain edge list and
    // run Prim per component with the same wkey tie-break
    val li = graft.tables.Tables.lineitem(spark, dir)
    val edges = li
      .join(graft.tables.Tables.orders(spark, dir),
        col("l_orderkey") === col("o_orderkey"))
      .join(bc(graft.tables.Tables.customer(spark, dir)
        .select(col("c_custkey"), col("c_nationkey").cast("long").as("cn"))),
        col("o_custkey") === col("c_custkey"))
      .join(bc(graft.tables.Tables.supplier(spark, dir)
        .select(col("s_suppkey"), col("s_nationkey").cast("long").as("sn"))),
        col("l_suppkey") === col("s_suppkey"))
      .filter(col("cn") =!= col("sn"))
      .select(least(col("cn"), col("sn")).as("u"),
        greatest(col("cn"), col("sn")).as("v"),
        (fabs(datediff(col("l_shipdate"), col("o_orderdate"))) + 1)
          .cast("long").as("d"))
      .groupBy("u", "v").agg(min(col("d")).as("w"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct
    val adj = edges.flatMap { case (u, v, w) =>
      val k = w * 10000L + u * 31L + v
      Seq(u -> (k, u, v, w), v -> (k, u, v, w))
    }.groupBy(_._1).map { case (n, es) => n -> es.map(_._2).toSeq }
    val visited = scala.collection.mutable.Set.empty[Long]
    val prim = scala.collection.mutable.Set.empty[(Long, Long, Long)]
    for (start <- nodes.sorted if !visited.contains(start)) {
      visited += start
      val pq = scala.collection.mutable.PriorityQueue.empty[
        (Long, Long, Long, Long)](Ordering.by(e => -e._1))
      adj.getOrElse(start, Seq.empty[(Long, Long, Long, Long)])
        .foreach(e => pq.enqueue(e))
      while (pq.nonEmpty) {
        val (_, u, v, w) = pq.dequeue()
        val nxt = if (!visited.contains(u)) Some(u)
          else if (!visited.contains(v)) Some(v) else None
        nxt.foreach { n =>
          visited += n; prim += ((u, v, w))
          adj.getOrElse(n, Seq.empty[(Long, Long, Long, Long)])
            .foreach(e => pq.enqueue(e))
        }
      }
    }
    got shouldBe prim.toSet // exact forest equality, not just total weight
  }

  test("q340 hilbert wins curve continuity; edge census is ordering-free") {
    val rows = queries.EvalQueries.q340_hilbert_locality(spark, dir).collect()
      .map(r => r.getAs[String]("ordering") -> r).toMap
    rows.values.map(_.getAs[Long]("n_edges")).toSet.size shouldBe 1
    val h = rows("hilbert").getAs[Double]("seq_avg_dist")
    val m = rows("morton").getAs[Double]("seq_avg_dist")
    val r = rows("row_major").getAs[Double]("seq_avg_dist")
    h should be < m // the hilbert guarantee this advisor exists to surface
    m should be < r
  }

  test("q341 zone maps are sound and clustering only improves date skip") {
    val rows = queries.EvalQueries.q341_zonemap_advisor(spark, dir).collect()
    rows.length shouldBe 32
    rows.foreach { r =>
      r.getAs[Long]("rows_match") should be <= r.getAs[Long]("rows_in_hit")
      if (r.getAs[Long]("files_hit") == 0L)
        r.getAs[Long]("rows_match") shouldBe 0L // never skip a matching row
    }
    val byKey = rows.map(r => (r.getAs[String]("layout"),
      r.getAs[String]("pred")) -> r).toMap
    byKey.keys.filter(_._2.startsWith("date_")).map(_._2).foreach { p =>
      byKey(("date_clustered", p)).getAs[Double]("skip_frac") should be >=
        byKey(("arrival", p)).getAs[Double]("skip_frac")
    }
  }

  test("q342 funnel is monotone and removals reconcile") {
    val rows = queries.EvalQueries.q342_dedup_funnel(spark, dir).collect()
      .sortBy(_.getAs[Long]("stage_id"))
    rows.length shouldBe 4
    rows.sliding(2).foreach { case Array(a, b) =>
      b.getAs[Long]("docs_kept") should be <= a.getAs[Long]("docs_kept")
      b.getAs[Long]("tokens_kept") should be <= a.getAs[Long]("tokens_kept")
    }
    rows.map(_.getAs[Long]("docs_removed")).sum shouldBe
      rows.head.getAs[Long]("docs_kept") - rows.last.getAs[Long]("docs_kept")
    rows.foreach(_.getAs[Double]("tok_frac") should (be > 0.0 and be <= 1.0))
  }

  test("q343 drop fraction is monotone in watermark delay, zero at cap") {
    val rows = queries.EvalQueries.q343_watermark_advisor(spark, dir)
      .collect().sortBy(_.getAs[Long]("delay_s"))
    rows.length shouldBe 5
    rows.sliding(2).foreach { case Array(a, b) =>
      b.getAs[Long]("dropped") should be <= a.getAs[Long]("dropped")
    }
    // jitter is bounded at 120s, so the 120s delay must drop nothing
    rows.last.getAs[Long]("dropped") shouldBe 0L
    rows.last.getAs[Long]("max_late_us") should be <= 120000000L
  }

  test("q345 TTL misses are monotone and caught+missed reconcile") {
    val rows = queries.EvalQueries.q345_dedup_ttl_advisor(spark, dir)
      .collect().sortBy(_.getAs[Long]("ttl_s"))
    rows.length shouldBe 4
    rows.sliding(2).foreach { case Array(a, b) =>
      b.getAs[Long]("missed") should be <= a.getAs[Long]("missed")
    }
    rows.foreach { r =>
      r.getAs[Long]("caught") + r.getAs[Long]("missed") shouldBe
        r.getAs[Long]("n_redeliveries")
    }
  }

  test("q344 OOV falls and coverage rises with vocab size") {
    val rows = queries.EvalQueries.q344_vocab_oov(spark, dir)
      .collect().sortBy(_.getAs[Long]("vocab_requested"))
    rows.length shouldBe 3
    rows.sliding(2).foreach { case Array(a, b) =>
      b.getAs[Double]("oov_inst_frac") should be <=
        a.getAs[Double]("oov_inst_frac")
      b.getAs[Double]("train_coverage") should be >=
        a.getAs[Double]("train_coverage")
    }
    rows.foreach { r =>
      r.getAs[Long]("vocab_actual") should be <=
        r.getAs[Long]("vocab_requested")
    }
  }

  test("q346 costs reconcile and breakeven is consistent with them") {
    val rows = queries.EvalQueries.q346_join_strategy(spark, dir).collect()
    rows.length shouldBe 3
    rows.foreach { r =>
      val a = r.getAs[Long]("bytes_a"); val b = r.getAs[Long]("bytes_b")
      r.getAs[Long]("smj_shuffle_bytes") shouldBe a + b
      r.getAs[Long]("bc_replicated_bytes") shouldBe math.min(a, b) * 1000L
      r.getAs[Long]("breakeven_execs") shouldBe (a + b) / math.min(a, b)
      val rec = r.getAs[String]("recommended")
      rec shouldBe (if (math.min(a, b) * 1000L < a + b) "broadcast"
        else "sort_merge")
    }
  }

  test("q347 a walk-deterministic doc actually reconstructs verbatim") {
    import org.apache.spark.sql.functions.{col, size => fsize, split => fsplit}
    val docs = graft.tables.Tables.documents(spark, dir)
      .filter(fsize(fsplit(col("text"), " ")) >= 3)
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    // recompute per-doc branching driver-side and walk every
    // deterministic doc back from its released trigram set
    var checked = 0
    docs.foreach { case (_, text) =>
      val tk = text.split(" ")
      val succ = tk.sliding(3).toSeq
        .map(w => (w(0), w(1)) -> w(2)).distinct
        .groupBy(_._1).map { case (k, v) => k -> v.map(_._2) }
      if (succ.values.forall(_.size == 1) && checked < 25) {
        checked += 1
        val sb = scala.collection.mutable.ArrayBuffer(tk(0), tk(1))
        var guard = 0
        while (guard < tk.length &&
          succ.contains((sb(sb.length - 2), sb(sb.length - 1))) &&
          sb.length < tk.length) {
          sb += succ((sb(sb.length - 2), sb(sb.length - 1))).head
          guard += 1
        }
        sb.mkString(" ") shouldBe text // verbatim leak, proven
      }
    }
    checked should be > 0
    // and the query's census agrees with a driver-side recount
    val q = queries.EvalQueries.q347_ngram_privacy(spark, dir).collect()
    val detTotal = q.map(_.getAs[Long]("n_reconstructible")).sum
    val driverDet = docs.values.count { text =>
      val tk = text.split(" ")
      tk.sliding(3).toSeq.map(w => (w(0), w(1)) -> w(2)).distinct
        .groupBy(_._1).values.forall(_.map(_._2).size == 1)
    }
    detTotal shouldBe driverDet.toLong
  }

  test("q348 sharper bands never cost more and recall stays a fraction") {
    val rows = queries.EvalQueries.q348_lsh_sweep(spark, dir).collect()
      .sortBy(_.getAs[Long]("rows_per_band"))
    rows.length shouldBe 3
    rows.sliding(2).foreach { case Array(a, b) =>
      // higher rows-per-band = sharper S-curve = fewer candidates
      b.getAs[Long]("n_candidates") should be <=
        a.getAs[Long]("n_candidates")
    }
    rows.foreach { r =>
      r.getAs[Long]("n_hits") should be <= r.getAs[Long]("n_exact")
      r.getAs[Long]("n_hits") should be <= r.getAs[Long]("n_candidates")
      val rc = r.getAs[Double]("recall")
      rc should (be >= 0.0 and be <= 1.0)
    }
  }

  test("q349 prefix filtering is lossless by theorem — recall exactly 1") {
    val rows = queries.EvalQueries.q349_prefix_filter_join(spark, dir)
      .collect().map(r => r.getAs[String]("blocker") -> r).toMap
    val pf = rows("prefix_filter")
    pf.getAs[Double]("recall") shouldBe 1.0 // not approximately: the theorem
    pf.getAs[Long]("n_found") shouldBe pf.getAs[Long]("n_truth")
    pf.getAs[Long]("n_candidates") should be >= pf.getAs[Long]("n_truth")
  }

  test("q350 every scheme covers the workload and errors are coherent") {
    val rows = queries.EvalQueries.q350_histogram_bakeoff(spark, dir)
      .collect()
    rows.length shouldBe 3
    rows.foreach { r =>
      r.getAs[Long]("n_preds") shouldBe 16L
      val mean = r.getAs[Double]("mean_rel_err")
      val mx = r.getAs[Double]("max_rel_err")
      mean should be >= 0.0
      mx should be >= mean - 1e-9 // mean of nonneg values never beats max
    }
  }

  test("q351 removal never helps and shares form a distribution") {
    val rows = queries.EvalQueries.q351_markov_attribution(spark, dir)
      .collect()
    rows.length should be > 0
    rows.foreach { r =>
      r.getAs[Long]("p_removed_micro") should be <=
        r.getAs[Long]("p_base_micro") // removing a channel can't add paths
      val e = r.getAs[Double]("removal_effect")
      e should (be >= 0.0 and be <= 1.0)
    }
    val shareSum = rows.map(_.getAs[Double]("attribution_share")).sum
    shareSum shouldBe 1.0 +- 1e-4
  }

  test("q352 bigger caches never hurt and LRU>=FIFO is reported as-is") {
    val rows = queries.EvalQueries.q352_cache_replay(spark, dir).collect()
      .map(r => (r.getAs[String]("policy"), r.getAs[Long]("cache_size")) -> r)
      .toMap
    rows.size shouldBe 4
    Seq("lru", "fifo").foreach { p =>
      rows((p, 16L)).getAs[Long]("hits") should be >=
        rows((p, 4L)).getAs[Long]("hits") // inclusion property at work
    }
    rows.values.foreach { r =>
      r.getAs[Long]("hits") should be <= r.getAs[Long]("n_accesses")
    }
  }

  test("q353 state grows with the bound and peak bounds the average") {
    val rows = queries.EvalQueries.q353_join_state_advisor(spark, dir)
      .collect().sortBy(_.getAs[Long]("bound_s"))
    rows.length shouldBe 3
    rows.sliding(2).foreach { case Array(a, b) =>
      b.getAs[Long]("peak_state") should be >= a.getAs[Long]("peak_state")
      b.getAs[Double]("avg_state") should be >= a.getAs[Double]("avg_state")
    }
    rows.foreach { r =>
      r.getAs[Double]("avg_state") should be <=
        r.getAs[Long]("peak_state").toDouble
      r.getAs[Long]("peak_state") should be >= 1L // an event is its own state
    }
  }

  test("q354 roaring never loses to either pure encoding") {
    val rows = queries.EvalQueries.q354_roaring_advisor(spark, dir).collect()
    rows.length should be > 0
    rows.foreach { r =>
      val ro = r.getAs[Long]("bytes_roaring")
      ro should be <= r.getAs[Long]("bytes_array_only")
      ro should be <= r.getAs[Long]("bytes_bitmap_only")
      r.getAs[Double]("compression") should be >= 1.0 // vs 4-byte raw
      r.getAs[Long]("n_run_containers") +
        r.getAs[Long]("n_array_containers") should be <=
        r.getAs[Long]("n_chunks")
    }
  }

  test("q355 epsilon stats are coherent and segments cover all keys") {
    val r = queries.EvalQueries.q355_learned_index_audit(spark, dir)
      .collect().head
    r.getAs[Long]("n_segments") shouldBe
      (r.getAs[Long]("n_keys") + 255L) / 256L
    r.getAs[Double]("mean_seg_eps") should be <= r.getAs[Double]("max_eps")
    // endpoints are exact by construction, so eps < segment length
    r.getAs[Double]("max_eps") should be < 256.0
  }

  test("q356 offset voting recovers a planted shifted clip exactly") {
    import org.apache.spark.sql.functions.{col, lit, md5, expr, count => fcount, row_number => frownum}
    import org.apache.spark.sql.expressions.{Window => W}
    import spark.implicits._
    // media 1 = 40 distinct frames; media 2 = the same content shifted
    // by exactly 3 frames (48 bytes cut from the front)
    val content = (0 until 40).map(i => f"FRAME_${i}%04d_PAYLOAD").mkString
    val planted = Seq((1L, content), (2L, content.substring(48)))
      .toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("s"))
      .withColumn("n_chars", expr("length(text)"))
    val media = graft.multimodal.Multimodal.packBinary(
      planted, "doc_id", "text", "video", "source")
    val fr = graft.multimodal.Multimodal
      .sampleFrames(media, "payload", frameBytes = 16, stride = 1)
      .select(col("media_id"), col("frame_idx").cast("long").as("idx"),
        md5(col("frame")).as("fh")).distinct()
    val votes = fr.select(col("media_id").as("a"), col("idx").as("ia"),
        col("fh"))
      .join(fr.select(col("media_id").as("b"), col("idx").as("ib"),
        col("fh")), "fh")
      .filter(col("a") < col("b"))
      .groupBy(col("a"), col("b"), (col("ia") - col("ib")).as("offset"))
      .agg(fcount(lit(1)).as("v"))
    val top = votes.withColumn("rn", frownum().over(
        W.partitionBy(col("a"), col("b"))
          .orderBy(col("v").desc, col("offset").asc)))
      .filter(col("rn") === 1).collect().head
    top.getAs[Long]("offset") shouldBe 3L // 48 bytes = exactly 3 frames
    // and the shipped query's own output is coherent on real data
    val rows = queries.EvalQueries.q356_clip_alignment(spark, dir).collect()
    rows.foreach { r =>
      r.getAs[Long]("votes") should be <= r.getAs[Long]("total_votes")
      val sh = r.getAs[Double]("align_share")
      sh should (be > 0.0 and be <= 1.0)
    }
  }

  test("q357 packing accountancy balances and FFD beats naive one-per-doc") {
    val rows = queries.EvalQueries.q357_packing_tradeoff(spark, dir)
      .collect()
    rows.length should be > 0
    rows.foreach { r =>
      val bins = r.getAs[Long]("ffd_bins")
      val total = r.getAs[Long]("total_tokens")
      // tokens + padding exactly fill the bins
      r.getAs[Long]("pad_tokens") shouldBe bins * 512L - total
      bins should be >= r.getAs[Long]("concat_windows") // concat is optimal-density
      r.getAs[Long]("docs_cut") should be <= r.getAs[Long]("n_docs")
      r.getAs[Long]("n_crossings") should be >= r.getAs[Long]("docs_cut")
    }
  }

  test("q358 splitting only helps and healthy keys are untouched") {
    val rows = queries.EvalQueries.q358_aqe_skew_sim(spark, dir).collect()
      .map(r => r.getAs[String]("scenario") -> r).toMap
    rows.size shouldBe 3
    rows.values.foreach { r =>
      r.getAs[Long]("max_after") should be <= r.getAs[Long]("max_before")
      r.getAs[Double]("balance_after") should be <=
        r.getAs[Double]("balance_before") + 1e-9
      if (r.getAs[Long]("n_skewed") == 0L)
        r.getAs[Long]("n_after") shouldBe r.getAs[Long]("n_nonempty")
    }
    val hot = rows("planted_hot")
    hot.getAs[Long]("n_skewed") should be >= 1L // the plant must trigger
    hot.getAs[Long]("max_after") should be <=
      hot.getAs[Long]("median_load") * 2L // chunks land near the median
  }

  test("q359 recommendation matches the cheaper measured intermediate") {
    val r = queries.EvalQueries.q359_join_order(spark, dir).collect().head
    val lo = r.getAs[Long]("inter_lo_first")
    val oc = r.getAs[Long]("inter_oc_first")
    r.getAs[String]("recommended") shouldBe
      (if (lo <= oc) "(lineitem_orders)_customer"
       else "lineitem_(orders_customer)")
    // both orders end at the same final result
    r.getAs[Long]("n_final") should be <= lo.max(oc)
  }

  test("q360 reduction ratios are fractions and skip flags match them") {
    val rows = queries.EvalQueries.q360_partial_agg_advisor(spark, dir)
      .collect()
    rows.length shouldBe 3
    rows.foreach { r =>
      val keys = r.getAs[Long]("shuffled_after_partial")
      val n = r.getAs[Long]("n_rows")
      keys should be <= n
      r.getAs[Boolean]("skip_partial") shouldBe (keys * 10L > n * 8L)
    }
  }

  test("q361 run census is coherent and detects a sorted sequence") {
    import org.apache.spark.sql.functions.{col => fc}
    val rows = queries.EvalQueries.q361_sortedness_audit(spark, dir)
      .collect()
    rows.length shouldBe 3
    rows.foreach { r =>
      r.getAs[Long]("n_runs") should be >= 1L
      r.getAs[Long]("n_runs") should be <= r.getAs[Long]("n")
      val f = r.getAs[Double]("sorted_frac")
      f should (be >= 0.0 and be <= 1.0)
      // ceil(log2(runs)) bounds: 2^(p-1) < runs <= 2^p
      val p = r.getAs[Long]("merge_passes")
      if (r.getAs[Long]("n_runs") > 1L) {
        (1L << p) should be >= r.getAs[Long]("n_runs")
        (1L << (p - 1)) should be < r.getAs[Long]("n_runs")
      }
    }
  }

  test("q313 matching terminates with disjoint endpoints per round") {
    val rows = queries.EvalQueries.q313_dominant_matching(spark, dir).collect()
    val ss = rows.map(_.getAs[Long]("s"))
    val cs = rows.map(_.getAs[Long]("c"))
    ss.distinct.length shouldBe ss.length // a supplier matches at most once
    cs.distinct.length shouldBe cs.length // a customer matches at most once
  }

  test("q363 NB scoring joins the weight table by broadcast, never sort-merge") {
    // the 256-row learned weight table and the 1-row prior must ride to the
    // token stream as broadcasts — a sort-merge here would shuffle the full
    // token relation against a table that fits in one packet
    val plan = planString(queries.PipelineQueries.q363_nb_filter(spark, dir))
    plan should include("BroadcastHashJoin")
    plan should not include "SortMergeJoin"
  }

  test("q374 incremental top-k plans the custom TopKPerKey exec, no window") {
    // the fold must run through the heap operator at every stage — a
    // regression to the window form would reintroduce the per-key sort
    val plan = planString(queries.PipelineQueries.q374_ivm_topk(spark, dir))
    plan should include("TopKPerKey")
    plan should not include "Window"
  }

  test("q368 ALS normal equations build as hash aggregates, no cartesian") {
    // each half-iteration must be equi-join + combinable aggregate; the
    // only nested-loop allowed is the 1-row counts broadcast at the edge
    val plan = planString(queries.EvalQueries.q368_als_factorization(spark, dir))
    plan should not include "CartesianProduct"
    plan should include("HashAggregate")
    plan.toLowerCase should not include "scalaudf"
  }

  test("q367 BPE encode broadcasts the rule table and folds without UDFs") {
    // the 8-rule merge table must broadcast to the dictionary pair rows,
    // and the greedy consumption fold must stay declarative (codegen'd
    // higher-order aggregate) — no ScalaUDF, no cartesian anywhere
    val plan = planString(queries.PipelineQueries.q367_bpe_encode(spark, dir))
    plan should include("BroadcastHashJoin")
    plan should not include "CartesianProduct"
    plan.toLowerCase should not include "scalaudf"
    plan.toLowerCase should include("aggregate(coalesce(cand")
  }

  test("q362 API ingest parses pages with codegen from_json, no driver loop") {
    val plan = planString(queries.PipelineQueries.q362_api_ingest(spark, dir))
    // fetch fans out as a partitioned compute (MapPartitions over the page
    // range), parse stays declarative (from_json in the plan, codegen'd)
    plan should include("MapPartitions")
    plan.toLowerCase should include("from_json")
    plan should not include "CartesianProduct"
  }

  test("q388 unigram-LM trains on dictionary grain: Viterbi as a declarative" +
      " fold, vocab attached by equi-join, no corpus window") {
    // the E-step must stay a codegen'd higher-order aggregate (no ScalaUDF),
    // the vocab must reach the DP edges through a hash equi-join on the
    // piece string (never a broadcast map literal or a cartesian), and no
    // window may own corpus rows
    val plan = planString(queries.PipelineQueries.q388_unigram_em(spark, dir))
    plan should not include "CartesianProduct"
    plan should not include "Window"
    plan.toLowerCase should not include "scalaudf"
    plan.toLowerCase should include("aggregate(sequence(1, length(w")
    plan should include("TakeOrderedAndProject") // vocab budget + top-30
  }

  test("q389 fertility applies the split-trained vocab: anti-joined unk" +
      " chars, declarative DP, no corpus window") {
    val df = queries.PipelineQueries.q389_unigram_fertility(spark, dir)
    val plan = planString(df)
    plan should not include "CartesianProduct"
    plan should not include "Window"
    plan.toLowerCase should not include "scalaudf"
    plan.toLowerCase should include("aggregate(sequence(1, length(w")
    // the unk-char anti-join sits in the pre-adaptive plan; at runtime
    // this corpus has no unseen held-out chars, so AQE's empty-relation
    // propagation (correctly) erases the whole branch from the final plan
    df.queryExecution.sparkPlan.toString should include("LeftAnti")
  }

  test("q390 ORC read-back pushes the predicate into the ORC scan and" +
      " prunes partitions from the directory layout") {
    val plan = planString(
      queries.PipelineQueries.q390_orc_roundtrip(spark, dir))
    plan should include("orc") // FileScan orc, vectorized reader
    // the quantity filter must reach the format reader, not run post-scan
    plan should include("PushedFilters: [IsNotNull(l_quantity), " +
      "GreaterThanOrEqual(l_quantity,25.0)]")
    // l_returnflag came back as a partition directory column
    plan should include("PartitionFilters")
  }

  test("q391 CART split search collapses to the value-domain grain:" +
      " keyed windows, broadcast node assignment, no cartesian") {
    val df = queries.EvalQueries.q391_cart_tree(spark, dir)
    val plan = planString(df)
    plan should not include "CartesianProduct"
    plan.toLowerCase should not include "scalaudf"
    plan should include("BroadcastHashJoin") // split row → row assignment
    // (WindowSweepSpec machine-gates that the windows stay keyed)
    // semantic pin: the tree is a real CART — 3 splits, 4 leaves, and
    // every split's gini must improve on its parent node's
    val rows = df.collect()
    rows.count(_.getAs[String]("kind") == "split") shouldBe 3
    rows.count(_.getAs[String]("kind") == "leaf") shouldBe 4
    val splits = rows.filter(_.getAs[String]("kind") == "split")
    splits.foreach { s =>
      val n = s.getAs[Long]("n"); val p = s.getAs[Long]("pos")
      val parentGini =
        (n * n - p * p - (n - p) * (n - p)).toDouble / n.toDouble
      s.getAs[Double]("gini") should be <= parentGini
    }
  }

  test("q392 randomized response bounds the bit fan-out by a plan-proven" +
      " language limit") {
    val df = queries.GovernanceQueries.q392_randomized_response(spark, dir)
    val plan = planString(df)
    plan.toLowerCase should not include "scalaudf"
    plan should include("HashAggregate")
    // the language side must be a bounded broadcast (JoinSweepSpec proves
    // the GlobalLimit bound); the debias must hold exactly: 4·obs − n is
    // always an even-or-odd integer whose half is the estimate
    val rows = df.collect()
    rows.length should be >= 2
    rows.foreach { r =>
      val est = r.getAs[Double]("est_count")
      (est * 2).isWhole shouldBe true
      r.getAs[Double]("abs_err") should be >= 0.0
    }
  }

  test("q388 unigram-LM segmentations minimize the exact DECIMAL DP cost") {
    // semantic pin (the oracle proves engine parity; this proves the DP is
    // a real Viterbi): every winning segmentation's summed piece cost must
    // be <= the single-char fallback for that word, and every piece must
    // be in the trained vocab
    val out = queries.PipelineQueries.q388_unigram_em(spark, dir).collect()
    out.length shouldBe 30
    val masses = out.map(_.getAs[Long]("em_mass"))
    masses shouldBe masses.sorted(Ordering[Long].reverse)
    // EM mass can never exceed seed mass for multi-char pieces' words, but
    // must stay positive and the vocab must contain real multi-char pieces
    out.foreach(r => r.getAs[Long]("em_mass") should be > 0L)
    out.map(_.getAs[String]("piece")).count(_.length >= 2) should be >= 3
  }
}
