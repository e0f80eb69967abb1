package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Registry of every named query the engine exposes through SparkEntry.
  * Keys match Oracles.sql where a DuckDB-expressible oracle exists.
  */
object Queries {
  type Q = (SparkSession, String) => DataFrame

  val all: Map[String, Q] = Map(
    "q01_agg_summary"   -> (RefQueries.q01_agg_summary _),
    "q02_cast_project"  -> (TransformQueries.q02_cast_project _),
    "q03_json_extract"  -> (TransformQueries.q03_json_extract _),
    "q04_range_check"   -> (DqQueries.q04_range_check _),
    "q05_notnull_check" -> (DqQueries.q05_notnull_check _),
    "q06_regex_check"   -> (DqQueries.q06_regex_check _),
    "q07_unique_key"    -> (DqQueries.q07_unique_key _),
    "q08_dq_summary"    -> (DqQueries.q08_dq_summary _),
    "q09_dedup_latest"  -> (TransformQueries.q09_dedup_latest _),
    "q10_scd2"          -> (TransformQueries.q10_scd2 _),
    "q11_gold_rollup"   -> (JoinQueries.q11_gold_rollup _),
    "q12_ri_orphans"    -> (JoinQueries.q12_ri_orphans _),
    "q13_enrich_join"   -> (JoinQueries.q13_enrich_join _),
    "q14_semi_anti"     -> (JoinQueries.q14_semi_anti _),
    "q15_topk"          -> (JoinQueries.q15_topk _),
    "q16_set_ops"       -> (JoinQueries.q16_set_ops _),
    "q17_window_running" -> (JoinQueries.q17_window_running _),
    "q18_time_windows"  -> (TransformQueries.q18_time_windows _),
    "q19_sessionize"    -> (TransformQueries.q19_sessionize _),
    "q20_cdc_apply"     -> (TransformQueries.q20_cdc_apply _),
    "q21_table_metrics" -> (DqQueries.q21_table_metrics _),
    "q22_quarantine"    -> (DqQueries.q22_quarantine _),
    "q23_dedup_exact"   -> (PipelineQueries.q23_dedup_exact _),
    "q24_text_stats"    -> (PipelineQueries.q24_text_stats _),
    "q25_lang_id"       -> (PipelineQueries.q25_lang_id _),
    "q26_token_count"   -> (PipelineQueries.q26_token_count _),
    "q27_minhash_dedup" -> (PipelineQueries.q27_minhash_dedup _),
    "q28_simhash"       -> (PipelineQueries.q28_simhash _),
    "q29_ngram_jaccard" -> (PipelineQueries.q29_ngram_jaccard _),
    "q30_ann_cosine"    -> (PipelineQueries.q30_ann_cosine _),
    "q31_ann_lsh"       -> (PipelineQueries.q31_ann_lsh _),
    "q32_embed_topk_pairs" -> (PipelineQueries.q32_embed_topk_pairs _),
    "q33_multimodal"    -> (PipelineQueries.q33_multimodal _),
    "q34_gold_cube"     -> (TransformQueries.q34_gold_cube _),
    "q35_merge_upsert"  -> (TransformQueries.q35_merge_upsert _),
    "q36_salted_agg"    -> (TransformQueries.q36_salted_agg _),
    "q37_fingerprint"   -> (PipelineQueries.q37_fingerprint _),
    "q38_ann_ivf"       -> (PipelineQueries.q38_ann_ivf _),
    "q39_scalar_funcs"  -> (TransformQueries.q39_scalar_funcs _),
    "q40_window_rank"   -> (TransformQueries.q40_window_rank _),
    "q41_array_agg"     -> (TransformQueries.q41_array_agg _),
    "q42_pivot"         -> (TransformQueries.q42_pivot _),
    "q43_heavy_hitters" -> (TransformQueries.q43_heavy_hitters _),
    "q44_normalized_dedup" -> (PipelineQueries.q44_normalized_dedup _),
    "q45_asof_join"     -> (TransformQueries.q45_asof_join _),
    "q46_range_join"    -> (TransformQueries.q46_range_join _),
    "q47_grouping_sets" -> (TransformQueries.q47_grouping_sets _),
    "q48_schema_evolution" -> (TransformQueries.q48_schema_evolution _),
    "q49_ivf_recall"    -> (PipelineQueries.q49_ivf_recall _),
    "q50_pii_redact"    -> (PipelineQueries.q50_pii_redact _),
    "q51_repetition"    -> (PipelineQueries.q51_repetition _),
    "q52_embed_centroids" -> (PipelineQueries.q52_embed_centroids _),
    "q53_vocab_profile" -> (PipelineQueries.q53_vocab_profile _),
    "q54_dup_clusters"  -> (PipelineQueries.q54_dup_clusters _),
    "q55_quantiles"     -> (PipelineQueries.q55_quantiles _),
    "q56_split_sample"  -> (PipelineQueries.q56_split_sample _),
  )
}
