package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.ops.{AsofJoin, Dedup, Multimodal, Similarity, TextOps}
import graft.queries.{ModelQueries, Oracles, Relational}

/** Driver contract — see /root/repo/SURVEY.md §2 for the inventory. */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Relational.q18_star_revenue(spark, "/root/testdata/sf0.001")

  /** One entry per implemented capability from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "a1_model_dag" -> (ModelQueries.a1_model_dag _),
    "a2_model_types" -> (ModelQueries.a2_model_types _),
    "a3_model_assert" -> (ModelQueries.a3_model_assert _),
    "a5_incremental" -> (ModelQueries.a5_incremental _),
    "q1_agg" -> (Relational.q1_agg _),
    "q2_filter_project" -> (Relational.q2_filter_project _),
    "q3_join_broadcast" -> (Relational.q3_join_broadcast _),
    "q4_join_shuffle" -> (Relational.q4_join_shuffle _),
    "q5_outer_join" -> (Relational.q5_outer_join _),
    "q6_semi_anti" -> (Relational.q6_semi_anti _),
    "q7_topk" -> (Relational.q7_topk _),
    "q8_window_rank" -> (Relational.q8_window_rank _),
    "q9_window_running" -> (Relational.q9_window_running _),
    "q10_setops" -> (Relational.q10_setops _),
    "q11_cte_subquery" -> (Relational.q11_cte_subquery _),
    "q12_case_string" -> (Relational.q12_case_string _),
    "q13_date" -> (Relational.q13_date _),
    "q14_pivot" -> (Relational.q14_pivot _),
    "q15_rollup" -> (Relational.q15_rollup _),
    "q16_having" -> (Relational.q16_having _),
    "q17_countd" -> (Relational.q17_countd _),
    "q17b_approx_countd" -> (Relational.q17b_approx_countd _),
    "q18_star_revenue" -> (Relational.q18_star_revenue _),
    "q19_json_extract" -> (Relational.q19_json_extract _),
    "q20_sessionize" -> (Relational.q20_sessionize _),
    "q21_stream_window" -> (Relational.q21_stream_window _),
    "q22_stats" -> (Relational.q22_stats _),
    "q23_asof_join" -> (AsofJoin.q23_asof_join _),
    "q24_session_window" -> (graft.ops.TimeOps.q24_session_window _),
    "q25_range_join" -> (graft.ops.TimeOps.q25_range_join _),
    "q26_entropy" -> (graft.functions.EntropyAggregator.q26_entropy _),
    "q27_profile" -> (graft.ops.Profile.q27_profile _),
    "q28_window_ranks" -> (Relational.q28_window_ranks _),
    "q29_scalar_funcs" -> (Relational.q29_scalar_funcs _),
    "q30_cube" -> (Relational.q30_cube _),
    "q31_agg_breadth" -> (Relational.q31_agg_breadth _),
    "q32_arrays" -> (Relational.q32_arrays _),
    "q33_regexp" -> (Relational.q33_regexp _),
    "q34_window_frames" -> (Relational.q34_window_frames _),
    "q35_salted_join" -> (Relational.q35_salted_join _),
    "q36_json_struct" -> (Relational.q36_json_struct _),
    "q37_unpivot" -> (Relational.q37_unpivot _),
    "q38_dates" -> (Relational.q38_dates _),
    "q39_histogram" -> (Relational.q39_histogram _),
    "q40_funnel" -> (Relational.q40_funnel _),
    "q41_sql_text" -> (Relational.q41_sql_text _),
    "q42_native_topk" -> (Relational.q42_native_topk _),
    "q43_retention" -> (Relational.q43_retention _),
    "d1_dedup_exact" -> (Dedup.d1_dedup_exact _),
    "d2_dedup_minhash" -> (Dedup.d2_dedup_minhash _),
    "d3_dedup_simhash" -> (Dedup.d3_dedup_simhash _),
    "d4_ngram_jaccard" -> (Dedup.d4_ngram_jaccard _),
    "d5_embed_dup" -> (Dedup.d5_embed_dup _),
    "d6_dedup_clusters" -> (Dedup.d6_dedup_clusters _),
    "s1_ann_topk" -> (Similarity.s1_ann_topk _),
    "s2_ann_lsh" -> (Similarity.s2_ann_lsh _),
    "s3_ann_ivf" -> (Similarity.s3_ann_ivf _),
    "s4_knn_label" -> (Similarity.s4_knn_label _),
    "t1_lang_id" -> (TextOps.t1_lang_id _),
    "t2_quality" -> (TextOps.t2_quality _),
    "t3_token_count" -> (TextOps.t3_token_count _),
    "t5_normalize" -> (TextOps.t5_normalize _),
    "t6_split" -> (TextOps.t6_split _),
    "t7_pii_hash" -> (TextOps.t7_pii_hash _),
    "t8_vocab" -> (TextOps.t8_vocab _),
    "t4_fingerprint" -> (TextOps.t4_fingerprint _),
    "t9_decontaminate" -> (graft.ops.PipelineOps.t9_decontaminate _),
    "t10_pack_sequences" -> (graft.ops.PipelineOps.t10_pack_sequences _),
    "t11_repetition" -> (graft.ops.PipelineOps.t11_repetition _),
    "t12_tfidf" -> (graft.ops.PipelineOps.t12_tfidf _),
    "m1_multimodal" -> (Multimodal.m1_multimodal _),
    "m2_media_stats" -> (Multimodal.m2_media_stats _)
  )

  /** DuckDB oracle SQL per oracle-checked query (SURVEY §4 discipline). */
  def oracleSql: Map[String, String] = Oracles.relational ++ Map(
    "a1_model_dag" -> ModelQueries.a1_oracle,
    "a2_model_types" -> ModelQueries.a2_oracle,
    "a3_model_assert" -> ModelQueries.a3_oracle,
    "a5_incremental" -> ModelQueries.a5_oracle,
    "d1_dedup_exact" -> Dedup.d1_oracle,
    "d4_ngram_jaccard" -> Dedup.d4_oracle,
    "d6_dedup_clusters" -> Dedup.d6_oracle,
    "s1_ann_topk" -> Similarity.s1_oracle,
    "s4_knn_label" -> Similarity.s4_oracle,
    "t1_lang_id" -> TextOps.t1_oracle,
    "t9_decontaminate" -> graft.ops.PipelineOps.t9_oracle,
    "t10_pack_sequences" -> graft.ops.PipelineOps.t10_oracle,
    "t11_repetition" -> graft.ops.PipelineOps.t11_oracle,
    "t12_tfidf" -> graft.ops.PipelineOps.t12_oracle,
    "m2_media_stats" -> Multimodal.m2_oracle,
    "q23_asof_join" -> AsofJoin.q23_oracle,
    "q24_session_window" -> graft.ops.TimeOps.q24_oracle,
    "q25_range_join" -> graft.ops.TimeOps.q25_oracle,
    "q26_entropy" -> graft.functions.EntropyAggregator.q26_oracle,
    "q27_profile" -> graft.ops.Profile.q27_oracle,
    "t2_quality" -> TextOps.t2_oracle,
    "t3_token_count" -> TextOps.t3_oracle,
    "t5_normalize" -> TextOps.t5_oracle,
    "t6_split" -> TextOps.t6_oracle,
    "t7_pii_hash" -> TextOps.t7_oracle,
    "t8_vocab" -> TextOps.t8_oracle
  )
}
