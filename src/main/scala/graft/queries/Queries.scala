package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** The full declared-query catalog (SURVEY.md §2.D + extensions): the t2
  * correctness contract. Every entry with an oracle must hash-match
  * DuckDB on sf0.01; entries without one (approximate-by-construction
  * operators) get the driver's rows-only check and are exact-verified in
  * the ScalaTest suite instead.
  */
object Queries {
  type Q = (SparkSession, String) => DataFrame

  val all: Map[String, Q] = Map(
    "q01_wordcount"         -> (QueriesText.q01_wordcount _),
    "q02_top_words"         -> (QueriesText.q02_top_words _),
    "q03_doc_tokens"        -> (QueriesText.q03_doc_tokens _),
    "q04_distinct_words"    -> (QueriesText.q04_distinct_words _),
    "q05_cross_source_words" -> (QueriesText.q05_cross_source_words _),
    "q06_token_length_hist" -> (QueriesText.q06_token_length_hist _),
    "q07_pricing_summary"   -> (QueriesRelational.q07_pricing_summary _),
    "q08_nation_revenue"    -> (QueriesRelational.q08_nation_revenue _),
    "q09_top_customers"     -> (QueriesRelational.q09_top_customers _),
    "q10_orders_by_priority" -> (QueriesRelational.q10_orders_by_priority _),
    "q11_part_rank"         -> (QueriesRelational.q11_part_rank _),
    "q12_running_total"     -> (QueriesRelational.q12_running_total _),
    "q13_setops"            -> (QueriesRelational.q13_setops _),
    "q14_hourly_events"     -> (QueriesRelational.q14_hourly_events _),
    "q15_dedup_stats"       -> (QueriesDedup.q15_dedup_stats _),
    "q16_minhash_neardup"   -> (QueriesDedup.q16_minhash_neardup _),
    "q17_cosine_knn"        -> (QueriesSim.q17_cosine_knn _),
    "q18_lang_stats"        -> (QueriesText.q18_lang_stats _),
    "q19_ngram_jaccard"     -> (QueriesDedup.q19_ngram_jaccard _),
    "q20_embedding_neardup" -> (QueriesSim.q20_embedding_neardup _),
    "q21_simhash"           -> (QueriesDedup.q21_simhash _),
    "q22_lang_id"           -> (QueriesText.q22_lang_id _),
    "q23_quality_score"     -> (QueriesText.q23_quality_score _),
    "q24_token_count"       -> (QueriesText.q24_token_count _),
    "q25_fingerprint"       -> (QueriesDedup.q25_fingerprint _),
    "q26_knn_join"          -> (QueriesSim.q26_knn_join _),
    "q27_ann_lsh"           -> (QueriesSim.q27_ann_lsh _),
    "q28_binary_meta"       -> (QueriesBinary.q28_binary_meta _),
    "q29_user_sessions"     -> (QueriesRelational.q29_user_sessions _),
    "q30_event_props_json"  -> (QueriesRelational.q30_event_props_json _),
    "q31_semi_anti"         -> (QueriesRelational.q31_semi_anti _),
    "q32_rollup"            -> (QueriesRelational.q32_rollup _),
    "q33_bigram_counts"     -> (QueriesText.q33_bigram_counts _),
    "q34_ann_ivf"           -> (QueriesSim.q34_ann_ivf _),
    "q35_event_quantiles"   -> (QueriesRelational.q35_event_quantiles _),
    "q36_scalar_functions"  -> (QueriesRelational.q36_scalar_functions _),
    "q37_above_avg_orders"  -> (QueriesRelational.q37_above_avg_orders _),
    "q38_asof_attribution"  -> (QueriesRelational.q38_asof_attribution _),
    "q39_event_followups"   -> (QueriesRelational.q39_event_followups _),
    "q40_srp_neardup"       -> (QueriesSim.q40_srp_neardup _),
    "q41_ann_ivf_trained"   -> (QueriesSim.q41_ann_ivf_trained _),
    "q42_asof_forward"      -> (QueriesRelational.q42_asof_forward _),
    "q43_hash_split"        -> (QueriesPipeline.q43_hash_split _),
    "q44_clean_corpus"      -> (QueriesPipeline.q44_clean_corpus _),
    "q45_kmv_distinct"      -> (QueriesPipeline.q45_kmv_distinct _),
    "q46_dup_clusters"      -> (QueriesDedup.q46_dup_clusters _),
    "q47_stratified_sample" -> (QueriesPipeline.q47_stratified_sample _),
    "q48_pivot_events"      -> (QueriesRelational.q48_pivot_events _),
    "q49_cube_orders"       -> (QueriesRelational.q49_cube_orders _),
  )

  /** DuckDB oracle SQL per query — every catalog query, including the
    * ANN/LSH entries q27/q34/q40/q41: all deterministic (fixed-seed
    * planes, fixed init centroids, ordered-replay Lloyd training), so
    * their oracles recompute the same buckets, bands and cells in SQL.
    */
  val oracles: Map[String, String] = Map(
    "q01_wordcount"         -> QueriesText.q01Sql,
    "q02_top_words"         -> QueriesText.q02Sql,
    "q03_doc_tokens"        -> QueriesText.q03Sql,
    "q04_distinct_words"    -> QueriesText.q04Sql,
    "q05_cross_source_words" -> QueriesText.q05Sql,
    "q06_token_length_hist" -> QueriesText.q06Sql,
    "q07_pricing_summary"   -> QueriesRelational.q07Sql,
    "q08_nation_revenue"    -> QueriesRelational.q08Sql,
    "q09_top_customers"     -> QueriesRelational.q09Sql,
    "q10_orders_by_priority" -> QueriesRelational.q10Sql,
    "q11_part_rank"         -> QueriesRelational.q11Sql,
    "q12_running_total"     -> QueriesRelational.q12Sql,
    "q13_setops"            -> QueriesRelational.q13Sql,
    "q14_hourly_events"     -> QueriesRelational.q14Sql,
    "q15_dedup_stats"       -> QueriesDedup.q15Sql,
    "q16_minhash_neardup"   -> QueriesDedup.q16Sql,
    "q17_cosine_knn"        -> QueriesSim.q17Sql,
    "q18_lang_stats"        -> QueriesText.q18Sql,
    "q19_ngram_jaccard"     -> QueriesDedup.q19Sql,
    "q20_embedding_neardup" -> QueriesSim.q20Sql,
    "q21_simhash"           -> QueriesDedup.q21Sql,
    "q22_lang_id"           -> QueriesText.q22Sql,
    "q23_quality_score"     -> QueriesText.q23Sql,
    "q24_token_count"       -> QueriesText.q24Sql,
    "q25_fingerprint"       -> QueriesDedup.q25Sql,
    "q26_knn_join"          -> QueriesSim.q26Sql,
    "q27_ann_lsh"           -> QueriesSim.q27Sql,
    "q28_binary_meta"       -> QueriesBinary.q28Sql,
    "q29_user_sessions"     -> QueriesRelational.q29Sql,
    "q30_event_props_json"  -> QueriesRelational.q30Sql,
    "q31_semi_anti"         -> QueriesRelational.q31Sql,
    "q32_rollup"            -> QueriesRelational.q32Sql,
    "q33_bigram_counts"     -> QueriesText.q33Sql,
    "q34_ann_ivf"           -> QueriesSim.q34Sql,
    "q35_event_quantiles"   -> QueriesRelational.q35Sql,
    "q36_scalar_functions"  -> QueriesRelational.q36Sql,
    "q37_above_avg_orders"  -> QueriesRelational.q37Sql,
    "q38_asof_attribution"  -> QueriesRelational.q38Sql,
    "q39_event_followups"   -> QueriesRelational.q39Sql,
    "q40_srp_neardup"       -> QueriesSim.q40Sql,
    "q41_ann_ivf_trained"   -> QueriesSim.q41Sql,
    "q42_asof_forward"      -> QueriesRelational.q42Sql,
    "q43_hash_split"        -> QueriesPipeline.q43Sql,
    "q44_clean_corpus"      -> QueriesPipeline.q44Sql,
    "q45_kmv_distinct"      -> QueriesPipeline.q45Sql,
    "q46_dup_clusters"      -> QueriesDedup.q46Sql,
    "q47_stratified_sample" -> QueriesPipeline.q47Sql,
    "q48_pivot_events"      -> QueriesRelational.q48Sql,
    "q49_cube_orders"       -> QueriesRelational.q49Sql,
  )
}
