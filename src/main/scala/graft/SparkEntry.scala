package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.operators._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every entry in [[queries]] is a self-contained `(session, sfDir) =>
  * DataFrame` plan; entries with a DuckDB-expressible twin appear in
  * [[oracleSql]] (column names and types aligned — the driver sorts columns
  * by name and hash-compares values). Entries without a twin (engine-specific
  * hashing: MinHash/SimHash/LSH) get the driver's rows-only check.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The 4-way star join exercises scan→broadcast-join→agg→sort. */
  def entry(spark: SparkSession): DataFrame =
    Relational.q04StarJoin(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q01_pricing_summary" -> (Relational.q01PricingSummary _),
    "q02_selective_filter" -> (Relational.q02SelectiveFilter _),
    "q03_join_agg" -> (Relational.q03JoinAgg _),
    "q04_star_join" -> (Relational.q04StarJoin _),
    "q05_anti_join" -> (Relational.q05AntiJoin _),
    "q06_semi_join" -> (Relational.q06SemiJoin _),
    "q07_band_having" -> (Relational.q07BandHaving _),
    "q08_window_topk_per_group" -> (Relational.q08WindowTopkPerGroup _),
    "q09_running_sum" -> (Relational.q09RunningSum _),
    "q10_hw_contiguous" -> (HighWaterMark.q10HwContiguous _),
    "q11_topk" -> (Relational.q11TopK _),
    "q12_set_ops" -> (Relational.q12SetOps _),
    "q13_outer_join" -> (RelationalExt.q13OuterJoin _),
    "q14_distinct_agg" -> (Relational.q14DistinctAgg _),
    "q15_rollup" -> (Relational.q15Rollup _),
    "q16_json_extract" -> (Relational.q16JsonExtract _),
    "q17_date_buckets" -> (Relational.q17DateBuckets _),
    "q18_range_join" -> (Relational.q18RangeJoin _),
    "q19_exact_dedup" -> (Dedup.q19ExactDedup _),
    "q20_minhash_neardup" -> (Dedup.q20MinhashNeardup _),
    "q21_cosine_topk" -> (Similarity.q21CosineTopk _),
    "q22_token_tf" -> (TextAnalysis.q22TokenTf _),
    "q23_scalar_funcs" -> (Catalog.q23ScalarFuncs _),
    "q24_queue_transitions" -> (Catalog.q24QueueTransitions _),
    "q25_time_windows" -> (Catalog.q25TimeWindows _),
    "q26_simhash" -> (Dedup.q26Simhash _),
    "q27_ngram_jaccard" -> (Dedup.q27NgramJaccard _),
    "q28_lsh_ann" -> (Similarity.q28LshAnn _),
    "q29_text_metrics" -> (TextAnalysis.q29TextMetrics _),
    "q30_binary_meta" -> (Catalog.q30BinaryMeta _),
    "q31_subquery_agg" -> (RelationalExt.q31SubqueryAgg _),
    "q32_window_zoo" -> (RelationalExt.q32WindowZoo _),
    "q33_work_queue_claim" -> (Relational.q33WorkQueueClaim _),
    "q34_release_band" -> (Relational.q34ReleaseBand _),
    "q35_hw_per_key" -> (HighWaterMark.q35HwPerKey _),
    "q36_var_stats" -> (RelationalExt.q36VarStats _),
    "q37_pivot" -> (RelationalExt.q37Pivot _),
    "q38_salted_agg" -> (Skew.q38SaltedAgg _),
    "q39_binned_range_join" -> (RangeJoin.q39BinnedRangeJoin _),
    "q40_ivf_ann" -> (Ivf.q40IvfAnn _),
    "q41_sessionize" -> (Sessions.q41Sessionize _),
    "q42_median" -> (Sessions.q42Median _),
    "q43_multiset_ops" -> (SetsExt.q43MultisetOps _),
    "q44_cube" -> (SetsExt.q44Cube _),
    "q45_array_agg" -> (SetsExt.q45ArrayAgg _),
    "q46_cosine_neardup" -> (Similarity.q46CosineNeardup _),
    "q47_multimodal_meta" -> (Multimodal.q47MultimodalMeta _),
    "q48_feature_ann" -> (Multimodal.q48FeatureAnn _),
    "q49_stratified_sample" -> (Sampling.q49StratifiedSample _),
    "q50_hash_split" -> (Sampling.q50HashSplit _),
    "q51_asof_join" -> (AsOf.q51AsofJoin _),
    "q52_percentiles" -> (Sessions.q52Percentiles _),
    "q53_simhash_neardup" -> (Dedup.q53SimhashNeardup _),
    "q54_dedup_clusters" -> (Dedup.q54DedupClusters _),
    "q55_tfidf" -> (TextAnalysis.q55Tfidf _),
    "q56_curation" -> (Curation.q56Curation _),
    "q57_decontaminate" -> (Decontamination.q57Decontaminate _),
    "q58_sequence_packing" -> (Packing.q58SequencePacking _),
    "q59_repetition_ratio" -> (TextAnalysis.q59RepetitionRatio _),
    "q60_quota_sample" -> (Sampling.q60QuotaSample _),
  )

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = Map(
    "q01_pricing_summary" -> Relational.q01Sql,
    "q02_selective_filter" -> Relational.q02Sql,
    "q03_join_agg" -> Relational.q03Sql,
    "q04_star_join" -> Relational.q04Sql,
    "q05_anti_join" -> Relational.q05Sql,
    "q06_semi_join" -> Relational.q06Sql,
    "q07_band_having" -> Relational.q07Sql,
    "q08_window_topk_per_group" -> Relational.q08Sql,
    "q09_running_sum" -> Relational.q09Sql,
    "q10_hw_contiguous" -> HighWaterMark.q10Sql,
    "q11_topk" -> Relational.q11Sql,
    "q12_set_ops" -> Relational.q12Sql,
    "q13_outer_join" -> RelationalExt.q13Sql,
    "q14_distinct_agg" -> Relational.q14Sql,
    "q15_rollup" -> Relational.q15Sql,
    "q16_json_extract" -> Relational.q16Sql,
    "q17_date_buckets" -> Relational.q17Sql,
    "q18_range_join" -> Relational.q18Sql,
    "q19_exact_dedup" -> Dedup.q19Sql,
    "q20_minhash_neardup" -> Dedup.q20Sql,
    "q21_cosine_topk" -> Similarity.q21Sql,
    "q22_token_tf" -> TextAnalysis.q22Sql,
    "q23_scalar_funcs" -> Catalog.q23Sql,
    "q24_queue_transitions" -> Catalog.q24Sql,
    "q25_time_windows" -> Catalog.q25Sql,
    "q26_simhash" -> Dedup.q26Sql,
    "q27_ngram_jaccard" -> Dedup.q27Sql,
    "q28_lsh_ann" -> Similarity.q28Sql,
    "q29_text_metrics" -> TextAnalysis.q29Sql,
    "q30_binary_meta" -> Catalog.q30Sql,
    "q31_subquery_agg" -> RelationalExt.q31Sql,
    "q32_window_zoo" -> RelationalExt.q32Sql,
    "q33_work_queue_claim" -> Relational.q33Sql,
    "q34_release_band" -> Relational.q34Sql,
    "q35_hw_per_key" -> HighWaterMark.q35Sql,
    "q36_var_stats" -> RelationalExt.q36Sql,
    "q37_pivot" -> RelationalExt.q37Sql,
    "q38_salted_agg" -> Skew.q38Sql,
    "q39_binned_range_join" -> RangeJoin.q39Sql,
    "q40_ivf_ann" -> Ivf.q40Sql,
    "q41_sessionize" -> Sessions.q41Sql,
    "q42_median" -> Sessions.q42Sql,
    "q43_multiset_ops" -> SetsExt.q43Sql,
    "q44_cube" -> SetsExt.q44Sql,
    "q45_array_agg" -> SetsExt.q45Sql,
    "q46_cosine_neardup" -> Similarity.q46Sql,
    "q47_multimodal_meta" -> Multimodal.q47Sql,
    "q48_feature_ann" -> Multimodal.q48Sql,
    "q49_stratified_sample" -> Sampling.q49Sql,
    "q50_hash_split" -> Sampling.q50Sql,
    "q51_asof_join" -> AsOf.q51Sql,
    "q52_percentiles" -> Sessions.q52Sql,
    "q53_simhash_neardup" -> Dedup.q53Sql,
    "q54_dedup_clusters" -> Dedup.q54Sql,
    "q55_tfidf" -> TextAnalysis.q55Sql,
    "q56_curation" -> Curation.q56Sql,
    "q57_decontaminate" -> Decontamination.q57Sql,
    "q58_sequence_packing" -> Packing.q58Sql,
    "q59_repetition_ratio" -> TextAnalysis.q59Sql,
    "q60_quota_sample" -> Sampling.q60Sql,
  )
}
