package graft
import org.apache.spark.sql.{SparkSession, DataFrame}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Queries.dimAgg(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q01_dim_agg" -> (Queries.dimAgg _),
    "q02_dedup" -> (Queries.dedup _),
    "q03_nan_profile" -> (Queries.nanProfile _),
    "q04_value_counts" -> (Queries.valueCounts _),
    "q05_nan_pivot" -> (Queries.nanPivot _),
    "q06_windowed_ingest" -> (Queries.windowedIngest _),
    "q07_union_chunks" -> (Queries.unionChunks _),
    "q08_project_rename" -> (Queries.projectRename _),
    "q09_filters" -> (Queries.filters _),
    "q10_semi_join" -> (Queries.semiJoin _),
    "q11_join_inner" -> (Queries.joinInner _),
    "q12_join_left" -> (Queries.joinLeft _),
    "q13_sort_limit" -> (Queries.sortLimit _),
    "q14_distinct" -> (Queries.distinctValues _),
    "q15_date_parts" -> (Queries.dateParts _),
    "q16_timedelta" -> (Queries.timedelta _),
    "q17_parse_timestamp" -> (Queries.parseTimestamp _),
    "q18_concat_key" -> (Queries.concatKey _),
    "q19_cast_coerce" -> (Queries.castCoerce _),
    "q20_window_running" -> (Queries.windowRunning _),
    "q21_token_count" -> (Queries.tokenCount _),
    "q22_quality_score" -> (Queries.qualityScore _),
    "q23_lang_id" -> (Queries.langId _),
    "q24_fingerprint" -> (Queries.fingerprint _),
    "q25_dedup_exact" -> (Queries.dedupExact _),
    "q26_ngram_jaccard" -> (Queries.ngramJaccard _),
    "q27_minhash_lsh" -> (Queries.minhashLsh _),
    "q28_simhash" -> (Queries.simhash _),
    "q29_ann_brute_force" -> (Queries.annBruteForce _),
    "q31_ann_lsh" -> (Queries.annLsh _),
    "q32_multimodal_decode" -> (Queries.multimodalDecode _),
    "q33_stream_agg" -> (Queries.streamAgg _),
    "q34_group_signature" -> (Queries.groupSignature _),
    "q35_salted_agg" -> (Queries.saltedAgg _),
    "q36_ann_ivf" -> (Queries.annIvf _),
    "q38_dim_agg_approx" -> (Queries.dimAggApprox _),
    "q39_multimodal_frames" -> (Queries.multimodalFrames _),
    "q40_asof_join" -> (Queries.asofJoin _),
    "q42_ngram_jaccard_filtered" -> (Queries.ngramJaccardFiltered _),
    "q41_stream_windowed" -> (Queries.streamWindowed _),
    "q37_sessionize" -> (Queries.sessionize _),
    "q43_windowed_union" -> (Queries.windowedUnion _),
    "q44_paged_fetch" -> (Queries.pagedFetch _),
    "q45_csv_ingest" -> (Queries.csvIngest _),
    "q46_json_ingest" -> (Queries.jsonIngest _),
    "q47_salted_join" -> (Queries.saltedJoin _),
    "q48_dict_source" -> (Queries.dictSource _),
    "q49_snapshot_sink" -> (Queries.snapshotSink _),
    "q50_stream_dedup" -> (Queries.streamDedup _),
    "q51_embed_near_dup_lsh" -> (Queries.embedNearDupLsh _),
    "q52_stream_static_join" -> (Queries.streamStaticJoin _),
    "q53_rollup" -> (Queries.rollupAgg _),
    "q54_anti_join" -> (Queries.antiJoin _),
    "q55_quantile_profile" -> (Queries.quantileProfile _),
    "q56_lag_gaps" -> (Queries.lagGaps _),
    "q57_split_assign" -> (Queries.splitAssign _),
    "q58_upsert_merge" -> (Queries.upsertMerge _),
    "q59_multimodal_resize" -> (Queries.multimodalResize _),
    "q60_stream_stream_join" -> (Queries.streamStreamJoin _),
    "q61_set_ops" -> (Queries.setOps _),
    "q62_pack_sequences" -> (Queries.packSequences _),
    "q63_hash_sample" -> (Queries.hashSample _),
    "q64_paged_source_v2" -> (Queries.pagedSource _),
    "q65_json_extract" -> (Queries.jsonExtract _),
    "q66_cube" -> (Queries.cubeAgg _),
    "q67_ntile_quartiles" -> (Queries.ntileQuartiles _),
    "q68_fuzzy_pairs" -> (Queries.fuzzyPairs _),
    "q69_above_avg" -> (Queries.aboveAvg _),
    "q70_vocab" -> (Queries.vocab _),
    "q71_tfidf" -> (Queries.tfidf _),
    "q72_chunk_docs" -> (Queries.chunkDocs _),
    "q73_range_frame" -> (Queries.rangeFrame _),
    "q74_zscore" -> (Queries.zscore _),
    "q75_correlation" -> (Queries.correlation _),
    "q76_stream_foreach_batch" -> (Queries.streamForeachBatch _),
    "q77_paged_pushdown" -> (Queries.pagedPushdown _),
    "q78_stream_dedup_watermark" -> (Queries.streamDedupWatermark _),
    "q79_fuzzy_pairs_bucketed" -> (Queries.fuzzyPairsBucketed _),
    "q80_dedup_clusters" -> (Queries.dedupClusters _),
    "q81_stratified_sample" -> (Queries.stratifiedSample _),
    "q82_normalize_numbers" -> (Queries.normalizeNumbers _)
  )

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = Oracles.sql
}
