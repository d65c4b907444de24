package graft

import scala.collection.immutable.ListMap

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.engine._
import graft.functions.{TextFunctions => TF}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Conventions (shared by every query + oracle pair):
  *  - identical column aliases on both sides (driver hash-compares after
  *    sorting columns by name);
  *  - identical total ORDER BY on both sides so row order is defined;
  *  - DECIMAL casts for double sums (order-independent exactness),
  *    plain double for 0/1-flag averages and int/int divisions (exact
  *    operands → bit-identical IEEE results in both engines).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The reference's end-to-end aggregate (enrich → positivity + counts +
    * emotion pivot → join), SURVEY §3.2. */
  def entry(spark: SparkSession): DataFrame =
    TextQueries.q20Flagship(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = ListMap(
    "q01_flag_share_count" -> Relational.q01FlagShareCount _,
    "q02_two_key_count"    -> Relational.q02TwoKeyCount _,
    "q03_pivot_wide"       -> Relational.q03PivotWide _,
    "q04_unpivot_long"     -> Relational.q04UnpivotLong _,
    "q05_join_agg"         -> Relational.q05JoinAgg _,
    "q06_window_share"     -> Relational.q06WindowShare _,
    "q07_grouped_sum_multi" -> Relational.q07GroupedSumMulti _,
    "q08_time_grains"      -> Relational.q08TimeGrains _,
    "q09_dedup_first"      -> Relational.q09DedupFirst _,
    "q10_filter_project"   -> Relational.q10FilterProject _,
    "q11_ingest_projection" -> Relational.q11IngestProjection _,
    "q12_star_join"        -> Relational.q12StarJoin _,
    "q13_topk_orders"      -> Relational.q13TopkOrders _,
    "q14_sentiment"        -> TextQueries.q14Sentiment _,
    "q15_emotion_pivot"    -> TextQueries.q15EmotionPivot _,
    "q16_token_freq"       -> TextQueries.q16TokenFreq _,
    "q17_langid"           -> TextQueries.q17LangId _,
    "q18_quality"          -> TextQueries.q18Quality _,
    "q19_fingerprint"      -> TextQueries.q19Fingerprint _,
    "q20_flagship"         -> TextQueries.q20Flagship _,
    "q21_minhash_lsh"      -> Dedup.q21MinhashLsh _,
    "q22_simhash"          -> Dedup.q22Simhash _,
    "q23_ngram_jaccard"    -> Dedup.q23NgramJaccard _,
    "q24_cosine_topk"      -> Similarity.q24CosineTopk _,
    "q25_ann_lsh"          -> Similarity.q25AnnLsh _,
    "q26_embedding_neardup" -> Similarity.q26EmbeddingNearDup _,
    "q27_stream_window"    -> graft.streaming.Streaming.q27StreamWindow _,
    "q28_stream_dedup"     -> graft.streaming.Streaming.q28StreamDedup _,
    "q29_multimodal_meta"  -> Multimodal.q29MultimodalMeta _,
    "q30_multimodal_decode" -> Multimodal.q30MultimodalDecode _,
    "q31_rollup"           -> Relational2.q31Rollup _,
    "q32_distinct_agg"     -> Relational2.q32DistinctAgg _,
    "q33_approx_distinct"  -> Relational2.q33ApproxDistinct _,
    "q34_semi_join"        -> Relational2.q34SemiJoin _,
    "q35_anti_join"        -> Relational2.q35AntiJoin _,
    "q36_array_ops"        -> Relational2.q36ArrayOps _,
    "q37_fanout"           -> Relational2.q37FanOut _,
    "q38_cosine_topk_agg"  -> Similarity.q38CosineTopkAgg _,
    "q39_sessionize"       -> graft.streaming.Sessionize.q39Sessionize _,
    "q40_stream_sessionize" -> graft.streaming.Sessionize.q40StreamSessionize _,
    "q41_sliding_window"   -> graft.streaming.Streaming.q41SlidingWindow _,
    "q42_stream_join"      -> graft.streaming.Streaming.q42StreamStreamJoin _,
    "q43_percentiles"      -> Relational2.q43Percentiles _,
    "q44_tfidf"            -> TextQueries.q44Tfidf _,
    "q45_salted_join"      -> Relational2.q45SaltedJoin _,
    "q46_asof_join"        -> Relational2.q46AsofJoin _,
    "q47_dedup_watermark"  -> graft.streaming.Streaming.q47DedupWatermark _,
    "q48_json_roundtrip"   -> Formats.q48JsonRoundtrip _,
    "q49_formats_roundtrip" -> Formats.q49FormatsRoundtrip _,
    "q50_cube"             -> Relational2.q50Cube _,
    "q51_moving_avg"       -> Relational2.q51MovingAvg _,
    "q52_set_ops"          -> Relational3.q52SetOps _,
    "q53_outer_join"       -> Relational3.q53OuterJoin _,
    "q54_rank_family"      -> Relational3.q54RankFamily _,
    "q55_argminmax"        -> Relational3.q55ArgMinMax _,
    "q56_histogram"        -> Relational3.q56Histogram _,
    "q57_stratified_sample" -> Relational3.q57StratifiedSample _,
    "q58_correlated_subq"  -> Relational3.q58CorrelatedSubq _,
    "q59_frame_sample"     -> Multimodal.q59FrameSample _,
    "q60_percent_rank"     -> Relational3.q60PercentRank _,
    "q61_asof_native"      -> Relational3.q61AsofNative _,
    "q62_shingle_udtf"     -> Dedup.q62ShingleUdtf _,
    "q63_ingest_roundtrip" -> graft.streaming.Streaming.q63IngestRoundtrip _,
    "q64_gap_fill"         -> Relational3.q64GapFill _,
    "q65_range_join"       -> Relational3.q65RangeJoin _,
    "q66_range_frame"      -> Relational3.q66RangeFrame _,
    "q67_dedup_clusters"   -> Dedup.q67DedupClusters _,
    "q68_token_budget"     -> TextQueries.q68TokenBudget _,
    "q69_curation_funnel"  -> TextQueries.q69CurationFunnel _,
    "q70_budget_selection" -> TextQueries.q70BudgetSelection _,
    "q71_contamination"    -> Dedup.q71Contamination _,
    "q72_centroids"        -> Similarity.q72Centroids _,
    "q73_ann_ivf"          -> Similarity.q73AnnIvf _,
    "q74_group_sample"     -> Relational3.q74GroupSample _,
    "q75_cohort_conversion" -> Relational3.q75CohortConversion _,
    "q76_profile"          -> Relational4.q76Profile _,
    "q77_grouping_sets"    -> Relational4.q77GroupingSets _,
    "q78_median_mode"      -> Relational4.q78MedianMode _,
    "q79_edit_distance"    -> Dedup.q79EditDistance _,
    "q80_split_assign"     -> TextQueries.q80SplitAssign _,
    "q81_shard_pack"       -> TextQueries.q81ShardPack _,
    "q82_map_ops"          -> Relational4.q82MapOps _,
    "q83_quantize"         -> Similarity.q83Quantize _,
    "q84_redact"           -> TextQueries.q84Redact _,
    "q85_resize"           -> Multimodal.q85Resize _,
    "q86_foreach_sink"     -> graft.streaming.Streaming.q86ForeachSink _,
    "q87_repetition"       -> TextQueries.q87Repetition _,
    "q88_seq_pack"         -> TextQueries.q88SeqPack _,
    "q89_stream_static"    -> graft.streaming.Streaming.q89StreamStaticJoin _,
    "q90_cdc_upsert"       -> Relational5.q90CdcUpsert _,
    "q91_bloom_decontaminate" -> Dedup.q91BloomDecontaminate _,
    "q92_zorder_layout"    -> Relational5.q92ZorderLayout _,
    "q93_chunk_overlap"    -> TextQueries.q93ChunkOverlap _,
    "q94_bigram_counts"    -> TextQueries.q94BigramCounts _,
    "q95_distribution_drift" -> Relational5.q95DistributionDrift _,
    "q96_tws_sessionize"   -> graft.streaming.Sessionize.q96TransformWithState _,
    "q97_stream_outer_join" -> graft.streaming.Streaming.q97StreamOuterJoin _,
    "q98_variant_ops"      -> Relational5.q98VariantOps _,
    "q99_observe_metrics"  -> Relational5.q99ObserveMetrics _,
    "q100_mixture_weights" -> Relational6.q100MixtureWeights _,
    "q101_transitions"     -> Relational6.q101Transitions _,
    "q102_prefix_simjoin"  -> Dedup.q102PrefixSimJoin _,
    "q103_heavy_hitters"   -> Relational6.q103HeavyHitters _,
    "q104_split_leakage"   -> Dedup.q104SplitLeakage _,
    "q105_budget_sample"   -> TextQueries.q105BudgetSample _,
    "q106_retention"       -> Relational6.q106Retention _,
    "q107_append_window"   -> graft.streaming.Streaming.q107AppendWindow _,
    "q108_outlier_audit"   -> Relational6.q108OutlierAudit _,
    "q109_scd2_intervals"  -> Relational7.q109Scd2Intervals _,
    "q110_char_entropy"    -> TextQueries.q110CharEntropy _,
    "q111_schema_drift_union" -> Relational7.q111SchemaDriftUnion _,
    "q112_value_windows"   -> Relational7.q112ValueWindows _,
    "q113_winsorize"       -> Relational7.q113Winsorize _,
    "q114_hll_merge_bounds" -> Relational7.q114HllMergeBounds _,
    "q115_history_pack"    -> Relational7.q115HistoryPack _,
    "q116_bucketed_join"   -> Relational7.q116BucketedJoin _,
    "q117_cms_bounds"      -> Relational8.q117CmsBounds _,
    "q118_lateral_topk"    -> Relational8.q118LateralTopk _,
    "q119_khop_reach"      -> Dedup.q119KhopReach _,
    "q120_session_window"  -> graft.streaming.Sessionize.q120SessionWindowNative _,
    "q121_linear_trend"    -> Relational8.q121LinearTrend _,
    "q122_inverted_index"  -> Relational8.q122InvertedIndex _,
    "q123_bm25"            -> Relational8.q123Bm25 _,
    "q124_triangles"       -> GraphQueries.q124Triangles _,
    "q125_pagerank_exact"  -> GraphQueries.q125PagerankExact _,
    "q126_approx_pctl_bounds" -> Relational8.q126ApproxPercentileBounds _,
    "q127_kmv_distinct"    -> Relational8.q127KmvDistinct _,
    "q128_update_mode"     -> graft.streaming.Streaming.q128UpdateMode _,
    "q129_file_metadata"   -> Formats.q129FileMetadata _,
    "q130_dedup_apply"     -> Dedup.q130DedupApply _,
    "q131_snapshot_diff"   -> Relational5.q131SnapshotDiff _,
    "q132_lsh_precision"   -> Dedup.q132LshPrecision _,
    "q133_cross_correlation" -> Relational8.q133CrossCorrelation _,
    "q134_ordered_funnel"  -> Relational8.q134OrderedFunnel _,
    "q135_local_supplier"  -> Relational9.q135LocalSupplierRevenue _,
    "q136_ivm_merge"       -> Relational9.q136IvmMerge _,
    "q137_bpe_pairs"       -> Relational9.q137BpePairs _,
    "q138_market_share"    -> Relational9.q138MarketShare _,
    "q139_checksum_diff"   -> Relational9.q139ChecksumDiff _,
    "q140_partition_pruning" -> Relational9.q140PartitionPruning _,
    "q141_equidepth_bins"  -> Relational9.q141EquiDepthBins _,
    "q142_concurrency_gauge" -> Relational9.q142ConcurrencyGauge _,
    "q143_bpe_merge_round" -> Relational9.q143BpeMergeRound _,
    "q144_stream_ivm"      -> graft.streaming.Streaming.q144StreamIvm _,
    "q145_grouped_split"   -> Dedup.q145GroupedSplit _,
    "q146_pq_adc"          -> Similarity.q146PqAdc _,
    "q147_band_join"       -> Relational10.q147BandJoin _,
    "q148_merge_upsert"    -> Relational10.q148MergeUpsert _,
    "q149_sliding_distinct" -> Relational10.q149SlidingDistinct _,
    "q150_kmv_setops"      -> Relational10.q150KmvSetOps _,
    "q151_interpolate"     -> Relational10.q151Interpolate _,
    "q152_chi_square"      -> Relational10.q152ChiSquare _,
    "q153_constraint_audit" -> Relational10.q153ConstraintAudit _,
    "q154_skyline"         -> Relational11.q154Skyline _,
    "q155_grid_join"       -> Relational11.q155GridJoin _,
    "q156_weighted_sample" -> Relational11.q156WeightedSample _,
    "q157_welch_ttest"     -> Relational11.q157WelchTtest _,
    "q158_basket_lift"     -> Relational11.q158BasketLift _,
    "q159_purged_split"    -> Relational12.q159PurgedSplit _,
    "q160_group_norm"      -> Relational12.q160GroupNorm _,
    "q161_curriculum"      -> Relational12.q161Curriculum _,
    "q162_mixture_reweight" -> Relational12.q162MixtureReweight _,
    "q163_ewma"            -> Relational12.q163Ewma _,
    "q164_attribution"     -> Relational13.q164Attribution _,
    "q165_pmi"             -> Relational13.q165Pmi _,
    "q166_calibration"     -> Relational13.q166Calibration _,
    "q167_zone_map"        -> Relational13.q167ZoneMap _,
    "q168_ooo_audit"       -> Relational13.q168OooAudit _,
    "q169_boilerplate"     -> Relational14.q169Boilerplate _,
    "q170_rfm"             -> Relational14.q170Rfm _,
    "q171_paths"           -> Relational14.q171Paths _,
    "q172_pit_features"    -> Relational14.q172PitFeatures _,
    "q173_moments"         -> Relational14.q173Moments _,
    "q174_watermark_replay" -> graft.streaming.Streaming.q174WatermarkReplay _,
    "q175_cogroup"         -> Relational15.q175CogroupReconcile _,
    "q176_islands"         -> Relational15.q176Islands _,
    "q177_twap"            -> Relational15.q177Twap _,
    "q178_dwell_times"     -> Relational16.q178DwellTimes _,
    "q179_cusum"           -> Relational16.q179Cusum _,
    "q180_shipping_priority" -> Relational16.q180ShippingPriority _,
    "q181_conversion_deadline" -> Relational16.q181ConversionDeadline _,
    "q182_seasonality"     -> Relational17.q182Seasonality _,
    "q183_knn_eval"        -> Relational17.q183KnnEval _,
    "q184_negative_sampling" -> Relational17.q184NegativeSampling _,
    "q185_psi"             -> Relational17.q185Psi _,
    "q186_binary_source"   -> Formats.q186BinarySource _,
    "q187_text_source"     -> Formats.q187TextSource _,
    "q188_csv_expr"        -> Formats.q188CsvExpr _,
    "q189_dynamic_overwrite" -> Formats.q189DynamicOverwrite _,
    "q190_mapgroups_sessions" -> Relational18.q190MapGroupsSessions _,
    "q191_range_layout"    -> Relational18.q191RangeLayout _,
    "q192_large_volume"    -> Relational19.q192LargeVolume _,
    "q193_supplier_count"  -> Relational19.q193SupplierCount _,
    "q194_stream_join_disorder" -> graft.streaming.Streaming.q194StreamJoinDisorder _,
    "q195_stream_outer_disorder" -> graft.streaming.Streaming.q195StreamOuterJoinDisorder _,
    "q196_waiting_supplier" -> Relational19.q196WaitingSupplier _,
    "q197_freq_sketch"     -> Relational20.q197FreqSketch _,
    "q198_bitemporal"      -> Relational20.q198Bitemporal _,
    "q199_stream_full_outer_disorder" -> graft.streaming.Streaming.q199StreamFullOuterDisorder _,
    "q200_dynamic_pruning" -> Relational20.q200DynamicPruning _,
    "q201_runtime_filter"  -> Relational20.q201RuntimeFilter _,
    "q202_corrupt_records" -> Relational21.q202CorruptRecords _,
    "q203_codec_roundtrip" -> Relational21.q203CodecRoundtrip _,
    "q204_nullsafe_join"   -> Relational21.q204NullSafeJoin _,
    "q205_restart_replay"  -> graft.streaming.Streaming.q205RestartReplay _,
    "q206_join_then_window" -> graft.streaming.Streaming.q206JoinThenWindow _,
    "q225_window_rollup"    -> graft.streaming.Streaming.q225WindowRollup _,
    "q226_state_introspect" -> graft.streaming.Streaming.q226StateIntrospect _,
    "q227_stream_sketch"    -> graft.streaming.Streaming.q227StreamSketch _,
    "q228_stream_dead_letter" -> graft.streaming.Streaming.q228StreamDeadLetter _,
    "q229_ivf_pq"          -> Similarity.q229IvfPq _,
    "q230_kcenter_coreset" -> Similarity.q230KCenterCoreset _,
    "q231_incremental_assign" -> Dedup.q231IncrementalAssign _,
    "q232_truncation_recall" -> Similarity.q232TruncationRecall _,
    "q233_stream_topk"     -> graft.streaming.Streaming.q233StreamTopK _,
    "q234_retention_policy" -> Dedup.q234RetentionPolicy _,
    "q235_ivf_balance"     -> Similarity.q235IvfBalance _,
    "q236_bitmap_setops"   -> Relational24.q236BitmapSetops _,
    "q237_stream_bitmap"   -> graft.streaming.Streaming.q237StreamBitmap _,
    "q238_weighted_sample" -> Relational25.q238WeightedSample _,
    "q239_containment_join" -> Dedup.q239ContainmentJoin _,
    "q240_range_frame"     -> Relational25.q240RangeFrame _,
    "q241_stream_ann_serve" -> Similarity.q241StreamAnnServe _,
    "q242_pagerank"        -> Relational25.q242PageRank _,
    "q243_unigram_surprise" -> TextQueries.q243UnigramSurprise _,
    "q244_systematic_resample" -> TextQueries.q244SystematicResample _,
    "q245_schema_evolution" -> Formats.q245SchemaEvolution _,
    "q246_covariance"      -> Similarity.q246Covariance _,
    "q247_k_anonymity"     -> Relational26.q247KAnonymity _,
    "q248_edit_join"       -> Relational26.q248EdJoin _,
    "q249_hilbert_layout"  -> Relational26.q249HilbertLayout _,
    "q250_stream_ewma"     -> graft.streaming.Streaming.q250StreamEwma _,
    "q251_rle_runs"        -> Relational27.q251RleRuns _,
    "q252_seq_motif"       -> Relational27.q252SeqMotif _,
    "q253_bpe_encode"      -> Relational27.q253BpeEncode _,
    "q254_join_stats"      -> Relational27.q254JoinStats _,
    "q255_record_linkage"  -> Relational28.q255RecordLinkage _,
    "q256_skew_audit"      -> Relational28.q256SkewAudit _,
    "q257_sampling_audit"  -> Relational28.q257SamplingAudit _,
    "q258_stream_alerts"   -> graft.streaming.Streaming.q258StreamAlerts _,
    "q259_gdpr_cascade"    -> Relational29.q259GdprCascade _,
    "q260_deletion_vectors" -> Relational29.q260DeletionVectors _,
    "q261_optimize_plan"   -> Relational30.q261OptimizePlan _,
    "q262_mv_routing"      -> Relational30.q262MvRouting _,
    "q263_allocation"      -> Relational30.q263Allocation _,
    "q264_data_recipe"     -> TextQueries.q264DataRecipe _,
    "q265_dedup_roi"       -> Dedup.q265DedupRoi _,
    "q266_stream_map_state" -> graft.streaming.Streaming.q266StreamTypeCounts _,
    "q267_stream_last_k"   -> graft.streaming.Streaming.q267StreamLastK _,
    "q268_xml_roundtrip"   -> Formats.q268XmlRoundtrip _,
    "q269_shuffle_quality" -> Relational30.q269ShuffleQuality _,
    "q270_graftsink_roundtrip" -> graft.streaming.Streaming.q270GraftSinkRoundtrip _,
    "q271_scd2_build"      -> Relational31.q271Scd2Build _,
    "q272_group_ols"       -> Relational31.q272GroupOls _,
    "q273_tokenizer_fertility" -> Relational31.q273TokenizerFertility _,
    "q274_timer_sessions"  -> graft.streaming.Streaming.q274TimerSessions _,
    "q275_exact_quantiles" -> Relational32.q275ExactQuantiles _,
    "q276_stream_anti"     -> graft.streaming.Streaming.q276StreamAntiJoin _,
    "q277_waiting_suppliers" -> Relational32.q277WaitingSuppliers _,
    "q278_idle_rich"       -> Relational32.q278IdleRich _,
    "q279_simhash_neardup" -> Dedup.q279SimhashNearDup _,
    "q280_shard_manifest"  -> TextQueries.q280ShardManifest _,
    "q281_dup_flow_matrix" -> Dedup.q281DupFlowMatrix _,
    "q282_vocab_coverage"  -> TextQueries.q282VocabCoverage _,
    "q283_takedown_plan"   -> TextQueries.q283TakedownPlan _,
    "q284_graftsink_stream" -> graft.streaming.Streaming.q284GraftSinkStream _,
    "q285_market_share"    -> Relational33.q285MarketShare _,
    "q286_attribution"     -> Relational33.q286LinearAttribution _,
    "q287_seasonal_profile" -> Relational33.q287SeasonalProfile _,
    "q288_hard_negatives"  -> Similarity.q288HardNegatives _,
    "q289_pair_availability" -> Similarity.q289PairAvailability _,
    "q290_graftsink_restart" -> graft.streaming.Streaming.q290GraftSinkRestart _,
    "q291_stream_observe"  -> graft.streaming.Streaming.q291StreamObserve _,
    "q292_version_diff"    -> Relational34.q292VersionDiff _,
    "q293_topk_ties"       -> Relational34.q293TopKTies _,
    "q294_late_orders"     -> Relational35.q294LateOrders _,
    "q295_latency_classes" -> Relational35.q295LatencyClasses _,
    "q296_dominant_suppliers" -> Relational35.q296DominantSuppliers _,
    "q297_quality_auc"     -> Relational36.q297QualityAuc _,
    "q298_ks_drift"        -> Relational36.q298KsDrift _,
    "q299_spearman_stats"  -> Relational36.q299SpearmanStats _,
    "q300_stream_semi_join" -> graft.streaming.Streaming.q300StreamSemiJoin _,
    "q301_union_ingest"    -> graft.streaming.Streaming.q301UnionIngest _,
    "q302_connected_components" -> GraphQueries.q302ConnectedComponents _,
    "q303_co_supplier_matrix" -> GraphQueries.q303CoSupplierMatrix _,
    "q304_vocab_growth"    -> Relational37.q304VocabGrowth _,
    "q305_kappa_stats"     -> Relational37.q305KappaStats _,
    "q306_gini"            -> Relational37.q306GiniConcentration _,
    "q307_coverage_depth"  -> Relational37.q307CoverageDepth _,
    "q308_power_iteration" -> EmbedStats.q308PowerIteration _,
    "q309_anova_separation" -> EmbedStats.q309AnovaSeparation _,
    "q310_span_coverage"   -> Relational38.q310SpanCoverage _,
    "q311_bootstrap"       -> Relational38.q311Bootstrap _,
    "q312_apportionment"   -> Relational38.q312Apportionment _,
    "q313_weighted_quantiles" -> Relational39.q313WeightedQuantiles _,
    "q314_trimmed_mean"    -> Relational39.q314TrimmedMean _,
    "q315_nearest_asof"    -> Relational40.q315NearestAsof _,
    "q316_ks_matrix"       -> Relational40.q316KsMatrix _,
    "q317_quantile_norm"   -> Relational40.q317QuantileNorm _,
    "q318_chunk_dedup"     -> Relational41.q318ChunkDedup _,
    "q319_rebalance"       -> Relational41.q319Rebalance _,
    "q320_kmeans_lloyd"    -> Relational41.q320KMeansLloyd _,
    "q321_coverage_calendar" -> Relational42.q321CoverageCalendar _,
    "q322_overlap_matrix"  -> Relational42.q322OverlapMatrix _,
    "q323_quota_topk"      -> Relational42.q323QuotaTopK _,
    "q324_datasheet"       -> Relational43.q324Datasheet _,
    "q325_hybrid_skew_join" -> Relational43.q325HybridSkewJoin _,
    "q326_balanced_downsample" -> Relational43.q326BalancedDownsample _,
    "q327_forecast_revenue" -> Relational44.q327ForecastRevenue _,
    "q328_hhi_bands"       -> Relational44.q328HhiBands _,
    "q329_pruning_cost"    -> Relational44.q329PruningCost _,
    "q330_anti_entropy"    -> Relational45.q330AntiEntropy _,
    "q331_quorum_repair"   -> Relational45.q331QuorumRepair _,
    "q332_grain_alignment" -> Relational46.q332GrainAlignment _,
    "q333_ab_audit"        -> Relational46.q333AbAudit _,
    "q334_three_way_stream_join" -> graft.streaming.Streaming.q334ThreeWayStreamJoin _,
    "q335_winsor_trend"    -> Relational47.q335WinsorTrend _,
    "q336_ushape_attribution" -> Relational47.q336UShapeAttribution _,
    "q337_sparse_scoring"  -> Relational48.q337SparseScoring _,
    "q338_hashing_collisions" -> Relational48.q338HashingCollisions _,
    "q339_change_point"    -> Relational49.q339ChangePoint _,
    "q340_greedy_cover"    -> Relational49.q340GreedyCover _,
    "q341_diff_compose"    -> Relational50.q341DiffCompose _,
    "q342_gc_plan"         -> Relational50.q342GcPlan _,
    "q343_salted_distinct" -> Relational51.q343SaltedDistinct _,
    "q344_kmv_frontier"    -> Relational51.q344KmvFrontier _,
    "q345_fd_profile"      -> Relational51.q345FdProfile _,
    "q346_sequence_support" -> Relational52.q346SequenceSupport _,
    "q347_reconciliation"  -> Relational52.q347Reconciliation _,
    "q348_longest_streak"  -> Relational52.q348LongestStreak _,
    "q349_benford"         -> Relational53.q349Benford _,
    "q350_inclusion_deps"  -> Relational53.q350InclusionDeps _,
    "q351_assortativity"   -> Relational53.q351Assortativity _,
    "q352_acf"             -> Relational54.q352Acf _,
    "q353_fifo_containers" -> Relational54.q353FifoContainers _,
    "q354_pk_discovery"    -> Relational54.q354PkDiscovery _,
    "q355_tree_rollup"     -> Relational55.q355TreeRollup _,
    "q356_dhondt"          -> Relational55.q356Dhondt _,
    "q357_rrf_fusion"      -> Relational55.q357RrfFusion _,
    "q358_theil_sen"       -> Relational56.q358TheilSen _,
    "q359_mad_outliers"    -> Relational56.q359MadOutliers _,
    "q360_sssp_minplus"    -> Relational56.q360SsspMinplus _,
    "q361_graftsource_pushdown" -> Relational57.q361GraftsourcePushdown _,
    "q362_stream_histogram" -> graft.streaming.Streaming.q362StreamHistogram _,
    "q363_kendall_tau"     -> Relational58.q363KendallTau _,
    "q364_rule_attribution" -> Relational58.q364RuleAttribution _,
    "q365_loo_ablation"    -> Relational58.q365LooAblation _,
    "q366_kaplan_meier"    -> Relational59.q366KaplanMeier _,
    "q367_max_drawdown"    -> Relational59.q367MaxDrawdown _,
    "q368_kcore_peel"      -> Relational59.q368KcorePeel _,
    "q207_dynamic_gap"     -> graft.streaming.Sessionize.q207DynamicGap _,
    "q208_stream_asof"     -> graft.streaming.Streaming.q208StreamAsofEnrich _,
    "q209_cdc_deletes"     -> Relational21.q209CdcDeletes _,
    "q210_range_join_rule" -> Relational22.q210RangeJoinRule _,
    "q211_mincost_supplier" -> Relational23.q211MinCostSupplier _,
    "q212_important_parts" -> Relational23.q212ImportantParts _,
    "q213_custdist"        -> Relational23.q213CustDist _,
    "q214_smallqty_revenue" -> Relational23.q214SmallQtyRevenue _,
    "q215_qualified_suppliers" -> Relational23.q215QualifiedSuppliers _,
    "q216_rich_inactive"   -> Relational23.q216RichInactive _,
    "q217_volume_shipping" -> Relational23.q217VolumeShipping _,
    "q218_disjunctive_rev" -> Relational23.q218DisjunctiveRevenue _,
    "q219_ts_range_join_rule" -> Relational22.q219TsRangeJoinRule _,
    "q220_product_profit"  -> Relational24.q220ProductProfit _,
    "q221_returned_items"  -> Relational24.q221ReturnedItems _,
    "q222_promo_share"     -> Relational24.q222PromoShare _,
    "q223_top_supplier"    -> Relational24.q223TopSupplier _,
    "q224_sketch_rollup"   -> Relational24.q224SketchRollup _,
  )

  /** Queries whose CONSTRUCTOR runs a Structured Streaming drain (the
    * returned frame is the already-executed result): the plan-sweep
    * spec skips these — their physical posture is asserted by their
    * own streaming specs, and constructing each one replays its
    * micro-batches, which would dominate suite runtime. Keep in sync
    * with the `graft.streaming.*` entries in [[queries]]
    * (PlanAssertionsSpec cross-checks membership against the map). */
  val streamingQueries: Set[String] = Set(
    "q27_stream_window", "q28_stream_dedup", "q39_sessionize",
    "q40_stream_sessionize", "q41_sliding_window", "q42_stream_join",
    "q47_dedup_watermark", "q63_ingest_roundtrip", "q86_foreach_sink",
    "q89_stream_static", "q96_tws_sessionize", "q97_stream_outer_join",
    "q107_append_window", "q120_session_window", "q128_update_mode",
    "q144_stream_ivm", "q174_watermark_replay", "q194_stream_join_disorder",
    "q195_stream_outer_disorder", "q199_stream_full_outer_disorder",
    "q205_restart_replay", "q206_join_then_window", "q207_dynamic_gap",
    "q208_stream_asof", "q225_window_rollup", "q226_state_introspect",
    "q227_stream_sketch", "q228_stream_dead_letter", "q233_stream_topk",
    "q237_stream_bitmap", "q241_stream_ann_serve", "q250_stream_ewma",
    "q258_stream_alerts", "q266_stream_map_state", "q267_stream_last_k",
    "q270_graftsink_roundtrip", "q274_timer_sessions", "q276_stream_anti",
    "q284_graftsink_stream", "q290_graftsink_restart", "q291_stream_observe",
    "q300_stream_semi_join", "q301_union_ingest",
    "q334_three_way_stream_join", "q362_stream_histogram")

  /** Shared by q46 (window-composed as-of join) and q61 (native custom
    * operator) — both implement the same contract. */
  private val q46Sql: String =
    """SELECT user_id, event_id AS purchase_id, signup_id FROM (
           SELECT user_id, ts, event_id, event_type,
             last_value(CASE WHEN event_type = 'signup' THEN event_id END IGNORE NULLS)
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS UNBOUNDED PRECEDING) AS signup_id
           FROM events WHERE event_type IN ('purchase', 'signup')) t
         WHERE event_type = 'purchase' AND signup_id IS NOT NULL
         ORDER BY user_id, purchase_id"""

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = ListMap(
    "q01_flag_share_count" ->
      """SELECT l_returnflag,
         round(avg(CASE WHEN l_discount > 0.05 THEN 1 ELSE 0 END), 4) AS disc_share,
         count(l_returnflag) AS counts
         FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""",
    "q02_two_key_count" ->
      """SELECT l_returnflag, l_linestatus, count(*) AS counts
         FROM lineitem GROUP BY l_returnflag, l_linestatus
         ORDER BY l_returnflag, l_linestatus""",
    "q03_pivot_wide" ->
      """SELECT l_returnflag,
         CAST(coalesce(sum(CASE WHEN l_linestatus = 'F' THEN CAST(l_quantity AS DECIMAL(18,2)) END), 0) * 100 AS BIGINT) / 100.0 AS "F",
         CAST(coalesce(sum(CASE WHEN l_linestatus = 'O' THEN CAST(l_quantity AS DECIMAL(18,2)) END), 0) * 100 AS BIGINT) / 100.0 AS "O"
         FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""",
    "q04_unpivot_long" ->
      """WITH w AS (
           SELECT l_returnflag,
           CAST(coalesce(sum(CASE WHEN l_linestatus = 'F' THEN CAST(l_quantity AS DECIMAL(18,2)) END), 0) * 100 AS BIGINT) / 100.0 AS f_qty,
           CAST(coalesce(sum(CASE WHEN l_linestatus = 'O' THEN CAST(l_quantity AS DECIMAL(18,2)) END), 0) * 100 AS BIGINT) / 100.0 AS o_qty
           FROM lineitem GROUP BY l_returnflag)
         SELECT l_returnflag, 'F' AS l_linestatus, f_qty AS sum_qty FROM w
         UNION ALL
         SELECT l_returnflag, 'O' AS l_linestatus, o_qty AS sum_qty FROM w
         ORDER BY l_returnflag, l_linestatus""",
    "q05_join_agg" ->
      """WITH rates AS (
           SELECT l_returnflag,
           round(avg(CASE WHEN l_discount > 0.05 THEN 1 ELSE 0 END), 4) AS disc_share,
           count(*) AS counts
           FROM lineitem GROUP BY l_returnflag),
         wide AS (
           SELECT l_returnflag,
           CAST(coalesce(sum(CASE WHEN l_linestatus = 'F' THEN CAST(l_quantity AS DECIMAL(18,2)) END), 0) * 100 AS BIGINT) / 100.0 AS "F",
           CAST(coalesce(sum(CASE WHEN l_linestatus = 'O' THEN CAST(l_quantity AS DECIMAL(18,2)) END), 0) * 100 AS BIGINT) / 100.0 AS "O"
           FROM lineitem GROUP BY l_returnflag)
         SELECT r.l_returnflag, r.disc_share, r.counts, w."F", w."O"
         FROM rates r JOIN wide w ON r.l_returnflag = w.l_returnflag
         ORDER BY r.l_returnflag""",
    "q06_window_share" ->
      """WITH byday AS (
           SELECT event_type, strftime(ts, '%Y-%m-%d') AS date, count(*) AS counts
           FROM events GROUP BY event_type, strftime(ts, '%Y-%m-%d'))
         SELECT event_type, date, counts,
         round(counts / sum(counts) OVER (PARTITION BY event_type), 6) AS share
         FROM byday ORDER BY event_type, date""",
    "q07_grouped_sum_multi" ->
      """SELECT l_returnflag,
         CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) * 100 AS BIGINT) / 100.0 AS sum_qty,
         CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) * 100 AS BIGINT) / 100.0 AS sum_price,
         CAST(sum(CAST(l_discount AS DECIMAL(18,4))) * 10000 AS BIGINT) / 10000.0 AS sum_disc
         FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""",
    "q08_time_grains" ->
      """SELECT strftime(ts, '%Y-%m-%d') AS date, strftime(ts, '%H') AS hour,
         count(*) AS counts
         FROM events GROUP BY 1, 2 ORDER BY 1, 2""",
    "q09_dedup_first" ->
      """SELECT event_id, user_id, event_type, value FROM (
           SELECT event_id, user_id, event_type, value,
           row_number() OVER (PARTITION BY user_id, event_type ORDER BY event_id) AS rn
           FROM events) t
         WHERE rn = 1 ORDER BY user_id, event_type""",
    "q10_filter_project" ->
      """SELECT upper(substr(event_type, 1, 2)) || CAST(event_id AS VARCHAR) AS key,
         event_id, user_id, event_type
         FROM events WHERE event_type <> 'error' ORDER BY event_id""",
    "q11_ingest_projection" ->
      """SELECT event_type,
         CAST(sum(TRY_CAST(regexp_extract(props, '"k": (\d+)', 1) AS BIGINT)) AS BIGINT) AS sum_k,
         count(*) AS counts
         FROM events GROUP BY event_type ORDER BY event_type""",
    "q12_star_join" ->
      """SELECT r_name,
         CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) * 10000 AS BIGINT) / 10000.0 AS revenue,
         count(*) AS counts
         FROM lineitem
         JOIN orders   ON l_orderkey = o_orderkey
         JOIN customer ON o_custkey = c_custkey
         JOIN nation   ON c_nationkey = n_nationkey
         JOIN region   ON n_regionkey = r_regionkey
         GROUP BY r_name ORDER BY r_name""",
    "q13_topk_orders" ->
      """SELECT o_orderkey, o_custkey,
         CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) / 100.0 AS o_totalprice
         FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 10""",
    "q14_sentiment" ->
      s"""WITH e AS (SELECT source, ${TF.sentimentSql("text")} AS sentiment FROM documents)
          SELECT source, sentiment, count(*) AS counts FROM e
          GROUP BY source, sentiment ORDER BY source, sentiment""",
    "q15_emotion_pivot" -> {
      val cells = TF.EmotionLabels
        .map(l => s"count(*) FILTER (WHERE emotion = '$l') AS $l").mkString(", ")
      s"""WITH e AS (SELECT source, ${TF.emotionSql("text")} AS emotion FROM documents)
          SELECT source, $cells FROM e GROUP BY source ORDER BY source"""
    },
    "q16_token_freq" ->
      """SELECT token, count(*) AS counts FROM (
           SELECT unnest(regexp_split_to_array(trim(text), '\s+')) AS token
           FROM documents) t
         WHERE token <> '' GROUP BY token
         ORDER BY counts DESC, token LIMIT 20""",
    "q17_langid" ->
      s"""WITH e AS (SELECT lang, ${TF.langIdSql("text")} AS pred FROM documents)
          SELECT lang, pred, count(*) AS counts FROM e
          GROUP BY lang, pred ORDER BY lang, pred""",
    "q18_quality" ->
      s"""WITH e AS (SELECT source, ${TF.qualityScoreSql("text")} AS q,
            ${TF.tokenCountSql("text")} AS wc FROM documents)
          SELECT source,
          CAST(sum(CAST(q AS DECIMAL(12,6))) * 1000000 AS BIGINT) / 1000000.0 AS sum_quality,
          min(wc) AS min_wc, max(wc) AS max_wc, count(*) AS counts
          FROM e GROUP BY source ORDER BY source""",
    "q19_fingerprint" ->
      s"""SELECT ${TF.fingerprintSql("text")} AS fp, min(doc_id) AS keeper,
          count(*) AS dups
          FROM documents GROUP BY 1 ORDER BY fp""",
    "q20_flagship" -> {
      val cells = TF.EmotionLabels
        .map(l => s"count(*) FILTER (WHERE emotion = '$l') AS $l").mkString(", ")
      s"""WITH e AS (SELECT source, ${TF.sentimentSql("text")} AS sentiment,
            ${TF.emotionSql("text")} AS emotion FROM documents),
          rates AS (
            SELECT source,
            round(avg(CASE WHEN sentiment IS NOT DISTINCT FROM 'positive' THEN 1 ELSE 0 END), 4) AS positivity_rate,
            count(*) AS counts
            FROM e GROUP BY source),
          wide AS (SELECT source, $cells FROM e GROUP BY source)
          SELECT r.source, r.positivity_rate, r.counts,
                 w.anger, w.fear, w.joy, w.love, w.sadness, w.surprise
          FROM rates r JOIN wide w ON r.source = w.source
          ORDER BY r.source"""
    },
    "q21_minhash_lsh"       -> Dedup.q21Sql,
    "q22_simhash"           -> Dedup.q22Sql,
    "q23_ngram_jaccard"     -> Dedup.q23Sql,
    "q24_cosine_topk"       -> Similarity.q24Sql,
    "q25_ann_lsh"           -> Similarity.q25Sql,
    "q26_embedding_neardup" -> Similarity.q26Sql,
    // (since the q33 self-check retrofit, EVERY query is oracle-gated —
    // sketch estimates ride as oracle-checked bound booleans.)
    "q27_stream_window"     -> graft.streaming.Streaming.q27Sql,
    "q28_stream_dedup"      -> graft.streaming.Streaming.q28Sql,
    "q29_multimodal_meta"   -> Multimodal.q29Sql,
    // the mapPartitions decode IS oracle-checkable on this corpus: pure
    // ASCII, so per-char ord() == UTF-8 byte, and the byte sum stays an
    // exact integer in both engines (< 2^53) before one double division.
    "q30_multimodal_decode" -> Multimodal.q30Sql,
    "q31_rollup" ->
      """SELECT coalesce(l_returnflag, '(all)') AS rf,
         coalesce(l_linestatus, '(all)') AS ls,
         CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) * 100 AS BIGINT) / 100.0 AS sum_qty,
         count(*) AS counts
         FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)
         ORDER BY rf, ls""",
    "q32_distinct_agg" ->
      """SELECT l_returnflag,
         count(DISTINCT l_partkey) AS n_parts,
         count(DISTINCT l_suppkey) AS n_supps,
         count(*) AS counts
         FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""",
    "q33_approx_distinct"   -> Relational2.q33Sql,
    "q34_semi_join" ->
      """SELECT c_mktsegment, count(*) AS counts FROM customer
         WHERE EXISTS (SELECT 1 FROM orders
                       WHERE o_custkey = c_custkey AND o_orderstatus = 'O')
         GROUP BY c_mktsegment ORDER BY c_mktsegment""",
    "q35_anti_join" ->
      """SELECT p_brand, count(*) AS counts FROM part
         WHERE NOT EXISTS (SELECT 1 FROM lineitem WHERE l_partkey = p_partkey AND l_quantity >= 45)
         GROUP BY p_brand ORDER BY p_brand""",
    "q36_array_ops" ->
      """SELECT doc_id,
         regexp_split_to_array(trim(text), '\s+')[1] AS first_tok,
         regexp_split_to_array(trim(text), '\s+')[-1] AS last_tok,
         len(regexp_split_to_array(trim(text), '\s+')) AS n_toks
         FROM documents ORDER BY doc_id""",
    "q37_fanout" ->
      """WITH fan AS (
           SELECT event_id, 'all' AS tag FROM events
           UNION ALL
           SELECT event_id, 'p' AS tag FROM events WHERE event_type = 'purchase'
           UNION ALL
           SELECT event_id, 'hv' AS tag FROM events WHERE value > 100)
         SELECT upper(tag) || ':' || CAST(event_id AS VARCHAR) AS key,
         '{"event_id":' || CAST(event_id AS VARCHAR) || ',"tag":"' || tag || '"}' AS value
         FROM fan ORDER BY key""",
    // identical semantics to q24, different physical plan (bounded
    // aggregator vs window sort) — same oracle.
    "q38_cosine_topk_agg"   -> Similarity.q24Sql,
    // q40 drains in one AvailableNow batch, so the stateful streaming
    // form emits exactly the batch sessionization — same oracle as q39.
    "q39_sessionize"        -> graft.streaming.Sessionize.q39Sql,
    "q40_stream_sessionize" -> graft.streaming.Sessionize.q39Sql,
    "q41_sliding_window"    -> graft.streaming.Streaming.q41Sql,
    "q42_stream_join"       -> graft.streaming.Streaming.q42Sql,
    "q43_percentiles" ->
      """SELECT l_returnflag,
         round(quantile_cont(l_quantity, 0.5), 6) AS qty_p50,
         round(quantile_cont(l_quantity, 0.9), 6) AS qty_p90,
         round(quantile_cont(l_extendedprice, 0.5), 6) AS price_p50
         FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""",
    "q44_tfidf" ->
      """WITH toks AS (
           SELECT doc_id, unnest(regexp_split_to_array(trim(text), '\s+')) AS token
           FROM documents WHERE doc_id % 10 = 0),
         tf AS (SELECT doc_id, token, count(*) AS tf FROM toks
                WHERE token <> '' GROUP BY doc_id, token),
         df AS (SELECT token, count(*) AS df FROM tf GROUP BY token),
         n AS (SELECT count(DISTINCT doc_id) AS n FROM toks WHERE token <> ''),
         scored AS (
           SELECT tf.doc_id, tf.token,
             round(tf.tf * (ln((n.n + 1.0) / (df.df + 1.0)) + 1.0), 6) AS tfidf
           FROM tf JOIN df USING (token) CROSS JOIN n),
         ranked AS (
           SELECT doc_id, token, tfidf,
             row_number() OVER (PARTITION BY doc_id ORDER BY tfidf DESC, token) AS rank
           FROM scored)
         SELECT doc_id, rank, token, tfidf FROM ranked
         WHERE rank <= 5 ORDER BY doc_id, rank""",
    // the salted two-phase join is result-identical to the plain
    // formulation — the plain SQL is the oracle.
    "q45_salted_join" ->
      """SELECT event_type, count(*) AS counts,
         round(avg(CASE WHEN value > 100 THEN 1 ELSE 0 END), 6) AS hv_share
         FROM events GROUP BY event_type ORDER BY event_type""",
    "q46_asof_join" -> q46Sql,
    "q47_dedup_watermark"   -> graft.streaming.Streaming.q47Sql,
    "q48_json_roundtrip"    -> Formats.q48Sql,
    "q49_formats_roundtrip" -> Formats.q49Sql,
    "q50_cube" ->
      """SELECT coalesce(l_returnflag, '(all)') AS rf,
         coalesce(l_linestatus, '(all)') AS ls,
         CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) * 100 AS BIGINT) / 100.0 AS sum_qty,
         count(*) AS counts
         FROM lineitem GROUP BY CUBE(l_returnflag, l_linestatus)
         ORDER BY rf, ls""",
    "q51_moving_avg" ->
      """SELECT user_id, event_id,
         count(*) OVER wrun AS running_n,
         CAST(sum(CAST(value AS DECIMAL(18,2))) OVER wtrail * 100 AS BIGINT)
           / (count(*) OVER wtrail * 100.0) AS ma3
         FROM events
         WINDOW wrun AS (PARTITION BY user_id ORDER BY ts, event_id
                         ROWS UNBOUNDED PRECEDING),
           wtrail AS (PARTITION BY user_id ORDER BY ts, event_id
                      ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
         ORDER BY user_id, event_id""",
    "q52_set_ops"           -> Relational3.q52Sql,
    "q53_outer_join"        -> Relational3.q53Sql,
    "q54_rank_family"       -> Relational3.q54Sql,
    "q55_argminmax"         -> Relational3.q55Sql,
    "q56_histogram"         -> Relational3.q56Sql,
    "q57_stratified_sample" -> Relational3.q57Sql,
    "q58_correlated_subq"   -> Relational3.q58Sql,
    "q59_frame_sample"      -> Multimodal.q59Sql,
    "q60_percent_rank"      -> Relational3.q60Sql,
    // the native as-of operator is result-identical to the composed form
    // — q46's oracle is the contract for both.
    "q61_asof_native"       -> q46Sql,
    "q62_shingle_udtf"      -> Dedup.q62Sql,
    "q63_ingest_roundtrip"  -> graft.streaming.Streaming.q63Sql,
    "q64_gap_fill"          -> Relational3.q64Sql,
    // batch twin of the streaming interval join — same contract.
    "q65_range_join"        -> graft.streaming.Streaming.q42Sql,
    "q66_range_frame"       -> Relational3.q66Sql,
    "q67_dedup_clusters"    -> Dedup.q67Sql,
    "q68_token_budget"      -> TextQueries.q68Sql,
    "q69_curation_funnel"   -> TextQueries.q69Sql,
    "q70_budget_selection"  -> TextQueries.q70Sql,
    "q71_contamination"     -> Dedup.q71Sql,
    "q72_centroids"         -> Similarity.q72Sql,
    "q73_ann_ivf"           -> Similarity.q73Sql,
    "q74_group_sample"      -> Relational3.q74Sql,
    "q75_cohort_conversion" -> Relational3.q75Sql,
    "q76_profile"           -> Relational4.q76Sql,
    "q77_grouping_sets"     -> Relational4.q77Sql,
    "q78_median_mode"       -> Relational4.q78Sql,
    "q79_edit_distance"     -> Dedup.q79Sql,
    "q80_split_assign"      -> TextQueries.q80Sql,
    "q81_shard_pack"        -> TextQueries.q81Sql,
    "q82_map_ops"           -> Relational4.q82Sql,
    "q83_quantize"          -> Similarity.q83Sql,
    "q84_redact"            -> TextQueries.q84Sql,
    "q85_resize"            -> Multimodal.q85Sql,
    // the foreachBatch store roundtrip preserves rows exactly like the
    // parquet-sink roundtrip — q63's oracle is the contract for both.
    "q86_foreach_sink"      -> graft.streaming.Streaming.q63Sql,
    // same roundtrip contract through the graftsink DataSourceV2
    // connector (write + read both via the provider)
    "q270_graftsink_roundtrip" -> graft.streaming.Streaming.q63Sql,
    "q271_scd2_build"       -> Relational31.q271Sql,
    "q272_group_ols"        -> Relational31.q272Sql,
    "q273_tokenizer_fertility" -> Relational31.q273Sql,
    "q274_timer_sessions"   -> graft.streaming.Streaming.q274Sql,
    "q275_exact_quantiles"  -> Relational32.q275Sql,
    "q276_stream_anti"      -> graft.streaming.Streaming.q276Sql,
    "q277_waiting_suppliers" -> Relational32.q277Sql,
    "q278_idle_rich"        -> Relational32.q278Sql,
    "q279_simhash_neardup"  -> Dedup.q279Sql,
    "q280_shard_manifest"   -> TextQueries.q280Sql,
    "q281_dup_flow_matrix"  -> Dedup.q281Sql,
    "q282_vocab_coverage"   -> TextQueries.q282Sql,
    "q283_takedown_plan"    -> TextQueries.q283Sql,
    "q284_graftsink_stream" -> graft.streaming.Streaming.q63Sql,
    "q285_market_share"     -> Relational33.q285Sql,
    "q286_attribution"      -> Relational33.q286Sql,
    "q287_seasonal_profile" -> Relational33.q287Sql,
    "q288_hard_negatives"   -> Similarity.q288Sql,
    "q289_pair_availability" -> Similarity.q289Sql,
    "q290_graftsink_restart" -> graft.streaming.Streaming.q290Sql,
    "q291_stream_observe"   -> graft.streaming.Streaming.q291Sql,
    "q292_version_diff"     -> Relational34.q292Sql,
    "q293_topk_ties"        -> Relational34.q293Sql,
    "q294_late_orders"      -> Relational35.q294Sql,
    "q295_latency_classes"  -> Relational35.q295Sql,
    "q296_dominant_suppliers" -> Relational35.q296Sql,
    "q297_quality_auc"      -> Relational36.q297Sql,
    "q298_ks_drift"         -> Relational36.q298Sql,
    "q299_spearman_stats"   -> Relational36.q299Sql,
    "q300_stream_semi_join" -> graft.streaming.Streaming.q300Sql,
    "q301_union_ingest"     -> graft.streaming.Streaming.q301Sql,
    "q302_connected_components" -> GraphQueries.q302Sql,
    "q303_co_supplier_matrix" -> GraphQueries.q303Sql,
    "q304_vocab_growth"     -> Relational37.q304Sql,
    "q305_kappa_stats"      -> Relational37.q305Sql,
    "q306_gini"             -> Relational37.q306Sql,
    "q307_coverage_depth"   -> Relational37.q307Sql,
    "q308_power_iteration"  -> EmbedStats.q308Sql,
    "q309_anova_separation" -> EmbedStats.q309Sql,
    "q310_span_coverage"    -> Relational38.q310Sql,
    "q311_bootstrap"        -> Relational38.q311Sql,
    "q312_apportionment"    -> Relational38.q312Sql,
    "q313_weighted_quantiles" -> Relational39.q313Sql,
    "q314_trimmed_mean"     -> Relational39.q314Sql,
    "q315_nearest_asof"     -> Relational40.q315Sql,
    "q316_ks_matrix"        -> Relational40.q316Sql,
    "q317_quantile_norm"    -> Relational40.q317Sql,
    "q318_chunk_dedup"      -> Relational41.q318Sql,
    "q319_rebalance"        -> Relational41.q319Sql,
    "q320_kmeans_lloyd"     -> Relational41.q320Sql,
    "q321_coverage_calendar" -> Relational42.q321Sql,
    "q322_overlap_matrix"   -> Relational42.q322Sql,
    "q323_quota_topk"       -> Relational42.q323Sql,
    "q324_datasheet"        -> Relational43.q324Sql,
    "q325_hybrid_skew_join" -> Relational43.q325Sql,
    "q326_balanced_downsample" -> Relational43.q326Sql,
    "q327_forecast_revenue" -> Relational44.q327Sql,
    "q328_hhi_bands"        -> Relational44.q328Sql,
    "q329_pruning_cost"     -> Relational44.q329Sql,
    "q330_anti_entropy"     -> Relational45.q330Sql,
    "q331_quorum_repair"    -> Relational45.q331Sql,
    "q332_grain_alignment"  -> Relational46.q332Sql,
    "q333_ab_audit"         -> Relational46.q333Sql,
    "q334_three_way_stream_join" -> graft.streaming.Streaming.q334Sql,
    "q335_winsor_trend"     -> Relational47.q335Sql,
    "q336_ushape_attribution" -> Relational47.q336Sql,
    "q337_sparse_scoring"   -> Relational48.q337Sql,
    "q338_hashing_collisions" -> Relational48.q338Sql,
    "q339_change_point"     -> Relational49.q339Sql,
    "q340_greedy_cover"     -> Relational49.q340Sql,
    "q341_diff_compose"     -> Relational50.q341Sql,
    "q342_gc_plan"          -> Relational50.q342Sql,
    "q343_salted_distinct"  -> Relational51.q343Sql,
    "q344_kmv_frontier"     -> Relational51.q344Sql,
    "q345_fd_profile"       -> Relational51.q345Sql,
    "q346_sequence_support" -> Relational52.q346Sql,
    "q347_reconciliation"   -> Relational52.q347Sql,
    "q348_longest_streak"   -> Relational52.q348Sql,
    "q349_benford"          -> Relational53.q349Sql,
    "q350_inclusion_deps"   -> Relational53.q350Sql,
    "q351_assortativity"    -> Relational53.q351Sql,
    "q352_acf"              -> Relational54.q352Sql,
    "q353_fifo_containers"  -> Relational54.q353Sql,
    "q354_pk_discovery"     -> Relational54.q354Sql,
    "q355_tree_rollup"      -> Relational55.q355Sql,
    "q356_dhondt"           -> Relational55.q356Sql,
    "q357_rrf_fusion"       -> Relational55.q357Sql,
    "q358_theil_sen"        -> Relational56.q358Sql,
    "q359_mad_outliers"     -> Relational56.q359Sql,
    "q360_sssp_minplus"     -> Relational56.q360Sql,
    "q361_graftsource_pushdown" -> Relational57.q361Sql,
    "q362_stream_histogram" -> graft.streaming.Streaming.q362Sql,
    "q363_kendall_tau"      -> Relational58.q363Sql,
    "q364_rule_attribution" -> Relational58.q364Sql,
    "q365_loo_ablation"     -> Relational58.q365Sql,
    "q366_kaplan_meier"     -> Relational59.q366Sql,
    "q367_max_drawdown"     -> Relational59.q367Sql,
    "q368_kcore_peel"       -> Relational59.q368Sql,
    "q87_repetition"        -> TextQueries.q87Sql,
    "q88_seq_pack"          -> TextQueries.q88Sql,
    "q89_stream_static"     -> graft.streaming.Streaming.q89Sql,
    "q90_cdc_upsert"        -> Relational5.q90Sql,
    // exact-join contract; the bloom prefilter is a pass-through
    // optimization (false positives die in the join, false negatives
    // are impossible), so the oracle is bloom-free.
    "q91_bloom_decontaminate" -> Dedup.q91Sql,
    "q92_zorder_layout"     -> Relational5.q92Sql,
    "q93_chunk_overlap"     -> TextQueries.q93Sql,
    "q94_bigram_counts"     -> TextQueries.q94Sql,
    "q95_distribution_drift" -> Relational5.q95Sql,
    // the state-v2 sessionizer implements the same contract as
    // q39/q40 — one gap-sessionization oracle covers all three forms.
    "q96_tws_sessionize"    -> graft.streaming.Sessionize.q39Sql,
    "q97_stream_outer_join" -> graft.streaming.Streaming.q97Sql,
    "q98_variant_ops"       -> Relational5.q98Sql,
    "q99_observe_metrics"   -> Relational5.q99Sql,
    "q100_mixture_weights"  -> Relational6.q100Sql,
    "q101_transitions"      -> Relational6.q101Sql,
    "q102_prefix_simjoin"   -> Dedup.q102Sql,
    "q103_heavy_hitters"    -> Relational6.q103Sql,
    "q104_split_leakage"    -> Dedup.q104Sql,
    "q105_budget_sample"    -> TextQueries.q105Sql,
    "q106_retention"        -> Relational6.q106Sql,
    "q107_append_window"    -> graft.streaming.Streaming.q107Sql,
    "q108_outlier_audit"    -> Relational6.q108Sql,
    "q109_scd2_intervals"   -> Relational7.q109Sql,
    "q110_char_entropy"     -> TextQueries.q110Sql,
    "q111_schema_drift_union" -> Relational7.q111Sql,
    "q112_value_windows"    -> Relational7.q112Sql,
    "q113_winsorize"        -> Relational7.q113Sql,
    "q114_hll_merge_bounds" -> Relational7.q114Sql,
    "q115_history_pack"     -> Relational7.q115Sql,
    "q116_bucketed_join"    -> Relational7.q116Sql,
    "q117_cms_bounds"       -> Relational8.q117Sql,
    "q118_lateral_topk"     -> Relational8.q118Sql,
    "q119_khop_reach"       -> Dedup.q119Sql,
    "q120_session_window"   -> graft.streaming.Sessionize.q120Sql,
    "q121_linear_trend"     -> Relational8.q121Sql,
    "q122_inverted_index"   -> Relational8.q122Sql,
    "q123_bm25"             -> Relational8.q123Sql,
    "q124_triangles"        -> GraphQueries.q124Sql,
    "q125_pagerank_exact"   -> GraphQueries.q125Sql,
    "q126_approx_pctl_bounds" -> Relational8.q126Sql,
    "q127_kmv_distinct"     -> Relational8.q127Sql,
    "q128_update_mode"      -> graft.streaming.Streaming.q128Sql,
    "q129_file_metadata"    -> Formats.q129Sql,
    "q130_dedup_apply"      -> Dedup.q130Sql,
    "q131_snapshot_diff"    -> Relational5.q131Sql,
    "q132_lsh_precision"    -> Dedup.q132Sql,
    "q133_cross_correlation" -> Relational8.q133Sql,
    "q134_ordered_funnel"   -> Relational8.q134Sql,
    "q135_local_supplier"   -> Relational9.q135Sql,
    "q136_ivm_merge"        -> Relational9.q136Sql,
    "q137_bpe_pairs"        -> Relational9.q137Sql,
    "q138_market_share"     -> Relational9.q138Sql,
    "q139_checksum_diff"    -> Relational9.q139Sql,
    "q140_partition_pruning" -> Relational9.q140Sql,
    "q141_equidepth_bins"   -> Relational9.q141Sql,
    "q142_concurrency_gauge" -> Relational9.q142Sql,
    "q143_bpe_merge_round"  -> Relational9.q143Sql,
    "q144_stream_ivm"       -> graft.streaming.Streaming.q144Sql,
    "q145_grouped_split"    -> Dedup.q145Sql,
    "q146_pq_adc"           -> Similarity.q146Sql,
    "q147_band_join"        -> Relational10.q147Sql,
    "q148_merge_upsert"     -> Relational10.q148Sql,
    "q149_sliding_distinct" -> Relational10.q149Sql,
    "q150_kmv_setops"       -> Relational10.q150Sql,
    "q151_interpolate"      -> Relational10.q151Sql,
    "q152_chi_square"       -> Relational10.q152Sql,
    "q153_constraint_audit" -> Relational10.q153Sql,
    "q154_skyline"          -> Relational11.q154Sql,
    "q155_grid_join"        -> Relational11.q155Sql,
    "q156_weighted_sample"  -> Relational11.q156Sql,
    "q157_welch_ttest"      -> Relational11.q157Sql,
    "q158_basket_lift"      -> Relational11.q158Sql,
    "q159_purged_split"     -> Relational12.q159Sql,
    "q160_group_norm"       -> Relational12.q160Sql,
    "q161_curriculum"       -> Relational12.q161Sql,
    "q162_mixture_reweight" -> Relational12.q162Sql,
    "q163_ewma"             -> Relational12.q163Sql,
    "q164_attribution"      -> Relational13.q164Sql,
    "q165_pmi"              -> Relational13.q165Sql,
    "q166_calibration"      -> Relational13.q166Sql,
    "q167_zone_map"         -> Relational13.q167Sql,
    "q168_ooo_audit"        -> Relational13.q168Sql,
    "q169_boilerplate"      -> Relational14.q169Sql,
    "q170_rfm"              -> Relational14.q170Sql,
    "q171_paths"            -> Relational14.q171Sql,
    "q172_pit_features"     -> Relational14.q172Sql,
    "q173_moments"          -> Relational14.q173Sql,
    "q174_watermark_replay" -> graft.streaming.Streaming.q174Sql,
    "q175_cogroup"          -> Relational15.q175Sql,
    "q176_islands"          -> Relational15.q176Sql,
    "q177_twap"             -> Relational15.q177Sql,
    "q178_dwell_times"      -> Relational16.q178Sql,
    "q179_cusum"            -> Relational16.q179Sql,
    "q180_shipping_priority" -> Relational16.q180Sql,
    "q181_conversion_deadline" -> Relational16.q181Sql,
    "q182_seasonality"      -> Relational17.q182Sql,
    "q183_knn_eval"         -> Relational17.q183Sql,
    "q184_negative_sampling" -> Relational17.q184Sql,
    "q185_psi"              -> Relational17.q185Sql,
    "q186_binary_source"    -> Formats.q186Sql,
    "q187_text_source"      -> Formats.q187Sql,
    "q188_csv_expr"         -> Formats.q188Sql,
    "q189_dynamic_overwrite" -> Formats.q189Sql,
    "q190_mapgroups_sessions" -> Relational18.q190Sql,
    "q191_range_layout"     -> Relational18.q191Sql,
    "q192_large_volume"     -> Relational19.q192Sql,
    "q193_supplier_count"   -> Relational19.q193Sql,
    "q194_stream_join_disorder" -> graft.streaming.Streaming.q194Sql,
    "q195_stream_outer_disorder" -> graft.streaming.Streaming.q195Sql,
    "q196_waiting_supplier" -> Relational19.q196Sql,
    "q197_freq_sketch"      -> Relational20.q197Sql,
    "q198_bitemporal"       -> Relational20.q198Sql,
    "q199_stream_full_outer_disorder" -> graft.streaming.Streaming.q199Sql,
    "q200_dynamic_pruning"  -> Relational20.q200Sql,
    "q201_runtime_filter"   -> Relational20.q201Sql,
    "q202_corrupt_records"  -> Relational21.q202Sql,
    "q203_codec_roundtrip"  -> Relational21.q203Sql,
    "q204_nullsafe_join"    -> Relational21.q204Sql,
    "q205_restart_replay"   -> graft.streaming.Streaming.q205Sql,
    "q206_join_then_window" -> graft.streaming.Streaming.q206Sql,
    "q225_window_rollup"    -> graft.streaming.Streaming.q225Sql,
    "q226_state_introspect" -> graft.streaming.Streaming.q226Sql,
    "q227_stream_sketch"    -> graft.streaming.Streaming.q227Sql,
    "q228_stream_dead_letter" -> graft.streaming.Streaming.q228Sql,
    "q229_ivf_pq"          -> Similarity.q229Sql,
    "q230_kcenter_coreset" -> Similarity.q230Sql,
    "q231_incremental_assign" -> Dedup.q231Sql,
    "q232_truncation_recall" -> Similarity.q232Sql,
    "q233_stream_topk"     -> graft.streaming.Streaming.q233Sql,
    "q234_retention_policy" -> Dedup.q234Sql,
    "q235_ivf_balance"     -> Similarity.q235Sql,
    "q236_bitmap_setops"   -> Relational24.q236Sql,
    "q237_stream_bitmap"   -> graft.streaming.Streaming.q237Sql,
    "q238_weighted_sample" -> Relational25.q238Sql,
    "q239_containment_join" -> Dedup.q239Sql,
    "q240_range_frame"     -> Relational25.q240Sql,
    "q241_stream_ann_serve" -> Similarity.q241Sql,
    "q242_pagerank"        -> Relational25.q242Sql,
    "q243_unigram_surprise" -> TextQueries.q243Sql,
    "q244_systematic_resample" -> TextQueries.q244Sql,
    "q245_schema_evolution" -> Formats.q245Sql,
    "q246_covariance"      -> Similarity.q246Sql,
    "q247_k_anonymity"     -> Relational26.q247Sql,
    "q248_edit_join"       -> Relational26.q248Sql,
    "q249_hilbert_layout"  -> Relational26.q249Sql,
    "q250_stream_ewma"     -> graft.streaming.Streaming.q250Sql,
    "q251_rle_runs"        -> Relational27.q251Sql,
    "q252_seq_motif"       -> Relational27.q252Sql,
    "q253_bpe_encode"      -> Relational27.q253Sql,
    "q254_join_stats"      -> Relational27.q254Sql,
    "q255_record_linkage"  -> Relational28.q255Sql,
    "q256_skew_audit"      -> Relational28.q256Sql,
    "q257_sampling_audit"  -> Relational28.q257Sql,
    "q258_stream_alerts"   -> graft.streaming.Streaming.q258Sql,
    "q259_gdpr_cascade"    -> Relational29.q259Sql,
    "q260_deletion_vectors" -> Relational29.q260Sql,
    "q261_optimize_plan"   -> Relational30.q261Sql,
    "q262_mv_routing"      -> Relational30.q262Sql,
    "q263_allocation"      -> Relational30.q263Sql,
    "q264_data_recipe"     -> TextQueries.q264Sql,
    "q265_dedup_roi"       -> Dedup.q265Sql,
    "q266_stream_map_state" -> graft.streaming.Streaming.q266Sql,
    "q267_stream_last_k"   -> graft.streaming.Streaming.q267Sql,
    "q268_xml_roundtrip"   -> Formats.q268Sql,
    "q269_shuffle_quality" -> Relational30.q269Sql,
    "q207_dynamic_gap"      -> graft.streaming.Sessionize.q207Sql,
    "q208_stream_asof"      -> graft.streaming.Streaming.q208Sql,
    "q209_cdc_deletes"      -> Relational21.q209Sql,
    "q210_range_join_rule"  -> Relational22.q210Sql,
    "q211_mincost_supplier" -> Relational23.q211Sql,
    "q212_important_parts"  -> Relational23.q212Sql,
    "q213_custdist"         -> Relational23.q213Sql,
    "q214_smallqty_revenue" -> Relational23.q214Sql,
    "q215_qualified_suppliers" -> Relational23.q215Sql,
    "q216_rich_inactive"    -> Relational23.q216Sql,
    "q217_volume_shipping"  -> Relational23.q217Sql,
    "q218_disjunctive_rev"  -> Relational23.q218Sql,
    "q219_ts_range_join_rule" -> Relational22.q219Sql,
    "q220_product_profit"   -> Relational24.q220Sql,
    "q221_returned_items"   -> Relational24.q221Sql,
    "q222_promo_share"      -> Relational24.q222Sql,
    "q223_top_supplier"     -> Relational24.q223Sql,
    "q224_sketch_rollup"    -> Relational24.q224Sql,
  )
}
