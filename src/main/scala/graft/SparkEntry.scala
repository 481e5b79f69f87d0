package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * `queries` maps each implemented SURVEY §2 operator to a DataFrame
  * program over `/root/testdata/sf*`; `oracleSql` holds the DuckDB twin
  * the driver hash-compares against.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    PortfolioQueries.overview(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q01_current_qty"      -> (PortfolioQueries.currentQty _),
    "q02_positions"        -> (PortfolioQueries.positions _),
    "q03_cash_balance"     -> (PortfolioQueries.cashBalance _),
    "q04_latest_prices"    -> (PortfolioQueries.latestPrices _),
    "q05_avg_cost"         -> (PortfolioQueries.avgCost _),
    "q06_realized_pnl"     -> (PortfolioQueries.realizedPnl _),
    "q07_overview"         -> (PortfolioQueries.overview _),
    "q08_price_panel"      -> (DashboardQueries.q08PricePanel _),
    "q09_position_series"  -> (DashboardQueries.q09PositionSeries _),
    "q10_cash_series"      -> (DashboardQueries.q10CashSeries _),
    "q11_twr_index"        -> (DashboardQueries.q11TwrIndex _),
    "q12_benchmark_rebase" -> (DashboardQueries.q12BenchmarkRebase _),
    "q13_universe_search"  -> (SearchQueries.q13UniverseSearch _),
    "q14_etl_dedup_load"   -> (EtlQueries.q14EtlDedupLoad _),
    "q15_unrealized_totals" -> (PortfolioQueries.unrealizedTotals _),
    "q16_pricing_summary"  -> (AnalyticsQueries.q16PricingSummary _),
    "q17_top_customers"    -> (AnalyticsQueries.q17TopCustomers _),
    "q18_sessionize"       -> (EventsQueries.q18Sessionize _),
    "q19_json_extract"     -> (EventsQueries.q19JsonExtract _),
    "q20_dedup_exact"        -> (PipelineQueries.q20DedupExact _),
    "q21_dedup_ngram_jaccard" -> (PipelineQueries.q21NgramJaccard _),
    "q22_dedup_minhash_lsh"  -> (PipelineQueries.q22MinhashLsh _),
    "q23_dedup_simhash"      -> (PipelineQueries.q23Simhash _),
    "q24_ann_bruteforce"     -> (PipelineQueries.q24AnnBruteForce _),
    "q25_ann_ivf"            -> (PipelineQueries.q25AnnIvf _),
    "q26_text_stats"         -> (PipelineQueries.q26TextStats _),
    "q27_doc_fingerprint"    -> (PipelineQueries.q27DocFingerprint _),
    "q28_multimodal_decode"  -> (PipelineQueries.q28MultimodalDecode _),
    "q29_frame_sample"       -> (PipelineQueries.q29FrameSample _),
    "q30_stream_tumbling"    -> (graft.streaming.StreamingQueries.q30StreamTumbling _),
    "q31_stream_dedup_merge" -> (graft.streaming.StreamingQueries.q31StreamDedupMerge _),
    "q32_rollup"             -> (AnalyticsQueries.q32Rollup _),
    "q33_percentiles"        -> (AnalyticsQueries.q33Percentiles _),
    "q34_histogram"          -> (AnalyticsQueries.q34Histogram _),
    "q35_window_funcs"       -> (AnalyticsQueries.q35WindowFuncs _),
    "q36_stats_envelope"     -> (AnalyticsQueries.q36StatsEnvelope _),
    "q37_stream_user_stats"  -> (graft.streaming.StreamingQueries.q37StreamUserStats _),
    "q38_asof_join"          -> (EventsQueries.q38AsofJoin _),
    "q39_dedup_ngram_capped" -> (PipelineQueries.q39NgramJaccardCapped _),
    "q40_universe_csv"       -> (SourceQueries.q40UniverseCsv _),
    "q41_price_sink_roundtrip" -> (SourceQueries.q41PriceSinkRoundtrip _),
    "q42_latest_fallback"    -> (SourceQueries.q42LatestFallback _),
    "q43_salted_sum"         -> (SourceQueries.q43SaltedSum _),
    "q44_bucketed_join"      -> (SourceQueries.q44BucketedJoin _),
    "q45_stream_sessionize"  -> (graft.streaming.StreamingQueries.q45StreamSessionize _),
    "q46_embedding_neardup"  -> (PipelineQueries.q46EmbeddingNearDup _),
    "q47_asof_native"        -> (EventsQueries.q47AsofNative _),
    "q48_dedup_clusters"     -> (PipelineQueries.q48DedupClusters _),
    "q49_stratified_sample"  -> (PipelineQueries.q49StratifiedSample _),
    "q50_merge_upsert"       -> (EtlQueries.q50MergeUpsert _),
    "q51_corpus_curation"    -> (PipelineQueries.q51CorpusCuration _),
    "q52_stream_interval_join" -> (graft.streaming.StreamingQueries.q52StreamIntervalJoin _),
    "q53_stream_dedup"       -> (graft.streaming.StreamingQueries.q53StreamDedup _),
    "q54_json_source"        -> (SourceQueries.q54JsonSource _),
    "q55_vocabulary"         -> (PipelineQueries.q55Vocabulary _),
    "q56_session_window"     -> (EventsQueries.q56SessionWindow _),
    "q57_cms_event_counts"   -> (AnalyticsQueries.q57CmsEventCounts _),
    "q58_variant_json"       -> (EventsQueries.q58VariantJson _),
    "q59_dedup_clusters_star" -> (PipelineQueries.q59DedupClustersStar _),
    "q60_stream_outer_interval_join" -> (graft.streaming.StreamingQueries.q60StreamOuterIntervalJoin _),
    "q61_range_join_bucketed" -> (EventsQueries.q61RangeJoinBucketed _),
    "q62_shard_write"        -> (SourceQueries.q62ShardWrite _),
    "q63_chunk_windows"      -> (PipelineQueries.q63ChunkWindows _),
    "q64_token_packing"      -> (PipelineQueries.q64TokenPacking _),
    "q65_simhash_pairs"      -> (PipelineQueries.q65SimhashPairs _),
    "q66_repetition_stats"   -> (PipelineQueries.q66RepetitionStats _),
    "q67_cms_heavy_hitters"  -> (AnalyticsQueries.q67CmsHeavyHitters _),
    "q68_stream_session_window" -> (graft.streaming.StreamingQueries.q68StreamSessionWindow _),
    "q69_ship_priority"      -> (AnalyticsQueries.q69ShipPriority _),
    "q70_regional_revenue"   -> (AnalyticsQueries.q70RegionalRevenue _),
    "q71_stream_static_join" -> (graft.streaming.StreamingQueries.q71StreamStaticJoin _),
    "q72_bitmap_distinct"    -> (AnalyticsQueries.q72BitmapDistinct _),
    "q73_stream_sliding_window" -> (graft.streaming.StreamingQueries.q73StreamSlidingWindow _),
    "q74_pq_topk"            -> (PipelineQueries.q74PqTopK _),
    "q75_ivf_trained"        -> (PipelineQueries.q75IvfTrained _),
    "q76_zorder_layout"      -> (SourceQueries.q76ZorderLayout _),
    "q77_scd2_history"       -> (EtlQueries.q77Scd2History _),
    "q78_bloom_join"         -> (AnalyticsQueries.q78BloomJoin _),
    "q79_hist_quantiles"     -> (AnalyticsQueries.q79HistQuantiles _),
    "q80_orc_source"         -> (SourceQueries.q80OrcSource _),
    "q81_stream_semi_join"   -> (graft.streaming.StreamingQueries.q81StreamSemiJoin _),
    "q82_weighted_sample"    -> (PipelineQueries.q82WeightedSample _),
    "q83_cube"               -> (AnalyticsQueries.q83Cube _),
    "q84_funnel"             -> (EventsQueries.q84Funnel _),
    "q85_table_diff"         -> (EtlQueries.q85TableDiff _),
    "q86_salted_join"        -> (SourceQueries.q86SaltedJoin _),
    "q87_schema_evolution"   -> (SourceQueries.q87SchemaEvolution _),
    "q88_rolling_window"     -> (EventsQueries.q88RollingWindow _),
    "q89_dpp_join"           -> (SourceQueries.q89DppJoin _),
    "q90_stream_full_outer_join" -> (graft.streaming.StreamingQueries.q90StreamFullOuterJoin _),
    "q91_jpeg_meta"          -> (PipelineQueries.q91JpegMeta _),
    "q92_pii_redaction"      -> (PipelineQueries.q92PiiRedaction _),
    "q93_url_canonicalize"   -> (PipelineQueries.q93UrlCanonicalize _),
    "q94_chained_windows"    -> (graft.streaming.StreamingQueries.q94ChainedWindows _),
    "q95_aqe_skew_join"      -> (SourceQueries.q95AqeSkewJoin _),
    "q96_cdc_apply"          -> (EtlQueries.q96CdcApply _),
    "q97_compaction"         -> (SourceQueries.q97Compaction _),
    "q98_manifest_skipping"  -> (SourceQueries.q98ManifestSkipping _),
    "q99_incremental_agg"    -> (EtlQueries.q99IncrementalAgg _),
    "q100_int8_quant"        -> (PipelineQueries.q100Int8Quant _),
    "q101_mp4_meta"          -> (PipelineQueries.q101Mp4Meta _),
    "q102_stream_cdc_apply"  -> (graft.streaming.StreamingQueries.q102StreamCdcApply _),
    "q103_inverted_index"    -> (SearchQueries.q103InvertedIndex _),
    "q104_bm25_topk"         -> ((s, d) => SearchQueries.q104Bm25TopK(s, d)),
    "q105_dq_audit"          -> (QualityQueries.q105DqAudit _),
    "q106_fuzzy_join"        -> (QualityQueries.q106FuzzyJoin _),
    "q107_large_orders"      -> (AnalyticsQueries.q107LargeOrders _),
    "q108_blocking_suppliers" -> (AnalyticsQueries.q108BlockingSuppliers _),
    "q109_sql_bridge"        -> (AnalyticsQueries.q109SqlBridge _),
    "q110_ttl_cache"         -> (SourceQueries.q110TtlCache _),
    "q111_pit_join"          -> (EventsQueries.q111PitJoin _),
    "q112_feature_matrix"    -> (PipelineQueries.q112FeatureMatrix _),
    "q113_attribution"       -> (EventsQueries.q113Attribution _),
    "q114_retention_cohorts" -> (EventsQueries.q114RetentionCohorts _),
    "q115_pagerank"          -> (AnalyticsQueries.q115PageRank _),
    "q116_market_basket"     -> (AnalyticsQueries.q116MarketBasket _),
    "q117_decontamination"   -> (PipelineQueries.q117Decontamination _),
    "q118_trend_slope"       -> (AnalyticsQueries.q118TrendSlope _),
    "q119_statestore_read"   -> (graft.streaming.StreamingQueries.q119StateStoreRead _),
    "q120_transform_with_state" -> (graft.streaming.StreamingQueries.q120TransformWithState _),
    "q121_correlated_subquery" -> (AnalyticsQueries.q121CorrelatedSubquery _),
    "q122_grouping_sets"     -> (AnalyticsQueries.q122GroupingSets _),
    "q123_pcm_decode"        -> (PipelineQueries.q123PcmDecode _),
    "q124_incremental_dedup" -> (PipelineQueries.q124IncrementalDedup _),
    "q125_ivf_persisted"     -> (PipelineQueries.q125IvfPersisted _),
    "q126_global_threshold"  -> (AnalyticsQueries.q126GlobalThreshold _),
    "q127_hll_contract"      -> (AnalyticsQueries.q127HllContract _),
    "q128_rank_distribution" -> (AnalyticsQueries.q128RankDistribution _),
    "q129_nested_decorrelation" -> (AnalyticsQueries.q129NestedDecorrelation _),
    "q130_dormant_segments"  -> (AnalyticsQueries.q130DormantSegments _),
    "q131_filtered_agg"      -> (AnalyticsQueries.q131FilteredAgg _),
    "q132_recursive_spine"   -> (AnalyticsQueries.q132RecursiveSpine _),
    "q133_approx_percentile_contract" -> (AnalyticsQueries.q133ApproxPercentileContract _),
    "q134_oov_rate"          -> (PipelineQueries.q134OovRate _),
    "q135_phrase_search"     -> (SearchQueries.q135PhraseSearch _),
    "q136_rolling_distinct"  -> (AnalyticsQueries.q136RollingDistinct _),
    "q137_topk_per_group"    -> (AnalyticsQueries.q137TopkPerGroup _),
    "q138_scd2_apply"        -> (EtlQueries.q138Scd2Apply _),
    "q139_triangle_count"    -> (AnalyticsQueries.q139TriangleCount _),
    "q140_audience_overlap"  -> (AnalyticsQueries.q140AudienceOverlap _),
    "q141_dead_letter"       -> (SourceQueries.q141DeadLetter _),
    "q142_train_eval_split"  -> (PipelineQueries.q142TrainEvalSplit _),
    "q143_bloom_skipping"    -> (SourceQueries.q143BloomSkipping _),
    "q144_growth_accounting" -> (AnalyticsQueries.q144GrowthAccounting _),
    "q145_islands_gaps"      -> (AnalyticsQueries.q145IslandsGaps _),
    "q146_skyline"           -> (AnalyticsQueries.q146Skyline _),
    "q147_sketch_rollup"     -> (AnalyticsQueries.q147SketchRollup _),
    "q148_set_ops"           -> (AnalyticsQueries.q148SetOps _),
    "q149_equi_depth"        -> (AnalyticsQueries.q149EquiDepth _),
    "q150_interval_overlap"  -> (AnalyticsQueries.q150IntervalOverlap _),
    "q151_targeted_delete"   -> (SourceQueries.q151TargetedDelete _),
    "q152_regional_revenue"  -> (AnalyticsQueries.q152RegionalRevenue _),
    "q153_market_share"      -> (AnalyticsQueries.q153MarketShare _),
    "q154_k_anonymity"       -> (AnalyticsQueries.q154KAnonymity _),
    "q155_late_dim_repair"   -> (EtlQueries.q155LateDimRepair _),
    "q156_time_weighted_avg" -> (EventsQueries.q156TimeWeightedAvg _),
    "q157_evolved_store"     -> (SourceQueries.q157EvolvedRead _),
    "q158_store_vacuum"      -> (SourceQueries.q158StoreVacuum _),
    "q159_min_cost_supplier" -> (AnalyticsQueries.q159MinCostSupplier _),
    "q160_sole_problem_supplier" -> (AnalyticsQueries.q160SoleProblemSupplier _),
    "q161_runtime_filter_join" -> (AnalyticsQueries.q161RuntimeFilterJoin _),
    "q162_global_rank"       -> (AnalyticsQueries.q162GlobalRank _),
    "q163_trade_validation"  -> (QualityQueries.q163TradeValidation _),
    "q164_adaptive_read"     -> (SourceQueries.q164AdaptiveRead _),
    "q165_substring_dedup"   -> (PipelineQueries.q165SubstringDedup _),
    "q166_substring_removal" -> (PipelineQueries.q166SubstringRemoval _),
    "q167_bpe_tokens"        -> (PipelineQueries.q167BpeTokens _),
    "q168_bpe_packing"       -> (PipelineQueries.q168BpePacking _),
  )

  /** Registry sink annotation: queries whose `count()` timing is a
    * structural fiction because Catalyst prunes the work the query
    * exists to do — a cardinality-preserving transform whose computed
    * columns fold away under count (q166's left-join removal, q92/q93's
    * redaction exprs, q26's text stats, q100/q101's decode projections,
    * q38's as-of value column, q103's postings arrays) or an aggregate
    * whose agg expressions prune to a bare group count (q32 rollup,
    * q133's percentile pair). `graft.Bench` times these through the
    * noop sink (full materialization of every output column, nothing
    * written) and stamps the artifact's per-query `sinks` map, so the
    * honest number lives in BENCH_rN itself rather than a side probe.
    * Membership criterion (audited r12, bench/probe_r12_noop_audit_
    * sf01.json): noop/count ratio >= ~2.5 with a structural pruning
    * mechanism, or structurally obvious at any ratio (q93). Everything
    * else is honest under count() — verified by the same audit (total
    * 181.2 noop vs 178.5 count over the other 156 queries).
    * Borderline, decided and closed: q16_pricing_summary measured 2.4x
    * in the refreshed r13 audit (bench/probe_r13_noop_audit_sf01.json,
    * noop 0.98 s) — under the 2.5x bar and its agg exprs are the
    * query, not a prunable projection, so it stays on count(); do not
    * re-derive. */
  val noopSink: Set[String] = Set(
    "q26_text_stats",                  // 6.1x: per-row text stats pruned
    "q32_rollup",                      // 3.1x: rollup agg exprs prune to group count
    "q38_asof_join",                   // 3.0x: as-of value column unused by count
    "q92_pii_redaction",               // 8.8x: redaction exprs pruned
    "q93_url_canonicalize",            // 2.2x, structural: canonicalization pruned
    "q100_int8_quant",                 // 2.7x: quantization projection pruned
    "q101_mp4_meta",                   // 2.8x: box-walk decode pruned
    "q103_inverted_index",             // 3.0x: postings collect_list pruned
    "q133_approx_percentile_contract", // 8.6x: percentile aggs prune to group count
    "q166_substring_removal")          // 8.8x: whole clean-text transform pruned

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted keys get a rows-only check. */
  def oracleSql: Map[String, String] =
    PortfolioQueries.oracle ++ DashboardQueries.oracle ++
      SearchQueries.oracle ++ EtlQueries.oracle ++ AnalyticsQueries.oracle ++
      EventsQueries.oracle ++ PipelineQueries.oracle ++
      SourceQueries.oracle ++ graft.streaming.StreamingQueries.oracle ++
      QualityQueries.oracle

  /** Independent SCALABLE oracle twins for queries whose primary twins
    * are deliberately naive formulations that exceed the compare
    * timeout at sf1+ volume. Each entry is validated row-identical
    * against its primary twin at the largest scale where both finish;
    * the sf1 sweep (tools/compare_each.py with COMPARE_SCALABLE=1)
    * prefers these. The primary map stays the graded oracle at sf0.01. */
  def oracleSqlScalable: Map[String, String] = QualityQueries.oracleScalable
}
