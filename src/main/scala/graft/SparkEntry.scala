package graft

import scala.collection.immutable.ListMap
import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.ops._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every implemented operator from SURVEY.md §2 gets a named query here;
  * each query with SQL-expressible semantics also gets a DuckDB oracle in
  * [[oracleSql]] with IDENTICAL output column names and ordering (the
  * driver sorts columns by name and hash-compares values).
  */
object SparkEntry {
  type Q = (SparkSession, String) => DataFrame

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Flagship.revenueTop3PerRegion(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, Q] = ListMap(
    "q01_pricing_summary"   -> (Relational.pricingSummary _),
    "q02_scan_project"      -> (Relational.scanProject _),
    "q03_filter_predicates" -> (Relational.filterPredicates _),
    "q04_topk_orders"       -> (Relational.topkOrders _),
    "q05_distinct"          -> (Relational.distinctFlags _),
    "q06_join_equi"         -> (Relational.joinEqui _),
    "q07_join_broadcast_dims" -> (Relational.joinBroadcastDims _),
    "q08_join_semi"         -> (Relational.joinSemi _),
    "q09_join_anti"         -> (Relational.joinAnti _),
    "q10_join_outer"        -> (Relational.joinOuter _),
    "q00_flagship"          -> ((s: SparkSession, d: String) => Flagship.revenueTop3PerRegion(s, d)),
    "q11_join_theta"        -> (Grouping.joinTheta _),
    "q12_join_asof"         -> (AsOf.purchaseLastClick _),
    "q13_set_union"         -> (SetOps.unionBuyers _),
    "q14_set_intersect"     -> (SetOps.intersectBuyers _),
    "q15_set_except"        -> (SetOps.exceptBuyers _),
    "q16_rollup"            -> (Grouping.rollupPricing _),
    "q17_cube"              -> (Grouping.cubePricing _),
    "q18_grouping_sets"     -> (Grouping.groupingSetsPricing _),
    "q19_count_distinct"    -> (Grouping.countDistinctPerFlag _),
    "q20_window_rank"       -> (Windows.topOrdersPerCustomer _),
    "q21_window_running"    -> (Windows.runningRevenuePerSupplier _),
    "q22_window_lag_lead"   -> (Windows.orderPriceLagLead _),
    "q23_string_funcs"      -> (Funcs.stringFuncs _),
    "q24_date_funcs"        -> (Funcs.dateFuncs _),
    "q25_math_funcs"        -> (Funcs.mathFuncs _),
    "q26_array_funcs"       -> (Funcs.arrayFuncs _),
    "q27_json_funcs"        -> (Funcs.jsonFuncs _),
    "q28_events_tumbling"   -> (Events.tumbling _),
    "q29_events_sliding"    -> (Events.sliding _),
    "q30_events_session"    -> (Events.sessions _),
    "q31_sanitize"          -> ((s: SparkSession, d: String) =>
      graft.etl.Sanitize.sanitizeEvents(Tables.events(s, d))
        .select("event_id", "k_val", "props_canonical", "value")
        .orderBy("event_id")),
    "q32_transfer_roundtrip" -> (graft.etl.Transfer.roundTripChecksum _),
    "q33_dedup_exact"       -> (Dedup.exactDedup _),
    "q34_cosine_topk"       -> ((s: SparkSession, d: String) => Similarity.cosineTopK(s, d)),
    "q35_text_quality"      -> (TextAnalysis.qualityStats _),
    "q36_text_langid"       -> (TextAnalysis.langId _),
    "q37_token_counts"      -> (TextAnalysis.tokenCounts _),
    "q38_fingerprints"      -> (TextAnalysis.fingerprints _),
    "q39_multimodal"        -> (graft.multimodal.Multimodal.mediaFeatures _),
    "q40_centroids"         -> (Similarity.centroids _),
    "q41_dedup_minhash"     -> (Dedup.minhashNearDups _),
    "q42_dedup_simhash"     -> (Dedup.simhashBandMoments _),
    "q43_ann_buckets"       -> ((s: SparkSession, d: String) => Similarity.annBuckets(s, d)),
    "q44_embed_neardup"     -> ((s: SparkSession, d: String) => Similarity.embeddingNearDups(s, d)),
    "q45_sql_subqueries"    -> (SqlSurface.maxQuantityLineitems _),
    "q46_ivf_cells"         -> ((s: SparkSession, d: String) =>
      Ivf.detCellSummary(s, d)),
    "q47_percentiles"       -> (Grouping.percentiles _),
    "q48_pivot"             -> (Grouping.pivotFlags _),
    "q49_shipping_priority" -> (Relational.shippingPriority _),
    "q50_winnow_fingerprints" -> (TextAnalysis.winnowSummary _),
    "q51_decontaminate"     -> ((s: SparkSession, d: String) => {
      import org.apache.spark.sql.functions.col
      // treat source src0 as the "eval set", the rest as the corpus
      val docs = Tables.documents(s, d)
      Decontaminate.contaminated(
          docs.filter(col("source") =!= "src0"),
          docs.filter(col("source") === "src0"), minShared = 2)
        .orderBy(col("doc_id"))
    }),
    "q52_conditional_aggs"  -> (Funcs.conditionalAggs _),
    "q53_unpivot"           -> (Funcs.unpivotFlags _),
    "q54_null_funcs"        -> (Funcs.nullFuncs _),
    "q55_langid_ngram"      -> (TextAnalysis.langIdNgram _),
    "q56_range_join"        -> (Relational.rangeJoinQuarters _),
    "q57_hll_sketch_rollup" -> (Grouping.hllSketchRollup _),
    "q58_join_full_outer"   -> (Relational.joinFullOuter _),
    "q59_window_range_frame" -> (Windows.trailingRevenuePerSupplier _),
    "q60_join_right_outer"  -> (Relational.joinRightOuter _),
    "q61_ann_multiprobe"    -> (Similarity.annMultiProbeTop10 _),
    "q62_stratified_sample" -> (Sampling.stratifiedDocSample _),
    "q63_incremental_exact" -> (Dedup.incrementalExactQuery _),
    "q64_pii_redaction"     -> (graft.etl.Sanitize.redactDocuments _),
    "q65_dedup_clusters"    -> (Similarity.embeddingClusters _),
    "q66_complex_types"     -> (Funcs.complexTypeFuncs _),
    "q67_regexp_funcs"      -> (Funcs.regexpFuncs _),
    "q68_merge_upsert"      -> (graft.etl.Transfer.upsertQuery _),
    "q69_frame_sample"      -> ((s: SparkSession, d: String) =>
      graft.multimodal.Multimodal.frameSampleSummary(s, d)),
    "q70_join_bucketed"     -> (Relational.joinBucketed _),
    "q71_ivf_search"        -> ((s: SparkSession, d: String) =>
      Ivf.deterministicSearch(s, d)),
    "q72_scd2_history"      -> (graft.etl.Transfer.scd2Query _),
    "q73_bm25"              -> ((s: SparkSession, d: String) => Ranking.bm25(s, d)),
    "q74_repetition"        -> (TextAnalysis.repetitionStats _),
    "q75_passage_dedup"     -> ((s: SparkSession, d: String) => Dedup.passageDedup(s, d)),
    "q76_sq_ann"            -> ((s: SparkSession, d: String) => Similarity.sqAnnTopK(s, d)),
    "q77_ngram_counts"      -> (Ranking.ngramQuery _),
    "q78_tfidf_keywords"    -> (Ranking.tfidfQuery _),
    "q79_pack_sequences"    -> (Ranking.packQuery _),
    "q80_window_dist"       -> (Windows.windowDistribution _),
    "q81_fuzzy_match"       -> ((s: SparkSession, d: String) =>
      Dedup.fuzzyNameMatches(s, d)),
    "q82_regional_revenue"  -> ((s: SparkSession, d: String) =>
      Flagship.regionalRevenue(s, d)),
    "q83_simhash_det"       -> (Dedup.simhashDetFingerprints _),
    "q84_kmv_sketch"        -> ((s: SparkSession, d: String) =>
      Grouping.kmvSketchRollup(s, d)),
    "q85_snapshot_cdc"      -> (graft.etl.Cdc.ordersChangeFeed _),
    "q86_lateral_topn"      -> (SqlSurface.lateralTopOrders _),
    "q87_gap_fill"          -> (TimeSeries.gapFillLocf _),
    "q88_concurrency"       -> (TimeSeries.dailyConcurrency _),
    "q89_group_split"       -> (Sampling.groupSplitDocs _),
    "q90_weighted_sample"   -> (Sampling.weightedDocSample _),
    "q91_cohort_retention"  -> (Behavior.cohortRetention _),
    "q92_funnel"            -> (Behavior.funnel _),
    "q93_transitions"       -> (Behavior.transitions _),
    "q94_outliers"          -> (Profiling.zscoreOutliers _),
    "q95_profile"           -> (Profiling.profileOrders _),
    "q96_histogram"         -> (Profiling.priceHistogram _),
    "q97_pareto"            -> (Profiling.paretoFrontier _),
    "q98_triangles"         -> ((s: SparkSession, d: String) =>
      Similarity.embeddingTriangles(s, d)),
    "q99_corr"              -> (Profiling.corrQuantityPrice _),
    "q100_winsorize"        -> (Profiling.winsorizedRevenue _),
    "q101_mode"             -> (Profiling.modeQuantity _),
    "q102_cusum"            -> (TimeSeries.cusumDrift _),
    "q103_benford"          -> (Profiling.benfordDigits _),
    "q104_contingency"      -> (Profiling.contingencyChi _),
    "q105_capped_balance"   -> (TimeSeries.cappedBalance _),
    "q106_balanced_mix"     -> ((s: SparkSession, d: String) =>
      Sampling.balancedSourceMix(s, d)),
    "q107_gini"             -> (Profiling.giniRevenue _),
    "q108_trend"            -> (Profiling.priceTrend _),
    "q109_histo_quantiles"  -> (Grouping.histogramQuantileRollup _),
    "q110_embed_standardize" -> ((s: SparkSession, d: String) =>
      Similarity.standardizedEmbeddings(s, d)),
    "q111_fd_check"         -> (Audit.fdCheck _),
    "q112_ri_audit"         -> (Audit.riAudit _),
    "q113_twap"             -> (TimeSeries.twap _),
    "q114_source_overlap"   -> (Dedup.sourceOverlap _),
    "q115_burstiness"       -> (TimeSeries.burstiness _),
    "q116_chunk_audit"      -> ((s: SparkSession, d: String) =>
      Audit.exportChunkAudit(s, d)),
    "q117_top_paths"        -> ((s: SparkSession, d: String) =>
      Behavior.topPaths(s, d)),
    "q118_event_throttle"   -> ((s: SparkSession, d: String) =>
      TimeSeries.eventThrottle(s, d)),
    "q119_substring_dedup"  -> (Dedup.substringDedupQuery _),
    "q120_window_novelty"   -> (Dedup.windowNoveltyQuery _),
    "q121_langid_confusion" -> (TextAnalysis.langidConfusionQuery _),
    "q122_ks_drift"         -> (Profiling.ksDrift _),
    "q123_pagerank"         -> (Similarity.pagerankQuery _),
    "q124_join_bucketed_cust" -> (Relational.joinBucketedCustomer _),
    "q125_tvd_drift"        -> (Profiling.tvdDrift _),
    "q126_setsim_join"      -> (Dedup.setSimNearDups _),
    "q127_vocab_profile"    -> (TextAnalysis.vocabProfileQuery _),
    "q128_mad_outliers"     -> (Profiling.madOutliers _),
    "q129_autocorrelation"  -> (TimeSeries.autocorrelation _),
    "q130_zorder_cells"     -> (Layout.zorderCells _),
    "q131_token_diversity"  -> (TextAnalysis.tokenDiversity _),
    "q132_incremental_stats" -> (Grouping.incrementalStats _),
    "q133_k_anonymity"      -> ((s: SparkSession, d: String) =>
      Audit.kAnonymity(s, d)),
    "q134_heavy_hitters"    -> (TextAnalysis.heavyHitters _),
    "q135_weighted_median"  -> (Profiling.weightedMedian _),
    "q136_abc_analysis"     -> (Profiling.abcAnalysis _),
    "q137_ship_latency"     -> (Relational.shipLatencyDist _),
    "q138_pii_audit"        -> (graft.etl.Sanitize.piiAudit _),
    "q139_join_skew"        -> ((s: SparkSession, d: String) =>
      Audit.joinSkewReport(s, d)),
    "q140_freshness"        -> (Audit.freshnessAudit _),
    "q141_session_overlap"  -> (TimeSeries.sessionOverlapDay _),
    "q142_overlap_bucketed" -> (TimeSeries.sessionOverlapBucketed _),
    "q143_gap_fill_capped"  -> ((s: SparkSession, d: String) =>
      TimeSeries.gapFillLocfCapped(s, d)),
    "q144_pair_density"     -> ((s: SparkSession, d: String) =>
      Similarity.pairDensityCurve(s, d)),
    "q145_semantic_dedup"   -> ((s: SparkSession, d: String) =>
      Ivf.semanticDedup(s, d)),
    "q146_dsir_select"      -> ((s: SparkSession, d: String) =>
      Sampling.dsirAffinitySelect(s, d)),
    "q147_shard_manifest"   -> ((s: SparkSession, d: String) =>
      Layout.shardManifestQuery(s, d)),
    "q148_temperature_mix"  -> (Sampling.temperatureMix _),
    "q149_fluency"          -> (Ranking.fluencyQuery _),
    "q150_semantic_dedup_incremental" -> ((s: SparkSession, d: String) =>
      Ivf.incrementalSemanticDedup(s, d)),
    "q151_filter_cascade"   -> (TextAnalysis.filterCascade _),
    "q152_curriculum_schedule" -> ((s: SparkSession, d: String) =>
      Sampling.curriculumSchedule(s, d)),
    "q153_training_order"   -> ((s: SparkSession, d: String) =>
      Layout.trainingOrder(s, d)),
    "q154_chunk_spans"      -> ((s: SparkSession, d: String) =>
      Layout.chunkSpans(s, d)),
    "q155_token_fertility"  -> (TextAnalysis.tokenFertility _),
    "q156_dedup_savings"    -> (Dedup.dedupSavings _),
    "q157_padding_waste"    -> ((s: SparkSession, d: String) =>
      Layout.paddingWaste(s, d)),
    "q158_l_diversity"      -> ((s: SparkSession, d: String) =>
      Audit.lDiversity(s, d)),
    "q159_dim_correlation"  -> ((s: SparkSession, d: String) =>
      Similarity.dimensionCorrelation(s, d)),
    "q160_large_orders"     -> ((s: SparkSession, d: String) =>
      Relational.largeOrderCustomers(s, d)),
    "q161_sole_late_supplier" -> ((s: SparkSession, d: String) =>
      Relational.soleLateSuppliers(s, d)),
    "q162_ewma_activity"    -> (TimeSeries.ewmaActivity _),
    "q163_self_repetition"  -> (Ranking.selfRepetition _),
    "q164_rrf_fusion"       -> ((s: SparkSession, d: String) =>
      Ranking.rrfFusion(s, d)),
    "q165_corpus_card"      -> (TextAnalysis.corpusCard _),
    "q166_cluster_sizes"    -> ((s: SparkSession, d: String) =>
      Similarity.clusterSizeProfile(s, d)),
    "q167_code_switching"   -> (TextAnalysis.codeSwitchScreen _),
    "q168_priority_audit"   -> ((s: SparkSession, d: String) =>
      Relational.orderPriorityAudit(s, d)),
    "q169_ann_recall"       -> ((s: SparkSession, d: String) =>
      Ivf.annRecallAudit(s, d)),
    // q170: the q157 audit's SCALE branch — per-shard length rank on
    // the q153 shard key (round-8 executable swap), oracle-replayed
    // with the same nShards parameter the way kSql replays autoK
    "q170_padding_waste_sharded" -> ((s: SparkSession, d: String) =>
      Layout.paddingWaste(s, d, nShards = 4)),
    // round-8 wave: eval hygiene + quantization/repetition planners
    "q171_cluster_split"    -> ((s: SparkSession, d: String) =>
      Sampling.clusterSplit(s, d)),
    "q172_fluency_terciles" -> (Ranking.fluencyTerciles _),
    "q173_eval_overlap"     -> (Decontaminate.evalOverlapScore _),
    "q174_sq_error"         -> (Similarity.sqErrorAudit _),
    "q175_epoch_budget"     -> ((s: SparkSession, d: String) =>
      TextAnalysis.epochBudget(s, d)),
    "q176_quantile_contract" -> ((s: SparkSession, d: String) =>
      Grouping.quantileContract(s, d)),
    "q177_click_attribution" -> ((s: SparkSession, d: String) =>
      AsOf.clickAttribution(s, d)),
    "q178_interval_union"   -> (TimeSeries.intervalUnion _),
    // round-9: the drift-family third member + interpolating resampler
    "q179_psi_drift"        -> ((s: SparkSession, d: String) =>
      Profiling.psiDrift(s, d)),
    "q180_linear_interp"    -> (TimeSeries.linearInterp _),
    // round-9 wave: containment dedup + selection/statistics planners
    "q181_containment_join" -> (Dedup.containmentNearDups _),
    "q182_budget_select"    -> ((s: SparkSession, d: String) =>
      Sampling.budgetSelect(s, d)),
    "q183_cdc_chunks"       -> (Layout.cdcChunks _),
    "q184_length_tail"      -> (Profiling.lengthTailProfile _),
    "q185_spearman"         -> (Profiling.spearman _),
    "q186_cell_medoids"     -> (Ivf.cellMedoids _),
    "q187_psi_daily"        -> ((s: SparkSession, d: String) =>
      Profiling.psiDriftDaily(s, d)),
    "q188_source_hhi"       -> (Profiling.sourceHhi _),
    "q189_oov_rate"         -> ((s: SparkSession, d: String) =>
      TextAnalysis.oovRate(s, d)),
    "q190_pii_cooccurrence" -> (graft.etl.Sanitize.piiCooccurrence _),
    "q191_containment_incremental" -> (Dedup.containmentIncrementalQuery _),
    "q192_minhash_accuracy" -> ((s: SparkSession, d: String) =>
      Dedup.minhashAccuracy(s, d)),
    "q193_budget_intake"    -> ((s: SparkSession, d: String) =>
      Sampling.budgetIntake(s, d)),
    "q194_split_leakage"    -> (Decontaminate.splitLeakage _),
    "q195_redaction_complete" -> (graft.etl.Sanitize.redactionComplete _),
    "q196_cluster_purity"   -> ((s: SparkSession, d: String) =>
      Similarity.clusterPurity(s, d)),
    "q197_truncation_waste" -> ((s: SparkSession, d: String) =>
      Layout.truncationWaste(s, d)),
    "q198_lang_mismatch"    -> (TextAnalysis.langMismatch _),
    "q199_key_skew_profile" -> ((s: SparkSession, d: String) =>
      Skew.keySkewProfile(s, d)),
    "q200_emb_outliers"     -> (Ivf.cellOutliers _),
    "q201_keep_best_dedup"  -> ((s: SparkSession, d: String) =>
      Similarity.keepBestDedup(s, d)),
    "q202_collocations"     -> ((s: SparkSession, d: String) =>
      TextAnalysis.collocations(s, d)),
    "q203_phash_dedup"      -> ((s: SparkSession, d: String) =>
      graft.multimodal.Multimodal.phashDedup(s, d)),
    "q204_phash_incremental" -> ((s: SparkSession, d: String) =>
      graft.multimodal.Multimodal.phashIncremental(s, d)),
    "q205_kappa_agreement"  -> (TextAnalysis.kappaAgreement _),
    "q206_jackknife"        -> ((s: SparkSession, d: String) =>
      Profiling.jackknifeLength(s, d)),
    "q207_bpe_pairs"        -> ((s: SparkSession, d: String) =>
      TextAnalysis.bpePairStats(s, d)),
    "q208_waterfill"        -> (Sampling.waterfillAlloc _),
    "q209_theil_sen"        -> (Profiling.theilSenTrend _),
    "q210_forget_audit"     -> ((s: SparkSession, d: String) =>
      Layout.forgetAudit(s, d)),
    "q211_source_affinity"  -> (Similarity.sourceCentroidAffinity _),
    "q212_shuffle_mix"      -> ((s: SparkSession, d: String) =>
      Layout.shuffleMixAudit(s, d)),
    "q213_kcore"            -> ((s: SparkSession, d: String) =>
      Similarity.kCore(s, d)),
    "q214_calibration"      -> (TextAnalysis.calibrationAudit _),
    "q215_weekday_seasonality" -> (TimeSeries.weekdaySeasonality _),
    "q216_pq_audit"         -> ((s: SparkSession, d: String) =>
      Ivf.pqAudit(s, d)),
    "q217_zipf_profile"     -> (TextAnalysis.zipfProfile _),
    "q218_market_share"     -> ((s: SparkSession, d: String) =>
      Flagship.marketShare(s, d)),
    "q219_kanon_ladder"     -> ((s: SparkSession, d: String) =>
      Audit.kAnonLadder(s, d)),
    "q220_pq_adc_recall"    -> ((s: SparkSession, d: String) =>
      Ivf.pqAdcRecall(s, d)),
    "q221_release_diff"     -> ((s: SparkSession, d: String) =>
      TextAnalysis.releaseDiff(s, d)),
    "q222_hh_union"         -> ((s: SparkSession, d: String) =>
      TextAnalysis.hhUnionContract(s, d)),
    "q223_pq_retrain_gain"  -> ((s: SparkSession, d: String) =>
      Ivf.pqRetrainGain(s, d)),
    "q224_rollup_shares"    -> (Grouping.rollupShares _),
    "q225_latency_trend"    -> (Relational.latencyTrend _),
    "q226_custdist"         -> (Relational.customerOrderDist _),
    "q227_vocab_growth"     -> (TextAnalysis.vocabGrowth _),
    "q228_source_dispersion" -> (Similarity.sourceDispersion _),
    "q229_join_forecast"    -> (Audit.joinSizeForecast _),
    "q230_nation_volume"    -> ((s: SparkSession, d: String) =>
      Flagship.nationVolume(s, d)),
    "q231_returned_revenue" -> ((s: SparkSession, d: String) =>
      Relational.returnedRevenueTop(s, d)),
    "q232_promo_share"      -> (Relational.promoRevenueShare _),
    "q233_idle_rich"        -> ((s: SparkSession, d: String) =>
      Relational.idleRichCustomers(s, d)),
    "q234_quality_length"   -> (TextAnalysis.qualityLengthBias _),
    "q235_ab_significance"  -> (Behavior.abConversion _),
    "q236_conversion_latency" -> (Behavior.conversionLatency _),
    "q237_boundary_stitch"  -> ((s: SparkSession, d: String) =>
      Dedup.boundaryStitches(s, d)),
    "q238_closure_audit"    -> ((s: SparkSession, d: String) =>
      Similarity.closureAudit(s, d)),
    "q239_error_burn"       -> (TimeSeries.errorBurn _),
    "q240_quality_rank"     -> (TextAnalysis.sourceQualityRank _),
    "q241_bpe_encode"       -> ((s: SparkSession, d: String) =>
      TextAnalysis.bpeEncodeStats(s, d)),
    "q242_bpe_fertility"    -> ((s: SparkSession, d: String) =>
      TextAnalysis.bpeFertility(s, d)),
    "q243_bpe_packing"      -> ((s: SparkSession, d: String) =>
      TextAnalysis.bpePackingWaste(s, d)),
    "q244_revenue_forecast" -> (TpchShapes.revenueForecast _),
    "q245_product_profit"   -> ((s: SparkSession, d: String) =>
      TpchShapes.productProfit(s, d)),
    "q246_part_concentration" -> (TpchShapes.partConcentration _),
    "q247_late_priority"    -> (TpchShapes.latePriorityLines _),
    "q248_top_supplier"     -> (TpchShapes.topSupplierRevenue _),
    "q249_supplier_diversity" -> (TpchShapes.supplierDiversity _),
    "q250_small_qty_revenue" -> ((s: SparkSession, d: String) =>
      TpchShapes.smallQuantityRevenue(s, d)),
    "q251_brand_size_qty"   -> (TpchShapes.brandSizeQtyRevenue _),
    "q252_surplus_suppliers" -> ((s: SparkSession, d: String) =>
      TpchShapes.surplusSuppliers(s, d)),
    "q253_min_unit_supplier" -> ((s: SparkSession, d: String) =>
      TpchShapes.minUnitPriceSupplier(s, d)),
    "q254_boundary_stitch_incremental" -> ((s: SparkSession, d: String) =>
      Dedup.boundaryStitchesIncrementalQuery(s, d)),
    "q255_bpe_train_iter"   -> ((s: SparkSession, d: String) =>
      BpeIterative.trainTableQuery(s, d)),
    "q256_bpe_iter_contract" -> ((s: SparkSession, d: String) =>
      BpeIterative.encodeContractQuery(s, d)),
    "q257_bpe_frozen_drift" -> ((s: SparkSession, d: String) =>
      BpeIterative.frozenDriftQuery(s, d)),
    "q258_setsim_threshold_sweep" -> ((s: SparkSession, d: String) =>
      Dedup.thresholdSweep(s, d)),
    "q259_setsim_preflight" -> ((s: SparkSession, d: String) =>
      Dedup.setSimPreflight(s, d)),
    "q260_setsim_preflight_incremental" -> ((s: SparkSession, d: String) =>
      Dedup.setSimPreflightIncremental(s, d)),
    "q261_embedding_drift" -> ((s: SparkSession, d: String) =>
      Ivf.embeddingDrift(s, d)),
    "q262_phash_preflight" -> ((s: SparkSession, d: String) =>
      graft.multimodal.Multimodal.phashPreflight(s, d)),
    "q263_containment_preflight" -> ((s: SparkSession, d: String) =>
      Dedup.containmentPreflight(s, d)),
    // the DEPLOYED face of q260 (VERDICT r14 #2): same forecast,
    // bit-identical output (Round14OpsSpec), but the corpus side rides
    // the persisted p90 index — so the benched number is the warm
    // daily-gate cost a deployment actually pays, while q260 keeps
    // pricing the fresh-build oracle face.
    "q264_setsim_preflight_incr_indexed" -> ((s: SparkSession, d: String) =>
      Dedup.setSimPreflightIncrementalIndexed(s, d)),
    // q265: longest matched 8-gram run per train doc vs the eval set —
    // the contamination SPAN audit (q51 = membership, q173 = fraction)
    "q265_contamination_spans" -> (Decontaminate.contaminationSpans _),
    // q266: the deployed daily face of q51 — every newest-10% ingest
    // doc screened against the frozen eval fingerprints, with verdict
    "q266_decontam_incremental" -> (Decontaminate.decontamIncremental _),
    // q267: the q259-methodology forecast face of the decontam gate —
    // matched-slot pricing swept over gram lengths, zero pairs run
    "q267_decontam_preflight" -> (Decontaminate.decontamPreflight _),
    // q268: the deployed daily face of q265 — span stats for the
    // newest-10% ingest batch vs the frozen eval set, |batch| rows
    "q268_span_audit_incr" -> (Decontaminate.spanAuditIncremental _),
    // q269: MinHash band-plan tuner — the measured Jaccard histogram
    // folded through every b×r=64 S-curve; expected candidates +
    // recall at τ per plan, cheapest plan meeting the recall SLO
    "q269_lsh_band_plan" -> (BandPlan.bandPlan _),
    // q270: LSH plane-count tuner — exact bucket occupancy + Σ m(m−1)/2
    // candidate volume per plane count, autoPlanes choice re-derived
    "q270_lsh_plane_plan" -> (Similarity.planePlan _),
  )

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = {
    import Det.Sql._
    // q55's scored-documents subquery, shared verbatim with the q121
    // confusion matrix so the replayed prediction rule cannot drift
    val langidScoredSql =
      """SELECT doc_id, lang AS lang_label,
        |    CAST(LEN(LIST_INTERSECT(LIST_DISTINCT([SUBSTR(text, i, 2)
        |      FOR i IN RANGE(1, GREATEST(LENGTH(text) - 1, 1) + 1)]),
        |      ['th', 'he', 'in', 'er', 'an'])) AS BIGINT) AS g_en,
        |    CAST(LEN(LIST_INTERSECT(LIST_DISTINCT([SUBSTR(text, i, 2)
        |      FOR i IN RANGE(1, GREATEST(LENGTH(text) - 1, 1) + 1)]),
        |      ['ch', 'ei', 'ie', 'sc', 'un'])) AS BIGINT) AS g_de,
        |    CAST(LEN(LIST_INTERSECT(LIST_DISTINCT([SUBSTR(text, i, 2)
        |      FOR i IN RANGE(1, GREATEST(LENGTH(text) - 1, 1) + 1)]),
        |      ['es', 'le', 'ou', 'qu', 'ai'])) AS BIGINT) AS g_fr,
        |    CAST(LEN(LIST_INTERSECT(LIST_DISTINCT([SUBSTR(text, i, 2)
        |      FOR i IN RANGE(1, GREATEST(LENGTH(text) - 1, 1) + 1)]),
        |      ['de', 'la', 'os', 'el', 'ón'])) AS BIGINT) AS g_es
        |  FROM documents""".stripMargin
    ListMap(
      "q01_pricing_summary" ->
        s"""SELECT l_returnflag, l_linestatus,
           |  ${exactSum("l_quantity")} AS sum_qty,
           |  ${exactSum("l_extendedprice")} AS sum_base_price,
           |  CAST(SUM(${revenueTerm("l_extendedprice", "l_discount")}) AS DOUBLE) AS sum_disc_price,
           |  CAST(SUM(${chargeTerm("l_extendedprice", "l_discount", "l_tax")}) AS DOUBLE) AS sum_charge,
           |  ${exactAvg("l_quantity")} AS avg_qty,
           |  ${exactAvg("l_extendedprice")} AS avg_price,
           |  COUNT(*) AS count_order
           |FROM lineitem
           |WHERE l_shipdate <= TIMESTAMP '1998-09-01 00:00:00'
           |GROUP BY l_returnflag, l_linestatus
           |ORDER BY l_returnflag, l_linestatus""".stripMargin,
      "q02_scan_project" ->
        """SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem
          |WHERE l_orderkey < 1000 ORDER BY l_orderkey, l_linenumber, l_quantity""".stripMargin,
      "q03_filter_predicates" ->
        """SELECT l_orderkey, l_linenumber, l_returnflag, l_discount FROM lineitem
          |WHERE l_shipdate BETWEEN TIMESTAMP '1995-01-01 00:00:00' AND TIMESTAMP '1996-12-31 00:00:00'
          |  AND l_returnflag IN ('A', 'R') AND l_discount > 0.05 AND l_quantity IS NOT NULL
          |ORDER BY l_orderkey, l_linenumber, l_returnflag, l_discount""".stripMargin,
      "q04_topk_orders" ->
        """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
          |ORDER BY o_totalprice DESC, o_orderkey LIMIT 100""".stripMargin,
      "q05_distinct" ->
        """SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem
          |ORDER BY l_returnflag, l_linestatus""".stripMargin,
      "q06_join_equi" ->
        s"""SELECT c_mktsegment, COUNT(*) AS n_orders,
           |  ${exactSum("o_totalprice")} AS sum_price
           |FROM orders JOIN customer ON o_custkey = c_custkey
           |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,
      "q07_join_broadcast_dims" ->
        s"""SELECT r_name,
           |  CAST(SUM(${revenueTerm("l_extendedprice", "l_discount")}) AS DOUBLE) AS revenue,
           |  COUNT(*) AS n_items
           |FROM lineitem
           |JOIN orders ON l_orderkey = o_orderkey
           |JOIN customer ON o_custkey = c_custkey
           |JOIN nation ON c_nationkey = n_nationkey
           |JOIN region ON n_regionkey = r_regionkey
           |GROUP BY r_name ORDER BY r_name""".stripMargin,
      "q08_join_semi" ->
        """SELECT c_custkey, c_name, c_mktsegment FROM customer
          |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
          |ORDER BY c_custkey""".stripMargin,
      "q09_join_anti" ->
        """SELECT c_custkey, c_name, c_nationkey FROM customer
          |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_orderstatus = 'F')
          |ORDER BY c_custkey""".stripMargin,
      "q10_join_outer" ->
        """SELECT c_custkey, COUNT(o_orderkey) AS n_orders
          |FROM customer LEFT JOIN orders ON c_custkey = o_custkey
          |GROUP BY c_custkey ORDER BY c_custkey""".stripMargin,
      "q00_flagship" ->
        s"""WITH by_customer AS (
           |  SELECT r_name, c_custkey,
           |    SUM(${revenueTerm("l_extendedprice", "l_discount")}) AS rev_d
           |  FROM lineitem
           |  JOIN orders ON l_orderkey = o_orderkey
           |  JOIN customer ON o_custkey = c_custkey
           |  JOIN nation ON c_nationkey = n_nationkey
           |  JOIN region ON n_regionkey = r_regionkey
           |  GROUP BY r_name, c_custkey
           |), ranked AS (
           |  SELECT r_name, c_custkey, rev_d,
           |    ROW_NUMBER() OVER (PARTITION BY r_name ORDER BY rev_d DESC, c_custkey) AS rnk
           |  FROM by_customer
           |)
           |SELECT r_name, rnk, c_custkey, CAST(rev_d AS DOUBLE) AS revenue
           |FROM ranked WHERE rnk <= 3 ORDER BY r_name, rnk""".stripMargin,
      "q11_join_theta" ->
        """SELECT n_name, COUNT(*) AS n_pairs,
          |  CAST(SUM(CAST(s_acctbal AS DECIMAL(18,2)) - CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS sum_gap
          |FROM supplier
          |JOIN customer ON s_nationkey = c_nationkey AND s_acctbal > c_acctbal
          |JOIN nation ON n_nationkey = s_nationkey
          |GROUP BY n_name ORDER BY n_name""".stripMargin,
      "q12_join_asof" ->
        """WITH p AS (SELECT event_id AS purchase_id, user_id, ts AS purchase_ts
          |           FROM events WHERE event_type = 'purchase'),
          |c AS (SELECT user_id, ts, event_id FROM events WHERE event_type = 'click'),
          |j AS (SELECT p.purchase_id, p.user_id, p.purchase_ts,
          |        c.event_id AS click_id, c.ts AS click_ts,
          |        ROW_NUMBER() OVER (PARTITION BY p.purchase_id
          |          ORDER BY c.ts DESC, c.event_id DESC) AS rn
          |      FROM p LEFT JOIN c ON p.user_id = c.user_id AND c.ts <= p.purchase_ts)
          |SELECT purchase_id, user_id, purchase_ts, click_id, click_ts
          |FROM j WHERE rn = 1 ORDER BY purchase_id""".stripMargin,
      "q13_set_union" ->
        """SELECT o_custkey AS c_custkey FROM orders WHERE o_orderstatus = 'F'
          |UNION
          |SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
          |ORDER BY c_custkey""".stripMargin,
      "q14_set_intersect" ->
        """SELECT o_custkey AS c_custkey FROM orders WHERE o_orderstatus = 'F'
          |INTERSECT
          |SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
          |ORDER BY c_custkey""".stripMargin,
      "q15_set_except" ->
        """SELECT o_custkey AS c_custkey FROM orders WHERE o_orderstatus = 'F'
          |EXCEPT
          |SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
          |ORDER BY c_custkey""".stripMargin,
      "q16_rollup" ->
        s"""SELECT l_returnflag, l_linestatus,
           |  ${exactSum("l_quantity")} AS sum_qty, COUNT(*) AS n,
           |  CAST(GROUPING(l_returnflag) AS BIGINT) AS g_rf,
           |  CAST(GROUPING(l_linestatus) AS BIGINT) AS g_ls
           |FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)
           |ORDER BY g_rf, g_ls, l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin,
      "q17_cube" ->
        s"""SELECT l_returnflag, l_linestatus,
           |  ${exactSum("l_extendedprice")} AS sum_price, COUNT(*) AS n,
           |  CAST(GROUPING(l_returnflag) AS BIGINT) AS g_rf,
           |  CAST(GROUPING(l_linestatus) AS BIGINT) AS g_ls
           |FROM lineitem GROUP BY CUBE(l_returnflag, l_linestatus)
           |ORDER BY g_rf, g_ls, l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin,
      "q18_grouping_sets" ->
        """SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
          |  CAST(GROUPING(l_returnflag) AS BIGINT) AS g_rf,
          |  CAST(GROUPING(l_linestatus) AS BIGINT) AS g_ls
          |FROM lineitem
          |GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
          |ORDER BY g_rf, g_ls, l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin,
      "q19_count_distinct" ->
        """SELECT l_returnflag, COUNT(DISTINCT l_partkey) AS n_parts,
          |  COUNT(DISTINCT l_suppkey) AS n_supps, COUNT(*) AS n_rows
          |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
      "q20_window_rank" ->
        """SELECT o_custkey, rn, rnk, drnk, o_orderkey, o_totalprice FROM (
          |  SELECT o_custkey, o_orderkey, o_totalprice,
          |    ROW_NUMBER() OVER w AS rn, RANK() OVER w AS rnk,
          |    DENSE_RANK() OVER w AS drnk
          |  FROM orders
          |  WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey)
          |) t WHERE rn <= 3 ORDER BY o_custkey, rn""".stripMargin,
      "q21_window_running" ->
        """SELECT l_suppkey, l_shipdate, l_orderkey, l_linenumber, l_extendedprice,
          |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) OVER (
          |    PARTITION BY l_suppkey
          |    ORDER BY l_shipdate, l_orderkey, l_linenumber, l_extendedprice
          |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_price
          |FROM lineitem WHERE l_suppkey <= 3
          |ORDER BY l_suppkey, l_shipdate, l_orderkey, l_linenumber, l_extendedprice, running_price""".stripMargin,
      "q22_window_lag_lead" ->
        """SELECT o_custkey, o_orderkey, o_orderdate, o_totalprice,
          |  LAG(o_totalprice) OVER w AS prev_price,
          |  LEAD(o_totalprice) OVER w AS next_price,
          |  FIRST_VALUE(o_orderdate) OVER w AS first_date
          |FROM orders
          |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
          |ORDER BY o_custkey, o_orderdate, o_orderkey""".stripMargin,
      "q23_string_funcs" ->
        """SELECT p_partkey, UPPER(p_brand) AS brand_u, LOWER(p_type) AS type_l,
          |  SUBSTRING(p_name, 1, 5) AS name5,
          |  CONCAT_WS('|', p_brand, p_type) AS brand_type,
          |  CAST(LENGTH(p_name) AS BIGINT) AS name_len,
          |  CAST(LEN(STRING_SPLIT(p_name, ' ')) AS BIGINT) AS n_tokens,
          |  REGEXP_EXTRACT(p_brand, '([0-9]+)', 1) AS brand_num,
          |  TRIM(CONCAT('  ', p_brand, ' ')) AS trimmed,
          |  LPAD(CAST(p_size AS VARCHAR), 4, '0') AS size_pad,
          |  CONTAINS(p_name, 'red') AS has_red,
          |  STARTS_WITH(p_name, 'small') AS is_small
          |FROM part ORDER BY p_partkey""".stripMargin,
      "q24_date_funcs" ->
        """SELECT o_orderkey, CAST(YEAR(o_orderdate) AS BIGINT) AS o_year,
          |  CAST(MONTH(o_orderdate) AS BIGINT) AS o_month,
          |  CAST(QUARTER(o_orderdate) AS BIGINT) AS o_quarter,
          |  CAST(DAYOFMONTH(o_orderdate) AS BIGINT) AS o_day,
          |  DATE_TRUNC('month', o_orderdate) AS month_start,
          |  CAST(DATEDIFF('day', CAST(o_orderdate AS DATE), DATE '1998-12-31') AS BIGINT) AS days_to_eoy,
          |  CAST(o_orderdate AS DATE) AS o_date
          |FROM orders ORDER BY o_orderkey""".stripMargin,
      "q25_math_funcs" ->
        """SELECT l_orderkey, l_linenumber, l_quantity,
          |  ABS(l_quantity * -1) AS abs_q,
          |  CAST(FLOOR(l_quantity / 2) AS BIGINT) AS half_floor,
          |  CAST(CEIL(l_quantity / 2) AS BIGINT) AS half_ceil,
          |  SQRT(l_quantity) AS sqrt_q,
          |  POW(l_quantity, 2) AS q_sq,
          |  CAST(l_orderkey % 7 AS BIGINT) AS key_mod,
          |  CAST(ROUND(l_discount * 100) AS BIGINT) AS disc_pct
          |FROM lineitem WHERE l_orderkey < 500
          |ORDER BY l_orderkey, l_linenumber, l_quantity""".stripMargin,
      "q26_array_funcs" ->
        """SELECT vec_id, CAST(LEN(embedding) AS BIGINT) AS dim,
          |  CAST(embedding[1] AS DOUBLE) AS e1,
          |  CAST(embedding[-1] AS DOUBLE) AS e_last,
          |  LIST_SUM(LIST_TRANSFORM(embedding,
          |    x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))) AS sq_norm,
          |  LIST_SUM(LIST_TRANSFORM(embedding[1:8],
          |    x -> CAST(x AS DOUBLE))) AS head8_sum
          |FROM embeddings ORDER BY vec_id""".stripMargin,
      "q27_json_funcs" ->
        """SELECT event_id,
          |  JSON_EXTRACT_STRING(props, '$.k') AS k_str,
          |  CAST(JSON_EXTRACT_STRING(props, '$.k') AS BIGINT) AS k_val,
          |  JSON_EXTRACT_STRING(props, '$.missing') AS k_missing,
          |  CAST(JSON_EXTRACT_STRING(props, '$.k') AS BIGINT) AS k_struct
          |FROM events ORDER BY event_id""".stripMargin,
      "q28_events_tumbling" ->
        """SELECT DATE_TRUNC('hour', ts) AS hour_start, event_type,
          |  COUNT(*) AS n,
          |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
          |FROM events GROUP BY 1, 2 ORDER BY hour_start, event_type""".stripMargin,
      "q29_events_sliding" ->
        """SELECT MAKE_TIMESTAMP((EPOCH_US(ts) // 900000000 - k.k) * 900000000) AS win_start,
          |  COUNT(*) AS n,
          |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
          |FROM events CROSS JOIN (SELECT UNNEST([0, 1, 2, 3]) AS k) k
          |GROUP BY 1 ORDER BY win_start""".stripMargin,
      "q30_events_session" ->
        """WITH e AS (
          |  SELECT user_id, ts, value,
          |    LAG(ts) OVER (PARTITION BY user_id ORDER BY ts) AS prev
          |  FROM events
          |), m AS (
          |  SELECT user_id, ts, value,
          |    CASE WHEN prev IS NULL OR ts - prev >= INTERVAL 30 MINUTE
          |         THEN 1 ELSE 0 END AS new_s
          |  FROM e
          |), s AS (
          |  SELECT user_id, ts, value,
          |    SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts
          |      ROWS UNBOUNDED PRECEDING) AS sid
          |  FROM m
          |)
          |SELECT user_id, MIN(ts) AS session_start,
          |  MAX(ts) + INTERVAL 30 MINUTE AS session_end,
          |  COUNT(*) AS n_events,
          |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
          |FROM s GROUP BY user_id, sid ORDER BY user_id, session_start""".stripMargin,
      "q31_sanitize" ->
        """SELECT event_id,
          |  CAST(JSON_EXTRACT_STRING(props, '$.k') AS BIGINT) AS k_val,
          |  CASE WHEN JSON_EXTRACT_STRING(props, '$.k') IS NULL THEN '{}'
          |       ELSE '{"k":' || JSON_EXTRACT_STRING(props, '$.k') || '}'
          |  END AS props_canonical,
          |  COALESCE(value, 0.0) AS value
          |FROM events ORDER BY event_id""".stripMargin,
      "q32_transfer_roundtrip" ->
        s"""SELECT COUNT(*) AS n_rows,
           |  CAST(SUM(l_orderkey) AS BIGINT) AS sum_okey,
           |  CAST(SUM(l_partkey + l_suppkey) AS BIGINT) AS sum_keys,
           |  ${exactSum("l_extendedprice")} AS sum_price
           |FROM lineitem""".stripMargin,
      "q33_dedup_exact" ->
        """SELECT MIN(doc_id) AS keep_id, COUNT(*) AS n_copies,
          |  SHA256(text) AS content_hash
          |FROM documents GROUP BY text ORDER BY keep_id""".stripMargin,
      "q34_cosine_topk" ->
        """WITH q AS (SELECT CAST(embedding AS DOUBLE[]) AS qe
          |           FROM embeddings WHERE vec_id = 0)
          |SELECT e.vec_id, e.label,
          |  ROUND(LIST_INNER_PRODUCT(CAST(e.embedding AS DOUBLE[]), q.qe) /
          |    (SQRT(LIST_INNER_PRODUCT(CAST(e.embedding AS DOUBLE[]),
          |                             CAST(e.embedding AS DOUBLE[]))) *
          |     SQRT(LIST_INNER_PRODUCT(q.qe, q.qe))), 6) AS cos_sim
          |FROM embeddings e, q WHERE e.vec_id <> 0
          |ORDER BY cos_sim DESC, vec_id LIMIT 20""".stripMargin,
      "q35_text_quality" ->
        s"""SELECT doc_id, lang,
          |  CAST(LENGTH(text) AS BIGINT) AS n_chars_m,
          |  CAST(LEN(STRING_SPLIT(text, ' ')) AS BIGINT) AS n_tokens,
          |  ROUND(CAST(LIST_SUM(LIST_TRANSFORM(STRING_SPLIT(text, ' '),
          |      x -> LENGTH(x))) AS DOUBLE) /
          |    CAST(LEN(STRING_SPLIT(text, ' ')) AS DOUBLE), 4) AS avg_token_len,
          |  ROUND(CAST(LEN(REGEXP_EXTRACT_ALL(text, '[^a-z0-9 ]')) AS DOUBLE) /
          |    CAST(LENGTH(text) AS DOUBLE), 6) AS punct_ratio,
          |  ROUND(CAST(LEN(LIST_FILTER(STRING_SPLIT(text, ' '),
          |      t -> t IN ('the', 'a', 'of', 'and', 'to'))) AS DOUBLE) /
          |    CAST(LEN(STRING_SPLIT(text, ' ')) AS DOUBLE), 6) AS stop_ratio,
          |  ${TextAnalysis.qualityScoreSqlExpr} AS quality_score
          |FROM documents ORDER BY doc_id""".stripMargin,
      "q36_text_langid" ->
        """SELECT doc_id, lang_label, s_en, s_de, s_fr, s_es, s_zh,
          |  CASE WHEN GREATEST(s_en, s_de, s_fr, s_es, s_zh) = 0 THEN 'und'
          |       WHEN s_en = GREATEST(s_en, s_de, s_fr, s_es, s_zh) THEN 'en'
          |       WHEN s_de = GREATEST(s_en, s_de, s_fr, s_es, s_zh) THEN 'de'
          |       WHEN s_fr = GREATEST(s_en, s_de, s_fr, s_es, s_zh) THEN 'fr'
          |       WHEN s_es = GREATEST(s_en, s_de, s_fr, s_es, s_zh) THEN 'es'
          |       ELSE 'zh' END AS lang_pred
          |FROM (
          |  SELECT doc_id, lang AS lang_label,
          |    CAST(LEN(LIST_INTERSECT(STRING_SPLIT(text, ' '),
          |      ['the', 'a', 'and', 'of', 'to'])) AS BIGINT) AS s_en,
          |    CAST(LEN(LIST_INTERSECT(STRING_SPLIT(text, ' '),
          |      ['der', 'die', 'und', 'das', 'ist'])) AS BIGINT) AS s_de,
          |    CAST(LEN(LIST_INTERSECT(STRING_SPLIT(text, ' '),
          |      ['le', 'la', 'les', 'et', 'des'])) AS BIGINT) AS s_fr,
          |    CAST(LEN(LIST_INTERSECT(STRING_SPLIT(text, ' '),
          |      ['el', 'los', 'las', 'y', 'una'])) AS BIGINT) AS s_es,
          |    CAST(LEN(LIST_INTERSECT(STRING_SPLIT(text, ' '),
          |      ['的', '了', '是', '在', '我'])) AS BIGINT) AS s_zh
          |  FROM documents
          |) t ORDER BY doc_id""".stripMargin,
      "q37_token_counts" ->
        """SELECT doc_id,
          |  CAST(LEN(STRING_SPLIT(text, ' ')) AS BIGINT) AS ws_tokens,
          |  CAST(LEN(REGEXP_EXTRACT_ALL(text, '[a-z]+|[0-9]+|[^a-z0-9 ]')) AS BIGINT) AS re_tokens,
          |  ROUND(CAST(LENGTH(text) AS DOUBLE) /
          |    CAST(LEN(REGEXP_EXTRACT_ALL(text, '[a-z]+|[0-9]+|[^a-z0-9 ]')) AS DOUBLE), 4) AS chars_per_token
          |FROM documents ORDER BY doc_id""".stripMargin,
      "q39_multimodal" ->
        """SELECT doc_id,
          |  CASE CAST(doc_id % 3 AS INTEGER) WHEN 0 THEN 'image'
          |       WHEN 1 THEN 'audio' ELSE 'video' END AS media_type,
          |  CAST(OCTET_LENGTH(ENCODE(text)) AS BIGINT) AS n_bytes,
          |  CAST(CASE WHEN doc_id % 3 = 1 THEN 0
          |    ELSE 64 + OCTET_LENGTH(ENCODE(text)) % 512 END AS BIGINT) AS width,
          |  CAST(CASE WHEN doc_id % 3 = 1 THEN 0
          |    ELSE 64 + (OCTET_LENGTH(ENCODE(text)) * 7 + ASCII(text)) % 512 END AS BIGINT) AS height,
          |  CAST(CASE WHEN doc_id % 3 = 0 THEN 1 WHEN doc_id % 3 = 1 THEN 0
          |    ELSE 1 + OCTET_LENGTH(ENCODE(text)) % 30 END AS BIGINT) AS n_frames,
          |  CAST(CASE WHEN doc_id % 3 = 1
          |    THEN 8000 + (OCTET_LENGTH(ENCODE(text)) % 5) * 8000
          |    ELSE 0 END AS BIGINT) AS sample_rate
          |FROM documents ORDER BY doc_id""".stripMargin,
      // FNV+splitmix replayed in SQL (HashSql) — ground truth for the
      // hash-based fingerprint family
      "q38_fingerprints" -> HashSql.fingerprintsOracle,
      "q40_centroids" ->
        """SELECT label, CAST(i AS BIGINT) AS pos,
          |  ROUND(AVG(CAST(embedding[i] AS DOUBLE)), 6) AS c_val,
          |  COUNT(*) AS n_vecs
          |FROM embeddings, GENERATE_SERIES(1, 64) s(i)
          |GROUP BY label, i ORDER BY label, pos""".stripMargin,
      // brute-force all-pairs shingle Jaccard — proves end-to-end LSH
      // recall (band→estimate→verify) is 100% on this corpus, and that
      // hash-based Jaccard equals gram-based Jaccard
      "q41_dedup_minhash" -> HashSql.minhashNearDupsOracle(0.8, 100),
      // oracle face of the SimHash capability: band-value moments of
      // the deterministic sibling's fingerprints (bit-exact FNV
      // replay); the xxhash64 production path keeps its differential
      // specs
      "q42_dedup_simhash" -> HashSql.simhashBandMomentsOracle,
      "q43_ann_buckets" -> {
        // the seeded hyperplanes are deterministic literals — emit them
        // into the oracle so DuckDB computes the same sign-of-projection
        // buckets; both sides round the dot product to 6dp before the
        // sign test so float-summation order can't flip a bucket bit
        val planeValues = Similarity.hyperplanes(8, 64).zipWithIndex
          .map { case (p, j) => s"($j, [${p.mkString(", ")}])" }
          .mkString(",\n  ")
        s"""WITH planes(j, plane) AS (VALUES
           |  $planeValues),
           |dots AS (
           |  SELECT e.vec_id, e.label, p.j,
           |    ROUND(list_sum(list_transform(range(1, 65),
           |      i -> CAST(e.embedding[i] AS DOUBLE) * p.plane[i])), 6) AS d
           |  FROM embeddings e CROSS JOIN planes p
           |)
           |SELECT vec_id, label,
           |  CAST(SUM(CASE WHEN d > 0 THEN (CAST(1 AS BIGINT) << j) ELSE 0 END) AS BIGINT) AS bucket
           |FROM dots GROUP BY vec_id, label
           |ORDER BY vec_id, label, bucket""".stripMargin
      },
      "q44_embed_neardup" ->
        """SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
          |  ROUND(LIST_INNER_PRODUCT(CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])) /
          |    (SQRT(LIST_INNER_PRODUCT(CAST(a.embedding AS DOUBLE[]), CAST(a.embedding AS DOUBLE[]))) *
          |     SQRT(LIST_INNER_PRODUCT(CAST(b.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])))), 6) AS cos_sim
          |FROM embeddings a JOIN embeddings b
          |  ON a.vec_id < b.vec_id AND a.vec_id < 200 AND b.vec_id < 200
          |WHERE ROUND(LIST_INNER_PRODUCT(CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])) /
          |    (SQRT(LIST_INNER_PRODUCT(CAST(a.embedding AS DOUBLE[]), CAST(a.embedding AS DOUBLE[]))) *
          |     SQRT(LIST_INNER_PRODUCT(CAST(b.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])))), 6) >= 0.2
          |ORDER BY vec_a, vec_b""".stripMargin,
      "q45_sql_subqueries" ->
        """SELECT l_orderkey, l_linenumber, l_quantity
          |FROM lineitem
          |WHERE l_quantity = (SELECT MAX(l_quantity) FROM lineitem)
          |  AND l_orderkey IN (SELECT o_orderkey FROM orders
          |                     WHERE o_orderstatus = 'F')
          |ORDER BY l_orderkey, l_linenumber, l_quantity""".stripMargin,
      // oracle face of the IVF capability: cell summary of the
      // deterministic integer-Lloyd index (q71's replay machinery);
      // the ML-KMeans production index keeps its recall specs
      "q46_ivf_cells" -> Ivf.detCellSummaryOracleSql(),
      "q47_percentiles" ->
        """SELECT l_returnflag,
          |  QUANTILE_CONT(l_quantity, 0.5) AS p50_qty,
          |  QUANTILE_CONT(l_quantity, 0.9) AS p90_qty,
          |  QUANTILE_CONT(l_quantity, 0.25) AS p25_qty,
          |  COUNT(*) AS n
          |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
      "q48_pivot" ->
        s"""SELECT CAST(YEAR(l_shipdate) AS BIGINT) AS ship_year,
           |  CAST(SUM(CASE WHEN l_returnflag = 'A' THEN CAST(l_quantity AS DECIMAL(18,2)) END) AS DOUBLE) AS "A",
           |  CAST(SUM(CASE WHEN l_returnflag = 'N' THEN CAST(l_quantity AS DECIMAL(18,2)) END) AS DOUBLE) AS "N",
           |  CAST(SUM(CASE WHEN l_returnflag = 'R' THEN CAST(l_quantity AS DECIMAL(18,2)) END) AS DOUBLE) AS "R"
           |FROM lineitem GROUP BY 1 ORDER BY ship_year""".stripMargin,
      "q49_shipping_priority" ->
        s"""SELECT o_orderkey, o_orderdate,
           |  CAST(SUM(${revenueTerm("l_extendedprice", "l_discount")}) AS DOUBLE) AS revenue
           |FROM lineitem
           |JOIN orders ON l_orderkey = o_orderkey
           |JOIN customer ON o_custkey = c_custkey
           |WHERE c_mktsegment = 'BUILDING'
           |  AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
           |  AND l_shipdate > TIMESTAMP '1997-01-01 00:00:00'
           |GROUP BY o_orderkey, o_orderdate
           |ORDER BY revenue DESC, o_orderkey LIMIT 10""".stripMargin,
      "q50_winnow_fingerprints" -> HashSql.winnowSummaryOracle,
      "q51_decontaminate" -> HashSql.decontaminateOracle(minShared = 2),
      "q52_conditional_aggs" ->
        """SELECT o_orderpriority,
          |  COUNT(*) FILTER (WHERE o_orderstatus = 'F') AS n_finished,
          |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
          |    FILTER (WHERE o_orderstatus = 'F') AS DOUBLE) AS sum_finished_price,
          |  BOOL_OR(o_totalprice > 400000) AS any_jumbo,
          |  BOOL_AND(o_totalprice > 0) AS all_positive,
          |  COUNT(*) AS n
          |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
      "q53_unpivot" ->
        s"""WITH wide AS (
           |  SELECT CAST(YEAR(l_shipdate) AS BIGINT) AS ship_year,
           |    CAST(SUM(CASE WHEN l_returnflag = 'A' THEN CAST(l_quantity AS DECIMAL(18,2)) END) AS DOUBLE) AS "A",
           |    CAST(SUM(CASE WHEN l_returnflag = 'N' THEN CAST(l_quantity AS DECIMAL(18,2)) END) AS DOUBLE) AS "N",
           |    CAST(SUM(CASE WHEN l_returnflag = 'R' THEN CAST(l_quantity AS DECIMAL(18,2)) END) AS DOUBLE) AS "R"
           |  FROM lineitem GROUP BY 1
           |)
           |SELECT ship_year, flag, sum_qty FROM (
           |  SELECT ship_year, 'A' AS flag, "A" AS sum_qty FROM wide
           |  UNION ALL SELECT ship_year, 'N', "N" FROM wide
           |  UNION ALL SELECT ship_year, 'R', "R" FROM wide
           |) t WHERE sum_qty IS NOT NULL ORDER BY ship_year, flag""".stripMargin,
      "q54_null_funcs" ->
        """SELECT c_custkey,
          |  COALESCE(o_custkey, -1) AS key_or_default,
          |  o_custkey IS NULL AS no_f_order,
          |  NULLIF(c_mktsegment, 'BUILDING') AS segment_nb,
          |  CASE WHEN o_custkey IS NOT NULL THEN 'buyer' ELSE 'prospect' END AS kind
          |FROM customer LEFT JOIN (
          |  SELECT DISTINCT o_custkey FROM orders WHERE o_orderstatus = 'F'
          |) o ON c_custkey = o.o_custkey
          |ORDER BY c_custkey""".stripMargin,
      "q55_langid_ngram" ->
        s"""SELECT doc_id, lang_label, g_en, g_de, g_fr, g_es,
           |  CASE WHEN GREATEST(g_en, g_de, g_fr, g_es) = 0 THEN 'und'
           |       WHEN g_en = GREATEST(g_en, g_de, g_fr, g_es) THEN 'en'
           |       WHEN g_de = GREATEST(g_en, g_de, g_fr, g_es) THEN 'de'
           |       WHEN g_fr = GREATEST(g_en, g_de, g_fr, g_es) THEN 'fr'
           |       ELSE 'es' END AS lang_pred_ngram
           |FROM (
           |  $langidScoredSql
           |) t ORDER BY doc_id""".stripMargin,
      "q56_range_join" ->
        s"""SELECT quarter, COUNT(*) AS n_items,
           |  ${exactSum("l_quantity")} AS sum_qty
           |FROM (VALUES
           |  ('1996-Q1', TIMESTAMP '1996-01-01', TIMESTAMP '1996-04-01'),
           |  ('1996-Q2', TIMESTAMP '1996-04-01', TIMESTAMP '1996-07-01'),
           |  ('1996-Q3', TIMESTAMP '1996-07-01', TIMESTAMP '1996-10-01'),
           |  ('1996-Q4', TIMESTAMP '1996-10-01', TIMESTAMP '1997-01-01')
           |) q(quarter, q_start, q_end)
           |JOIN lineitem ON l_shipdate >= q_start AND l_shipdate < q_end
           |GROUP BY quarter ORDER BY quarter""".stripMargin,
      // oracle face of the HLL rollup: the estimate VALUE is native
      // sketch state no oracle can replay, so the checked row carries
      // the exact distinct + the 5% accuracy predicate (deterministic
      // per dataset); the native build→merge→estimate stays in the
      // query path and a sketch regression flips the boolean
      "q57_hll_sketch_rollup" ->
        """SELECT event_type,
          |  CAST(COUNT(DISTINCT DATE_TRUNC('day', ts)) AS BIGINT)
          |    AS n_days,
          |  CAST(COUNT(DISTINCT user_id) AS BIGINT) AS exact_distinct,
          |  TRUE AS est_within_5pct
          |FROM events GROUP BY event_type
          |ORDER BY event_type, n_days, exact_distinct,
          |  est_within_5pct""".stripMargin,
      "q58_join_full_outer" ->
        s"""WITH f AS (
           |  SELECT o_custkey, COUNT(*) AS n_f,
           |    ${exactSum("o_totalprice")} AS sum_f
           |  FROM orders WHERE o_orderstatus = 'F' GROUP BY o_custkey
           |), o AS (
           |  SELECT o_custkey, COUNT(*) AS n_o,
           |    ${exactSum("o_totalprice")} AS sum_o
           |  FROM orders WHERE o_orderstatus = 'O' GROUP BY o_custkey
           |)
           |SELECT COALESCE(f.o_custkey, o.o_custkey) AS custkey,
           |  COALESCE(n_f, 0) AS n_f, COALESCE(n_o, 0) AS n_o,
           |  sum_f, sum_o,
           |  f.o_custkey IS NULL AS only_open,
           |  o.o_custkey IS NULL AS only_finished
           |FROM f FULL OUTER JOIN o ON f.o_custkey = o.o_custkey
           |ORDER BY custkey""".stripMargin,
      "q59_window_range_frame" ->
        """SELECT l_suppkey,
          |  DATEDIFF('day', DATE '1995-01-01', CAST(l_shipdate AS DATE)) AS ship_day,
          |  l_orderkey, l_linenumber, l_extendedprice,
          |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) OVER (
          |    PARTITION BY l_suppkey
          |    ORDER BY DATEDIFF('day', DATE '1995-01-01', CAST(l_shipdate AS DATE))
          |    RANGE BETWEEN 90 PRECEDING AND CURRENT ROW) AS DOUBLE) AS trailing_rev
          |FROM lineitem WHERE l_suppkey <= 3
          |ORDER BY l_suppkey, ship_day, l_orderkey, l_linenumber,
          |  l_extendedprice, trailing_rev""".stripMargin,
      "q60_join_right_outer" ->
        """SELECT c_custkey, COUNT(o_orderkey) AS n_orders,
          |  MIN(o_orderdate) AS first_order
          |FROM orders RIGHT OUTER JOIN customer ON o_custkey = c_custkey
          |GROUP BY c_custkey ORDER BY c_custkey""".stripMargin,
      "q61_ann_multiprobe" -> {
        // same plane literals + rounded-sign bucketing as the q43
        // oracle; the probe ring (hamming<=1 of vec 7's bucket) and the
        // exact cosine re-rank are all recomputed inside DuckDB
        val planeValues = Similarity.hyperplanes(8, 64).zipWithIndex
          .map { case (p, j) => s"($j, [${p.mkString(", ")}])" }
          .mkString(",\n  ")
        s"""WITH planes(j, plane) AS (VALUES
           |  $planeValues),
           |buckets AS (
           |  SELECT e.vec_id,
           |    CAST(SUM(CASE WHEN ROUND(list_sum(list_transform(range(1, 65),
           |      i -> CAST(e.embedding[i] AS DOUBLE) * p.plane[i])), 6) > 0
           |      THEN (CAST(1 AS BIGINT) << p.j) ELSE 0 END) AS BIGINT) AS b
           |  FROM embeddings e CROSS JOIN planes p GROUP BY e.vec_id
           |),
           |qb AS (SELECT b FROM buckets WHERE vec_id = 7),
           |q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 7)
           |SELECT e.vec_id,
           |  ROUND(LIST_INNER_PRODUCT(CAST(e.embedding AS DOUBLE[]), CAST(q.qe AS DOUBLE[])) /
           |    (SQRT(LIST_INNER_PRODUCT(CAST(e.embedding AS DOUBLE[]), CAST(e.embedding AS DOUBLE[]))) *
           |     SQRT(LIST_INNER_PRODUCT(CAST(q.qe AS DOUBLE[]), CAST(q.qe AS DOUBLE[])))), 6) AS cos_sim
           |FROM embeddings e
           |JOIN buckets v ON v.vec_id = e.vec_id
           |CROSS JOIN qb CROSS JOIN q
           |WHERE bit_count(xor(v.b, qb.b)) <= 1
           |ORDER BY cos_sim DESC, e.vec_id LIMIT 10""".stripMargin
      },
      "q62_stratified_sample" -> {
        val b = Sampling.idBucketSql("doc_id")
        s"""SELECT doc_id, lang, CAST($b AS BIGINT) AS keep_bucket
           |FROM documents
           |WHERE CAST($b AS DOUBLE) <
           |  (CASE WHEN lang = 'en' THEN 0.5
           |        WHEN lang = 'de' THEN 0.25 ELSE 0.1 END) * ${Sampling.Prime}
           |ORDER BY doc_id, lang, keep_bucket""".stripMargin
      },
      // Spark side anti-joins on sha2(text); the oracle states the same
      // semantics as text equality (content-hash equality == content
      // equality, and the digests never cross the engine boundary)
      "q63_incremental_exact" ->
        """SELECT n.doc_id FROM documents n
          |WHERE n.doc_id >= 400
          |  AND n.doc_id = (SELECT MIN(m.doc_id) FROM documents m
          |                  WHERE m.doc_id >= 400 AND m.text = n.text)
          |  AND NOT EXISTS (SELECT 1 FROM documents c
          |                  WHERE c.doc_id < 400 AND c.text = n.text)
          |ORDER BY doc_id""".stripMargin,
      "q64_pii_redaction" -> {
        // identical pattern list on both sides (RE2-safe by design);
        // DuckDB needs the 'g' flag to match Spark's replace-all
        val redacted = graft.etl.Sanitize.PiiPatterns.foldLeft("text") {
          case (acc, (re, tag)) =>
            s"regexp_replace($acc, '${re.replace("'", "''")}', '$tag', 'g')"
        }
        s"""SELECT doc_id, $redacted AS text_redacted,
           |  ($redacted != text) AS was_redacted
           |FROM documents
           |ORDER BY doc_id, text_redacted, was_redacted""".stripMargin
      },
      // Spark runs distributed min-label propagation; the oracle states
      // the same fixpoint as a recursive transitive closure over the
      // identical (q44) edge set — cluster id = min id reachable
      "q65_dedup_clusters" ->
        s"""WITH RECURSIVE ${Similarity.clusterOracleCtes()}
           |SELECT vec_id, cluster_id FROM cl
           |ORDER BY vec_id, cluster_id""".stripMargin,
      // each output column's SEMANTIC reduction — the struct/map
      // machinery runs Spark-side, the compare is flat scalars
      "q66_complex_types" ->
        """SELECT o_orderkey,
          |  o_custkey AS s_cust,
          |  o_orderstatus AS s_status,
          |  o_totalprice * 2 AS m_hi,
          |  CAST(NULL AS BIGINT) AS m_missing,
          |  CAST(2 AS BIGINT) AS m_size,
          |  o_custkey + 1 AS aos_second
          |FROM orders
          |ORDER BY o_orderkey, s_cust, s_status, m_hi, m_missing,
          |  m_size, aos_second""".stripMargin,
      "q67_regexp_funcs" ->
        """SELECT p_partkey,
          |  NULLIF(regexp_extract(p_name, '([a-z]+)', 1), '') AS first_word,
          |  NULLIF(regexp_extract(p_name, '([a-z]+)$', 1), '') AS last_word,
          |  regexp_matches(p_type, '[A-Z]{2,}') AS has_caps_run,
          |  CAST(length(regexp_extract_all(p_name, '[aeiou]+', 0)) AS BIGINT) AS vowel_runs,
          |  regexp_replace(p_name, '[aeiou]', '_', 'g') AS devoweled
          |FROM part
          |ORDER BY p_partkey, first_word, last_word, has_caps_run,
          |  vowel_runs, devoweled""".stripMargin,
      // MERGE semantics as full outer join + update-wins selection
      "q68_merge_upsert" ->
        """WITH t AS (
          |  SELECT o_orderkey, o_custkey, o_totalprice FROM orders
          |  WHERE o_custkey % 2 = 0
          |), u AS (
          |  SELECT o_orderkey, o_custkey, ROUND(o_totalprice * 2, 2) AS o_totalprice
          |  FROM orders WHERE o_custkey % 3 = 0
          |)
          |SELECT COALESCE(t.o_orderkey, u.o_orderkey) AS o_orderkey,
          |  CASE WHEN u.o_orderkey IS NOT NULL THEN u.o_custkey ELSE t.o_custkey END AS o_custkey,
          |  CASE WHEN u.o_orderkey IS NOT NULL THEN u.o_totalprice ELSE t.o_totalprice END AS o_totalprice
          |FROM t FULL OUTER JOIN u ON t.o_orderkey = u.o_orderkey
          |ORDER BY o_orderkey, o_custkey, o_totalprice""".stripMargin,
      // the fake-decode frame count is pure arithmetic on payload size
      // (UTF-8 text bytes stand in for the encoded payload)
      "q69_frame_sample" ->
        """SELECT doc_id,
          |  1 + octet_length(encode(text)) % 30 AS n_frames,
          |  CAST(CEIL((1 + octet_length(encode(text)) % 30) / 4.0) AS BIGINT) AS n_sampled,
          |  CAST(0 AS BIGINT) AS first_idx,
          |  CAST(FLOOR((octet_length(encode(text)) % 30) / 4.0) AS BIGINT) * 4 AS last_idx
          |FROM documents WHERE doc_id % 3 = 2 AND text IS NOT NULL
          |ORDER BY doc_id, n_frames, n_sampled, first_idx, last_idx""".stripMargin,
      // same join semantics as the shuffling form — the bucketed layout
      // must change the PLAN (no exchange on the join), never the answer
      "q70_join_bucketed" ->
        s"""SELECT o_orderstatus, COUNT(*) AS n_items,
           |  ${exactSum("l_quantity")} AS sum_qty
           |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
           |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,
      // the deterministic IVF build+probe replayed end-to-end in SQL:
      // integer micro-unit Lloyd rounds, probe routing, cosine re-rank
      "q71_ivf_search" -> Ivf.deterministicOracleSql(),
      // SCD-2 from a change log: dedupe consecutive same-status rows
      // per key, then validity intervals via LEAD over the survivors
      "q72_scd2_history" ->
        """WITH ch AS (
          |  SELECT o_custkey, o_orderstatus, o_orderdate, o_orderkey,
          |    LAG(o_orderstatus) OVER w AS prev,
          |    LAG(TRUE) OVER w AS has_prev
          |  FROM orders
          |  WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
          |), kept AS (
          |  -- has_prev (not prev IS NULL) detects the first row of a
          |  -- key: a lagged NULL *attribute* must still compare via
          |  -- IS DISTINCT FROM, matching Spark's lagged-struct check
          |  SELECT o_custkey, o_orderstatus, o_orderdate, o_orderkey
          |  FROM ch WHERE has_prev IS NULL OR prev IS DISTINCT FROM o_orderstatus
          |)
          |SELECT o_custkey, o_orderstatus, o_orderdate AS valid_from,
          |  LEAD(o_orderdate) OVER w AS valid_to,
          |  LEAD(o_orderdate) OVER w IS NULL AS is_current
          |FROM kept
          |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
          |ORDER BY o_custkey, o_orderstatus, valid_from,
          |  valid_to NULLS FIRST, is_current""".stripMargin,
      // BM25: term-filter before aggregation, DECIMAL partial-score sum
      "q73_bm25" -> Ranking.bm25OracleSql(),
      // Gopher-style repetition signals: top token / bigram fractions
      "q74_repetition" ->
        """WITH toks AS (
          |  SELECT doc_id, string_split(text, ' ') AS s FROM documents
          |), t AS (
          |  SELECT doc_id, unnest(s) AS term FROM toks
          |), term_stats AS (
          |  SELECT doc_id, CAST(SUM(tf) AS BIGINT) AS n_tokens,
          |    COUNT(*) AS n_distinct, MAX(tf) AS top_tf
          |  FROM (SELECT doc_id, term, COUNT(*) AS tf FROM t
          |        GROUP BY doc_id, term)
          |  GROUP BY doc_id
          |), bg AS (
          |  SELECT doc_id, unnest(list_transform(range(1, len(s)),
          |    i -> s[i] || ' ' || s[i + 1])) AS bigram
          |  FROM toks
          |), bigram_stats AS (
          |  SELECT doc_id, SUM(bf) AS n_bigrams, MAX(bf) AS top_bf
          |  FROM (SELECT doc_id, bigram, COUNT(*) AS bf FROM bg
          |        GROUP BY doc_id, bigram)
          |  GROUP BY doc_id
          |)
          |SELECT ts.doc_id, ts.n_tokens,
          |  ROUND(ts.n_distinct / CAST(ts.n_tokens AS DOUBLE), 6) AS distinct_ratio,
          |  ROUND(ts.top_tf / CAST(ts.n_tokens AS DOUBLE), 6) AS top_token_frac,
          |  COALESCE(ROUND(bs.top_bf / CAST(bs.n_bigrams AS DOUBLE), 6), 0.0)
          |    AS top_bigram_frac
          |FROM term_stats ts LEFT JOIN bigram_stats bs USING (doc_id)
          |ORDER BY doc_id, n_tokens, distinct_ratio, top_token_frac,
          |  top_bigram_frac""".stripMargin,
      // passage dedup: 8-token chunks, corpus-wide first occurrence wins
      "q75_passage_dedup" ->
        """WITH toks AS (
          |  SELECT doc_id, string_split(text, ' ') AS s FROM documents
          |), cid AS (
          |  SELECT doc_id, s,
          |    unnest(range(0, (len(s) + 7) // 8)) AS cidx
          |  FROM toks
          |), chunks AS (
          |  SELECT doc_id, cidx,
          |    array_to_string(list_slice(s, cidx * 8 + 1, cidx * 8 + 8), ' ') AS chunk
          |  FROM cid
          |), marked AS (
          |  SELECT doc_id, cidx,
          |    CASE WHEN ROW_NUMBER() OVER (PARTITION BY chunk
          |      ORDER BY doc_id, cidx) = 1 THEN 1 ELSE 0 END AS kept
          |  FROM chunks
          |)
          |SELECT doc_id, COUNT(*) AS n_chunks,
          |  CAST(SUM(kept) AS BIGINT) AS n_kept,
          |  ROUND(SUM(kept) / CAST(COUNT(*) AS DOUBLE), 6) AS kept_frac
          |FROM marked GROUP BY doc_id
          |ORDER BY doc_id, n_chunks, n_kept, kept_frac""".stripMargin,
      // int8 scalar-quantized ANN: integer candidate cut + cosine re-rank
      "q76_sq_ann" -> Similarity.sqAnnOracleSql(),
      // corpus n-gram LM statistics: top-50 token trigrams
      "q77_ngram_counts" ->
        """WITH toks AS (
          |  SELECT doc_id, string_split(text, ' ') AS s FROM documents
          |), tg AS (
          |  SELECT doc_id, unnest(list_transform(range(1, len(s) - 1),
          |    i -> s[i] || ' ' || s[i + 1] || ' ' || s[i + 2])) AS ngram
          |  FROM toks
          |)
          |SELECT ngram, COUNT(*) AS n_occurrences,
          |  COUNT(DISTINCT doc_id) AS n_docs
          |FROM tg GROUP BY ngram
          |ORDER BY n_occurrences DESC, ngram LIMIT 50""".stripMargin,
      // per-doc top-3 TF-IDF keywords, score rounded before the rank cut
      "q78_tfidf_keywords" ->
        """WITH stats AS (SELECT COUNT(*) AS n FROM documents),
          |tf AS (
          |  SELECT doc_id, term, COUNT(*) AS tf
          |  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS term
          |        FROM documents)
          |  GROUP BY doc_id, term
          |), scored AS (
          |  SELECT doc_id, term,
          |    ROUND(tf * LN(stats.n /
          |      CAST(COUNT(*) OVER (PARTITION BY term) AS DOUBLE)), 6) AS tfidf
          |  FROM tf CROSS JOIN stats
          |)
          |SELECT doc_id,
          |  CAST(ROW_NUMBER() OVER (PARTITION BY doc_id
          |    ORDER BY tfidf DESC, term) AS BIGINT) AS rk,
          |  term, tfidf
          |FROM scored
          |QUALIFY rk <= 3
          |ORDER BY doc_id, rk, term, tfidf""".stripMargin,
      // greedy training-sequence packing: doc joins the sequence where
      // its first token lands; cumsum windowed per source shard
      "q79_pack_sequences" ->
        """WITH dl AS (
          |  SELECT source, doc_id,
          |    CAST(len(string_split(text, ' ')) AS BIGINT) AS dl
          |  FROM documents
          |), pos AS (
          |  SELECT source, doc_id, dl,
          |    SUM(dl) OVER (PARTITION BY source ORDER BY doc_id
          |      ROWS UNBOUNDED PRECEDING) - dl AS start_tok
          |  FROM dl
          |)
          |SELECT source, CAST(FLOOR(start_tok / 512.0) AS BIGINT) AS seq_id,
          |  COUNT(*) AS n_docs, CAST(SUM(dl) AS BIGINT) AS n_tokens,
          |  MIN(doc_id) AS first_doc, MAX(doc_id) AS last_doc
          |FROM pos GROUP BY source, seq_id
          |ORDER BY source, seq_id, n_docs, n_tokens, first_doc,
          |  last_doc""".stripMargin,
      // distribution window family; unique (price, orderkey) ordering
      // keeps NTILE's row numbering deterministic under price ties
      "q80_window_dist" ->
        """SELECT o_custkey, o_orderkey, o_totalprice,
          |  CAST(NTILE(4) OVER w AS BIGINT) AS quartile,
          |  ROUND(PERCENT_RANK() OVER w, 6) AS pct_rank,
          |  ROUND(CUME_DIST() OVER w, 6) AS cume,
          |  NTH_VALUE(o_totalprice, 2) OVER
          |    (PARTITION BY o_custkey ORDER BY o_totalprice, o_orderkey
          |     ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
          |    AS second_price
          |FROM orders
          |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice, o_orderkey)
          |ORDER BY o_custkey, o_orderkey, o_totalprice, quartile,
          |  pct_rank, cume, second_price NULLS FIRST""".stripMargin,
      // blocked fuzzy match: first-token blocking + levenshtein verify
      "q81_fuzzy_match" ->
        """WITH names AS (
          |  SELECT DISTINCT p_name, string_split(p_name, ' ')[1] AS blk
          |  FROM part
          |)
          |SELECT a.p_name AS name_a, b.p_name AS name_b,
          |  CAST(levenshtein(a.p_name, b.p_name) AS BIGINT) AS edit_dist
          |FROM names a JOIN names b ON a.blk = b.blk AND a.p_name < b.p_name
          |WHERE levenshtein(a.p_name, b.p_name) <= 3
          |ORDER BY name_a, name_b, edit_dist""".stripMargin,
      // TPC-H Q5 shape: local supply chains per nation, one region/year
      "q82_regional_revenue" ->
        s"""SELECT n_name,
           |  CAST(SUM(${revenueTerm("l_extendedprice", "l_discount")}) AS DOUBLE) AS revenue
           |FROM lineitem
           |JOIN orders ON l_orderkey = o_orderkey
           |JOIN customer ON o_custkey = c_custkey
           |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
           |JOIN nation ON s_nationkey = n_nationkey
           |JOIN region ON n_regionkey = r_regionkey
           |WHERE r_name = 'ASIA'
           |  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
           |  AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
           |GROUP BY n_name
           |ORDER BY revenue DESC, n_name""".stripMargin,
      // SimHash with the FNV+splitmix token hash: full bit-level replay
      "q83_simhash_det" -> HashSql.simhashDetOracle,
      // k-mins sketch: HLL's build->merge topology, fully replayable
      "q84_kmv_sketch" -> HashSql.kmvSketchOracle(),
      // CDC snapshot diff: synthetic old/new snapshots of orders;
      // +100.0 is an exact double add, identical in both engines
      "q85_snapshot_cdc" ->
        """WITH a AS (SELECT * FROM orders WHERE o_orderkey % 11 <> 0),
          |b AS (SELECT o_orderkey, o_custkey, o_orderstatus,
          |        CASE WHEN o_orderkey % 7 = 0 THEN o_totalprice + 100.0
          |             ELSE o_totalprice END AS o_totalprice,
          |        o_orderdate, o_orderpriority
          |      FROM orders WHERE o_orderkey % 13 <> 0)
          |SELECT COALESCE(a.o_orderkey, b.o_orderkey) AS o_orderkey,
          |  CASE WHEN a.o_orderkey IS NULL THEN 'I'
          |       WHEN b.o_orderkey IS NULL THEN 'D'
          |       ELSE 'U' END AS change,
          |  a.o_totalprice AS old_price, b.o_totalprice AS new_price
          |FROM a FULL JOIN b ON a.o_orderkey = b.o_orderkey
          |WHERE a.o_orderkey IS NULL OR b.o_orderkey IS NULL
          |   OR a.o_custkey IS DISTINCT FROM b.o_custkey
          |   OR a.o_orderstatus IS DISTINCT FROM b.o_orderstatus
          |   OR a.o_totalprice IS DISTINCT FROM b.o_totalprice
          |   OR a.o_orderdate IS DISTINCT FROM b.o_orderdate
          |   OR a.o_orderpriority IS DISTINCT FROM b.o_orderpriority
          |ORDER BY o_orderkey, change,
          |  old_price NULLS FIRST, new_price NULLS FIRST""".stripMargin,
      // lateral correlated subquery with per-group ORDER BY + LIMIT:
      // DuckDB runs the same lateral text
      "q86_lateral_topn" ->
        """SELECT c_custkey, t.o_orderkey, t.o_totalprice
          |FROM customer CROSS JOIN LATERAL (
          |  SELECT o_orderkey, o_totalprice FROM orders
          |  WHERE o_custkey = c_custkey
          |  ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) t
          |ORDER BY c_custkey, o_orderkey, o_totalprice""".stripMargin,
      // gap-fill + LOCF: per-user hourly spine (generate_series is
      // inclusive-inclusive, same as Spark's sequence); the carried
      // value stays DECIMAL until the final cast
      "q87_gap_fill" ->
        """WITH hourly AS (
          |  SELECT user_id, date_trunc('hour', ts) AS hour,
          |    SUM(CAST(value AS DECIMAL(18,2))) AS sv, COUNT(*) AS n_events
          |  FROM events GROUP BY 1, 2),
          |spine AS (
          |  SELECT user_id,
          |    UNNEST(generate_series(mn, mx, INTERVAL 1 HOUR)) AS hour
          |  FROM (SELECT user_id, MIN(hour) AS mn, MAX(hour) AS mx
          |        FROM hourly GROUP BY user_id)),
          |joined AS (
          |  SELECT s.user_id, s.hour, COALESCE(h.n_events, 0) AS n_events, h.sv
          |  FROM spine s LEFT JOIN hourly h
          |    ON s.user_id = h.user_id AND s.hour = h.hour)
          |SELECT user_id, hour, n_events,
          |  CAST(LAST_VALUE(sv IGNORE NULLS) OVER (
          |    PARTITION BY user_id ORDER BY hour
          |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
          |    AS filled_value
          |FROM joined
          |ORDER BY user_id, hour, n_events, filled_value""".stripMargin,
      // per-day session concurrency: sessions replayed from the gap
      // rule (new session when gap >= 30 min; end = last event + 30
      // min), clipped at day boundaries, +1/-1 sweep; ends sort
      // before starts at equal t (half-open intervals)
      "q88_concurrency" ->
        """WITH marks AS (
          |  SELECT user_id, ts,
          |    CASE WHEN LAG(ts) OVER w IS NULL
          |              OR ts - LAG(ts) OVER w >= INTERVAL 30 MINUTE
          |         THEN 1 ELSE 0 END AS new_s
          |  FROM events
          |  WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
          |sids AS (
          |  SELECT user_id, ts,
          |    SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts
          |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
          |  FROM marks),
          |sessions AS (
          |  SELECT user_id, sid, MIN(ts) AS s_start,
          |    MAX(ts) + INTERVAL 30 MINUTE AS s_end
          |  FROM sids GROUP BY 1, 2),
          |segs AS (
          |  SELECT s_start, s_end,
          |    UNNEST(generate_series(date_trunc('day', s_start),
          |      date_trunc('day', s_end), INTERVAL 1 DAY)) AS day
          |  FROM sessions),
          |clip AS (
          |  SELECT day, GREATEST(s_start, day) AS cs,
          |    LEAST(s_end, day + INTERVAL 1 DAY) AS ce
          |  FROM segs),
          |pts AS (
          |  SELECT day, cs AS t, CAST(1 AS BIGINT) AS delta FROM clip
          |  UNION ALL
          |  SELECT day, ce AS t, CAST(-1 AS BIGINT) AS delta FROM clip),
          |run AS (
          |  SELECT day, delta,
          |    SUM(delta) OVER (PARTITION BY day ORDER BY t, delta
          |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS c
          |  FROM pts)
          |SELECT day,
          |  CAST(SUM(CASE WHEN delta = 1 THEN 1 ELSE 0 END) AS BIGINT)
          |    AS n_sessions,
          |  CAST(MAX(c) AS BIGINT) AS max_concurrent
          |FROM run GROUP BY day
          |ORDER BY day, n_sessions, max_concurrent""".stripMargin,
      // leakage-safe split: full FNV+splitmix bit-level replay
      "q89_group_split" -> HashSql.groupSplitOracle(),
      // weighted Bernoulli keep: pure integer compare on both sides
      "q90_weighted_sample" ->
        s"""SELECT doc_id, n_chars,
           |  ${Sampling.idBucketSql("doc_id")} AS keep_bucket
           |FROM documents
           |WHERE ${Sampling.idBucketSql("doc_id")} * 2000
           |      < LEAST(n_chars, 2000) * ${Sampling.Prime}
           |ORDER BY doc_id, n_chars, keep_bucket""".stripMargin,
      // weekly cohort retention; all rates are integer ppm (no float
      // division); date_diff('day', a, b) = Spark datediff(b, a)
      "q91_cohort_retention" ->
        """WITH activity AS (
          |  SELECT DISTINCT user_id, date_trunc('week', ts) AS week
          |  FROM events),
          |cohorts AS (
          |  SELECT user_id, MIN(week) AS cohort_week
          |  FROM activity GROUP BY user_id),
          |sizes AS (
          |  SELECT cohort_week, COUNT(*) AS cohort_size
          |  FROM cohorts GROUP BY cohort_week),
          |grid AS (
          |  SELECT c.cohort_week,
          |    date_diff('day', c.cohort_week, a.week) // 7 AS week_offset,
          |    COUNT(*) AS active_users
          |  FROM activity a JOIN cohorts c ON a.user_id = c.user_id
          |  GROUP BY 1, 2)
          |SELECT g.cohort_week, g.week_offset, s.cohort_size,
          |  g.active_users,
          |  (g.active_users * 1000000) // s.cohort_size AS retention_ppm
          |FROM grid g JOIN sizes s ON g.cohort_week = s.cohort_week
          |ORDER BY g.cohort_week, week_offset, cohort_size, active_users,
          |  retention_ppm""".stripMargin,
      // ordered 3-step funnel; each step strictly after the previous
      // step's first completion; conversion in integer ppm
      "q92_funnel" ->
        """WITH s1 AS (
          |  SELECT user_id, MIN(ts) AS t1 FROM events
          |  WHERE event_type = 'signup' GROUP BY user_id),
          |s2 AS (
          |  SELECT e.user_id, MIN(e.ts) AS t2
          |  FROM events e JOIN s1 ON e.user_id = s1.user_id
          |  WHERE e.event_type = 'view' AND e.ts > s1.t1
          |  GROUP BY e.user_id),
          |s3 AS (
          |  SELECT e.user_id, MIN(e.ts) AS t3
          |  FROM events e JOIN s2 ON e.user_id = s2.user_id
          |  WHERE e.event_type = 'purchase' AND e.ts > s2.t2
          |  GROUP BY e.user_id),
          |counts AS (
          |  SELECT 1 AS step, 'signup' AS stage, COUNT(*) AS users FROM s1
          |  UNION ALL
          |  SELECT 2, 'view', COUNT(*) FROM s2
          |  UNION ALL
          |  SELECT 3, 'purchase', COUNT(*) FROM s3),
          |conv AS (
          |  SELECT step, stage, users,
          |    COALESCE(LAG(users) OVER (ORDER BY step), users) AS prev_users
          |  FROM counts)
          |SELECT CAST(step AS BIGINT) AS step, stage, users,
          |  CASE WHEN prev_users = 0 THEN CAST(1000000 AS BIGINT)
          |       ELSE (users * 1000000) // prev_users END AS conv_ppm
          |FROM conv
          |ORDER BY step, stage, users, conv_ppm""".stripMargin,
      // first-order event-type transition matrix; event_id breaks ts
      // ties so the per-user sequence is total on both engines
      "q93_transitions" ->
        """WITH pairs AS (
          |  SELECT event_type AS from_type,
          |    LEAD(event_type) OVER (
          |      PARTITION BY user_id ORDER BY ts, event_id) AS to_type
          |  FROM events),
          |m AS (
          |  SELECT from_type, to_type, COUNT(*) AS n FROM pairs
          |  WHERE to_type IS NOT NULL GROUP BY 1, 2)
          |SELECT from_type, to_type, n,
          |  (n * 1000000) //
          |    CAST(SUM(n) OVER (PARTITION BY from_type) AS BIGINT)
          |    AS prob_ppm
          |FROM m
          |ORDER BY from_type, to_type, n, prob_ppm""".stripMargin,
      // two-sided z-score outliers (|z| >= 1.8), cross-multiplied to
      // pure integer arithmetic (HUGEINT = DECIMAL(38,0) Spark-side):
      // (x·n − s)²·(n−1)·25 >= 81·n·(n·ss − s²)
      "q94_outliers" ->
        s"""WITH li AS (
           |  SELECT l_suppkey, l_orderkey, l_linenumber,
           |    ${Profiling.centsSql("l_extendedprice")} AS price_cents
           |  FROM lineitem),
           |m AS (
           |  SELECT l_suppkey, COUNT(*) AS n,
           |    CAST(SUM(price_cents) AS BIGINT) AS s,
           |    SUM(CAST(price_cents AS HUGEINT) * price_cents) AS ss
           |  FROM li GROUP BY l_suppkey)
           |SELECT li.l_suppkey AS l_suppkey, l_orderkey, l_linenumber,
           |  price_cents,
           |  CASE WHEN CAST(price_cents AS HUGEINT) * n - s > 0
           |       THEN 'high' ELSE 'low' END AS side
           |FROM li JOIN m ON li.l_suppkey = m.l_suppkey
           |WHERE n >= 3
           |  AND CAST(n AS HUGEINT) * ss - CAST(s AS HUGEINT) * s > 0
           |  AND (CAST(price_cents AS HUGEINT) * n - s)
           |      * (CAST(price_cents AS HUGEINT) * n - s) * (n - 1) * 25
           |      >= (CAST(n AS HUGEINT) * ss - CAST(s AS HUGEINT) * s)
           |         * 81 * n
           |ORDER BY l_suppkey, l_orderkey, l_linenumber, price_cents,
           |  side""".stripMargin,
      // one-row-per-column profile of orders; numeric min/max as
      // double, string/date columns NULL
      "q95_profile" -> {
        def row(c: String, numeric: Boolean): String = {
          val mn = if (numeric) s"CAST(MIN($c) AS DOUBLE)"
                   else "CAST(NULL AS DOUBLE)"
          val mx = if (numeric) s"CAST(MAX($c) AS DOUBLE)"
                   else "CAST(NULL AS DOUBLE)"
          s"""SELECT '$c' AS column_name,
             |  COUNT(*) - COUNT($c) AS n_nulls,
             |  COUNT(DISTINCT $c) AS n_distinct,
             |  $mn AS min_v, $mx AS max_v FROM orders""".stripMargin
        }
        Seq(row("o_custkey", numeric = true),
          row("o_orderdate", numeric = false),
          row("o_orderkey", numeric = true),
          row("o_orderpriority", numeric = false),
          row("o_orderstatus", numeric = false),
          row("o_totalprice", numeric = true))
          .mkString("", "\nUNION ALL\n", "\nORDER BY column_name")
      },
      // sparse fixed-width histogram over integer cents
      "q96_histogram" ->
        s"""WITH c AS (
           |  SELECT ${Profiling.centsSql("o_totalprice")} AS c FROM orders)
           |SELECT LEAST((c * 24) // 60000000, 23) AS bin,
           |  COUNT(*) AS n, CAST(SUM(c) AS BIGINT) AS sum_cents
           |FROM c GROUP BY 1
           |ORDER BY bin, n, sum_cents""".stripMargin,
      // per-supplier Pareto frontier: strict running-max rule, output
      // set invariant to tie order within equal (p,q)
      "q97_pareto" ->
        s"""WITH li AS (
           |  SELECT l_suppkey,
           |    ${Profiling.centsSql("l_extendedprice")} AS p_cents,
           |    ${Profiling.centsSql("l_quantity")} AS q_cents
           |  FROM lineitem),
           |r AS (
           |  SELECT l_suppkey, p_cents, q_cents,
           |    MAX(q_cents) OVER (PARTITION BY l_suppkey
           |      ORDER BY p_cents ASC, q_cents DESC
           |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS mq
           |  FROM li)
           |SELECT l_suppkey, p_cents, q_cents FROM r
           |WHERE mq IS NULL OR q_cents > mq
           |ORDER BY l_suppkey, p_cents, q_cents""".stripMargin,
      // per-node triangle counts over the q44 near-dup edge set
      "q98_triangles" ->
        """WITH edges AS (
          |  SELECT a.vec_id AS a, b.vec_id AS b
          |  FROM embeddings a JOIN embeddings b
          |    ON a.vec_id < b.vec_id AND a.vec_id < 200 AND b.vec_id < 200
          |  WHERE ROUND(LIST_INNER_PRODUCT(CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])) /
          |    (SQRT(LIST_INNER_PRODUCT(CAST(a.embedding AS DOUBLE[]), CAST(a.embedding AS DOUBLE[]))) *
          |     SQRT(LIST_INNER_PRODUCT(CAST(b.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])))), 6) >= 0.2),
          |tri AS (
          |  SELECT e1.a AS a, e1.b AS b, e2.b AS c
          |  FROM edges e1
          |  JOIN edges e2 ON e1.b = e2.a
          |  JOIN edges e3 ON e3.a = e1.a AND e3.b = e2.b),
          |corners AS (
          |  SELECT a AS vec_id FROM tri
          |  UNION ALL SELECT b FROM tri
          |  UNION ALL SELECT c FROM tri)
          |SELECT vec_id, COUNT(*) AS n_triangles
          |FROM corners GROUP BY vec_id
          |ORDER BY vec_id, n_triangles""".stripMargin,
      // exact-moment Pearson correlation: HUGEINT moments = Spark
      // DECIMAL(38,0); the final r is one fixed IEEE op sequence on
      // identical inputs, rounded to 6
      "q99_corr" ->
        s"""WITH li AS (
           |  SELECT l_returnflag,
           |    ${Profiling.centsSql("l_quantity")} AS x,
           |    ${Profiling.centsSql("l_extendedprice")} AS y
           |  FROM lineitem),
           |m AS (
           |  SELECT l_returnflag, COUNT(*) AS n,
           |    SUM(CAST(x AS HUGEINT)) AS sx, SUM(CAST(y AS HUGEINT)) AS sy,
           |    SUM(CAST(x AS HUGEINT) * y) AS sxy,
           |    SUM(CAST(x AS HUGEINT) * x) AS sxx,
           |    SUM(CAST(y AS HUGEINT) * y) AS syy
           |  FROM li GROUP BY 1)
           |SELECT l_returnflag, n,
           |  ROUND(CAST(n * sxy - sx * sy AS DOUBLE) /
           |    SQRT(CAST(n * sxx - sx * sx AS DOUBLE) *
           |         CAST(n * syy - sy * sy AS DOUBLE)), 6) AS corr_qp
           |FROM m ORDER BY l_returnflag, n, corr_qp""".stripMargin,
      // winsorized sum: percentile boundaries rounded to 6 BEFORE the
      // clip on both sides; clipped values sum exactly in DECIMAL(24,6)
      // nearest-rank bounds over integer cents: ceil(n/20) /
      // ceil(19n/20) order statistics via a cumulative-count walk —
      // no float interpolation on either engine, exact by construction
      "q100_winsorize" ->
        s"""WITH li AS (
           |  SELECT l_returnflag,
           |    ${Profiling.centsSql("l_extendedprice")} AS c FROM lineitem),
           |counts AS (
           |  SELECT l_returnflag, c, COUNT(*) AS cnt FROM li GROUP BY 1, 2),
           |ranked AS (
           |  SELECT l_returnflag, c,
           |    SUM(cnt) OVER (PARTITION BY l_returnflag ORDER BY c) AS cum,
           |    SUM(cnt) OVER (PARTITION BY l_returnflag) AS n
           |  FROM counts),
           |b AS (
           |  SELECT l_returnflag,
           |    MIN(CASE WHEN cum >= (n + 19) // 20 THEN c END) AS b_lo,
           |    MIN(CASE WHEN cum >= (19 * n + 19) // 20 THEN c END) AS b_hi
           |  FROM ranked GROUP BY 1)
           |SELECT li.l_returnflag AS l_returnflag, COUNT(*) AS n,
           |  CAST(SUM(LEAST(GREATEST(c, b_lo), b_hi)) AS BIGINT)
           |    AS wins_sum_cents,
           |  CAST(SUM(CASE WHEN c < b_lo THEN 1 ELSE 0 END) AS BIGINT)
           |    AS n_clipped_lo,
           |  CAST(SUM(CASE WHEN c > b_hi THEN 1 ELSE 0 END) AS BIGINT)
           |    AS n_clipped_hi
           |FROM li JOIN b ON li.l_returnflag = b.l_returnflag
           |GROUP BY li.l_returnflag
           |ORDER BY l_returnflag, n, wins_sum_cents, n_clipped_lo,
           |  n_clipped_hi""".stripMargin,
      // statistical mode with deterministic (count desc, value asc)
      // tie-break
      "q101_mode" ->
        s"""WITH counts AS (
           |  SELECT l_returnflag,
           |    ${Profiling.centsSql("l_quantity")} AS q_cents,
           |    COUNT(*) AS n
           |  FROM lineitem GROUP BY 1, 2),
           |r AS (
           |  SELECT l_returnflag, q_cents, n,
           |    ROW_NUMBER() OVER (PARTITION BY l_returnflag
           |      ORDER BY n DESC, q_cents ASC) AS rn
           |  FROM counts)
           |SELECT l_returnflag, q_cents AS mode_q_cents, n
           |FROM r WHERE rn = 1
           |ORDER BY l_returnflag, mode_q_cents, n""".stripMargin,
      // CUSUM multiplied through by the series length: pure BIGINT,
      // no rational mean
      "q102_cusum" ->
        """WITH daily AS (
          |  SELECT event_type, date_trunc('day', ts) AS day,
          |    CAST(SUM(CAST(CAST(value AS DECIMAL(18,6)) * 1000000
          |      AS BIGINT)) AS BIGINT) AS d_micro
          |  FROM events GROUP BY 1, 2),
          |r AS (
          |  SELECT event_type, day, d_micro,
          |    COUNT(*) OVER (PARTITION BY event_type) AS t_len,
          |    CAST(SUM(d_micro) OVER (PARTITION BY event_type) AS BIGINT)
          |      AS total,
          |    CAST(SUM(d_micro) OVER (PARTITION BY event_type ORDER BY day
          |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
          |      AS BIGINT) AS run_sum,
          |    ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY day)
          |      AS t_idx
          |  FROM daily)
          |SELECT event_type, day, d_micro,
          |  t_len * run_sum - t_idx * total AS cusum_scaled
          |FROM r
          |ORDER BY event_type, day, d_micro, cusum_scaled""".stripMargin,
      // Benford first digit via decimal string form — no float log
      "q103_benford" ->
        s"""WITH counts AS (
           |  SELECT CAST(SUBSTR(CAST(c AS VARCHAR), 1, 1) AS BIGINT)
           |    AS digit, COUNT(*) AS n
           |  FROM (SELECT ${Profiling.centsSql("o_totalprice")} AS c
           |        FROM orders)
           |  WHERE c > 0 GROUP BY 1)
           |SELECT digit, n,
           |  (n * 1000000) // CAST(SUM(n) OVER () AS BIGINT) AS share_ppm
           |FROM counts ORDER BY digit, n, share_ppm""".stripMargin,
      // per-cell chi-square contribution: (N·n − r·c)²/(N·r·c), one
      // double division over exact integers (HUGEINT = DECIMAL(38,0))
      "q104_contingency" ->
        """WITH cells AS (
          |  SELECT l_returnflag, l_linestatus, COUNT(*) AS n
          |  FROM lineitem GROUP BY 1, 2),
          |t AS (
          |  SELECT l_returnflag, l_linestatus, n,
          |    CAST(SUM(n) OVER (PARTITION BY l_returnflag) AS BIGINT)
          |      AS row_total,
          |    CAST(SUM(n) OVER (PARTITION BY l_linestatus) AS BIGINT)
          |      AS col_total,
          |    CAST(SUM(n) OVER () AS BIGINT) AS grand_total
          |  FROM cells)
          |SELECT l_returnflag, l_linestatus, n, row_total, col_total,
          |  grand_total,
          |  ROUND(CAST((CAST(grand_total AS HUGEINT) * n
          |      - CAST(row_total AS HUGEINT) * col_total)
          |    * (CAST(grand_total AS HUGEINT) * n
          |      - CAST(row_total AS HUGEINT) * col_total) AS DOUBLE) /
          |    CAST(CAST(grand_total AS HUGEINT) * row_total * col_total
          |      AS DOUBLE), 6) AS chi_cell
          |FROM t
          |ORDER BY l_returnflag, l_linestatus, n, row_total, col_total,
          |  grand_total, chi_cell""".stripMargin,
      // floored running balance: the fold replayed as a per-user
      // recursive CTE stepping the row_number index (q65 pattern)
      "q105_capped_balance" ->
        """WITH RECURSIVE seq AS (
          |  SELECT user_id, event_id,
          |    CAST(CAST(value AS DECIMAL(18,6)) * 1000000 AS BIGINT)
          |      - 50000000 AS delta_micro,
          |    ROW_NUMBER() OVER (PARTITION BY user_id
          |      ORDER BY ts, event_id) AS i
          |  FROM events),
          |bal AS (
          |  SELECT user_id, event_id, delta_micro, i,
          |    GREATEST(delta_micro, 0) AS balance_micro
          |  FROM seq WHERE i = 1
          |  UNION ALL
          |  SELECT s.user_id, s.event_id, s.delta_micro, s.i,
          |    GREATEST(b.balance_micro + s.delta_micro, 0)
          |  FROM bal b JOIN seq s
          |    ON s.user_id = b.user_id AND s.i = b.i + 1)
          |SELECT user_id, event_id, delta_micro, balance_micro FROM bal
          |ORDER BY user_id, event_id, delta_micro,
          |  balance_micro""".stripMargin,
      // balanced domain mix: deterministic hash-order cap per source
      "q106_balanced_mix" ->
        s"""SELECT doc_id, source, CAST(rn AS BIGINT) AS pick_rank FROM (
           |  SELECT doc_id, source,
           |    ROW_NUMBER() OVER (PARTITION BY source
           |      ORDER BY ${Sampling.idBucketSql("doc_id")}, doc_id) AS rn
           |  FROM documents) WHERE rn <= 60
           |ORDER BY doc_id, source, pick_rank""".stripMargin,
      // exact-integer Gini in ppm: rank-weighted form, tie-safe
      "q107_gini" ->
        s"""WITH rev AS (
           |  SELECT l_suppkey, CAST(SUM(${Profiling.centsSql(
                 "l_extendedprice")}) AS BIGINT) AS x
           |  FROM lineitem GROUP BY l_suppkey),
           |ranked AS (
           |  SELECT s_nationkey, x,
           |    ROW_NUMBER() OVER (PARTITION BY s_nationkey
           |      ORDER BY x ASC, l_suppkey ASC) AS i
           |  FROM rev JOIN supplier ON l_suppkey = s_suppkey),
           |g AS (
           |  SELECT s_nationkey, COUNT(*) AS n_suppliers,
           |    SUM(CAST(x AS HUGEINT)) AS sx,
           |    SUM((2 * CAST(i AS HUGEINT) - 1) * x) AS wsum
           |  FROM ranked GROUP BY s_nationkey)
           |SELECT s_nationkey, n_suppliers,
           |  CAST((wsum - n_suppliers * sx) * 1000000
           |    // (n_suppliers * sx) AS BIGINT) AS gini_ppm
           |FROM g
           |ORDER BY s_nationkey, n_suppliers, gini_ppm""".stripMargin,
      // least-squares slope/intercept from exact integer moments; one
      // double division each, rounded to 6
      "q108_trend" ->
        s"""WITH li AS (
           |  SELECT l_returnflag,
           |    date_diff('day', DATE '1970-01-01',
           |      CAST(l_shipdate AS DATE)) AS x,
           |    ${Profiling.centsSql("l_extendedprice")} AS y
           |  FROM lineitem),
           |m AS (
           |  SELECT l_returnflag, COUNT(*) AS n,
           |    SUM(CAST(x AS HUGEINT)) AS sx, SUM(CAST(y AS HUGEINT)) AS sy,
           |    SUM(CAST(x AS HUGEINT) * y) AS sxy,
           |    SUM(CAST(x AS HUGEINT) * x) AS sxx
           |  FROM li GROUP BY 1)
           |SELECT l_returnflag, n,
           |  ROUND(CAST(n * sxy - sx * sy AS DOUBLE) /
           |    CAST(n * sxx - sx * sx AS DOUBLE), 6)
           |    AS slope_cents_per_day,
           |  ROUND(CAST(sy * sxx - sx * sxy AS DOUBLE) /
           |    CAST(n * sxx - sx * sx AS DOUBLE), 6) AS intercept_cents
           |FROM m
           |ORDER BY l_returnflag, n, slope_cents_per_day,
           |  intercept_cents""".stripMargin,
      // mergeable histogram quantiles: daily bin counts sum to weekly,
      // rank = ceil(p·total) by integer cross-multiply
      "q109_histo_quantiles" ->
        """WITH daily AS (
          |  SELECT date_trunc('week', o_orderdate) AS week,
          |    date_trunc('day', o_orderdate) AS day,
          |    LEAST(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
          |      AS BIGINT) // 16384, 4095) AS bin,
          |    COUNT(*) AS n
          |  FROM orders GROUP BY 1, 2, 3),
          |weekly AS (
          |  SELECT week, bin, CAST(SUM(n) AS BIGINT) AS n
          |  FROM daily GROUP BY 1, 2),
          |walk AS (
          |  SELECT week, bin, n,
          |    CAST(SUM(n) OVER (PARTITION BY week ORDER BY bin
          |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
          |      AS BIGINT) AS cum,
          |    CAST(SUM(n) OVER (PARTITION BY week) AS BIGINT) AS total
          |  FROM weekly)
          |SELECT week, total,
          |  MIN(CASE WHEN cum * 2 >= total THEN bin * 16384 END)
          |    AS p50_lo_cents,
          |  MIN(CASE WHEN cum * 20 >= total * 19 THEN bin * 16384 END)
          |    AS p95_lo_cents
          |FROM walk GROUP BY week, total
          |ORDER BY week, total, p50_lo_cents, p95_lo_cents""".stripMargin,
      // per-dimension z-score over the exact micro-unit lattice; the
      // final fold mirrors the Spark op symbol for symbol
      "q110_embed_standardize" ->
        """WITH flat AS (
          |  SELECT vec_id, CAST(i - 1 AS BIGINT) AS pos,
          |    CAST(CAST(CAST(embedding[i] AS DOUBLE) AS DECIMAL(18,6))
          |      * 1000000 AS BIGINT) AS m
          |  FROM embeddings, GENERATE_SERIES(1, 64) s(i)),
          |moments AS (
          |  SELECT pos, COUNT(*) AS n, SUM(CAST(m AS HUGEINT)) AS s,
          |    SUM(CAST(m AS HUGEINT) * m) AS ss
          |  FROM flat GROUP BY pos)
          |SELECT f.vec_id AS vec_id, f.pos AS pos,
          |  CASE WHEN n * ss - s * s = 0 THEN 0.0
          |  ELSE ROUND(CAST(CAST(f.m AS HUGEINT) * n - s AS DOUBLE) /
          |    SQRT(CAST((n * ss - s * s) * n AS DOUBLE) /
          |         CAST(n - 1 AS DOUBLE)), 6) END AS z
          |FROM flat f JOIN moments mo ON f.pos = mo.pos
          |ORDER BY vec_id, pos, z""".stripMargin,
      // functional-dependency audit rows
      "q111_fd_check" ->
        """WITH fd1 AS (
          |  SELECT l_orderkey AS k, COUNT(DISTINCT l_shipdate) AS c
          |  FROM lineitem GROUP BY 1),
          |fd2 AS (
          |  SELECT o_orderkey AS k, COUNT(DISTINCT o_custkey) AS c
          |  FROM orders GROUP BY 1)
          |SELECT 'l_orderkey->l_shipdate' AS dependency,
          |  COUNT(*) AS n_keys,
          |  CAST(SUM(CASE WHEN c > 1 THEN 1 ELSE 0 END) AS BIGINT)
          |    AS n_violating FROM fd1
          |UNION ALL
          |SELECT 'o_orderkey->o_custkey', COUNT(*),
          |  CAST(SUM(CASE WHEN c > 1 THEN 1 ELSE 0 END) AS BIGINT)
          |  FROM fd2
          |ORDER BY dependency, n_keys, n_violating""".stripMargin,
      // referential-integrity audit: per-FK orphan counts
      "q112_ri_audit" -> {
        def edge(name: String, child: String, fk: String, parent: String,
            pk: String): String =
          s"""SELECT '$name' AS fk_edge,
             |  (SELECT COUNT(*) FROM $child) AS n_rows,
             |  (SELECT COUNT(*) FROM $child c
             |   WHERE NOT EXISTS (SELECT 1 FROM $parent p
             |                     WHERE c.$fk = p.$pk)) AS n_orphans""".stripMargin
        Seq(
          edge("customer.c_nationkey->nation", "customer", "c_nationkey",
            "nation", "n_nationkey"),
          edge("lineitem.l_orderkey->orders", "lineitem", "l_orderkey",
            "orders", "o_orderkey"),
          edge("lineitem.l_partkey->part", "lineitem", "l_partkey",
            "part", "p_partkey"),
          edge("lineitem.l_suppkey->supplier", "lineitem", "l_suppkey",
            "supplier", "s_suppkey"),
          edge("orders.o_custkey->customer", "orders", "o_custkey",
            "customer", "c_custkey"),
          edge("supplier.s_nationkey->nation", "supplier", "s_nationkey",
            "nation", "n_nationkey"))
          .mkString("", "\nUNION ALL\n",
            "\nORDER BY fk_edge, n_rows, n_orphans")
      },
      // TWAP: duration-weighted value per user-day, exact numerator,
      // exact truncating integer division (micro-units). The double
      // round(num/sum_dt, 6) form diverged by 1 ulp-of-ROUND on 8
      // sf0.1 cells whose quotient sat exactly on a x.xxxxxx5
      // boundary — the round-11 full-sf0.1 sweep's catch.
      "q113_twap" ->
        """WITH obs AS (
          |  SELECT user_id, date_trunc('day', ts) AS day,
          |    CAST(CAST(value AS DECIMAL(18,6)) * 1000000 AS BIGINT)
          |      AS v_micro,
          |    epoch_us(LEAD(ts) OVER (
          |        PARTITION BY user_id, date_trunc('day', ts)
          |        ORDER BY ts, event_id))
          |      - epoch_us(ts) AS dt_us
          |  FROM events),
          |g AS (
          |  SELECT user_id, day, COUNT(*) AS n_weighted,
          |    CAST(SUM(dt_us) AS BIGINT) AS sum_dt,
          |    SUM(CAST(v_micro AS HUGEINT) * dt_us) AS num
          |  FROM obs WHERE dt_us IS NOT NULL GROUP BY 1, 2)
          |SELECT user_id, day, n_weighted,
          |  CASE WHEN sum_dt = 0 THEN NULL
          |       ELSE CAST(num // sum_dt AS BIGINT) END AS twap_micro
          |FROM g
          |ORDER BY user_id, day, n_weighted, twap_micro""".stripMargin,
      // cross-source shingle overlap: literal substrings, no hashes
      "q114_source_overlap" ->
        """WITH pos AS (
          |  SELECT source, text,
          |    UNNEST(generate_series(1, length(text) - 7, 4)) AS i
          |  FROM documents WHERE length(text) >= 8),
          |sh AS (
          |  SELECT DISTINCT source, substr(text, CAST(i AS INTEGER), 8)
          |    AS g
          |  FROM pos)
          |SELECT a.source AS source_a, b.source AS source_b,
          |  COUNT(*) AS n_shared
          |FROM sh a JOIN sh b ON a.g = b.g AND a.source < b.source
          |GROUP BY 1, 2
          |ORDER BY source_a, source_b, n_shared""".stripMargin,
      // inter-arrival CV²: exact gap moments, one double division
      "q115_burstiness" ->
        """WITH gaps AS (
          |  SELECT user_id,
          |    epoch_us(LEAD(ts) OVER (PARTITION BY user_id
          |      ORDER BY ts, event_id)) - epoch_us(ts) AS dt
          |  FROM events),
          |m AS (
          |  SELECT user_id, COUNT(*) AS n,
          |    SUM(CAST(dt AS HUGEINT)) AS s,
          |    SUM(CAST(dt AS HUGEINT) * dt) AS ss
          |  FROM gaps WHERE dt IS NOT NULL GROUP BY user_id)
          |SELECT user_id, n AS n_gaps,
          |  CAST(s // n AS BIGINT) AS mean_gap_us,
          |  ROUND(CAST((n * ss - s * s) * n AS DOUBLE) /
          |    CAST((n - 1) * s * s AS DOUBLE), 6) AS cv2
          |FROM m WHERE n >= 2 AND s > 0
          |ORDER BY user_id, n_gaps, mean_gap_us, cv2""".stripMargin,
      // export-chunk skew: fixed key ranges, integer load ppm
      "q116_chunk_audit" ->
        """WITH c AS (
          |  SELECT o_orderkey // 2048 AS chunk, COUNT(*) AS n_rows
          |  FROM orders GROUP BY 1),
          |t AS (
          |  SELECT chunk, n_rows,
          |    CAST(SUM(n_rows) OVER () AS BIGINT) AS total,
          |    COUNT(*) OVER () AS n_chunks
          |  FROM c)
          |SELECT chunk, n_rows,
          |  (n_rows * n_chunks * 1000000) // total AS load_ppm
          |FROM t
          |ORDER BY chunk, n_rows, load_ppm""".stripMargin,
      // top 3-event paths; the (n desc, path) order is total so the
      // LIMIT cut is deterministic
      "q117_top_paths" ->
        """WITH p AS (
          |  SELECT event_type AS t1,
          |    LEAD(event_type, 1) OVER w AS t2,
          |    LEAD(event_type, 2) OVER w AS t3
          |  FROM events
          |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
          |SELECT t1, t2, t3, COUNT(*) AS n FROM p
          |WHERE t3 IS NOT NULL
          |GROUP BY 1, 2, 3
          |ORDER BY n DESC, t1, t2, t3 LIMIT 10""".stripMargin,
      // chained throttle: last-KEPT state replayed per (user, type)
      // as a recursive CTE; 300000000 us = 5 minutes
      "q118_event_throttle" ->
        """WITH RECURSIVE seq AS (
          |  SELECT user_id, event_type, event_id, epoch_us(ts) AS tsm,
          |    ROW_NUMBER() OVER (PARTITION BY user_id, event_type
          |      ORDER BY ts, event_id) AS i
          |  FROM events),
          |th AS (
          |  SELECT user_id, event_type, event_id, tsm, i,
          |    TRUE AS kept, tsm AS last_kept
          |  FROM seq WHERE i = 1
          |  UNION ALL
          |  SELECT s.user_id, s.event_type, s.event_id, s.tsm, s.i,
          |    s.tsm - t.last_kept >= 300000000 AS kept,
          |    CASE WHEN s.tsm - t.last_kept >= 300000000 THEN s.tsm
          |         ELSE t.last_kept END
          |  FROM th t JOIN seq s ON s.user_id = t.user_id
          |    AND s.event_type = t.event_type AND s.i = t.i + 1)
          |SELECT user_id, event_type, event_id FROM th WHERE kept
          |ORDER BY user_id, event_type, event_id""".stripMargin,
      // stride-1 w=8 token windows; a window is duplicated iff its
      // text occurred earlier by (doc_id, start); overlapping/adjacent
      // (gap <= 8) duplicates merge into extents (gaps-and-islands);
      // integer ppm rate — no float on either engine
      "q119_substring_dedup" ->
        """WITH t AS (
          |  SELECT doc_id, string_split(text, ' ') AS toks,
          |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
          |  FROM documents),
          |st AS (
          |  SELECT doc_id, toks, n_tokens,
          |    UNNEST(generate_series(0, greatest(len(toks) - 8, 0))) AS s
          |  FROM t),
          |w AS (
          |  SELECT doc_id, n_tokens, s,
          |    array_to_string(toks[s + 1 : s + 8], ' ') AS wtext
          |  FROM st),
          |r AS (
          |  SELECT doc_id, n_tokens, s,
          |    ROW_NUMBER() OVER (PARTITION BY wtext
          |      ORDER BY doc_id, s) AS rn
          |  FROM w),
          |d AS (SELECT doc_id, n_tokens, s FROM r WHERE rn >= 2),
          |i AS (
          |  SELECT doc_id, n_tokens, s,
          |    CASE WHEN s - lag(s) OVER (PARTITION BY doc_id ORDER BY s)
          |      <= 8 THEN 0 ELSE 1 END AS brk
          |  FROM d),
          |g AS (
          |  SELECT doc_id, n_tokens, s,
          |    SUM(brk) OVER (PARTITION BY doc_id ORDER BY s) AS island
          |  FROM i),
          |e AS (
          |  SELECT doc_id, n_tokens, MIN(s) AS ext_start,
          |    LEAST(MAX(s) + 7, n_tokens - 1) AS ext_end
          |  FROM g GROUP BY doc_id, n_tokens, island)
          |SELECT doc_id, n_tokens,
          |  CAST(COUNT(*) AS BIGINT) AS n_extents,
          |  CAST(SUM(ext_end - ext_start + 1) AS BIGINT) AS n_dup_tokens,
          |  CAST(SUM(ext_end - ext_start + 1) * 1000000 // n_tokens
          |    AS BIGINT) AS dup_ppm
          |FROM e GROUP BY doc_id, n_tokens
          |ORDER BY doc_id, n_tokens, n_extents, n_dup_tokens,
          |  dup_ppm""".stripMargin,
      // ingest (id >= 400) windows LEFT JOIN the DISTINCT corpus
      // (id < 400) window set; novelty = unmatched fraction in ppm
      "q120_window_novelty" ->
        """WITH t AS (
          |  SELECT doc_id, string_split(text, ' ') AS toks,
          |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
          |  FROM documents WHERE doc_id >= 400),
          |st AS (
          |  SELECT doc_id, toks, n_tokens,
          |    UNNEST(generate_series(0, greatest(len(toks) - 8, 0))) AS s
          |  FROM t),
          |w AS (
          |  SELECT doc_id, n_tokens,
          |    array_to_string(toks[s + 1 : s + 8], ' ') AS wtext
          |  FROM st),
          |ct AS (
          |  SELECT string_split(text, ' ') AS toks FROM documents
          |  WHERE doc_id < 400),
          |cs AS (
          |  SELECT toks,
          |    UNNEST(generate_series(0, greatest(len(toks) - 8, 0))) AS s
          |  FROM ct),
          |cw AS (
          |  SELECT DISTINCT array_to_string(toks[s + 1 : s + 8], ' ')
          |    AS wtext
          |  FROM cs)
          |SELECT doc_id, n_tokens,
          |  CAST(COUNT(*) AS BIGINT) AS n_windows,
          |  CAST(SUM(CASE WHEN cw.wtext IS NULL THEN 1 ELSE 0 END)
          |    AS BIGINT) AS n_novel,
          |  CAST(SUM(CASE WHEN cw.wtext IS NULL THEN 1 ELSE 0 END)
          |    * 1000000 // COUNT(*) AS BIGINT) AS novelty_ppm
          |FROM w LEFT JOIN cw USING (wtext)
          |GROUP BY doc_id, n_tokens
          |ORDER BY doc_id, n_tokens, n_windows, n_novel,
          |  novelty_ppm""".stripMargin,
      // confusion matrix of the q55 prediction vs the lang label;
      // diagonal row/col shares are per-class recall/precision (ppm)
      "q121_langid_confusion" ->
        s"""WITH scored AS (
           |  SELECT lang_label,
           |    CASE WHEN GREATEST(g_en, g_de, g_fr, g_es) = 0 THEN 'und'
           |         WHEN g_en = GREATEST(g_en, g_de, g_fr, g_es) THEN 'en'
           |         WHEN g_de = GREATEST(g_en, g_de, g_fr, g_es) THEN 'de'
           |         WHEN g_fr = GREATEST(g_en, g_de, g_fr, g_es) THEN 'fr'
           |         ELSE 'es' END AS lang_pred
           |  FROM ($langidScoredSql) s),
           |cells AS (
           |  SELECT lang_label, lang_pred, COUNT(*) AS n
           |  FROM scored GROUP BY 1, 2),
           |t AS (
           |  SELECT lang_label, lang_pred, CAST(n AS BIGINT) AS n,
           |    CAST(SUM(n) OVER (PARTITION BY lang_label) AS BIGINT)
           |      AS label_total,
           |    CAST(SUM(n) OVER (PARTITION BY lang_pred) AS BIGINT)
           |      AS pred_total
           |  FROM cells)
           |SELECT lang_label, lang_pred, n, label_total, pred_total,
           |  CAST(n * 1000000 // label_total AS BIGINT) AS row_share_ppm,
           |  CAST(n * 1000000 // pred_total AS BIGINT) AS col_share_ppm
           |FROM t
           |ORDER BY lang_label, lang_pred, n, label_total, pred_total,
           |  row_share_ppm, col_share_ppm""".stripMargin,
      // exact two-sample KS: cross-multiplied integer CDF distance,
      // HUGEINT in DuckDB mirrors DECIMAL(38,0) in Spark
      "q122_ks_drift" ->
        s"""WITH li AS (
           |  SELECT l_linestatus, l_returnflag,
           |    ${Profiling.centsSql("l_extendedprice")} AS c
           |  FROM lineitem WHERE l_returnflag IN ('R', 'A')),
           |counts AS (
           |  SELECT l_linestatus, c,
           |    SUM(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS c1,
           |    SUM(CASE WHEN l_returnflag = 'A' THEN 1 ELSE 0 END) AS c2
           |  FROM li GROUP BY 1, 2),
           |cum AS (
           |  SELECT l_linestatus, c,
           |    SUM(c1) OVER (PARTITION BY l_linestatus ORDER BY c) AS cum1,
           |    SUM(c2) OVER (PARTITION BY l_linestatus ORDER BY c) AS cum2,
           |    SUM(c1) OVER (PARTITION BY l_linestatus) AS n1,
           |    SUM(c2) OVER (PARTITION BY l_linestatus) AS n2
           |  FROM counts),
           |dd AS (
           |  SELECT l_linestatus, c, n1, n2,
           |    ABS(cum1 * n2 - cum2 * n1) AS d,
           |    MAX(ABS(cum1 * n2 - cum2 * n1))
           |      OVER (PARTITION BY l_linestatus) AS md
           |  FROM cum)
           |SELECT l_linestatus, CAST(n1 AS BIGINT) AS n1,
           |  CAST(n2 AS BIGINT) AS n2,
           |  CAST(md * 1000000 // (n1 * n2) AS BIGINT) AS ks_ppm,
           |  MIN(c) AS ks_at_cents
           |FROM dd WHERE d = md
           |GROUP BY l_linestatus, n1, n2, md
           |ORDER BY l_linestatus, n1, n2, ks_ppm, ks_at_cents""".stripMargin,
      // 3 unrolled integer power iterations over the q65 edge set;
      // every division truncates identically on both engines
      "q123_pagerank" ->
        """WITH pairs AS (
          |  SELECT a.vec_id AS va, b.vec_id AS vb
          |  FROM embeddings a JOIN embeddings b
          |    ON a.vec_id < b.vec_id AND a.vec_id < 200 AND b.vec_id < 200
          |  WHERE ROUND(LIST_INNER_PRODUCT(CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])) /
          |      (SQRT(LIST_INNER_PRODUCT(CAST(a.embedding AS DOUBLE[]), CAST(a.embedding AS DOUBLE[]))) *
          |       SQRT(LIST_INNER_PRODUCT(CAST(b.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])))), 6) >= 0.2
          |),
          |e AS (SELECT va AS src, vb AS dst FROM pairs
          |      UNION ALL SELECT vb, va FROM pairs),
          |deg AS (SELECT src, COUNT(*) AS deg FROM e GROUP BY src),
          |nn AS (SELECT COUNT(*) AS n FROM deg),
          |p0 AS (SELECT d.src AS node, d.deg,
          |         CAST(1000000 // nn.n AS BIGINT) AS pr FROM deg d, nn),
          |c0 AS (SELECT node, pr // deg AS contrib FROM p0),
          |f1 AS (SELECT e.dst AS node, SUM(c.contrib) AS inflow
          |       FROM e JOIN c0 c ON e.src = c.node GROUP BY e.dst),
          |p1 AS (SELECT d.src AS node, d.deg,
          |         CAST((SELECT 150000 // n FROM nn)
          |           + (85 * COALESCE(f.inflow, 0)) // 100 AS BIGINT) AS pr
          |       FROM deg d LEFT JOIN f1 f ON f.node = d.src),
          |c1 AS (SELECT node, pr // deg AS contrib FROM p1),
          |f2 AS (SELECT e.dst AS node, SUM(c.contrib) AS inflow
          |       FROM e JOIN c1 c ON e.src = c.node GROUP BY e.dst),
          |p2 AS (SELECT d.src AS node, d.deg,
          |         CAST((SELECT 150000 // n FROM nn)
          |           + (85 * COALESCE(f.inflow, 0)) // 100 AS BIGINT) AS pr
          |       FROM deg d LEFT JOIN f2 f ON f.node = d.src),
          |c2 AS (SELECT node, pr // deg AS contrib FROM p2),
          |f3 AS (SELECT e.dst AS node, SUM(c.contrib) AS inflow
          |       FROM e JOIN c2 c ON e.src = c.node GROUP BY e.dst),
          |p3 AS (SELECT d.src AS node, d.deg,
          |         CAST((SELECT 150000 // n FROM nn)
          |           + (85 * COALESCE(f.inflow, 0)) // 100 AS BIGINT) AS pr
          |       FROM deg d LEFT JOIN f3 f ON f.node = d.src)
          |SELECT node AS vec_id, pr AS pr_ppm FROM p3
          |ORDER BY vec_id, pr_ppm""".stripMargin,
      // q06's semantics through the custkey-bucketed layout — the
      // oracle is identical; only the physical plan differs
      "q124_join_bucketed_cust" ->
        s"""SELECT c_mktsegment, COUNT(*) AS n_orders,
           |  ${exactSum("o_totalprice")} AS sum_price
           |FROM orders JOIN customer ON o_custkey = c_custkey
           |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,
      // categorical TVD: cross-multiplied integer shares, HUGEINT //
      // mirrors DECIMAL(38,0) div
      "q125_tvd_drift" ->
        """WITH o AS (
          |  SELECT o_orderpriority,
          |    o_orderdate < TIMESTAMP '1997-01-01' AS y96
          |  FROM orders
          |  WHERE o_orderdate >= TIMESTAMP '1996-01-01'
          |    AND o_orderdate < TIMESTAMP '1998-01-01'),
          |counts AS (
          |  SELECT o_orderpriority,
          |    SUM(CASE WHEN y96 THEN 1 ELSE 0 END) AS c1,
          |    SUM(CASE WHEN NOT y96 THEN 1 ELSE 0 END) AS c2
          |  FROM o GROUP BY 1),
          |t0 AS (
          |  SELECT o_orderpriority, c1, c2,
          |    SUM(c1) OVER () AS n1, SUM(c2) OVER () AS n2
          |  FROM counts),
          |t AS (
          |  SELECT o_orderpriority, c1, c2, n1, n2,
          |    SUM(ABS(c1 * n2 - c2 * n1)) OVER () AS num
          |  FROM t0)
          |SELECT o_orderpriority, CAST(c1 AS BIGINT) AS c1,
          |  CAST(c2 AS BIGINT) AS c2,
          |  CAST(c1 * 1000000 // n1 AS BIGINT) AS share1_ppm,
          |  CAST(c2 * 1000000 // n2 AS BIGINT) AS share2_ppm,
          |  CAST(num * 1000000 // (2 * n1 * n2) AS BIGINT) AS tvd_ppm
          |FROM t
          |ORDER BY o_orderpriority, c1, c2, share1_ppm, share2_ppm,
          |  tvd_ppm""".stripMargin,
      // exact set-similarity join: the oracle is the brute-force
      // all-pairs truth (q41 shape), so a prefix-filter completeness
      // bug = a dropped pair = a hash mismatch; all-integer ppm math
      "q126_setsim_join" ->
        """WITH g AS (
          |  SELECT doc_id, unnest(list_distinct([substr(text, i, 8)
          |    FOR i IN range(1, greatest(length(text) - 7, 1) + 1)])) AS gram
          |  FROM documents),
          |s AS (SELECT doc_id, count(*) AS n FROM g GROUP BY doc_id),
          |i AS (
          |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS ni
          |  FROM g a JOIN g b ON a.gram = b.gram AND a.doc_id < b.doc_id
          |  GROUP BY 1, 2)
          |SELECT doc_a, doc_b,
          |  CAST((ni * 1000000) // (sa.n + sb.n - ni) AS BIGINT)
          |    AS jaccard_ppm
          |FROM i
          |JOIN s sa ON sa.doc_id = doc_a
          |JOIN s sb ON sb.doc_id = doc_b
          |WHERE ni * 1000000 >= 700000 * (sa.n + sb.n - ni)
          |ORDER BY doc_a, doc_b, jaccard_ppm""".stripMargin,
      // vocabulary profile: spectrum + hapax/TTR ppm, all integer;
      // DuckDB // on HUGEINT mirrors Spark DIV (positive operands)
      "q127_vocab_profile" ->
        """WITH g AS (
          |  SELECT source, unnest([substr(text, i, 8)
          |    FOR i IN range(1, greatest(length(text) - 7, 1) + 1)]) AS gram
          |  FROM documents),
          |c AS (SELECT source, gram, count(*) AS k FROM g GROUP BY 1, 2),
          |sp AS (
          |  SELECT source, least(k, 11) AS k_bucket, count(*) AS n_types
          |  FROM c GROUP BY 1, 2),
          |su AS (
          |  SELECT source, count(*) AS types_total, sum(k) AS occurrences,
          |    count(*) FILTER (k = 1) AS hapax
          |  FROM c GROUP BY 1)
          |SELECT sp.source, CAST(k_bucket AS BIGINT) AS k_bucket,
          |  CAST(n_types AS BIGINT) AS n_types,
          |  CAST(types_total AS BIGINT) AS types_total,
          |  CAST(occurrences AS BIGINT) AS occurrences,
          |  CAST(hapax * 1000000 // types_total AS BIGINT) AS hapax_ppm,
          |  CAST(types_total * 1000000 // occurrences AS BIGINT) AS ttr_ppm
          |FROM sp JOIN su ON sp.source = su.source
          |ORDER BY sp.source, k_bucket, n_types, types_total, occurrences,
          |  hapax_ppm, ttr_ppm""".stripMargin,
      // MAD outliers: both medians are nearest-rank cumulative walks
      // (the q100 pattern); the 1.8*MAD decision is cross-multiplied
      // to the pure long compare |x-med|*5 > 9*MAD
      "q128_mad_outliers" ->
        s"""WITH li AS (
           |  SELECT l_returnflag,
           |    ${graft.ops.Profiling.centsSql("l_extendedprice")} AS c
           |  FROM lineitem),
           |counts AS (
           |  SELECT l_returnflag, c, COUNT(*) AS cnt FROM li GROUP BY 1, 2),
           |ranked AS (
           |  SELECT l_returnflag, c,
           |    SUM(cnt) OVER (PARTITION BY l_returnflag ORDER BY c) AS cum,
           |    SUM(cnt) OVER (PARTITION BY l_returnflag) AS n
           |  FROM counts),
           |m AS (
           |  SELECT l_returnflag,
           |    MIN(CASE WHEN cum >= (n + 1) // 2 THEN c END) AS med
           |  FROM ranked GROUP BY 1),
           |dev AS (
           |  SELECT li.l_returnflag, ABS(c - med) AS d
           |  FROM li JOIN m USING (l_returnflag)),
           |dcounts AS (
           |  SELECT l_returnflag, d, COUNT(*) AS cnt FROM dev GROUP BY 1, 2),
           |dranked AS (
           |  SELECT l_returnflag, d,
           |    SUM(cnt) OVER (PARTITION BY l_returnflag ORDER BY d) AS cum,
           |    SUM(cnt) OVER (PARTITION BY l_returnflag) AS n
           |  FROM dcounts),
           |md AS (
           |  SELECT l_returnflag,
           |    MIN(CASE WHEN cum >= (n + 1) // 2 THEN d END) AS mad
           |  FROM dranked GROUP BY 1)
           |SELECT li.l_returnflag, COUNT(*) AS n,
           |  CAST(MIN(med) AS BIGINT) AS med_cents,
           |  CAST(MIN(mad) AS BIGINT) AS mad_cents,
           |  CAST(COUNT(*) FILTER (ABS(c - med) * 5 > 9 * mad) AS BIGINT)
           |    AS n_outliers,
           |  CAST(COUNT(*) FILTER (ABS(c - med) * 5 > 9 * mad) * 1000000
           |    // COUNT(*) AS BIGINT) AS outlier_ppm
           |FROM li JOIN m USING (l_returnflag) JOIN md USING (l_returnflag)
           |GROUP BY li.l_returnflag
           |ORDER BY l_returnflag, n, med_cents, mad_cents, n_outliers,
           |  outlier_ppm""".stripMargin,
      // ACF over the gap-filled monthly count series: n-scaled exact
      // integer centering, one double division per (group, lag)
      "q129_autocorrelation" ->
        """WITH o AS (
          |  SELECT o_orderpriority AS p,
          |    CAST(year(o_orderdate) * 12 + month(o_orderdate) AS BIGINT)
          |      AS m
          |  FROM orders),
          |bnd AS (SELECT min(m) AS m0, max(m) AS m1 FROM o),
          |months AS (SELECT UNNEST(generate_series(m0, m1)) AS m FROM bnd),
          |grps AS (SELECT DISTINCT p FROM o),
          |spine AS (SELECT p, months.m FROM grps CROSS JOIN months),
          |x AS (
          |  SELECT spine.p, spine.m, count(o.m) AS x
          |  FROM spine LEFT JOIN o ON o.p = spine.p AND o.m = spine.m
          |  GROUP BY 1, 2),
          |s AS (SELECT p, count(*) AS n, sum(x) AS s FROM x GROUP BY 1),
          |cx AS (SELECT x.p, m, (n * x - s) AS cx FROM x JOIN s USING (p)),
          |d AS (SELECT p, sum(cx * cx) AS den FROM cx GROUP BY 1),
          |pr AS (
          |  SELECT a.p, l.lag_k, sum(a.cx * b.cx) AS num
          |  FROM cx a
          |  CROSS JOIN (SELECT UNNEST(generate_series(1, 6)) AS lag_k) l
          |  JOIN cx b ON b.p = a.p AND b.m = a.m + l.lag_k
          |  GROUP BY 1, 2)
          |SELECT pr.p AS o_orderpriority, CAST(lag_k AS BIGINT) AS lag_k,
          |  CAST(n AS BIGINT) AS n_months,
          |  round(CAST(num AS DOUBLE) / CAST(den AS DOUBLE), 6) AS acf
          |FROM pr JOIN d USING (p) JOIN s USING (p)
          |ORDER BY o_orderpriority, lag_k, n_months, acf""".stripMargin,
      // z-order cell map: the Morton spread is the same shift/mask
      // magic-number chain in both engines; masks in decimal
      // (0x00FF00FF 0x0F0F0F0F 0x33333333 0x55555555)
      "q130_zorder_cells" ->
        """WITH b AS (
          |  SELECT min(l_partkey) AS mn1, max(l_partkey) AS mx1,
          |    min(l_suppkey) AS mn2, max(l_suppkey) AS mx2
          |  FROM lineitem),
          |sc AS (
          |  SELECT ((l_partkey - mn1) * 65536) // (mx1 - mn1 + 1) AS a,
          |    ((l_suppkey - mn2) * 65536) // (mx2 - mn2 + 1) AS bb,
          |    l_partkey, l_suppkey
          |  FROM lineitem CROSS JOIN b),
          |sp AS (
          |  SELECT l_partkey, l_suppkey,
          |    (a | (a << 8)) & 16711935 AS a1,
          |    (bb | (bb << 8)) & 16711935 AS b1
          |  FROM sc),
          |sp2 AS (
          |  SELECT l_partkey, l_suppkey,
          |    (a1 | (a1 << 4)) & 252645135 AS a2,
          |    (b1 | (b1 << 4)) & 252645135 AS b2
          |  FROM sp),
          |sp3 AS (
          |  SELECT l_partkey, l_suppkey,
          |    (a2 | (a2 << 2)) & 858993459 AS a3,
          |    (b2 | (b2 << 2)) & 858993459 AS b3
          |  FROM sp2),
          |sp4 AS (
          |  SELECT l_partkey, l_suppkey,
          |    (a3 | (a3 << 1)) & 1431655765 AS a4,
          |    (b3 | (b3 << 1)) & 1431655765 AS b4
          |  FROM sp3),
          |z AS (
          |  SELECT l_partkey, l_suppkey,
          |    (a4 | (b4 << 1)) // 262144 AS z_cell
          |  FROM sp4)
          |SELECT z_cell, COUNT(*) AS n,
          |  MIN(l_partkey) AS p_min, MAX(l_partkey) AS p_max,
          |  MIN(l_suppkey) AS s_min, MAX(l_suppkey) AS s_max
          |FROM z GROUP BY z_cell
          |ORDER BY z_cell, n, p_min, p_max, s_min, s_max""".stripMargin,
      // Gini impurity diversity: cross-multiplied integer ppm (no log)
      "q131_token_diversity" ->
        """WITH t AS (
          |  SELECT doc_id, unnest(string_split(text, ' ')) AS tok
          |  FROM documents),
          |c AS (SELECT doc_id, tok, count(*) AS k FROM t GROUP BY 1, 2),
          |a AS (
          |  SELECT doc_id, sum(k) AS n, count(*) AS types,
          |    sum(k * k) AS ss
          |  FROM c GROUP BY 1)
          |SELECT doc_id, CAST(n AS BIGINT) AS n_tokens,
          |  CAST(types AS BIGINT) AS n_types,
          |  CAST((n * n - ss) * 1000000 // (n * n) AS BIGINT) AS gini_ppm
          |FROM a
          |ORDER BY doc_id, n_tokens, n_types, gini_ppm""".stripMargin,
      // incremental maintenance: the oracle is the ONE-PASS recompute,
      // so the hash compare proves partial-merge == recompute
      "q132_incremental_stats" ->
        s"""WITH li AS (
           |  SELECT l_returnflag,
           |    ${graft.ops.Profiling.centsSql("l_extendedprice")} AS c
           |  FROM lineitem),
           |m AS (
           |  SELECT l_returnflag, COUNT(*) AS n, SUM(c) AS s,
           |    SUM(c * c) AS ss
           |  FROM li GROUP BY 1)
           |SELECT l_returnflag, CAST(n AS BIGINT) AS n,
           |  CAST(s AS BIGINT) AS sum_cents,
           |  CAST((s * 1000) // n AS BIGINT) AS mean_centimils,
           |  round(CAST(n * ss - s * s AS DOUBLE) /
           |    CAST(n * (n - 1) AS DOUBLE), 6) AS var_cents2
           |FROM m
           |ORDER BY l_returnflag, n, sum_cents, mean_centimils,
           |  var_cents2""".stripMargin,
      // k-anonymity: per-class sizes + global risk share in ppm
      "q133_k_anonymity" ->
        """WITH c AS (
          |  SELECT c_nationkey, c_mktsegment, COUNT(*) AS class_size
          |  FROM customer GROUP BY 1, 2),
          |r AS (
          |  SELECT SUM(class_size) AS total_rows,
          |    SUM(CASE WHEN class_size < 5 THEN class_size ELSE 0 END)
          |      AS risk_rows
          |  FROM c)
          |SELECT c_nationkey, c_mktsegment,
          |  CAST(class_size AS BIGINT) AS class_size,
          |  class_size < 5 AS at_risk,
          |  CAST(risk_rows * 1000000 // total_rows AS BIGINT)
          |    AS risk_share_ppm
          |FROM c CROSS JOIN r
          |ORDER BY c_nationkey, c_mktsegment, class_size, at_risk,
          |  risk_share_ppm""".stripMargin,
      // heavy hitters: exact within-source share, cross-multiplied
      "q134_heavy_hitters" ->
        """WITH t AS (
          |  SELECT source, unnest(string_split(text, ' ')) AS tok
          |  FROM documents),
          |c AS (SELECT source, tok, COUNT(*) AS k FROM t GROUP BY 1, 2),
          |n AS (SELECT source, SUM(k) AS n FROM c GROUP BY 1)
          |SELECT c.source, tok, CAST(k AS BIGINT) AS k,
          |  CAST(k * 1000000 // n AS BIGINT) AS share_ppm
          |FROM c JOIN n ON c.source = n.source
          |WHERE k * 1000000 >= 35000 * n
          |ORDER BY c.source, tok, k, share_ppm""".stripMargin,
      // weighted + unweighted median in one value walk (2*cum >= tot)
      "q135_weighted_median" ->
        s"""WITH li AS (
           |  SELECT l_returnflag,
           |    ${graft.ops.Profiling.centsSql("l_extendedprice")} AS c,
           |    ${graft.ops.Profiling.centsSql("l_quantity")} AS q
           |  FROM lineitem),
           |vc AS (
           |  SELECT l_returnflag, c, COUNT(*) AS cnt, SUM(q) AS w
           |  FROM li GROUP BY 1, 2),
           |r AS (
           |  SELECT l_returnflag, c,
           |    SUM(cnt) OVER (PARTITION BY l_returnflag ORDER BY c) AS cumn,
           |    SUM(cnt) OVER (PARTITION BY l_returnflag) AS n,
           |    SUM(w) OVER (PARTITION BY l_returnflag ORDER BY c) AS cumw,
           |    SUM(w) OVER (PARTITION BY l_returnflag) AS tot
           |  FROM vc)
           |SELECT l_returnflag, CAST(MIN(n) AS BIGINT) AS n,
           |  CAST(MIN(CASE WHEN cumn * 2 >= n THEN c END) AS BIGINT)
           |    AS med_cents,
           |  CAST(MIN(tot) AS BIGINT) AS total_weight,
           |  CAST(MIN(CASE WHEN cumw * 2 >= tot THEN c END) AS BIGINT)
           |    AS wmed_cents
           |FROM r GROUP BY l_returnflag
           |ORDER BY l_returnflag, n, med_cents, total_weight,
           |  wmed_cents""".stripMargin,
      // ABC classes from exact cumulative revenue shares (unique
      // (rev desc, name) order, explicit ROWS frame both engines)
      "q136_abc_analysis" ->
        s"""WITH rev AS (
           |  SELECT n_name,
           |    SUM(${graft.ops.Profiling.centsSql("o_totalprice")})
           |      AS rev_cents
           |  FROM orders
           |  JOIN customer ON o_custkey = c_custkey
           |  JOIN nation ON c_nationkey = n_nationkey
           |  GROUP BY 1),
           |r AS (
           |  SELECT n_name, rev_cents,
           |    SUM(rev_cents) OVER (ORDER BY rev_cents DESC, n_name ASC
           |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
           |    SUM(rev_cents) OVER () AS tot
           |  FROM rev)
           |SELECT n_name, CAST(rev_cents AS BIGINT) AS rev_cents,
           |  CAST(rev_cents * 1000000 // tot AS BIGINT) AS share_ppm,
           |  CAST(cum * 1000000 // tot AS BIGINT) AS cum_share_ppm,
           |  CASE WHEN cum * 1000000 // tot <= 800000 THEN 'A'
           |       WHEN cum * 1000000 // tot <= 950000 THEN 'B'
           |       ELSE 'C' END AS abc_class
           |FROM r
           |ORDER BY n_name, rev_cents, share_ppm, cum_share_ppm,
           |  abc_class""".stripMargin,
      // 7-day ship-latency bins; BOTH engines' integer division
      // truncates toward zero (DuckDB `//` only floors on floats),
      // so the explicit floor formula (truncating div minus one when
      // the remainder is negative) is written symbol-for-symbol on
      // both sides — exact for ANY latency, no shift, no invariant
      "q137_ship_latency" ->
        """WITH lat AS (
          |  SELECT o_orderpriority,
          |    date_diff('day', CAST(o_orderdate AS DATE),
          |      CAST(l_shipdate AS DATE)) AS lat
          |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey)
          |SELECT o_orderpriority,
          |  CAST(((lat // 7) - (CASE WHEN lat % 7 < 0 THEN 1 ELSE 0
          |    END)) * 7 AS BIGINT) AS bucket_lo_days,
          |  COUNT(*) AS n,
          |  CAST(MIN(lat) AS BIGINT) AS min_days,
          |  CAST(MAX(lat) AS BIGINT) AS max_days
          |FROM lat GROUP BY 1, 2
          |ORDER BY o_orderpriority, bucket_lo_days, n, min_days,
          |  max_days""".stripMargin,
      // PII audit: same pattern list as the q64 scrub on both sides
      "q138_pii_audit" -> {
        val Seq(reEmail, reIp, rePhone) =
          graft.etl.Sanitize.PiiPatterns.map(_._1.replace("'", "''"))
        s"""WITH h AS (
           |  SELECT source,
           |    CAST(LEN(REGEXP_EXTRACT_ALL(text, '$reEmail')) AS BIGINT)
           |      AS h_email,
           |    CAST(LEN(REGEXP_EXTRACT_ALL(text, '$reIp')) AS BIGINT)
           |      AS h_ip,
           |    CAST(LEN(REGEXP_EXTRACT_ALL(text, '$rePhone')) AS BIGINT)
           |      AS h_phone
           |  FROM documents),
           |a AS (
           |  SELECT source, COUNT(*) AS n_docs,
           |    CAST(SUM(h_email) AS BIGINT) AS hits_email,
           |    CAST(COUNT(*) FILTER (h_email > 0) AS BIGINT) AS dh_email,
           |    CAST(SUM(h_ip) AS BIGINT) AS hits_ip,
           |    CAST(COUNT(*) FILTER (h_ip > 0) AS BIGINT) AS dh_ip,
           |    CAST(SUM(h_phone) AS BIGINT) AS hits_phone,
           |    CAST(COUNT(*) FILTER (h_phone > 0) AS BIGINT) AS dh_phone
           |  FROM h GROUP BY 1),
           |u AS (
           |  SELECT source, n_docs, 'email' AS pii_type,
           |    hits_email AS hits, dh_email AS docs_hit FROM a
           |  UNION ALL
           |  SELECT source, n_docs, 'ip', hits_ip, dh_ip FROM a
           |  UNION ALL
           |  SELECT source, n_docs, 'phone', hits_phone, dh_phone FROM a)
           |SELECT source, pii_type, n_docs, hits, docs_hit,
           |  CAST(docs_hit * 1000000 // n_docs AS BIGINT) AS docs_hit_ppm
           |FROM u
           |ORDER BY source, pii_type, n_docs, hits, docs_hit,
           |  docs_hit_ppm""".stripMargin
      },
      // join-skew pre-flight: per-key fan-out from two keyed counts
      "q139_join_skew" ->
        """WITH l AS (
          |  SELECT l_orderkey, COUNT(*) AS n_left
          |  FROM lineitem GROUP BY 1),
          |r AS (
          |  SELECT o_orderkey, COUNT(*) AS n_right
          |  FROM orders GROUP BY 1),
          |j AS (
          |  SELECT l_orderkey AS join_key, n_left, n_right,
          |    n_left * n_right AS fanout
          |  FROM l JOIN r ON l_orderkey = o_orderkey),
          |t AS (SELECT SUM(fanout) AS total_fanout FROM j)
          |SELECT join_key, CAST(n_left AS BIGINT) AS n_left,
          |  CAST(n_right AS BIGINT) AS n_right,
          |  CAST(fanout AS BIGINT) AS fanout,
          |  CAST(fanout * 1000000 // total_fanout AS BIGINT)
          |    AS fanout_share_ppm
          |FROM j CROSS JOIN t
          |WHERE fanout >= 8
          |ORDER BY fanout DESC, join_key ASC, n_left, n_right,
          |  fanout_share_ppm""".stripMargin,
      // freshness: integer-µs watermark staleness per event type
      "q140_freshness" ->
        """WITH p AS (
          |  SELECT event_type, COUNT(*) AS n_events,
          |    MIN(epoch_us(ts)) AS first_us,
          |    MAX(epoch_us(ts)) AS last_us
          |  FROM events GROUP BY 1),
          |w AS (SELECT MAX(last_us) AS wm FROM p)
          |SELECT event_type, n_events, first_us, last_us,
          |  CAST(wm - last_us AS BIGINT) AS staleness_us
          |FROM p CROSS JOIN w
          |ORDER BY event_type, n_events, first_us, last_us,
          |  staleness_us""".stripMargin,
      // interval-overlap join over the q30 session construction;
      // session_end carries the +30min gap padding on both sides
      "q141_session_overlap" ->
        """WITH e AS (
          |  SELECT user_id, ts,
          |    LAG(ts) OVER (PARTITION BY user_id ORDER BY ts) AS prev
          |  FROM events
          |), m AS (
          |  SELECT user_id, ts,
          |    CASE WHEN prev IS NULL OR ts - prev >= INTERVAL 30 MINUTE
          |         THEN 1 ELSE 0 END AS new_s
          |  FROM e
          |), sx AS (
          |  SELECT user_id, ts,
          |    SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts
          |      ROWS UNBOUNDED PRECEDING) AS sid
          |  FROM m
          |), s AS (
          |  SELECT user_id, MIN(ts) AS ss,
          |    MAX(ts) + INTERVAL 30 MINUTE AS se
          |  FROM sx GROUP BY user_id, sid
          |)
          |SELECT CAST(date_trunc('day', a.ss) AS TIMESTAMP) AS day,
          |  a.user_id AS user_a, b.user_id AS user_b,
          |  COUNT(*) AS n_overlaps,
          |  CAST(SUM(epoch_us(LEAST(a.se, b.se)) -
          |    epoch_us(GREATEST(a.ss, b.ss))) AS BIGINT)
          |    AS total_overlap_us
          |FROM s a JOIN s b
          |  ON date_trunc('day', a.ss) = date_trunc('day', b.ss)
          |  AND a.user_id < b.user_id
          |  AND a.ss < b.se AND b.ss < a.se
          |WHERE date_trunc('day', a.ss) =
          |  (SELECT min(date_trunc('day', ss)) FROM s)
          |GROUP BY 1, 2, 3
          |ORDER BY day, user_a, user_b, n_overlaps,
          |  total_overlap_us""".stripMargin,
      // brute-force, bucket-free pair join: the oracle is algorithm-
      // independent, so any bucket-decomposition bug (dropped
      // cross-midnight pair, double-counted multi-bucket pair) is a
      // hash mismatch
      "q142_overlap_bucketed" ->
        """WITH e AS (
          |  SELECT user_id, ts,
          |    LAG(ts) OVER (PARTITION BY user_id ORDER BY ts) AS prev
          |  FROM events
          |), m AS (
          |  SELECT user_id, ts,
          |    CASE WHEN prev IS NULL OR ts - prev >= INTERVAL 30 MINUTE
          |         THEN 1 ELSE 0 END AS new_s
          |  FROM e
          |), sx AS (
          |  SELECT user_id, ts,
          |    SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts
          |      ROWS UNBOUNDED PRECEDING) AS sid
          |  FROM m
          |), s0 AS (
          |  SELECT user_id, MIN(ts) AS ss,
          |    MAX(ts) + INTERVAL 30 MINUTE AS se
          |  FROM sx GROUP BY user_id, sid
          |), s AS (
          |  SELECT * FROM s0
          |  WHERE date_trunc('day', ss) <=
          |    (SELECT min(date_trunc('day', ss)) FROM s0)
          |      + INTERVAL 1 DAY
          |)
          |SELECT a.user_id AS user_a, b.user_id AS user_b,
          |  COUNT(*) AS n_overlaps,
          |  CAST(SUM(epoch_us(LEAST(a.se, b.se)) -
          |    epoch_us(GREATEST(a.ss, b.ss))) AS BIGINT)
          |    AS total_overlap_us
          |FROM s a JOIN s b
          |  ON a.user_id < b.user_id
          |  AND a.ss < b.se AND b.ss < a.se
          |GROUP BY 1, 2
          |ORDER BY user_a, user_b, n_overlaps,
          |  total_overlap_us""".stripMargin,
      // capped gap-fill: trailing-72h spine + carry-in seed (latest
      // pre-window observation); DECIMAL until the final cast, the
      // q87 discipline
      "q143_gap_fill_capped" ->
        """WITH hourly AS (
          |  SELECT user_id, date_trunc('hour', ts) AS hour,
          |    SUM(CAST(value AS DECIMAL(18,2))) AS sv, COUNT(*) AS n_events
          |  FROM events GROUP BY 1, 2),
          |bw AS (
          |  SELECT user_id,
          |    GREATEST(MIN(hour), MAX(hour) - INTERVAL 71 HOUR) AS w0,
          |    MAX(hour) AS mx
          |  FROM hourly GROUP BY user_id),
          |spine AS (
          |  SELECT user_id,
          |    UNNEST(generate_series(w0, mx, INTERVAL 1 HOUR)) AS hour
          |  FROM bw),
          |carry AS (
          |  SELECT h.user_id, h.sv AS carry_sv
          |  FROM hourly h JOIN bw ON h.user_id = bw.user_id
          |  WHERE h.hour < bw.w0
          |  QUALIFY ROW_NUMBER() OVER (PARTITION BY h.user_id
          |    ORDER BY h.hour DESC) = 1),
          |joined AS (
          |  SELECT s.user_id, s.hour, COALESCE(h.n_events, 0) AS n_events,
          |    h.sv
          |  FROM spine s LEFT JOIN hourly h
          |    ON s.user_id = h.user_id AND s.hour = h.hour)
          |SELECT j.user_id, j.hour, j.n_events,
          |  CAST(COALESCE(LAST_VALUE(j.sv IGNORE NULLS) OVER (
          |    PARTITION BY j.user_id ORDER BY j.hour
          |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
          |    c.carry_sv) AS DOUBLE) AS filled_value
          |FROM joined j LEFT JOIN carry c ON j.user_id = c.user_id
          |ORDER BY j.user_id, hour, n_events, filled_value""".stripMargin,
      // pair-density curve: signed-cosine binning by EXPLICIT floor
      // division (both engines' integer div truncates), 0.05 bins in
      // integer ppm
      "q144_pair_density" ->
        """WITH p AS (
          |  SELECT CAST(ROUND(ROUND(
          |    LIST_INNER_PRODUCT(CAST(a.embedding AS DOUBLE[]),
          |      CAST(b.embedding AS DOUBLE[])) /
          |    (SQRT(LIST_INNER_PRODUCT(CAST(a.embedding AS DOUBLE[]),
          |      CAST(a.embedding AS DOUBLE[]))) *
          |     SQRT(LIST_INNER_PRODUCT(CAST(b.embedding AS DOUBLE[]),
          |      CAST(b.embedding AS DOUBLE[])))), 6) * 1000000)
          |    AS BIGINT) AS cppm
          |  FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
          |  WHERE a.vec_id < 200 AND b.vec_id < 200)
          |SELECT CAST(((cppm // 50000) - (CASE WHEN cppm % 50000 < 0
          |    THEN 1 ELSE 0 END)) * 50000 AS BIGINT) AS bin_lo_ppm,
          |  COUNT(*) AS n_pairs
          |FROM p GROUP BY 1
          |ORDER BY bin_lo_ppm, n_pairs""".stripMargin,
      "q145_semantic_dedup" -> Ivf.semanticDedupOracleSql(),
      "q150_semantic_dedup_incremental" ->
        Ivf.incrementalSemanticDedupOracleSql(),
      "q151_filter_cascade" -> TextAnalysis.filterCascadeOracleSql,
      "q152_curriculum_schedule" -> Sampling.curriculumScheduleOracleSql(),
      "q153_training_order" -> Layout.trainingOrderOracleSql(),
      "q154_chunk_spans" -> Layout.chunkSpansOracleSql(),
      "q155_token_fertility" -> TextAnalysis.tokenFertilityOracleSql,
      "q156_dedup_savings" -> Dedup.dedupSavingsOracleSql,
      "q157_padding_waste" -> Layout.paddingWasteOracleSql(),
      "q158_l_diversity" -> Audit.lDiversityOracleSql(),
      "q159_dim_correlation" -> Similarity.dimensionCorrelationOracleSql(),
      "q160_large_orders" -> Relational.largeOrderCustomersOracleSql(),
      "q161_sole_late_supplier" -> Relational.soleLateSuppliersOracleSql(),
      "q162_ewma_activity" -> TimeSeries.ewmaActivityOracleSql,
      "q163_self_repetition" -> Ranking.selfRepetitionOracleSql,
      "q164_rrf_fusion" -> Ranking.rrfFusionOracleSql(),
      "q165_corpus_card" -> TextAnalysis.corpusCardOracleSql,
      "q166_cluster_sizes" -> Similarity.clusterSizeProfileOracleSql(),
      "q167_code_switching" -> TextAnalysis.codeSwitchScreenOracleSql,
      "q168_priority_audit" -> Relational.orderPriorityAuditOracleSql(),
      "q169_ann_recall" -> Ivf.annRecallAuditOracleSql(),
      "q170_padding_waste_sharded" -> Layout.paddingWasteOracleSql(nShards = 4),
      "q171_cluster_split" -> HashSql.clusterSplitOracle(),
      "q172_fluency_terciles" -> Ranking.fluencyTercilesOracleSql,
      "q173_eval_overlap" -> Decontaminate.evalOverlapOracleSql,
      "q174_sq_error" -> Similarity.sqErrorAuditOracleSql,
      "q175_epoch_budget" -> TextAnalysis.epochBudgetOracleSql(),
      "q176_quantile_contract" -> Grouping.quantileContractOracleSql(),
      "q177_click_attribution" -> AsOf.clickAttributionOracleSql(),
      "q178_interval_union" -> TimeSeries.intervalUnionOracleSql,
      "q179_psi_drift" -> Profiling.psiDriftOracleSql(),
      "q180_linear_interp" -> TimeSeries.linearInterpOracleSql,
      "q181_containment_join" -> Dedup.containmentOracleSql(),
      "q182_budget_select" -> Sampling.budgetSelectOracleSql(),
      "q183_cdc_chunks" -> Layout.cdcChunksOracleSql,
      "q184_length_tail" -> Profiling.lengthTailProfileOracleSql,
      "q185_spearman" -> Profiling.spearmanOracleSql,
      "q186_cell_medoids" -> Ivf.cellMedoidsOracleSql(),
      "q187_psi_daily" -> Profiling.psiDriftDailyOracleSql(),
      "q188_source_hhi" -> Profiling.sourceHhiOracleSql,
      "q189_oov_rate" -> TextAnalysis.oovRateOracleSql(),
      "q190_pii_cooccurrence" -> graft.etl.Sanitize.piiCooccurrenceOracleSql,
      "q191_containment_incremental" -> Dedup.containmentIncrementalOracleSql(),
      "q192_minhash_accuracy" -> Dedup.minhashAccuracyOracleSql(),
      "q193_budget_intake" -> Sampling.budgetIntakeOracleSql(),
      "q194_split_leakage" -> Decontaminate.splitLeakageOracleSql,
      "q195_redaction_complete" -> graft.etl.Sanitize.redactionCompleteOracleSql,
      "q196_cluster_purity" -> Similarity.clusterPurityOracleSql(),
      "q197_truncation_waste" -> Layout.truncationWasteOracleSql(),
      "q198_lang_mismatch" -> TextAnalysis.langMismatchOracleSql,
      "q199_key_skew_profile" -> Skew.keySkewProfileOracleSql(),
      "q200_emb_outliers" -> Ivf.cellOutliersOracleSql(),
      "q201_keep_best_dedup" -> Similarity.keepBestDedupOracleSql(),
      "q202_collocations" -> TextAnalysis.collocationsOracleSql(),
      "q203_phash_dedup" ->
        graft.multimodal.Multimodal.phashDedupOracleSql(),
      "q204_phash_incremental" ->
        graft.multimodal.Multimodal.phashIncrementalOracleSql(),
      "q205_kappa_agreement" -> TextAnalysis.kappaAgreementOracleSql,
      "q206_jackknife" -> Profiling.jackknifeLengthOracleSql(),
      "q207_bpe_pairs" -> TextAnalysis.bpePairStatsOracleSql(),
      "q208_waterfill" -> Sampling.waterfillAllocOracleSql,
      "q209_theil_sen" -> Profiling.theilSenTrendOracleSql,
      "q210_forget_audit" -> Layout.forgetAuditOracleSql(),
      "q211_source_affinity" ->
        Similarity.sourceCentroidAffinityOracleSql,
      "q212_shuffle_mix" -> Layout.shuffleMixAuditOracleSql(),
      "q213_kcore" -> Similarity.kCoreOracleSql(),
      "q214_calibration" -> TextAnalysis.calibrationOracleSql,
      "q215_weekday_seasonality" ->
        TimeSeries.weekdaySeasonalityOracleSql,
      "q216_pq_audit" -> Ivf.pqOracleSql(),
      "q217_zipf_profile" -> TextAnalysis.zipfProfileOracleSql,
      "q218_market_share" -> Flagship.marketShareOracleSql(),
      "q219_kanon_ladder" -> Audit.kAnonLadderOracleSql(),
      "q220_pq_adc_recall" -> Ivf.pqAdcRecallOracleSql(),
      "q221_release_diff" -> TextAnalysis.releaseDiffOracleSql(),
      "q222_hh_union" -> TextAnalysis.hhUnionContractOracleSql(),
      "q223_pq_retrain_gain" -> Ivf.pqRetrainGainOracleSql(),
      "q224_rollup_shares" -> Grouping.rollupSharesOracleSql,
      "q225_latency_trend" -> Relational.latencyTrendOracleSql,
      "q226_custdist" -> Relational.customerOrderDistOracleSql,
      "q227_vocab_growth" -> TextAnalysis.vocabGrowthOracleSql,
      "q228_source_dispersion" ->
        Similarity.sourceDispersionOracleSql,
      "q229_join_forecast" -> Audit.joinSizeForecastOracleSql,
      "q230_nation_volume" -> Flagship.nationVolumeOracleSql(),
      "q231_returned_revenue" ->
        Relational.returnedRevenueTopOracleSql(),
      "q232_promo_share" -> Relational.promoRevenueShareOracleSql,
      "q233_idle_rich" -> Relational.idleRichCustomersOracleSql(),
      "q234_quality_length" ->
        TextAnalysis.qualityLengthBiasOracleSql,
      "q235_ab_significance" -> Behavior.abConversionOracleSql,
      "q236_conversion_latency" ->
        Behavior.conversionLatencyOracleSql,
      "q237_boundary_stitch" -> Dedup.boundaryStitchesOracleSql(),
      "q238_closure_audit" -> Similarity.closureAuditOracleSql(),
      "q239_error_burn" -> TimeSeries.errorBurnOracleSql,
      "q240_quality_rank" -> TextAnalysis.sourceQualityRankOracleSql,
      "q241_bpe_encode" -> TextAnalysis.bpeEncodeStatsOracleSql(),
      "q242_bpe_fertility" -> TextAnalysis.bpeFertilityOracleSql(),
      "q243_bpe_packing" -> TextAnalysis.bpePackingWasteOracleSql(),
      "q244_revenue_forecast" -> TpchShapes.revenueForecastOracleSql,
      "q245_product_profit" -> TpchShapes.productProfitOracleSql(),
      "q246_part_concentration" ->
        TpchShapes.partConcentrationOracleSql,
      "q247_late_priority" -> TpchShapes.latePriorityLinesOracleSql,
      "q248_top_supplier" -> TpchShapes.topSupplierRevenueOracleSql,
      "q249_supplier_diversity" ->
        TpchShapes.supplierDiversityOracleSql,
      "q250_small_qty_revenue" ->
        TpchShapes.smallQuantityRevenueOracleSql(),
      "q251_brand_size_qty" -> TpchShapes.brandSizeQtyRevenueOracleSql,
      "q252_surplus_suppliers" ->
        TpchShapes.surplusSuppliersOracleSql(),
      "q253_min_unit_supplier" ->
        TpchShapes.minUnitPriceSupplierOracleSql(),
      "q254_boundary_stitch_incremental" ->
        Dedup.boundaryStitchesIncrementalOracleSql(),
      "q255_bpe_train_iter" -> BpeIterative.trainTableOracleSql(),
      "q256_bpe_iter_contract" ->
        BpeIterative.encodeContractOracleSql(),
      "q257_bpe_frozen_drift" ->
        BpeIterative.frozenDriftOracleSql(),
      "q258_setsim_threshold_sweep" ->
        Dedup.thresholdSweepOracleSql(),
      "q259_setsim_preflight" ->
        Dedup.setSimPreflightOracleSql(),
      "q260_setsim_preflight_incremental" ->
        Dedup.setSimPreflightIncrementalOracleSql(),
      "q261_embedding_drift" -> Ivf.embeddingDriftOracleSql(),
      "q262_phash_preflight" ->
        graft.multimodal.Multimodal.phashPreflightOracleSql(),
      "q263_containment_preflight" ->
        Dedup.containmentPreflightOracleSql(),
      // bit-identical to q260 by construction (the indexed corpus side
      // replays the same ranked/gramSets state) — the fresh oracle SQL
      // therefore checks the indexed path verbatim
      "q264_setsim_preflight_incr_indexed" ->
        Dedup.setSimPreflightIncrementalOracleSql(),
      "q265_contamination_spans" ->
        Decontaminate.contaminationSpansOracleSql(),
      "q266_decontam_incremental" ->
        HashSql.decontamIncrementalOracle,
      "q267_decontam_preflight" ->
        Decontaminate.decontamPreflightOracleSql(),
      "q268_span_audit_incr" ->
        Decontaminate.spanAuditIncrOracleSql(),
      "q269_lsh_band_plan" -> BandPlan.bandPlanOracleSql(),
      "q270_lsh_plane_plan" -> Similarity.planePlanOracleSql,
      "q146_dsir_select" -> HashSql.dsirOracle(),
      "q147_shard_manifest" -> Layout.shardManifestOracleSql(),
      "q148_temperature_mix" -> Sampling.temperatureMixOracleSql,
      "q149_fluency" -> Ranking.fluencyOracleSql,
    )
  }
}
