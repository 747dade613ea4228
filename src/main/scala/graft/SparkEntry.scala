package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.operators.{Analytics, Events, Expectations, Features, Gold, Graphs, PrefixJoin, Privacy, Relational, Scd2, TextOps, VectorOps}
import graft.sources.Bucketing
import graft.streaming.{StatefulFunnel, StreamingFunnel, TwsUserStats}
import graft.util.Portable.Sql._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every entry in [[queries]] has a DuckDB-equivalent in [[oracleSql]]
  * (the driver's correctness gate) unless the operator is not
  * SQL-expressible, in which case the driver records a rows-only check.
  * Column naming and float-determinism rules are documented in
  * [[graft.util.Portable]]: money flows through scaled integers so the
  * Spark and DuckDB results are bit-identical.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0:
    * the Gold star-schema fact build (SURVEY §7.2's end-to-end spine). */
  def entry(spark: SparkSession): DataFrame =
    Gold.factOrderItems(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q01_pricing_summary" -> (Relational.pricingSummary _),
    "q02_filter_topk" -> (Relational.filterTopkOrders _),
    "q03_revenue_by_nation" -> (Relational.revenueByNation _),
    "q04_brand_performance" -> (Relational.brandPerformance _),
    "q05_top_customers" -> (Relational.topCustomers _),
    "q06_distinct_users" -> (Relational.distinctUsers _),
    "q07_late_shipments" -> (Relational.lateShipments _),
    "q08_monthly_revenue" -> (Relational.monthlyRevenue _),
    "q09_funnel" -> (Events.funnel _),
    "q10_last_event_per_user" -> (Events.lastEventPerUser _),
    "q11_first_item_per_order" -> (Relational.firstItemPerOrder _),
    "q12_dedup_exact" -> (Relational.dedupExactDocs _),
    "q13_union_tagged" -> (Relational.unionTagged _),
    "q14_mode_brand" -> (Relational.modeBrand _),
    "q15_quantiles" -> (Relational.quantiles _),
    "q16_event_gaps" -> (Events.eventGaps _),
    "q17_sessionize" -> (Events.sessionize _),
    "q18_conversion_rates" -> (Events.conversionRates _),
    "q19_anti_join" -> (Relational.customersWithoutOrders _),
    "q20_dq_metrics" -> (Relational.dqMetrics _),
    "q21_customer_sk" -> (Relational.customerSk _),
    "q22_rollup_revenue" -> (Relational.rollupRevenue _),
    "q23_scd2_merge" -> (Scd2.ordersScenario _),
    "q24_gold_fact" -> (Gold.factOrderItems _),
    "q25_silver_events" -> (Events.silverEventsCleanse _),
    "q26_product_performance" -> (Gold.productPerformance _),
    "q27_token_stats" -> (TextOps.tokenStats _),
    "q28_quality_score" -> (TextOps.qualityScore _),
    "q29_lang_id" -> (TextOps.langId _),
    "q30_fingerprint" -> (TextOps.fingerprint _),
    "q31_simhash" -> (TextOps.simhash _),
    "q32_minhash_signature" -> (TextOps.minhashSignature _),
    "q33_minhash_near_dups" -> ((s, d) => TextOps.minhashNearDups(s, d)),
    "q34_ngram_jaccard" -> ((s, d) => TextOps.ngramJaccardPairs(s, d)),
    "q35_knn_cosine" -> ((s, d) => VectorOps.knnCosine(s, d)),
    "q36_embedding_pairs" -> ((s, d) => VectorOps.embeddingPairs(s, d)),
    "q37_streaming_funnel" -> (StreamingFunnel.funnel _),
    "q38_streaming_last_event" -> (StreamingFunnel.lastEventPerUser _),
    "q39_kpis" -> (Gold.kpis _),
    "q40_date_dim" -> (Gold.dateDim _),
    "q41_simhash_pairs" -> ((s, d) => TextOps.simhashNearDups(s, d)),
    "q42_streaming_stateful_funnel" -> (StatefulFunnel.progress _),
    "q43_scd2_asof_lookup" -> (Scd2.asOfLookup _),
    "q44_streaming_windowed_counts" -> (StreamingFunnel.windowedCounts _),
    "q45_pivot_events" -> (Events.pivotEventCounts _),
    "q46_cube_revenue" -> (Relational.cubeRevenue _),
    "q47_moving_avg" -> (Relational.movingAvgRevenue _),
    "q48_hash_sample" -> (Relational.hashSample _),
    "q49_kmv_distinct" -> (Events.approxDistinctUsers _),
    "q50_ivf_knn" -> ((s, d) => VectorOps.ivfKnn(s, d)),
    "q51_semi_join" -> (Relational.customersWithOrders _),
    "q52_except_users" -> (Relational.viewedNeverPurchased _),
    "q53_streaming_enriched" -> (StreamingFunnel.enrichedStageCounts _),
    "q54_string_funcs" -> (Relational.stringFuncs _),
    "q55_streaming_scd2" -> (graft.streaming.StreamingScd2.ordersScenarioStream _),
    "q56_regex_tokens" -> (TextOps.regexTokens _),
    "q57_intersect_days" -> (Relational.viewedAndPurchasedDays _),
    "q58_explode_tokens" -> (TextOps.explodeTokens _),
    "q59_salted_agg" -> ((s, d) => Relational.saltedRevenueByStatus(s, d)),
    "q60_gapfill_daily" -> (Relational.gapfillDailyRevenue _),
    "q61_grouping_sets" -> (Relational.groupingSetsRevenue _),
    "q62_ntile_ranks" -> (Relational.ntileRanks _),
    "q63_tfidf" -> ((s, d) => TextOps.tfidfTopTerms(s, d)),
    "q64_stratified_sample" -> (TextOps.stratifiedSample _),
    "q65_dedup_clusters" -> (Graphs.dedupClusters _),
    "q66_retention_cohorts" -> (Analytics.retentionCohorts _),
    "q67_rfm_segments" -> (Analytics.rfmSegments _),
    "q68_brand_pairs" -> ((s, d) => Analytics.brandPairs(s, d)),
    "q69_campaign_attr" -> (Analytics.campaignAttribution _),
    "q70_streaming_dedup" -> (graft.streaming.StreamingDedup.dedupedCounts _),
    "q71_eventgen_agg" -> (graft.sources.v2.EventGen.typeSummary _),
    "q72_asof_union" -> (Events.asofLastViewBeforePurchase _),
    "q73_incremental_agg" -> (Relational.incrementalRevenue _),
    "q74_streaming_eventgen" -> (graft.sources.v2.EventGen.streamTypeCounts _),
    "q75_salted_join" -> ((s, d) => Analytics.saltedWeightedValue(s, d)),
    "q76_kmeans_vq" -> ((s, d) => VectorOps.kmeansQuantize(s, d)),
    "q77_session_window" -> (Events.sessionWindows _),
    "q78_doc_histogram" -> ((s, d) => TextOps.docLengthHistogram(s, d)),
    "q79_unpivot" -> (Events.unpivotEventCounts _),
    "q80_percentile_disc" -> (Relational.percentileDiscPrices _),
    "q81_bloom_prune" -> (Relational.bloomPrunedRevenue _),
    "q82_moments" -> (Relational.groupedMoments _),
    "q83_fuzzy_names" -> (Relational.fuzzyNamePairs _),
    "q84_range_frame" -> (Relational.rangeFrameRevenue _),
    "q85_bag_ops" -> (Events.bagOpsDays _),
    "q86_array_funcs" -> (Events.arrayFuncs _),
    "q87_jaro_winkler" -> (Relational.jaroNamePairs _),
    "q88_streaming_join" -> (graft.streaming.StreamingJoin.viewsBeforePurchases _),
    "q89_date_funcs" -> (Relational.dateFuncs _),
    "q90_cond_bitwise" -> (Relational.condBitwise _),
    "q91_full_outer" -> (Relational.fullOuterDays _),
    "q92_correlated" -> (Relational.correlatedSubqueries _),
    "q93_chunk_docs" -> ((s, d) => TextOps.chunkDocs(s, d)),
    "q94_heavy_hitters" -> ((s, d) => Events.heavyHitters(s, d)),
    "q95_window_nav" -> (Events.windowNav _),
    "q96_kmv_setops" -> ((s, d) => Events.kmvSetOps(s, d)),
    "q97_media_meta" -> (graft.operators.Multimodal.mediaMeta _),
    "q98_ri_audit" -> (Relational.riAudit _),
    "q99_time_to_convert" -> (Analytics.timeToConvert _),
    "q100_topk_per_group" -> ((s, d) => Relational.topPartsPerBrand(s, d)),
    "q101_string_funcs2" -> (Relational.stringFuncs2 _),
    "q102_regression" -> (Relational.groupedRegression _),
    "q103_pivot_multi" -> (Events.pivotMultiAgg _),
    "q104_dedup_star" -> (Graphs.dedupClustersStar _),
    "q105_top_bigrams" -> ((s, d) => TextOps.topBigrams(s, d)),
    "q106_streaming_session" -> (StreamingFunnel.sessionWindows _),
    "q107_zorder" -> (Relational.zorderProfile _),
    "q108_pagination" -> (Relational.paginationPage3 _),
    "q109_rolling_distinct" -> (Events.rollingDistinctUsers _),
    "q110_token_entropy" -> (TextOps.tokenEntropy _),
    "q111_brand_pagerank" -> ((s, d) => Graphs.brandPageRank(s, d)),
    "q112_hof_sweep" -> (TextOps.hofSweep _),
    "q113_label_centroids" -> (VectorOps.labelCentroids _),
    "q114_dpp_revenue" -> (Relational.dppRevenue _),
    "q115_lateral_topk" -> (Relational.lateralTopOrders _),
    "q116_map_funcs" -> (Events.mapFuncs _),
    "q117_json_roundtrip" -> (Relational.jsonRoundTrip _),
    // q118/q119: sketch estimates are not bit-portable across engines
    // (DataSketches HLL / GK vs t-digest), so the gate contract is the
    // error ENVELOPE — exact values plus within-bound booleans the
    // oracle asserts TRUE (Round6Spec binds the same envelopes in-suite).
    "q118_hll_distinct" -> (Events.hllDistinct _),
    "q119_approx_quantiles" -> (Relational.approxQuantiles _),
    "q120_streaks" -> (Events.streaks _),
    "q121_brand_reach" -> ((s, d) => Graphs.brandReach(s, d)),
    "q122_activity_bitmap" -> (Events.activityBitmap _),
    "q123_markov_transitions" -> (Events.markovTransitions _),
    "q124_skyline" -> (Relational.skylineParts _),
    "q125_bucketed_join" -> (Bucketing.bucketedRevenue _),
    "q126_streaming_tws_stats" -> (TwsUserStats.userStats _),
    "q127_cosine_tf_pairs" -> ((s, d) => TextOps.cosineTfPairs(s, d)),
    "q128_cdc_apply" -> (Relational.cdcApply _),
    "q129_recent_views" -> (Events.recentViewsBeforePurchase _),
    "q130_sql_udf" -> (Relational.sqlUdfRevenue _),
    "q131_listagg" -> (Relational.listaggNations _),
    "q132_variant_props" -> (Events.variantProps _),
    "q133_try_arith" -> (Relational.tryArithStats _),
    "q134_decimal_money" -> (Relational.decimalMoney _),
    "q135_streaming_foreachbatch" ->
      (graft.streaming.ForeachBatchMerge.mergedTypeCounts _),
    "q136_pack_sequences" -> ((s, d) => TextOps.packDocuments(s, d)),
    "q139_streaming_golden" ->
      (graft.streaming.StreamingLifecycle.goldenFunnel _),
    "q140_pack_stats" -> ((s, d) => TextOps.packStats(s, d)),
    "q137_pii_redaction" -> (TextOps.redactPii _),
    "q138_embedding_dedup" ->
      ((s, d) => VectorOps.embeddingDedupClusters(s, d)),
    "q141_embedding_dedup_ivf" ->
      ((s, d) => VectorOps.embeddingDedupIvf(s, d)),
    "q142_decontaminate" -> ((s, d) => TextOps.decontaminate(s, d)),
    "q143_repetition_stats" -> ((s, d) => TextOps.repetitionStats(s, d)),
    "q144_shuffle_shard" -> ((s, d) => TextOps.shuffleShard(s, d)),
    "q145_curation_verdicts" -> (TextOps.curationVerdicts _),
    "q146_curation_funnel" -> (TextOps.curationFunnel _),
    "q147_streaming_doc_dedup" ->
      (graft.streaming.StreamingDedup.dedupedDocStats _),
    "q148_streaming_sliding_window" ->
      (StreamingFunnel.slidingWindowCounts _),
    "q149_lang_mixture" -> (TextOps.langMixture _),
    "q150_corpus_diff" -> (TextOps.corpusDiff _),
    "q151_merge_upsert_delete" ->
      (graft.sources.ParquetMerge.mergeScenario _),
    "q152_streaming_left_outer_join" ->
      (graft.streaming.StreamingJoin.purchasesWithViewAttribution _),
    "q153_embedding_dedup_indexed" ->
      ((s, d) => VectorOps.embeddingDedupIvfIndexed(s, d)),
    "q154_training_pipeline" ->
      ((s, d) => graft.TrainingPipeline.trainingSet(s, d)),
    "q155_embedding_dedup_trained" ->
      ((s, d) => VectorOps.embeddingDedupIvfTrained(s, d)),
    "q156_media_header_dims" ->
      (graft.operators.Multimodal.mediaHeaderDims _),
    "q157_incremental_curation" ->
      (graft.operators.IncrementalCuration.incrementalCuration _),
    "q158_embedding_dedup_incremental" ->
      ((s, d) => VectorOps.embeddingDedupIncremental(s, d)),
    "q159_quality_canonical" -> (TextOps.qualityCanonical _),
    "q160_vocab_coverage" -> ((s, d) => TextOps.vocabCoverage(s, d)),
    "q161_ivf_knn_indexed" -> ((s, d) => VectorOps.ivfKnnIndexed(s, d)),
    "q162_streaming_curation" ->
      (graft.streaming.StreamingCuration.curationStream _),
    "q163_ivf_unified" -> ((s, d) => VectorOps.ivfKnnUnified(s, d)),
    "q164_sentiment_lexicon" -> (TextOps.sentimentLexiconScore _),
    "q165_leakage_safe_split" -> (Graphs.leakageSafeSplit _),
    "q166_int8_knn" -> ((s, d) => VectorOps.int8Knn(s, d)),
    "q167_change_feed" -> (graft.operators.TimeTravel.changeFeed _),
    "q168_time_travel" -> (graft.operators.TimeTravel.asOfSnapshot _),
    "q169_distribution_drift" -> (Analytics.distributionDrift _),
    "q170_knn_join" -> ((s, d) => VectorOps.knnJoin(s, d)),
    "q171_maxsim" -> ((s, d) => VectorOps.maxSimKnn(s, d)),
    "q172_token_budget_sample" -> (TextOps.tokenBudgetSample _),
    "q173_cross_source_overlap" -> (TextOps.crossSourceOverlap _),
    "q174_retrieval" -> ((s, d) => graft.operators.Retrieval.retrieve(s, d)),
    "q175_pq_knn" -> ((s, d) => VectorOps.pqKnn(s, d)),
    "q176_streaming_drift" ->
      (graft.streaming.StreamingDrift.driftMonitor _),
    "q177_ivfadc" -> ((s, d) => VectorOps.ivfAdcKnn(s, d)),
    "q178_unigram_lm" -> ((s, d) => TextOps.unigramLmScore(s, d)),
    "q179_label_outliers" -> ((s, d) => VectorOps.labelOutliers(s, d)),
    "q180_source_data_card" -> (TextOps.sourceDataCard _),
    "q181_ngram_novelty" -> (TextOps.ngramNovelty _),
    "q182_bm25" -> ((s, d) => graft.operators.Retrieval.bm25(s, d)),
    "q183_wordpiece" -> (TextOps.wordpieceStats _),
    "q184_temperature_mixture" -> (TextOps.temperatureMixture _),
    "q185_pca_power" -> ((s, d) => VectorOps.pcaPowerProjection(s, d)),
    "q186_ann_recall_audit" -> ((s, d) => VectorOps.annRecallAudit(s, d)),
    "q187_streaming_topk" ->
      ((s, d) => graft.streaming.StreamingTopK.topSpenders(s, d)),
    "q188_hard_negatives" ->
      ((s, d) => graft.operators.Retrieval.hardNegatives(s, d)),
    "q189_dsir" -> (TextOps.dsirSelect _),
    "q190_cluster_data_card" ->
      ((s, d) => VectorOps.clusterDataCard(s, d)),
    "q191_mmr" -> ((s, d) => graft.operators.Retrieval.mmrRetrieve(s, d)),
    "q192_dedup_profile" -> (TextOps.dedupProfile _),
    "q193_event_sequences" -> ((s, d) => Events.eventSequences(s, d)),
    "q194_weighted_sample" -> (TextOps.weightedSample _),
    "q195_embedding_drift" -> ((s, d) => VectorOps.embeddingDrift(s, d)),
    "q196_posting_stats_incremental" ->
      (TextOps.postingStatsIncremental _),
    "q197_retrieval_eval" ->
      ((s, d) => VectorOps.retrievalEvalMart(s, d)),
    "q198_media_card" ->
      (graft.operators.Multimodal.mediaCard _),
    "q199_skew_advisor" -> (Analytics.skewAdvisor _),
    "q200_release_manifest" -> (TextOps.releaseManifest _),
    "q201_similarity_join" -> ((s, d) => PrefixJoin.similarityJoin(s, d)),
    "q202_target_encoding" -> ((s, d) => Features.targetEncodeOof(s, d)),
    "q203_label_noise" -> ((s, d) => VectorOps.labelNoiseKnn(s, d)),
    "q204_triangle_stats" -> ((s, d) => Graphs.triangleStats(s, d)),
    "q205_purged_split" -> ((s, d) => Features.purgedTemporalSplit(s, d)),
    "q206_bpe_train" -> ((s, d) => operators.BpeTrain.bpeMerges(s, d)),
    "q207_bpe_apply" -> ((s, d) => operators.BpeTrain.bpeApply(s, d)),
    "q208_k_anonymity" -> ((s, d) => Features.kAnonymity(s, d)),
    "q209_containment_join" -> ((s, d) => PrefixJoin.containmentJoin(s, d)),
    "q210_dedup_weights" -> ((s, d) => TextOps.dedupWeights(s, d)),
    "q211_bigram_lm" -> ((s, d) => TextOps.bigramLmScore(s, d)),
    "q212_streaming_decontaminate" ->
      ((s, d) => graft.streaming.StreamingDecontam.containmentStream(s, d)),
    "q213_curriculum" -> ((s, d) => TextOps.curriculumStages(s, d)),
    "q214_cross_source_dups" -> ((s, d) => TextOps.crossSourceDups(s, d)),
    "q215_split_divergence" -> ((s, d) => TextOps.splitDivergence(s, d)),
    "q216_split_integrity" -> ((s, d) => Graphs.splitIntegrity(s, d)),
    "q217_triplet_mining" -> ((s, d) => Analytics.tripletMining(s, d)),
    "q218_rag_context" ->
      ((s, d) => operators.Retrieval.ragContext(s, d)),
    "q219_coreset" -> ((s, d) => VectorOps.coresetSelect(s, d)),
    "q220_bot_score" -> ((s, d) => Events.botScore(s, d)),
    "q221_woe_iv" -> ((s, d) => Features.woeIv(s, d)),
    "q222_mutual_info" -> ((s, d) => Features.mutualInfo(s, d)),
    "q223_benford" -> ((s, d) => Features.benfordAudit(s, d)),
    "q224_bootstrap_se" -> ((s, d) => Analytics.bootstrapSe(s, d)),
    "q225_capture_recapture" ->
      ((s, d) => Analytics.captureRecapture(s, d)),
    "q226_unseen_mass" -> ((s, d) => TextOps.unseenMass(s, d)),
    "q227_seasonal_decompose" ->
      ((s, d) => Analytics.seasonalDecompose(s, d)),
    "q228_source_overlap" -> ((s, d) => TextOps.sourceOverlap(s, d)),
    "q229_cluster_balanced" ->
      ((s, d) => VectorOps.clusterBalancedSample(s, d)),
    "q230_cardinality_audit" ->
      ((s, d) => Analytics.cardinalityAudit(s, d)),
    "q231_embedding_dedup_deletes" ->
      ((s, d) => VectorOps.embeddingDedupWithDeletes(s, d)),
    "q232_posting_stats_deletes" ->
      (TextOps.postingStatsWithDeletes _),
    "q233_dedup_upsert_delete" ->
      ((s, d) => VectorOps.embeddingDedupUpsertDelete(s, d)),
    "q234_bm25_after_deletes" ->
      ((s, d) => operators.Retrieval.bm25AfterDeletes(s, d)),
    "q235_streaming_ivf_maintain" ->
      ((s, d) => streaming.StreamingIvfMaintainer.maintainerStream(s, d)),
    "q236_streaming_posting_stats" ->
      ((s, d) => streaming.StreamingPostingStats.statsStream(s, d)),
    "q237_streaming_ivf_serve" ->
      ((s, d) => streaming.StreamingIvfMaintainer.servedKnn(s, d)),
    "q286_streaming_ivf_pruned_serve" ->
      ((s, d) => streaming.StreamingIvfMaintainer.servedKnnPruned(s, d)),
    "q238_pii_redaction" -> ((s, d) => Privacy.piiRedaction(s, d)),
    "q239_k_anonymity" -> ((s, d) => Privacy.kAnonymity(s, d)),
    "q240_shared_substrings" ->
      ((s, d) => TextOps.sharedSubstringSpans(s, d)),
    "q241_anonymized_release" ->
      ((s, d) => Privacy.anonymizedRelease(s, d)),
    "q242_mp4_box_walk" ->
      ((s, d) => graft.operators.Multimodal.mp4BoxWalk(s, d)),
    "q243_label_propagation" ->
      ((s, d) => Graphs.labelPropagation(s, d)),
    "q244_prf_expansion" ->
      ((s, d) => operators.Retrieval.prfBm25(s, d)),
    "q245_attribution" -> ((s, d) => Events.attribution(s, d)),
    "q246_robust_stats" -> ((s, d) => Analytics.robustStats(s, d)),
    "q247_zipf_profile" -> ((s, d) => TextOps.zipfProfile(s, d)),
    "q248_l_diversity" -> ((s, d) => Privacy.lDiversity(s, d)),
    "q249_item_recs" -> ((s, d) => Analytics.itemItemRecs(s, d)),
    "q250_ewma_forecast" -> ((s, d) => Analytics.ewmaForecast(s, d)),
    "q251_streaming_ewma" ->
      ((s, d) => streaming.StreamingEwma.ewmaMonitor(s, d)),
    "q252_cuped" -> ((s, d) => Analytics.cupedExperiment(s, d)),
    "q253_conversion_z" -> ((s, d) => Analytics.conversionZ(s, d)),
    "q254_expectations" -> ((s, d) => Expectations.expectations(s, d)),
    "q255_forecast_backtest" ->
      ((s, d) => Analytics.forecastBacktest(s, d)),
    "q256_assoc_rules" -> ((s, d) => Analytics.associationRules(s, d)),
    "q257_concentration" ->
      ((s, d) => Analytics.revenueConcentration(s, d)),
    "q258_purchase_gaps" -> ((s, d) => Analytics.purchaseGaps(s, d)),
    "q259_geo_rollup" -> ((s, d) => Analytics.revenueByGeo(s, d)),
    "q260_session_trigrams" ->
      ((s, d) => Events.sessionPathTrigrams(s, d)),
    "q261_price_boxplot" -> ((s, d) => Analytics.brandPriceBoxplot(s, d)),
    "q262_repeat_hazard" ->
      ((s, d) => Analytics.repeatPurchaseHazard(s, d)),
    "q263_wilson_conversion" ->
      ((s, d) => Analytics.weeklyConversionWilson(s, d)),
    "q264_brand_share_shift" ->
      ((s, d) => Analytics.brandShareShift(s, d)),
    "q265_stage_latency" ->
      ((s, d) => Analytics.funnelStageLatency(s, d)),
    "q266_comparable_index" ->
      ((s, d) => Analytics.comparableRevenueIndex(s, d)),
    "q267_demand_movers" -> ((s, d) => Analytics.demandTrendMovers(s, d)),
    "q268_rank_sum_test" -> ((s, d) => Analytics.rankSumTest(s, d)),
    "q269_ks_test" -> ((s, d) => Analytics.ksTest(s, d)),
    "q270_cohort_ltv" -> ((s, d) => Analytics.cohortLtv(s, d)),
    "q271_abc_classes" -> ((s, d) => Analytics.abcClassification(s, d)),
    "q272_basket_dispersion" ->
      ((s, d) => Analytics.basketDispersion(s, d)),
    "q273_new_vs_returning" ->
      ((s, d) => Analytics.newVsReturning(s, d)),
    "q274_entry_conversion" ->
      ((s, d) => Analytics.entryTypeConversion(s, d)),
    "q275_tier_migration" ->
      ((s, d) => Analytics.spendQuartileMigration(s, d)),
    "q276_ordered_funnel" -> ((s, d) => Events.orderedFunnel(s, d)),
    "q277_windowed_funnel" -> ((s, d) => Events.windowedFunnel(s, d)),
    "q278_traffic_heatmap" -> ((s, d) => Events.trafficHeatmap(s, d)),
    "q279_brand_triples" -> ((s, d) => Analytics.brandTriples(s, d)),
    "q280_brand_transitions" ->
      ((s, d) => Analytics.brandTransitions(s, d)),
    "q281_chi_square" ->
      ((s, d) => Analytics.chiSquareIndependence(s, d)),
    "q282_segment_affinity" ->
      ((s, d) => Analytics.segmentBrandAffinity(s, d)),
    "q283_value_histogram" ->
      ((s, d) => Analytics.valueHistogramLog2(s, d)),
    "q284_cohort_repeat" -> ((s, d) => Analytics.cohortRepeatRate(s, d)),
    "q285_discount_response" ->
      ((s, d) => Analytics.discountResponse(s, d)),
    "q287_matryoshka_recall" ->
      ((s, d) => VectorOps.matryoshkaRecall(s, d)),
    "q288_kcore" -> ((s, d) => Graphs.kCore(s, d)),
    "q289_tar_member_walk" ->
      ((s, d) => graft.operators.Multimodal.tarMemberWalk(s, d)),
    "q290_rrf_fusion" ->
      ((s, d) => operators.Retrieval.rrfFusion(s, d)),
    "q291_epoch_mix" -> ((s, d) => TextOps.epochMixPlan(s, d)),
    "q292_streaming_bm25_serve" ->
      ((s, d) => streaming.StreamingBm25Index.servedBm25(s, d)),
    "q293_ivfadc_rerank" -> ((s, d) => VectorOps.ivfAdcRerank(s, d)),
    "q294_kcenter_select" -> ((s, d) => VectorOps.kcenterSelect(s, d)),
    "q295_brand_hits" -> ((s, d) => Analytics.brandHits(s, d)),
    "q296_holt_forecast" -> ((s, d) => Analytics.holtForecast(s, d)),
    "q297_price_mad" -> ((s, d) => Analytics.brandPriceMad(s, d)),
    "q298_tokenizer_fertility" ->
      ((s, d) => TextOps.tokenizerFertility(s, d)),
    "q299_funnel_absorption" ->
      ((s, d) => Events.funnelAbsorption(s, d)),
    "q300_markov_attribution" ->
      ((s, d) => Events.markovAttribution(s, d)),
    "q301_t_closeness" -> ((s, d) => Privacy.tCloseness(s, d)),
    "q302_zip_member_walk" ->
      ((s, d) => graft.operators.Multimodal.zipMemberWalk(s, d)),
    "q303_chunk_near_dups" ->
      ((s, d) => TextOps.chunkNearDups(s, d)),
    "q304_dp_noisy_release" -> ((s, d) => Privacy.dpNoisyRelease(s, d)),
    "q305_streaming_holt" ->
      ((s, d) => streaming.StreamingEwma.holtMonitor(s, d)),
    "q306_fused_rag_context" ->
      ((s, d) => operators.Retrieval.fusedRagContext(s, d)),
    "q307_retrieval_agreement" ->
      ((s, d) => operators.Retrieval.retrievalAgreement(s, d)),
    "q308_kn_bigram_lm" -> ((s, d) => TextOps.knBigramLmScore(s, d)),
    "q309_decayed_covisitation" ->
      ((s, d) => Analytics.decayedCovisitation(s, d)),
    "q310_streaming_dlq" ->
      ((s, d) => streaming.StreamingDlq.routedCounts(s, d)),
    "q311_shapley_attribution" ->
      ((s, d) => Events.shapleyAttribution(s, d)),
    "q312_cusum_changepoints" ->
      ((s, d) => Analytics.cusumChangepoints(s, d)),
    "q313_kaplan_meier" -> ((s, d) => Analytics.kaplanMeier(s, d)),
    "q314_bq_knn" -> ((s, d) => VectorOps.bqKnn(s, d)),
    "q315_ccnet_buckets" ->
      ((s, d) => TextOps.ccnetPerplexityBuckets(s, d)),
    "q316_bitext_margin" -> ((s, d) => VectorOps.bitextMargin(s, d)),
    "q317_eventgen_agg_pushdown" ->
      (graft.sources.v2.EventGen.aggPushSummary _),
    "q318_warc_record_walk" ->
      ((s, d) => graft.operators.Multimodal.warcRecordWalk(s, d)),
    "q319_did_lift" -> ((s, d) => Analytics.didPromoLift(s, d)),
    "q320_streaming_cusum" ->
      ((s, d) => streaming.StreamingEwma.cusumMonitor(s, d)),
    "q321_quality_distill" ->
      ((s, d) => Features.logisticQualityDistill(s, d)),
    "q322_distill_calibration" ->
      ((s, d) => Features.distillCalibration(s, d)),
    "q323_fuzzy_names_banded" ->
      (Relational.fuzzyNamePairsBanded _),
    "q324_conformal_forecast" ->
      ((s, d) => Analytics.conformalForecast(s, d)),
    "q325_streaming_conformal" ->
      ((s, d) => streaming.StreamingEwma.conformalMonitor(s, d)),
    "q326_eventgen_topn_pushdown" ->
      (graft.sources.v2.EventGen.topNPushSummary _),
    "q327_bq_ivf_knn" -> ((s, d) => VectorOps.bqIvfKnn(s, d)),
    "q328_segmented_bm25_serve" ->
      ((s, d) => streaming.SegmentedBm25Index.servedBm25(s, d)),
    "q329_nb_distill" -> ((s, d) => Features.naiveBayesDistill(s, d)),
  )

  /** DuckDB oracle SQL for every [[queries]] entry, aggregated from
    * the per-family registries (graft.oracles.*) so each oracle lives
    * beside the operator family it gates. */
  def oracleSql: Map[String, String] =
    graft.oracles.RelationalOracles.map ++
    graft.oracles.TextOracles.map ++
    graft.oracles.AnalyticsOracles.map ++
    graft.oracles.VectorOracles.map ++
    graft.oracles.StreamingOracles.map
}
