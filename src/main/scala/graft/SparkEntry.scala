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
  )

  // ---- DuckDB oracle SQL ------------------------------------------------

  /** The Wilson 95% tree (q263/q274) as SQL strings — mirrors
    * `Analytics.wilson` expression-for-expression. Returns
    * (phat, lo, hi). */
  private def wilsonSql(n: String, k: String)
      : (String, String, String) = {
    val phat = s"($k) / ($n)"
    val denom = s"1.0 + (1.96 * 1.96) / ($n)"
    val center = s"(($phat) + (1.96 * 1.96) / (2.0 * ($n))) / ($denom)"
    val half = s"1.96 * sqrt(($phat) * (1.0 - ($phat)) / ($n)" +
      s" + (1.96 * 1.96) / (4.0 * ($n) * ($n))) / ($denom)"
    (phat, s"($center) - ($half)", s"($center) + ($half)")
  }
  // Money mirrors graft.util.Portable: floor(x*scale+0.5) scaled-integer
  // sums, divided back to double only at the output boundary. Every
  // multi-row result carries a total ORDER BY.

  private val netExpr = "l_extendedprice * (1.0 - l_discount)"

  /** Shared by q169 (batch PSI) and q176 (the continuous monitor —
    * the drained incremental state must read off the identical
    * statistic). */
  private val psiDriftSql: String =
    """WITH e AS (SELECT event_type,
      |    CAST(LEAST(FLOOR(value / 50.0), 9.0) AS INT) AS bucket,
      |    ts < TIMESTAMP '2024-01-16 00:00:00' AS is_a
      |  FROM events),
      |g AS (SELECT event_type, bucket,
      |    CAST(SUM(CASE WHEN is_a THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
      |    CAST(SUM(CASE WHEN is_a THEN 0 ELSE 1 END) AS BIGINT) AS n_b
      |  FROM e GROUP BY 1, 2),
      |t AS (SELECT *,
      |    SUM(n_a) OVER (PARTITION BY event_type) AS tot_a,
      |    SUM(n_b) OVER (PARTITION BY event_type) AS tot_b FROM g),
      |c AS (SELECT event_type, bucket, n_a, n_b,
      |    CAST(FLOOR((CAST(n_a + 1 AS DOUBLE) / (tot_a + 10)
      |        - CAST(n_b + 1 AS DOUBLE) / (tot_b + 10))
      |      * ln((CAST(n_a + 1 AS DOUBLE) / (tot_a + 10))
      |          / (CAST(n_b + 1 AS DOUBLE) / (tot_b + 10)))
      |      * 1000000000.0 + 0.5) AS BIGINT) AS c9
      |  FROM t)
      |SELECT event_type, bucket, n_a, n_b,
      |  CAST(c9 AS DOUBLE) / 1000000000.0 AS contrib,
      |  CAST(SUM(c9) OVER (PARTITION BY event_type) AS DOUBLE)
      |    / 1000000000.0 AS psi
      |FROM c
      |ORDER BY event_type NULLS FIRST, bucket NULLS FIRST""".stripMargin

  /** DuckDB mirror of [[graft.util.Portable.portable32]]. */
  private def h32(x: String) = s"CAST('0x' || substr(md5($x), 1, 8) AS BIGINT)"

  /** DuckDB mirror of [[TextOps.contentFp]] (for interpolated contexts
    * where a literal backslash escape is awkward). */
  private val fpSqlExpr =
    "md5(regexp_replace(lower(text), '\\s+', ' ', 'g'))"

  /** Generated CTE chain mirroring [[graft.operators.BpeTrain]]: one
    * chain link per merge round (pair counts → argmax → positional
    * rebuild). Shared by q206 (per-round stats) and q207 (the apply
    * pass over the final vocabulary v8). */
  private val bpeIters = 8
  private val bpeCtes: String = {
    val iters = bpeIters
    val v0 =
      """v0 AS (
        |  SELECT word, CAST(COUNT(*) AS BIGINT) AS freq,
        |    list_transform(range(1, len(word)+1),
        |      i -> substr(word, i, 1)) AS syms
        |  FROM (SELECT UNNEST(string_split(text, ' ')) AS word
        |    FROM documents)
        |  WHERE word <> '' GROUP BY word)""".stripMargin
    val rounds = (1 to iters).map { i =>
      val p = i - 1
      s"""p$i AS (
         |  SELECT p.l AS l, p.r AS r,
         |    CAST(SUM(freq) AS BIGINT) AS cnt FROM (
         |    SELECT freq, UNNEST(list_transform(range(1, len(syms)),
         |      j -> struct_pack(l := syms[j], r := syms[j+1]))) AS p
         |    FROM v$p WHERE len(syms) >= 2)
         |  WHERE p.l <> p.r GROUP BY 1, 2),
         |b$i AS (SELECT l, r, cnt FROM p$i ORDER BY cnt DESC, l, r
         |  LIMIT 1),
         |v$i AS (
         |  SELECT word, freq,
         |    list_filter(list_transform(range(1, len(syms)+1), j ->
         |      CASE WHEN j > 1 AND syms[j-1] = b.l AND syms[j] = b.r
         |        THEN NULL
         |      WHEN syms[j] = b.l AND j < len(syms)
         |          AND syms[j+1] = b.r
         |        THEN syms[j] || syms[j+1]
         |      ELSE syms[j] END), x -> x IS NOT NULL) AS syms
         |  FROM v$p CROSS JOIN b$i b)""".stripMargin
    }
    (v0 +: rounds).mkString(",\n")
  }

  private val bpeTrainSql: String = {
    val stats = (1 to bpeIters).map { i =>
      s"""SELECT CAST($i AS INT) AS iteration, b.l AS left_sym,
         |  b.r AS right_sym, b.cnt AS n_sites,
         |  (SELECT CAST(COUNT(DISTINCT s) AS BIGINT)
         |   FROM v$i, UNNEST(syms) t(s)) AS vocab_size
         |FROM b$i b""".stripMargin
    }
    s"WITH $bpeCtes\n" +
      stats.mkString("\nUNION ALL\n") + "\nORDER BY iteration"
  }

  /** q191's full MMR oracle — also the base subquery of q218. */
  private lazy val mmrOracle: String =
    s"""WITH $docVecCtes,
         |rdots AS (SELECT a.doc_id AS query_id, b.doc_id AS doc_id,
         |    SUM(a.w * b.w) AS dot
         |  FROM dvec a JOIN dvec b ON a.dim = b.dim
         |  WHERE a.doc_id % 100 = 0 AND a.doc_id <> b.doc_id
         |  GROUP BY 1, 2),
         |rel0 AS (SELECT qn.doc_id AS query_id, cn.doc_id,
         |    CAST(COALESCE(d.dot, 0) AS DOUBLE)
         |      / (sqrt(CAST(qn.n2 AS DOUBLE)) * sqrt(CAST(cn.n2 AS DOUBLE)))
         |      AS rel
         |  FROM dnorm qn JOIN dnorm cn
         |    ON qn.doc_id % 100 = 0 AND cn.doc_id <> qn.doc_id
         |  LEFT JOIN rdots d ON d.query_id = qn.doc_id
         |    AND d.doc_id = cn.doc_id
         |  WHERE qn.n2 > 0 AND cn.n2 > 0),
         |pool AS (SELECT query_id, doc_id, rel FROM (
         |    SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
         |      ORDER BY rel DESC NULLS LAST, doc_id) AS rr
         |    FROM rel0) WHERE rr <= 10),
         |pids AS (SELECT DISTINCT doc_id FROM pool),
         |pvec AS (SELECT v.* FROM dvec v JOIN pids USING (doc_id)),
         |pdots AS (SELECT a.doc_id AS da, b.doc_id AS db,
         |    SUM(a.w * b.w) AS dot
         |  FROM pvec a JOIN pvec b ON a.dim = b.dim
         |  WHERE a.doc_id <> b.doc_id GROUP BY 1, 2),
         |psim AS (SELECT p1.query_id, p1.doc_id AS da, p2.doc_id AS db,
         |    CAST(COALESCE(d.dot, 0) AS DOUBLE)
         |      / (sqrt(CAST(na.n2 AS DOUBLE)) * sqrt(CAST(nb.n2 AS DOUBLE)))
         |      AS sim
         |  FROM pool p1 JOIN pool p2 ON p1.query_id = p2.query_id
         |    AND p1.doc_id <> p2.doc_id
         |  JOIN dnorm na ON na.doc_id = p1.doc_id
         |  JOIN dnorm nb ON nb.doc_id = p2.doc_id
         |  LEFT JOIN pdots d ON d.da = p1.doc_id AND d.db = p2.doc_id),
         |s1 AS (SELECT query_id, doc_id AS d1, 0.7 * rel AS score1
         |  FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
         |      ORDER BY rel DESC NULLS LAST, doc_id) AS rn
         |    FROM pool) WHERE rn = 1),
         |m2 AS (SELECT p.query_id, p.doc_id, s1.d1, s1.score1,
         |    0.7 * p.rel - 0.3 * ps.sim AS mmr2
         |  FROM pool p JOIN s1 USING (query_id)
         |  JOIN psim ps ON ps.query_id = p.query_id
         |    AND ps.da = p.doc_id AND ps.db = s1.d1
         |  WHERE p.doc_id <> s1.d1),
         |s2 AS (SELECT query_id, d1, score1, doc_id AS d2, mmr2 AS score2
         |  FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
         |      ORDER BY mmr2 DESC NULLS LAST, doc_id) AS rn
         |    FROM m2) WHERE rn = 1),
         |m3 AS (SELECT p.query_id, p.doc_id, s2.d1, s2.d2, s2.score1,
         |    s2.score2,
         |    0.7 * p.rel - 0.3 * GREATEST(pa.sim, pb.sim) AS mmr3
         |  FROM pool p JOIN s2 USING (query_id)
         |  JOIN psim pa ON pa.query_id = p.query_id
         |    AND pa.da = p.doc_id AND pa.db = s2.d1
         |  JOIN psim pb ON pb.query_id = p.query_id
         |    AND pb.da = p.doc_id AND pb.db = s2.d2
         |  WHERE p.doc_id <> s2.d1 AND p.doc_id <> s2.d2),
         |s3 AS (SELECT * FROM (SELECT *, ROW_NUMBER() OVER (
         |      PARTITION BY query_id ORDER BY mmr3 DESC NULLS LAST,
         |      doc_id) AS rn
         |    FROM m3) WHERE rn = 1),
         |u AS (SELECT query_id, 1 AS pick_no, d1 AS doc_id,
         |    score1 AS score FROM s3
         |  UNION ALL SELECT query_id, 2, d2, score2 FROM s3
         |  UNION ALL SELECT query_id, 3, doc_id, mmr3 FROM s3)
         |SELECT query_id, pick_no, doc_id, ${val6("score")} AS score
         |FROM u ORDER BY query_id, pick_no""".stripMargin

  /** Relational exact containment (shared by q209's batch join and
    * q212's drained streaming monitor — one contract, two run modes). */
  private lazy val containmentOracle: String =
    s"""WITH d AS (SELECT doc_id, text, string_split(text, ' ') AS ws
       |  FROM documents),
       |s AS (SELECT doc_id, list_distinct($shingleExpr) AS shs FROM d),
       |ta AS (SELECT doc_id, UNNEST(shs) AS tok FROM s
       |  WHERE doc_id % 25 = 0),
       |sa AS (SELECT doc_id, len(shs) AS m FROM s
       |  WHERE doc_id % 25 = 0),
       |tb AS (SELECT doc_id, UNNEST(shs) AS tok FROM s),
       |ov AS (SELECT a.doc_id AS eval_id, b.doc_id AS doc_id,
       |    CAST(COUNT(*) AS DOUBLE) AS c
       |  FROM ta a JOIN tb b ON a.tok = b.tok
       |    AND a.doc_id <> b.doc_id
       |  GROUP BY 1, 2),
       |j AS (SELECT eval_id, ov.doc_id, c / sa.m AS cont
       |  FROM ov JOIN sa ON ov.eval_id = sa.doc_id)
       |SELECT eval_id, doc_id, ${val6("cont")} AS containment
       |FROM j WHERE cont >= 0.5
       |ORDER BY eval_id NULLS FIRST, doc_id NULLS FIRST""".stripMargin

  /** DuckDB mirror of TextOps.shingles over `text` and `ws` columns. */
  private val shingleExpr =
    "CASE WHEN len(ws) < 3 THEN [text] ELSE " +
      "list_transform(range(1, len(ws) - 1), " +
      "i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]) END"

  /** DuckDB mirror of TextOps.simhash: 32 bit-majority terms. */
  private val simhashCore: String = {
    val terms = (0 until TextOps.SimhashBits).map { b =>
      s"CASE WHEN 2 * len(list_filter(hs, x -> ((x >> $b) & 1) = 1)) " +
        s">= len(hs) THEN ${1L << b} ELSE 0 END"
    }
    s"""h AS (SELECT doc_id,
       |  list_transform(string_split(text, ' '), t -> ${h32("t")}) AS hs
       |  FROM documents),
       |sim AS (
       |  SELECT doc_id, CAST(${terms.mkString("\n  + ")} AS BIGINT) AS simhash
       |  FROM h)""".stripMargin
  }

  private val simhashSql: String =
    s"WITH $simhashCore\nSELECT doc_id, simhash FROM sim ORDER BY doc_id NULLS FIRST"

  private def minhashCols: String =
    (0 until TextOps.MinhashSeeds).map(i =>
      s"list_min(list_transform(hs, h -> (h * ${TextOps.MinhashA(i)} " +
        s"+ ${TextOps.MinhashB(i)}) % ${TextOps.MinhashP})) AS mh$i")
      .mkString(",\n  ")

  private val minhashSigSql: String =
    s"""WITH d AS (SELECT doc_id, text, string_split(text, ' ') AS ws
       |  FROM documents),
       |s AS (SELECT doc_id,
       |  list_transform($shingleExpr, x -> ${h32("x")}) AS hs FROM d)
       |SELECT doc_id,
       |  $minhashCols
       |FROM s ORDER BY doc_id NULLS FIRST""".stripMargin

  private val jaccardExpr =
    "CAST(len(list_intersect(a.shs, b.shs)) AS DOUBLE) " +
      "/ len(list_distinct(list_concat(a.shs, b.shs)))"

  /** CTE chain ending in `pairs(ida, idb, jaccard)` — the verified
    * MinHash near-dup pairs. Shared by q33 (the pair list itself) and
    * q65 (connected components over the pair graph); `src` parameterizes
    * the corpus so q157 can run the identical chain over a SNAPSHOT
    * derivation CTE instead of the raw documents table. */
  private def minhashPairsCtesFrom(src: String): String = {
    val bands = (0 until TextOps.MinhashSeeds / 2).map(b =>
      s"SELECT doc_id, $b AS band, mh${2 * b} AS h1, mh${2 * b + 1} AS h2 FROM sig")
      .mkString("\n  UNION ALL ")
    s"""d AS (SELECT doc_id, text, string_split(text, ' ') AS ws
       |  FROM $src),
       |s AS (SELECT doc_id, $shingleExpr AS sh FROM d),
       |sh AS (SELECT doc_id,
       |  list_transform(sh, x -> ${h32("x")}) AS hs FROM s),
       |sig AS (SELECT doc_id,
       |  $minhashCols
       |  FROM sh),
       |bands AS (
       |  $bands),
       |cand AS (
       |  SELECT DISTINCT x.doc_id AS ida, y.doc_id AS idb
       |  FROM bands x JOIN bands y
       |    ON x.band = y.band AND x.h1 = y.h1 AND x.h2 = y.h2
       |   AND x.doc_id < y.doc_id),
       |sets AS (SELECT doc_id, list_distinct(sh) AS shs FROM s),
       |cpairs AS (
       |  SELECT ida, idb, $jaccardExpr AS jacc
       |  FROM cand JOIN sets a ON ida = a.doc_id JOIN sets b ON idb = b.doc_id),
       |pairs AS (
       |  SELECT ida, idb, ${val6("jacc")} AS jaccard
       |  FROM cpairs WHERE jacc >= 0.7)""".stripMargin
  }

  private val minhashPairsCtes: String = minhashPairsCtesFrom("documents")

  private val minhashNearDupSql: String =
    s"""WITH $minhashPairsCtes
       |SELECT ida, idb, jaccard FROM pairs
       |ORDER BY ida NULLS FIRST, idb NULLS FIRST""".stripMargin

  /** Shared by q65 (min-label propagation) and q104 (large-star/small-
    * star): two algorithms, one contract, one oracle closure. */
  private val dedupClustersOracle: String =
    s"""WITH RECURSIVE $minhashPairsCtes,
       |edges AS (SELECT ida AS s, idb AS d FROM pairs
       |  UNION SELECT idb, ida FROM pairs),
       |reach(id, r) AS (
       |  SELECT s, d FROM edges
       |  UNION
       |  SELECT w.id, e.d FROM reach w JOIN edges e ON w.r = e.s),
       |comp AS (SELECT id, LEAST(id, MIN(r)) AS component
       |  FROM reach GROUP BY id)
       |SELECT doc.doc_id,
       |  COALESCE(c.component, doc.doc_id) AS component,
       |  COUNT(*) OVER (PARTITION BY COALESCE(c.component, doc.doc_id))
       |    AS cluster_size,
       |  doc.doc_id = COALESCE(c.component, doc.doc_id) AS is_canonical
       |FROM documents doc LEFT JOIN comp c ON doc.doc_id = c.id
       |ORDER BY doc.doc_id NULLS FIRST""".stripMargin

  /** CTE chain ending in `v(doc_id, lang_ok, quality_ok, rep_ok,
    * decon_ok, dedup_ok)` — the per-stage curation verdicts shared by
    * q145 (verdict table), q146 (funnel counts), q154 (the pipeline) and
    * q157 (incremental re-curation: full recompute over the CURRENT
    * snapshot). Composes the MinHash pair CTEs + recursive closure (q65)
    * with the q29/q28/q143/q142 stage logic, renamed to avoid CTE
    * collisions. `corpus` is the training snapshot; `evalSrc` is where
    * the benchmark registry (doc_id ≡ 0 mod 25, original text) lives —
    * the full documents table in every current caller. */
  private def curationCtesOver(corpus: String, evalSrc: String): String =
    s"""${minhashPairsCtesFrom(corpus)},
       |edges AS (SELECT ida AS s, idb AS d FROM pairs
       |  UNION SELECT idb, ida FROM pairs),
       |reach(id, r) AS (
       |  SELECT s, d FROM edges
       |  UNION
       |  SELECT w.id, e.d FROM reach w JOIN edges e ON w.r = e.s),
       |comp AS (SELECT id, LEAST(id, MIN(r)) AS component
       |  FROM reach GROUP BY id),
       |qual AS (SELECT doc_id, len(w) AS n_tokens,
       |    CAST(len(list_distinct(w)) AS DOUBLE) / len(w) AS ttr
       |  FROM (SELECT doc_id, string_split(text, ' ') AS w FROM $corpus)),
       |rd AS (SELECT doc_id, string_split(text, ' ') AS w FROM $corpus),
       |rtg AS (SELECT doc_id, array_to_string(w[i:i+2], ' ') AS g
       |  FROM rd, UNNEST(range(1, len(w) - 1)) AS u(i) WHERE len(w) >= 3),
       |rtri AS (SELECT doc_id, count(*) AS tri_total,
       |  count(DISTINCT g) AS tri_distinct FROM rtg GROUP BY doc_id),
       |rbg AS (SELECT doc_id, array_to_string(w[i:i+1], ' ') AS g
       |  FROM rd, UNNEST(range(1, len(w))) AS u(i) WHERE len(w) >= 2),
       |rbic AS (SELECT doc_id, g, count(*) AS cnt FROM rbg GROUP BY doc_id, g),
       |rbi AS (SELECT doc_id, CAST(SUM(cnt) AS BIGINT) AS bi_total,
       |  CAST(MAX(cnt) AS BIGINT) AS top_bi_cnt FROM rbic GROUP BY doc_id),
       |rep AS (SELECT rd.doc_id,
       |    CASE WHEN COALESCE(rtri.tri_total, 0) > 0 THEN ${val6(
          "CAST(rtri.tri_total - rtri.tri_distinct AS DOUBLE) / rtri.tri_total")}
       |      ELSE 0.0 END AS dup_tri_frac,
       |    CASE WHEN COALESCE(rbi.bi_total, 0) > 0 THEN ${val6(
          "CAST(rbi.top_bi_cnt AS DOUBLE) / rbi.bi_total")}
       |      ELSE 0.0 END AS top_bi_frac
       |  FROM rd LEFT JOIN rtri ON rd.doc_id = rtri.doc_id
       |  LEFT JOIN rbi ON rd.doc_id = rbi.doc_id),
       |ed AS (SELECT doc_id, string_split(text, ' ') AS w FROM $evalSrc
       |  WHERE doc_id % 25 = 0),
       |deg AS (SELECT DISTINCT array_to_string(w[i:i+3], ' ') AS gram
       |  FROM ed, UNNEST(range(1, len(w) - 2)) AS u(i)
       |  WHERE len(w) >= 4),
       |dtg AS (SELECT DISTINCT doc_id, array_to_string(w[i:i+3], ' ') AS gram
       |  FROM rd, UNNEST(range(1, len(w) - 2)) AS u(i)
       |  WHERE doc_id % 25 <> 0 AND len(w) >= 4),
       |dh AS (SELECT doc_id, count(*) AS contaminated_grams
       |  FROM dtg JOIN deg USING (gram) GROUP BY doc_id),
       |v AS (SELECT doc.doc_id,
       |    doc.lang = 'en' AS lang_ok,
       |    q.ttr >= 0.35 AND q.n_tokens >= 20 AS quality_ok,
       |    rep.dup_tri_frac <= 0.2 AND rep.top_bi_frac <= 0.2 AS rep_ok,
       |    COALESCE(dh.contaminated_grams, 0) = 0 AS decon_ok,
       |    doc.doc_id = COALESCE(c.component, doc.doc_id) AS dedup_ok
       |  FROM $corpus doc
       |  JOIN qual q ON doc.doc_id = q.doc_id
       |  JOIN rep ON doc.doc_id = rep.doc_id
       |  LEFT JOIN dh ON doc.doc_id = dh.doc_id
       |  LEFT JOIN comp c ON doc.doc_id = c.id
       |  WHERE doc.doc_id % 25 <> 0)""".stripMargin

  private val curationCtes: String = curationCtesOver("documents", "documents")

  /** Shared by q77 (batch session_window) and q106 (streaming session
    * windows, append mode): identical session semantics, one oracle. */
  private val sessionWindowOracle: String =
    s"""WITH e AS (SELECT user_id, ts, value FROM events),
       |g AS (SELECT user_id, ts, value,
       |    CASE WHEN epoch_us(ts) - epoch_us(lag(ts) OVER (
       |        PARTITION BY user_id ORDER BY ts ASC)) >= 1800000000
       |      OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts ASC) IS NULL
       |      THEN 1 ELSE 0 END AS new_session
       |  FROM e),
       |s AS (SELECT user_id, ts, value,
       |    SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts ASC
       |      ROWS UNBOUNDED PRECEDING) AS session_id
       |  FROM g)
       |SELECT user_id, min(ts) AS session_start,
       |  max(ts) + INTERVAL 30 MINUTE AS session_end,
       |  COUNT(*) AS n_events,
       |  ${sum2("value")} AS session_value
       |FROM s GROUP BY user_id, session_id
       |ORDER BY user_id NULLS FIRST, session_start NULLS FIRST""".stripMargin

  /** DuckDB replay of VectorOps.kmeansQuantize: same init (first K
    * vectors), same strict-argmin tiebreak, and the same floor-scaled
    * INTEGER dimension sums — which is what makes an iterative float
    * algorithm bit-reproducible across engines. */
  /** DuckDB mirror of [[graft.operators.VectorOps]]'s Lloyd trainer:
    * the L2 assignment + integer-sum update CTE builders, shared by the
    * q76 trainer oracle and the q155 trained-index oracle (both replay
    * the SAME two rounds from the first-K init). */
  private def kmDistExpr(dim: Int)(e: String, c: String) =
    s"""list_reduce(list_transform(range(1, ${dim + 1}),
       |      i -> (CAST($e[i] AS DOUBLE) - $c[i])
       |         * (CAST($e[i] AS DOUBLE) - $c[i])), (x, y) -> x + y)""".stripMargin
  private def kmAssignCte(dim: Int)(src: String, cents: String, out: String) =
    s"""$out AS (
       |  SELECT vec_id, cid, embedding, d FROM (
       |    SELECT vec_id, cid, embedding, d, row_number() OVER (
       |        PARTITION BY vec_id ORDER BY d ASC, cid ASC) AS rn
       |    FROM (SELECT e.vec_id, c.cid, e.embedding,
       |        ${kmDistExpr(dim)("e.embedding", "c.c")} AS d
       |      FROM $src e CROSS JOIN $cents c))
       |  WHERE rn = 1)""".stripMargin
  private def kmUpdateCte(src: String, out: String) =
    s"""$out AS (
       |  SELECT cid, list(m ORDER BY pos) AS c FROM (
       |    SELECT cid, pos,
       |      CAST(SUM(CAST(FLOOR(CAST(x AS DOUBLE) * 1000000.0 + 0.5)
       |        AS BIGINT)) AS DOUBLE) / 1000000.0 / COUNT(*) AS m
       |    FROM (SELECT cid, generate_subscripts(embedding, 1) AS pos,
       |        unnest(embedding) AS x FROM $src)
       |    GROUP BY 1, 2)
       |  GROUP BY cid)""".stripMargin

  /** Two Lloyd rounds from the first-`k`-vectors init of `src`
    * (default: the full embeddings table; q163 trains on the prev
    * snapshot); CTE names are prefixed so two trainers can coexist in
    * one WITH list. The final centroid table is `<prefix>c2(cid, c)`. */
  private def kmTrainCtes(k: Int, dim: Int, p: String,
      src: String = "embeddings"): String =
    s"""${p}c0 AS (SELECT vec_id AS cid,
       |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS c
       |  FROM $src WHERE vec_id < $k),
       |${kmAssignCte(dim)(src, s"${p}c0", s"${p}a0")},
       |${kmUpdateCte(s"${p}a0", s"${p}c1")},
       |${kmAssignCte(dim)(src, s"${p}c1", s"${p}a1")},
       |${kmUpdateCte(s"${p}a1", s"${p}c2")}""".stripMargin

  private val kmeansSql: String =
    s"""WITH ${kmTrainCtes(8, 64, "")},
       |${kmAssignCte(64)("embeddings", "c2", "a2")}
       |SELECT vec_id, cid, ${val6("d")} AS dist2,
       |  COUNT(*) OVER (PARTITION BY cid) AS cluster_size
       |FROM a2 ORDER BY vec_id NULLS FIRST""".stripMargin

  /** q219: coreset selection — the q76 trainer + assignment, ranked
    * per cluster on the micro-floor-scaled integer distance (the only
    * cross-engine-total key) with vec_id tie-break. */
  private val coresetSql: String =
    s"""WITH ${kmTrainCtes(8, 64, "")},
       |${kmAssignCte(64)("embeddings", "c2", "a2")},
       |r AS (SELECT cid, vec_id,
       |    CAST(FLOOR(d * 1000000.0 + 0.5) AS BIGINT) AS d6
       |  FROM a2),
       |rk AS (SELECT cid, vec_id, d6, ROW_NUMBER() OVER (
       |    PARTITION BY cid ORDER BY d6 ASC, vec_id ASC) AS rn
       |  FROM r)
       |SELECT cid, CAST(rn AS INT) AS "rank", vec_id,
       |  CAST(d6 AS DOUBLE) / 1000000.0 AS dist2
       |FROM rk WHERE rn <= 5
       |ORDER BY cid NULLS FIRST, rn NULLS FIRST""".stripMargin

  /** q175: per-subspace Lloyd training (the q76 CTEs over sliced
    * virtual sources), code assignment, and the ADC sum of nano-scaled
    * distance-table lookups — the full PQ pipeline replayed
    * relationally. */
  /** The PQ CTE chain shared by q175 and q177: per-subspace slices,
    * per-subspace Lloyd training (`s<i>c2` codebooks), code assignment
    * (`s<i>a2`), and the queries' nano-scaled distance tables
    * (`dt<i>`), plus the per-candidate ADC sum keyed (query_id,
    * neighbor_id) as `adc`. */
  private val pqCtes: String = {
    val m = 4; val sub = 16; val kSub = 4
    val subCtes = (0 until m).map(s =>
      s"sub$s AS (SELECT vec_id, list_slice(embedding, ${s * sub + 1}, " +
        s"${(s + 1) * sub}) AS embedding FROM embeddings)").mkString(",\n")
    val trains = (0 until m)
      .map(s => kmTrainCtes(kSub, sub, s"s$s", s"sub$s")).mkString(",\n")
    val assigns = (0 until m)
      .map(s => kmAssignCte(sub)(s"sub$s", s"s${s}c2", s"s${s}a2"))
      .mkString(",\n")
    val dts = (0 until m).map(s =>
      s"""dt$s AS (SELECT q.vec_id AS query_id, c.cid,
         |  CAST(FLOOR((${kmDistExpr(sub)("q.embedding", "c.c")})
         |    * 1000000000.0 + 0.5) AS BIGINT) AS d9
         |  FROM sub$s q CROSS JOIN s${s}c2 c
         |  WHERE q.vec_id < 10)""".stripMargin).mkString(",\n")
    s"""$subCtes,
       |$trains,
       |$assigns,
       |$dts,
       |adc AS (
       |  SELECT d0.query_id, a0.vec_id AS neighbor_id,
       |    d0.d9 + d1.d9 + d2.d9 + d3.d9 AS adist9
       |  FROM s0a2 a0
       |  JOIN s1a2 a1 USING (vec_id)
       |  JOIN s2a2 a2 USING (vec_id)
       |  JOIN s3a2 a3 USING (vec_id)
       |  JOIN dt0 d0 ON d0.cid = a0.cid
       |  JOIN dt1 d1 ON d1.cid = a1.cid AND d1.query_id = d0.query_id
       |  JOIN dt2 d2 ON d2.cid = a2.cid AND d2.query_id = d0.query_id
       |  JOIN dt3 d3 ON d3.cid = a3.cid AND d3.query_id = d0.query_id
       |  WHERE a0.vec_id <> d0.query_id)""".stripMargin
  }

  private val pqSql: String =
    s"""WITH $pqCtes,
       |r AS (SELECT query_id, neighbor_id, adist9,
       |    ROW_NUMBER() OVER (PARTITION BY query_id
       |      ORDER BY adist9 ASC, neighbor_id NULLS FIRST) AS rn FROM adc)
       |SELECT query_id, rn AS "rank", neighbor_id,
       |  CAST(adist9 AS DOUBLE) / 1000000000.0 AS adist
       |FROM r WHERE rn <= 5
       |ORDER BY query_id NULLS FIRST, rn NULLS FIRST""".stripMargin

  /** q177 — IVFADC: the q50 coarse quantizer restricts candidates to
    * the query's probed buckets; the PQ ADC sum (same CTEs as q175)
    * re-scores only those. */
  private val ivfadcSql: String =
    s"""WITH $pqCtes,
       |e2 AS (SELECT vec_id, embedding FROM embeddings),
       |cc AS (SELECT vec_id AS cid, embedding AS cv FROM e2
       |  WHERE vec_id < 16),
       |ac2 AS (
       |  SELECT e.vec_id, c.cid,
       |    ${cosCols("e.embedding", "c.cv")} AS ccos
       |  FROM e2 e CROSS JOIN cc c),
       |assign2 AS (
       |  SELECT vec_id, cid FROM (
       |    SELECT vec_id, cid, ROW_NUMBER() OVER (PARTITION BY vec_id
       |      ORDER BY ccos DESC NULLS LAST, cid NULLS FIRST) AS rn
       |    FROM ac2) WHERE rn = 1),
       |qc2 AS (
       |  SELECT query_id, cid FROM (
       |    SELECT vec_id AS query_id, cid,
       |      ROW_NUMBER() OVER (PARTITION BY vec_id
       |        ORDER BY ccos DESC NULLS LAST, cid NULLS FIRST) AS rn
       |    FROM ac2 WHERE vec_id < 10) WHERE rn <= 4),
       |cand AS (
       |  SELECT q.query_id, a.vec_id AS neighbor_id
       |  FROM qc2 q JOIN assign2 a USING (cid)
       |  WHERE a.vec_id <> q.query_id),
       |scored AS (
       |  SELECT c.query_id, c.neighbor_id, adc.adist9
       |  FROM cand c JOIN adc
       |    ON adc.query_id = c.query_id AND adc.neighbor_id = c.neighbor_id),
       |r AS (SELECT query_id, neighbor_id, adist9,
       |    ROW_NUMBER() OVER (PARTITION BY query_id
       |      ORDER BY adist9 ASC, neighbor_id NULLS FIRST) AS rn
       |  FROM scored)
       |SELECT query_id, rn AS "rank", neighbor_id,
       |  CAST(adist9 AS DOUBLE) / 1000000000.0 AS adist
       |FROM r WHERE rn <= 5
       |ORDER BY query_id NULLS FIRST, rn NULLS FIRST""".stripMargin

  /** DuckDB mirror of VectorOps.dot/norm/cosine: left folds match
    * Spark's `aggregate` order (and the typed kernel's independent
    * accumulators), so the doubles are bit-identical. `a`/`b` are any
    * list-typed SQL expressions. */
  /** Full rebuild over the POST-EPOCH corpus (prev ∖ tombstones ∪
    * appends) with the frozen prev centroids (first-16 of the prev
    * snapshot — frozen even where deleted) — the shared oracle for the
    * staged one-shot epoch (q233) and the streaming maintainer's
    * drained replay of the same epoch (q235). */
  /** The post-epoch assignment replay shared by q233/q235/q237's
    * oracles: frozen prev centroids, post-epoch corpus `e`, multi-probe
    * (top-4) assignment `assign`. */
  private def ivfPostEpochCtes: String =
    s"""c AS (SELECT vec_id AS cid, embedding AS cv
       |  FROM embeddings WHERE vec_id < 16 AND vec_id % 6 <> 0),
       |e AS (SELECT vec_id, embedding FROM embeddings
       |  WHERE vec_id % 6 = 0 OR vec_id % 7 <> 3),
       |ac AS (
       |  SELECT e.vec_id, e.embedding, c.cid,
       |    ${cosCols("e.embedding", "c.cv")} AS ccos
       |  FROM e CROSS JOIN c),
       |assign AS (
       |  SELECT vec_id, embedding, cid FROM (
       |    SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id
       |      ORDER BY ccos DESC NULLS LAST, cid NULLS FIRST) AS rn
       |    FROM ac) WHERE rn <= 4)""".stripMargin

  private def ivfPostEpochOracle: String =
    s"""WITH RECURSIVE $ivfPostEpochCtes,
       |p AS (
       |  SELECT a.vec_id AS ida, b.vec_id AS idb,
       |    ${cosCols("a.embedding", "b.embedding")} AS cos
       |  FROM assign a JOIN assign b
       |    ON a.cid = b.cid AND a.vec_id < b.vec_id),
       |pairs AS (SELECT DISTINCT ida, idb FROM p WHERE cos >= 0.4),
       |edges AS (SELECT ida AS s, idb AS d FROM pairs
       |  UNION SELECT idb, ida FROM pairs),
       |reach(id, r) AS (
       |  SELECT s, d FROM edges
       |  UNION
       |  SELECT w.id, e2.d FROM reach w JOIN edges e2 ON w.r = e2.s),
       |comp AS (SELECT id, LEAST(id, MIN(r)) AS component
       |  FROM reach GROUP BY id)
       |SELECT v.vec_id,
       |  COALESCE(c2.component, v.vec_id) AS component,
       |  COUNT(*) OVER (PARTITION BY COALESCE(c2.component, v.vec_id))
       |    AS cluster_size,
       |  v.vec_id = COALESCE(c2.component, v.vec_id) AS is_canonical,
       |  CASE WHEN v.vec_id % 6 = 0 THEN 'appended' ELSE 'retained' END
       |    AS status
       |FROM e v LEFT JOIN comp c2 ON v.vec_id = c2.id
       |ORDER BY v.vec_id NULLS FIRST""".stripMargin

  /** ANN from the post-epoch index state — the shared oracle for the
    * full-state-scan serve (q237) and the published bucket-pruned
    * serve (q286): multi-probe probe-and-rank recomputed over the
    * post-epoch corpus from scratch. The two queries differ only in
    * the Spark-side index representation; the result set must not
    * move. */
  private def ivfServeFromStateOracle: String =
    s"""WITH $ivfPostEpochCtes,
       |q AS (SELECT vec_id AS query_id, embedding AS qv FROM e
       |      WHERE vec_id < 10),
       |qc AS (
       |  SELECT query_id, qv, cid FROM (
       |    SELECT q.query_id, q.qv, c.cid,
       |      ROW_NUMBER() OVER (PARTITION BY q.query_id
       |        ORDER BY ${cosCols("q.qv", "c.cv")} DESC NULLS LAST,
       |                 c.cid NULLS FIRST) AS rn
       |    FROM q CROSS JOIN c) WHERE rn <= 4),
       |cand AS (
       |  SELECT DISTINCT query_id, a.vec_id AS neighbor_id,
       |    ${cosCols("qc.qv", "a.embedding")} AS cos
       |  FROM qc JOIN assign a USING (cid)
       |  WHERE a.vec_id <> qc.query_id),
       |r AS (
       |  SELECT query_id, neighbor_id, cos,
       |    ROW_NUMBER() OVER (PARTITION BY query_id
       |      ORDER BY cos DESC NULLS LAST, neighbor_id NULLS FIRST) AS rn
       |  FROM cand)
       |SELECT query_id, rn AS "rank", neighbor_id, ${val6("cos")} AS cos_sim
       |FROM r WHERE rn <= 5
       |ORDER BY query_id NULLS FIRST, rn NULLS FIRST""".stripMargin

  private def cosCols(a: String, b: String) =
    s"""list_reduce(list_transform(range(1, len($a) + 1),
       |      i -> CAST($a[i] AS DOUBLE) * CAST($b[i] AS DOUBLE)),
       |      (x, y) -> x + y)
       |  / (sqrt(list_reduce(list_transform($a,
       |       v -> CAST(v AS DOUBLE) * CAST(v AS DOUBLE)), (x, y) -> x + y))
       |   * sqrt(list_reduce(list_transform($b,
       |       v -> CAST(v AS DOUBLE) * CAST(v AS DOUBLE)), (x, y) -> x + y)))"""
      .stripMargin

  private def cosExpr(a: String, b: String) =
    cosCols(s"$a.embedding", s"$b.embedding")

  /** DuckDB mirror of [[graft.operators.Scd2.ordersHistory]]: the WITH
    * body (shared by q23 and the q43 as-of lookup) … */
  private val scd2Ctes: String =
    """base AS (
      |  SELECT o_orderkey AS order_id, o_orderstatus AS order_status,
      |    o_totalprice AS total_price, o_orderpriority AS priority
      |  FROM orders),
      |dim0 AS (
      |  SELECT *, CAST(ROW_NUMBER() OVER (ORDER BY order_id NULLS FIRST) AS BIGINT)
      |    AS order_sk
      |  FROM base WHERE order_id % 10 < 8),
      |staging AS (
      |  SELECT order_id,
      |    CASE WHEN order_id % 5 = 0 THEN 'D' ELSE order_status END
      |      AS order_status,
      |    total_price, priority
      |  FROM base),
      |changed AS (
      |  SELECT s.* FROM staging s JOIN dim0 d USING (order_id)
      |  WHERE s.order_status <> d.order_status
      |     OR s.total_price <> d.total_price OR s.priority <> d.priority),
      |fresh AS (
      |  SELECT s.* FROM staging s
      |  WHERE NOT EXISTS (SELECT 1 FROM dim0 d WHERE d.order_id = s.order_id)),
      |inserts AS (
      |  SELECT i.*, (SELECT COUNT(*) FROM dim0)
      |      + ROW_NUMBER() OVER (ORDER BY order_id NULLS FIRST) AS order_sk
      |  FROM (SELECT * FROM changed UNION ALL SELECT * FROM fresh) i)""".stripMargin

  /** … and the full-history union select (no ORDER BY). */
  private val scd2HistSelect: String =
    """SELECT order_id, order_status, total_price, priority, order_sk,
      |  TIMESTAMP '2024-01-01 00:00:00' AS valid_from,
      |  TIMESTAMP '2024-06-01 00:00:00' AS valid_to, FALSE AS is_current
      |FROM dim0 WHERE EXISTS (SELECT 1 FROM changed c
      |                        WHERE c.order_id = dim0.order_id)
      |UNION ALL
      |SELECT order_id, order_status, total_price, priority, order_sk,
      |  TIMESTAMP '2024-01-01 00:00:00',
      |  TIMESTAMP '2261-12-31 23:59:59', TRUE
      |FROM dim0 WHERE NOT EXISTS (SELECT 1 FROM changed c
      |                            WHERE c.order_id = dim0.order_id)
      |UNION ALL
      |SELECT order_id, order_status, total_price, priority, order_sk,
      |  TIMESTAMP '2024-06-01 00:00:00',
      |  TIMESTAMP '2261-12-31 23:59:59', TRUE
      |FROM inserts""".stripMargin

  private val funnelSql =
    """WITH stages(stage, stage_rank) AS
      |  (VALUES ('signup', 1), ('view', 2), ('click', 3), ('purchase', 4)),
      |counts AS (SELECT event_type, COUNT(*) AS n FROM events GROUP BY 1)
      |SELECT stage, stage_rank, COALESCE(n, 0) AS n_events
      |FROM stages LEFT JOIN counts ON stage = event_type
      |ORDER BY stage_rank NULLS FIRST""".stripMargin

  private val lastEventSql =
    """SELECT user_id, last_ts, last_event FROM (
      |  SELECT user_id, ts AS last_ts, event_type AS last_event,
      |    ROW_NUMBER() OVER (PARTITION BY user_id
      |      ORDER BY ts DESC NULLS LAST, event_id DESC NULLS LAST) AS rn
      |  FROM events) WHERE rn = 1
      |ORDER BY user_id NULLS FIRST""".stripMargin

  def oracleSql: Map[String, String] = Map(
    "q01_pricing_summary" ->
      s"""SELECT l_returnflag, l_linestatus,
         |  ${sum2("l_quantity")} AS sum_qty,
         |  ${sum2("l_extendedprice")} AS sum_base_price,
         |  ${sum4(netExpr)} AS sum_disc_price,
         |  ${sum4(s"$netExpr * (1.0 + l_tax)")} AS sum_charge,
         |  ${avg2("l_quantity")} AS avg_qty,
         |  COUNT(*) AS count_order
         |FROM lineitem
         |GROUP BY l_returnflag, l_linestatus
         |ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin,

    "q02_filter_topk" ->
      """SELECT o_orderkey, o_custkey, o_totalprice,
        |  substr(o_orderpriority, 1, 1) AS priority_class
        |FROM orders
        |WHERE o_orderstatus = 'F' AND o_totalprice > 150000.0
        |ORDER BY o_totalprice DESC NULLS LAST, o_orderkey ASC NULLS FIRST
        |LIMIT 25""".stripMargin,

    "q03_revenue_by_nation" ->
      s"""SELECT n_name, ${sum4(netExpr)} AS revenue, COUNT(*) AS n_items
         |FROM lineitem
         |JOIN orders ON l_orderkey = o_orderkey
         |JOIN customer ON o_custkey = c_custkey
         |JOIN nation ON c_nationkey = n_nationkey
         |GROUP BY n_name
         |ORDER BY n_name NULLS FIRST""".stripMargin,

    "q04_brand_performance" ->
      s"""SELECT p_brand, ${sum4(netExpr)} AS revenue,
         |  ${sum2("l_quantity")} AS total_qty,
         |  COUNT(DISTINCT l_orderkey) AS n_orders
         |FROM lineitem JOIN part ON l_partkey = p_partkey
         |GROUP BY p_brand
         |ORDER BY p_brand NULLS FIRST""".stripMargin,

    "q05_top_customers" ->
      s"""SELECT c_custkey, c_name, revenue, n_orders
         |FROM (
         |  SELECT o_custkey, ${sum2("o_totalprice")} AS revenue,
         |    COUNT(*) AS n_orders
         |  FROM orders GROUP BY o_custkey
         |) JOIN customer ON o_custkey = c_custkey
         |ORDER BY revenue DESC NULLS LAST, c_custkey ASC NULLS FIRST
         |LIMIT 10""".stripMargin,

    "q06_distinct_users" ->
      """SELECT event_type, COUNT(DISTINCT user_id) AS n_users,
        |  COUNT(*) AS n_events
        |FROM events GROUP BY event_type ORDER BY event_type NULLS FIRST""".stripMargin,

    "q07_late_shipments" ->
      """SELECT o_orderpriority,
        |  CAST(SUM(CASE WHEN l_shipdate > o_orderdate + INTERVAL 30 DAY
        |      THEN 1 ELSE 0 END) AS BIGINT) AS late_items,
        |  COUNT(*) AS total_items
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY o_orderpriority
        |ORDER BY o_orderpriority NULLS FIRST""".stripMargin,

    "q08_monthly_revenue" ->
      s"""SELECT strftime(o_orderdate, '%Y-%m') AS month,
         |  ${sum2("o_totalprice")} AS revenue,
         |  COUNT(*) AS n_orders
         |FROM orders GROUP BY 1 ORDER BY 1 NULLS FIRST""".stripMargin,

    "q09_funnel" -> funnelSql,

    "q10_last_event_per_user" -> lastEventSql,

    "q11_first_item_per_order" ->
      """SELECT l_orderkey, l_linenumber, l_extendedprice, l_quantity FROM (
        |  SELECT *, ROW_NUMBER() OVER (PARTITION BY l_orderkey
        |    ORDER BY l_extendedprice ASC NULLS FIRST, l_linenumber ASC NULLS FIRST) AS rn
        |  FROM lineitem) WHERE rn = 1
        |ORDER BY l_orderkey NULLS FIRST""".stripMargin,

    "q12_dedup_exact" ->
      """SELECT MIN(doc_id) AS keep_id, COUNT(*) AS n_copies
        |FROM documents GROUP BY text ORDER BY keep_id NULLS FIRST""".stripMargin,

    "q13_union_tagged" ->
      """SELECT 'customer' AS source_table, c_name AS name, c_acctbal AS acctbal
        |FROM customer
        |UNION ALL
        |SELECT 'supplier', s_name, s_acctbal FROM supplier
        |ORDER BY source_table NULLS FIRST, name NULLS FIRST""".stripMargin,

    "q14_mode_brand" ->
      """SELECT p_brand, COUNT(*) AS n FROM part
        |GROUP BY p_brand ORDER BY n DESC NULLS LAST, p_brand ASC NULLS FIRST LIMIT 1""".stripMargin,

    "q15_quantiles" ->
      """SELECT l_returnflag,
        |  median(l_quantity) AS median_qty,
        |  quantile_cont(l_quantity, 0.9) AS p90_qty,
        |  COUNT(*) AS n
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag NULLS FIRST""".stripMargin,

    "q16_event_gaps" ->
      """WITH g AS (
        |  SELECT user_id,
        |    epoch_us(ts) - lag(epoch_us(ts)) OVER (
        |      PARTITION BY user_id ORDER BY ts NULLS FIRST, event_id NULLS FIRST) AS gap_us
        |  FROM events)
        |SELECT user_id, COUNT(*) AS n_gaps,
        |  CAST(SUM(gap_us) AS DOUBLE) / COUNT(*) / 1000000.0 AS avg_gap_s,
        |  CAST(MAX(gap_us) AS DOUBLE) / 1000000.0 AS max_gap_s
        |FROM g WHERE gap_us IS NOT NULL
        |GROUP BY user_id ORDER BY user_id NULLS FIRST""".stripMargin,

    "q17_sessionize" ->
      s"""WITH flagged AS (
         |  SELECT user_id, ts, event_id, value,
         |    CASE WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER w > 1800000000
         |         THEN 1 ELSE 0 END AS new_session
         |  FROM events
         |  WINDOW w AS (PARTITION BY user_id ORDER BY ts NULLS FIRST, event_id NULLS FIRST)),
         |sess AS (
         |  SELECT *, CAST(SUM(new_session) OVER (PARTITION BY user_id
         |    ORDER BY ts NULLS FIRST, event_id NULLS FIRST ROWS UNBOUNDED PRECEDING) AS BIGINT)
         |    AS session_id
         |  FROM flagged)
         |SELECT user_id, session_id, COUNT(*) AS n_events,
         |  MIN(ts) AS session_start,
         |  CAST(epoch_us(MAX(ts)) - epoch_us(MIN(ts)) AS DOUBLE) / 1000000.0
         |    AS duration_s,
         |  ${sum2("value")} AS session_value
         |FROM sess GROUP BY user_id, session_id
         |ORDER BY user_id NULLS FIRST, session_id NULLS FIRST""".stripMargin,

    "q18_conversion_rates" ->
      s"""WITH stages(stage, stage_rank) AS
         |  (VALUES ('signup', 1), ('view', 2), ('click', 3), ('purchase', 4)),
         |counts AS (SELECT event_type, COUNT(*) AS n FROM events GROUP BY 1),
         |f AS (
         |  SELECT stage, stage_rank, COALESCE(n, 0) AS n_events
         |  FROM stages LEFT JOIN counts ON stage = event_type)
         |SELECT stage, stage_rank, n_events,
         |  CASE WHEN lag(n_events) OVER (ORDER BY stage_rank NULLS FIRST) > 0
         |    THEN ${val4("CAST(n_events AS DOUBLE) / lag(n_events) OVER (ORDER BY stage_rank NULLS FIRST) * 100.0")}
         |  END AS conversion_pct
         |FROM f ORDER BY stage_rank NULLS FIRST""".stripMargin,

    "q19_anti_join" ->
      """SELECT c_custkey, c_name, c_mktsegment FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders
        |  WHERE o_custkey = c_custkey
        |    AND o_orderdate < TIMESTAMP '1996-01-01 00:00:00')
        |ORDER BY c_custkey NULLS FIRST""".stripMargin,

    "q20_dq_metrics" ->
      """SELECT COUNT(*) AS total_rows,
        |  COUNT(*) - COUNT(DISTINCT
        |    CAST(l_orderkey AS VARCHAR) || '|' || CAST(l_linenumber AS VARCHAR))
        |    AS dup_keys,
        |  CAST(SUM(CASE WHEN l_quantity IS NULL THEN 1 ELSE 0 END) AS BIGINT)
        |    AS null_qty,
        |  CAST(SUM(CASE WHEN l_shipdate IS NULL THEN 1 ELSE 0 END) AS BIGINT)
        |    AS null_shipdate
        |FROM lineitem""".stripMargin,

    "q21_customer_sk" ->
      """SELECT c_custkey,
        |  ROW_NUMBER() OVER (ORDER BY c_custkey NULLS FIRST) + 1000 AS customer_sk,
        |  c_mktsegment
        |FROM customer ORDER BY c_custkey NULLS FIRST""".stripMargin,

    "q22_rollup_revenue" ->
      s"""SELECT c_mktsegment, o_orderstatus,
         |  ${sum2("o_totalprice")} AS revenue,
         |  COUNT(*) AS n_orders
         |FROM orders JOIN customer ON o_custkey = c_custkey
         |GROUP BY ROLLUP(c_mktsegment, o_orderstatus)
         |ORDER BY c_mktsegment NULLS FIRST, o_orderstatus NULLS FIRST""".stripMargin,

    "q23_scd2_merge" ->
      s"""WITH $scd2Ctes
         |$scd2HistSelect
         |ORDER BY order_id NULLS FIRST, valid_from NULLS FIRST""".stripMargin,

    "q24_gold_fact" ->
      s"""SELECT l_orderkey AS order_id, l_linenumber AS line_number,
         |  o_custkey AS customer_id, l_partkey AS product_id,
         |  l_suppkey AS seller_id, c_mktsegment AS customer_segment,
         |  p_brand AS product_brand, s_name AS seller_name,
         |  o_orderstatus AS order_status,
         |  CAST(o_orderdate AS DATE) AS order_date,
         |  CAST(strftime(o_orderdate, '%Y%m%d') AS INT) AS date_sk,
         |  CAST(strftime(l_shipdate, '%Y%m%d') AS INT) AS ship_date_sk,
         |  ${val2("l_quantity")} AS quantity,
         |  ${val2("l_extendedprice")} AS gross_amount,
         |  ${val4(netExpr)} AS net_amount,
         |  ${val4(s"$netExpr * (1.0 + l_tax)")} AS charged_amount,
         |  ${val4("l_extendedprice * l_discount")} AS discount_amount
         |FROM lineitem
         |JOIN orders ON l_orderkey = o_orderkey
         |JOIN customer ON o_custkey = c_custkey
         |JOIN part ON l_partkey = p_partkey
         |JOIN supplier ON l_suppkey = s_suppkey
         |ORDER BY order_id NULLS FIRST, line_number NULLS FIRST""".stripMargin,

    "q25_silver_events" ->
      s"""SELECT event_id, user_id, event_type, ts,
         |  CAST(ts AS DATE) AS event_date,
         |  CAST(strftime(ts, '%Y%m%d') AS INT) AS date_sk,
         |  ${val2("value")} AS value_amt,
         |  CAST(json_extract_string(props, '$$.k') AS INT) AS prop_k
         |FROM (
         |  SELECT *, ROW_NUMBER() OVER (PARTITION BY event_id ORDER BY ts NULLS FIRST) AS rn
         |  FROM events) WHERE rn = 1
         |  AND ts IS NOT NULL AND event_type IS NOT NULL
         |ORDER BY event_id NULLS FIRST""".stripMargin,

    "q26_product_performance" ->
      s"""WITH fact AS (
         |  SELECT p_brand AS product_brand, l_orderkey AS order_id,
         |    ${val2("l_quantity")} AS quantity,
         |    ${val4(netExpr)} AS net_amount
         |  FROM lineitem
         |  JOIN orders ON l_orderkey = o_orderkey
         |  JOIN customer ON o_custkey = c_custkey
         |  JOIN part ON l_partkey = p_partkey
         |  JOIN supplier ON l_suppkey = s_suppkey)
         |SELECT product_brand,
         |  ${sum4("net_amount")} AS revenue,
         |  ${sum2("quantity")} AS units,
         |  COUNT(DISTINCT order_id) AS n_orders
         |FROM fact GROUP BY product_brand ORDER BY product_brand NULLS FIRST""".stripMargin,

    "q27_token_stats" ->
      """SELECT lang, COUNT(*) AS n_docs,
        |  CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS total_tokens,
        |  CAST(SUM(n_chars) AS DOUBLE) / COUNT(*) AS avg_chars
        |FROM documents GROUP BY lang ORDER BY lang NULLS FIRST""".stripMargin,

    "q28_quality_score" ->
      """SELECT doc_id, len(w) AS n_tokens,
        |  CAST(len(list_distinct(w)) AS DOUBLE) / len(w) AS type_token_ratio,
        |  CAST(len(list_filter(w, t -> t IN ('the','a','of','and','to')))
        |    AS DOUBLE) / len(w) AS stopword_ratio,
        |  CAST(n_chars AS DOUBLE) / len(w) AS mean_token_len
        |FROM (SELECT doc_id, n_chars, string_split(text, ' ') AS w
        |      FROM documents)
        |ORDER BY doc_id NULLS FIRST""".stripMargin,

    "q29_lang_id" ->
      """SELECT doc_id, lang, score_en, score_es, score_de,
        |  CASE WHEN score_en >= score_es AND score_en >= score_de THEN 'en'
        |       WHEN score_es >= score_de THEN 'es'
        |       ELSE 'de' END AS predicted
        |FROM (
        |  SELECT doc_id, lang,
        |    len(list_filter(w, t -> t IN ('the','a','of','and','to'))) AS score_en,
        |    len(list_filter(w, t -> t IN ('el','la','los','de','y'))) AS score_es,
        |    len(list_filter(w, t -> t IN ('der','die','das','und','zu'))) AS score_de
        |  FROM (SELECT doc_id, lang, string_split(text, ' ') AS w FROM documents))
        |ORDER BY doc_id NULLS FIRST""".stripMargin,

    "q30_fingerprint" ->
      """SELECT doc_id,
        |  md5(regexp_replace(lower(text), '\s+', ' ', 'g')) AS fp
        |FROM documents ORDER BY doc_id NULLS FIRST""".stripMargin,

    "q31_simhash" -> simhashSql,

    "q32_minhash_signature" -> minhashSigSql,

    "q33_minhash_near_dups" -> minhashNearDupSql,

    "q34_ngram_jaccard" ->
      s"""WITH d AS (SELECT doc_id, text, string_split(text, ' ') AS ws
         |  FROM documents WHERE doc_id < 200),
         |s AS (SELECT doc_id, list_distinct($shingleExpr) AS shs FROM d)
         |SELECT a.doc_id AS ida, b.doc_id AS idb,
         |  ${val6(jaccardExpr)} AS jaccard
         |FROM s a JOIN s b ON a.doc_id < b.doc_id
         |WHERE $jaccardExpr >= 0.2
         |ORDER BY ida NULLS FIRST, idb NULLS FIRST""".stripMargin,

    "q35_knn_cosine" ->
      s"""WITH e AS (SELECT vec_id, embedding FROM embeddings),
         |p AS (
         |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         |    ${cosExpr("q", "c")} AS cos
         |  FROM e q JOIN e c ON q.vec_id < 10 AND q.vec_id <> c.vec_id),
         |r AS (SELECT query_id, neighbor_id, cos,
         |  ROW_NUMBER() OVER (PARTITION BY query_id
         |    ORDER BY cos DESC NULLS LAST, neighbor_id NULLS FIRST) AS rn FROM p)
         |SELECT query_id, rn AS "rank", neighbor_id, ${val6("cos")} AS cos_sim
         |FROM r WHERE rn <= 5 ORDER BY query_id NULLS FIRST, rn NULLS FIRST""".stripMargin,

    "q36_embedding_pairs" ->
      s"""WITH e AS (SELECT vec_id, embedding FROM embeddings
         |  WHERE vec_id < 500),
         |p AS (
         |  SELECT a.vec_id AS ida, b.vec_id AS idb, ${cosExpr("a", "b")} AS cos
         |  FROM e a JOIN e b ON a.vec_id < b.vec_id)
         |SELECT ida, idb, ${val6("cos")} AS cos_sim
         |FROM p WHERE cos >= 0.4 ORDER BY ida NULLS FIRST, idb NULLS FIRST""".stripMargin,

    "q37_streaming_funnel" -> funnelSql,

    "q38_streaming_last_event" -> lastEventSql,

    "q39_kpis" ->
      s"""SELECT COUNT(*) AS total_orders,
         |  ${sum2("o_totalprice")} AS total_revenue,
         |  ${sum2("o_totalprice")} / COUNT(*) AS avg_order_value,
         |  ${val4("CAST(SUM(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS DOUBLE) * 100.0 / COUNT(*)")} AS open_pct
         |FROM orders""".stripMargin,

    "q40_date_dim" ->
      """SELECT CAST(d AS DATE) AS full_date,
        |  CAST(strftime(d, '%Y%m%d') AS INT) AS date_sk,
        |  year(d) AS year, quarter(d) AS quarter, month(d) AS month,
        |  isodow(d) AS iso_dow
        |FROM (SELECT unnest(generate_series(
        |  DATE '1995-01-01', DATE '2001-12-31', INTERVAL 1 DAY)) AS d)
        |ORDER BY full_date NULLS FIRST""".stripMargin,

    "q41_simhash_pairs" ->
      s"""WITH $simhashCore
         |SELECT a.doc_id AS ida, b.doc_id AS idb,
         |  CAST(bit_count(xor(a.simhash, b.simhash)) AS INT) AS hamming
         |FROM sim a JOIN sim b ON a.doc_id < b.doc_id
         |WHERE bit_count(xor(a.simhash, b.simhash)) <= 3
         |ORDER BY ida NULLS FIRST, idb NULLS FIRST""".stripMargin,

    "q42_streaming_stateful_funnel" ->
      """SELECT user_id,
        |  MAX(CASE event_type WHEN 'signup' THEN 1 WHEN 'view' THEN 2
        |      WHEN 'click' THEN 3 WHEN 'purchase' THEN 4 ELSE 0 END)
        |    AS max_stage,
        |  CAST(SUM(CASE WHEN event_type IN ('signup','view','click','purchase')
        |      THEN 1 ELSE 0 END) AS BIGINT) AS n_funnel_events,
        |  MAX(CASE event_type WHEN 'signup' THEN 1 WHEN 'view' THEN 2
        |      WHEN 'click' THEN 3 WHEN 'purchase' THEN 4 ELSE 0 END) = 4
        |    AS completed
        |FROM events GROUP BY user_id ORDER BY user_id NULLS FIRST""".stripMargin,

    "q43_scd2_asof_lookup" ->
      s"""WITH $scd2Ctes,
         |hist AS (
         |$scd2HistSelect),
         |probes AS (
         |  SELECT o_orderkey AS order_id,
         |    unnest([TIMESTAMP '2024-03-01 00:00:00',
         |            TIMESTAMP '2024-07-01 00:00:00']) AS probe_ts
         |  FROM orders)
         |SELECT p.order_id, p.probe_ts, h.order_status, h.order_sk
         |FROM probes p JOIN hist h ON p.order_id = h.order_id
         |  AND h.valid_from <= p.probe_ts AND p.probe_ts < h.valid_to
         |ORDER BY p.order_id NULLS FIRST, p.probe_ts NULLS FIRST""".stripMargin,

    // 6h tumbling windows, epoch-aligned exactly like Spark's window():
    // floor-divide event-time micros by the window span.
    "q44_streaming_windowed_counts" ->
      s"""SELECT
         |  make_timestamp((epoch_us(ts) // 21600000000) * 21600000000)
         |    AS window_start,
         |  make_timestamp(((epoch_us(ts) // 21600000000) + 1) * 21600000000)
         |    AS window_end,
         |  COUNT(*) AS n_events,
         |  ${sum2("value")} AS window_value
         |FROM events
         |GROUP BY 1, 2
         |ORDER BY 1 NULLS FIRST""".stripMargin,

    // sliding windows: every event belongs to the two 6h windows whose
    // 3h-aligned starts cover it — replayed as a UNION ALL of shifted
    // 3h floors (10800000000 us = 3h, 21600000000 us = 6h)
    "q148_streaming_sliding_window" ->
      s"""WITH w AS (
         |  SELECT make_timestamp((epoch_us(ts) // 10800000000)
         |      * 10800000000) AS window_start, value FROM events
         |  UNION ALL
         |  SELECT make_timestamp(((epoch_us(ts) // 10800000000) - 1)
         |      * 10800000000), value FROM events)
         |SELECT window_start,
         |  make_timestamp(epoch_us(window_start) + 21600000000)
         |    AS window_end,
         |  COUNT(*) AS n_events,
         |  ${sum2("value")} AS window_value
         |FROM w GROUP BY 1, 2
         |ORDER BY 1 NULLS FIRST""".stripMargin,

    "q45_pivot_events" ->
      """SELECT user_id,
        |  CAST(SUM(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS BIGINT) AS n_signup,
        |  CAST(SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS n_view,
        |  CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS n_click,
        |  CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS n_purchase
        |FROM events GROUP BY user_id ORDER BY user_id NULLS FIRST""".stripMargin,

    "q46_cube_revenue" ->
      """SELECT c_mktsegment, o_orderstatus,
        |  CAST(SUM(CAST(FLOOR(o_totalprice * 100.0 + 0.5) AS BIGINT)) AS DOUBLE) / 100.0 AS revenue,
        |  COUNT(*) AS n_orders
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY CUBE(c_mktsegment, o_orderstatus)
        |ORDER BY c_mktsegment NULLS FIRST, o_orderstatus NULLS FIRST""".stripMargin,

    "q47_moving_avg" ->
      """WITH m AS (
        |  SELECT strftime(o_orderdate, '%Y-%m') AS month,
        |    SUM(CAST(FLOOR(o_totalprice * 100.0 + 0.5) AS BIGINT)) AS rev_cents
        |  FROM orders GROUP BY 1)
        |SELECT month,
        |  CAST(rev_cents AS DOUBLE) / 100.0 AS revenue,
        |  CAST(CAST(SUM(rev_cents) OVER w3 AS BIGINT) AS DOUBLE)
        |    / COUNT(*) OVER w3 / 100.0 AS revenue_ma3,
        |  CAST(CAST(SUM(rev_cents) OVER wc AS BIGINT) AS DOUBLE) / 100.0
        |    AS revenue_cum
        |FROM m
        |WINDOW w3 AS (ORDER BY month NULLS FIRST
        |              ROWS BETWEEN 2 PRECEDING AND CURRENT ROW),
        |       wc AS (ORDER BY month NULLS FIRST ROWS UNBOUNDED PRECEDING)
        |ORDER BY month NULLS FIRST""".stripMargin,

    "q48_hash_sample" ->
      s"""SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice
         |FROM orders
         |WHERE ${h32("CAST(o_orderkey AS VARCHAR)")} % 20 = 0
         |ORDER BY o_orderkey NULLS FIRST""".stripMargin,

    // KMV sketch mirror: the k-th smallest distinct portable hash per
    // group reproduces KmvDistinct.estimate exactly (integer math only).
    "q49_kmv_distinct" ->
      s"""WITH h AS (
         |  SELECT DISTINCT event_type,
         |    ${h32("CAST(user_id AS VARCHAR)")} AS hv
         |  FROM events),
         |r AS (
         |  SELECT event_type, hv,
         |    ROW_NUMBER() OVER (PARTITION BY event_type
         |      ORDER BY hv NULLS FIRST) AS rn,
         |    COUNT(*) OVER (PARTITION BY event_type) AS nd
         |  FROM h)
         |SELECT event_type, CAST(nd AS BIGINT) AS exact_users,
         |  CAST(CASE WHEN nd < 64 THEN nd
         |       ELSE (63 * 4294967296) // GREATEST(hv, 1) END AS BIGINT)
         |    AS approx_users
         |FROM r WHERE rn = LEAST(nd, 64)
         |ORDER BY event_type NULLS FIRST""".stripMargin,

    // IVF ANN mirror: same deterministic centroids (vec_id < 16), same
    // nearest-centroid assignment, same top-4 probe list, same in-bucket
    // ranking — reproduces the approximation (recall loss included).
    "q50_ivf_knn" ->
      s"""WITH e AS (SELECT vec_id, embedding FROM embeddings),
         |c AS (SELECT vec_id AS cid, embedding AS cv FROM e WHERE vec_id < 16),
         |ac AS (
         |  SELECT e.vec_id, e.embedding, c.cid,
         |    ${cosCols("e.embedding", "c.cv")} AS ccos
         |  FROM e CROSS JOIN c),
         |assign AS (
         |  SELECT vec_id, embedding, cid FROM (
         |    SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id
         |      ORDER BY ccos DESC NULLS LAST, cid NULLS FIRST) AS rn
         |    FROM ac) WHERE rn = 1),
         |q AS (SELECT vec_id AS query_id, embedding AS qv FROM e
         |      WHERE vec_id < 10),
         |qc AS (
         |  SELECT query_id, qv, cid FROM (
         |    SELECT q.query_id, q.qv, c.cid,
         |      ROW_NUMBER() OVER (PARTITION BY q.query_id
         |        ORDER BY ${cosCols("q.qv", "c.cv")} DESC NULLS LAST,
         |                 c.cid NULLS FIRST) AS rn
         |    FROM q CROSS JOIN c) WHERE rn <= 4),
         |cand AS (
         |  SELECT query_id, a.vec_id AS neighbor_id,
         |    ${cosCols("qc.qv", "a.embedding")} AS cos
         |  FROM qc JOIN assign a USING (cid)
         |  WHERE a.vec_id <> qc.query_id),
         |r AS (
         |  SELECT query_id, neighbor_id, cos,
         |    ROW_NUMBER() OVER (PARTITION BY query_id
         |      ORDER BY cos DESC NULLS LAST, neighbor_id NULLS FIRST) AS rn
         |  FROM cand)
         |SELECT query_id, rn AS "rank", neighbor_id, ${val6("cos")} AS cos_sim
         |FROM r WHERE rn <= 5
         |ORDER BY query_id NULLS FIRST, rn NULLS FIRST""".stripMargin,

    // q170: the kNN JOIN — q50's probe arithmetic with EVERY vector as
    // a query (no driver-side probe list; probes computed per row).
    "q170_knn_join" ->
      s"""WITH e AS (SELECT vec_id, embedding FROM embeddings),
         |c AS (SELECT vec_id AS cid, embedding AS cv FROM e WHERE vec_id < 16),
         |ac AS (
         |  SELECT e.vec_id, e.embedding, c.cid,
         |    ${cosCols("e.embedding", "c.cv")} AS ccos
         |  FROM e CROSS JOIN c),
         |assign AS (
         |  SELECT vec_id, embedding, cid FROM (
         |    SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id
         |      ORDER BY ccos DESC NULLS LAST, cid NULLS FIRST) AS rn
         |    FROM ac) WHERE rn = 1),
         |qc AS (
         |  SELECT query_id, qv, cid FROM (
         |    SELECT vec_id AS query_id, embedding AS qv, cid,
         |      ROW_NUMBER() OVER (PARTITION BY vec_id
         |        ORDER BY ccos DESC NULLS LAST, cid NULLS FIRST) AS rn
         |    FROM ac) WHERE rn <= 2),
         |cand AS (
         |  SELECT query_id, a.vec_id AS neighbor_id,
         |    ${cosCols("qc.qv", "a.embedding")} AS cos
         |  FROM qc JOIN assign a USING (cid)
         |  WHERE a.vec_id <> qc.query_id),
         |r AS (
         |  SELECT query_id, neighbor_id, cos,
         |    ROW_NUMBER() OVER (PARTITION BY query_id
         |      ORDER BY cos DESC NULLS LAST, neighbor_id NULLS FIRST) AS rn
         |  FROM cand)
         |SELECT query_id, rn AS "rank", neighbor_id, ${val6("cos")} AS cos_sim
         |FROM r WHERE rn <= 3
         |ORDER BY query_id NULLS FIRST, rn NULLS FIRST""".stripMargin,

    // q171: MaxSim. Sub-vectors are 16-element slices; the per-sub max
    // is order-independent, and each max floor-scales to BIGINT
    // nano-units before the per-pair SUM, so the score is exact.
    "q171_maxsim" ->
      s"""WITH e AS (SELECT vec_id, embedding FROM embeddings),
         |subs AS (
         |  SELECT vec_id, i,
         |    embedding[(i * 16 + 1):((i + 1) * 16)] AS sv
         |  FROM e, UNNEST(range(0, 4)) AS u(i)),
         |p AS (
         |  SELECT q.vec_id AS query_id, d.vec_id AS neighbor_id, q.i AS qi,
         |    MAX(list_reduce(list_transform(range(1, 17),
         |          t -> CAST(q.sv[t] AS DOUBLE) * CAST(d.sv[t] AS DOUBLE)),
         |          (x, y) -> x + y)
         |      / (sqrt(list_reduce(list_transform(q.sv,
         |           v -> CAST(v AS DOUBLE) * CAST(v AS DOUBLE)), (x, y) -> x + y))
         |       * sqrt(list_reduce(list_transform(d.sv,
         |           v -> CAST(v AS DOUBLE) * CAST(v AS DOUBLE)), (x, y) -> x + y))))
         |      AS mx
         |  FROM subs q JOIN subs d
         |    ON q.vec_id < 8 AND q.vec_id <> d.vec_id
         |  GROUP BY 1, 2, 3),
         |m AS (SELECT query_id, neighbor_id,
         |    SUM(CAST(FLOOR(mx * 1000000000.0 + 0.5) AS BIGINT)) AS maxsim9
         |  FROM p GROUP BY 1, 2),
         |r AS (SELECT query_id, neighbor_id, maxsim9,
         |    ROW_NUMBER() OVER (PARTITION BY query_id
         |      ORDER BY maxsim9 DESC NULLS LAST, neighbor_id NULLS FIRST) AS rn
         |  FROM m)
         |SELECT query_id, rn AS "rank", neighbor_id,
         |  CAST(maxsim9 AS DOUBLE) / 1000000000.0 AS maxsim
         |FROM r WHERE rn <= 5
         |ORDER BY query_id NULLS FIRST, rn NULLS FIRST""".stripMargin,

    // q172: token-budget mixture sampling — hash-ordered per-lang
    // prefix sum against a ⌊2/5⌋ budget; the boundary-crossing doc is
    // kept ("fill the budget").
    "q172_token_budget_sample" ->
      s"""WITH d AS (SELECT doc_id, lang,
         |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
         |    ${h32("CAST(doc_id AS VARCHAR)")} AS h
         |  FROM documents),
         |b AS (SELECT lang, (SUM(n_tokens) * 2) // 5 AS budget
         |  FROM d GROUP BY 1),
         |c AS (SELECT doc_id, lang, n_tokens,
         |    CAST(SUM(n_tokens) OVER (PARTITION BY lang
         |      ORDER BY h, doc_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         |      AS BIGINT) AS cum_tokens
         |  FROM d)
         |SELECT c.doc_id, c.lang, c.n_tokens, c.cum_tokens
         |FROM c JOIN b USING (lang)
         |WHERE c.cum_tokens - c.n_tokens < b.budget
         |ORDER BY c.doc_id NULLS FIRST""".stripMargin,

    // q173: the q33 pair chain + a parity filter on the source id —
    // only pairs straddling the even/odd corpus fence survive.
    "q173_cross_source_overlap" ->
      s"""WITH $minhashPairsCtes,
         |src AS (SELECT doc_id, source,
         |    CAST(substr(source, 4) AS INT) % 2 AS par FROM documents)
         |SELECT p.ida, p.idb, a.source AS source_a, b.source AS source_b,
         |  ${val6("p.jaccard")} AS jaccard
         |FROM pairs p
         |JOIN src a ON p.ida = a.doc_id
         |JOIN src b ON p.idb = b.doc_id
         |WHERE a.par <> b.par
         |ORDER BY p.ida NULLS FIRST, p.idb NULLS FIRST""".stripMargin,

    // q174: the RAG read path — q93's chunking + hash-trick INTEGER
    // embeddings (dim = h%16, sign = parity of h/16) + integer-cosine
    // top-k. The oracle states the sparse (dim, weight) formulation;
    // the Spark kernel's dense 16-long fold sums the same integers.
    "q174_retrieval" ->
      s"""WITH t AS (SELECT doc_id, string_split(text, ' ') AS ws
         |  FROM documents),
         |o AS (SELECT doc_id, ws,
         |  UNNEST(range(0, GREATEST(len(ws), 1), 40)) AS off FROM t),
         |ch AS (SELECT doc_id, CAST(off // 40 AS BIGINT) AS chunk_idx,
         |    list_slice(ws, off + 1, off + 50) AS cw FROM o),
         |ctok AS (SELECT doc_id, chunk_idx, UNNEST(cw) AS tk FROM ch),
         |cdim AS (SELECT doc_id, chunk_idx, ${h32("tk")} % 16 AS dim,
         |    CASE WHEN (${h32("tk")} // 16) % 2 = 0 THEN 1 ELSE -1 END AS sg
         |  FROM ctok),
         |cvec AS (SELECT doc_id, chunk_idx, dim, CAST(SUM(sg) AS BIGINT) AS w
         |  FROM cdim GROUP BY 1, 2, 3),
         |cnorm AS (SELECT doc_id, chunk_idx, SUM(w * w) AS n2
         |  FROM cvec GROUP BY 1, 2),
         |qtok AS (SELECT doc_id AS query_id,
         |    UNNEST(string_split(text, ' ')) AS tk
         |  FROM documents WHERE doc_id % 100 = 0),
         |qdim AS (SELECT query_id, ${h32("tk")} % 16 AS dim,
         |    CASE WHEN (${h32("tk")} // 16) % 2 = 0 THEN 1 ELSE -1 END AS sg
         |  FROM qtok),
         |qvec AS (SELECT query_id, dim, CAST(SUM(sg) AS BIGINT) AS w
         |  FROM qdim GROUP BY 1, 2),
         |qnorm AS (SELECT query_id, SUM(w * w) AS n2 FROM qvec GROUP BY 1),
         |dots AS (SELECT q.query_id, c.doc_id, c.chunk_idx,
         |    SUM(q.w * c.w) AS dot
         |  FROM qvec q JOIN cvec c ON q.dim = c.dim GROUP BY 1, 2, 3),
         |p AS (SELECT qn.query_id, cn.doc_id, cn.chunk_idx,
         |    CAST(COALESCE(d.dot, 0) AS DOUBLE)
         |      / (sqrt(CAST(qn.n2 AS DOUBLE)) * sqrt(CAST(cn.n2 AS DOUBLE)))
         |      AS score
         |  FROM qnorm qn CROSS JOIN cnorm cn
         |  LEFT JOIN dots d ON d.query_id = qn.query_id
         |    AND d.doc_id = cn.doc_id AND d.chunk_idx = cn.chunk_idx
         |  WHERE cn.doc_id <> qn.query_id AND qn.n2 > 0 AND cn.n2 > 0),
         |r AS (SELECT query_id, doc_id, chunk_idx, score,
         |    ROW_NUMBER() OVER (PARTITION BY query_id
         |      ORDER BY score DESC NULLS LAST, doc_id NULLS FIRST,
         |               chunk_idx NULLS FIRST) AS rn
         |  FROM p)
         |SELECT query_id, rn AS "rank", doc_id, chunk_idx,
         |  ${val6("score")} AS score
         |FROM r WHERE rn <= 3
         |ORDER BY query_id NULLS FIRST, rn NULLS FIRST""".stripMargin,

    "q175_pq_knn" -> pqSql,
    "q177_ivfadc" -> ivfadcSql,

    // q178: unigram-LM scoring. Per-token ln p floor-scales to BIGINT
    // nano-units before the per-doc sum; the smoothed model
    // probabilities are exact rationals, one IEEE division each.
    "q178_unigram_lm" ->
      s"""WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS t
         |  FROM documents),
         |vocab AS (SELECT t, COUNT(*) AS c FROM tok GROUP BY 1),
         |tot AS (SELECT (SELECT COUNT(*) FROM tok) AS n,
         |               (SELECT COUNT(*) FROM vocab) AS v),
         |lp AS (SELECT tok.doc_id,
         |    CAST(FLOOR(ln(CAST(c + 1 AS DOUBLE) / CAST(n + v AS DOUBLE))
         |      * 1000000000.0 + 0.5) AS BIGINT) AS lp9
         |  FROM tok JOIN vocab USING (t) CROSS JOIN tot),
         |s AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_tokens,
         |    CAST(SUM(lp9) AS BIGINT) AS slp9 FROM lp GROUP BY 1),
         |f AS (SELECT doc_id, n_tokens,
         |    -(CAST(slp9 AS DOUBLE) / 1000000000.0) / n_tokens AS nll
         |  FROM s)
         |SELECT doc_id, n_tokens, ${val6("nll")} AS nll_nats,
         |  nll <= 8.0 AS keep
         |FROM f ORDER BY doc_id NULLS FIRST""".stripMargin,

    // q179: per-label outlier z-scores. Centroids use q113's µ-integer
    // component sums; per-row d² milli-scales to BIGINT before the
    // moment sums, so mean/variance are exact in any order; the z
    // expression tree is identical on both engines.
    "q179_label_outliers" ->
      s"""WITH le AS (SELECT vec_id, CAST(label AS BIGINT) AS label,
         |    embedding FROM embeddings),
         |comp AS (SELECT label, generate_subscripts(embedding, 1) AS pos,
         |    unnest(embedding) AS x FROM le),
         |cm AS (SELECT label, pos,
         |    CAST(SUM(CAST(FLOOR(CAST(x AS DOUBLE) * 1000000.0 + 0.5)
         |      AS BIGINT)) AS DOUBLE) / 1000000.0 / COUNT(*) AS m
         |  FROM comp GROUP BY 1, 2),
         |cl AS (SELECT label, list(m ORDER BY pos) AS c FROM cm GROUP BY 1),
         |d AS (SELECT e.vec_id, e.label,
         |    ${kmDistExpr(64)("e.embedding", "cl.c")} AS d2
         |  FROM le e JOIN cl USING (label)),
         |d3t AS (SELECT vec_id, label, d2,
         |    CAST(FLOOR(d2 * 1000.0 + 0.5) AS BIGINT) AS d3 FROM d),
         |s AS (SELECT label, COUNT(*) AS n,
         |    SUM(d3) AS s1, SUM(d3 * d3) AS s2 FROM d3t GROUP BY 1),
         |f AS (SELECT t.vec_id, t.label, t.d2, t.d3,
         |    CAST(s1 AS DOUBLE) / 1000.0 / n AS mean,
         |    CAST(s2 AS DOUBLE) / 1000000.0 / n
         |      - (CAST(s1 AS DOUBLE) / 1000.0 / n)
         |        * (CAST(s1 AS DOUBLE) / 1000.0 / n) AS var
         |  FROM d3t t JOIN s USING (label)),
         |zt AS (SELECT vec_id, label, d2,
         |    CASE WHEN var <= 0.0 THEN 0.0
         |         ELSE (CAST(d3 AS DOUBLE) / 1000.0 - mean) / sqrt(var)
         |    END AS z
         |  FROM f)
         |SELECT vec_id, label, ${val6("d2")} AS dist2, ${val6("z")} AS z,
         |  z > 2.0 AS is_outlier
         |FROM zt ORDER BY vec_id NULLS FIRST""".stripMargin,

    // q180: per-source data card. Entropy terms and per-doc TTRs
    // floor-scale to integers before their cross-row sums; the dup rate
    // rides the q33 pair CTEs at source grain.
    "q180_source_data_card" ->
      s"""WITH $minhashPairsCtes,
         |dd AS (SELECT doc_id, source, lang,
         |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
         |    CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT)
         |      AS n_types
         |  FROM documents),
         |dt AS (SELECT *, CAST(FLOOR(CAST(n_types AS DOUBLE) / n_tokens
         |    * 1000000.0 + 0.5) AS BIGINT) AS ttr6 FROM dd),
         |nd AS (SELECT source, COUNT(*) AS nd FROM dd GROUP BY 1),
         |lc AS (SELECT source, lang, COUNT(*) AS c FROM dd GROUP BY 1, 2),
         |ent AS (SELECT lc.source,
         |    SUM(CAST(FLOOR(-((CAST(c AS DOUBLE) / nd)
         |        * ln(CAST(c AS DOUBLE) / nd))
         |      * 1000000000.0 + 0.5) AS BIGINT)) AS se9
         |  FROM lc JOIN nd USING (source) GROUP BY 1),
         |dup AS (SELECT DISTINCT doc_id FROM
         |  (SELECT ida AS doc_id FROM pairs UNION SELECT idb FROM pairs)),
         |dsrc AS (SELECT dd.source, COUNT(*) AS n_dup
         |  FROM dd JOIN dup USING (doc_id) GROUP BY 1),
         |agg AS (SELECT source, COUNT(*) AS n_docs,
         |    CAST(SUM(n_tokens) AS BIGINT) AS n_tokens,
         |    CAST(SUM(ttr6) AS BIGINT) AS sttr6 FROM dt GROUP BY 1)
         |SELECT a.source, a.n_docs, a.n_tokens,
         |  CAST(se9 AS DOUBLE) / 1000000000.0 AS lang_entropy,
         |  CAST(sttr6 AS DOUBLE) / 1000000.0 / a.n_docs AS mean_ttr,
         |  CAST(COALESCE(n_dup, 0) AS DOUBLE) / a.n_docs AS dup_rate
         |FROM agg a JOIN ent ON a.source = ent.source
         |LEFT JOIN dsrc ON a.source = dsrc.source
         |ORDER BY a.source NULLS FIRST""".stripMargin,

    // q181: novelty audit — distinct-shingle document frequencies, the
    // unique fraction per doc.
    "q181_ngram_novelty" ->
      s"""WITH dz AS (SELECT doc_id, text, string_split(text, ' ') AS ws
         |  FROM documents),
         |shl AS (SELECT doc_id, unnest(list_distinct($shingleExpr)) AS g
         |  FROM dz),
         |dfq AS (SELECT g, COUNT(DISTINCT doc_id) AS df FROM shl GROUP BY 1),
         |agg AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_shingles,
         |    CAST(SUM(CASE WHEN df = 1 THEN 1 ELSE 0 END) AS BIGINT)
         |      AS n_unique
         |  FROM shl JOIN dfq USING (g) GROUP BY 1)
         |SELECT doc_id, n_shingles, n_unique,
         |  ${val6("CAST(n_unique AS DOUBLE) / n_shingles")} AS novelty
         |FROM agg ORDER BY doc_id NULLS FIRST""".stripMargin,

    // q182: Okapi BM25 (k1=1.2, b=0.75). Each term's contribution is
    // one ln + IEEE mul/divs stated verbatim on both engines,
    // floor-scaled to BIGINT nano-units before the per-(query,doc)
    // sum; rank ties break on doc_id.
    "q182_bm25" ->
      s"""WITH $bm25Ctes,
         |r AS (SELECT query_id, doc_id, s9,
         |    ROW_NUMBER() OVER (PARTITION BY query_id
         |      ORDER BY s9 DESC, doc_id) AS rank
         |  FROM bs)
         |SELECT query_id, CAST(rank AS INTEGER) AS rank, doc_id,
         |  CAST(s9 AS DOUBLE) / 1000000000.0 AS score
         |FROM r WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin,

    // q188: hard negatives = the dense-most-distant members of the
    // BM25 top-20 pool. Composes the q182 CTEs with q174's
    // hash-embedding arithmetic at doc grain; zero-norm docs drop on
    // both sides; cosine is exact-integer dot/norms with one IEEE
    // division, ties on doc_id.
    "q188_hard_negatives" ->
      s"""WITH $bm25Ctes,
         |bt AS (SELECT query_id, doc_id, s9,
         |    ROW_NUMBER() OVER (PARTITION BY query_id
         |      ORDER BY s9 DESC, doc_id) AS rb
         |  FROM bs),
         |pool AS (SELECT query_id, doc_id, s9 FROM bt WHERE rb <= 20),
         |$docVecCtes,
         |dots AS (SELECT a.doc_id AS query_id, b.doc_id AS doc_id,
         |    SUM(a.w * b.w) AS dot
         |  FROM dvec a JOIN dvec b ON a.dim = b.dim
         |  WHERE a.doc_id % 100 = 0 GROUP BY 1, 2),
         |pc AS (SELECT p.query_id, p.doc_id, p.s9,
         |    CAST(COALESCE(d.dot, 0) AS DOUBLE)
         |      / (sqrt(CAST(qn.n2 AS DOUBLE)) * sqrt(CAST(cn.n2 AS DOUBLE)))
         |      AS cos
         |  FROM pool p
         |  JOIN dnorm qn ON qn.doc_id = p.query_id
         |  JOIN dnorm cn ON cn.doc_id = p.doc_id
         |  LEFT JOIN dots d ON d.query_id = p.query_id
         |    AND d.doc_id = p.doc_id
         |  WHERE qn.n2 > 0 AND cn.n2 > 0),
         |rr AS (SELECT query_id, doc_id, s9, cos,
         |    ROW_NUMBER() OVER (PARTITION BY query_id
         |      ORDER BY cos ASC NULLS LAST, doc_id) AS rank
         |  FROM pc)
         |SELECT query_id, CAST(rank AS INTEGER) AS rank, doc_id,
         |  CAST(s9 AS DOUBLE) / 1000000000.0 AS bm25,
         |  ${val6("cos")} AS cos_sim
         |FROM rr WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin,

    // q183: greedy longest-match subword apply. The oracle replays the
    // Spark segmenter's loop as 8 unrolled argmax-prefix steps over
    // the SAME vocabulary literal (TextOps.WpVocab — one source of
    // truth), at distinct-word grain; integer math end-to-end. At most
    // one piece of a given length matches a fixed position, so
    // "longest first" needs no tie-break beyond the stated one.
    "q183_wordpiece" -> wordpieceSql,

    // q184: temperature mixture (alpha = 0.5). sqrt weights
    // floor-scale to nano BEFORE the cross-language sum; targets are
    // pure 64-bit integer multiply/div; selection ranks on the
    // portable hash with doc_id tie-break.
    "q184_temperature_mixture" ->
      """WITH c AS (SELECT lang, CAST(COUNT(*) AS BIGINT) AS c
        |  FROM documents GROUP BY 1),
        |w AS (SELECT lang, c,
        |    CAST(FLOOR(sqrt(CAST(c AS DOUBLE)) * 1000000000.0 + 0.5)
        |      AS BIGINT) AS w9
        |  FROM c),
        |tot AS (SELECT CAST(SUM(w9) AS BIGINT) AS ww,
        |    (SELECT COUNT(*) // 2 FROM documents) AS b FROM w),
        |t AS (SELECT lang, c, w9, (b * w9) // ww AS n_target
        |  FROM w CROSS JOIN tot),
        |r AS (SELECT doc_id, lang,
        |    CAST('0x' || substr(md5('tmix:' || doc_id), 1, 8) AS BIGINT)
        |      AS hk
        |  FROM documents),
        |rk AS (SELECT doc_id, lang, hk,
        |    ROW_NUMBER() OVER (PARTITION BY lang
        |      ORDER BY hk, doc_id) AS rn
        |  FROM r)
        |SELECT rk.doc_id, rk.lang, t.c, t.n_target,
        |  CAST(rn AS INTEGER) AS rank, rn <= n_target AS keep
        |FROM rk JOIN t USING (lang) ORDER BY doc_id NULLS FIRST""".stripMargin,

    // q189: DSIR selection. Per-term log-ratios between the smoothed
    // target (src0) and raw unigram LMs floor-scale to micro BIGINTs
    // before the per-doc sum; the global rank/cum-tokens here are the
    // plain window form — Spark's two-phase rank must land on the
    // identical ordering (score DESC, doc_id).
    "q189_dsir" ->
      s"""WITH dtok AS (SELECT doc_id, source,
        |    unnest(string_split(text, ' ')) AS t
        |  FROM documents),
        |cr AS (SELECT t, CAST(COUNT(*) AS BIGINT) AS cr
        |  FROM dtok GROUP BY 1),
        |ct AS (SELECT t, CAST(COUNT(*) AS BIGINT) AS ct
        |  FROM dtok WHERE source = 'src0' GROUP BY 1),
        |tot AS (SELECT (SELECT COUNT(*) FROM dtok) AS nr,
        |    (SELECT COUNT(*) FROM dtok WHERE source = 'src0') AS nt,
        |    (SELECT COUNT(*) FROM cr) AS v,
        |    (SELECT COUNT(*) // 10 FROM documents) AS b),
        |lr AS (SELECT cr.t,
        |    CAST(FLOOR(
        |      (ln(CAST(COALESCE(ct.ct, 0) + 1 AS DOUBLE)
        |          / CAST(nt + v AS DOUBLE))
        |       - ln(CAST(cr.cr + 1 AS DOUBLE) / CAST(nr + v AS DOUBLE)))
        |      * 1000000.0 + 0.5) AS BIGINT) AS lr6
        |  FROM cr LEFT JOIN ct USING (t) CROSS JOIN tot),
        |s AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_tokens,
        |    CAST(SUM(lr6) AS BIGINT) AS slw6
        |  FROM dtok JOIN lr USING (t) GROUP BY 1),
        |r AS (SELECT doc_id, n_tokens, slw6,
        |    ROW_NUMBER() OVER (ORDER BY slw6 DESC, doc_id) AS rank,
        |    SUM(n_tokens) OVER (ORDER BY slw6 DESC, doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |      AS cum_tokens
        |  FROM s)
        |SELECT doc_id, n_tokens,
        |  ${val6("CAST(slw6 AS DOUBLE) / 1000000.0")} AS logw,
        |  CAST(rank AS BIGINT) AS rank, CAST(cum_tokens AS BIGINT)
        |    AS cum_tokens,
        |  rank <= (SELECT b FROM tot) AS keep
        |FROM r ORDER BY doc_id NULLS FIRST""".stripMargin,

    // q191: MMR — 3 greedy diversity-aware picks from each query's
    // dense top-10 pool, unrolled as fixed argmax steps. rel/sim are
    // exact-integer cosines; 0.7/0.3 are shared decimal literals;
    // every argmax ties on doc_id.
    "q191_mmr" -> mmrOracle,

    // q218: RAG context assembly — the q191 picks joined with token
    // counts, cumulative in pick order, kept while the running total
    // fits the context-window budget. The q191 oracle nests verbatim
    // as the base subquery, so the two contracts can never drift.
    "q218_rag_context" ->
      s"""WITH base AS ($mmrOracle),
         |tk AS (SELECT doc_id,
         |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
         |  FROM documents),
         |x AS (SELECT base.query_id, base.pick_no, base.doc_id,
         |    tk.n_tokens,
         |    CAST(SUM(tk.n_tokens) OVER (PARTITION BY base.query_id
         |      ORDER BY base.pick_no) AS BIGINT) AS cum_tokens
         |  FROM base JOIN tk USING (doc_id))
         |SELECT query_id, pick_no, doc_id, n_tokens, cum_tokens,
         |  cum_tokens <= 120 AS kept
         |FROM x ORDER BY query_id NULLS FIRST, pick_no NULLS FIRST"""
        .stripMargin,

    // q192: redundancy profile — the q33 candidate pairs swept over
    // three Jaccard thresholds; zero-pair thresholds still emit a row.
    "q192_dedup_profile" ->
      s"""WITH $minhashPairsCtes,
         |thr(threshold) AS (SELECT CAST(x AS DOUBLE)
         |  FROM (VALUES (0.5), (0.7), (0.9)) v(x)),
         |e AS (SELECT t.threshold, c.ida, c.idb
         |  FROM thr t JOIN cpairs c ON c.jacc >= t.threshold),
         |np AS (SELECT threshold, CAST(COUNT(*) AS BIGINT) AS n_pairs
         |  FROM e GROUP BY 1),
         |ids AS (SELECT threshold, ida AS id FROM e
         |  UNION ALL SELECT threshold, idb FROM e),
         |ndup AS (SELECT threshold, CAST(COUNT(*) AS BIGINT) AS n_dup_docs
         |  FROM (SELECT DISTINCT threshold, id FROM ids) GROUP BY 1),
         |nd AS (SELECT COUNT(*) AS n FROM documents)
         |SELECT t.threshold, COALESCE(n_pairs, 0) AS n_pairs,
         |  COALESCE(n_dup_docs, 0) AS n_dup_docs,
         |  CAST(COALESCE(n_dup_docs, 0) AS DOUBLE) / n AS dup_rate
         |FROM thr t LEFT JOIN np USING (threshold)
         |LEFT JOIN ndup USING (threshold) CROSS JOIN nd
         |ORDER BY threshold""".stripMargin,

    // q194: A-ES weighted sampling. u and ln(u)/w are identical
    // expression trees; keys nano-floor-scale before ranking
    // (score DESC, doc_id — Spark's two-phase rank must match).
    "q194_weighted_sample" ->
      s"""WITH d AS (SELECT doc_id,
         |    CAST(len(string_split(text, ' ')) AS BIGINT) AS w
         |  FROM documents),
         |tot AS (SELECT COUNT(*) // 5 AS b FROM documents),
         |k AS (SELECT doc_id, w,
         |    CAST(FLOOR(
         |      ln((CAST('0x' || substr(md5('ws:' || doc_id), 1, 8)
         |            AS BIGINT) + 1) / 4294967296.0)
         |      / CAST(w AS DOUBLE) * 1000000000.0 + 0.5) AS BIGINT) AS s9
         |  FROM d),
         |r AS (SELECT doc_id, w, s9,
         |    ROW_NUMBER() OVER (ORDER BY s9 DESC, doc_id) AS rank,
         |    SUM(w) OVER (ORDER BY s9 DESC, doc_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         |      AS cum_tokens
         |  FROM k)
         |SELECT doc_id, w AS n_tokens,
         |  ${val6("CAST(s9 AS DOUBLE) / 1000000000.0")} AS key,
         |  CAST(rank AS BIGINT) AS rank,
         |  CAST(cum_tokens AS BIGINT) AS cum_tokens,
         |  rank <= (SELECT b FROM tot) AS keep
         |FROM r ORDER BY doc_id NULLS FIRST""".stripMargin,

    // q196: incremental posting stats. Spark answers from the stored
    // prev-snapshot artifact + a delta-only aggregate; the oracle
    // recomputes the full corpus from scratch — hash equality proves
    // the additive merge exact.
    "q196_posting_stats_incremental" ->
      """WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS t
        |  FROM documents),
        |tf0 AS (SELECT doc_id, t, COUNT(*) AS c FROM tok GROUP BY 1, 2)
        |SELECT t, CAST(COUNT(*) AS BIGINT) AS df,
        |  CAST(SUM(c) AS BIGINT) AS tf
        |FROM tf0 GROUP BY t ORDER BY t""".stripMargin,

    // q197: MRR@5 / nDCG@5 of the served index vs the brute ground
    // truth (graded gains 5..1). Discounts are the SAME double
    // literals Spark closes over; per-position terms nano-floor-scale
    // before the per-query sums.
    "q197_retrieval_eval" -> {
      def caseD(rankCol: String) =
        "CASE " + rankCol + " " + VectorOps.NdcgDiscounts.zipWithIndex
          .map { case (d, i) => s"WHEN ${i + 1} THEN $d" }
          .mkString(" ") + " ELSE 0.0 END"
      s"""WITH $ivfServeCtes,
         |$bruteRankCtes,
         |tr AS (SELECT query_id, neighbor_id, CAST(rn AS INTEGER)
         |    AS trank FROM br WHERE rn <= 5),
         |sv AS (SELECT query_id, neighbor_id, CAST(rn AS INTEGER)
         |    AS srank FROM r WHERE rn <= 5),
         |g AS (SELECT sv.query_id, sv.srank,
         |    CASE WHEN tr.trank IS NULL THEN 0 ELSE 6 - tr.trank END
         |      AS gain
         |  FROM sv LEFT JOIN tr ON sv.query_id = tr.query_id
         |    AND sv.neighbor_id = tr.neighbor_id),
         |gc AS (SELECT query_id,
         |    CAST(SUM(CAST(FLOOR(CAST(gain AS DOUBLE)
         |      * (${caseD("srank")}) * 1000000000.0 + 0.5) AS BIGINT))
         |      AS BIGINT) AS dcg9,
         |    MIN(CASE WHEN gain > 0 THEN srank END) AS fr
         |  FROM g GROUP BY 1),
         |ic AS (SELECT query_id,
         |    CAST(SUM(CAST(FLOOR(CAST(6 - trank AS DOUBLE)
         |      * (${caseD("trank")}) * 1000000000.0 + 0.5) AS BIGINT))
         |      AS BIGINT) AS idcg9
         |  FROM tr GROUP BY 1)
         |SELECT gc.query_id,
         |  CASE WHEN fr IS NULL THEN 0.0
         |    ELSE CAST(CAST(FLOOR(1000000000.0 / fr + 0.5) AS BIGINT)
         |      AS DOUBLE) / 1000000000.0 END AS mrr,
         |  CAST(dcg9 AS DOUBLE) / 1000000000.0 AS dcg,
         |  CAST(dcg9 AS DOUBLE) / CAST(idcg9 AS DOUBLE) AS ndcg
         |FROM gc JOIN ic USING (query_id)
         |ORDER BY gc.query_id""".stripMargin
    },

    // q198: media corpus card — q156's decode CTEs aggregated at
    // format grain; integer sums make the means exact.
    "q198_media_card" ->
      s"""WITH $mediaDimsCtes
         |SELECT kind, CAST(COUNT(*) AS BIGINT) AS n_items,
         |  CAST(SUM(n_bytes) AS BIGINT) AS total_bytes,
         |  CAST(SUM(CASE WHEN width = -1 THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_corrupt,
         |  CAST(SUM(CASE WHEN width = -1 THEN 1 ELSE 0 END) AS DOUBLE)
         |    / COUNT(*) AS corrupt_rate,
         |  CAST(SUM(CASE WHEN width = -1 THEN 0
         |    ELSE CAST(width AS BIGINT) END) AS DOUBLE)
         |    / (COUNT(*) - SUM(CASE WHEN width = -1 THEN 1 ELSE 0 END))
         |    AS mean_w,
         |  CAST(SUM(CASE WHEN width = -1 THEN 0
         |    ELSE CAST(height AS BIGINT) END) AS DOUBLE)
         |    / (COUNT(*) - SUM(CASE WHEN width = -1 THEN 1 ELSE 0 END))
         |    AS mean_h,
         |  MAX(width) AS max_w, MAX(height) AS max_h
         |FROM dims GROUP BY kind ORDER BY kind""".stripMargin,

    // q199: join-skew advisor — three per-key distribution reductions;
    // all-integer inputs, single stated divisions.
    "q199_skew_advisor" -> {
      def statsFor(k: String) =
        s"""SELECT '$k' AS join_key,
           |  CAST(SUM(c) AS BIGINT) AS n_rows,
           |  CAST(COUNT(*) AS BIGINT) AS n_keys,
           |  CAST(MAX(c) AS BIGINT) AS max_cnt,
           |  CAST(MAX(c) AS DOUBLE)
           |    / (CAST(SUM(c) AS DOUBLE) / COUNT(*)) AS skew_ratio,
           |  CAST(MAX(c) AS DOUBLE) / SUM(c) AS top1_share
           |FROM (SELECT $k, COUNT(*) AS c FROM lineitem GROUP BY 1)"""
          .stripMargin
      s"""SELECT * FROM (
         |${statsFor("l_orderkey")}
         |UNION ALL
         |${statsFor("l_partkey")}
         |UNION ALL
         |${statsFor("l_suppkey")})
         |ORDER BY join_key""".stripMargin
    },

    // q200: release manifest — the curation verdicts (q145), released
    // token budget, dedup-stage drops, and leakage-safe split sizes
    // (q165's component-hash rule) composed into one release card.
    // Delete-aware since round 7: rel0 is the curation-eligible set,
    // the tombstone feed (doc_id % 7 = 3, the q231/q232 retraction
    // log) splits it into shipped (rel) vs retracted (rm); released
    // volumes and splits are post-delete.
    "q200_release_manifest" ->
      s"""WITH RECURSIVE $curationCtes,
         |rel0 AS (SELECT doc_id FROM v
         |  WHERE lang_ok AND quality_ok AND rep_ok AND decon_ok
         |    AND dedup_ok),
         |rel AS (SELECT doc_id FROM rel0 WHERE doc_id % 7 <> 3),
         |rm AS (SELECT doc_id FROM rel0 WHERE doc_id % 7 = 3),
         |vs AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_scored,
         |    CAST(SUM(CASE WHEN lang_ok AND quality_ok AND rep_ok
         |      AND decon_ok AND NOT dedup_ok THEN 1 ELSE 0 END)
         |      AS BIGINT) AS n_dup_dropped
         |  FROM v),
         |tk AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_released,
         |    CAST(SUM(len(string_split(d.text, ' ')))
         |    AS BIGINT) AS n_tokens_released
         |  FROM documents d JOIN rel USING (doc_id)),
         |rms AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_removed,
         |    CAST(COALESCE(SUM(len(string_split(d.text, ' '))), 0)
         |    AS BIGINT) AS n_tokens_removed
         |  FROM documents d JOIN rm USING (doc_id)),
         |sp AS (SELECT r.doc_id,
         |    CAST(${h32("CAST(COALESCE(c.component, r.doc_id) AS VARCHAR)")}
         |      % 10 AS INT) AS bucket
         |  FROM rel r LEFT JOIN comp c ON r.doc_id = c.id),
         |spc AS (SELECT
         |    CAST(SUM(CASE WHEN bucket <= 7 THEN 1 ELSE 0 END) AS BIGINT)
         |      AS n_train,
         |    CAST(SUM(CASE WHEN bucket = 8 THEN 1 ELSE 0 END) AS BIGINT)
         |      AS n_val,
         |    CAST(SUM(CASE WHEN bucket = 9 THEN 1 ELSE 0 END) AS BIGINT)
         |      AS n_test
         |  FROM sp),
         |nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_ingested
         |  FROM documents)
         |SELECT n_ingested, n_scored, n_released,
         |  CAST(n_released AS DOUBLE) / n_scored AS release_rate,
         |  n_dup_dropped, n_removed, n_tokens_removed,
         |  n_tokens_released, n_train, n_val, n_test
         |FROM nn CROSS JOIN vs CROSS JOIN tk CROSS JOIN rms
         |  CROSS JOIN spc""".stripMargin,

    // q201: EXACT similarity self-join — the oracle is the relational
    // exact form (overlap counts via a shingle equi-join); the Spark
    // side reaches the identical pair set through AllPairs prefix
    // filtering, so a hash match proves the filter admits no false
    // negatives at this threshold.
    "q201_similarity_join" ->
      s"""WITH d AS (SELECT doc_id, text, string_split(text, ' ') AS ws
         |  FROM documents),
         |s AS (SELECT doc_id, list_distinct($shingleExpr) AS shs FROM d),
         |tok AS (SELECT doc_id, UNNEST(shs) AS tok FROM s),
         |sz AS (SELECT doc_id, len(shs) AS m FROM s),
         |ov AS (SELECT a.doc_id AS ida, b.doc_id AS idb,
         |    CAST(COUNT(*) AS DOUBLE) AS c
         |  FROM tok a JOIN tok b ON a.tok = b.tok
         |    AND a.doc_id < b.doc_id
         |  GROUP BY 1, 2),
         |j AS (SELECT ida, idb,
         |    c / (CAST(sa.m + sb.m AS DOUBLE) - c) AS jac
         |  FROM ov JOIN sz sa ON ov.ida = sa.doc_id
         |    JOIN sz sb ON ov.idb = sb.doc_id)
         |SELECT ida, idb, ${val6("jac")} AS jaccard FROM j
         |WHERE jac >= 0.5
         |ORDER BY ida NULLS FIRST, idb NULLS FIRST""".stripMargin,

    // q202: out-of-fold target encoding — fold complements from exact
    // integer-cent sums; the smoothing arithmetic mirrors
    // Features.targetEncodeOof op-for-op.
    "q202_target_encoding" ->
      """WITH base AS (SELECT c_mktsegment AS segment,
        |    CAST(o_orderkey % 5 AS INT) AS fold,
        |    CAST(FLOOR(o_totalprice * 100.0 + 0.5) AS BIGINT) AS cents
        |  FROM orders JOIN customer ON o_custkey = c_custkey),
        |g AS (SELECT segment, fold, CAST(COUNT(*) AS BIGINT) AS n,
        |    SUM(cents) AS s
        |  FROM base GROUP BY 1, 2),
        |st AS (SELECT segment, SUM(n) AS seg_n, SUM(s) AS seg_s
        |  FROM g GROUP BY 1),
        |ft AS (SELECT fold, SUM(n) AS fold_n, SUM(s) AS fold_s
        |  FROM g GROUP BY 1),
        |gt AS (SELECT SUM(n) AS g_n, SUM(s) AS g_s FROM g),
        |x AS (SELECT g.segment, g.fold,
        |    CAST(st.seg_n - g.n AS BIGINT) AS oof_n,
        |    CAST(st.seg_s - g.s AS BIGINT) AS oof_s,
        |    CAST(gt.g_s - ft.fold_s AS DOUBLE) / 100.0
        |      / CAST(gt.g_n - ft.fold_n AS DOUBLE) AS prior
        |  FROM g JOIN st ON g.segment = st.segment
        |    JOIN ft ON g.fold = ft.fold CROSS JOIN gt)
        |SELECT segment, fold, oof_n,
        |  CAST(FLOOR(CAST(oof_s AS DOUBLE) / 100.0 / CAST(oof_n AS DOUBLE)
        |    * 1000000.0 + 0.5) AS BIGINT) / 1000000.0 AS oof_mean,
        |  CAST(FLOOR((CAST(oof_s AS DOUBLE) / 100.0 + 20.0 * prior)
        |    / (CAST(oof_n AS DOUBLE) + 20.0)
        |    * 1000000.0 + 0.5) AS BIGINT) / 1000000.0 AS enc
        |FROM x
        |ORDER BY segment NULLS FIRST, fold NULLS FIRST""".stripMargin,

    // q203: label-noise audit — exact kNN over the sampled queries with
    // the q35 cosine kernel and (cos DESC, neighbor_id) ranking;
    // majority vote breaks ties toward the smallest label.
    "q203_label_noise" ->
      s"""WITH e AS (SELECT vec_id, embedding,
         |    CAST(label AS BIGINT) AS label FROM embeddings),
         |p AS (SELECT q.vec_id AS query_id, q.label AS qlabel,
         |    c.vec_id AS neighbor_id, c.label AS nlabel,
         |    ${cosExpr("q", "c")} AS cos
         |  FROM e q JOIN e c ON q.vec_id % 4 = 0
         |    AND q.vec_id <> c.vec_id),
         |r AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
         |    ORDER BY cos DESC NULLS LAST, neighbor_id NULLS FIRST)
         |    AS rn FROM p),
         |t AS (SELECT * FROM r WHERE rn <= 10),
         |d AS (SELECT query_id, qlabel,
         |    CAST(SUM(CASE WHEN nlabel <> qlabel THEN 1 ELSE 0 END)
         |      AS BIGINT) AS n_disagree
         |  FROM t GROUP BY 1, 2),
         |m AS (SELECT query_id, nlabel AS majority_label FROM (
         |    SELECT query_id, nlabel, ROW_NUMBER() OVER (
         |      PARTITION BY query_id
         |      ORDER BY COUNT(*) DESC, nlabel NULLS FIRST) AS mr
         |    FROM t GROUP BY 1, 2) WHERE mr = 1)
         |SELECT d.query_id, d.qlabel AS label, d.n_disagree,
         |  m.majority_label, d.n_disagree * 2 > 10 AS suspect
         |FROM d JOIN m USING (query_id)
         |ORDER BY query_id NULLS FIRST""".stripMargin,

    // q204: triangle stats — the oracle counts triangles id-ordered
    // (e1(a,b) ⋈ e2(b,c) ⋈ e3(a,c)); Spark's degree-oriented plan must
    // land on the identical triangle set. The ol CTE mirrors the Spark
    // side's MaxBasketWidth=32 cap (slice of the id-sorted part set per
    // order) so a fixture with a >32-part order diverges LOUDLY in
    // neither engine rather than silently in one.
    "q204_triangle_stats" ->
      """WITH ol AS (SELECT ok, pk FROM (
        |    SELECT l_orderkey AS ok, l_partkey AS pk,
        |      ROW_NUMBER() OVER (PARTITION BY l_orderkey
        |        ORDER BY l_partkey) AS rn
        |    FROM (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem))
        |  WHERE rn <= 32),
        |e AS (SELECT DISTINCT a.pk AS u, b.pk AS v
        |  FROM ol a JOIN ol b ON a.ok = b.ok AND a.pk < b.pk),
        |deg AS (SELECT id, CAST(COUNT(*) AS BIGINT) AS deg FROM (
        |    SELECT u AS id FROM e UNION ALL SELECT v FROM e)
        |  GROUP BY 1),
        |t AS (SELECT e1.u AS a, e1.v AS b, e2.v AS c
        |  FROM e e1 JOIN e e2 ON e2.u = e1.v
        |    JOIN e e3 ON e3.u = e1.u AND e3.v = e2.v),
        |pv AS (SELECT id, CAST(COUNT(*) AS BIGINT) AS tri FROM (
        |    SELECT a AS id FROM t UNION ALL SELECT b FROM t
        |    UNION ALL SELECT c FROM t)
        |  GROUP BY 1)
        |SELECT d.id AS part_id, d.deg,
        |  CAST(COALESCE(pv.tri, 0) AS BIGINT) AS n_triangles,
        |  CASE WHEN d.deg >= 2 THEN
        |    CAST(FLOOR(CAST(COALESCE(pv.tri, 0) * 2 AS DOUBLE)
        |      / CAST(d.deg * (d.deg - 1) AS DOUBLE)
        |      * 1000000.0 + 0.5) AS BIGINT) / 1000000.0
        |  ELSE 0.0 END AS local_cc
        |FROM deg d LEFT JOIN pv ON d.id = pv.id
        |ORDER BY n_triangles DESC, part_id NULLS FIRST
        |LIMIT 15""".stripMargin,

    // q205: purged temporal split — boundaries at fixed fractions of
    // the date range, 7-day embargo purge before each boundary.
    "q205_purged_split" ->
      """WITH o AS (SELECT CAST(o_orderdate AS DATE) AS day, o_custkey,
        |    CAST(FLOOR(o_totalprice * 100.0 + 0.5) AS BIGINT) AS cents
        |  FROM orders),
        |bounds AS (SELECT MIN(day) AS d_min, MAX(day) AS d_max FROM o),
        |x AS (SELECT o.*, b.d_min,
        |    b.d_min + CAST(FLOOR(0.70 * (b.d_max - b.d_min)) AS INT)
        |      AS b1,
        |    b.d_min + CAST(FLOOR(0.85 * (b.d_max - b.d_min)) AS INT)
        |      AS b2
        |  FROM o CROSS JOIN bounds b),
        |s AS (SELECT CASE
        |    WHEN day < b1 - 7 THEN '1_train'
        |    WHEN day < b1 THEN '4_purged'
        |    WHEN day < b2 - 7 THEN '2_val'
        |    WHEN day < b2 THEN '4_purged'
        |    ELSE '3_test' END AS split, day, o_custkey, cents
        |  FROM x)
        |SELECT split, CAST(COUNT(*) AS BIGINT) AS n_orders,
        |  CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS n_customers,
        |  CAST(SUM(cents) AS DOUBLE) / 100.0 AS revenue,
        |  MIN(day) AS d_from, MAX(day) AS d_to
        |FROM s GROUP BY 1
        |ORDER BY split NULLS FIRST""".stripMargin,

    // q206: BPE merge training — the oracle replays all greedy rounds
    // as a generated CTE chain: pair counts over the weighted word
    // vocabulary, (cnt DESC, l, r) argmax, positional
    // leftmost-non-overlap rebuild (unambiguous because self-pairs are
    // excluded from candidacy).
    "q206_bpe_train" -> bpeTrainSql,

    // q207: the apply pass — word occurrences join the final segmented
    // vocabulary (v8 of the same CTE chain); per-language integer
    // volume sums and the chars-per-piece ratio.
    "q207_bpe_apply" ->
      s"""WITH $bpeCtes,
         |w AS (SELECT lang, UNNEST(string_split(text, ' ')) AS word
         |  FROM documents),
         |a AS (SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_words,
         |    CAST(SUM(len(w.word)) AS BIGINT) AS n_chars,
         |    CAST(SUM(len(v.syms)) AS BIGINT) AS n_pieces
         |  FROM w JOIN v$bpeIters v ON w.word = v.word
         |  WHERE w.word <> ''
         |  GROUP BY 1)
         |SELECT lang, n_words, n_chars, n_pieces,
         |  ${val6("CAST(n_chars AS DOUBLE) / CAST(n_pieces AS DOUBLE)")}
         |    AS chars_per_piece
         |FROM a ORDER BY lang NULLS FIRST""".stripMargin,

    // q208: k-anonymity card — QI-group sizes from one aggregation,
    // policy stats re-aggregated from the group grain.
    "q208_k_anonymity" ->
      """WITH g AS (SELECT c_nationkey, c_mktsegment,
        |    CAST(FLOOR(c_acctbal / 1000.0) AS BIGINT) AS bal_bucket,
        |    CAST(COUNT(*) AS BIGINT) AS n
        |  FROM customer GROUP BY 1, 2, 3)
        |SELECT CAST(SUM(n) AS BIGINT) AS n_rows,
        |  CAST(COUNT(*) AS BIGINT) AS n_groups,
        |  CAST(MIN(n) AS BIGINT) AS k_anonymity,
        |  CAST(SUM(CASE WHEN n < 5 THEN n ELSE 0 END) AS BIGINT)
        |    AS n_rows_below_k,
        |  CAST(SUM(CASE WHEN n < 5 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_groups_below_k,
        |  CAST(FLOOR(CAST(SUM(CASE WHEN n < 5 THEN n ELSE 0 END)
        |      AS DOUBLE) / CAST(SUM(n) AS DOUBLE)
        |    * 1000000.0 + 0.5) AS BIGINT) / 1000000.0
        |    AS suppression_rate,
        |  CAST(FLOOR(CAST(SUM(n) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)
        |    * 1000000.0 + 0.5) AS BIGINT) / 1000000.0
        |    AS avg_group_size
        |FROM g""".stripMargin,

    // q209: exact containment join — the oracle is the relational
    // exact form (eval-side shingles joined against the full corpus
    // index); Spark reaches the identical pair set through the
    // one-sided prefix + positional filters. q212 drains the same
    // contract from the ingest-side streaming monitor.
    "q209_containment_join" -> containmentOracle,

    "q212_streaming_decontaminate" -> containmentOracle,

    // q213: curriculum staging — q178's difficulty integers, NTILE
    // quartiles over the (difficulty, doc_id) total order; Spark's
    // closed-form stage from the two-phase rank must match NTILE.
    "q213_curriculum" ->
      s"""WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS t
         |  FROM documents),
         |vocab AS (SELECT t, COUNT(*) AS c FROM tok GROUP BY 1),
         |tot AS (SELECT (SELECT COUNT(*) FROM tok) AS n,
         |               (SELECT COUNT(*) FROM vocab) AS v),
         |lp AS (SELECT tok.doc_id,
         |    CAST(FLOOR(ln(CAST(c + 1 AS DOUBLE) / CAST(n + v AS DOUBLE))
         |      * 1000000000.0 + 0.5) AS BIGINT) AS lp9
         |  FROM tok JOIN vocab USING (t) CROSS JOIN tot),
         |s AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_tokens,
         |    CAST(SUM(lp9) AS BIGINT) AS slp9 FROM lp GROUP BY 1),
         |dd AS (SELECT doc_id, n_tokens,
         |    CAST(FLOOR(CAST(0 - slp9 AS DOUBLE) / n_tokens / 1000.0)
         |      AS BIGINT) AS dm
         |  FROM s),
         |r AS (SELECT dd.*, doc.source,
         |    NTILE(4) OVER (ORDER BY dm, dd.doc_id) AS stage
         |  FROM dd JOIN documents doc ON dd.doc_id = doc.doc_id)
         |SELECT CAST(stage AS INT) AS stage, source,
         |  CAST(COUNT(*) AS BIGINT) AS n_docs,
         |  CAST(SUM(n_tokens) AS BIGINT) AS n_tokens,
         |  ${val6("CAST(SUM(dm) AS DOUBLE) / COUNT(*) / 1000000.0")}
         |    AS mean_nll
         |FROM r GROUP BY 1, 2
         |ORDER BY stage NULLS FIRST, source NULLS FIRST""".stripMargin,

    // q215: split distribution shift — add-one KL(split ‖ train) over
    // the corpus vocabulary; per-(token, split) terms nano-floor-scale
    // before the per-split sums. Train vs itself telescopes to 0.
    "q215_split_divergence" ->
      s"""WITH RECURSIVE $minhashPairsCtes,
         |edges AS (SELECT ida AS s, idb AS d FROM pairs
         |  UNION SELECT idb, ida FROM pairs),
         |reach(id, r) AS (
         |  SELECT s, d FROM edges
         |  UNION
         |  SELECT w.id, e.d FROM reach w JOIN edges e ON w.r = e.s),
         |comp AS (SELECT id, LEAST(id, MIN(r)) AS component
         |  FROM reach GROUP BY id),
         |assigned AS (SELECT doc.doc_id,
         |    COALESCE(c.component, doc.doc_id) AS component
         |  FROM documents doc LEFT JOIN comp c ON doc.doc_id = c.id),
         |bkt AS (SELECT doc_id,
         |    CASE WHEN b <= 7 THEN 'train' WHEN b = 8 THEN 'val'
         |         ELSE 'test' END AS split
         |  FROM (SELECT doc_id,
         |      CAST(${h32("CAST(component AS VARCHAR)")} % 10 AS INT)
         |        AS b
         |    FROM assigned)),
         |tk AS (SELECT bkt.split, x.t FROM (
         |    SELECT doc_id, unnest(string_split(text, ' ')) AS t
         |    FROM documents) x JOIN bkt USING (doc_id)),
         |cnt AS (SELECT split, t, CAST(COUNT(*) AS BIGINT) AS c
         |  FROM tk GROUP BY 1, 2),
         |voc AS (SELECT DISTINCT t FROM cnt),
         |vv AS (SELECT CAST(COUNT(*) AS BIGINT) AS v FROM voc),
         |nt AS (SELECT split, CAST(SUM(c) AS BIGINT) AS n
         |  FROM cnt GROUP BY 1),
         |tr AS (SELECT t, c AS ct FROM cnt WHERE split = 'train'),
         |ntr AS (SELECT n AS ntrain FROM nt WHERE split = 'train'),
         |x2 AS (SELECT g.split, g.n, COALESCE(c2.c, 0) AS c0,
         |    COALESCE(tr.ct, 0) AS ct, vv.v, ntr.ntrain
         |  FROM (SELECT voc.t, nt.split, nt.n
         |    FROM voc CROSS JOIN nt) g
         |  LEFT JOIN cnt c2 ON g.split = c2.split AND g.t = c2.t
         |  LEFT JOIN tr ON g.t = tr.t
         |  CROSS JOIN vv CROSS JOIN ntr),
         |t9 AS (SELECT split,
         |    CAST(FLOOR((CAST(c0 + 1 AS DOUBLE) / CAST(n + v AS DOUBLE))
         |      * ln((CAST(c0 + 1 AS DOUBLE) / CAST(n + v AS DOUBLE))
         |        / (CAST(ct + 1 AS DOUBLE)
         |           / CAST(ntrain + v AS DOUBLE)))
         |      * 1000000000.0 + 0.5) AS BIGINT) AS k9
         |  FROM x2),
         |kl AS (SELECT split, CAST(SUM(k9) AS BIGINT) AS sk9
         |  FROM t9 GROUP BY 1),
         |nd AS (SELECT split, CAST(COUNT(*) AS BIGINT) AS n_docs
         |  FROM bkt GROUP BY 1)
         |SELECT nd.split, nd.n_docs, nt.n AS n_tokens,
         |  ${val6("CAST(kl.sk9 AS DOUBLE) / 1000000000.0")}
         |    AS kl_vs_train
         |FROM nd JOIN nt USING (split) JOIN kl USING (split)
         |ORDER BY split NULLS FIRST""".stripMargin,

    // q216: split-integrity audit — the leakage-safety proof as a
    // query: near-dup pairs reduced to a (split, split) matrix whose
    // off-diagonal must be empty under component-hash splitting.
    "q216_split_integrity" ->
      s"""WITH RECURSIVE $minhashPairsCtes,
         |edges AS (SELECT ida AS s, idb AS d FROM pairs
         |  UNION SELECT idb, ida FROM pairs),
         |reach(id, r) AS (
         |  SELECT s, d FROM edges
         |  UNION
         |  SELECT w.id, e.d FROM reach w JOIN edges e ON w.r = e.s),
         |comp AS (SELECT id, LEAST(id, MIN(r)) AS component
         |  FROM reach GROUP BY id),
         |assigned AS (SELECT doc.doc_id,
         |    COALESCE(c.component, doc.doc_id) AS component
         |  FROM documents doc LEFT JOIN comp c ON doc.doc_id = c.id),
         |bkt AS (SELECT doc_id,
         |    CASE WHEN b <= 7 THEN 'train' WHEN b = 8 THEN 'val'
         |         ELSE 'test' END AS split
         |  FROM (SELECT doc_id,
         |      CAST(${h32("CAST(component AS VARCHAR)")} % 10 AS INT)
         |        AS b
         |    FROM assigned)),
         |px AS (SELECT LEAST(ba.split, bb.split) AS split_a,
         |    GREATEST(ba.split, bb.split) AS split_b
         |  FROM pairs JOIN bkt ba ON pairs.ida = ba.doc_id
         |  JOIN bkt bb ON pairs.idb = bb.doc_id)
         |SELECT split_a, split_b, CAST(COUNT(*) AS BIGINT) AS n_pairs
         |FROM px GROUP BY 1, 2
         |ORDER BY split_a NULLS FIRST, split_b NULLS FIRST"""
        .stripMargin,

    // q217: contrastive triplet mining — support-max positive per
    // anchor, first valid hash probe as the deterministic negative.
    // ob mirrors the Spark side's MaxBasketWidth=32 basket cap.
    "q217_triplet_mining" ->
      s"""WITH ob AS (SELECT ok, pk FROM (
         |    SELECT l_orderkey AS ok, l_partkey AS pk,
         |      ROW_NUMBER() OVER (PARTITION BY l_orderkey
         |        ORDER BY l_partkey) AS rn
         |    FROM (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem))
         |  WHERE rn <= 32),
         |co AS (SELECT a.pk AS a, b.pk AS b,
         |    CAST(COUNT(*) AS BIGINT) AS support
         |  FROM ob a JOIN ob b ON a.ok = b.ok AND a.pk <> b.pk
         |  GROUP BY 1, 2 HAVING COUNT(*) >= 2),
         |best AS (SELECT a AS anchor_id, b AS pos_id, support FROM (
         |    SELECT *, ROW_NUMBER() OVER (PARTITION BY a
         |      ORDER BY support DESC, b) AS rn FROM co)
         |  WHERE rn = 1),
         |mm AS (SELECT CAST(COUNT(*) AS BIGINT) AS m FROM part),
         |pr AS (SELECT anchor_id, CAST(j AS INT) AS j,
         |    ${h32("CAST(anchor_id AS VARCHAR) || ':' || " +
             "CAST(j AS VARCHAR)")} % m + 1 AS cand
         |  FROM best CROSS JOIN mm, range(0, 5) t(j)),
         |valid AS (SELECT pr.anchor_id, pr.j, pr.cand
         |  FROM pr LEFT JOIN co
         |    ON co.a = pr.anchor_id AND co.b = pr.cand
         |  WHERE co.a IS NULL AND pr.cand <> pr.anchor_id),
         |pick AS (SELECT anchor_id, MIN(j) AS j FROM valid GROUP BY 1),
         |neg AS (SELECT v.anchor_id, v.cand AS neg_id
         |  FROM valid v JOIN pick USING (anchor_id, j))
         |SELECT b.anchor_id, b.pos_id, b.support, n.neg_id
         |FROM best b JOIN neg n USING (anchor_id)
         |ORDER BY anchor_id NULLS FIRST""".stripMargin,

    // q214: cross-source duplication matrix over the q33 pair graph.
    "q214_cross_source_dups" ->
      s"""WITH $minhashPairsCtes,
         |px AS (SELECT LEAST(da.source, db.source) AS source_a,
         |    GREATEST(da.source, db.source) AS source_b
         |  FROM pairs JOIN documents da ON pairs.ida = da.doc_id
         |  JOIN documents db ON pairs.idb = db.doc_id)
         |SELECT source_a, source_b, CAST(COUNT(*) AS BIGINT) AS n_pairs
         |FROM px GROUP BY 1, 2
         |ORDER BY source_a NULLS FIRST, source_b NULLS FIRST"""
        .stripMargin,

    // q210: dedup-aware sampling weights — rides the q65 closure;
    // per-doc effective mass micro-floor-scales before the source sums.
    "q210_dedup_weights" ->
      s"""WITH RECURSIVE $minhashPairsCtes,
         |edges AS (SELECT ida AS s, idb AS d FROM pairs
         |  UNION SELECT idb, ida FROM pairs),
         |reach(id, r) AS (
         |  SELECT s, d FROM edges
         |  UNION
         |  SELECT w.id, e.d FROM reach w JOIN edges e ON w.r = e.s),
         |comp AS (SELECT id, LEAST(id, MIN(r)) AS component
         |  FROM reach GROUP BY id),
         |cl AS (SELECT doc.doc_id,
         |    COUNT(*) OVER (PARTITION BY
         |      COALESCE(c.component, doc.doc_id)) AS cluster_size
         |  FROM documents doc LEFT JOIN comp c ON doc.doc_id = c.id),
         |dw AS (SELECT doc_id, source,
         |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
         |  FROM documents),
         |xw AS (SELECT dw.source, dw.n_tokens, cl.cluster_size,
         |    CAST(FLOOR(CAST(dw.n_tokens AS DOUBLE) * 1000000.0
         |      / CAST(cl.cluster_size AS DOUBLE)) AS BIGINT) AS eff6
         |  FROM dw JOIN cl ON dw.doc_id = cl.doc_id)
         |SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
         |  CAST(SUM(CASE WHEN cluster_size > 1 THEN 1 ELSE 0 END)
         |    AS BIGINT) AS n_dup_docs,
         |  CAST(SUM(n_tokens) AS BIGINT) AS raw_tokens,
         |  ${val6("CAST(SUM(eff6) AS DOUBLE) / 1000000.0")}
         |    AS effective_tokens,
         |  ${val6("CAST(SUM(n_tokens) AS DOUBLE) / " +
             "(CAST(SUM(eff6) AS DOUBLE) / 1000000.0)")} AS inflation
         |FROM xw GROUP BY 1
         |ORDER BY source NULLS FIRST""".stripMargin,

    // q211: bigram LM — ln once per distinct bigram, nano-floor-scaled
    // before the per-doc integer sums (the q178 discipline).
    "q211_bigram_lm" ->
      s"""WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws
         |  FROM documents),
         |bg AS (SELECT doc_id, p.w1 AS w1, p.w2 AS w2 FROM (
         |    SELECT doc_id, UNNEST(list_transform(range(1, len(ws)),
         |      i -> struct_pack(w1 := ws[i], w2 := ws[i+1]))) AS p
         |    FROM w WHERE len(ws) >= 2)),
         |bc AS (SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS c12
         |  FROM bg GROUP BY 1, 2),
         |cc AS (SELECT w1, CAST(COUNT(*) AS BIGINT) AS c1
         |  FROM bg GROUP BY 1),
         |vv AS (SELECT CAST(COUNT(DISTINCT t) AS BIGINT) AS v FROM (
         |  SELECT UNNEST(string_split(text, ' ')) AS t FROM documents)),
         |lp AS (SELECT w1, w2,
         |    CAST(FLOOR(ln(CAST(c12 + 1 AS DOUBLE)
         |      / CAST(c1 + v AS DOUBLE))
         |      * 1000000000.0 + 0.5) AS BIGINT) AS lp9
         |  FROM bc JOIN cc USING (w1) CROSS JOIN vv),
         |s AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_bigrams,
         |    CAST(SUM(lp9) AS BIGINT) AS slp9
         |  FROM bg JOIN lp USING (w1, w2)
         |  WHERE doc_id < 100 GROUP BY 1),
         |f AS (SELECT doc_id, n_bigrams,
         |    -(CAST(slp9 AS DOUBLE) / 1000000000.0) / n_bigrams
         |      AS nll FROM s)
         |SELECT doc_id, n_bigrams, ${val6("nll")} AS nll_nats,
         |  nll <= 7.0 AS keep
         |FROM f ORDER BY doc_id NULLS FIRST""".stripMargin,

    // q195: embedding drift — q169's PSI arithmetic over q185's
    // projections, label<5 vs label>=5 populations, clamped
    // projection buckets.
    "q195_embedding_drift" ->
      s"""WITH $pcaPowerCtes,
         |bkt AS (SELECT label,
         |    LEAST(GREATEST(CAST(FLOOR(proj * 2.0) AS BIGINT), -8), 7)
         |      AS bucket
         |  FROM p),
         |g AS (SELECT 'embedding' AS event_type, bucket,
         |    CAST(SUM(CASE WHEN label < 5 THEN 1 ELSE 0 END) AS BIGINT)
         |      AS n_a,
         |    CAST(SUM(CASE WHEN label < 5 THEN 0 ELSE 1 END) AS BIGINT)
         |      AS n_b
         |  FROM bkt GROUP BY 2),
         |t AS (SELECT *,
         |    SUM(n_a) OVER (PARTITION BY event_type) AS tot_a,
         |    SUM(n_b) OVER (PARTITION BY event_type) AS tot_b FROM g),
         |c AS (SELECT event_type, bucket, n_a, n_b,
         |    CAST(FLOOR((CAST(n_a + 1 AS DOUBLE) / (tot_a + 10)
         |        - CAST(n_b + 1 AS DOUBLE) / (tot_b + 10))
         |      * ln((CAST(n_a + 1 AS DOUBLE) / (tot_a + 10))
         |          / (CAST(n_b + 1 AS DOUBLE) / (tot_b + 10)))
         |      * 1000000000.0 + 0.5) AS BIGINT) AS c9
         |  FROM t)
         |SELECT event_type, bucket, n_a, n_b,
         |  CAST(c9 AS DOUBLE) / 1000000000.0 AS contrib,
         |  CAST(SUM(c9) OVER (PARTITION BY event_type) AS DOUBLE)
         |    / 1000000000.0 AS psi
         |FROM c
         |ORDER BY event_type NULLS FIRST, bucket NULLS FIRST""".stripMargin,

    // q193: behavioral sequences. Ordered list aggregation with the
    // (ts, event_id) tiebreak; the serialized prefix is the first 30
    // events per user.
    "q193_event_sequences" ->
      """WITH o AS (SELECT user_id, ts, event_id, event_type FROM events),
        |r AS (SELECT user_id, event_type,
        |    ROW_NUMBER() OVER (PARTITION BY user_id
        |      ORDER BY ts, event_id) AS rn
        |  FROM o),
        |p AS (SELECT user_id,
        |    array_to_string(list(event_type ORDER BY rn), ' ') AS seq
        |  FROM r WHERE rn <= 30 GROUP BY 1),
        |c AS (SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_events
        |  FROM o GROUP BY 1)
        |SELECT c.user_id, c.n_events, p.seq
        |FROM c JOIN p USING (user_id)
        |ORDER BY c.user_id""".stripMargin,

    // q190: cluster data card over the trained k-means partition
    // (q76's trainer CTEs verbatim). d2 milli-scales and entropy
    // terms nano-scale before cross-row sums; dominant-label ties
    // break on the lower label.
    "q190_cluster_data_card" ->
      s"""WITH ${kmTrainCtes(8, 64, "")},
         |${kmAssignCte(64)("embeddings", "c2", "a2")},
         |al AS (SELECT a2.vec_id, a2.cid, a2.d,
         |    CAST(e.label AS BIGINT) AS label
         |  FROM a2 JOIN embeddings e USING (vec_id)),
         |n AS (SELECT cid, CAST(COUNT(*) AS BIGINT) AS n_vecs,
         |    CAST(SUM(CAST(FLOOR(d * 1000.0 + 0.5) AS BIGINT)) AS BIGINT)
         |      AS sd3
         |  FROM al GROUP BY 1),
         |lc AS (SELECT cid, label, CAST(COUNT(*) AS BIGINT) AS c
         |  FROM al GROUP BY 1, 2),
         |dom AS (SELECT cid, label AS dominant_label, c AS n_dom FROM (
         |    SELECT *, ROW_NUMBER() OVER (PARTITION BY cid
         |      ORDER BY c DESC, label) AS rn
         |    FROM lc) WHERE rn = 1),
         |ent AS (SELECT lc.cid,
         |    SUM(CAST(FLOOR(-((CAST(c AS DOUBLE) / n_vecs)
         |        * ln(CAST(c AS DOUBLE) / n_vecs))
         |      * 1000000000.0 + 0.5) AS BIGINT)) AS se9
         |  FROM lc JOIN n USING (cid) GROUP BY 1)
         |SELECT n.cid, n.n_vecs, dom.dominant_label,
         |  CAST(dom.n_dom AS DOUBLE) / n.n_vecs AS purity,
         |  CAST(se9 AS DOUBLE) / 1000000000.0 AS label_entropy,
         |  ${val6("CAST(sd3 AS DOUBLE) / 1000.0 / n.n_vecs")} AS mean_d2
         |FROM n JOIN dom USING (cid) JOIN ent ON ent.cid = n.cid
         |ORDER BY n.cid""".stripMargin,

    // q187: continuous top-k leaderboard. The drained streaming keyed
    // agg must equal this batch form bit-for-bit; revenue accumulates
    // as floor-scaled integer cents, ties break on user_id.
    "q187_streaming_topk" ->
      """WITH p AS (SELECT user_id, COUNT(*) AS n_purchases,
        |    CAST(SUM(CAST(FLOOR(value * 100.0 + 0.5) AS BIGINT))
        |      AS BIGINT) AS cents
        |  FROM events WHERE event_type = 'purchase' GROUP BY 1),
        |r AS (SELECT *, ROW_NUMBER() OVER (
        |    ORDER BY cents DESC, user_id) AS rn FROM p)
        |SELECT CAST(rn AS INTEGER) AS rank, user_id, n_purchases,
        |  CAST(cents AS DOUBLE) / 100.0 AS revenue
        |FROM r WHERE rn <= 10 ORDER BY rank""".stripMargin,

    // q185: distributed power iteration (2 steps), projections onto
    // the leading principal direction. Step math replayed verbatim;
    // max-|component| normalization keeps every cross-row reduction
    // integer.
    "q185_pca_power" -> pcaPowerSql,

    // q161 serves the IDENTICAL q50 contract from the persisted
    // single-probe index with literal bucket pruning; storage layout
    // must never change results, so the oracle is q50's verbatim.
    "q161_ivf_knn_indexed" ->
      s"""WITH $ivfServeCtes
         |SELECT query_id, rn AS "rank", neighbor_id, ${val6("cos")} AS cos_sim
         |FROM r WHERE rn <= 5
         |ORDER BY query_id NULLS FIRST, rn NULLS FIRST""".stripMargin,

    // q186: recall@5 audit of the served IVF path against the exact
    // brute-force ranking — composed verbatim from q161's serve CTEs
    // and q35's brute contract; the audit itself is pure id-set
    // arithmetic (no new float surface).
    "q186_ann_recall_audit" ->
      s"""WITH $ivfServeCtes,
         |iv AS (SELECT query_id, neighbor_id FROM r WHERE rn <= 5),
         |$bruteRankCtes,
         |bt AS (SELECT query_id, neighbor_id FROM br WHERE rn <= 5),
         |j AS (SELECT bt.query_id,
         |    CAST(COUNT(iv.neighbor_id) AS BIGINT) AS hits
         |  FROM bt LEFT JOIN iv ON bt.query_id = iv.query_id
         |    AND bt.neighbor_id = iv.neighbor_id
         |  GROUP BY 1)
         |SELECT query_id, hits, CAST(hits AS DOUBLE) / 5.0 AS recall_at_5
         |FROM j ORDER BY query_id NULLS FIRST""".stripMargin,

    // q163 serves from the UNIFIED index: trained on the prev snapshot
    // (vec_id % 6 <> 0), persisted bucketed, delta APPENDED against the
    // frozen trained centroids, multi-probe served with bucket pruning.
    // Prev-assign ∪ delta-assign ≡ full assignment (per-row function of
    // the frozen centroids), so the oracle replays training on the prev
    // corpus + FULL single-probe assignment + top-4 probes + top-5 rank
    // — and never learns the index, the append, or the buckets exist.
    "q163_ivf_unified" ->
      s"""WITH pe AS (SELECT vec_id, embedding FROM embeddings
         |      WHERE vec_id % 6 <> 0),
         |${kmTrainCtes(16, 64, "u", "pe")},
         |e AS (SELECT vec_id, embedding FROM embeddings),
         |ac AS (
         |  SELECT e.vec_id, e.embedding, tc.cid,
         |    ${cosCols("e.embedding", "tc.c")} AS ccos
         |  FROM e CROSS JOIN uc2 tc),
         |assign AS (
         |  SELECT vec_id, embedding, cid FROM (
         |    SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id
         |      ORDER BY ccos DESC NULLS LAST, cid NULLS FIRST) AS rn
         |    FROM ac) WHERE rn = 1),
         |q AS (SELECT vec_id AS query_id, embedding AS qv FROM e
         |      WHERE vec_id < 10),
         |qc AS (
         |  SELECT query_id, qv, cid FROM (
         |    SELECT q.query_id, q.qv, c.cid,
         |      ROW_NUMBER() OVER (PARTITION BY q.query_id
         |        ORDER BY ${cosCols("q.qv", "c.c")} DESC NULLS LAST,
         |                 c.cid NULLS FIRST) AS rn
         |    FROM q CROSS JOIN uc2 c) WHERE rn <= 4),
         |cand AS (
         |  SELECT query_id, a.vec_id AS neighbor_id,
         |    ${cosCols("qc.qv", "a.embedding")} AS cos
         |  FROM qc JOIN assign a USING (cid)
         |  WHERE a.vec_id <> qc.query_id),
         |r AS (
         |  SELECT query_id, neighbor_id, cos,
         |    ROW_NUMBER() OVER (PARTITION BY query_id
         |      ORDER BY cos DESC NULLS LAST, neighbor_id NULLS FIRST) AS rn
         |  FROM cand)
         |SELECT query_id, rn AS "rank", neighbor_id, ${val6("cos")} AS cos_sim
         |FROM r WHERE rn <= 5
         |ORDER BY query_id NULLS FIRST, rn NULLS FIRST""".stripMargin,

    // q164: the Spark side folds the lexicon into one scan-local
    // aggregate lambda (no explode, no join); the oracle states the
    // equivalent token-unnest ⋈ VALUES broadcast-join form — the gate
    // proves the two formulations agree. Lexicon literals come from the
    // ONE Scala definition (TextOps.sentimentLex).
    "q164_sentiment_lexicon" -> {
      val lexVals = graft.operators.TextOps.sentimentLex
        .map { case (t, w) => s"('$t', $w)" }.mkString(", ")
      s"""WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS t
         |      FROM documents),
         |lex(t, w) AS (VALUES $lexVals),
         |sc AS (SELECT tok.doc_id,
         |    CAST(COALESCE(SUM(l.w), 0) AS BIGINT) AS sentiment_raw
         |  FROM tok LEFT JOIN lex l USING (t) GROUP BY tok.doc_id),
         |n AS (SELECT doc_id,
         |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
         |  FROM documents)
         |SELECT n.doc_id, n.n_tokens, sc.sentiment_raw,
         |  ${val6("CAST(sc.sentiment_raw AS DOUBLE) / n.n_tokens")}
         |    AS sentiment,
         |  CASE WHEN sc.sentiment_raw > 0 THEN 'positive'
         |       WHEN sc.sentiment_raw < 0 THEN 'negative'
         |       ELSE 'neutral' END AS label
         |FROM n JOIN sc USING (doc_id)
         |ORDER BY n.doc_id NULLS FIRST""".stripMargin
    },

    // q165: leakage-safe split — the SAME recursive closure as q65,
    // then split = hash(component) % 10 so near-dup cluster members
    // can never straddle a split boundary. The hash mirrors
    // Portable.portable32 exactly (q64's precedent).
    "q165_leakage_safe_split" ->
      s"""WITH RECURSIVE $minhashPairsCtes,
         |edges AS (SELECT ida AS s, idb AS d FROM pairs
         |  UNION SELECT idb, ida FROM pairs),
         |reach(id, r) AS (
         |  SELECT s, d FROM edges
         |  UNION
         |  SELECT w.id, e.d FROM reach w JOIN edges e ON w.r = e.s),
         |comp AS (SELECT id, LEAST(id, MIN(r)) AS component
         |  FROM reach GROUP BY id),
         |assigned AS (
         |  SELECT doc.doc_id, COALESCE(c.component, doc.doc_id) AS component
         |  FROM documents doc LEFT JOIN comp c ON doc.doc_id = c.id),
         |b AS (SELECT doc_id, component,
         |  CAST(${h32("CAST(component AS VARCHAR)")} % 10 AS INT) AS bucket
         |  FROM assigned)
         |SELECT doc_id, component, bucket,
         |  CASE WHEN bucket <= 7 THEN 'train'
         |       WHEN bucket = 8 THEN 'val'
         |       ELSE 'test' END AS split
         |FROM b ORDER BY doc_id NULLS FIRST""".stripMargin,

    // q166: int8 scalar quantization + integer-code serve. The per-vec
    // scale cancels in the cosine ratio, so approx cosine is a pure
    // function of the BIGINT codes — exact in both engines; the float
    // cosine rides along so the gate pins the quantization error.
    "q166_int8_knn" ->
      s"""WITH e AS (SELECT vec_id, embedding FROM embeddings),
         |s AS (SELECT vec_id, embedding,
         |    CASE WHEN m = 0 THEN 1.0 ELSE m END AS scale
         |  FROM (SELECT vec_id, embedding,
         |    list_max(list_transform(embedding,
         |      x -> abs(CAST(x AS DOUBLE)))) AS m FROM e)),
         |c AS (SELECT vec_id, embedding,
         |    list_transform(embedding, x ->
         |      CAST(FLOOR(CAST(x AS DOUBLE) / scale * 127.0 + 0.5)
         |        AS BIGINT)) AS codes
         |  FROM s),
         |n AS (SELECT vec_id, embedding, codes,
         |    list_reduce(list_transform(codes, v -> v * v),
         |      (x, y) -> x + y) AS n8
         |  FROM c),
         |p AS (SELECT q.vec_id AS query_id, t.vec_id AS neighbor_id,
         |    CAST(list_reduce(list_transform(range(1, len(q.codes) + 1),
         |        i -> q.codes[i] * t.codes[i]), (x, y) -> x + y) AS DOUBLE)
         |      / (sqrt(CAST(q.n8 AS DOUBLE)) * sqrt(CAST(t.n8 AS DOUBLE)))
         |      AS cosq,
         |    ${cosCols("q.embedding", "t.embedding")} AS cosf
         |  FROM n q JOIN n t ON q.vec_id < 10 AND q.vec_id <> t.vec_id),
         |r AS (SELECT query_id, neighbor_id, cosq, cosf,
         |  ROW_NUMBER() OVER (PARTITION BY query_id
         |    ORDER BY cosq DESC NULLS LAST, neighbor_id NULLS FIRST) AS rn
         |  FROM p)
         |SELECT query_id, rn AS "rank", neighbor_id,
         |  ${val6("cosq")} AS cos_q8, ${val6("cosf")} AS cos_f32
         |FROM r WHERE rn <= 5
         |ORDER BY query_id NULLS FIRST, rn NULLS FIRST""".stripMargin,

    // q167/q168: the DeltaLog history is a closed-form function of the
    // key (epoch e inserts o_orderkey%8=e, re-prices every third key of
    // e-1, deletes every fifth key of e-2), so the oracle states the
    // expected feed/snapshot directly from `orders` while the Spark
    // side reproduces it through the real log machinery (markers,
    // last-write-wins, delete masking, epoch bounds).
    "q167_change_feed" ->
      """WITH o AS (SELECT o_orderkey AS order_id, o_orderstatus AS status,
        |    CAST(FLOOR(o_totalprice * 100.0 + 0.5) AS BIGINT) AS cents,
        |    o_orderkey % 8 AS m FROM orders),
        |f AS (
        |  SELECT order_id,
        |    CASE WHEN m IN (4, 5) THEN 'insert'
        |         WHEN m = 3 AND order_id % 5 = 0 THEN 'delete'
        |         WHEN m = 3 AND order_id % 3 = 0 THEN 'update'
        |         WHEN m = 2 AND order_id % 5 = 0 THEN 'delete'
        |         END AS change_type,
        |    CASE WHEN m IN (3, 4) AND order_id % 3 = 0 THEN 'R'
        |         ELSE status END AS status2,
        |    CASE WHEN m IN (3, 4) AND order_id % 3 = 0 THEN cents + 100
        |         ELSE cents END AS cents2
        |  FROM o)
        |SELECT order_id, change_type,
        |  CASE WHEN change_type = 'delete' THEN NULL ELSE status2 END AS status,
        |  CASE WHEN change_type = 'delete' THEN NULL
        |       ELSE CAST(cents2 AS DOUBLE) / 100.0 END AS total_price
        |FROM f WHERE change_type IS NOT NULL
        |ORDER BY order_id NULLS FIRST""".stripMargin,

    "q168_time_travel" ->
      """WITH o AS (SELECT o_orderkey AS order_id, o_orderstatus AS status,
        |    CAST(FLOOR(o_totalprice * 100.0 + 0.5) AS BIGINT) AS cents,
        |    o_orderkey % 8 AS m FROM orders),
        |live AS (SELECT order_id,
        |    CASE WHEN m <= 4 AND order_id % 3 = 0 THEN 'R'
        |         ELSE status END AS status,
        |    CASE WHEN m <= 4 AND order_id % 3 = 0 THEN cents + 100
        |         ELSE cents END AS cents
        |  FROM o WHERE m <= 5 AND NOT (m <= 3 AND order_id % 5 = 0))
        |SELECT status, COUNT(*) AS n_orders,
        |  CAST(SUM(cents) AS DOUBLE) / 100.0 AS total_revenue
        |FROM live GROUP BY status ORDER BY status NULLS FIRST""".stripMargin,

    // q169: PSI drift. Per-bucket contributions floor-scale to BIGINT
    // nano-units BEFORE the per-type sum (exact integer reduction); the
    // ln/divide chain is the same IEEE expression tree on both engines.
    "q169_distribution_drift" -> psiDriftSql,

    // q176: the continuous monitor must read the SAME statistic off its
    // incrementally-maintained state — q169's oracle verbatim.
    "q176_streaming_drift" -> psiDriftSql,

    "q51_semi_join" ->
      """SELECT c_custkey, c_name, c_mktsegment FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders
        |  WHERE o_custkey = c_custkey
        |    AND o_orderdate < TIMESTAMP '1996-01-01 00:00:00')
        |ORDER BY c_custkey NULLS FIRST""".stripMargin,

    "q52_except_users" ->
      """SELECT user_id, CAST(ts AS DATE) AS view_date
        |FROM events WHERE event_type = 'view'
        |EXCEPT
        |SELECT user_id, CAST(ts AS DATE)
        |FROM events WHERE event_type = 'purchase'
        |ORDER BY user_id NULLS FIRST, view_date NULLS FIRST""".stripMargin,

    "q53_streaming_enriched" ->
      s"""WITH stages(stage, stage_rank) AS
         |  (VALUES ('signup', 1), ('view', 2), ('click', 3), ('purchase', 4))
         |SELECT stage, stage_rank, COUNT(*) AS n_events,
         |  ${sum2("value")} AS stage_value
         |FROM events JOIN stages ON event_type = stage
         |GROUP BY stage, stage_rank
         |ORDER BY stage_rank NULLS FIRST""".stripMargin,

    "q54_string_funcs" ->
      """SELECT c_custkey,
        |  upper(trim(c_name)) AS name_upper,
        |  substr(c_mktsegment, 1, 3) AS seg_prefix,
        |  regexp_extract(c_name, '([0-9]+)', 1) AS name_num,
        |  c_mktsegment LIKE '%ING%' AS seg_ing
        |FROM customer ORDER BY c_custkey NULLS FIRST""".stripMargin,

    // Streaming SCD2 = the batch history minus surrogate keys (sink-time
    // global assignment by design).
    "q55_streaming_scd2" ->
      s"""WITH $scd2Ctes,
         |hist AS (
         |$scd2HistSelect)
         |SELECT order_id, order_status, total_price, priority,
         |  valid_from, valid_to, is_current
         |FROM hist
         |ORDER BY order_id NULLS FIRST, valid_from NULLS FIRST""".stripMargin,

    "q56_regex_tokens" ->
      """SELECT doc_id,
        |  len(string_split(text, ' ')) AS n_ws_tokens,
        |  len(regexp_extract_all(text, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s]'))
        |    AS n_regex_tokens,
        |  len(regexp_extract_all(text, '[0-9]+')) AS n_numeric,
        |  len(regexp_extract_all(text, '[^a-zA-Z0-9\s]')) AS n_punct
        |FROM documents ORDER BY doc_id NULLS FIRST""".stripMargin,

    "q57_intersect_days" ->
      """SELECT user_id, CAST(ts AS DATE) AS day
        |FROM events WHERE event_type = 'view'
        |INTERSECT
        |SELECT user_id, CAST(ts AS DATE)
        |FROM events WHERE event_type = 'purchase'
        |ORDER BY user_id NULLS FIRST, day NULLS FIRST""".stripMargin,

    // zip-style set-returning functions: generate_subscripts + unnest
    // advance in lockstep, mirroring posexplode's (pos, token) pairs.
    "q58_explode_tokens" ->
      """SELECT doc_id, CAST(generate_subscripts(w, 1) - 1 AS INT) AS pos,
        |  unnest(w) AS token
        |FROM (SELECT doc_id, string_split(text, ' ') AS w
        |      FROM documents WHERE doc_id < 20)
        |ORDER BY doc_id NULLS FIRST, pos NULLS FIRST""".stripMargin,

    // The salted two-phase plan must equal the PLAIN aggregate — that
    // equivalence is the whole point, so the oracle is the plain form.
    "q59_salted_agg" ->
      s"""SELECT o_orderstatus, ${sum2("o_totalprice")} AS revenue,
         |  COUNT(*) AS n_orders
         |FROM orders GROUP BY o_orderstatus
         |ORDER BY o_orderstatus NULLS FIRST""".stripMargin,

    // Dense date axis is GENERATED (generate_series), mirroring Spark's
    // sequence(min,max) explode; actuals left-join onto the grid.
    "q60_gapfill_daily" ->
      s"""WITH o AS (SELECT CAST(o_orderdate AS DATE) AS day,
         |    o_orderpriority AS priority, o_totalprice FROM orders),
         |b AS (SELECT min(day) AS lo, max(day) AS hi FROM o),
         |days AS (SELECT CAST(unnest(generate_series(lo, hi,
         |    INTERVAL 1 DAY)) AS DATE) AS day FROM b),
         |prios AS (SELECT DISTINCT priority FROM o),
         |actual AS (SELECT priority, day,
         |    SUM(CAST(FLOOR(o_totalprice * 100.0 + 0.5) AS BIGINT)) AS cents,
         |    COUNT(*) AS n FROM o GROUP BY 1, 2)
         |SELECT p.priority, d.day,
         |  COALESCE(CAST(cents AS DOUBLE) / 100.0, 0.0) AS revenue,
         |  COALESCE(n, 0) AS n_orders
         |FROM days d CROSS JOIN prios p
         |LEFT JOIN actual a ON a.priority = p.priority AND a.day = d.day
         |ORDER BY p.priority NULLS FIRST, d.day NULLS FIRST""".stripMargin,

    "q61_grouping_sets" ->
      s"""SELECT c_mktsegment, o_orderstatus,
         |  CAST(GROUPING(c_mktsegment) AS INT) AS g_seg,
         |  CAST(GROUPING(o_orderstatus) AS INT) AS g_status,
         |  ${sum2("o_totalprice")} AS revenue,
         |  COUNT(*) AS n_orders
         |FROM orders JOIN customer ON o_custkey = c_custkey
         |GROUP BY GROUPING SETS ((c_mktsegment), (o_orderstatus), ())
         |ORDER BY g_seg ASC, g_status ASC,
         |  c_mktsegment ASC NULLS FIRST, o_orderstatus ASC NULLS FIRST""".stripMargin,

    // percent_rank/cume_dist are single exact rational divisions of rank
    // integers — bit-identical across engines; ntile is BIGINT in DuckDB
    // vs INT in Spark, hence the cast.
    "q62_ntile_ranks" ->
      s"""WITH rev AS (SELECT o_custkey,
         |    SUM(CAST(FLOOR(o_totalprice * 100.0 + 0.5) AS BIGINT)) AS cents
         |  FROM orders GROUP BY 1)
         |SELECT o_custkey, CAST(cents AS DOUBLE) / 100.0 AS revenue,
         |  CAST(ntile(10) OVER w AS INT) AS decile,
         |  percent_rank() OVER w AS pct_rank,
         |  cume_dist() OVER w AS cume
         |FROM rev
         |WINDOW w AS (ORDER BY cents DESC, o_custkey ASC)
         |ORDER BY o_custkey NULLS FIRST""".stripMargin,

    // Rank key is the floor-scaled integer score (micro-units), term as
    // tiebreak — identical to the Spark side, so 1-ulp ln() divergence
    // cannot flip the ordering of mathematically-equal scores.
    "q63_tfidf" ->
      s"""WITH tf AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term
         |  FROM documents),
         |tfc AS (SELECT doc_id, term, COUNT(*) AS tf FROM tf GROUP BY 1, 2),
         |df AS (SELECT term, COUNT(*) AS df FROM tfc GROUP BY 1),
         |n AS (SELECT COUNT(*) AS n_docs FROM documents),
         |scored AS (
         |  SELECT doc_id, term, tf, df,
         |    CAST(FLOOR(tf * ln(CAST(n_docs AS DOUBLE) / df)
         |      * 1000000.0 + 0.5) AS BIGINT) AS tfidf_i
         |  FROM tfc JOIN df USING (term) CROSS JOIN n
         |  WHERE doc_id < 100),
         |r AS (SELECT *, row_number() OVER (
         |    PARTITION BY doc_id ORDER BY tfidf_i DESC, term ASC) AS rank
         |  FROM scored)
         |SELECT doc_id, CAST(rank AS INT) AS rank, term, tf, df,
         |  CAST(tfidf_i AS DOUBLE) / 1000000.0 AS tfidf
         |FROM r WHERE rank <= 5
         |ORDER BY doc_id NULLS FIRST, rank ASC""".stripMargin,

    "q64_stratified_sample" ->
      s"""SELECT doc_id, lang, n_chars FROM documents
         |WHERE ${h32("CAST(doc_id AS VARCHAR)")} % 20 <
         |  CASE WHEN lang = 'en' THEN 1 WHEN lang = 'es' THEN 2
         |       WHEN lang = 'de' THEN 4 ELSE 1 END
         |ORDER BY doc_id NULLS FIRST""".stripMargin,

    // Connected components over the MinHash near-dup graph: the oracle
    // recomputes the closure with a recursive CTE (reach = transitive
    // neighbors; component = min reachable id). Near-dup clusters have
    // tiny diameters, keeping the recursion shallow.
    "q65_dedup_clusters" -> dedupClustersOracle,

    // q104 resolves the SAME closure with large-star/small-star —
    // algorithm swap, identical contract, identical oracle.
    "q104_dedup_star" -> dedupClustersOracle,

    // weeks-since is an exact day-diff / 7 on both sides (both engines
    // truncate weeks to Monday) — months_between/date_diff('month')
    // fractional semantics differ across engines.
    "q66_retention_cohorts" ->
      """WITH e AS (SELECT user_id, CAST(ts AS DATE) AS day FROM events),
        |c AS (SELECT user_id, CAST(date_trunc('week', min(day)) AS DATE)
        |    AS cohort_week FROM e GROUP BY 1),
        |a AS (SELECT DISTINCT user_id, CAST(date_trunc('week', day) AS DATE)
        |    AS w FROM e)
        |SELECT cohort_week,
        |  CAST(date_diff('day', cohort_week, w) / 7 AS INT) AS weeks_since,
        |  COUNT(DISTINCT user_id) AS n_users
        |FROM a JOIN c USING (user_id)
        |GROUP BY 1, 2
        |ORDER BY cohort_week NULLS FIRST, weeks_since NULLS FIRST""".stripMargin,

    "q67_rfm_segments" ->
      """WITH o AS (SELECT o_custkey, CAST(o_orderdate AS DATE) AS day,
        |    o_totalprice FROM orders),
        |g AS (SELECT o_custkey, max(day) AS last_day,
        |    COUNT(*) AS frequency,
        |    SUM(CAST(FLOOR(o_totalprice * 100.0 + 0.5) AS BIGINT)) AS cents
        |  FROM o GROUP BY 1),
        |r AS (SELECT o_custkey,
        |    CAST(date_diff('day', last_day, (SELECT max(day) FROM o)) AS INT)
        |      AS recency_days,
        |    frequency, cents FROM g),
        |s AS (SELECT o_custkey, recency_days, frequency,
        |    CAST(cents AS DOUBLE) / 100.0 AS monetary,
        |    CAST(ntile(4) OVER (ORDER BY recency_days ASC, o_custkey ASC) AS INT)
        |      AS r_score,
        |    CAST(ntile(4) OVER (ORDER BY frequency DESC, o_custkey ASC) AS INT)
        |      AS f_score,
        |    CAST(ntile(4) OVER (ORDER BY cents DESC, o_custkey ASC) AS INT)
        |      AS m_score
        |  FROM r)
        |SELECT *, CAST(r_score AS VARCHAR) || CAST(f_score AS VARCHAR)
        |  || CAST(m_score AS VARCHAR) AS segment
        |FROM s ORDER BY o_custkey NULLS FIRST""".stripMargin,

    "q68_brand_pairs" ->
      """WITH ob AS (SELECT DISTINCT l_orderkey AS okey, p_brand AS brand
        |  FROM lineitem JOIN part ON l_partkey = p_partkey)
        |SELECT a.brand AS brand_a, b.brand AS brand_b, COUNT(*) AS support
        |FROM ob a JOIN ob b ON a.okey = b.okey AND a.brand < b.brand
        |GROUP BY 1, 2 HAVING COUNT(*) >= 8
        |ORDER BY brand_a NULLS FIRST, brand_b NULLS FIRST""".stripMargin,

    // Oracle uses the naive point-in-interval join; Spark's binned
    // equi-join + residual must produce the identical attribution.
    "q69_campaign_attr" ->
      """WITH e AS (SELECT user_id, CAST(ts AS DATE) AS day FROM events),
        |lo AS (SELECT min(day) AS lo FROM e),
        |c AS (SELECT CAST(i AS INT) AS campaign_id,
        |    lo + CAST(i * 7 AS INT) AS start_day,
        |    lo + CAST(i * 7 + 14 AS INT) AS end_day
        |  FROM lo, range(0, 10) t(i))
        |SELECT campaign_id, start_day, end_day, COUNT(*) AS n_events,
        |  COUNT(DISTINCT user_id) AS n_users
        |FROM e JOIN c ON start_day <= day AND day < end_day
        |GROUP BY 1, 2, 3
        |ORDER BY campaign_id NULLS FIRST""".stripMargin,

    // The stream ingests every event TWICE (simulated redelivery);
    // exactly-once dedup must land on the batch distinct counts.
    "q70_streaming_dedup" ->
      """SELECT event_type, COUNT(DISTINCT event_id) AS n_events
        |FROM events GROUP BY 1
        |ORDER BY event_type NULLS FIRST""".stripMargin,

    // The oracle REGENERATES the custom source's rows from range() with
    // the identical md5 arithmetic — the connector's output is
    // hash-verified end-to-end, not just row-counted.
    "q71_eventgen_agg" ->
      s"""WITH g AS (SELECT i AS event_id,
         |    ${h32("CAST(i AS VARCHAR)")} AS h
         |  FROM range(20000, 80000) t(i)),
         |e AS (SELECT event_id,
         |    TIMESTAMP '2024-01-01 00:00:00'
         |      + event_id * INTERVAL 1 SECOND AS ts,
         |    h % 500 AS user_id,
         |    ['view','cart','purchase','refund','support']
         |      [CAST((h // 500) % 5 AS INT) + 1] AS event_type,
         |    CAST(h % 10000 AS DOUBLE) / 100.0 AS value
         |  FROM g)
         |SELECT event_type, COUNT(*) AS n_events,
         |  COUNT(DISTINCT user_id) AS n_users,
         |  ${sum2("value")} AS total_value,
         |  min(ts) AS first_ts
         |FROM e GROUP BY 1
         |ORDER BY event_type NULLS FIRST""".stripMargin,

    // The oracle is DuckDB's NATIVE ASOF JOIN (inclusive >=); the Spark
    // side's union-sort with the probe-flag tiebreak must match it.
    "q72_asof_union" ->
      """WITH v AS (SELECT user_id, ts FROM events WHERE event_type = 'view'),
        |p AS (SELECT user_id, ts FROM events WHERE event_type = 'purchase')
        |SELECT p.user_id, p.ts AS purchase_ts, v.ts AS last_view_ts,
        |  epoch_us(p.ts) - epoch_us(v.ts) AS gap_us
        |FROM p ASOF JOIN v ON p.user_id = v.user_id AND p.ts >= v.ts
        |ORDER BY p.user_id NULLS FIRST, purchase_ts NULLS FIRST""".stripMargin,

    // Incremental refresh must be indistinguishable from full
    // recompute — the oracle is the from-scratch aggregate.
    "q73_incremental_agg" ->
      s"""SELECT c_mktsegment, ${sum2("o_totalprice")} AS revenue,
         |  COUNT(*) AS n_orders
         |FROM orders JOIN customer ON o_custkey = c_custkey
         |GROUP BY 1 ORDER BY c_mktsegment NULLS FIRST""".stripMargin,

    // Stream-drain of the DSv2 micro-batch surface must equal batch
    // generation over the full id range (5 admission-controlled
    // triggers x 10k ids).
    "q74_streaming_eventgen" ->
      s"""WITH g AS (SELECT i AS event_id,
         |    ${h32("CAST(i AS VARCHAR)")} AS h
         |  FROM range(0, 50000) t(i)),
         |e AS (SELECT
         |    ['view','cart','purchase','refund','support']
         |      [CAST((h // 500) % 5 AS INT) + 1] AS event_type,
         |    CAST(h % 10000 AS DOUBLE) / 100.0 AS value
         |  FROM g)
         |SELECT event_type, COUNT(*) AS n_events,
         |  ${sum2("value")} AS total_value
         |FROM e GROUP BY 1
         |ORDER BY event_type NULLS FIRST""".stripMargin,

    // Salted join must equal the PLAIN join — the salt never escapes.
    "q75_salted_join" ->
      s"""WITH w(event_type, weight) AS (VALUES
         |  ('view', CAST(1.0 AS DOUBLE)), ('click', CAST(2.0 AS DOUBLE)),
         |  ('signup', CAST(5.0 AS DOUBLE)), ('purchase', CAST(10.0 AS DOUBLE)),
         |  ('error', CAST(0.5 AS DOUBLE)))
         |SELECT e.event_type, COUNT(*) AS n_events,
         |  ${sum2("value * weight")} AS weighted_value
         |FROM events e JOIN w USING (event_type)
         |GROUP BY 1 ORDER BY event_type NULLS FIRST""".stripMargin,

    "q76_kmeans_vq" -> kmeansSql,

    "q219_coreset" -> coresetSql,

    // q229: cluster-balanced sampling — q184's √-weight exact-quota
    // arithmetic over the q76 trainer's assignment.
    "q229_cluster_balanced" ->
      s"""WITH ${kmTrainCtes(8, 64, "")},
         |${kmAssignCte(64)("embeddings", "c2", "a2")},
         |asg AS (SELECT vec_id, cid FROM a2),
         |cc AS (SELECT cid, CAST(COUNT(*) AS BIGINT) AS c
         |  FROM asg GROUP BY 1),
         |w AS (SELECT cid, c,
         |    CAST(FLOOR(sqrt(CAST(c AS DOUBLE)) * 1000000000.0 + 0.5)
         |      AS BIGINT) AS w9
         |  FROM cc),
         |tot AS (SELECT CAST(SUM(w9) AS BIGINT) AS ww,
         |    (SELECT COUNT(*) // 2 FROM embeddings) AS b FROM w),
         |t AS (SELECT cid, c, (b * w9) // ww AS n_target
         |  FROM w CROSS JOIN tot),
         |r AS (SELECT vec_id, cid,
         |    CAST('0x' || substr(md5('cbal:' || vec_id), 1, 8) AS BIGINT)
         |      AS hk
         |  FROM asg),
         |rk AS (SELECT vec_id, cid, ROW_NUMBER() OVER (
         |    PARTITION BY cid ORDER BY hk, vec_id) AS rn
         |  FROM r)
         |SELECT rk.vec_id, rk.cid, t.c AS cluster_size, t.n_target,
         |  CAST(rn AS INT) AS "rank", rn <= t.n_target AS keep
         |FROM rk JOIN t USING (cid)
         |ORDER BY vec_id NULLS FIRST""".stripMargin,

    // q221: WOE/IV screening — one ln per bin on a ratio of exact
    // integer products, micro-floor-scaled; the IV numerator
    // accumulates as exact longs and divides out once.
    "q221_woe_iv" ->
      s"""WITH f AS (
         |  SELECT 'quantity' AS feature,
         |    CAST(FLOOR((l_quantity - 1) / 10.0) AS BIGINT) AS bin,
         |    l_returnflag = 'R' AS is_bad FROM lineitem
         |  UNION ALL SELECT 'discount',
         |    CAST(FLOOR(l_discount * 50.0) AS BIGINT),
         |    l_returnflag = 'R' FROM lineitem
         |  UNION ALL SELECT 'price',
         |    CAST(LEAST(FLOOR(l_extendedprice / 20000.0), 4.0)
         |      AS BIGINT),
         |    l_returnflag = 'R' FROM lineitem),
         |g AS (SELECT feature, bin,
         |    CAST(SUM(CASE WHEN is_bad THEN 0 ELSE 1 END) AS BIGINT)
         |      AS g,
         |    CAST(SUM(CASE WHEN is_bad THEN 1 ELSE 0 END) AS BIGINT)
         |      AS b
         |  FROM f GROUP BY 1, 2),
         |t AS (SELECT
         |    CAST(SUM(CASE WHEN l_returnflag = 'R' THEN 0 ELSE 1 END)
         |      AS BIGINT) AS gt,
         |    CAST(SUM(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END)
         |      AS BIGINT) AS bt
         |  FROM lineitem),
         |s AS (SELECT feature, bin, g.g, g.b, t.gt, t.bt,
         |    CAST(FLOOR(ln(CAST(g.g * t.bt AS DOUBLE)
         |      / CAST(g.b * t.gt AS DOUBLE))
         |      * 1000000.0 + 0.5) AS BIGINT) AS woe6
         |  FROM g CROSS JOIN t WHERE g.g > 0 AND g.b > 0),
         |i AS (SELECT feature,
         |    CAST(SUM((g * bt - b * gt) * woe6) AS BIGINT) AS ivnum,
         |    MAX(gt) AS gt2, MAX(bt) AS bt2
         |  FROM s GROUP BY 1)
         |SELECT s.feature, s.bin, s.g + s.b AS n, s.b AS n_bad,
         |  ${val6("CAST(woe6 AS DOUBLE) / 1000000.0")} AS woe,
         |  ${val6("CAST(i.ivnum AS DOUBLE) / " +
             "(CAST(i.gt2 AS DOUBLE) * CAST(i.bt2 AS DOUBLE)) " +
             "/ 1000000.0")} AS iv
         |FROM s JOIN i USING (feature)
         |ORDER BY feature NULLS FIRST, bin NULLS FIRST""".stripMargin,

    // q230: CBO join-cardinality audit — textbook estimate vs the
    // counted join; FLOOR(x + 0.5) rounding mirrored.
    "q230_cardinality_audit" -> {
      def one(name: String, a: String, ka: String,
          b: String, kb: String) =
        s"""SELECT '$name' AS join_key,
           |  (SELECT CAST(COUNT(*) AS BIGINT) FROM $a) AS n_left,
           |  (SELECT CAST(COUNT(*) AS BIGINT) FROM $b) AS n_right,
           |  (SELECT CAST(GREATEST(
           |      (SELECT COUNT(DISTINCT $ka) FROM $a),
           |      (SELECT COUNT(DISTINCT $kb) FROM $b)) AS BIGINT))
           |    AS ndv_max,
           |  (SELECT CAST(COUNT(*) AS BIGINT)
           |   FROM $a JOIN $b ON $ka = $kb) AS actual""".stripMargin
      s"""WITH u AS (
         |${one("orders~customer", "orders", "o_custkey",
             "customer", "c_custkey")}
         |UNION ALL
         |${one("lineitem~orders", "lineitem", "l_orderkey",
             "orders", "o_orderkey")}
         |UNION ALL
         |${one("lineitem~part", "lineitem", "l_partkey",
             "part", "p_partkey")}),
         |e AS (SELECT *,
         |    CAST(FLOOR(CAST(n_left * n_right AS DOUBLE)
         |      / CAST(ndv_max AS DOUBLE) + 0.5) AS BIGINT) AS estimate
         |  FROM u)
         |SELECT join_key, n_left, n_right, ndv_max, estimate, actual,
         |  ${val6("CAST(estimate AS DOUBLE) / CAST(actual AS DOUBLE)")}
         |    AS est_over_actual
         |FROM e ORDER BY join_key NULLS FIRST""".stripMargin
    },

    // q231: delete maintenance of the dedup clusters. Spark answers
    // INCREMENTALLY (stored full-corpus artifacts + DeltaLog tombstone
    // feed + affected-cluster-only re-closure); the oracle recomputes
    // the FULL chain over the POST-DELETE corpus against the index's
    // FROZEN centroids (the full corpus's first-16 — frozen even where
    // a centroid vector is itself deleted, the q158 contract). Hash
    // match proves retraction-by-delta ≡ rebuild.
    "q231_embedding_dedup_deletes" ->
      s"""WITH RECURSIVE c AS (SELECT vec_id AS cid, embedding AS cv
         |  FROM embeddings WHERE vec_id < 16),
         |e AS (SELECT vec_id, embedding FROM embeddings
         |  WHERE vec_id % 7 <> 3),
         |ac AS (
         |  SELECT e.vec_id, e.embedding, c.cid,
         |    ${cosCols("e.embedding", "c.cv")} AS ccos
         |  FROM e CROSS JOIN c),
         |assign AS (
         |  SELECT vec_id, embedding, cid FROM (
         |    SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id
         |      ORDER BY ccos DESC NULLS LAST, cid NULLS FIRST) AS rn
         |    FROM ac) WHERE rn <= 4),
         |p AS (
         |  SELECT a.vec_id AS ida, b.vec_id AS idb,
         |    ${cosCols("a.embedding", "b.embedding")} AS cos
         |  FROM assign a JOIN assign b
         |    ON a.cid = b.cid AND a.vec_id < b.vec_id),
         |pairs AS (SELECT DISTINCT ida, idb FROM p WHERE cos >= 0.4),
         |edges AS (SELECT ida AS s, idb AS d FROM pairs
         |  UNION SELECT idb, ida FROM pairs),
         |reach(id, r) AS (
         |  SELECT s, d FROM edges
         |  UNION
         |  SELECT w.id, e2.d FROM reach w JOIN edges e2 ON w.r = e2.s),
         |comp AS (SELECT id, LEAST(id, MIN(r)) AS component
         |  FROM reach GROUP BY id)
         |SELECT v.vec_id,
         |  COALESCE(c2.component, v.vec_id) AS component,
         |  COUNT(*) OVER (PARTITION BY COALESCE(c2.component, v.vec_id))
         |    AS cluster_size,
         |  v.vec_id = COALESCE(c2.component, v.vec_id) AS is_canonical
         |FROM e v LEFT JOIN comp c2 ON v.vec_id = c2.id
         |ORDER BY v.vec_id NULLS FIRST""".stripMargin,

    // q233: one epoch, both CDC verbs — appends (vec_id % 6 = 0)
    // land while prev keys (% 6 <> 0 AND % 7 = 3) retract. Spark
    // composes the q158 append path with the q231 delete path over
    // the stored prev artifacts; the oracle recomputes the full chain
    // over the POST-EPOCH corpus with the frozen prev centroids
    // (first-16 of the prev snapshot — frozen even where deleted).
    "q233_dedup_upsert_delete" -> ivfPostEpochOracle,

    // q235: the streaming maintainer drains the SAME epoch as a
    // two-batch replay (seed build + CDC batch) against DeltaLog
    // state tables and must land on the identical post-epoch state —
    // the gate proves streaming-incremental ≡ staged-incremental
    // (q233) ≡ the oracle's full rebuild.
    "q235_streaming_ivf_maintain" -> ivfPostEpochOracle,

    // q234: BM25 served from the delete-maintained posting stats —
    // Spark reads df from the q232 artifact; the oracle recomputes
    // the whole retrieval over the post-delete corpus from scratch.
    "q234_bm25_after_deletes" ->
      s"""WITH ${bm25CtesFor("WHERE doc_id % 7 <> 3")},
         |r AS (SELECT query_id, doc_id, s9,
         |    ROW_NUMBER() OVER (PARTITION BY query_id
         |      ORDER BY s9 DESC, doc_id) AS rank
         |  FROM bs)
         |SELECT query_id, CAST(rank AS INTEGER) AS rank, doc_id,
         |  CAST(s9 AS DOUBLE) / 1000000000.0 AS score
         |FROM r WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin,

    // q232: posting-stats delete maintenance. Spark subtracts the
    // deleted docs' term stats from the stored full-corpus artifact
    // (DeltaLog tombstone feed, df=0 rows dropped); the oracle
    // recomputes the post-delete corpus from scratch.
    "q232_posting_stats_deletes" ->
      """WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS t
        |  FROM documents WHERE doc_id % 7 <> 3),
        |tf0 AS (SELECT doc_id, t, COUNT(*) AS c FROM tok GROUP BY 1, 2)
        |SELECT t, CAST(COUNT(*) AS BIGINT) AS df,
        |  CAST(SUM(c) AS BIGINT) AS tf
        |FROM tf0 GROUP BY t ORDER BY t""".stripMargin,

    // q237: ANN served from the streaming-maintained index state —
    // the oracle recomputes multi-probe probe-and-rank over the
    // post-epoch corpus from scratch; a hash match proves the
    // delta-maintained inverted lists (assigned + centroids state
    // tables) ARE the post-epoch index. Both sides multi-probe, so
    // candidates dedupe (DISTINCT) before ranking.
    "q237_streaming_ivf_serve" -> ivfServeFromStateOracle,

    // q286: the same serve contract answered from the PUBLISHED
    // cid-bucketed artifact with plan-time bucket pruning — the oracle
    // is identical (the representation is Spark-side; the result set
    // must not move), so a hash match proves pruned-read-of-published
    // ≡ full-state-scan ≡ post-epoch rebuild.
    "q286_streaming_ivf_pruned_serve" -> ivfServeFromStateOracle,

    // q243: synchronous label propagation over the repeat-co-purchase
    // part graph (edges = pairs co-bought in >= 2 orders), 3 unrolled
    // rounds — mode of neighbor labels, ties to the smallest label.
    "q243_label_propagation" -> {
      def round(prev: String, cur: String) =
        s"""$cur AS (
           |  SELECT n.id, COALESCE(a.label, n.id) AS label
           |  FROM nodes n LEFT JOIN (
           |    SELECT src AS id, label FROM (
           |      SELECT e.src, l.label, COUNT(*) AS c,
           |        ROW_NUMBER() OVER (PARTITION BY e.src
           |          ORDER BY COUNT(*) DESC, l.label) AS rn
           |      FROM edges e JOIN $prev l ON e.dst = l.id
           |      GROUP BY 1, 2) WHERE rn = 1) a USING (id))"""
          .stripMargin
      s"""WITH nodes AS (SELECT DISTINCT p_partkey AS id FROM part),
         |bo AS (SELECT DISTINCT l_orderkey AS okey, l_partkey AS id
         |       FROM lineitem),
         |edges AS (SELECT a.id AS src, b.id AS dst
         |          FROM bo a JOIN bo b
         |          ON a.okey = b.okey AND a.id <> b.id
         |          GROUP BY 1, 2 HAVING COUNT(*) >= 2),
         |l0 AS (SELECT id, id AS label FROM nodes),
         |${round("l0", "l1")},
         |${round("l1", "l2")},
         |${round("l2", "l3")}
         |SELECT id AS part_id, label,
         |  CAST(COUNT(*) OVER (PARTITION BY label) AS BIGINT)
         |    AS community_size
         |FROM l3 ORDER BY part_id NULLS FIRST""".stripMargin
    },

    // q245: U-shaped multi-touch attribution — integer-cents credit,
    // 40/40 first/last via integer div, 20% split across middles,
    // touches window [p_ts - 7d, p_ts) after the previous purchase.
    "q245_attribution" ->
      """WITH p0 AS (SELECT user_id, ts AS p_ts, event_id AS p_id,
        |    CAST(FLOOR(value * 100.0 + 0.5) AS BIGINT) AS v_cents
        |  FROM events WHERE event_type = 'purchase'),
        |p AS (SELECT *, LAG(p_ts) OVER (PARTITION BY user_id
        |    ORDER BY p_ts, p_id) AS prev_ts FROM p0),
        |t AS (SELECT user_id, event_type, ts AS t_ts, event_id AS t_id
        |  FROM events WHERE event_type IN ('view', 'click')),
        |j AS (SELECT p.p_id, p.v_cents, t.event_type, t.t_ts, t.t_id
        |  FROM p JOIN t ON p.user_id = t.user_id
        |  WHERE t.t_ts < p.p_ts
        |    AND t.t_ts >= p.p_ts - INTERVAL 7 DAY
        |    AND (p.prev_ts IS NULL OR t.t_ts > p.prev_ts)),
        |c AS (SELECT p_id, v_cents, event_type,
        |    ROW_NUMBER() OVER (PARTITION BY p_id
        |      ORDER BY t_ts, t_id) AS pos,
        |    COUNT(*) OVER (PARTITION BY p_id) AS n
        |  FROM j),
        |cr AS (SELECT p_id, event_type,
        |    CASE WHEN n = 1 THEN v_cents
        |      WHEN pos = 1 OR pos = n THEN (v_cents * 2) // 5
        |      ELSE (v_cents // 5) // (n - 2) END AS credit_cents
        |  FROM c)
        |SELECT event_type AS channel,
        |  CAST(COUNT(*) AS BIGINT) AS n_touches,
        |  CAST(COUNT(DISTINCT p_id) AS BIGINT) AS n_conversions,
        |  CAST(SUM(credit_cents) AS BIGINT) AS attributed_cents,
        |  CAST(SUM(credit_cents) AS DOUBLE) / 100.0 AS attributed
        |FROM cr GROUP BY 1
        |ORDER BY channel NULLS FIRST""".stripMargin,

    // q244: PRF/RM3-lite — BM25 pass 1, top-3 feedback docs, the 3
    // heaviest non-query terms (Σtf, ties lexicographic) appended,
    // re-scored with the identical nano-scaled contribution formula.
    "q244_prf_expansion" ->
      s"""WITH $bm25Ctes,
         |fb AS (SELECT query_id, doc_id FROM (
         |    SELECT query_id, doc_id, ROW_NUMBER() OVER (
         |      PARTITION BY query_id ORDER BY s9 DESC, doc_id) AS rn
         |    FROM bs) WHERE rn <= 3),
         |ex AS (SELECT query_id, t FROM (
         |    SELECT fb.query_id, tf.t, SUM(tf.tf) AS wt,
         |      ROW_NUMBER() OVER (PARTITION BY fb.query_id
         |        ORDER BY SUM(tf.tf) DESC, tf.t) AS rn
         |    FROM fb JOIN tf ON fb.doc_id = tf.doc_id
         |    LEFT JOIN q q0
         |      ON q0.query_id = fb.query_id AND q0.t = tf.t
         |    WHERE q0.t IS NULL
         |    GROUP BY 1, 2) WHERE rn <= 3),
         |qx AS (SELECT query_id, t FROM q
         |       UNION SELECT query_id, t FROM ex),
         |dfx AS (SELECT t, COUNT(*) AS df FROM tf
         |  WHERE t IN (SELECT t FROM qx) GROUP BY 1),
         |c2 AS (SELECT qx.query_id, tf.doc_id,
         |    CAST(FLOOR(
         |      ln((CAST(nd - df AS DOUBLE) + 0.5)
         |          / (CAST(df AS DOUBLE) + 0.5) + 1.0)
         |      * ((CAST(tf AS DOUBLE) * 2.2)
         |         / (CAST(tf AS DOUBLE) + 1.2
         |            * (0.25 + 0.75
         |               * (CAST(dl AS DOUBLE)
         |                  / (CAST(nt AS DOUBLE) / nd)))))
         |      * 1000000000.0 + 0.5) AS BIGINT) AS c9
         |  FROM qx JOIN tf USING (t) JOIN dfx USING (t)
         |  JOIN dl ON tf.doc_id = dl.doc_id CROSS JOIN tot
         |  WHERE tf.doc_id <> qx.query_id),
         |bs2 AS (SELECT query_id, doc_id, CAST(SUM(c9) AS BIGINT) AS s9
         |  FROM c2 GROUP BY 1, 2),
         |r2 AS (SELECT query_id, doc_id, s9,
         |    ROW_NUMBER() OVER (PARTITION BY query_id
         |      ORDER BY s9 DESC, doc_id) AS rank
         |  FROM bs2)
         |SELECT query_id, CAST(rank AS INTEGER) AS rank, doc_id,
         |  CAST(s9 AS DOUBLE) / 1000000000.0 AS score
         |FROM r2 WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin,

    // q242: the ISO-BMFF box walk — the oracle reconstructs the same
    // byte stream as a hex string and RE-WALKS it with data-driven
    // offsets (every box size read from the string, q156's
    // discipline); TRY_CAST turns truncated reads into NULLs that
    // fail the validity predicate exactly where the JVM walker bails.
    "q242_mp4_box_walk" ->
      """WITH m AS (SELECT r AS media_id,
        |    CAST(r * 7 % 900 + 100 AS INT) AS ts,
        |    CAST(r * 13 % 100000 + 1000 AS INT) AS dur,
        |    CAST(r % 11 AS INT) AS fl,
        |    CAST(r % 37 AS INT) AS mp
        |  FROM range(500) t(r)),
        |c AS (SELECT media_id,
        |    '0000001466747970' || '69736F6D' || '00000200' || '69736F6D' ||
        |    CASE WHEN media_id % 3 = 0 THEN
        |        lpad(to_hex(fl + 8), 8, '0') || '66726565' ||
        |        repeat('00', fl)
        |      ELSE '' END ||
        |    '000000746D6F6F76' ||
        |    '0000006C' || '6D766864' || '00000000' || '00000000' ||
        |    '00000000' ||
        |    lpad(to_hex(ts), 8, '0') || lpad(to_hex(dur), 8, '0') ||
        |    '00010000' || '0100' || repeat('00', 10) ||
        |    '000100000000000000000000' || '000000000001000000000000' ||
        |    '000000000000000040000000' ||
        |    repeat('00', 24) || '00000002' ||
        |    lpad(to_hex(mp + 24), 8, '0') || '6D646174' ||
        |    repeat('00', mp) || md5(media_id || ':g') AS full_hx
        |  FROM m),
        |x AS (SELECT media_id,
        |    upper(CASE WHEN media_id % 17 = 0 THEN substring(full_hx, 1, 20)
        |      ELSE full_hx END) AS hx
        |  FROM c),
        |w1 AS (SELECT media_id, hx, len(hx) // 2 AS n_bytes,
        |    TRY_CAST('0x' || substring(hx, 1, 8) AS BIGINT) AS s1b,
        |    substring(hx, 9, 8) AS f1
        |  FROM x),
        |w2 AS (SELECT *, 1 + 2 * s1b AS o2 FROM w1),
        |w3 AS (SELECT *,
        |    TRY_CAST('0x' || substring(hx, o2, 8) AS BIGINT) AS s2b,
        |    substring(hx, o2 + 8, 8) = '66726565' AS hasfree
        |  FROM w2),
        |w4 AS (SELECT *,
        |    CASE WHEN hasfree THEN o2 + 2 * s2b ELSE o2 END AS om
        |  FROM w3),
        |w5 AS (SELECT *,
        |    TRY_CAST('0x' || substring(hx, om, 8) AS BIGINT) AS smb,
        |    substring(hx, om + 8, 8) AS fm,
        |    substring(hx, om + 24, 8) AS fmv,
        |    substring(hx, om + 32, 2) AS ver,
        |    TRY_CAST('0x' || substring(hx, om + 56, 8) AS BIGINT) AS tsv,
        |    TRY_CAST('0x' || substring(hx, om + 64, 8) AS BIGINT) AS durv
        |  FROM w4),
        |w6 AS (SELECT *, om + 2 * smb AS od FROM w5),
        |w7 AS (SELECT *,
        |    TRY_CAST('0x' || substring(hx, od, 8) AS BIGINT) AS sdb,
        |    substring(hx, od + 8, 8) AS fd
        |  FROM w6),
        |v AS (SELECT *,
        |    COALESCE(f1 = '66747970' AND s1b >= 8
        |      AND (NOT hasfree OR s2b >= 8)
        |      AND fm = '6D6F6F76' AND smb >= 40
        |      AND fmv = '6D766864' AND ver = '00'
        |      AND fd = '6D646174' AND sdb >= 8
        |      AND tsv > 0 AND od + 2 * sdb - 1 = len(hx), FALSE) AS ok
        |  FROM w7)
        |SELECT media_id, CAST(n_bytes AS INT) AS n_bytes,
        |  CASE WHEN ok THEN CAST(3 + CASE WHEN hasfree THEN 1 ELSE 0 END
        |    AS INT) ELSE -1 END AS n_boxes,
        |  COALESCE(ok AND hasfree, FALSE) AS has_free,
        |  CASE WHEN ok THEN CAST(sdb - 8 AS BIGINT)
        |    ELSE CAST(-1 AS BIGINT) END AS mdat_bytes,
        |  CASE WHEN ok THEN CAST(tsv AS BIGINT)
        |    ELSE CAST(-1 AS BIGINT) END AS timescale,
        |  CASE WHEN ok THEN CAST(durv AS BIGINT)
        |    ELSE CAST(-1 AS BIGINT) END AS duration,
        |  CASE WHEN ok THEN CAST(durv * 1000 // tsv AS BIGINT)
        |    ELSE CAST(-1 AS BIGINT) END AS dur_ms
        |FROM v ORDER BY media_id NULLS FIRST""".stripMargin,

    // q240: exact shared-substring spans (Lee et al. ExactSubstr as
    // window-grain dataflow) — k-token windows shared by 2..100 docs
    // (the df cap mirrors Spark's super-frequent skip), position
    // pairs merged into maximal spans per diagonal by
    // gaps-and-islands.
    "q240_shared_substrings" ->
      """WITH d AS (SELECT doc_id, string_split(text, ' ') AS ts
        |  FROM documents),
        |win AS (SELECT doc_id, i AS pos,
        |    array_to_string(ts[i+1:i+8], ' ') AS w
        |  FROM d, UNNEST(range(0, len(ts) - 7)) AS u(i)),
        |df AS (SELECT w FROM win GROUP BY w
        |  HAVING COUNT(DISTINCT doc_id) BETWEEN 2 AND 100),
        |sw AS (SELECT win.* FROM win JOIN df USING (w)),
        |p AS (SELECT a.doc_id AS ida, b.doc_id AS idb,
        |    a.pos AS posa, b.pos AS posb
        |  FROM sw a JOIN sw b ON a.w = b.w AND a.doc_id < b.doc_id),
        |i AS (SELECT ida, idb, posa - posb AS diag, posa,
        |    posa - ROW_NUMBER() OVER (PARTITION BY ida, idb, posa - posb
        |      ORDER BY posa) AS grp
        |  FROM p)
        |SELECT ida, idb, CAST(MIN(posa) AS BIGINT) AS start_a,
        |  CAST(MIN(posa) - diag AS BIGINT) AS start_b,
        |  CAST(MAX(posa) - MIN(posa) + 8 AS BIGINT) AS span_tokens
        |FROM i GROUP BY ida, idb, diag, grp
        |ORDER BY ida NULLS FIRST, idb NULLS FIRST,
        |  start_a NULLS FIRST, start_b NULLS FIRST""".stripMargin,

    // q238: PII pseudonymization mart — deterministic keyed pseudonym
    // (md5), digit-masked display name, $1000 banding of the sensitive
    // balance (cents discipline + double floor, identical expression
    // tree both engines).
    "q238_pii_redaction" ->
      """SELECT c_custkey, md5(c_name) AS name_hash,
        |  regexp_replace(c_name, '[0-9]', '*', 'g') AS name_masked,
        |  CAST(FLOOR(CAST(CAST(FLOOR(c_acctbal * 100.0 + 0.5) AS BIGINT)
        |    AS DOUBLE) / 100000.0) AS BIGINT) AS acct_band,
        |  c_nationkey, c_mktsegment
        |FROM customer
        |ORDER BY c_custkey NULLS FIRST""".stripMargin,

    // q241: the k-anonymized release — q238's redaction shipped under
    // q239's cell verdicts (released keep segment, generalized ship
    // '*', suppressed don't ship).
    "q241_anonymized_release" ->
      """WITH cells AS (SELECT c_nationkey, c_mktsegment, COUNT(*) AS n
        |  FROM customer GROUP BY 1, 2),
        |mer AS (SELECT c_nationkey, SUM(n) AS n
        |  FROM cells WHERE n < 5 GROUP BY 1),
        |r AS (SELECT c_custkey, md5(c_name) AS name_hash,
        |    regexp_replace(c_name, '[0-9]', '*', 'g') AS name_masked,
        |    CAST(FLOOR(CAST(CAST(FLOOR(c_acctbal * 100.0 + 0.5) AS BIGINT)
        |      AS DOUBLE) / 100000.0) AS BIGINT) AS acct_band,
        |    c_nationkey, c_mktsegment
        |  FROM customer)
        |SELECT r.c_custkey, r.name_hash, r.name_masked, r.acct_band,
        |  r.c_nationkey,
        |  CASE WHEN c0.n IS NOT NULL THEN r.c_mktsegment ELSE '*' END
        |    AS segment_out
        |FROM r
        |LEFT JOIN (SELECT * FROM cells WHERE n >= 5) c0
        |  ON r.c_nationkey = c0.c_nationkey
        |  AND r.c_mktsegment = c0.c_mktsegment
        |LEFT JOIN mer ON r.c_nationkey = mer.c_nationkey
        |WHERE c0.n IS NOT NULL OR mer.n >= 5
        |ORDER BY r.c_custkey NULLS FIRST""".stripMargin,

    // q239: k-anonymity audit with one-step lattice generalization —
    // (nation, segment) cells under k merge to nation grain
    // ('generalized') or are withheld ('suppressed').
    "q239_k_anonymity" ->
      """WITH cells AS (SELECT c_nationkey, c_mktsegment, COUNT(*) AS n
        |  FROM customer GROUP BY 1, 2),
        |mer AS (SELECT c_nationkey, SUM(n) AS n
        |  FROM cells WHERE n < 5 GROUP BY 1)
        |SELECT * FROM (
        |  SELECT c_nationkey, c_mktsegment AS segment,
        |    CAST(n AS BIGINT) AS n, 0 AS gen_level,
        |    'released' AS status
        |  FROM cells WHERE n >= 5
        |  UNION ALL
        |  SELECT c_nationkey, '*' AS segment, CAST(n AS BIGINT) AS n,
        |    CASE WHEN n >= 5 THEN 1 ELSE 2 END AS gen_level,
        |    CASE WHEN n >= 5 THEN 'generalized' ELSE 'suppressed' END
        |      AS status
        |  FROM mer)
        |ORDER BY c_nationkey NULLS FIRST, segment NULLS FIRST""".stripMargin,

    // q236: the streaming posting-stats maintainer drains a seed +
    // CDC epoch (appends % 6 = 0, tombstones % 7 = 3 of the prev
    // snapshot) against a DeltaLog vocabulary table and must land on
    // the from-scratch stats of the post-epoch corpus — q196's
    // additive merge and q232's subtraction as one running process.
    "q236_streaming_posting_stats" ->
      """WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS t
        |  FROM documents WHERE doc_id % 6 = 0 OR doc_id % 7 <> 3),
        |tf0 AS (SELECT doc_id, t, COUNT(*) AS c FROM tok GROUP BY 1, 2)
        |SELECT t, CAST(COUNT(*) AS BIGINT) AS df,
        |  CAST(SUM(c) AS BIGINT) AS tf
        |FROM tf0 GROUP BY t ORDER BY t""".stripMargin,

    // q228: exact cross-source content overlap — fingerprint-keyed
    // self-join, source-grain sizes, exact set Jaccard.
    "q228_source_overlap" ->
      s"""WITH fps AS (SELECT DISTINCT source, $fpSqlExpr AS fp
         |  FROM documents),
         |sz AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n
         |  FROM fps GROUP BY 1),
         |iv AS (SELECT a.source AS source_a, b.source AS source_b,
         |    CAST(COUNT(*) AS BIGINT) AS n_shared
         |  FROM fps a JOIN fps b ON a.fp = b.fp AND a.source < b.source
         |  GROUP BY 1, 2)
         |SELECT * FROM (
         |  SELECT iv.source_a, iv.source_b, sa.n AS na, sb.n AS nb,
         |    iv.n_shared,
         |    ${val6("CAST(n_shared AS DOUBLE) / " +
             "(CAST(sa.n + sb.n AS DOUBLE) - CAST(n_shared AS DOUBLE))")}
         |      AS jaccard
         |  FROM iv JOIN sz sa ON iv.source_a = sa.source
         |    JOIN sz sb ON iv.source_b = sb.source
         |  UNION ALL
         |  SELECT source, source, n, n, n, 1.0 FROM sz)
         |ORDER BY source_a NULLS FIRST, source_b NULLS FIRST"""
        .stripMargin,

    // q227: seasonal decomposition — detrending multiplies through by
    // the window width to stay integer; weekday means and σ divide out
    // of exact moments; whole-dollar residual quantization (milli
    // would overflow the squared sums at day grain).
    "q227_seasonal_decompose" ->
      s"""WITH d AS (SELECT CAST(o_orderdate AS DATE) AS day,
         |    CAST(SUM(CAST(FLOOR(o_totalprice * 100.0 + 0.5)
         |      AS BIGINT)) AS BIGINT) AS cents
         |  FROM orders GROUP BY 1),
         |t AS (SELECT day, cents,
         |    CAST(SUM(cents) OVER w AS BIGINT) AS sum7,
         |    COUNT(*) OVER w AS cnt7
         |  FROM d WINDOW w AS (ORDER BY day
         |    ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)),
         |t2 AS (SELECT day, cents, sum7, cents * 7 - sum7 AS d1,
         |    isodow(day) - 1 AS dow
         |  FROM t WHERE cnt7 = 7),
         |seas AS (SELECT dow, CAST(SUM(d1) AS DOUBLE) / COUNT(*)
         |    / 7.0 / 100.0 AS seasonal
         |  FROM t2 GROUP BY 1),
         |sc AS (SELECT t2.*, seas.seasonal,
         |    CAST(d1 AS DOUBLE) / 700.0 - seas.seasonal AS residual
         |  FROM t2 JOIN seas USING (dow)),
         |sc2 AS (SELECT sc.*,
         |    CAST(FLOOR(residual + 0.5) AS BIGINT) AS r0 FROM sc),
         |sig AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
         |    CAST(SUM(r0) AS BIGINT) AS s1,
         |    CAST(SUM(r0 * r0) AS BIGINT) AS s2 FROM sc2)
         |SELECT day, CAST(cents AS DOUBLE) / 100.0 AS revenue,
         |  ${val6("CAST(sum7 AS DOUBLE) / 700.0")} AS trend,
         |  ${val6("seasonal")} AS seasonal,
         |  ${val6("residual")} AS residual,
         |  abs(residual) > 2.0
         |    * sqrt(CAST(sig.s2 AS DOUBLE) / CAST(sig.n AS DOUBLE)
         |      - (CAST(sig.s1 AS DOUBLE) / CAST(sig.n AS DOUBLE))
         |        * (CAST(sig.s1 AS DOUBLE) / CAST(sig.n AS DOUBLE)))
         |    AS is_anomaly
         |FROM sc2 CROSS JOIN sig ORDER BY day NULLS FIRST""".stripMargin,

    // q225: Chapman capture–recapture — exact set cardinalities from
    // two half-period windows, one integer product + one division.
    "q225_capture_recapture" ->
      """WITH b AS (SELECT MIN(CAST(o_orderdate AS DATE)) AS d0,
        |    MAX(CAST(o_orderdate AS DATE)) AS d1 FROM orders),
        |s AS (SELECT DISTINCT
        |    CASE WHEN (CAST(o_orderdate AS DATE) - b.d0) * 2
        |      <= (b.d1 - b.d0) THEN 1 ELSE 2 END AS half,
        |    l_partkey
        |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |  CROSS JOIN b),
        |n1 AS (SELECT CAST(COUNT(*) AS BIGINT) AS n1 FROM s
        |  WHERE half = 1),
        |n2 AS (SELECT CAST(COUNT(*) AS BIGINT) AS n2 FROM s
        |  WHERE half = 2),
        |m AS (SELECT CAST(COUNT(*) AS BIGINT) AS m FROM (
        |    SELECT l_partkey FROM s WHERE half = 1
        |    INTERSECT SELECT l_partkey FROM s WHERE half = 2)),
        |tr AS (SELECT CAST(COUNT(*) AS BIGINT) AS truth FROM part),
        |e AS (SELECT n1, n2, m, truth,
        |    CAST(n1 + 1 AS DOUBLE) * CAST(n2 + 1 AS DOUBLE)
        |      / CAST(m + 1 AS DOUBLE) - 1.0 AS est
        |  FROM n1 CROSS JOIN n2 CROSS JOIN m CROSS JOIN tr)
        |SELECT n1 AS n_first_half, n2 AS n_second_half,
        |  m AS n_overlap,
        |  CAST(FLOOR(est * 1000000.0 + 0.5) AS BIGINT) / 1000000.0
        |    AS chapman_estimate,
        |  truth AS n_catalog,
        |  CAST(FLOOR(est / CAST(truth AS DOUBLE) * 1000000.0 + 0.5)
        |    AS BIGINT) / 1000000.0 AS est_over_truth
        |FROM e""".stripMargin,

    // q226: Good–Turing unseen mass — one vocabulary-grain reduce,
    // exact integers, one division at the edge.
    "q226_unseen_mass" ->
      """WITH v AS (SELECT t, CAST(COUNT(*) AS BIGINT) AS c FROM (
        |    SELECT unnest(string_split(text, ' ')) AS t FROM documents)
        |  WHERE t <> '' GROUP BY 1)
        |SELECT CAST(SUM(c) AS BIGINT) AS n_tokens,
        |  CAST(COUNT(*) AS BIGINT) AS n_types,
        |  CAST(SUM(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_hapax,
        |  CAST(SUM(CASE WHEN c = 2 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_doubletons,
        |  CAST(FLOOR(CAST(SUM(CASE WHEN c = 1 THEN 1 ELSE 0 END)
        |      AS DOUBLE) / CAST(SUM(c) AS DOUBLE)
        |    * 1000000.0 + 0.5) AS BIGINT) / 1000000.0 AS unseen_mass,
        |  CAST(FLOOR(CAST(SUM(CASE WHEN c = 1 THEN 1 ELSE 0 END)
        |      AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)
        |    * 1000000.0 + 0.5) AS BIGINT) / 1000000.0 AS hapax_share
        |FROM v""".stripMargin,

    // q224: Poisson bootstrap — hash-drawn inverse-CDF weights
    // (thresholds are shared Scala constants), exact integer
    // per-replicate sums, milli-scaled means into integer-moment
    // variance.
    "q224_bootstrap_se" -> {
      val cs = graft.operators.Analytics.PoissonCdf
      s"""WITH o AS (SELECT o_orderkey,
         |    CAST(FLOOR(o_totalprice * 100.0 + 0.5) AS BIGINT) AS cents
         |  FROM orders),
         |g AS (SELECT o.o_orderkey, o.cents, CAST(r AS INT) AS r
         |  FROM o, range(0, 32) t(r)),
         |w AS (SELECT r, cents,
         |    CASE WHEN u < ${cs(0)} THEN 0 WHEN u < ${cs(1)} THEN 1
         |         WHEN u < ${cs(2)} THEN 2 WHEN u < ${cs(3)} THEN 3
         |         ELSE 4 END AS k
         |  FROM (SELECT r, cents,
         |      CAST(${h32("CAST(o_orderkey AS VARCHAR) || ':' || " +
             "CAST(r AS VARCHAR)")} AS DOUBLE) / 4294967296.0 AS u
         |    FROM g)),
         |pr AS (SELECT r, CAST(SUM(k * cents) AS BIGINT) AS num,
         |    CAST(SUM(k) AS BIGINT) AS den
         |  FROM w GROUP BY 1),
         |m AS (SELECT r, CAST(FLOOR(CAST(num AS DOUBLE) / 100.0
         |    / CAST(den AS DOUBLE) * 1000.0 + 0.5) AS BIGINT) AS m3
         |  FROM pr),
         |ov AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
         |    CAST(SUM(cents) AS DOUBLE) / 100.0 / COUNT(*)
         |      AS mean_value
         |  FROM o),
         |agg AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_reps,
         |    CAST(SUM(d3) AS BIGINT) AS s1,
         |    CAST(SUM(d3 * d3) AS BIGINT) AS s2
         |  FROM (SELECT m.m3 - CAST(FLOOR(ov.mean_value * 1000.0 + 0.5)
         |      AS BIGINT) AS d3
         |    FROM m CROSS JOIN ov))
         |SELECT ov.n_rows, agg.n_reps,
         |  ${val6("ov.mean_value")} AS mean_value,
         |  ${val6("sqrt(CAST(agg.n_reps * agg.s2 - agg.s1 * agg.s1 " +
             "AS DOUBLE) / CAST(agg.n_reps * (agg.n_reps - 1) " +
             "AS DOUBLE)) / 1000.0")} AS bootstrap_se
         |FROM agg CROSS JOIN ov""".stripMargin
    },

    // q222: pairwise MI — one ln per cell on an exact integer ratio,
    // nano-floor-scaled, exact long cross-cell sums.
    "q222_mutual_info" ->
      s"""WITH st AS (
         |  SELECT 'returnflag~linestatus' AS pair, l_returnflag AS x,
         |    l_linestatus AS y FROM lineitem
         |  UNION ALL SELECT 'returnflag~qbin', l_returnflag,
         |    CAST(CAST(FLOOR((l_quantity - 1) / 10.0) AS BIGINT)
         |      AS VARCHAR) FROM lineitem
         |  UNION ALL SELECT 'linestatus~qbin', l_linestatus,
         |    CAST(CAST(FLOOR((l_quantity - 1) / 10.0) AS BIGINT)
         |      AS VARCHAR) FROM lineitem),
         |c AS (SELECT pair, x, y, CAST(COUNT(*) AS BIGINT) AS cxy
         |  FROM st GROUP BY 1, 2, 3),
         |mx AS (SELECT pair, x, CAST(SUM(cxy) AS BIGINT) AS cx
         |  FROM c GROUP BY 1, 2),
         |my AS (SELECT pair, y, CAST(SUM(cxy) AS BIGINT) AS cy
         |  FROM c GROUP BY 1, 2),
         |nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM lineitem),
         |t AS (SELECT c.pair,
         |    CAST(FLOOR(CAST(cxy AS DOUBLE)
         |      * ln(CAST(cxy * n AS DOUBLE) / CAST(cx * cy AS DOUBLE))
         |      * 1000000000.0 + 0.5) AS BIGINT) AS t9, nn.n AS nv
         |  FROM c JOIN mx USING (pair, x) JOIN my USING (pair, y)
         |  CROSS JOIN nn)
         |SELECT pair, CAST(COUNT(*) AS BIGINT) AS n_cells,
         |  ${val6("CAST(SUM(t9) AS DOUBLE) / 1000000000.0 " +
             "/ CAST(MAX(nv) AS DOUBLE)")} AS mi_nats
         |FROM t GROUP BY 1
         |ORDER BY pair NULLS FIRST""".stripMargin,

    // q223: Benford audit — first digit from the integer string (no
    // log10 on data); the nine expected shares are the SAME Scala
    // doubles rendered as literals on both sides.
    "q223_benford" -> {
      val ps = graft.operators.Features.BenfordP.zipWithIndex
        .map { case (p, i) => s"(${i + 1}, $p)" }.mkString(", ")
      s"""WITH d AS (SELECT CAST(substr(CAST(CAST(FLOOR(o_totalprice)
         |      AS BIGINT) AS VARCHAR), 1, 1) AS INT) AS digit
         |  FROM orders),
         |g AS (SELECT digit, CAST(COUNT(*) AS BIGINT) AS n_obs
         |  FROM d GROUP BY 1),
         |nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM orders),
         |e(digit, p) AS (VALUES $ps)
         |SELECT g.digit, g.n_obs,
         |  ${val6("CAST(n_obs AS DOUBLE) / CAST(nn.n AS DOUBLE)")}
         |    AS obs_share,
         |  ${val6("e.p")} AS benford_p,
         |  ${val6("(CAST(n_obs AS DOUBLE) - CAST(nn.n AS DOUBLE) * e.p)"
             + " * (CAST(n_obs AS DOUBLE) - CAST(nn.n AS DOUBLE) * e.p)"
             + " / (CAST(nn.n AS DOUBLE) * e.p)")} AS chi2_part
         |FROM g JOIN e USING (digit) CROSS JOIN nn
         |ORDER BY digit NULLS FIRST""".stripMargin
    },

    // q220: bot scoring — exact integer-second gap moments; cv is two
    // IEEE ops on integer-valued doubles; the flag compares the
    // identical double on both engines.
    "q220_bot_score" ->
      s"""WITH g AS (SELECT user_id,
         |    epoch_us(ts) - lag(epoch_us(ts)) OVER (
         |      PARTITION BY user_id ORDER BY ts, event_id) AS gap
         |  FROM events),
         |g2 AS (SELECT user_id, gap // 1000000 AS gs FROM g
         |  WHERE gap IS NOT NULL),
         |u AS (SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n,
         |    CAST(SUM(gs) AS BIGINT) AS s1,
         |    CAST(SUM(gs * gs) AS BIGINT) AS s2
         |  FROM g2 GROUP BY 1 HAVING COUNT(*) >= 2),
         |c AS (SELECT user_id, n + 1 AS n_events, n, s1,
         |    CASE WHEN s1 > 0 THEN
         |      sqrt(CAST(n * s2 - s1 * s1 AS DOUBLE))
         |        / CAST(s1 AS DOUBLE)
         |    ELSE 0.0 END AS cv
         |  FROM u)
         |SELECT user_id, n_events,
         |  ${val6("CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE)")}
         |    AS mean_gap_s,
         |  ${val6("cv")} AS gap_cv, cv < 0.85 AS suspicious
         |FROM c ORDER BY user_id NULLS FIRST""".stripMargin,

    // Spark session_window semantics: an event exactly `gap` after the
    // previous STARTS a new session (strict containment in [ts, ts+gap)),
    // and window end = last_ts + gap. Integer epoch-µs gap test.
    "q77_session_window" -> sessionWindowOracle,

    // q106: the SAME sessions, computed by the streaming engine in
    // append mode (sentinel-flushed bounded replay) — one oracle.
    "q106_streaming_session" -> sessionWindowOracle,

    "q78_doc_histogram" ->
      """SELECT CAST(FLOOR(n_chars / 100) * 100 AS BIGINT) AS bucket_lo,
        |  COUNT(*) AS n_docs, min(n_chars) AS min_chars,
        |  max(n_chars) AS max_chars
        |FROM documents GROUP BY 1
        |ORDER BY bucket_lo NULLS FIRST""".stripMargin,

    // Long-form melt of the q45 matrix: one UNION ALL arm per value
    // column, zero cells dropped — semantically UNPIVOT.
    "q79_unpivot" ->
      """WITH w AS (
        |  SELECT user_id,
        |    COUNT(*) FILTER (event_type = 'signup') AS n_signup,
        |    COUNT(*) FILTER (event_type = 'view') AS n_view,
        |    COUNT(*) FILTER (event_type = 'click') AS n_click,
        |    COUNT(*) FILTER (event_type = 'purchase') AS n_purchase
        |  FROM events GROUP BY user_id),
        |l AS (
        |  SELECT user_id, 'signup' AS stage, n_signup AS n_events FROM w
        |  UNION ALL SELECT user_id, 'view', n_view FROM w
        |  UNION ALL SELECT user_id, 'click', n_click FROM w
        |  UNION ALL SELECT user_id, 'purchase', n_purchase FROM w)
        |SELECT user_id, stage, n_events FROM l WHERE n_events > 0
        |ORDER BY user_id NULLS FIRST, stage NULLS FIRST""".stripMargin,

    // The bloom prefilter is result-transparent (exact IN-join removes
    // false positives), so the oracle is the plain semi join.
    "q81_bloom_prune" ->
      s"""WITH keys AS (
         |  SELECT s_suppkey FROM supplier
         |  JOIN nation ON s_nationkey = n_nationkey
         |  WHERE n_name = 'NATION_3')
         |SELECT strftime(l_shipdate, '%Y-%m') AS ship_month,
         |  ${sum4("l_extendedprice * (1.0 - l_discount)")} AS revenue,
         |  COUNT(*) AS n_items
         |FROM lineitem
         |WHERE l_suppkey IN (SELECT s_suppkey FROM keys)
         |GROUP BY 1 ORDER BY 1 ASC NULLS FIRST""".stripMargin,

    // percentile_disc returns ACTUAL data values — exact quantiles with
    // no cross-engine interpolation hazard.
    "q80_percentile_disc" ->
      """SELECT p_brand,
        |  quantile_disc(p_retailprice, 0.25) AS p25,
        |  quantile_disc(p_retailprice, 0.5) AS p50,
        |  quantile_disc(p_retailprice, 0.9) AS p90,
        |  COUNT(*) AS n
        |FROM part GROUP BY p_brand
        |ORDER BY p_brand ASC NULLS FIRST""".stripMargin,

    // Second moments from exact integer power sums: the float formula
    // runs once per group on exactly-known operands, so the IEEE op
    // sequence (and the result) is identical in both engines.
    "q82_moments" -> {
      val nD = "CAST(n AS DOUBLE)"
      val varx = s"$nD * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)"
      val vary = s"$nD * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)"
      val covNum = s"$nD * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)"
      s"""WITH s AS (
         |  SELECT l_linestatus, COUNT(*) AS n,
         |    SUM(CAST(FLOOR(l_quantity * 100.0 + 0.5) AS BIGINT)) AS sx,
         |    SUM(CAST(FLOOR(l_extendedprice + 0.5) AS BIGINT)) AS sy,
         |    SUM(CAST(FLOOR(l_quantity * 100.0 + 0.5) AS BIGINT)
         |      * CAST(FLOOR(l_quantity * 100.0 + 0.5) AS BIGINT)) AS sxx,
         |    SUM(CAST(FLOOR(l_extendedprice + 0.5) AS BIGINT)
         |      * CAST(FLOOR(l_extendedprice + 0.5) AS BIGINT)) AS syy,
         |    SUM(CAST(FLOOR(l_quantity * 100.0 + 0.5) AS BIGINT)
         |      * CAST(FLOOR(l_extendedprice + 0.5) AS BIGINT)) AS sxy
         |  FROM lineitem GROUP BY 1)
         |SELECT l_linestatus, n,
         |  ${val6(s"SQRT($varx) / $nD / 100.0")} AS stddev_qty,
         |  ${val6(s"SQRT($vary) / $nD")} AS stddev_price,
         |  ${val6(s"($covNum) / (SQRT($varx) * SQRT($vary))")} AS corr_qty_price
         |FROM s ORDER BY l_linestatus ASC NULLS FIRST""".stripMargin
    },

    // Dedup-first + brand blocking: the quadratic runs over DISTINCT
    // names per brand. levenshtein is integer DP — exact in any engine.
    "q83_fuzzy_names" ->
      """WITH names AS (SELECT DISTINCT p_brand, p_name FROM part)
        |SELECT a.p_brand, a.p_name AS name_a, b.p_name AS name_b,
        |  levenshtein(a.p_name, b.p_name) AS edit_dist
        |FROM names a JOIN names b
        |  ON a.p_brand = b.p_brand AND a.p_name < b.p_name
        |WHERE levenshtein(a.p_name, b.p_name) <= 2
        |ORDER BY a.p_brand ASC NULLS FIRST, name_a ASC NULLS FIRST,
        |  name_b ASC NULLS FIRST""".stripMargin,

    // RANGE frame over an integer epoch-day key: identical frame
    // boundaries in both engines; windowed sum over integer cents.
    "q84_range_frame" ->
      """WITH daily AS (
        |  SELECT o_orderpriority, CAST(o_orderdate AS DATE) AS order_date,
        |    SUM(CAST(FLOOR(o_totalprice * 100.0 + 0.5) AS BIGINT)) AS day_cents,
        |    DATEDIFF('day', DATE '1970-01-01', CAST(o_orderdate AS DATE)) AS day_num
        |  FROM orders GROUP BY 1, 2, 4)
        |SELECT o_orderpriority, order_date,
        |  CAST(day_cents AS DOUBLE) / 100.0 AS revenue,
        |  CAST(SUM(day_cents) OVER (PARTITION BY o_orderpriority
        |    ORDER BY day_num ASC
        |    RANGE BETWEEN 6 PRECEDING AND CURRENT ROW) AS DOUBLE) / 100.0
        |    AS revenue_7d
        |FROM daily
        |ORDER BY o_orderpriority ASC NULLS FIRST,
        |  order_date ASC NULLS FIRST""".stripMargin,

    // Bag semantics: EXCEPT ALL / INTERSECT ALL preserve multiplicity.
    "q85_bag_ops" ->
      """WITH v AS (SELECT user_id, CAST(ts AS DATE) AS day
        |  FROM events WHERE event_type = 'view'),
        |p AS (SELECT user_id, CAST(ts AS DATE) AS day
        |  FROM events WHERE event_type = 'purchase'),
        |exc AS (SELECT * FROM v EXCEPT ALL SELECT * FROM p),
        |ovl AS (SELECT * FROM v INTERSECT ALL SELECT * FROM p)
        |SELECT 'except_all' AS op, user_id, COUNT(*) AS n_rows
        |FROM exc GROUP BY 2
        |UNION ALL
        |SELECT 'intersect_all' AS op, user_id, COUNT(*) AS n_rows
        |FROM ovl GROUP BY 2
        |ORDER BY op ASC NULLS FIRST, user_id ASC NULLS FIRST""".stripMargin,

    // The Misra-Gries candidate phase is result-transparent (phase 2
    // recounts exactly), so the oracle is the plain group-filter.
    "q94_heavy_hitters" ->
      s"""WITH t AS (SELECT user_id, COUNT(*) AS c FROM events GROUP BY 1),
         |s AS (SELECT CAST(SUM(c) AS BIGINT) AS total, COUNT(*) AS nd FROM t)
         |SELECT user_id, c AS n_events,
         |  ${val6("CAST(c AS DOUBLE) / total")} AS share
         |FROM t, s
         |WHERE CAST(c AS DOUBLE) * nd > 1.25 * total
         |ORDER BY user_id ASC NULLS FIRST""".stripMargin,

    "q101_string_funcs2" ->
      """SELECT c_custkey,
        |  translate(c_mktsegment, 'AEIOU', 'aeiou') AS seg_translated,
        |  lpad(CAST(c_custkey AS VARCHAR), 10, '0') AS key_padded,
        |  rpad(c_mktsegment, 12, '.') AS seg_padded,
        |  split_part(c_name, '#', 2) AS name_num,
        |  repeat(left(c_mktsegment, 1), 3) AS seg_echo,
        |  reverse(c_name) AS name_rev,
        |  CAST(ascii(c_mktsegment) AS BIGINT) AS seg_ascii,
        |  CAST(instr(c_name, '#') AS BIGINT) AS hash_pos,
        |  right(c_name, 4) AS key_tail,
        |  concat_ws('|', c_mktsegment, c_name) AS joined
        |FROM customer ORDER BY c_custkey ASC NULLS FIRST""".stripMargin,

    // Same exact-integer-power-sums machinery as q82; the closed-form
    // slope/intercept evaluate once per group on exact operands.
    "q102_regression" -> {
      val nD = "CAST(n AS DOUBLE)"
      val slope = s"($nD * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))" +
        s" / ($nD * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))"
      s"""WITH s AS (
         |  SELECT o_orderpriority, COUNT(*) AS n,
         |    SUM(DATEDIFF('day', DATE '1970-01-01',
         |      CAST(o_orderdate AS DATE))) AS sx,
         |    SUM(CAST(FLOOR(o_totalprice + 0.5) AS BIGINT)) AS sy,
         |    SUM(DATEDIFF('day', DATE '1970-01-01', CAST(o_orderdate AS DATE))
         |      * DATEDIFF('day', DATE '1970-01-01', CAST(o_orderdate AS DATE)))
         |      AS sxx,
         |    SUM(DATEDIFF('day', DATE '1970-01-01', CAST(o_orderdate AS DATE))
         |      * CAST(FLOOR(o_totalprice + 0.5) AS BIGINT)) AS sxy
         |  FROM orders GROUP BY 1)
         |SELECT o_orderpriority, n,
         |  ${val6(slope)} AS slope_per_day,
         |  ${val6(s"(CAST(sy AS DOUBLE) - ($slope) * CAST(sx AS DOUBLE)) / $nD")}
         |    AS intercept
         |FROM s ORDER BY o_orderpriority ASC NULLS FIRST""".stripMargin
    },

    // Offset and keyset pagination must agree on the page contents.
    "q108_pagination" ->
      """WITH ranked AS (
        |  SELECT c_custkey, c_name, c_acctbal FROM customer
        |  ORDER BY c_custkey LIMIT 20 OFFSET 40),
        |boundary AS (
        |  SELECT MAX(c_custkey) AS b FROM (
        |    SELECT c_custkey FROM customer ORDER BY c_custkey LIMIT 40)),
        |keyset AS (
        |  SELECT c_custkey, c_name, c_acctbal FROM customer, boundary
        |  WHERE c_custkey > b ORDER BY c_custkey LIMIT 20)
        |SELECT 'offset' AS method, c_custkey, c_name, c_acctbal FROM ranked
        |UNION ALL
        |SELECT 'keyset', c_custkey, c_name, c_acctbal FROM keyset
        |ORDER BY method ASC NULLS FIRST, c_custkey ASC NULLS FIRST""".stripMargin,

    // The Morton ladder is five exact integer ops per dimension —
    // identical bit arithmetic in both engines.
    "q107_zorder" -> {
      import graft.util.ZOrder
      val z = ZOrder.Sql.morton("x", "y")
      s"""WITH d AS (
         |  SELECT o_custkey % 65536 AS x,
         |    DATEDIFF('day', DATE '1970-01-01', CAST(o_orderdate AS DATE))
         |      % 65536 AS y
         |  FROM orders)
         |SELECT ($z >> 16) AS z_bucket, COUNT(*) AS n_rows,
         |  MIN(x) AS min_cust, MAX(x) AS max_cust,
         |  MIN(y) AS min_day, MAX(y) AS max_day
         |FROM d GROUP BY 1
         |ORDER BY z_bucket ASC NULLS FIRST""".stripMargin
    },

    // Adjacent-pair generation: Spark sequence(0, n-2) over 1-based
    // element_at ≡ DuckDB range(1, len) over 1-based list index.
    "q105_top_bigrams" ->
      """WITH b AS (
        |  SELECT lang, UNNEST(list_transform(range(1, len(ws)),
        |    i -> ws[i] || ' ' || ws[i+1])) AS bigram
        |  FROM (SELECT lang, string_split(text, ' ') AS ws FROM documents)
        |  WHERE len(ws) >= 2),
        |c AS (SELECT lang, bigram, COUNT(*) AS n FROM b GROUP BY 1, 2),
        |r AS (SELECT lang, bigram, n,
        |  ROW_NUMBER() OVER (PARTITION BY lang
        |    ORDER BY n DESC NULLS LAST, bigram ASC NULLS FIRST) AS rank
        |  FROM c)
        |SELECT lang, rank, bigram, n FROM r WHERE rank <= 5
        |ORDER BY lang ASC NULLS FIRST, rank ASC NULLS FIRST""".stripMargin,

    // Missing pivot cells coalesce to zero on both sides.
    "q103_pivot_multi" ->
      s"""SELECT user_id,
         |  CAST(COUNT(CASE WHEN event_type = 'view' THEN 1 END) AS BIGINT)
         |    AS view_n,
         |  COALESCE(CAST(SUM(CASE WHEN event_type = 'view'
         |    THEN CAST(FLOOR(value * 100.0 + 0.5) AS BIGINT) END)
         |    AS DOUBLE) / 100.0, 0.0) AS view_value,
         |  CAST(COUNT(CASE WHEN event_type = 'purchase' THEN 1 END) AS BIGINT)
         |    AS purchase_n,
         |  COALESCE(CAST(SUM(CASE WHEN event_type = 'purchase'
         |    THEN CAST(FLOOR(value * 100.0 + 0.5) AS BIGINT) END)
         |    AS DOUBLE) / 100.0, 0.0) AS purchase_value
         |FROM events GROUP BY user_id
         |ORDER BY user_id ASC NULLS FIRST""".stripMargin,

    // NULL FKs are orphans in both engines (null never equals a key).
    "q98_ri_audit" -> {
      def e(name: String, child: String, fk: String,
          parent: String, pk: String) =
        s"""SELECT '$name' AS fk_edge,
           |  (SELECT COUNT(*) FROM $child) AS n_child,
           |  (SELECT COUNT(*) FROM $child c WHERE NOT EXISTS
           |    (SELECT 1 FROM $parent p WHERE p.$pk = c.$fk)) AS n_orphans""".stripMargin
      Seq(
        e("customer->nation", "customer", "c_nationkey", "nation", "n_nationkey"),
        e("lineitem->orders", "lineitem", "l_orderkey", "orders", "o_orderkey"),
        e("lineitem->part", "lineitem", "l_partkey", "part", "p_partkey"),
        e("lineitem->supplier", "lineitem", "l_suppkey", "supplier", "s_suppkey"),
        e("nation->region", "nation", "n_regionkey", "region", "r_regionkey"),
        e("orders->customer", "orders", "o_custkey", "customer", "c_custkey"),
        e("supplier->nation", "supplier", "s_nationkey", "nation", "n_nationkey"))
        .mkString("", "\nUNION ALL\n", "\nORDER BY fk_edge ASC NULLS FIRST")
    },

    // Exact integer-µs gaps until the final division; median/percentile
    // interpolate identically on integers (the q15-proven path).
    "q99_time_to_convert" ->
      """WITH f AS (
        |  SELECT user_id,
        |    MIN(CASE WHEN event_type = 'view' THEN ts END) AS first_view,
        |    MIN(CASE WHEN event_type = 'purchase' THEN ts END)
        |      AS first_purchase
        |  FROM events WHERE event_type IN ('view', 'purchase')
        |  GROUP BY 1),
        |g AS (
        |  SELECT CAST(first_view AS DATE) AS cohort_day,
        |    CASE WHEN first_purchase >= first_view
        |      THEN epoch_us(first_purchase) - epoch_us(first_view)
        |    END AS gap_us
        |  FROM f WHERE first_view IS NOT NULL)
        |SELECT cohort_day, COUNT(*) AS n_users,
        |  COUNT(gap_us) AS n_converted,
        |  median(gap_us) / 1000000.0 AS median_s,
        |  quantile_cont(gap_us, 0.9) / 1000000.0 AS p90_s
        |FROM g GROUP BY 1
        |ORDER BY cohort_day ASC NULLS FIRST""".stripMargin,

    // The custom TopKPerKey physical operator must emit exactly what
    // the plain ROW_NUMBER form does.
    "q100_topk_per_group" ->
      """SELECT p_brand, p_partkey, p_name, p_retailprice,
        |  CAST(rank AS BIGINT) AS rank
        |FROM (
        |  SELECT p_brand, p_partkey, p_name, p_retailprice,
        |    ROW_NUMBER() OVER (PARTITION BY p_brand
        |      ORDER BY p_retailprice DESC NULLS LAST, p_partkey ASC
        |        NULLS FIRST) AS rank
        |  FROM part)
        |WHERE rank <= 3
        |ORDER BY p_brand ASC NULLS FIRST, rank ASC NULLS FIRST""".stripMargin,

    // Regenerates the synthetic media payloads (md5 chains) as hex
    // strings; Spark's binary ops land on the same values via
    // lower(hex(bytes)). First 2 bytes == first 4 hex chars.
    "q97_media_meta" -> {
      val hexstr = (0 until 32)
        .map(i => s"md5(id || ':$i')").mkString("concat(", ", ", ")")
      s"""WITH m AS (
         |  SELECT id,
         |    (['image', 'audio', 'video'])[CAST(id % 3 AS INT) + 1] AS kind,
         |    $hexstr AS hexstr
         |  FROM range(500) t(id))
         |SELECT kind, COUNT(*) AS n_media,
         |  CAST(SUM(len(hexstr) // 2) AS BIGINT) AS total_bytes,
         |  COUNT(DISTINCT substring(hexstr, 1, 4)) AS n_prefixes,
         |  MIN(md5(hexstr)) AS min_fp,
         |  MAX(md5(hexstr)) AS max_fp
         |FROM m GROUP BY kind ORDER BY kind ASC NULLS FIRST""".stripMargin
    },

    // q156: rebuilds the same header bytes as a hex string (PNG chunk /
    // JPEG marker layout, dims derived from the id) and parses the
    // dimensions back out with computed-offset substring arithmetic —
    // reading APP0's length and the optional COM segment from the
    // STRING exactly as the JVM walker reads them from the bytes.
    "q156_media_header_dims" ->
      s"""WITH $mediaDimsCtes
         |SELECT media_id, kind, n_bytes, width, height
         |FROM dims ORDER BY media_id NULLS FIRST""".stripMargin,

    // Replays the same two 64-hash sketches and the same integer
    // estimators; exact counts ride along. Single row — no ORDER BY.
    "q96_kmv_setops" -> {
      val est = (n: String, kth: String) =>
        s"CAST(CASE WHEN $n < 64 THEN $n ELSE " +
          s"(63 * 4294967296) // GREATEST($kth, 1) END AS BIGINT)"
      s"""WITH a AS (SELECT DISTINCT ${h32("CAST(user_id AS VARCHAR)")} AS hv
         |  FROM events WHERE event_type = 'view'),
         |b AS (SELECT DISTINCT ${h32("CAST(user_id AS VARCHAR)")} AS hv
         |  FROM events WHERE event_type = 'purchase'),
         |ska AS (SELECT hv FROM a ORDER BY hv LIMIT 64),
         |skb AS (SELECT hv FROM b ORDER BY hv LIMIT 64),
         |sku AS (SELECT hv FROM (SELECT hv FROM ska UNION
         |  SELECT hv FROM skb) ORDER BY hv LIMIT 64),
         |raw AS (SELECT
         |  (SELECT COUNT(*) FROM a) AS nda,
         |  (SELECT COUNT(*) FROM b) AS ndb,
         |  (SELECT COUNT(*) FROM (SELECT hv FROM a UNION SELECT hv FROM b))
         |    AS ndu,
         |  (SELECT COUNT(*) FROM a JOIN b USING (hv)) AS ndi,
         |  (SELECT MAX(hv) FROM ska) AS ka_kth,
         |  (SELECT COUNT(*) FROM ska) AS ka_n,
         |  (SELECT MAX(hv) FROM skb) AS kb_kth,
         |  (SELECT COUNT(*) FROM skb) AS kb_n,
         |  (SELECT MAX(hv) FROM sku) AS ku_kth,
         |  (SELECT COUNT(*) FROM sku) AS ku_n,
         |  (SELECT COUNT(*) FROM sku WHERE hv IN (SELECT hv FROM ska)
         |     AND hv IN (SELECT hv FROM skb)) AS shared),
         |l1 AS (SELECT CAST(nda AS BIGINT) AS exact_view,
         |  ${est("ka_n", "ka_kth")} AS est_view,
         |  CAST(ndb AS BIGINT) AS exact_purchase,
         |  ${est("kb_n", "kb_kth")} AS est_purchase,
         |  CAST(ndu AS BIGINT) AS exact_union,
         |  ${est("ku_n", "ku_kth")} AS est_union,
         |  CAST(ndi AS BIGINT) AS exact_intersection,
         |  CAST(shared AS BIGINT) AS n_shared, ku_n FROM raw)
         |SELECT exact_view, est_view, exact_purchase, est_purchase,
         |  exact_union, est_union, exact_intersection,
         |  CAST((n_shared * est_union) // ku_n AS BIGINT)
         |    AS est_intersection,
         |  CAST(CAST(FLOOR(CAST(n_shared AS DOUBLE) / ku_n * 1000000.0
         |    + 0.5) AS BIGINT) AS DOUBLE) / 1000000.0 AS jaccard_est
         |FROM l1""".stripMargin
    },

    // Frames pinned explicitly: last_value's default frame stops at
    // CURRENT ROW in both engines — the full-frame form is spelled out.
    "q95_window_nav" ->
      """SELECT user_id, ts, event_id, value,
        |  lag(value, 1, -1.0) OVER (PARTITION BY user_id
        |    ORDER BY ts ASC, event_id ASC) AS prev_value,
        |  lead(value, 1, -1.0) OVER (PARTITION BY user_id
        |    ORDER BY ts ASC, event_id ASC) AS next_value,
        |  first_value(value) OVER (PARTITION BY user_id
        |    ORDER BY ts ASC, event_id ASC
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |    AS first_value,
        |  nth_value(value, 2) OVER (PARTITION BY user_id
        |    ORDER BY ts ASC, event_id ASC
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |    AS second_value,
        |  last_value(value) OVER (PARTITION BY user_id
        |    ORDER BY ts ASC, event_id ASC
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
        |    AS final_value
        |FROM events WHERE user_id < 50
        |ORDER BY user_id ASC NULLS FIRST, ts ASC NULLS FIRST,
        |  event_id ASC NULLS FIRST""".stripMargin,

    "q91_full_outer" ->
      """WITH v AS (SELECT user_id, CAST(ts AS DATE) AS day,
        |    COUNT(*) AS n_views
        |  FROM events WHERE event_type = 'view' GROUP BY 1, 2),
        |p AS (SELECT user_id, CAST(ts AS DATE) AS day,
        |    COUNT(*) AS n_purchases
        |  FROM events WHERE event_type = 'purchase' GROUP BY 1, 2)
        |SELECT COALESCE(v.user_id, p.user_id) AS user_id,
        |  COALESCE(v.day, p.day) AS day,
        |  COALESCE(v.n_views, 0) AS n_views,
        |  COALESCE(p.n_purchases, 0) AS n_purchases,
        |  CASE WHEN v.user_id IS NULL THEN 'purchase_only'
        |       WHEN p.user_id IS NULL THEN 'view_only'
        |       ELSE 'both' END AS presence
        |FROM v FULL OUTER JOIN p
        |  ON v.user_id = p.user_id AND v.day = p.day
        |ORDER BY user_id ASC NULLS FIRST, day ASC NULLS FIRST""".stripMargin,

    // Correlated scalar + EXISTS; both engines decorrelate to joins.
    // acctbal flows through raw (comparisons only — no arithmetic).
    "q92_correlated" ->
      """SELECT c_custkey, c_acctbal,
        |  (SELECT MAX(c2.c_acctbal) FROM customer c2
        |   WHERE c2.c_nationkey = c.c_nationkey) AS nation_max
        |FROM customer c
        |WHERE c_acctbal > 9000.0
        |  AND EXISTS (SELECT 1 FROM orders o
        |              WHERE o.o_custkey = c.c_custkey)
        |ORDER BY c_custkey ASC NULLS FIRST""".stripMargin,

    // Spark sequence(0, n-1, 40) ≡ DuckDB range(0, n, 40) for n ≥ 1
    // (split always yields ≥1 token); slice ends clamp identically.
    "q93_chunk_docs" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS ws
        |  FROM documents),
        |o AS (SELECT doc_id, ws,
        |  UNNEST(range(0, GREATEST(len(ws), 1), 40)) AS off FROM t)
        |SELECT doc_id, CAST(off // 40 AS BIGINT) AS chunk_idx,
        |  CAST(LEAST(50, len(ws) - off) AS BIGINT) AS n_tokens,
        |  array_to_string(list_slice(ws, off + 1, off + 50), ' ')
        |    AS chunk_text
        |FROM o
        |ORDER BY doc_id ASC NULLS FIRST, chunk_idx ASC NULLS FIRST""".stripMargin,

    // Spark dayofweek is 1-based from Sunday; DuckDB 0-based (+1 here).
    // Month-add clamps to month-end identically in both engines.
    "q89_date_funcs" ->
      """WITH d AS (SELECT DISTINCT CAST(o_orderdate AS DATE) AS d FROM orders)
        |SELECT d, quarter(d) AS qtr, dayofweek(d) + 1 AS dow,
        |  dayofyear(d) AS doy, weekofyear(d) AS iso_week,
        |  last_day(d) AS month_end,
        |  CAST(d + INTERVAL 1 MONTH AS DATE) AS next_month,
        |  CAST(date_trunc('month', d) AS DATE) AS month_start,
        |  d + 7 AS plus_week
        |FROM d ORDER BY d ASC NULLS FIRST""".stripMargin,

    "q90_cond_bitwise" ->
      s"""SELECT l_returnflag,
         |  ${sum2("GREATEST(l_extendedprice, l_quantity * 1000.0)")} AS sum_greatest,
         |  ${sum2("LEAST(l_extendedprice, l_quantity * 1000.0)")} AS sum_least,
         |  CAST(COUNT(NULLIF(l_linestatus, 'O')) AS BIGINT) AS n_not_open,
         |  bit_and(CAST(l_linenumber AS BIGINT)) AS mask_and,
         |  bit_or(CAST(l_linenumber AS BIGINT)) AS mask_or,
         |  bit_xor(CAST(l_linenumber AS BIGINT)) AS mask_xor,
         |  MAX(CASE WHEN l_discount > 0.05 THEN l_discount ELSE 0.0 END)
         |    AS max_hi_disc
         |FROM lineitem GROUP BY l_returnflag
         |ORDER BY l_returnflag ASC NULLS FIRST""".stripMargin,

    // AvailableNow drains the bounded input, so the stream-stream join
    // must equal the batch range self-join.
    "q88_streaming_join" ->
      """SELECT p.user_id, p.ts AS purchase_ts, v.ts AS view_ts
        |FROM events p JOIN events v
        |  ON p.event_type = 'purchase' AND v.event_type = 'view'
        |  AND p.user_id = v.user_id
        |  AND v.ts >= p.ts - INTERVAL 1 HOUR AND v.ts <= p.ts
        |ORDER BY p.user_id ASC NULLS FIRST, purchase_ts ASC NULLS FIRST,
        |  view_ts ASC NULLS FIRST""".stripMargin,

    // the sentinel row advances the drain's watermark past all real
    // data, so every purchase resolves (matches or one null row) and
    // the oracle is the plain batch left range join
    "q152_streaming_left_outer_join" ->
      """SELECT p.user_id, p.ts AS purchase_ts, v.ts AS view_ts
        |FROM (SELECT user_id, ts FROM events
        |      WHERE event_type = 'purchase') p
        |LEFT JOIN (SELECT user_id, ts FROM events
        |      WHERE event_type = 'view') v
        |  ON p.user_id = v.user_id
        |  AND v.ts >= p.ts - INTERVAL 1 HOUR AND v.ts <= p.ts
        |ORDER BY p.user_id ASC NULLS FIRST, purchase_ts ASC NULLS FIRST,
        |  view_ts ASC NULLS FIRST""".stripMargin,

    // q153 reads the PERSISTED cid-bucketed IVF index instead of
    // assigning live; the assignment is deterministic, so the verdict
    // contract — and therefore the oracle — is exactly q141's. The
    // oracle has no idea the index exists, which is the point: storage
    // layout must never change results.
    "q153_embedding_dedup_indexed" ->
      s"""WITH RECURSIVE e AS (SELECT vec_id, embedding FROM embeddings),
         |c AS (SELECT vec_id AS cid, embedding AS cv FROM e WHERE vec_id < 16),
         |ac AS (
         |  SELECT e.vec_id, e.embedding, c.cid,
         |    ${cosCols("e.embedding", "c.cv")} AS ccos
         |  FROM e CROSS JOIN c),
         |assign AS (
         |  SELECT vec_id, embedding, cid FROM (
         |    SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id
         |      ORDER BY ccos DESC NULLS LAST, cid NULLS FIRST) AS rn
         |    FROM ac) WHERE rn <= 4),
         |p AS (
         |  SELECT a.vec_id AS ida, b.vec_id AS idb,
         |    ${cosCols("a.embedding", "b.embedding")} AS cos
         |  FROM assign a JOIN assign b
         |    ON a.cid = b.cid AND a.vec_id < b.vec_id),
         |pairs AS (SELECT DISTINCT ida, idb FROM p WHERE cos >= 0.4),
         |edges AS (SELECT ida AS s, idb AS d FROM pairs
         |  UNION SELECT idb, ida FROM pairs),
         |reach(id, r) AS (
         |  SELECT s, d FROM edges
         |  UNION
         |  SELECT w.id, e2.d FROM reach w JOIN edges e2 ON w.r = e2.s),
         |comp AS (SELECT id, LEAST(id, MIN(r)) AS component
         |  FROM reach GROUP BY id)
         |SELECT v.vec_id,
         |  COALESCE(c2.component, v.vec_id) AS component,
         |  COUNT(*) OVER (PARTITION BY COALESCE(c2.component, v.vec_id))
         |    AS cluster_size,
         |  v.vec_id = COALESCE(c2.component, v.vec_id) AS is_canonical
         |FROM e v LEFT JOIN comp c2 ON v.vec_id = c2.id
         |ORDER BY v.vec_id NULLS FIRST""".stripMargin,

    // q158: the Spark side answers INCREMENTALLY (staged prev index +
    // broadcast delta probe + affected-cluster-only closure); the
    // oracle recomputes the FULL chain over all vectors against the
    // index's FROZEN centroids (the prev corpus's first-K — vec_id < 16
    // AND vec_id % 6 <> 0). Hash match proves incremental ≡ full.
    "q158_embedding_dedup_incremental" ->
      s"""WITH RECURSIVE e AS (SELECT vec_id, embedding FROM embeddings),
         |c AS (SELECT vec_id AS cid, embedding AS cv FROM e
         |  WHERE vec_id < 16 AND vec_id % 6 <> 0),
         |ac AS (
         |  SELECT e.vec_id, e.embedding, c.cid,
         |    ${cosCols("e.embedding", "c.cv")} AS ccos
         |  FROM e CROSS JOIN c),
         |assign AS (
         |  SELECT vec_id, embedding, cid FROM (
         |    SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id
         |      ORDER BY ccos DESC NULLS LAST, cid NULLS FIRST) AS rn
         |    FROM ac) WHERE rn <= 4),
         |p AS (
         |  SELECT a.vec_id AS ida, b.vec_id AS idb,
         |    ${cosCols("a.embedding", "b.embedding")} AS cos
         |  FROM assign a JOIN assign b
         |    ON a.cid = b.cid AND a.vec_id < b.vec_id),
         |pairs AS (SELECT DISTINCT ida, idb FROM p WHERE cos >= 0.4),
         |edges AS (SELECT ida AS s, idb AS d FROM pairs
         |  UNION SELECT idb, ida FROM pairs),
         |reach(id, r) AS (
         |  SELECT s, d FROM edges
         |  UNION
         |  SELECT w.id, e2.d FROM reach w JOIN edges e2 ON w.r = e2.s),
         |comp AS (SELECT id, LEAST(id, MIN(r)) AS component
         |  FROM reach GROUP BY id)
         |SELECT v.vec_id,
         |  COALESCE(c2.component, v.vec_id) AS component,
         |  COUNT(*) OVER (PARTITION BY COALESCE(c2.component, v.vec_id))
         |    AS cluster_size,
         |  v.vec_id = COALESCE(c2.component, v.vec_id) AS is_canonical,
         |  CASE WHEN v.vec_id % 6 = 0 THEN 'appended' ELSE 'indexed' END
         |    AS status
         |FROM e v LEFT JOIN comp c2 ON v.vec_id = c2.id
         |ORDER BY v.vec_id NULLS FIRST""".stripMargin,

    // q155 swaps the centroid source: the kmeans trainer's two Lloyd
    // rounds at K=16 (the exact q76 loop, shared CTE builders) feed the
    // multi-probe assignment; candidates/closure/verdict are q141's.
    // The oracle replays training (integer-sum updates → bit-identical
    // centroids), then the same cosine probe and CC closure.
    "q155_embedding_dedup_trained" ->
      s"""WITH RECURSIVE ${kmTrainCtes(16, 64, "t")},
         |e AS (SELECT vec_id, embedding FROM embeddings),
         |ac AS (
         |  SELECT e.vec_id, e.embedding, tc.cid,
         |    ${cosCols("e.embedding", "tc.c")} AS ccos
         |  FROM e CROSS JOIN tc2 tc),
         |assign AS (
         |  SELECT vec_id, embedding, cid FROM (
         |    SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id
         |      ORDER BY ccos DESC NULLS LAST, cid NULLS FIRST) AS rn
         |    FROM ac) WHERE rn <= 4),
         |p AS (
         |  SELECT a.vec_id AS ida, b.vec_id AS idb,
         |    ${cosCols("a.embedding", "b.embedding")} AS cos
         |  FROM assign a JOIN assign b
         |    ON a.cid = b.cid AND a.vec_id < b.vec_id),
         |pairs AS (SELECT DISTINCT ida, idb FROM p WHERE cos >= 0.4),
         |edges AS (SELECT ida AS s, idb AS d FROM pairs
         |  UNION SELECT idb, ida FROM pairs),
         |reach(id, r) AS (
         |  SELECT s, d FROM edges
         |  UNION
         |  SELECT w.id, e2.d FROM reach w JOIN edges e2 ON w.r = e2.s),
         |comp AS (SELECT id, LEAST(id, MIN(r)) AS component
         |  FROM reach GROUP BY id)
         |SELECT v.vec_id,
         |  COALESCE(c2.component, v.vec_id) AS component,
         |  COUNT(*) OVER (PARTITION BY COALESCE(c2.component, v.vec_id))
         |    AS cluster_size,
         |  v.vec_id = COALESCE(c2.component, v.vec_id) AS is_canonical
         |FROM e v LEFT JOIN comp c2 ON v.vec_id = c2.id
         |ORDER BY v.vec_id NULLS FIRST""".stripMargin,

    // Our native jaro_winkler expression is pinned bit-exact to
    // DuckDB's jaro_winkler_similarity; both sides cut on the
    // val6-rounded score so the threshold can't flip on a boundary.
    "q87_jaro_winkler" -> {
      val jw = val6("jaro_winkler_similarity(a.p_name, b.p_name)")
      s"""WITH names AS (SELECT DISTINCT p_brand, p_name FROM part)
         |SELECT a.p_brand, a.p_name AS name_a, b.p_name AS name_b,
         |  $jw AS jw
         |FROM names a JOIN names b
         |  ON a.p_brand = b.p_brand AND a.p_name < b.p_name
         |WHERE $jw >= 0.9
         |ORDER BY a.p_brand ASC NULLS FIRST, name_a ASC NULLS FIRST,
         |  name_b ASC NULLS FIRST""".stripMargin
    },

    // Array sweep emitted as scalars (csv/counts/flags) — exercises the
    // list pipeline without parquet list-hashing concerns.
    "q86_array_funcs" ->
      """WITH t AS (
        |  SELECT user_id, list_sort(list(DISTINCT event_type)) AS types
        |  FROM events WHERE event_type IS NOT NULL GROUP BY 1)
        |SELECT user_id, array_to_string(types, ',') AS types_csv,
        |  CAST(len(types) AS BIGINT) AS n_types,
        |  types[1] AS first_type,
        |  list_contains(types, 'purchase') AS has_purchase
        |FROM t ORDER BY user_id ASC NULLS FIRST""".stripMargin,

    // Rolling 7-day distinct users: the oracle materializes the same
    // contribution fan-out (pair visible in 7 window-end days) — the
    // only scalable form of sliding-window COUNT(DISTINCT).
    "q109_rolling_distinct" ->
      """WITH pairs AS (
        |  SELECT DISTINCT CAST(ts AS DATE) AS d, user_id FROM events),
        |days AS (SELECT DISTINCT d AS day FROM pairs),
        |contrib AS (
        |  SELECT p.d, p.user_id, p.d + CAST(i.i AS INT) AS day
        |  FROM pairs p CROSS JOIN (SELECT unnest(range(0, 7)) AS i) i)
        |SELECT c.day, COUNT(DISTINCT c.user_id) AS wau,
        |  COUNT(DISTINCT CASE WHEN c.day = c.d THEN c.user_id END) AS dau
        |FROM contrib c JOIN days USING (day)
        |GROUP BY c.day ORDER BY day NULLS FIRST""".stripMargin,

    // Entropy via H = ln N − (Σ c·ln c)/N: one ln per distinct term,
    // floor-scaled to integer millionths before the (exact, BIGINT)
    // cross-row sum — float ops happen in identical order in both
    // engines regardless of parallelism.
    "q110_token_entropy" ->
      s"""WITH t AS (SELECT lang, unnest(string_split(text, ' ')) AS tok
         |  FROM documents),
         |c AS (SELECT lang, tok, COUNT(*) AS c FROM t GROUP BY 1, 2),
         |g AS (SELECT lang, CAST(SUM(c) AS BIGINT) AS n_tokens,
         |  COUNT(*) AS n_types,
         |  CAST(SUM(CAST(FLOOR(CAST(c AS DOUBLE) * ln(CAST(c AS DOUBLE))
         |    * 1000000.0 + 0.5) AS BIGINT)) AS BIGINT) AS s_clnc
         |  FROM c GROUP BY lang)
         |SELECT lang, n_tokens, n_types,
         |  ${val6("(ln(CAST(n_tokens AS DOUBLE)) - " +
           "(CAST(s_clnc AS DOUBLE) / 1000000.0) / CAST(n_tokens AS DOUBLE))")}
         |    AS entropy_nats
         |FROM g ORDER BY lang NULLS FIRST""".stripMargin,

    // PageRank unrolled: ranks are BIGINT trillionths, every iteration
    // pure integer arithmetic (// division, * , +) — bit-identical in
    // both engines with zero float-order hazard.
    "q111_brand_pagerank" -> {
      def iter(prev: String, cur: String) =
        s"""$cur AS (
           |  SELECT nd.brand, tele.t + (85 * COALESCE(c.inflow, 0)) // 100
           |    AS rank_i
           |  FROM nodes nd
           |  CROSS JOIN (SELECT (1000000000000 * 15 // 100) // n AS t
           |              FROM nn) tele
           |  LEFT JOIN (
           |    SELECT e.dst AS brand,
           |      CAST(SUM(r.rank_i // e.outdeg) AS BIGINT) AS inflow
           |    FROM e JOIN $prev r ON r.brand = e.src
           |    GROUP BY e.dst) c ON c.brand = nd.brand)""".stripMargin
      s"""WITH nodes AS (SELECT DISTINCT p_brand AS brand FROM part),
         |nn AS (SELECT COUNT(*) AS n FROM nodes),
         |bo AS (SELECT DISTINCT l_orderkey AS okey, p_brand AS brand
         |       FROM lineitem JOIN part ON l_partkey = p_partkey),
         |edges AS (SELECT DISTINCT a.brand AS src, b.brand AS dst
         |          FROM bo a JOIN bo b
         |          ON a.okey = b.okey AND a.brand <> b.brand),
         |degs AS (SELECT src, COUNT(*) AS outdeg FROM edges GROUP BY src),
         |e AS (SELECT edges.src, edges.dst, degs.outdeg
         |      FROM edges JOIN degs USING (src)),
         |r0 AS (SELECT brand, 1000000000000 // n AS rank_i FROM nodes, nn),
         |${iter("r0", "r1")},
         |${iter("r1", "r2")},
         |${iter("r2", "r3")}
         |SELECT brand, rank_i,
         |  CAST(rank_i AS DOUBLE) / 1000000000000.0 AS rank
         |FROM r3
         |ORDER BY rank_i DESC NULLS LAST, brand ASC NULLS FIRST""".stripMargin
    },

    // HOF sweep: the oracle's total_token_chars uses the split identity
    // len(text) = Σ len(tok) + (count-1) — same value as Spark's
    // aggregate() fold, no list_reduce dependency.
    "q112_hof_sweep" ->
      """SELECT doc_id,
        |  CAST(len(list_filter(ws, t -> len(t) > 5)) AS BIGINT)
        |    AS n_long_tokens,
        |  array_to_string(list_transform(ws[1:3], t -> upper(t)), '_')
        |    AS head3_upper,
        |  CAST(len(text) - (len(ws) - 1) AS BIGINT) AS total_token_chars,
        |  len(list_filter(ws, t -> t = 'the')) > 0 AS has_the,
        |  len(list_filter(ws, t -> len(t) = 0)) = 0 AS all_nonempty,
        |  CAST(list_max(list_transform(ws, t -> len(t))) AS BIGINT)
        |    AS longest_token
        |FROM (SELECT doc_id, text, string_split(text, ' ') AS ws
        |      FROM documents WHERE doc_id < 150)
        |ORDER BY doc_id NULLS FIRST""".stripMargin,

    // Per-label centroids: element values floor-scaled to integer
    // millionths before the sum; the mean divides back once per
    // (label, pos) in the same left-assoc order as the Spark side.
    "q113_label_centroids" ->
      """SELECT CAST(label AS BIGINT) AS label,
        |  CAST(i.i - 1 AS BIGINT) AS pos, COUNT(*) AS n_vecs,
        |  CAST(CAST(SUM(CAST(FLOOR(CAST(embedding[i.i] AS DOUBLE)
        |      * 1000000.0 + 0.5) AS BIGINT)) AS BIGINT) AS DOUBLE)
        |    / 1000000.0 / CAST(COUNT(*) AS DOUBLE) AS centroid
        |FROM embeddings CROSS JOIN (SELECT unnest(range(1, 65)) AS i) i
        |GROUP BY label, i.i
        |ORDER BY label NULLS FIRST, pos NULLS FIRST""".stripMargin,

    // LATERAL with ORDER BY + LIMIT: DuckDB executes the lateral
    // directly; Spark decorrelates it to a per-key window limit.
    "q115_lateral_topk" ->
      """SELECT c.c_custkey, c.c_mktsegment, t.o_orderkey, t.top_price
        |FROM customer c
        |JOIN LATERAL (
        |  SELECT o_orderkey, o_totalprice AS top_price
        |  FROM orders o
        |  WHERE o.o_custkey = c.c_custkey
        |  ORDER BY o_totalprice DESC, o_orderkey ASC
        |  LIMIT 2) t ON TRUE
        |ORDER BY c.c_custkey NULLS FIRST, top_price DESC NULLS LAST,
        |  o_orderkey NULLS FIRST""".stripMargin,

    // Map surface emitted as scalars/JSON text; the sorted entry array
    // pins Spark's map iteration order so counts_json is canonical.
    "q116_map_funcs" ->
      """WITH c AS (
        |  SELECT user_id, event_type, COUNT(*) AS n FROM events
        |  WHERE event_type IS NOT NULL GROUP BY 1, 2)
        |SELECT user_id, COUNT(*) AS n_keys,
        |  string_agg(event_type, ',' ORDER BY event_type) AS keys_csv,
        |  CAST(SUM(n) AS BIGINT) AS total_events,
        |  CAST(COALESCE(MAX(CASE WHEN event_type = 'purchase' THEN n END), 0)
        |    AS BIGINT) AS n_purchase,
        |  '{' || string_agg('"' || event_type || '":' || n, ','
        |    ORDER BY event_type) || '}' AS counts_json
        |FROM c GROUP BY user_id ORDER BY user_id NULLS FIRST""".stripMargin,

    // JSON round trip: the oracle REBUILDS Spark's canonical to_json
    // text by string aggregation (integer fields only — float text
    // rendering is not engine-portable), then derives the aggregates
    // from the raw columns.
    "q117_json_roundtrip" ->
      """WITH it AS (
        |  SELECT l_orderkey AS order_id, l_linenumber AS ln,
        |    CAST(l_quantity AS BIGINT) AS qty
        |  FROM lineitem WHERE l_orderkey < 500)
        |SELECT order_id,
        |  '{"order_id":' || order_id || ',"items":[' ||
        |    string_agg('{"ln":' || ln || ',"qty":' || qty || '}', ','
        |      ORDER BY ln, qty) || ']}' AS doc,
        |  COUNT(*) AS n_items,
        |  CAST(SUM(qty) AS BIGINT) AS qty_sum
        |FROM it GROUP BY order_id ORDER BY order_id NULLS FIRST""".stripMargin,

    // Sketch envelope gates: the Spark side emits the exact value plus
    // within-bound booleans; the oracle recomputes the exact value and
    // asserts the verdicts TRUE, so an estimator drifting out of its
    // published error bound fails the hash gate.
    "q118_hll_distinct" ->
      """SELECT event_type, COUNT(DISTINCT user_id) AS n_exact,
        |  TRUE AS direct_within_5pct, TRUE AS merged_within_5pct
        |FROM events GROUP BY event_type
        |ORDER BY event_type NULLS FIRST""".stripMargin,

    "q119_approx_quantiles" ->
      """SELECT l_returnflag, COUNT(*) AS n,
        |  TRUE AS p50_within_1pct, TRUE AS p99_within_1pct
        |FROM lineitem GROUP BY l_returnflag
        |ORDER BY l_returnflag NULLS FIRST""".stripMargin,

    // DPP query: the oracle is the plain predicate form — partition
    // pruning must not change results, only the partitions scanned.
    "q114_dpp_revenue" ->
      s"""SELECT strftime(l_shipdate, '%Y-%m') AS ship_month,
         |  ${sum4(netExpr)} AS revenue,
         |  COUNT(*) AS n_items
         |FROM lineitem
         |WHERE year(l_shipdate) = 1996 AND quarter(l_shipdate) = 1
         |GROUP BY 1 ORDER BY 1 NULLS FIRST""".stripMargin,

    "q120_streaks" ->
      """WITH days AS (
        |  SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events),
        |anch AS (
        |  SELECT user_id, d,
        |    d - CAST(ROW_NUMBER() OVER (
        |      PARTITION BY user_id ORDER BY d NULLS FIRST) AS INT) AS anchor
        |  FROM days),
        |runs AS (
        |  SELECT user_id, anchor, COUNT(*) AS len, MIN(d) AS run_start
        |  FROM anch GROUP BY user_id, anchor)
        |SELECT user_id, MAX(len) AS max_streak, COUNT(*) AS n_streaks,
        |  MIN(run_start) AS first_active
        |FROM runs GROUP BY user_id ORDER BY user_id NULLS FIRST""".stripMargin,

    // BFS over the basket co-occurrence graph, recursive-CTE form on
    // BOTH engines; bounded at 3 hops with MIN(hop) folding the walk
    // multiplicity back to exact distances.
    "q121_brand_reach" ->
      """WITH RECURSIVE ob AS (
        |  SELECT DISTINCT l_orderkey, p_brand
        |  FROM lineitem JOIN part ON l_partkey = p_partkey),
        |edges AS (
        |  SELECT DISTINCT a.p_brand AS src, b.p_brand AS dst
        |  FROM ob a JOIN ob b
        |    ON a.l_orderkey = b.l_orderkey AND a.p_brand <> b.p_brand),
        |origin AS (SELECT MIN(p_brand) AS o FROM part),
        |walk(brand, hop) AS (
        |  SELECT o, 0 FROM origin
        |  UNION ALL
        |  SELECT e.dst, w.hop + 1
        |  FROM walk w JOIN edges e ON e.src = w.brand
        |  WHERE w.hop < 3)
        |SELECT brand, MIN(hop) AS hops, CAST(COUNT(*) AS BIGINT) AS n_paths
        |FROM walk GROUP BY brand
        |ORDER BY hops NULLS FIRST, brand NULLS FIRST""".stripMargin,

    "q122_activity_bitmap" ->
      """WITH b AS (
        |  SELECT user_id,
        |    bit_or(1::BIGINT <<
        |      (CAST(CAST(ts AS DATE) - DATE '1995-01-01' AS INT) % 64))
        |      AS bitmap
        |  FROM events GROUP BY user_id)
        |SELECT user_id, bitmap, CAST(bit_count(bitmap) AS INT) AS active_slots
        |FROM b ORDER BY user_id NULLS FIRST""".stripMargin,

    "q123_markov_transitions" ->
      s"""WITH seq AS (
         |  SELECT user_id, event_type, lead(event_type) OVER (
         |    PARTITION BY user_id
         |    ORDER BY ts NULLS FIRST, event_id NULLS FIRST) AS next_type
         |  FROM events),
         |c AS (
         |  SELECT event_type AS from_type, next_type AS to_type,
         |    COUNT(*) AS n
         |  FROM seq WHERE next_type IS NOT NULL GROUP BY 1, 2)
         |SELECT from_type, to_type, n,
         |  ${val4("CAST(n AS DOUBLE) / SUM(n) OVER (PARTITION BY from_type)")} AS p
         |FROM c ORDER BY from_type NULLS FIRST, to_type NULLS FIRST""".stripMargin,

    // The oracle states the SEMANTICS (quadratic NOT EXISTS dominance);
    // the engine runs the O(n log n) running-max frontier form.
    "q124_skyline" ->
      """SELECT p_partkey, p_brand, p_retailprice, p_size FROM part p
        |WHERE NOT EXISTS (
        |  SELECT 1 FROM part q
        |  WHERE q.p_retailprice <= p.p_retailprice
        |    AND q.p_size >= p.p_size
        |    AND (q.p_retailprice < p.p_retailprice OR q.p_size > p.p_size))
        |ORDER BY p_retailprice NULLS FIRST, p_partkey NULLS FIRST""".stripMargin,

    // Bucketed-layout join: results must equal the plain-table join —
    // the layout only removes the exchanges.
    "q125_bucketed_join" ->
      s"""SELECT o_orderpriority,
         |  ${sum4(netExpr)} AS revenue,
         |  COUNT(*) AS n_items
         |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         |GROUP BY o_orderpriority ORDER BY o_orderpriority NULLS FIRST""".stripMargin,

    // transformWithState drain: the last per-key snapshot equals the
    // batch aggregate (state folds exact integer cents).
    "q126_streaming_tws_stats" ->
      s"""SELECT user_id, COUNT(*) AS n_events,
         |  ${sum2("value")} AS total_value,
         |  CAST(MAX(CASE event_type WHEN 'signup' THEN 1 WHEN 'view' THEN 2
         |    WHEN 'click' THEN 3 WHEN 'purchase' THEN 4 ELSE 0 END) AS INT)
         |    AS max_stage
         |FROM events GROUP BY user_id ORDER BY user_id NULLS FIRST""".stripMargin,

    // Inverted-index cosine: integer tf dot products; cosine is three
    // correctly-rounded IEEE ops on exact integers, then floor-scaled.
    "q127_cosine_tf_pairs" ->
      s"""WITH tf AS (
         |  SELECT doc_id, term, COUNT(*) AS tf FROM (
         |    SELECT doc_id, unnest(string_split(text, ' ')) AS term
         |    FROM documents WHERE doc_id < 60)
         |  GROUP BY doc_id, term),
         |norms AS (SELECT doc_id, SUM(tf * tf) AS q FROM tf GROUP BY doc_id),
         |pairs AS (
         |  SELECT a.doc_id AS ida, b.doc_id AS idb,
         |    CAST(SUM(a.tf * b.tf) AS BIGINT) AS dot
         |  FROM tf a JOIN tf b ON a.term = b.term AND a.doc_id < b.doc_id
         |  GROUP BY 1, 2)
         |SELECT ida, idb, dot,
         |  ${val6("dot / (sqrt(CAST(na.q AS DOUBLE)) * sqrt(CAST(nb.q AS DOUBLE)))")}
         |    AS cos_sim
         |FROM pairs
         |JOIN norms na ON na.doc_id = ida
         |JOIN norms nb ON nb.doc_id = idb
         |WHERE dot >= 3
         |ORDER BY ida NULLS FIRST, idb NULLS FIRST""".stripMargin,

    "q128_cdc_apply" ->
      s"""WITH o AS (SELECT * FROM orders WHERE o_orderkey < 2000),
         |log AS (
         |  SELECT o_orderkey AS order_id, 'I' AS op, o_orderdate AS op_ts,
         |    o_totalprice AS price, o_orderstatus AS status FROM o
         |  UNION ALL
         |  SELECT o_orderkey, 'U', o_orderdate + INTERVAL 30 DAY,
         |    ${val2("o_totalprice * CAST(1.1 AS DOUBLE)")}, o_orderstatus
         |  FROM o WHERE o_orderstatus = 'F'
         |  UNION ALL
         |  SELECT o_orderkey, 'D', o_orderdate + INTERVAL 60 DAY,
         |    NULL, NULL FROM o WHERE o_custkey % 97 = 0),
         |r AS (
         |  SELECT *, ROW_NUMBER() OVER (PARTITION BY order_id
         |    ORDER BY op_ts DESC,
         |      CASE op WHEN 'D' THEN 3 WHEN 'U' THEN 2 ELSE 1 END DESC)
         |    AS rn
         |  FROM log)
         |SELECT order_id, op AS last_op, ${val2("price")} AS final_price,
         |  status
         |FROM r WHERE rn = 1 AND op <> 'D'
         |ORDER BY order_id NULLS FIRST""".stripMargin,

    "q129_recent_views" ->
      """SELECT user_id, event_id, ts, recent_views FROM (
        |  SELECT user_id, event_id, ts, event_type,
        |    CAST(COALESCE(SUM(CASE WHEN event_type = 'view' THEN 1 END) OVER (
        |      PARTITION BY user_id ORDER BY epoch_us(ts)
        |      RANGE BETWEEN 1800000000 PRECEDING AND 1 PRECEDING),
        |      0) AS BIGINT) AS recent_views
        |  FROM events)
        |WHERE event_type = 'purchase'
        |ORDER BY user_id NULLS FIRST, ts NULLS FIRST,
        |  event_id NULLS FIRST""".stripMargin,

    // SQL UDFs inline at analysis time — the oracle states the math.
    "q130_sql_udf" ->
      s"""SELECT l_returnflag,
         |  ${sum4(netExpr)} AS net_revenue,
         |  ${val4("AVG(l_quantity)")} AS avg_qty,
         |  COUNT(*) AS n
         |FROM lineitem GROUP BY l_returnflag
         |ORDER BY l_returnflag NULLS FIRST""".stripMargin,

    "q131_listagg" ->
      """SELECT r_name AS region,
        |  string_agg(n_name, ',' ORDER BY n_name) AS nations,
        |  COUNT(*) AS n_nations
        |FROM nation JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name ORDER BY r_name NULLS FIRST""".stripMargin,

    "q132_variant_props" ->
      """SELECT event_type,
        |  CAST(json_extract_string(props, '$.k') AS INT) AS k,
        |  COUNT(*) AS n
        |FROM events GROUP BY 1, 2
        |ORDER BY 1 NULLS FIRST, 2 NULLS FIRST""".stripMargin,

    "q133_try_arith" ->
      s"""WITH s AS (
         |  SELECT user_id, COUNT(*) AS n_events,
         |    CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
         |      AS BIGINT) AS n_purchases,
         |    SUM(CASE WHEN event_type = 'purchase'
         |      THEN CAST(FLOOR(value * 100.0 + 0.5) AS BIGINT)
         |      ELSE 0 END) AS cents
         |  FROM events GROUP BY user_id)
         |SELECT user_id, n_events, n_purchases,
         |  CAST(cents AS DOUBLE) / 100.0 AS purchase_value,
         |  ${val4("CASE WHEN n_purchases = 0 THEN NULL " +
             "ELSE CAST(cents AS DOUBLE) / 100.0 / n_purchases END")}
         |    AS avg_purchase
         |FROM s ORDER BY user_id NULLS FIRST""".stripMargin,

    "q134_decimal_money" ->
      s"""WITH c AS (
         |  SELECT o_orderstatus,
         |    CAST(FLOOR(o_totalprice * 100.0 + 0.5) AS BIGINT) AS cents
         |  FROM orders)
         |SELECT o_orderstatus,
         |  CAST(SUM(cents) AS DOUBLE) / 100.0 AS total_revenue,
         |  ${val4("CAST(SUM(cents) AS DOUBLE) / 100.0 / COUNT(*)")}
         |    AS avg_revenue,
         |  COUNT(*) AS n_orders
         |FROM c GROUP BY o_orderstatus
         |ORDER BY o_orderstatus NULLS FIRST""".stripMargin,

    // foreachBatch merge: the accumulated target must equal the batch
    // aggregate.
    "q135_streaming_foreachbatch" ->
      s"""SELECT event_type, COUNT(*) AS n, ${sum2("value")} AS total_value
         |FROM events GROUP BY event_type
         |ORDER BY event_type NULLS FIRST""".stripMargin,

    // Sequence packing: running token sum per source shard, pack id by
    // integer division — identical window + DIV on both engines.
    "q136_pack_sequences" ->
      """WITH d AS (SELECT source, doc_id,
        |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
        |  FROM documents)
        |SELECT source, doc_id, n_tokens,
        |  CAST(COALESCE(SUM(n_tokens) OVER (PARTITION BY source
        |    ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND
        |    1 PRECEDING), 0) AS BIGINT) AS tokens_before,
        |  CAST(COALESCE(SUM(n_tokens) OVER (PARTITION BY source
        |    ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND
        |    1 PRECEDING), 0) // 256 AS BIGINT) AS pack_id
        |FROM d ORDER BY source NULLS FIRST, doc_id NULLS FIRST""".stripMargin,

    // Pack-level summary mart: same window as q136 then a keyed agg;
    // utilization as exact integer permille on both sides.
    "q140_pack_stats" ->
      """WITH d AS (SELECT source, doc_id,
        |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
        |  FROM documents),
        |p AS (SELECT source, doc_id, n_tokens,
        |  COALESCE(SUM(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) // 256
        |    AS pack_id
        |  FROM d)
        |SELECT source, CAST(pack_id AS BIGINT) AS pack_id,
        |  COUNT(*) AS n_docs,
        |  CAST(SUM(n_tokens) AS BIGINT) AS tokens_total,
        |  CAST(SUM(n_tokens) * 1000 // 256 AS BIGINT) AS util_permille
        |FROM p GROUP BY source, pack_id
        |ORDER BY source NULLS FIRST, pack_id NULLS FIRST""".stripMargin,

    // PII redaction: both regexes live in the Java∩RE2 common dialect;
    // exactly one phone + one email per constructed row, so DuckDB's
    // first-match regexp_replace equals Spark's replace-all.
    "q137_pii_redaction" ->
      """WITH c AS (SELECT c_custkey,
        |    c_name || ' <user' || c_custkey || '@example.com> phone ' ||
        |    (c_custkey % 90 + 10) || '-' || (c_custkey % 900 + 100) || '-' ||
        |    ((c_custkey * 7) % 900 + 100) || '-' ||
        |    ((c_custkey * 13) % 9000 + 1000) ||
        |    ' segment: ' || c_mktsegment AS raw
        |  FROM customer)
        |SELECT c_custkey,
        |  regexp_replace(regexp_replace(raw,
        |    '[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}', '[EMAIL]'),
        |    '[0-9]{2}-[0-9]{3}-[0-9]{3}-[0-9]{4}', '[PHONE]') AS redacted,
        |  regexp_matches(raw, '[0-9]{2}-[0-9]{3}-[0-9]{3}-[0-9]{4}')
        |    AS had_phone,
        |  regexp_matches(raw, '[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}')
        |    AS had_email
        |FROM c ORDER BY c_custkey NULLS FIRST""".stripMargin,

    // Golden streaming funnel: the oracle reads the SAME published
    // reference CSV the Spark side streams — batch read vs streamed
    // drain must land on identical counts and exact payment cents.
    "q139_streaming_golden" ->
      """SELECT event_type AS stage,
        |  CASE event_type WHEN 'order_created' THEN 1
        |    WHEN 'order_paid' THEN 2 WHEN 'order_shipped' THEN 3
        |    WHEN 'order_delivered' THEN 4 END AS stage_rank,
        |  COUNT(*) AS n_events,
        |  CAST(SUM(CAST(FLOOR(COALESCE(payment_value, 0) * 100.0 + 0.5)
        |    AS BIGINT)) AS DOUBLE) / 100.0 AS total_payment
        |FROM read_csv('/root/reference/Data Sets/Raw Datasets/synthetic_order_lifecycle.csv')
        |GROUP BY event_type ORDER BY stage_rank""".stripMargin,

    // Embedding-cosine dedup: q36's exact pair derivation closed into
    // components with the same recursive-CTE closure as q65/q104.
    "q138_embedding_dedup" ->
      s"""WITH RECURSIVE e AS (SELECT vec_id, embedding FROM embeddings
         |  WHERE vec_id < 500),
         |p AS (
         |  SELECT a.vec_id AS ida, b.vec_id AS idb, ${cosExpr("a", "b")} AS cos
         |  FROM e a JOIN e b ON a.vec_id < b.vec_id),
         |pairs AS (SELECT ida, idb FROM p WHERE cos >= 0.4),
         |edges AS (SELECT ida AS s, idb AS d FROM pairs
         |  UNION SELECT idb, ida FROM pairs),
         |reach(id, r) AS (
         |  SELECT s, d FROM edges
         |  UNION
         |  SELECT w.id, e2.d FROM reach w JOIN edges e2 ON w.r = e2.s),
         |comp AS (SELECT id, LEAST(id, MIN(r)) AS component
         |  FROM reach GROUP BY id)
         |SELECT v.vec_id,
         |  COALESCE(c.component, v.vec_id) AS component,
         |  COUNT(*) OVER (PARTITION BY COALESCE(c.component, v.vec_id))
         |    AS cluster_size,
         |  v.vec_id = COALESCE(c.component, v.vec_id) AS is_canonical
         |FROM e v LEFT JOIN comp c ON v.vec_id = c.id
         |ORDER BY v.vec_id NULLS FIRST""".stripMargin,

    // At-scale dedup (no id cap): q50's deterministic IVF assignment
    // generates the candidate pairs (same centroids, same argmax
    // tiebreak), then the q65/q138 recursive closure — the oracle
    // replays the bucketing's recall loss exactly.
    "q141_embedding_dedup_ivf" ->
      s"""WITH RECURSIVE e AS (SELECT vec_id, embedding FROM embeddings),
         |c AS (SELECT vec_id AS cid, embedding AS cv FROM e WHERE vec_id < 16),
         |ac AS (
         |  SELECT e.vec_id, e.embedding, c.cid,
         |    ${cosCols("e.embedding", "c.cv")} AS ccos
         |  FROM e CROSS JOIN c),
         |assign AS (
         |  SELECT vec_id, embedding, cid FROM (
         |    SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id
         |      ORDER BY ccos DESC NULLS LAST, cid NULLS FIRST) AS rn
         |    FROM ac) WHERE rn <= 4),
         |p AS (
         |  SELECT a.vec_id AS ida, b.vec_id AS idb,
         |    ${cosCols("a.embedding", "b.embedding")} AS cos
         |  FROM assign a JOIN assign b
         |    ON a.cid = b.cid AND a.vec_id < b.vec_id),
         |pairs AS (SELECT DISTINCT ida, idb FROM p WHERE cos >= 0.4),
         |edges AS (SELECT ida AS s, idb AS d FROM pairs
         |  UNION SELECT idb, ida FROM pairs),
         |reach(id, r) AS (
         |  SELECT s, d FROM edges
         |  UNION
         |  SELECT w.id, e2.d FROM reach w JOIN edges e2 ON w.r = e2.s),
         |comp AS (SELECT id, LEAST(id, MIN(r)) AS component
         |  FROM reach GROUP BY id)
         |SELECT v.vec_id,
         |  COALESCE(c2.component, v.vec_id) AS component,
         |  COUNT(*) OVER (PARTITION BY COALESCE(c2.component, v.vec_id))
         |    AS cluster_size,
         |  v.vec_id = COALESCE(c2.component, v.vec_id) AS is_canonical
         |FROM e v LEFT JOIN comp c2 ON v.vec_id = c2.id
         |ORDER BY v.vec_id NULLS FIRST""".stripMargin,

    // eval membership (doc_id % 25 = 0) and the 4-gram construction are
    // both deterministic, so the oracle rebuilds the exact same
    // contamination set
    "q142_decontaminate" ->
      """WITH d AS (SELECT doc_id, string_split(text, ' ') AS w
        |  FROM documents),
        |eg AS (SELECT DISTINCT array_to_string(w[i:i+3], ' ') AS gram
        |  FROM d, UNNEST(range(1, len(w) - 2)) AS u(i)
        |  WHERE doc_id % 25 = 0 AND len(w) >= 4),
        |tg AS (SELECT DISTINCT doc_id, array_to_string(w[i:i+3], ' ') AS gram
        |  FROM d, UNNEST(range(1, len(w) - 2)) AS u(i)
        |  WHERE doc_id % 25 <> 0 AND len(w) >= 4),
        |h AS (SELECT doc_id, count(*) AS contaminated_grams
        |  FROM tg JOIN eg USING (gram) GROUP BY doc_id)
        |SELECT d.doc_id,
        |  COALESCE(h.contaminated_grams, 0) AS contaminated_grams,
        |  COALESCE(h.contaminated_grams, 0) > 0 AS is_contaminated
        |FROM d LEFT JOIN h ON d.doc_id = h.doc_id
        |WHERE d.doc_id % 25 <> 0
        |ORDER BY d.doc_id NULLS FIRST""".stripMargin,

    "q143_repetition_stats" ->
      s"""WITH d AS (SELECT doc_id, string_split(text, ' ') AS w
         |  FROM documents),
         |tg AS (SELECT doc_id, array_to_string(w[i:i+2], ' ') AS g
         |  FROM d, UNNEST(range(1, len(w) - 1)) AS u(i) WHERE len(w) >= 3),
         |tri AS (SELECT doc_id, count(*) AS tri_total,
         |  count(DISTINCT g) AS tri_distinct FROM tg GROUP BY doc_id),
         |bg AS (SELECT doc_id, array_to_string(w[i:i+1], ' ') AS g
         |  FROM d, UNNEST(range(1, len(w))) AS u(i) WHERE len(w) >= 2),
         |bic AS (SELECT doc_id, g, count(*) AS cnt
         |  FROM bg GROUP BY doc_id, g),
         |bi AS (SELECT doc_id, CAST(SUM(cnt) AS BIGINT) AS bi_total,
         |  CAST(MAX(cnt) AS BIGINT) AS top_bi_cnt FROM bic GROUP BY doc_id),
         |j AS (SELECT d.doc_id,
         |    COALESCE(tri.tri_total, 0) AS tri_total,
         |    COALESCE(tri.tri_distinct, 0) AS tri_distinct,
         |    CASE WHEN COALESCE(tri.tri_total, 0) > 0 THEN ${val6(
          "CAST(tri.tri_total - tri.tri_distinct AS DOUBLE) / tri.tri_total")}
         |      ELSE 0.0 END AS dup_tri_frac,
         |    CASE WHEN COALESCE(bi.bi_total, 0) > 0 THEN ${val6(
          "CAST(bi.top_bi_cnt AS DOUBLE) / bi.bi_total")}
         |      ELSE 0.0 END AS top_bi_frac
         |  FROM d LEFT JOIN tri ON d.doc_id = tri.doc_id
         |  LEFT JOIN bi ON d.doc_id = bi.doc_id)
         |SELECT doc_id, tri_total, tri_distinct, dup_tri_frac, top_bi_frac,
         |  dup_tri_frac <= 0.2 AND top_bi_frac <= 0.2 AS keep
         |FROM j ORDER BY doc_id NULLS FIRST""".stripMargin,

    // the composed curation chain: every stage CTE is the same logic
    // already gated standalone (q29/q28/q143/q142/q65)
    "q145_curation_verdicts" ->
      s"""WITH RECURSIVE $curationCtes
         |SELECT doc_id, lang_ok, quality_ok, rep_ok, decon_ok, dedup_ok,
         |  lang_ok AND quality_ok AND rep_ok AND decon_ok AND dedup_ok
         |    AS keep
         |FROM v ORDER BY doc_id NULLS FIRST""".stripMargin,

    // q154: the ENTIRE training pipeline (curate → balance → shard →
    // pack, four truncate-written layers) replayed relationally. Stage
    // CTEs are the same logic gated standalone: verdicts = q145 minus
    // the lang-select (the pipeline balances languages instead of
    // selecting one), mixture = q149 with rates from the KEPT corpus,
    // shard = q144 over the MIXED corpus, packs = q136 scoped to
    // (shard, source).
    "q154_training_pipeline" ->
      s"""WITH RECURSIVE $curationCtes,
         |mk AS (SELECT doc_id FROM v
         |  WHERE quality_ok AND rep_ok AND decon_ok AND dedup_ok),
         |kept AS (SELECT doc.doc_id, doc.lang, doc.source, doc.text
         |  FROM documents doc JOIN mk USING (doc_id)),
         |lc AS (SELECT lang, count(*) AS cnt FROM kept GROUP BY lang),
         |lr AS (SELECT lang,
         |  (SELECT min(cnt) FROM lc) * 1000000 // cnt AS mix_threshold
         |  FROM lc),
         |mixed AS (SELECT k.* FROM kept k JOIN lr USING (lang)
         |  WHERE ${h32("'mix:' || k.doc_id")} % 1000000
         |    < lr.mix_threshold),
         |sr AS (SELECT doc_id,
         |  ROW_NUMBER() OVER (ORDER BY md5('shard:' || doc_id), doc_id)
         |    AS rk FROM mixed),
         |shd AS (SELECT doc_id, (rk - 1) % 8 AS shard, (rk - 1) // 8 AS pos
         |  FROM sr),
         |tok AS (SELECT m.doc_id, m.lang, m.source, shd.shard, shd.pos,
         |    CAST(len(string_split(m.text, ' ')) AS BIGINT) AS n_tokens
         |  FROM mixed m JOIN shd USING (doc_id)),
         |packed AS (SELECT *,
         |  CAST(COALESCE(SUM(n_tokens) OVER (PARTITION BY shard, source
         |    ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND
         |    1 PRECEDING), 0) // 256 AS BIGINT) AS pack_id
         |  FROM tok)
         |SELECT doc_id, lang, source, CAST(shard AS BIGINT) AS shard,
         |  CAST(pos AS BIGINT) AS pos, n_tokens, pack_id
         |FROM packed ORDER BY doc_id NULLS FIRST""".stripMargin,

    // q157: the Spark side answers INCREMENTALLY (stored prev verdicts
    // + delta-only stage recompute + affected-component-only closure);
    // the oracle recomputes the FULL chain on the current snapshot from
    // scratch — a hash match proves incremental ≡ full on every row.
    "q157_incremental_curation" -> incrementalCurationOracle,

    // q162 maintains the same verdict table CONTINUOUSLY (foreachBatch
    // applying one incremental step per micro-batch, tombstones for
    // removals); the drained end state must equal q157's — same oracle.
    "q162_streaming_curation" -> incrementalCurationOracle,

    "q146_curation_funnel" ->
      s"""WITH RECURSIVE $curationCtes
         |SELECT * FROM (
         |  SELECT 0 AS stage_no, 'ingest' AS stage, count(*) AS survivors
         |    FROM v
         |  UNION ALL SELECT 1, 'lang', count(*) FROM v WHERE lang_ok
         |  UNION ALL SELECT 2, 'quality', count(*) FROM v
         |    WHERE lang_ok AND quality_ok
         |  UNION ALL SELECT 3, 'repetition', count(*) FROM v
         |    WHERE lang_ok AND quality_ok AND rep_ok
         |  UNION ALL SELECT 4, 'decontamination', count(*) FROM v
         |    WHERE lang_ok AND quality_ok AND rep_ok AND decon_ok
         |  UNION ALL SELECT 5, 'dedup', count(*) FROM v
         |    WHERE lang_ok AND quality_ok AND rep_ok AND decon_ok
         |      AND dedup_ok)
         |ORDER BY stage_no""".stripMargin,
  ) ++ oracleSqlRest

  /** The q157/q162 oracle: full recompute of the CURRENT snapshot. */
  /** Doc-grain hash-trick vector CTEs (q174's arithmetic): `dvec`
    * (doc_id, dim, w) and `dnorm` (doc_id, n2) — shared by q188 and
    * q191. */
  private lazy val docVecCtes: String =
    s"""dtok AS (SELECT doc_id, UNNEST(string_split(text, ' ')) AS tk
       |  FROM documents),
       |ddim AS (SELECT doc_id, ${h32("tk")} % 16 AS dim,
       |    CASE WHEN (${h32("tk")} // 16) % 2 = 0 THEN 1 ELSE -1 END AS sg
       |  FROM dtok),
       |dvec AS (SELECT doc_id, dim, CAST(SUM(sg) AS BIGINT) AS w
       |  FROM ddim GROUP BY 1, 2),
       |dnorm AS (SELECT doc_id, SUM(w * w) AS n2 FROM dvec GROUP BY 1)"""
      .stripMargin

  /** The q156 synthetic-container replay (hex build + truncation +
    * marker walk), ending at CTE `dims` (media_id, kind, n_bytes,
    * width, height; -1 = undecodable) — shared by q156 and the q198
    * media corpus card. */
  private lazy val mediaDimsCtes: String =
    s"""m AS (SELECT r AS media_id,
       |    CASE WHEN r % 2 = 0 THEN 'png' ELSE 'jpeg' END AS kind,
       |    CAST(r * 31 % 613 + 16 AS INT) AS w,
       |    CAST(r * 17 % 401 + 16 AS INT) AS h,
       |    CAST(r % 8 + 16 AS INT) AS l0,
       |    CAST(r % 5 + 8 AS INT) AS lc
       |  FROM range(500) t(r)),
       |c AS (SELECT media_id, kind,
       |    CASE WHEN kind = 'png' THEN
       |      '89504E470D0A1A0A' || '0000000D' || '49484452' ||
       |      lpad(to_hex(w), 8, '0') || lpad(to_hex(h), 8, '0') ||
       |      '0806000000' || substring(md5(media_id || ':crc'), 1, 8) ||
       |      md5(media_id || ':g')
       |    ELSE
       |      'FFD8' || 'FFE0' || lpad(to_hex(l0), 4, '0') ||
       |      repeat('00', l0 - 2) ||
       |      CASE WHEN media_id % 3 = 0 THEN
       |           'FFFE' || lpad(to_hex(lc), 4, '0') || repeat('00', lc - 2)
       |         ELSE '' END ||
       |      'FFC0' || '0011' || '08' ||
       |      lpad(to_hex(h), 4, '0') || lpad(to_hex(w), 4, '0') ||
       |      '03' || '012200' || '021101' || '031101' ||
       |      md5(media_id || ':g')
       |    END AS full_hx
       |  FROM m),
       |x AS (SELECT media_id, kind,
       |    upper(CASE WHEN media_id % 17 = 0 THEN substring(full_hx, 1, 20)
       |      ELSE full_hx END) AS hx
       |  FROM c),
       |j AS (SELECT media_id, kind, hx, len(hx) // 2 AS n_bytes,
       |    CASE WHEN len(hx) >= 12
       |      THEN 5 + CAST(('0x' || substring(hx, 9, 4)) AS INT)
       |      ELSE 999999 END AS s1
       |  FROM x),
       |j2 AS (SELECT *, CASE WHEN substring(hx, 2 * s1 - 1, 4) = 'FFFE'
       |      THEN s1 + 2 + CAST(('0x' || substring(hx, 2 * s1 + 3, 4)) AS INT)
       |      ELSE s1 END AS s2
       |  FROM j),
       |dims AS (
       |  SELECT media_id, kind, CAST(n_bytes AS INT) AS n_bytes,
       |  CASE
       |    WHEN kind = 'png' AND n_bytes >= 24
       |      AND substring(hx, 1, 16) = '89504E470D0A1A0A'
       |      THEN CAST(('0x' || substring(hx, 33, 8)) AS INT)
       |    WHEN kind = 'jpeg' AND substring(hx, 1, 4) = 'FFD8'
       |      AND substring(hx, 2 * s2 - 1, 4) = 'FFC0' AND n_bytes >= s2 + 18
       |      THEN CAST(('0x' || substring(hx, 2 * s2 + 13, 4)) AS INT)
       |    ELSE -1 END AS width,
       |  CASE
       |    WHEN kind = 'png' AND n_bytes >= 24
       |      AND substring(hx, 1, 16) = '89504E470D0A1A0A'
       |      THEN CAST(('0x' || substring(hx, 41, 8)) AS INT)
       |    WHEN kind = 'jpeg' AND substring(hx, 1, 4) = 'FFD8'
       |      AND substring(hx, 2 * s2 - 1, 4) = 'FFC0' AND n_bytes >= s2 + 18
       |      THEN CAST(('0x' || substring(hx, 2 * s2 + 9, 4)) AS INT)
       |    ELSE -1 END AS height
       |  FROM j2)""".stripMargin

  /** Brute-force ranking over the q/e CTEs of [[ivfServeCtes]],
    * ending at `br` (query_id, neighbor_id, rn) — shared by q186 and
    * q197. */
  private lazy val bruteRankCtes: String =
    s"""bp AS (SELECT q.query_id, cc.vec_id AS neighbor_id,
       |    ${cosCols("q.qv", "cc.embedding")} AS bcos
       |  FROM q JOIN e cc ON cc.vec_id <> q.query_id),
       |br AS (SELECT query_id, neighbor_id,
       |    ROW_NUMBER() OVER (PARTITION BY query_id
       |      ORDER BY bcos DESC NULLS LAST, neighbor_id NULLS FIRST)
       |      AS rn
       |  FROM bp)""".stripMargin

  /** The q182 BM25 scoring replay (k1=1.2, b=0.75), ending at CTE
    * `bs` = (query_id, doc_id, s9) — shared by q182 and the q188
    * hard-negative miner. */
  /** BM25 CTE chain over an optionally-filtered corpus — `where` is
    * the survivor predicate for the delete-maintained variant (q234);
    * empty for q182/q188. */
  private def bm25CtesFor(where: String): String =
    s"""tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS t
       |  FROM documents $where),
       |tf AS (SELECT doc_id, t, COUNT(*) AS tf FROM tok GROUP BY 1, 2),
       |dl AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS dl
       |  FROM tok GROUP BY 1),
       |dfq AS (SELECT t, COUNT(*) AS df FROM tf GROUP BY 1),
       |tot AS (SELECT (SELECT COUNT(*) FROM documents $where) AS nd,
       |               (SELECT COUNT(*) FROM tok) AS nt),
       |q AS (SELECT DISTINCT doc_id AS query_id, t FROM tok
       |  WHERE doc_id % 100 = 0),
       |c AS (SELECT q.query_id, tf.doc_id,
       |    CAST(FLOOR(
       |      ln((CAST(nd - df AS DOUBLE) + 0.5)
       |          / (CAST(df AS DOUBLE) + 0.5) + 1.0)
       |      * ((CAST(tf AS DOUBLE) * 2.2)
       |         / (CAST(tf AS DOUBLE) + 1.2
       |            * (0.25 + 0.75
       |               * (CAST(dl AS DOUBLE)
       |                  / (CAST(nt AS DOUBLE) / nd)))))
       |      * 1000000000.0 + 0.5) AS BIGINT) AS c9
       |  FROM q JOIN tf USING (t) JOIN dfq USING (t)
       |  JOIN dl ON tf.doc_id = dl.doc_id CROSS JOIN tot
       |  WHERE tf.doc_id <> q.query_id),
       |bs AS (SELECT query_id, doc_id, CAST(SUM(c9) AS BIGINT) AS s9
       |  FROM c GROUP BY 1, 2)""".stripMargin

  private lazy val bm25Ctes: String = bm25CtesFor("")


  /** The q50/q161 IVF serve replay (first-16 centroids, single-probe
    * assignment, top-4 probes, candidates ranked), shared by q161 and
    * the q186 recall audit. Ends at CTE `r` (ranked candidates). */
  private lazy val ivfServeCtes: String =
    s"""e AS (SELECT vec_id, embedding FROM embeddings),
       |c AS (SELECT vec_id AS cid, embedding AS cv FROM e WHERE vec_id < 16),
       |ac AS (
       |  SELECT e.vec_id, e.embedding, c.cid,
       |    ${cosCols("e.embedding", "c.cv")} AS ccos
       |  FROM e CROSS JOIN c),
       |assign AS (
       |  SELECT vec_id, embedding, cid FROM (
       |    SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id
       |      ORDER BY ccos DESC NULLS LAST, cid NULLS FIRST) AS rn
       |    FROM ac) WHERE rn = 1),
       |q AS (SELECT vec_id AS query_id, embedding AS qv FROM e
       |      WHERE vec_id < 10),
       |qc AS (
       |  SELECT query_id, qv, cid FROM (
       |    SELECT q.query_id, q.qv, c.cid,
       |      ROW_NUMBER() OVER (PARTITION BY q.query_id
       |        ORDER BY ${cosCols("q.qv", "c.cv")} DESC NULLS LAST,
       |                 c.cid NULLS FIRST) AS rn
       |    FROM q CROSS JOIN c) WHERE rn <= 4),
       |cand AS (
       |  SELECT query_id, a.vec_id AS neighbor_id,
       |    ${cosCols("qc.qv", "a.embedding")} AS cos
       |  FROM qc JOIN assign a USING (cid)
       |  WHERE a.vec_id <> qc.query_id),
       |r AS (
       |  SELECT query_id, neighbor_id, cos,
       |    ROW_NUMBER() OVER (PARTITION BY query_id
       |      ORDER BY cos DESC NULLS LAST, neighbor_id NULLS FIRST) AS rn
       |  FROM cand)""".stripMargin

  /** q185's oracle: both power-iteration steps replayed verbatim —
    * per-row dots are the same left-fold expression tree Spark
    * evaluates, contributions floor-scale to nano BIGINTs before the
    * 64 component sums, and each step normalizes by the exact integer
    * max |component|. */
  /** The q185 power-iteration replay, ending at CTE `p`
    * (vec_id, label, proj) — shared by q185 and the q195 drift
    * monitor. */
  private lazy val pcaPowerCtes: String = {
    def dotV(e: String, v: String) =
      s"""list_reduce(list_transform(range(1, 65),
         |      i -> CAST($e[i] AS DOUBLE) * $v[i]), (x, y) -> x + y)"""
        .stripMargin
    def step(src: String, dotCol: String, sOut: String, vOut: String) =
      s"""c_$sOut AS (SELECT generate_subscripts(embedding, 1) AS pos,
         |    unnest(embedding) AS x, $dotCol AS dot FROM $src),
         |$sOut AS (SELECT pos, CAST(SUM(CAST(FLOOR(
         |      CAST(x AS DOUBLE) * dot * 1000000000.0 + 0.5) AS BIGINT))
         |    AS BIGINT) AS s9
         |  FROM c_$sOut GROUP BY 1),
         |m_$sOut AS (SELECT MAX(abs(s9)) AS m FROM $sOut),
         |$vOut AS (SELECT list(CAST(s9 AS DOUBLE) / CAST(m AS DOUBLE)
         |    ORDER BY pos) AS v
         |  FROM $sOut CROSS JOIN m_$sOut)""".stripMargin
    s"""e AS (SELECT vec_id, CAST(label AS BIGINT) AS label,
       |    embedding FROM embeddings),
       |d1 AS (SELECT vec_id, label, embedding,
       |    list_reduce(list_transform(range(1, 65),
       |      i -> CAST(embedding[i] AS DOUBLE) * 0.125),
       |      (x, y) -> x + y) AS dot
       |  FROM e),
       |${step("d1", "dot", "s1", "v1")},
       |d2 AS (SELECT vec_id, label, embedding,
       |    ${dotV("embedding", "v")} AS dot
       |  FROM e CROSS JOIN v1),
       |${step("d2", "dot", "s2", "v2")},
       |p AS (SELECT vec_id, label,
       |    ${dotV("embedding", "v")} AS proj
       |  FROM e CROSS JOIN v2)""".stripMargin
  }

  private lazy val pcaPowerSql: String =
    s"""WITH $pcaPowerCtes
       |SELECT vec_id, label, ${val6("proj")} AS proj
       |FROM p ORDER BY vec_id NULLS FIRST""".stripMargin

  /** q183's oracle: the greedy longest-match loop unrolled as fixed
    * argmax-prefix steps at distinct-word grain (max word length in
    * the fixture is 8, and every step advances >= 1 char or
    * terminates as [UNK], so 8 steps always finish). The vocabulary
    * VALUES list is generated from [[TextOps.WpVocab]] — the same
    * literal the Spark segmenter closes over. */
  private lazy val wordpieceSql: String = {
    val vocabVals = TextOps.WpVocab.map(p => s"('$p')").mkString(", ")
    val steps = (1 to 8).map { i =>
      val prev = s"s${i - 1}"
      s"""s$i AS (
         |  SELECT word, pos, np, unk, done FROM $prev WHERE done
         |  UNION ALL
         |  SELECT word,
         |    CASE WHEN piece IS NULL THEN CAST(len(word) AS BIGINT)
         |         ELSE pos + len(piece) END AS pos,
         |    np + 1 AS np,
         |    unk + CASE WHEN piece IS NULL THEN 1 ELSE 0 END AS unk,
         |    CASE WHEN piece IS NULL THEN TRUE
         |         ELSE pos + len(piece) >= len(word) END AS done
         |  FROM (
         |    SELECT s.word, s.pos, s.np, s.unk, v.piece,
         |      ROW_NUMBER() OVER (PARTITION BY s.word
         |        ORDER BY len(v.piece) DESC NULLS LAST,
         |                 v.piece NULLS FIRST) AS rn
         |    FROM (SELECT * FROM $prev WHERE NOT done) s
         |    LEFT JOIN vocab v
         |      ON substr(s.word, CAST(s.pos + 1 AS INTEGER),
         |                len(v.piece)) = v.piece
         |  ) WHERE rn = 1)""".stripMargin
    }.mkString(",\n")
    s"""WITH vocab(piece) AS (VALUES $vocabVals),
       |tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS t
       |  FROM documents),
       |cnt AS (SELECT doc_id, t, CAST(COUNT(*) AS BIGINT) AS c
       |  FROM tok GROUP BY 1, 2),
       |s0 AS (SELECT t AS word, CAST(0 AS BIGINT) AS pos, 0 AS np,
       |    0 AS unk, FALSE AS done
       |  FROM (SELECT DISTINCT t FROM tok)),
       |$steps,
       |agg AS (SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_words,
       |    CAST(SUM(c * np) AS BIGINT) AS n_pieces,
       |    CAST(SUM(c * unk) AS BIGINT) AS n_unk
       |  FROM cnt JOIN s8 ON cnt.t = s8.word GROUP BY 1)
       |SELECT doc_id, n_words, n_pieces, n_unk,
       |  ${val6("CAST(n_pieces AS DOUBLE) / n_words")} AS fertility
       |FROM agg ORDER BY doc_id NULLS FIRST""".stripMargin
  }

  private lazy val incrementalCurationOracle: String =
      s"""WITH RECURSIVE c157 AS (SELECT doc_id, lang,
         |    CASE WHEN doc_id % 11 = 0 THEN text || ' [edited]'
         |      ELSE text END AS text
         |  FROM documents WHERE doc_id % 7 <> 0),
         |${curationCtesOver("c157", "documents")},
         |pfp AS (SELECT doc_id, $fpSqlExpr AS fp
         |  FROM documents WHERE doc_id % 6 <> 0),
         |cfp AS (SELECT doc_id, $fpSqlExpr AS fp
         |  FROM c157),
         |st AS (SELECT COALESCE(p.doc_id, c.doc_id) AS doc_id,
         |    CASE WHEN p.doc_id IS NULL THEN 'added'
         |         WHEN c.doc_id IS NULL THEN 'removed'
         |         WHEN p.fp <> c.fp THEN 'changed'
         |         ELSE 'unchanged' END AS status
         |  FROM pfp p FULL OUTER JOIN cfp c ON p.doc_id = c.doc_id)
         |SELECT v.doc_id, lang_ok, quality_ok, rep_ok, decon_ok, dedup_ok,
         |  lang_ok AND quality_ok AND rep_ok AND decon_ok AND dedup_ok
         |    AS keep,
         |  st.status
         |FROM v JOIN st ON v.doc_id = st.doc_id
         |ORDER BY v.doc_id NULLS FIRST""".stripMargin

  /** Continuation of [[oracleSql]] (split so the shared q157/q162
    * oracle can live as a named val between the halves). */
  private lazy val oracleSqlRest: Map[String, String] = Map(

    // q159: same pair graph + closure as q65; the canonical within each
    // cluster is the highest-quality copy (most tokens, doc_id ties)
    "q159_quality_canonical" ->
      s"""WITH RECURSIVE $minhashPairsCtes,
         |edges AS (SELECT ida AS s, idb AS d FROM pairs
         |  UNION SELECT idb, ida FROM pairs),
         |reach(id, r) AS (
         |  SELECT s, d FROM edges
         |  UNION
         |  SELECT w.id, e.d FROM reach w JOIN edges e ON w.r = e.s),
         |comp AS (SELECT id, LEAST(id, MIN(r)) AS component
         |  FROM reach GROUP BY id),
         |q AS (SELECT doc_id, len(string_split(text, ' ')) AS n_tokens
         |  FROM documents),
         |a AS (SELECT q.doc_id, q.n_tokens,
         |    COALESCE(c.component, q.doc_id) AS component
         |  FROM q LEFT JOIN comp c ON q.doc_id = c.id)
         |SELECT doc_id, component,
         |  COUNT(*) OVER (PARTITION BY component) AS cluster_size,
         |  CAST(n_tokens AS INT) AS n_tokens,
         |  ROW_NUMBER() OVER (PARTITION BY component
         |    ORDER BY n_tokens DESC, doc_id ASC) = 1 AS is_canonical
         |FROM a ORDER BY doc_id NULLS FIRST""".stripMargin,

    // q160: vocabulary CDF — DuckDB states the rank/cumsum as plain
    // global windows; Spark reaches the identical values through the
    // two-phase range-partitioned prefix-sum (no single-partition sort)
    "q160_vocab_coverage" ->
      s"""WITH t AS (SELECT unnest(string_split(text, ' ')) AS token
         |  FROM documents),
         |c AS (SELECT token, count(*) AS cnt FROM t GROUP BY token),
         |tot AS (SELECT CAST(SUM(cnt) AS DOUBLE) AS total FROM c),
         |r AS (SELECT token, cnt,
         |    ROW_NUMBER() OVER (ORDER BY cnt DESC, token ASC) AS rank,
         |    CAST(SUM(cnt) OVER (ORDER BY cnt DESC, token ASC
         |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_tokens
         |  FROM c)
         |SELECT token, cnt, rank, cum_tokens,
         |  ${val6("cum_tokens / (SELECT total FROM tot)")} AS coverage
         |FROM r WHERE rank <= 200
         |ORDER BY rank""".stripMargin,

    // the doubled stream delivers every content twice; after per-feed
    // fingerprint dedup the stats must equal the batch distinct-
    // (source, content) aggregation — duplicate contents share one
    // token count, so the representative choice cannot skew n_tokens
    "q147_streaming_doc_dedup" ->
      """WITH dc AS (SELECT DISTINCT source,
        |    md5(regexp_replace(lower(text), '\s+', ' ', 'g')) AS fp,
        |    len(string_split(regexp_replace(lower(text), '\s+', ' ', 'g'),
        |      ' ')) AS tl
        |  FROM documents)
        |SELECT source, count(*) AS n_docs,
        |  CAST(SUM(tl) AS BIGINT) AS n_tokens
        |FROM dc GROUP BY source
        |ORDER BY source NULLS FIRST""".stripMargin,

    // per-language keep rate as pure integer math over the portable
    // hash — both engines derive the identical verdict per doc
    "q149_lang_mixture" ->
      s"""WITH c AS (SELECT lang, count(*) AS cnt
         |  FROM documents GROUP BY lang),
         |m AS (SELECT min(cnt) AS mc FROM c),
         |r AS (SELECT lang, cnt,
         |  (SELECT mc FROM m) * 1000000 // cnt AS mix_threshold FROM c)
         |SELECT d.doc_id, d.lang, r.cnt, r.mix_threshold,
         |  ${h32("'mix:' || d.doc_id")} % 1000000 AS hash_bucket,
         |  ${h32("'mix:' || d.doc_id")} % 1000000 < r.mix_threshold AS keep
         |FROM documents d JOIN r USING (lang)
         |ORDER BY d.doc_id NULLS FIRST""".stripMargin,

    // the oracle recomputes the upsert+delete chain relationally: the
    // %6 updates are a subset of the %3 base (pure matched-update), the
    // %9 delete prunes after
    "q151_merge_upsert_delete" ->
      """SELECT o_orderkey,
        |  CASE WHEN o_orderkey % 6 = 0 THEN 'M' ELSE o_orderstatus END
        |    AS o_orderstatus,
        |  o_totalprice
        |FROM orders
        |WHERE o_orderkey % 3 = 0 AND o_orderkey % 9 <> 0
        |ORDER BY o_orderkey NULLS FIRST""".stripMargin,

    // both snapshot derivations are deterministic, so the oracle's
    // FULL OUTER fingerprint compare rebuilds the identical diff
    "q150_corpus_diff" ->
      """WITH d AS (SELECT doc_id, text FROM documents),
        |v1 AS (SELECT doc_id,
        |    md5(regexp_replace(lower(CASE WHEN doc_id % 11 = 0
        |      THEN text || ' [edited]' ELSE text END), '\s+', ' ', 'g'))
        |      AS fp1
        |  FROM d WHERE doc_id % 7 <> 0),
        |v2 AS (SELECT doc_id,
        |    md5(regexp_replace(lower(text), '\s+', ' ', 'g')) AS fp2
        |  FROM d WHERE doc_id % 5 <> 0)
        |SELECT COALESCE(v1.doc_id, v2.doc_id) AS doc_id,
        |  CASE WHEN v1.fp1 IS NULL THEN 'added'
        |       WHEN v2.fp2 IS NULL THEN 'removed'
        |       WHEN v1.fp1 <> v2.fp2 THEN 'changed'
        |       ELSE 'unchanged' END AS status
        |FROM v1 FULL OUTER JOIN v2 ON v1.doc_id = v2.doc_id
        |ORDER BY 1 NULLS FIRST""".stripMargin,

    // md5 of the seeded key gives both engines the identical shuffle
    // order; shard/pos are integer math over the global row number
    "q144_shuffle_shard" ->
      """WITH r AS (SELECT doc_id,
        |  ROW_NUMBER() OVER (ORDER BY md5('shard:' || doc_id), doc_id) AS rk
        |  FROM documents)
        |SELECT doc_id, (rk - 1) % 8 AS shard, (rk - 1) // 8 AS pos
        |FROM r ORDER BY doc_id NULLS FIRST""".stripMargin,

    // q246: rank-based 10%-trimmed + winsorized means — no percentile
    // interpolation; ties broken on o_orderkey so ranks are exact.
    "q246_robust_stats" ->
      """WITH j AS (SELECT c.c_mktsegment AS mktsegment, o.o_orderkey,
        |    CAST(FLOOR(o.o_totalprice * 100.0 + 0.5) AS BIGINT) AS cents
        |  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey),
        |r AS (SELECT mktsegment, cents,
        |    CAST(ROW_NUMBER() OVER (PARTITION BY mktsegment
        |      ORDER BY cents, o_orderkey) AS BIGINT) AS rk,
        |    COUNT(*) OVER (PARTITION BY mktsegment) AS n
        |  FROM j),
        |k AS (SELECT mktsegment, cents, rk, n,
        |    CAST(FLOOR(n * 0.1) AS BIGINT) AS k FROM r)
        |SELECT mktsegment,
        |  MAX(n) AS n_orders,
        |  MAX(k) AS k_trim,
        |  CAST(SUM(CASE WHEN rk > k AND rk <= n - k THEN cents END)
        |      AS DOUBLE)
        |    / 100.0 / CAST(MAX(n) - 2 * MAX(k) AS DOUBLE) AS trimmed_mean,
        |  CAST(SUM(CASE WHEN rk > k AND rk <= n - k THEN cents END)
        |      + MAX(k) * (MAX(CASE WHEN rk = k + 1 THEN cents END)
        |                + MAX(CASE WHEN rk = n - k THEN cents END))
        |      AS DOUBLE)
        |    / 100.0 / CAST(MAX(n) AS DOUBLE) AS winsor_mean,
        |  CAST(MAX(CASE WHEN rk = k + 1 THEN cents END) AS DOUBLE) / 100.0
        |    AS lo_clamp,
        |  CAST(MAX(CASE WHEN rk = n - k THEN cents END) AS DOUBLE) / 100.0
        |    AS hi_clamp
        |FROM k GROUP BY mktsegment
        |ORDER BY mktsegment NULLS FIRST""".stripMargin,

    // q247: Zipf doubling-rank profile — freq(r)/freq(2r) ≈ 2^s, one
    // IEEE division val6-scaled; no libm ln anywhere (not bit-portable)
    "q247_zipf_profile" ->
      """WITH tf AS (SELECT token, COUNT(*) AS freq FROM (
        |    SELECT UNNEST(string_split(text, ' ')) AS token
        |    FROM documents) GROUP BY token),
        |r AS (SELECT token, freq,
        |    ROW_NUMBER() OVER (ORDER BY freq DESC, token) AS rk FROM tf),
        |p AS (SELECT rk, token, freq FROM r
        |  WHERE rk <= 8192 AND (rk & (rk - 1)) = 0)
        |SELECT a.rk AS rk, a.token AS token, a.freq AS freq,
        |  a.freq * a.rk AS zipf_product,
        |  CAST(CAST(FLOOR(CAST(a.freq AS DOUBLE) / CAST(b.freq AS DOUBLE)
        |      * 1000000.0 + 0.5) AS BIGINT) AS DOUBLE) / 1000000.0
        |    AS doubling_ratio
        |FROM p a LEFT JOIN p b ON b.rk = a.rk * 2
        |ORDER BY rk NULLS FIRST""".stripMargin,

    // q248: l-diversity audit — band-grain count then cell-grain
    // rollup; top_share is an exact-integer IEEE division.
    "q248_l_diversity" ->
      """WITH b AS (SELECT CAST(c_nationkey AS INT) AS c_nationkey,
        |    c_mktsegment,
        |    CAST(FLOOR(CAST(CAST(FLOOR(c_acctbal * 100.0 + 0.5) AS BIGINT)
        |      AS DOUBLE) / 100000.0) AS BIGINT) AS band
        |  FROM customer),
        |bf AS (SELECT c_nationkey, c_mktsegment, band,
        |    CAST(COUNT(*) AS BIGINT) AS f
        |  FROM b GROUP BY 1, 2, 3)
        |SELECT c_nationkey, c_mktsegment AS segment,
        |  CAST(SUM(f) AS BIGINT) AS n,
        |  CAST(COUNT(*) AS BIGINT) AS l_distinct,
        |  CAST(MAX(f) AS BIGINT) AS max_f,
        |  CAST(MAX(f) AS DOUBLE) / CAST(SUM(f) AS DOUBLE) AS top_share,
        |  CASE WHEN COUNT(*) >= 3 THEN 'diverse' ELSE 'exposed' END
        |    AS status
        |FROM bf GROUP BY 1, 2
        |ORDER BY c_nationkey NULLS FIRST, segment NULLS FIRST"""
        .stripMargin,

    // q249: item-item cosine recommendations — co/sqrt(du*dv) on
    // exact integers; rank on the raw double, ties (co desc, v asc).
    "q249_item_recs" ->
      """WITH bo AS (SELECT DISTINCT l_orderkey AS okey,
        |    l_partkey AS id FROM lineitem),
        |deg AS (SELECT id, CAST(COUNT(*) AS BIGINT) AS d
        |  FROM bo GROUP BY 1),
        |co AS (SELECT a.id AS u, b.id AS v,
        |    CAST(COUNT(*) AS BIGINT) AS co
        |  FROM bo a JOIN bo b ON a.okey = b.okey AND a.id <> b.id
        |  GROUP BY 1, 2 HAVING COUNT(*) >= 2),
        |s AS (SELECT co.u, co.v, co.co,
        |    CAST(co.co AS DOUBLE) / sqrt(CAST(du.d * dv.d AS DOUBLE))
        |      AS cosine
        |  FROM co JOIN deg du ON co.u = du.id
        |          JOIN deg dv ON co.v = dv.id),
        |r AS (SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY u
        |    ORDER BY cosine DESC, co DESC, v) AS BIGINT) AS rank
        |  FROM s)
        |SELECT u AS part_id, rank, v AS rec_part_id, co,
        |  CAST(CAST(FLOOR(cosine * 1000000.0 + 0.5) AS BIGINT)
        |    AS DOUBLE) / 1000000.0 AS cosine
        |FROM r WHERE rank <= 5
        |ORDER BY part_id NULLS FIRST, rank NULLS FIRST""".stripMargin,

    // q250: EWMA one-step forecast — power-of-two weights over the 8
    // trailing observed days keep num/den exact BIGINTs; the anomaly
    // test cross-multiplies integers (2·cents·den vs 3·num / num).
    "q250_ewma_forecast" -> {
      val lags = (1 to 8).map { k =>
        val wt = 1L << (8 - k)
        (s"COALESCE(LAG(cents, $k) OVER w, 0) * $wt",
          s"CASE WHEN LAG(cents, $k) OVER w IS NOT NULL THEN $wt ELSE 0 END")
      }
      s"""WITH d AS (SELECT CAST(o_orderdate AS DATE) AS day,
         |    CAST(SUM(CAST(FLOOR(o_totalprice * 100.0 + 0.5) AS BIGINT))
         |      AS BIGINT) AS cents
         |  FROM orders GROUP BY 1),
         |f AS (SELECT day, cents,
         |    ${lags.map(_._1).mkString(" + ")} AS num,
         |    ${lags.map(_._2).mkString(" + ")} AS den
         |  FROM d WINDOW w AS (ORDER BY day))
         |SELECT day, CAST(cents AS DOUBLE) / 100.0 AS revenue,
         |  CAST(CAST(FLOOR(CAST(num AS DOUBLE) / CAST(den AS DOUBLE)
         |    / 100.0 * 1000000.0 + 0.5) AS BIGINT) AS DOUBLE) / 1000000.0
         |    AS forecast,
         |  CASE WHEN cents * 2 * den > num * 3 THEN 'high'
         |       WHEN cents * 2 * den < num THEN 'low'
         |       ELSE 'ok' END AS flag
         |FROM f WHERE den > 0
         |ORDER BY day NULLS FIRST""".stripMargin
    },

    // q251: the continuous per-channel EWMA monitor — drained
    // AvailableNow it must equal this batch recurrence bit-for-bit
    // (q250's lag chain, PARTITION BY event_type over event-day cents).
    "q251_streaming_ewma" -> {
      val lags = (1 to 8).map { k =>
        val wt = 1L << (8 - k)
        (s"COALESCE(LAG(cents, $k) OVER w, 0) * $wt",
          s"CASE WHEN LAG(cents, $k) OVER w IS NOT NULL THEN $wt ELSE 0 END")
      }
      s"""WITH d AS (SELECT event_type, CAST(ts AS DATE) AS day,
         |    CAST(SUM(CAST(FLOOR(value * 100.0 + 0.5) AS BIGINT))
         |      AS BIGINT) AS cents
         |  FROM events GROUP BY 1, 2),
         |f AS (SELECT event_type, day, cents,
         |    ${lags.map(_._1).mkString(" + ")} AS num,
         |    ${lags.map(_._2).mkString(" + ")} AS den
         |  FROM d WINDOW w AS (PARTITION BY event_type ORDER BY day))
         |SELECT event_type, day, CAST(cents AS DOUBLE) / 100.0 AS revenue,
         |  CAST(CAST(FLOOR(CAST(num AS DOUBLE) / CAST(den AS DOUBLE)
         |    / 100.0 * 1000000.0 + 0.5) AS BIGINT) AS DOUBLE) / 1000000.0
         |    AS forecast,
         |  CASE WHEN cents * 2 * den > num * 3 THEN 'high'
         |       WHEN cents * 2 * den < num THEN 'low'
         |       ELSE 'ok' END AS flag
         |FROM f WHERE den > 0
         |ORDER BY event_type NULLS FIRST, day NULLS FIRST""".stripMargin
    },

    // q252: CUPED — exact BIGINT power sums per arm + pooled; every
    // scalar mirrors the Spark expression shape operand-for-operand
    // (left-assoc +/-, CAST-to-DOUBLE first), val6 at the edge.
    "q252_cuped" -> {
      val mx = "CAST(sx AS DOUBLE) / CAST(n AS DOUBLE)"
      val my = "CAST(sy AS DOUBLE) / CAST(n AS DOUBLE)"
      val vy = s"CAST(syy AS DOUBLE) / CAST(n AS DOUBLE) - ($my) * ($my)"
      val vx = s"CAST(sxx AS DOUBLE) / CAST(n AS DOUBLE) - ($mx) * ($mx)"
      val cxy = s"CAST(sxy AS DOUBLE) / CAST(n AS DOUBLE) - ($mx) * ($my)"
      s"""WITH u AS (SELECT user_id,
         |    COALESCE(SUM(CASE WHEN event_type = 'purchase'
         |        AND ts < TIMESTAMP '2024-01-16 00:00:00'
         |      THEN CAST(FLOOR(value * 100.0 + 0.5) AS BIGINT) END), 0)
         |      AS x,
         |    COALESCE(SUM(CASE WHEN event_type = 'purchase'
         |        AND ts >= TIMESTAMP '2024-01-16 00:00:00'
         |      THEN CAST(FLOOR(value * 100.0 + 0.5) AS BIGINT) END), 0)
         |      AS y
         |  FROM events GROUP BY 1),
         |a AS (SELECT CASE WHEN ${hash32("CAST(user_id AS VARCHAR)")} % 2
         |      = 0 THEN 'control' ELSE 'treatment' END AS arm, x, y
         |  FROM u),
         |m AS (SELECT arm, CAST(COUNT(*) AS BIGINT) AS n,
         |    CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
         |    CAST(SUM(x * x) AS BIGINT) AS sxx,
         |    CAST(SUM(x * y) AS BIGINT) AS sxy,
         |    CAST(SUM(y * y) AS BIGINT) AS syy
         |  FROM a GROUP BY 1),
         |p AS (SELECT CAST(COUNT(*) AS BIGINT) AS pn,
         |    CAST(SUM(x) AS BIGINT) AS px, CAST(SUM(y) AS BIGINT) AS py,
         |    CAST(SUM(x * x) AS BIGINT) AS pxx,
         |    CAST(SUM(x * y) AS BIGINT) AS pxy
         |  FROM a),
         |t AS (SELECT m.arm, m.n, m.sx, m.sy, m.sxx, m.sxy, m.syy,
         |    p.pn, p.px, p.py, p.pxx, p.pxy,
         |    (CAST(pn AS DOUBLE) * CAST(pxy AS DOUBLE)
         |      - CAST(px AS DOUBLE) * CAST(py AS DOUBLE))
         |    / (CAST(pn AS DOUBLE) * CAST(pxx AS DOUBLE)
         |      - CAST(px AS DOUBLE) * CAST(px AS DOUBLE)) AS theta
         |  FROM m CROSS JOIN p)
         |SELECT arm, n,
         |  ${val6(s"($mx) / 100.0")} AS pre_mean,
         |  ${val6(s"($my) / 100.0")} AS post_mean,
         |  ${val6(s"(($my) - theta * (($mx) - CAST(px AS DOUBLE)" +
             " / CAST(pn AS DOUBLE))) / 100.0")} AS adj_post_mean,
         |  ${val6("theta")} AS theta,
         |  ${val6(s"(($vy) - 2.0 * theta * ($cxy)" +
             s" + theta * theta * ($vx)) / ($vy)")} AS var_ratio
         |FROM t ORDER BY arm NULLS FIRST""".stripMargin
    },

    // q253: two-proportion z — exact conversion counts, one
    // fixed-shape IEEE expression; z value emitted (erf isn't
    // bit-portable), ±1.96 stated as the boolean.
    "q253_conversion_z" -> {
      val p1 = "CAST(conv_control AS DOUBLE) / CAST(n_control AS DOUBLE)"
      val p2 =
        "CAST(conv_treatment AS DOUBLE) / CAST(n_treatment AS DOUBLE)"
      val pp = "CAST(conv_control + conv_treatment AS DOUBLE)" +
        " / CAST(n_control + n_treatment AS DOUBLE)"
      val z = s"(($p2) - ($p1)) / sqrt(($pp) * (1.0 - ($pp)) *" +
        " (1.0 / CAST(n_control AS DOUBLE)" +
        " + 1.0 / CAST(n_treatment AS DOUBLE)))"
      s"""WITH u AS (SELECT user_id,
         |    COALESCE(SUM(CASE WHEN event_type = 'purchase'
         |        AND ts >= TIMESTAMP '2024-01-16 00:00:00'
         |      THEN CAST(FLOOR(value * 100.0 + 0.5) AS BIGINT) END), 0)
         |      AS cents
         |  FROM events GROUP BY 1),
         |a AS (SELECT
         |    ${hash32("CAST(user_id AS VARCHAR)")} % 2 = 0 AS is_control,
         |    cents >= 30000 AS converted FROM u),
         |g AS (SELECT
         |    CAST(SUM(CASE WHEN is_control THEN 1 ELSE 0 END) AS BIGINT)
         |      AS n_control,
         |    CAST(SUM(CASE WHEN is_control AND converted THEN 1 ELSE 0
         |      END) AS BIGINT) AS conv_control,
         |    CAST(SUM(CASE WHEN NOT is_control THEN 1 ELSE 0 END)
         |      AS BIGINT) AS n_treatment,
         |    CAST(SUM(CASE WHEN NOT is_control AND converted THEN 1
         |      ELSE 0 END) AS BIGINT) AS conv_treatment
         |  FROM a)
         |SELECT n_control, conv_control, n_treatment, conv_treatment,
         |  ${val6(p1)} AS rate_control,
         |  ${val6(p2)} AS rate_treatment,
         |  ${val6(z)} AS z,
         |  abs($z) > 1.96 AS significant
         |FROM g""".stripMargin
    },

    // q254: the expectation suite — one aggregate + one anti-join,
    // unioned into the rule-grain report.
    "q254_expectations" ->
      """WITH b AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
        |    CAST(SUM(CASE WHEN l_orderkey IS NULL OR l_partkey IS NULL
        |      OR l_suppkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
        |      AS v_null,
        |    CAST(SUM(CASE WHEN NOT (l_quantity >= 1.0
        |      AND l_quantity <= 50.0) THEN 1 ELSE 0 END) AS BIGINT)
        |      AS v_qty,
        |    CAST(SUM(CASE WHEN l_quantity > 45.0 THEN 1 ELSE 0 END)
        |      AS BIGINT) AS v_qty45,
        |    CAST(SUM(CASE WHEN NOT (l_discount >= 0.0
        |      AND l_discount <= 0.10) THEN 1 ELSE 0 END) AS BIGINT)
        |      AS v_disc,
        |    CAST(SUM(CASE WHEN NOT (l_returnflag IN ('A', 'N', 'R')
        |      AND l_linestatus IN ('O', 'F')) THEN 1 ELSE 0 END)
        |      AS BIGINT) AS v_flag,
        |    CAST(SUM(CASE WHEN NOT (l_tax >= 0.0 AND l_tax <= 0.08)
        |      THEN 1 ELSE 0 END) AS BIGINT) AS v_tax,
        |    CAST(SUM(CASE WHEN l_extendedprice <= 0.0 THEN 1 ELSE 0
        |      END) AS BIGINT) AS v_price,
        |    CAST(COUNT(DISTINCT (l_orderkey, l_linenumber)) AS BIGINT)
        |      AS n_distinct
        |  FROM lineitem),
        |fk AS (SELECT CAST(COUNT(*) AS BIGINT) AS v_fk
        |  FROM lineitem l LEFT JOIN orders o
        |    ON l.l_orderkey = o.o_orderkey
        |  WHERE o.o_orderkey IS NULL),
        |r AS (
        |  SELECT 'discount_range' AS check_name, n AS n_rows,
        |    v_disc AS n_violations FROM b
        |  UNION ALL SELECT 'fk_orderkey', n, v_fk FROM b CROSS JOIN fk
        |  UNION ALL SELECT 'not_null_keys', n, v_null FROM b
        |  UNION ALL SELECT 'positive_price', n, v_price FROM b
        |  UNION ALL SELECT 'quantity_le_45', n, v_qty45 FROM b
        |  UNION ALL SELECT 'quantity_range', n, v_qty FROM b
        |  UNION ALL SELECT 'tax_range', n, v_tax FROM b
        |  UNION ALL SELECT 'unique_line', n, n - n_distinct FROM b
        |  UNION ALL SELECT 'valid_flags', n, v_flag FROM b)
        |SELECT check_name, n_rows, n_violations,
        |  n_violations = 0 AS pass
        |FROM r ORDER BY check_name NULLS FIRST""".stripMargin,

    // q255: forecast backtest — denominators cleared into exact
    // integers (f = num/den), per-day ratios nano-floored before the
    // mean so no float accumulates across rows.
    "q255_forecast_backtest" -> {
      val lags = (1 to 8).map { k =>
        val wt = 1L << (8 - k)
        (s"COALESCE(LAG(cents, $k) OVER w, 0) * $wt",
          s"CASE WHEN LAG(cents, $k) OVER w IS NOT NULL THEN $wt ELSE 0 END")
      }
      s"""WITH d AS (SELECT CAST(o_orderdate AS DATE) AS day,
         |    CAST(SUM(CAST(FLOOR(o_totalprice * 100.0 + 0.5) AS BIGINT))
         |      AS BIGINT) AS cents
         |  FROM orders GROUP BY 1),
         |f AS (SELECT day, cents,
         |    ${lags.map(_._1).mkString(" + ")} AS num,
         |    ${lags.map(_._2).mkString(" + ")} AS den
         |  FROM d WINDOW w AS (ORDER BY day)),
         |s AS (SELECT
         |    CAST(FLOOR(2.0 * abs(CAST(cents * den - num AS DOUBLE))
         |      / CAST(cents * den + num AS DOUBLE) * 1000000000.0
         |      + 0.5) AS BIGINT) AS smape9,
         |    CAST(FLOOR(CAST(cents * den - num AS DOUBLE)
         |      / CAST(cents * den + num AS DOUBLE) * 1000000000.0
         |      + 0.5) AS BIGINT) AS bias9,
         |    CASE WHEN cents * 2 * den > num * 3 THEN 1 ELSE 0 END
         |      AS hi,
         |    CASE WHEN cents * 2 * den < num THEN 1 ELSE 0 END AS lo
         |  FROM f WHERE den > 0),
         |g AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_days,
         |    CAST(SUM(smape9) AS BIGINT) AS s9,
         |    CAST(SUM(bias9) AS BIGINT) AS b9,
         |    CAST(SUM(hi) AS BIGINT) AS n_high,
         |    CAST(SUM(lo) AS BIGINT) AS n_low
         |  FROM s)
         |SELECT n_days,
         |  ${val6("CAST(s9 AS DOUBLE) / CAST(n_days AS DOUBLE)" +
             " / 1000000000.0")} AS smape,
         |  ${val6("CAST(b9 AS DOUBLE) / CAST(n_days AS DOUBLE)" +
             " / 1000000000.0")} AS bias,
         |  n_high, n_low,
         |  ${val6("CAST(n_high + n_low AS DOUBLE)" +
             " / CAST(n_days AS DOUBLE)")} AS alert_rate
         |FROM g""".stripMargin
    },

    // q256: association rules — support/confidence/lift over the q249
    // co-purchase frame; global top-20 by raw lift, (co, u, v) ties.
    "q256_assoc_rules" ->
      s"""WITH bo AS (SELECT DISTINCT l_orderkey AS okey,
         |    l_partkey AS id FROM lineitem),
         |nb AS (SELECT CAST(COUNT(DISTINCT okey) AS BIGINT) AS n
         |  FROM bo),
         |deg AS (SELECT id, CAST(COUNT(*) AS BIGINT) AS d
         |  FROM bo GROUP BY 1),
         |co AS (SELECT a.id AS u, b.id AS v,
         |    CAST(COUNT(*) AS BIGINT) AS co
         |  FROM bo a JOIN bo b ON a.okey = b.okey AND a.id <> b.id
         |  GROUP BY 1, 2 HAVING COUNT(*) >= 2),
         |s AS (SELECT co.u, co.v, co.co, du.d AS du, dv.d AS dv,
         |    CAST(co.co * nb.n AS DOUBLE)
         |      / CAST(du.d * dv.d AS DOUBLE) AS lift_raw
         |  FROM co JOIN deg du ON co.u = du.id
         |          JOIN deg dv ON co.v = dv.id
         |          CROSS JOIN nb),
         |r AS (SELECT *, CAST(ROW_NUMBER() OVER (ORDER BY
         |    lift_raw DESC, co DESC, u, v) AS BIGINT) AS rank
         |  FROM s)
         |SELECT rank, u AS antecedent, v AS consequent, co AS support,
         |  ${val6("CAST(co AS DOUBLE) / CAST(du AS DOUBLE)")}
         |    AS confidence,
         |  ${val6("lift_raw")} AS lift
         |FROM r WHERE rank <= 20
         |ORDER BY rank NULLS FIRST""".stripMargin,

    // q257: Gini + top-decile share — exact BIGINT rank sums, ties on
    // custkey (the q246 discipline), one IEEE division per output.
    "q257_concentration" ->
      s"""WITH cc AS (SELECT c.c_mktsegment AS mktsegment, o.o_custkey,
         |    CAST(SUM(CAST(FLOOR(o_totalprice * 100.0 + 0.5) AS BIGINT))
         |      AS BIGINT) AS cents
         |  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
         |  GROUP BY 1, 2),
         |r AS (SELECT mktsegment, cents,
         |    CAST(ROW_NUMBER() OVER (PARTITION BY mktsegment
         |      ORDER BY cents, o_custkey) AS BIGINT) AS rk,
         |    COUNT(*) OVER (PARTITION BY mktsegment) AS n
         |  FROM cc),
         |k AS (SELECT mktsegment, cents, rk, n,
         |    CAST(FLOOR(n * 0.1) AS BIGINT) AS k FROM r),
         |g AS (SELECT mktsegment, MAX(n) AS n, MAX(k) AS k,
         |    CAST(SUM(cents) AS BIGINT) AS sx,
         |    CAST(SUM(rk * cents) AS BIGINT) AS srx,
         |    CAST(SUM(CASE WHEN rk > n - k THEN cents END) AS BIGINT)
         |      AS topc
         |  FROM k GROUP BY 1)
         |SELECT mktsegment, n AS n_customers,
         |  CAST(sx AS DOUBLE) / 100.0 AS revenue,
         |  ${val6("CAST(2 * srx - (n + 1) * sx AS DOUBLE)" +
             " / CAST(n * sx AS DOUBLE)")} AS gini,
         |  ${val6("CAST(topc AS DOUBLE) / CAST(sx AS DOUBLE)")}
         |    AS top_decile_share
         |FROM g ORDER BY mktsegment NULLS FIRST""".stripMargin,

    // q258: inter-purchase gaps — exact µs lags, hour-grain bucketed
    // CDF, integer cross-multiplied quantile thresholds.
    "q258_purchase_gaps" ->
      s"""WITH p AS (SELECT user_id, event_id,
         |    epoch_us(ts) AS us
         |  FROM events WHERE event_type = 'purchase'),
         |g AS (SELECT us - LAG(us) OVER (PARTITION BY user_id
         |    ORDER BY us, event_id) AS gap_us FROM p),
         |gg AS (SELECT gap_us FROM g WHERE gap_us IS NOT NULL),
         |b AS (SELECT gap_us // 3600000000 AS h,
         |    CAST(COUNT(*) AS BIGINT) AS c,
         |    CAST(SUM(gap_us) AS BIGINT) AS s
         |  FROM gg GROUP BY 1),
         |cb AS (SELECT h, c, s,
         |    SUM(c) OVER (ORDER BY h ROWS UNBOUNDED PRECEDING) AS cum
         |  FROM b),
         |t AS (SELECT CAST(SUM(c) AS BIGINT) AS n,
         |    CAST(SUM(s) AS BIGINT) AS sus FROM b)
         |SELECT MAX(n) AS n_gaps,
         |  MIN(CASE WHEN cum * 2 >= n THEN h END) AS median_gap_hours,
         |  MIN(CASE WHEN cum * 10 >= n * 9 THEN h END)
         |    AS p90_gap_hours,
         |  MAX(h) AS max_gap_hours,
         |  ${val6("CAST(MAX(sus) AS DOUBLE) / CAST(MAX(n) AS DOUBLE)" +
             " / 3600000000.0")} AS mean_gap_hours
         |FROM cb CROSS JOIN t""".stripMargin,

    // q259: share-of-parent geo rollup — nation-grain cents, window
    // totals over the 25-row frame, one IEEE division per share.
    "q259_geo_rollup" ->
      s"""WITH bn AS (SELECT c.c_nationkey,
         |    CAST(SUM(CAST(FLOOR(o_totalprice * 100.0 + 0.5) AS BIGINT))
         |      AS BIGINT) AS cents,
         |    CAST(COUNT(*) AS BIGINT) AS n_orders
         |  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
         |  GROUP BY 1),
         |j AS (SELECT r.r_name, n.n_name, bn.n_orders, bn.cents
         |  FROM bn JOIN nation n ON bn.c_nationkey = n.n_nationkey
         |          JOIN region r ON n.n_regionkey = r.r_regionkey),
         |w AS (SELECT *,
         |    SUM(cents) OVER (PARTITION BY r_name) AS rcents,
         |    SUM(cents) OVER () AS wcents,
         |    CAST(ROW_NUMBER() OVER (PARTITION BY r_name
         |      ORDER BY cents DESC, n_name) AS BIGINT) AS rank_in_region
         |  FROM j)
         |SELECT r_name AS region, n_name AS nation, n_orders,
         |  CAST(cents AS DOUBLE) / 100.0 AS revenue,
         |  ${val6("CAST(cents AS DOUBLE) / CAST(rcents AS DOUBLE)")}
         |    AS share_of_region,
         |  rank_in_region,
         |  ${val6("CAST(rcents AS DOUBLE) / CAST(wcents AS DOUBLE)")}
         |    AS region_share
         |FROM w
         |ORDER BY region NULLS FIRST, rank_in_region NULLS FIRST"""
        .stripMargin,

    // q260: session path trigrams — q17 sessionization, leads masked
    // at the session boundary, rank ties broken lexically.
    "q260_session_trigrams" ->
      s"""WITH flagged AS (
         |  SELECT user_id, ts, event_id, event_type,
         |    CASE WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER w > 1800000000
         |         THEN 1 ELSE 0 END AS new_session
         |  FROM events
         |  WINDOW w AS (PARTITION BY user_id
         |    ORDER BY ts NULLS FIRST, event_id NULLS FIRST)),
         |sess AS (
         |  SELECT *, CAST(SUM(new_session) OVER (PARTITION BY user_id
         |    ORDER BY ts NULLS FIRST, event_id NULLS FIRST
         |    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
         |  FROM flagged),
         |tri AS (
         |  SELECT session_id, event_type AS step1,
         |    lead(event_type, 1) OVER w2 AS step2,
         |    lead(event_type, 2) OVER w2 AS step3,
         |    lead(session_id, 2) OVER w2 AS s3
         |  FROM sess
         |  WINDOW w2 AS (PARTITION BY user_id
         |    ORDER BY ts NULLS FIRST, event_id NULLS FIRST)),
         |c AS (SELECT step1, step2, step3, CAST(COUNT(*) AS BIGINT) AS n
         |  FROM tri WHERE s3 IS NOT NULL AND s3 = session_id
         |  GROUP BY 1, 2, 3),
         |r AS (SELECT *,
         |    CAST(ROW_NUMBER() OVER (ORDER BY n DESC,
         |      step1 NULLS FIRST, step2 NULLS FIRST, step3 NULLS FIRST)
         |      AS BIGINT) AS rank,
         |    CAST(SUM(n) OVER () AS BIGINT) AS tot
         |  FROM c)
         |SELECT rank, step1, step2, step3, n,
         |  ${val6("CAST(n AS DOUBLE) / CAST(tot AS DOUBLE)")} AS share
         |FROM r WHERE rank <= 20 ORDER BY rank NULLS FIRST""".stripMargin,

    // q261: grouped exact quartiles off the per-brand cents histogram;
    // Tukey fences scaled by 2 to stay integral.
    "q261_price_boxplot" ->
      s"""WITH hist AS (
         |  SELECT p_brand AS brand,
         |    CAST(FLOOR(l_extendedprice * 100.0 + 0.5) AS BIGINT) AS cents,
         |    CAST(COUNT(*) AS BIGINT) AS c
         |  FROM lineitem JOIN part ON l_partkey = p_partkey
         |  GROUP BY 1, 2),
         |cum AS (SELECT *,
         |    CAST(SUM(c) OVER (PARTITION BY brand ORDER BY cents
         |      NULLS FIRST ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum,
         |    CAST(SUM(c) OVER (PARTITION BY brand) AS BIGINT) AS n
         |  FROM hist),
         |q AS (SELECT brand, MAX(n) AS n_items,
         |    MIN(CASE WHEN cum * 4 >= n THEN cents END) AS q1c,
         |    MIN(CASE WHEN cum * 2 >= n THEN cents END) AS q2c,
         |    MIN(CASE WHEN cum * 4 >= n * 3 THEN cents END) AS q3c
         |  FROM cum GROUP BY brand),
         |o AS (SELECT hist.brand,
         |    COALESCE(SUM(CASE WHEN cents * 2 < q1c * 2 - (q3c - q1c) * 3
         |        OR cents * 2 > q3c * 2 + (q3c - q1c) * 3
         |      THEN c END), 0) AS n_outliers
         |  FROM hist JOIN q ON hist.brand = q.brand
         |  GROUP BY 1)
         |SELECT q.brand, n_items,
         |  CAST(q1c AS DOUBLE) / 100.0 AS p25,
         |  CAST(q2c AS DOUBLE) / 100.0 AS median,
         |  CAST(q3c AS DOUBLE) / 100.0 AS p75,
         |  CAST(q3c - q1c AS DOUBLE) / 100.0 AS iqr,
         |  CAST(n_outliers AS BIGINT) AS n_outliers
         |FROM q JOIN o ON q.brand = o.brand
         |ORDER BY q.brand NULLS FIRST""".stripMargin,

    // q262: Nelson–Aalen cumulative hazard of the second purchase —
    // integer day grain, floor-scaled nano-hazard running sum.
    "q262_repeat_hazard" ->
      s"""WITH p AS (SELECT user_id, event_id, epoch_us(ts) AS us
         |  FROM events WHERE event_type = 'purchase'),
         |r AS (SELECT user_id, us,
         |    ROW_NUMBER() OVER (PARTITION BY user_id
         |      ORDER BY us NULLS FIRST, event_id NULLS FIRST) AS rn
         |  FROM p),
         |e AS (SELECT MAX(us) AS end_us FROM p),
         |u AS (SELECT user_id,
         |    MIN(CASE WHEN rn = 1 THEN us END) AS t1,
         |    MIN(CASE WHEN rn = 2 THEN us END) AS t2
         |  FROM r WHERE rn <= 2 GROUP BY user_id),
         |s AS (SELECT
         |    CASE WHEN t2 IS NOT NULL
         |      THEN (t2 - t1) // 86400000000 END AS event_day,
         |    CASE WHEN t2 IS NULL
         |      THEN (end_us - t1) // 86400000000 END AS censor_day
         |  FROM u CROSS JOIN e),
         |h AS (SELECT COALESCE(event_day, censor_day) AS day,
         |    CAST(COUNT(*) AS BIGINT) AS ended,
         |    CAST(SUM(CASE WHEN event_day IS NOT NULL THEN 1 ELSE 0 END)
         |      AS BIGINT) AS n_converted
         |  FROM s GROUP BY 1),
         |w AS (SELECT *, CAST(SUM(ended) OVER (ORDER BY day DESC
         |    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS n_risk FROM h),
         |z AS (SELECT day, n_risk, n_converted,
         |    (n_converted * 1000000000) // n_risk AS nano_h
         |  FROM w WHERE n_converted > 0),
         |c AS (SELECT *, CAST(SUM(nano_h) OVER (ORDER BY day
         |    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_nano FROM z)
         |SELECT day, n_risk, n_converted,
         |  ${val6("CAST(n_converted AS DOUBLE) / CAST(n_risk AS DOUBLE)")}
         |    AS hazard,
         |  CAST(cum_nano AS DOUBLE) / 1000000000.0 AS cum_hazard
         |FROM c ORDER BY day NULLS FIRST""".stripMargin,

    // q263: Wilson 95% interval — exact distinct counts, the bound a
    // single fixed-shape IEEE expression mirrored tree-for-tree.
    "q263_wilson_conversion" -> {
      val (phat, lo, hi) = wilsonSql(
        "CAST(n_users AS DOUBLE)", "CAST(n_buyers AS DOUBLE)")
      s"""WITH g AS (SELECT
         |    CAST(date_trunc('week', CAST(ts AS DATE)) AS DATE) AS week,
         |    CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
         |    CAST(COUNT(DISTINCT CASE WHEN event_type = 'purchase'
         |      THEN user_id END) AS BIGINT) AS n_buyers
         |  FROM events GROUP BY 1)
         |SELECT week, n_users, n_buyers,
         |  ${val6(phat)} AS conversion,
         |  ${val6(lo)} AS wilson_lo,
         |  ${val6(hi)} AS wilson_hi
         |FROM g ORDER BY week NULLS FIRST""".stripMargin
    },

    // q264: monthly brand share + MoM delta/rank move off the
    // (month, brand) cents grain.
    "q264_brand_share_shift" ->
      s"""WITH m AS (SELECT
         |    CAST(date_trunc('month', l_shipdate) AS DATE) AS month,
         |    p_brand AS brand,
         |    CAST(SUM(CAST(FLOOR(l_extendedprice * 100.0 + 0.5)
         |      AS BIGINT)) AS BIGINT) AS cents
         |  FROM lineitem JOIN part ON l_partkey = p_partkey
         |  GROUP BY 1, 2),
         |w AS (SELECT *,
         |    CAST(SUM(cents) OVER (PARTITION BY month) AS BIGINT)
         |      AS mtot,
         |    CAST(ROW_NUMBER() OVER (PARTITION BY month
         |      ORDER BY cents DESC, brand NULLS FIRST) AS BIGINT)
         |      AS rank_in_month
         |  FROM m),
         |l AS (SELECT *,
         |    lag(cents) OVER wb AS prev_cents,
         |    lag(mtot) OVER wb AS prev_mtot,
         |    lag(rank_in_month) OVER wb AS prev_rank
         |  FROM w
         |  WINDOW wb AS (PARTITION BY brand ORDER BY month NULLS FIRST))
         |SELECT month, brand,
         |  CAST(cents AS DOUBLE) / 100.0 AS revenue,
         |  ${val6("CAST(cents AS DOUBLE) / CAST(mtot AS DOUBLE)")}
         |    AS share,
         |  rank_in_month,
         |  CASE WHEN prev_cents IS NOT NULL THEN
         |    ${val6("CAST(cents AS DOUBLE) / CAST(mtot AS DOUBLE)" +
             " - CAST(prev_cents AS DOUBLE) / CAST(prev_mtot AS DOUBLE)")}
         |  END AS share_delta,
         |  prev_rank - rank_in_month AS rank_move
         |FROM l
         |ORDER BY month NULLS FIRST, brand NULLS FIRST""".stripMargin,

    // q265: first-touch stage latencies — per-pair hour-grain bucketed
    // CDF, integer cross-multiplied quantile thresholds.
    "q265_stage_latency" ->
      s"""WITH w AS (SELECT user_id,
         |    MIN(CASE WHEN event_type = 'signup'
         |      THEN epoch_us(ts) END) AS t_signup,
         |    MIN(CASE WHEN event_type = 'view'
         |      THEN epoch_us(ts) END) AS t_view,
         |    MIN(CASE WHEN event_type = 'click'
         |      THEN epoch_us(ts) END) AS t_click,
         |    MIN(CASE WHEN event_type = 'purchase'
         |      THEN epoch_us(ts) END) AS t_purchase
         |  FROM events GROUP BY 1),
         |lat AS (
         |  SELECT 'signup_to_view' AS stage_pair,
         |    t_view - t_signup AS gap_us FROM w
         |  UNION ALL SELECT 'view_to_click', t_click - t_view FROM w
         |  UNION ALL SELECT 'click_to_purchase',
         |    t_purchase - t_click FROM w),
         |f AS (SELECT * FROM lat
         |  WHERE gap_us IS NOT NULL AND gap_us >= 0),
         |b AS (SELECT stage_pair, gap_us // 3600000000 AS h,
         |    CAST(COUNT(*) AS BIGINT) AS c,
         |    CAST(SUM(gap_us) AS BIGINT) AS s
         |  FROM f GROUP BY 1, 2),
         |cb AS (SELECT *,
         |    CAST(SUM(c) OVER (PARTITION BY stage_pair ORDER BY h
         |      NULLS FIRST ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum,
         |    CAST(SUM(c) OVER (PARTITION BY stage_pair) AS BIGINT) AS n,
         |    CAST(SUM(s) OVER (PARTITION BY stage_pair) AS BIGINT) AS sus
         |  FROM b)
         |SELECT stage_pair, MAX(n) AS n_users,
         |  MIN(CASE WHEN cum * 2 >= n THEN h END) AS median_hours,
         |  MIN(CASE WHEN cum * 10 >= n * 9 THEN h END) AS p90_hours,
         |  ${val6("CAST(MAX(sus) AS DOUBLE) / CAST(MAX(n) AS DOUBLE)" +
             " / 3600000000.0")} AS mean_hours
         |FROM cb GROUP BY stage_pair
         |ORDER BY stage_pair NULLS FIRST""".stripMargin,

    // q266: like-for-like MoM index — parts sold in both calendar-
    // adjacent months, lag chain keyed on part.
    "q266_comparable_index" ->
      s"""WITH m AS (SELECT
         |    CAST(date_trunc('month', l_shipdate) AS DATE) AS month,
         |    l_partkey,
         |    CAST(SUM(CAST(FLOOR(l_extendedprice * 100.0 + 0.5)
         |      AS BIGINT)) AS BIGINT) AS cents
         |  FROM lineitem GROUP BY 1, 2),
         |mi AS (SELECT *, year(month) * 12 + month(month) AS mi FROM m),
         |l AS (SELECT *, lag(cents) OVER wp AS prev_cents,
         |    lag(mi) OVER wp AS prev_mi
         |  FROM mi
         |  WINDOW wp AS (PARTITION BY l_partkey ORDER BY mi NULLS FIRST)),
         |g AS (SELECT month, CAST(COUNT(*) AS BIGINT) AS n_parts,
         |    CAST(SUM(CASE WHEN prev_mi IS NOT NULL AND prev_mi = mi - 1
         |      THEN 1 ELSE 0 END) AS BIGINT) AS n_comparable,
         |    CAST(SUM(cents) AS BIGINT) AS tot_cents,
         |    CAST(SUM(CASE WHEN prev_mi = mi - 1 THEN cents END)
         |      AS BIGINT) AS comp_cents,
         |    CAST(SUM(CASE WHEN prev_mi = mi - 1 THEN prev_cents END)
         |      AS BIGINT) AS comp_prev_cents
         |  FROM l GROUP BY 1)
         |SELECT month, n_parts, n_comparable,
         |  CAST(tot_cents AS DOUBLE) / 100.0 AS revenue,
         |  ${val6("CAST(comp_cents AS DOUBLE)" +
             " / CAST(comp_prev_cents AS DOUBLE)")} AS index_mom,
         |  ${val6("CAST(comp_cents AS DOUBLE)" +
             " / CAST(tot_cents AS DOUBLE)")} AS coverage
         |FROM g WHERE n_comparable > 0
         |ORDER BY month NULLS FIRST""".stripMargin,

    // q267: per-part OLS demand slope from BIGINT power sums, top-20.
    "q267_demand_movers" ->
      s"""WITH a AS (SELECT MIN(l_shipdate) AS d0 FROM lineitem),
         |x AS (SELECT l_partkey,
         |    CAST(date_diff('day', d0, l_shipdate) AS BIGINT) AS x,
         |    CAST(FLOOR(l_quantity * 100.0 + 0.5) AS BIGINT) AS y
         |  FROM lineitem CROSS JOIN a),
         |s AS (SELECT l_partkey, CAST(COUNT(*) AS BIGINT) AS n,
         |    CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
         |    CAST(SUM(x * y) AS BIGINT) AS sxy,
         |    CAST(SUM(x * x) AS BIGINT) AS sxx
         |  FROM x GROUP BY 1),
         |f AS (SELECT * FROM s
         |  WHERE n >= 2 AND n * sxx - sx * sx > 0),
         |r AS (SELECT *,
         |    ${val6("CAST(n * sxy - sx * sy AS DOUBLE) * 30.0" +
             " / CAST(n * sxx - sx * sx AS DOUBLE) / 100.0")}
         |      AS slope_30d
         |  FROM f),
         |t AS (SELECT *, CAST(ROW_NUMBER() OVER (ORDER BY slope_30d
         |    DESC, l_partkey NULLS FIRST) AS BIGINT) AS rank FROM r)
         |SELECT rank, t.l_partkey AS partkey, p_brand AS brand,
         |  n AS n_lines, CAST(sy AS DOUBLE) / 100.0 AS total_qty,
         |  slope_30d
         |FROM t JOIN part ON t.l_partkey = p_partkey
         |WHERE rank <= 20 ORDER BY rank NULLS FIRST""".stripMargin,

    // q268: Mann–Whitney over the shared cents histogram — midranks
    // double-scaled integral, tie-corrected variance, one z tree.
    "q268_rank_sum_test" -> {
      val n1d = "CAST(n1 AS DOUBLE)"
      val n2d = "CAST(n2 AS DOUBLE)"
      val nnd = "CAST(n1 + n2 AS DOUBLE)"
      val u1x2 = "r1x2 - n1 * (n1 + 1)"
      val varU = s"$n1d * $n2d / 12.0 * (($nnd + 1.0)" +
        s" - CAST(ties AS DOUBLE) / ($nnd * ($nnd - 1.0)))"
      val z = s"CAST($u1x2 - n1 * n2 AS DOUBLE) / (2.0 * sqrt($varU))"
      s"""WITH j AS (SELECT (c_mktsegment = 'BUILDING') AS is_a,
         |    CAST(FLOOR(o_totalprice * 100.0 + 0.5) AS BIGINT) AS cents
         |  FROM orders JOIN customer ON o_custkey = c_custkey
         |  WHERE c_mktsegment IN ('BUILDING', 'MACHINERY')),
         |h AS (SELECT cents,
         |    CAST(SUM(CASE WHEN is_a THEN 1 ELSE 0 END) AS BIGINT)
         |      AS c1,
         |    CAST(SUM(CASE WHEN NOT is_a THEN 1 ELSE 0 END) AS BIGINT)
         |      AS c2
         |  FROM j GROUP BY 1),
         |c AS (SELECT *, c1 + c2 AS c,
         |    CAST(SUM(c1 + c2) OVER (ORDER BY cents NULLS FIRST
         |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum
         |  FROM h),
         |g AS (SELECT CAST(SUM(c1) AS BIGINT) AS n1,
         |    CAST(SUM(c2) AS BIGINT) AS n2,
         |    CAST(SUM(c1 * ((cum - c) * 2 + c + 1)) AS BIGINT) AS r1x2,
         |    CAST(SUM(c * c * c - c) AS BIGINT) AS ties
         |  FROM c)
         |SELECT n1, n2,
         |  CAST($u1x2 AS DOUBLE) / 2.0 AS u_stat,
         |  ${val6(s"CAST($u1x2 AS DOUBLE) / (2.0 * $n1d * $n2d)")}
         |    AS p_superior,
         |  ${val6(z)} AS z,
         |  abs($z) > 1.96 AS significant
         |FROM g""".stripMargin
    },

    // q269: two-sample KS — exact integer argmax of |cum1·n2 − cum2·n1|
    // over the shared CDF grain; two final divisions + one sqrt.
    "q269_ks_test" -> {
      val n1d = "CAST(n1 AS DOUBLE)"
      val n2d = "CAST(n2 AS DOUBLE)"
      val dstat = s"CAST(d_x AS DOUBLE) / ($n1d * $n2d)"
      val dcrit = s"1.358 * sqrt(($n1d + $n2d) / ($n1d * $n2d))"
      s"""WITH j AS (SELECT (c_mktsegment = 'BUILDING') AS is_a,
         |    CAST(FLOOR(o_totalprice * 100.0 + 0.5) AS BIGINT) AS cents
         |  FROM orders JOIN customer ON o_custkey = c_custkey
         |  WHERE c_mktsegment IN ('BUILDING', 'MACHINERY')),
         |h AS (SELECT cents,
         |    CAST(SUM(CASE WHEN is_a THEN 1 ELSE 0 END) AS BIGINT)
         |      AS c1,
         |    CAST(SUM(CASE WHEN NOT is_a THEN 1 ELSE 0 END) AS BIGINT)
         |      AS c2
         |  FROM j GROUP BY 1),
         |c AS (SELECT *,
         |    CAST(SUM(c1 + c2) OVER w AS BIGINT) AS cum,
         |    CAST(SUM(c1) OVER w AS BIGINT) AS cum1
         |  FROM h
         |  WINDOW w AS (ORDER BY cents NULLS FIRST
         |    ROWS UNBOUNDED PRECEDING)),
         |t AS (SELECT CAST(SUM(c1) AS BIGINT) AS n1,
         |    CAST(SUM(c2) AS BIGINT) AS n2 FROM h),
         |g AS (SELECT
         |    CAST(MAX(ABS(cum1 * n2 - (cum - cum1) * n1)) AS BIGINT)
         |      AS d_x,
         |    MAX(n1) AS n1, MAX(n2) AS n2
         |  FROM c CROSS JOIN t)
         |SELECT n1, n2,
         |  ${val6(dstat)} AS d_stat,
         |  ${val6(dcrit)} AS d_crit_05,
         |  ($dstat) > ($dcrit) AS significant
         |FROM g""".stripMargin
    },

    // q270: cohort LTV — q66's week math, purchase cents, per-cohort
    // running sum, (cum/100)/n in a fixed tree.
    "q270_cohort_ltv" ->
      s"""WITH p AS (SELECT user_id, CAST(ts AS DATE) AS day,
         |    CAST(FLOOR(value * 100.0 + 0.5) AS BIGINT) AS cents
         |  FROM events WHERE event_type = 'purchase'),
         |c AS (SELECT user_id, CAST(date_trunc('week', MIN(day))
         |    AS DATE) AS cohort_week FROM p GROUP BY 1),
         |s AS (SELECT cohort_week, CAST(COUNT(*) AS BIGINT) AS n_users
         |  FROM c GROUP BY 1),
         |cells AS (SELECT cohort_week,
         |    CAST(date_diff('day', cohort_week,
         |      CAST(date_trunc('week', day) AS DATE)) / 7 AS INT)
         |      AS weeks_since,
         |    CAST(SUM(cents) AS BIGINT) AS cents
         |  FROM p JOIN c USING (user_id) GROUP BY 1, 2),
         |w AS (SELECT cells.*, n_users,
         |    CAST(SUM(cents) OVER (PARTITION BY cells.cohort_week
         |      ORDER BY weeks_since NULLS FIRST
         |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_cents
         |  FROM cells JOIN s USING (cohort_week))
         |SELECT cohort_week, weeks_since, n_users,
         |  CAST(cents AS DOUBLE) / 100.0 AS revenue,
         |  CAST(cum_cents AS DOUBLE) / 100.0 AS cum_revenue,
         |  ${val6("CAST(cum_cents AS DOUBLE) / 100.0" +
             " / CAST(n_users AS DOUBLE)")} AS ltv_per_user
         |FROM w ORDER BY cohort_week NULLS FIRST,
         |  weeks_since NULLS FIRST""".stripMargin,

    // q271: ABC classes — (revenue DESC, partkey) rank + running sum,
    // integer cross-multiplied 80/95 cuts.
    "q271_abc_classes" ->
      s"""WITH rev AS (SELECT l_partkey,
         |    CAST(SUM(CAST(FLOOR(l_extendedprice * 100.0 + 0.5)
         |      AS BIGINT)) AS BIGINT) AS cents
         |  FROM lineitem GROUP BY 1),
         |r AS (SELECT *, CAST(ROW_NUMBER() OVER o AS BIGINT) AS rank,
         |    CAST(SUM(cents) OVER (o ROWS UNBOUNDED PRECEDING)
         |      AS BIGINT) AS cum_cents
         |  FROM rev
         |  WINDOW o AS (ORDER BY cents DESC, l_partkey NULLS FIRST)),
         |t AS (SELECT CAST(SUM(cents) AS BIGINT) AS tot FROM rev),
         |c AS (SELECT *, CASE WHEN cum_cents * 5 <= tot * 4 THEN 'A'
         |    WHEN cum_cents * 20 <= tot * 19 THEN 'B' ELSE 'C' END
         |    AS abc_class
         |  FROM r CROSS JOIN t)
         |SELECT abc_class, CAST(COUNT(*) AS BIGINT) AS n_parts,
         |  CAST(CAST(SUM(cents) AS BIGINT) AS DOUBLE) / 100.0
         |    AS revenue,
         |  ${val6("CAST(CAST(SUM(cents) AS BIGINT) AS DOUBLE)" +
             " / CAST(MAX(tot) AS DOUBLE)")} AS revenue_share,
         |  MIN(rank) AS rank_from, MAX(rank) AS rank_to
         |FROM c GROUP BY 1 ORDER BY abc_class NULLS FIRST""".stripMargin,

    // q272: index of dispersion per priority from BIGINT power sums.
    "q272_basket_dispersion" -> {
      val mean = "CAST(sk AS DOUBLE) / CAST(n_orders AS DOUBLE)"
      val vr = "CAST(n_orders * skk - sk * sk AS DOUBLE)" +
        " / (CAST(n_orders AS DOUBLE) * (CAST(n_orders AS DOUBLE) - 1.0))"
      s"""WITH k AS (SELECT l_orderkey, CAST(COUNT(*) AS BIGINT) AS k
         |  FROM lineitem GROUP BY 1),
         |g AS (SELECT o_orderpriority,
         |    CAST(COUNT(*) AS BIGINT) AS n_orders,
         |    CAST(SUM(k) AS BIGINT) AS sk,
         |    CAST(SUM(k * k) AS BIGINT) AS skk
         |  FROM k JOIN orders ON l_orderkey = o_orderkey
         |  GROUP BY 1)
         |SELECT o_orderpriority AS priority, n_orders,
         |  ${val6(mean)} AS mean_items,
         |  ${val6(vr)} AS var_items,
         |  ${val6(s"($vr) / ($mean)")} AS dispersion,
         |  ($vr) / ($mean) > 1.0 AS overdispersed
         |FROM g ORDER BY priority NULLS FIRST""".stripMargin
    },

    // q273: acquisition-vs-retention decomposition — first order month
    // per customer, exact cents split.
    "q273_new_vs_returning" ->
      s"""WITH o AS (SELECT o_custkey,
         |    CAST(date_trunc('month', CAST(o_orderdate AS DATE))
         |      AS DATE) AS month,
         |    CAST(FLOOR(o_totalprice * 100.0 + 0.5) AS BIGINT) AS cents
         |  FROM orders),
         |f AS (SELECT o_custkey, MIN(month) AS first_month
         |  FROM o GROUP BY 1),
         |j AS (SELECT o.*, (month = first_month) AS is_new
         |  FROM o JOIN f USING (o_custkey)),
         |g AS (SELECT month, CAST(COUNT(*) AS BIGINT) AS n_orders,
         |    CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS n_customers,
         |    CAST(COUNT(DISTINCT CASE WHEN is_new THEN o_custkey END)
         |      AS BIGINT) AS n_new_customers,
         |    CAST(SUM(CASE WHEN is_new THEN cents ELSE 0 END)
         |      AS BIGINT) AS new_cents,
         |    CAST(SUM(cents) AS BIGINT) AS tot_cents
         |  FROM j GROUP BY 1)
         |SELECT month, n_orders, n_customers, n_new_customers,
         |  CAST(tot_cents AS DOUBLE) / 100.0 AS revenue,
         |  CAST(new_cents AS DOUBLE) / 100.0 AS new_revenue,
         |  ${val6("CAST(new_cents AS DOUBLE)" +
             " / CAST(tot_cents AS DOUBLE)")} AS new_share
         |FROM g ORDER BY month NULLS FIRST""".stripMargin,

    // q274: entry-type conversion with the q263 Wilson tree; the
    // session's first event via rn=1 on the q17 session id.
    "q274_entry_conversion" -> {
      val (phat, lo, hi) = wilsonSql(
        "CAST(n_sessions AS DOUBLE)", "CAST(n_converted AS DOUBLE)")
      s"""WITH flagged AS (
         |  SELECT user_id, ts, event_id, event_type,
         |    CASE WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER w
         |        > 1800000000
         |      THEN 1 ELSE 0 END AS new_session
         |  FROM events
         |  WINDOW w AS (PARTITION BY user_id
         |    ORDER BY ts NULLS FIRST, event_id NULLS FIRST)),
         |sess AS (
         |  SELECT *, CAST(SUM(new_session) OVER (PARTITION BY user_id
         |    ORDER BY ts NULLS FIRST, event_id NULLS FIRST
         |    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
         |  FROM flagged),
         |rn AS (SELECT user_id, session_id, event_type,
         |    ROW_NUMBER() OVER (PARTITION BY user_id, session_id
         |      ORDER BY ts NULLS FIRST, event_id NULLS FIRST) AS rn
         |  FROM sess),
         |conv AS (SELECT user_id, session_id,
         |    CAST(MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0
         |      END) AS BIGINT) AS converted
         |  FROM sess GROUP BY 1, 2),
         |entry AS (SELECT user_id, session_id,
         |    event_type AS entry_type FROM rn WHERE rn = 1),
         |g AS (SELECT entry_type,
         |    CAST(COUNT(*) AS BIGINT) AS n_sessions,
         |    CAST(SUM(converted) AS BIGINT) AS n_converted
         |  FROM entry JOIN conv USING (user_id, session_id)
         |  GROUP BY 1)
         |SELECT entry_type, n_sessions, n_converted,
         |  ${val6(phat)} AS conversion,
         |  ${val6(lo)} AS wilson_lo,
         |  ${val6(hi)} AS wilson_hi
         |FROM g ORDER BY entry_type NULLS FIRST""".stripMargin
    },

    // q275: tier migration — first-half quartile rubric (cross-
    // multiplied cuts), both halves scored against it, tier 0 = absent.
    "q275_tier_migration" ->
      s"""WITH o AS (SELECT o_custkey,
         |    CAST(o_orderdate AS DATE) AS day,
         |    CAST(FLOOR(o_totalprice * 100.0 + 0.5) AS BIGINT) AS cents
         |  FROM orders),
         |b AS (SELECT MIN(day) AS d0, MAX(day) AS d1 FROM o),
         |sp AS (SELECT o_custkey,
         |    CASE WHEN date_diff('day', d0, day) * 2
         |        <= date_diff('day', d0, d1) THEN 1 ELSE 2 END AS h,
         |    CAST(SUM(cents) AS BIGINT) AS cents
         |  FROM o CROSS JOIN b GROUP BY 1, 2),
         |hist AS (SELECT cents, CAST(COUNT(*) AS BIGINT) AS c
         |  FROM sp WHERE h = 1 GROUP BY 1),
         |r AS (SELECT *, CAST(SUM(c) OVER (ORDER BY cents NULLS FIRST
         |    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum FROM hist),
         |n AS (SELECT CAST(SUM(c) AS BIGINT) AS n FROM hist),
         |cuts AS (SELECT
         |    MIN(CASE WHEN cum * 4 >= n THEN cents END) AS q1,
         |    MIN(CASE WHEN cum * 2 >= n THEN cents END) AS q2,
         |    MIN(CASE WHEN cum * 4 >= n * 3 THEN cents END) AS q3
         |  FROM r CROSS JOIN n),
         |scored AS (SELECT o_custkey, h,
         |    CASE WHEN cents <= q1 THEN 1 WHEN cents <= q2 THEN 2
         |      WHEN cents <= q3 THEN 3 ELSE 4 END AS tier
         |  FROM sp CROSS JOIN cuts),
         |t1 AS (SELECT o_custkey, tier AS tier_h1 FROM scored
         |  WHERE h = 1),
         |t2 AS (SELECT o_custkey, tier AS tier_h2 FROM scored
         |  WHERE h = 2),
         |m AS (SELECT COALESCE(tier_h1, 0) AS tier_h1,
         |    COALESCE(tier_h2, 0) AS tier_h2,
         |    CAST(COUNT(*) AS BIGINT) AS n_customers
         |  FROM t1 FULL OUTER JOIN t2 USING (o_custkey)
         |  GROUP BY 1, 2),
         |tt AS (SELECT CAST(SUM(n_customers) AS BIGINT) AS tot FROM m)
         |SELECT tier_h1, tier_h2, n_customers,
         |  ${val6("CAST(n_customers AS DOUBLE) / CAST(tot AS DOUBLE)")}
         |    AS share
         |FROM m CROSS JOIN tt
         |ORDER BY tier_h1 NULLS FIRST, tier_h2 NULLS FIRST""".stripMargin,

    // q276: strictly-ordered funnel — chained first-after-previous
    // reductions, rollup over the 4-row stage frame.
    "q276_ordered_funnel" ->
      s"""WITH e AS (SELECT user_id, epoch_us(ts) AS us, event_type
         |  FROM events),
         |t1 AS (SELECT user_id, MIN(us) AS t FROM e
         |  WHERE event_type = 'signup' GROUP BY 1),
         |t2 AS (SELECT e.user_id, MIN(us) AS t FROM e
         |  JOIN (SELECT user_id, t AS tp FROM t1) p USING (user_id)
         |  WHERE event_type = 'view' AND us > tp GROUP BY 1),
         |t3 AS (SELECT e.user_id, MIN(us) AS t FROM e
         |  JOIN (SELECT user_id, t AS tp FROM t2) p USING (user_id)
         |  WHERE event_type = 'click' AND us > tp GROUP BY 1),
         |t4 AS (SELECT e.user_id, MIN(us) AS t FROM e
         |  JOIN (SELECT user_id, t AS tp FROM t3) p USING (user_id)
         |  WHERE event_type = 'purchase' AND us > tp GROUP BY 1),
         |c AS (
         |  SELECT 'signup' AS stage, 1 AS stage_rank,
         |    CAST(COUNT(*) AS BIGINT) AS n_reached FROM t1
         |  UNION ALL SELECT 'view', 2, CAST(COUNT(*) AS BIGINT) FROM t2
         |  UNION ALL SELECT 'click', 3, CAST(COUNT(*) AS BIGINT)
         |    FROM t3
         |  UNION ALL SELECT 'purchase', 4, CAST(COUNT(*) AS BIGINT)
         |    FROM t4),
         |w AS (SELECT *,
         |    lag(n_reached) OVER (ORDER BY stage_rank NULLS FIRST)
         |      AS prev,
         |    CAST(SUM(CASE WHEN stage_rank = 1 THEN n_reached ELSE 0
         |      END) OVER () AS BIGINT) AS n_first
         |  FROM c)
         |SELECT stage, stage_rank, n_reached,
         |  CASE WHEN prev IS NOT NULL THEN
         |    ${val6("CAST(n_reached AS DOUBLE) / CAST(prev AS DOUBLE)")}
         |  END AS conv_from_prev,
         |  ${val6("CAST(n_reached AS DOUBLE)" +
             " / CAST(n_first AS DOUBLE)")} AS share_of_first
         |FROM w ORDER BY stage_rank NULLS FIRST""".stripMargin,

    // q277: q276 with the 72h conversion-window residual on each
    // chained join.
    "q277_windowed_funnel" ->
      s"""WITH e AS (SELECT user_id, epoch_us(ts) AS us, event_type
         |  FROM events),
         |t1 AS (SELECT user_id, MIN(us) AS t FROM e
         |  WHERE event_type = 'signup' GROUP BY 1),
         |t2 AS (SELECT e.user_id, MIN(us) AS t FROM e
         |  JOIN (SELECT user_id, t AS tp FROM t1) p USING (user_id)
         |  WHERE event_type = 'view' AND us > tp
         |    AND us <= tp + 259200000000 GROUP BY 1),
         |t3 AS (SELECT e.user_id, MIN(us) AS t FROM e
         |  JOIN (SELECT user_id, t AS tp FROM t2) p USING (user_id)
         |  WHERE event_type = 'click' AND us > tp
         |    AND us <= tp + 259200000000 GROUP BY 1),
         |t4 AS (SELECT e.user_id, MIN(us) AS t FROM e
         |  JOIN (SELECT user_id, t AS tp FROM t3) p USING (user_id)
         |  WHERE event_type = 'purchase' AND us > tp
         |    AND us <= tp + 259200000000 GROUP BY 1),
         |c AS (
         |  SELECT 'signup' AS stage, 1 AS stage_rank,
         |    CAST(COUNT(*) AS BIGINT) AS n_reached FROM t1
         |  UNION ALL SELECT 'view', 2, CAST(COUNT(*) AS BIGINT) FROM t2
         |  UNION ALL SELECT 'click', 3, CAST(COUNT(*) AS BIGINT)
         |    FROM t3
         |  UNION ALL SELECT 'purchase', 4, CAST(COUNT(*) AS BIGINT)
         |    FROM t4),
         |w AS (SELECT *,
         |    lag(n_reached) OVER (ORDER BY stage_rank NULLS FIRST)
         |      AS prev,
         |    CAST(SUM(CASE WHEN stage_rank = 1 THEN n_reached ELSE 0
         |      END) OVER () AS BIGINT) AS n_first
         |  FROM c)
         |SELECT stage, stage_rank, n_reached,
         |  CASE WHEN prev IS NOT NULL THEN
         |    ${val6("CAST(n_reached AS DOUBLE) / CAST(prev AS DOUBLE)")}
         |  END AS conv_from_prev,
         |  ${val6("CAST(n_reached AS DOUBLE)" +
             " / CAST(n_first AS DOUBLE)")} AS share_of_first
         |FROM w ORDER BY stage_rank NULLS FIRST""".stripMargin,

    // q278: 7×24 heatmap — dow stated 0=Sunday on both engines.
    "q278_traffic_heatmap" ->
      s"""WITH g AS (SELECT CAST(date_part('dow', ts) AS INT) AS dow,
         |    CAST(date_part('hour', ts) AS INT) AS hour,
         |    CAST(COUNT(*) AS BIGINT) AS n_events
         |  FROM events GROUP BY 1, 2),
         |w AS (SELECT *, CAST(SUM(n_events) OVER () AS BIGINT) AS tot,
         |    CAST(ROW_NUMBER() OVER (ORDER BY n_events DESC,
         |      dow NULLS FIRST, hour NULLS FIRST) AS BIGINT) AS rank
         |  FROM g)
         |SELECT dow, hour, n_events,
         |  ${val6("CAST(n_events AS DOUBLE) / CAST(tot AS DOUBLE)")}
         |    AS share,
         |  rank
         |FROM w ORDER BY dow NULLS FIRST, hour NULLS FIRST""".stripMargin,

    // q279: 3-itemsets — the oracle proves the in-row triple expansion
    // against a relational 3-way self-join on the distinct basket.
    "q279_brand_triples" ->
      """WITH ob AS (SELECT DISTINCT l_orderkey, p_brand
        |  FROM lineitem JOIN part ON l_partkey = p_partkey),
        |t AS (SELECT a.p_brand AS brand_a, b.p_brand AS brand_b,
        |    c.p_brand AS brand_c, CAST(COUNT(*) AS BIGINT) AS support
        |  FROM ob a
        |  JOIN ob b ON a.l_orderkey = b.l_orderkey
        |    AND a.p_brand < b.p_brand
        |  JOIN ob c ON a.l_orderkey = c.l_orderkey
        |    AND b.p_brand < c.p_brand
        |  GROUP BY 1, 2, 3)
        |SELECT * FROM t WHERE support >= 4
        |ORDER BY brand_a NULLS FIRST, brand_b NULLS FIRST,
        |  brand_c NULLS FIRST""".stripMargin,

    // q280: next-order brand lead chain; order represented by its
    // highest-value line (ties: lowest partkey).
    "q280_brand_transitions" ->
      """WITH li AS (SELECT l_orderkey, p_brand,
        |    CAST(FLOOR(l_extendedprice * 100.0 + 0.5) AS BIGINT)
        |      AS cents,
        |    l_partkey
        |  FROM lineitem JOIN part ON l_partkey = p_partkey),
        |rep AS (SELECT l_orderkey, p_brand FROM (
        |    SELECT *, ROW_NUMBER() OVER (PARTITION BY l_orderkey
        |      ORDER BY cents DESC, l_partkey NULLS FIRST) AS rn
        |    FROM li) WHERE rn = 1),
        |o AS (SELECT o_custkey, o_orderkey,
        |    CAST(o_orderdate AS DATE) AS day, p_brand
        |  FROM orders JOIN rep ON o_orderkey = l_orderkey),
        |tr AS (SELECT p_brand AS from_brand,
        |    lead(p_brand) OVER (PARTITION BY o_custkey
        |      ORDER BY day NULLS FIRST, o_orderkey NULLS FIRST)
        |      AS to_brand
        |  FROM o),
        |c AS (SELECT from_brand, to_brand,
        |    CAST(COUNT(*) AS BIGINT) AS n
        |  FROM tr WHERE to_brand IS NOT NULL GROUP BY 1, 2),
        |r AS (SELECT *, CAST(ROW_NUMBER() OVER (ORDER BY n DESC,
        |    from_brand NULLS FIRST, to_brand NULLS FIRST) AS BIGINT)
        |    AS rank FROM c)
        |SELECT rank, from_brand, to_brand, n FROM r
        |WHERE rank <= 20 ORDER BY rank NULLS FIRST""".stripMargin,

    // q281: χ² + Cramér's V — per-cell terms floor-scaled to integer
    // nanos so the cross-cell sum is order-independent.
    "q281_chi_square" -> {
      val diff = "CAST(o * n - r * c AS DOUBLE)"
      val term = s"CAST(FLOOR($diff * $diff / (CAST(n AS DOUBLE)" +
        " * CAST(r AS DOUBLE) * CAST(c AS DOUBLE)) * 1.0E9) AS BIGINT)"
      val chi2 = "CAST(chi_nano AS DOUBLE) / 1.0E9"
      val v = s"sqrt(($chi2) / CAST(n * LEAST(nr - 1, nc - 1)" +
        " AS DOUBLE))"
      s"""WITH observed AS (SELECT c_mktsegment AS seg,
         |    o_orderpriority AS pri, CAST(COUNT(*) AS BIGINT) AS o
         |  FROM orders JOIN customer ON o_custkey = c_custkey
         |  GROUP BY 1, 2),
         |cells AS (SELECT s.seg, p.pri,
         |    CAST(COALESCE(ob.o, 0) AS BIGINT) AS o
         |  FROM (SELECT DISTINCT seg FROM observed) s
         |  CROSS JOIN (SELECT DISTINCT pri FROM observed) p
         |  LEFT JOIN observed ob ON ob.seg = s.seg AND ob.pri = p.pri),
         |t AS (SELECT *,
         |    CAST(SUM(o) OVER (PARTITION BY seg) AS BIGINT) AS r,
         |    CAST(SUM(o) OVER (PARTITION BY pri) AS BIGINT) AS c,
         |    CAST(SUM(o) OVER () AS BIGINT) AS n
         |  FROM cells),
         |g AS (SELECT CAST(SUM($term) AS BIGINT) AS chi_nano,
         |    MAX(n) AS n,
         |    CAST(COUNT(DISTINCT seg) AS BIGINT) AS nr,
         |    CAST(COUNT(DISTINCT pri) AS BIGINT) AS nc
         |  FROM t)
         |SELECT n AS n_orders, nr AS n_segments, nc AS n_priorities,
         |  (nr - 1) * (nc - 1) AS dof,
         |  ${val6(chi2)} AS chi2,
         |  ${val6(v)} AS cramers_v,
         |  CASE WHEN (nr - 1) * (nc - 1) = 16
         |    THEN ($chi2) > 26.296 END AS significant_05
         |FROM g""".stripMargin
    },

    // q282: lift = o·N/(r·c) over the (segment, brand) purchase-line
    // contingency, top-20 above the support floor.
    "q282_segment_affinity" -> {
      val lift = "CAST(o AS DOUBLE) * CAST(n AS DOUBLE)" +
        " / (CAST(r AS DOUBLE) * CAST(c AS DOUBLE))"
      s"""WITH cells AS (SELECT c_mktsegment AS segment,
         |    p_brand AS brand, CAST(COUNT(*) AS BIGINT) AS o
         |  FROM lineitem
         |  JOIN orders ON l_orderkey = o_orderkey
         |  JOIN customer ON o_custkey = c_custkey
         |  JOIN part ON l_partkey = p_partkey
         |  GROUP BY 1, 2),
         |t AS (SELECT *,
         |    CAST(SUM(o) OVER (PARTITION BY segment) AS BIGINT) AS r,
         |    CAST(SUM(o) OVER (PARTITION BY brand) AS BIGINT) AS c,
         |    CAST(SUM(o) OVER () AS BIGINT) AS n
         |  FROM cells),
         |f AS (SELECT *, ${val6(lift)} AS lift FROM t WHERE o >= 50),
         |rr AS (SELECT *, CAST(ROW_NUMBER() OVER (ORDER BY lift DESC,
         |    segment NULLS FIRST, brand NULLS FIRST) AS BIGINT) AS rank
         |  FROM f)
         |SELECT rank, segment, brand, o AS n_lines, lift FROM rr
         |WHERE rank <= 20 ORDER BY rank NULLS FIRST""".stripMargin
    },

    // q283: ⌊log₂ cents⌋ buckets via bit length — no float log.
    "q283_value_histogram" ->
      s"""WITH c AS (SELECT
         |    CAST(FLOOR(o_totalprice * 100.0 + 0.5) AS BIGINT) AS cents
         |  FROM orders),
         |g AS (SELECT CAST(length(bin(cents)) - 1 AS BIGINT) AS bucket,
         |    CAST(COUNT(*) AS BIGINT) AS n_orders,
         |    CAST(SUM(cents) AS BIGINT) AS cents
         |  FROM c WHERE cents > 0 GROUP BY 1),
         |w AS (SELECT *, CAST(SUM(n_orders) OVER () AS BIGINT) AS tot
         |  FROM g)
         |SELECT bucket,
         |  CAST(CAST(1 AS BIGINT) << CAST(bucket AS INT) AS DOUBLE)
         |    / 100.0 AS lo_dollars,
         |  n_orders,
         |  CAST(cents AS DOUBLE) / 100.0 AS revenue,
         |  ${val6("CAST(n_orders AS DOUBLE) / CAST(tot AS DOUBLE)")}
         |    AS share
         |FROM w ORDER BY bucket NULLS FIRST""".stripMargin,

    // q284: per-cohort repeat rate with the shared Wilson tree.
    "q284_cohort_repeat" -> {
      val (phat, lo, hi) = wilsonSql(
        "CAST(n_customers AS DOUBLE)", "CAST(n_repeaters AS DOUBLE)")
      s"""WITH u AS (SELECT o_custkey,
         |    MIN(CAST(date_trunc('month', CAST(o_orderdate AS DATE))
         |      AS DATE)) AS cohort_month,
         |    CAST(COUNT(*) AS BIGINT) AS n_orders
         |  FROM orders GROUP BY 1),
         |g AS (SELECT cohort_month,
         |    CAST(COUNT(*) AS BIGINT) AS n_customers,
         |    CAST(SUM(CASE WHEN n_orders >= 2 THEN 1 ELSE 0 END)
         |      AS BIGINT) AS n_repeaters
         |  FROM u GROUP BY 1)
         |SELECT cohort_month, n_customers, n_repeaters,
         |  ${val6(phat)} AS repeat_rate,
         |  ${val6(lo)} AS wilson_lo,
         |  ${val6(hi)} AS wilson_hi
         |FROM g ORDER BY cohort_month NULLS FIRST""".stripMargin
    },

    // q285: integer-percent discount bands, exact-ratio averages.
    "q285_discount_response" ->
      s"""WITH g AS (SELECT
         |    CAST(FLOOR(l_discount * 100.0 + 0.5) AS BIGINT) AS pct,
         |    CAST(COUNT(*) AS BIGINT) AS n_lines,
         |    CAST(SUM(CAST(FLOOR(l_quantity * 100.0 + 0.5) AS BIGINT))
         |      AS BIGINT) AS sq,
         |    CAST(SUM(CAST(FLOOR(l_extendedprice * 100.0 + 0.5)
         |      AS BIGINT)) AS BIGINT) AS sc
         |  FROM lineitem GROUP BY 1),
         |w AS (SELECT *, CAST(SUM(n_lines) OVER () AS BIGINT) AS tot
         |  FROM g)
         |SELECT pct, n_lines,
         |  ${val6("CAST(n_lines AS DOUBLE) / CAST(tot AS DOUBLE)")}
         |    AS line_share,
         |  ${val6("CAST(sq AS DOUBLE) / 100.0" +
             " / CAST(n_lines AS DOUBLE)")} AS avg_qty,
         |  CAST(sc AS DOUBLE) / 100.0 AS revenue
         |FROM w ORDER BY pct NULLS FIRST""".stripMargin,
  )
}
