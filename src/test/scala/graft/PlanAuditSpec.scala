package graft

/** Plan-shape audit over EVERY batch query: the anti-patterns that
  * kill a 100× scale-up must never (re)appear in any physical plan.
  *
  *  - `CartesianProduct` (unbounded pair blow-up): never allowed.
  *  - `BroadcastNestedLoopJoin`: allowed ONLY on the documented
  *    bounded shapes — exact pair baselines over capped id ranges and
  *    1-row-aggregate scalar cross joins.
  *  - `Exchange SinglePartition`: allowed ONLY over PRE-REDUCED
  *    frames — the 1-row final of a global aggregate (partials travel,
  *    not rows) and ordered windows over aggregate-grain inputs
  *    (monthly totals, distinct-price frames, 4-row funnels), where
  *    one task sees hundreds of rows at ANY data scale. The audited
  *    set is pinned below; a NEW query planning a single-partition
  *    exchange fails this spec until its input grain is reviewed and
  *    the pin updated. Raw/fact-grain single-partition sorts (the
  *    round-2 q21/q23 bug class) can't hide: they would appear here as
  *    an unpinned name.
  *
  * Plans are inspected unexecuted (AQE initial plan), so this audits
  * the optimizer's output, not runtime adaptation.
  */
class PlanAuditSpec extends SparkSpec {

  // bounded-by-construction pair scans and 1-row scalar cross joins
  private val bnljAllowed = Set(
    "q34_ngram_jaccard", "q35_knn_cosine", "q36_embedding_pairs",
    "q138_embedding_dedup", // same bounded pair derivation as q36
    // broadcast-QUERY-set scorers (the q35 shape): the nested-loop side
    // is the ≤10/8/20-row query set by construction at any corpus
    // scale; the corpus side streams. Candidate generation at scale
    // goes through the IVF equi-join (q170, deliberately NOT here).
    "q166_int8_knn", "q171_maxsim", "q174_retrieval", "q175_pq_knn",
    "q186_ann_recall_audit", // composes q35's brute side, same ≤10-row set
    "q191_mmr",              // rel stage = the q35 broadcast-query scorer
    "q218_rag_context",      // rides q191's sanctioned rel stage
    "q197_retrieval_eval",   // same composed brute side as q186
    // q141 deliberately NOT here: the at-scale dedup's candidate
    // generation is an equi-join on the IVF bucket id — if it ever
    // plans a nested loop, that's a regression this spec must catch
    "q60_gapfill_daily", "q63_tfidf", "q67_rfm_segments",
    "q75_salted_join", "q94_heavy_hitters",
    // q96 removed round 4: the fused single-pass sketch aggregation
    // has no cross-joined sub-aggregations left to sanction
    "q98_ri_audit", "q97_media_meta", "q39_kpis", "q20_dq_metrics",
    "q90_cond_bitwise", "q82_moments", "q73_incremental_agg",
    "q200_release_manifest", // cross joins of 1-row stage finals
    "q59_salted_agg", "q118_hll_distinct", "q119_approx_quantiles",
    // q203's pair stage is the q35 broadcast-QUERY scorer (the ≤25%
    // audit sample broadcasts, corpus streams); its eager
    // localCheckpoint truncates the published plan BEFORE that stage,
    // so the audit only sees it if the checkpoint is ever removed —
    // sanctioned here so removing the checkpoint stays a non-event
    "q203_label_noise",
    "q202_target_encoding",  // cross join of the 1-row grand total
    "q205_purged_split",     // cross join of the 1-row date bounds
    "q215_split_divergence", // vocab × 3-row split totals + 1-row train
    "q224_bootstrap_se",     // 1-row overall mean cross joins
    "q225_capture_recapture", // four 1-row count scalars cross joined
    "q227_seasonal_decompose", // 1-row sigma + 7-row weekday means
    "q229_cluster_balanced",   // 1-row weight-total cross join
    "q252_cuped",             // 1-row pooled-θ scalar cross join
    "q254_expectations",      // 1-row rule-aggregate cross join
    "q258_purchase_gaps",     // 1-row (n, Σ) total vs the bucket CDF
    "q262_repeat_hazard",     // 1-row obs-end scalar cross join
    "q267_demand_movers",     // 1-row min-shipdate anchor (q205 class)
    "q269_ks_test",           // 1-row (n1, n2) totals vs the CDF grain
    "q271_abc_classes",       // 1-row grand-total (max cum) cross join
    "q256_assoc_rules",       // 1-row basket-total (N) cross join
    "q275_tier_migration",    // 1-row date bounds / cuts / matrix total
    "q281_chi_square",        // ≤5×5 seg×pri grid densify cross join
    "q290_rrf_fusion",        // dense side rides q174's sanctioned
                              // broadcast-query scorer (≤10-row set)
    "q291_epoch_mix",         // 1-row corpus-totals cross join
    "q295_brand_hits",        // per-round 1-row max-normalizer scalar
                              // cross joins (HITS renormalization)
    "q300_markov_attribution", // channel×matrix / channel×state cross
                               // joins over ≤|types|-bounded frames +
                               // the 1-row p_base scalar
    "q306_fused_rag_context",  // rides q290's sanctioned dense-side
                               // broadcast-query scorer (≤10-row set)
    "q309_decayed_covisitation", // 1-row max-order-date anchor cross
                                 // join (the q205 date-bounds class)
    "q301_t_closeness",       // cells × band-vocabulary densify cross
                              // join + the 1-row (n, m) totals
    "q311_shapley_attribution", // subset-lattice joins: every frame is
                                // the ≤2^k mask/subset table (k = 4)
                                // or the 1-row φ-total scalar
    "q313_kaplan_meier",      // 1-row obs-end scalar cross join
                              // (q262's exact shape)
    "q314_bq_knn",            // broadcast ≤10-row query set vs the
                              // code/corpus stream (the q35 class)
    "q316_bitext_margin",     // both kNN legs are broadcast bounded
                              // query sets (≤30 queries / ≤120 cands)
    "q322_distill_calibration") // 1-row ECE/Brier totals cross join
                                // over the 10-bin frame

  // reviewed single-partition sites: global scalar finals + windows
  // over aggregate-grain frames (input cardinality is bounded by the
  // GROUP's cardinality, not the fact table's, at every scale)
  private val singlePartitionReviewed = Set(
    "q124_skyline",           // running max over DISTINCT prices
    "q18_conversion_rates",   // lag over the 4-row funnel
    "q20_dq_metrics", "q39_kpis", "q82_moments", // 1-row scalar finals
    "q47_moving_avg",         // frames over monthly totals
    "q60_gapfill_daily",      // spine bounds: 1-row min/max aggregate
    // q62/q67 removed round 9: global ntile/percent_rank/cume_dist now
    // derive closed-form from the two-phase range-partitioned rank —
    // any reappearing single-partition exchange is a regression
    "q63_tfidf",              // 1-row corpus doc-count scalar
    "q69_campaign_attr",      // bin spine from a 1-row bounds agg
    "q81_bloom_prune",        // bloom build: 1-row sketch aggregate
    "q94_heavy_hitters",      // candidate-merge final (≤k rows)
    "q96_kmv_setops",         // k-sized sketch heads + 1-row finals
    "q98_ri_audit",           // seven 1-row constraint scalars
    "q146_curation_funnel",   // 1-row six-sum funnel final
    "q199_skew_advisor",      // three 1-row per-key-column finals
    "q200_release_manifest",  // 1-row stage finals
    // PSI windows over the ≤16-row clamped-bucket histogram (the
    // constant event_type literal folds the partitioning to single);
    // input is the reduced grain, never the corpus
    "q195_embedding_drift",
    "q202_target_encoding",   // grand total: 1-row final over 25 groups
    "q205_purged_split",      // date bounds: 1-row global min/max final
    "q208_k_anonymity",       // 1-row card final over the QI-group grain
    "q224_bootstrap_se",      // 32-row replicate + 1-row finals
    "q225_capture_recapture", // 1-row window-count finals
    "q226_unseen_mass",       // 1-row vocabulary-stat final
    "q227_seasonal_decompose", // windows over DAY grain (q47 class)
    "q229_cluster_balanced",   // 1-row quota-weight final (K-grain in)
    "q250_ewma_forecast",     // lag chain over (type × day) grain —
                              // ≤ |types|·span rows at any scale
    "q252_cuped",             // 2-row arm finals + 1-row θ scalar
    "q253_conversion_z",      // 1-row four-sum experiment final
    "q254_expectations",      // 1-row nine-sum contract final
    "q255_forecast_backtest", // day-grain error rollup (q250 class)
    "q256_assoc_rules",       // 1-row basket-total final (N scalar)
    "q258_purchase_gaps",     // CDF walk over HOUR-grain buckets —
                              // bounded by corpus time span, not rows
    "q259_geo_rollup",        // share windows over the 25-nation frame
    "q260_session_trigrams",  // rank/share over ≤|types|³ trigrams
    "q262_repeat_hazard",     // NA running sums over DAY-grain risk sets
    "q267_demand_movers",     // rank over the 20 post-limit survivors
                              // (top-k itself is TakeOrderedAndProject)
    "q268_rank_sum_test",     // 1-row (n, R, ties) final over histogram
    "q269_ks_test",           // 1-row D-argmax final over the CDF grain
    "q271_abc_classes",       // 3-row class rollup + 1-row total final
    "q275_tier_migration",    // 1-row rubric cuts + ≤25-cell matrix
    "q276_ordered_funnel",    // lag over the 4-row stage frame (q18)
    "q277_windowed_funnel",   // same 4-row stage frame
    "q278_traffic_heatmap",   // share/rank over the fixed 7×24 grid
    "q280_brand_transitions", // rank over the 20 post-limit survivors
    "q281_chi_square",        // totals over the ≤25-cell contingency
    "q282_segment_affinity",  // totals over the ≤|seg|·|brand| cells
    "q283_value_histogram",   // share over the ≤64 log2 buckets
    "q285_discount_response", // share over the ≤101 discount bands
    "q291_epoch_mix",         // 1-row corpus-totals (Σtokens, |src|)
                              // final over the source grain
    "q295_brand_hits",        // 1-row max(raw) finals over the ≤|V|
                              // score frame, once per half-step
    "q300_markov_attribution", // 1-row first-event total + p_base
                               // finals over vocabulary-grain frames
    "q301_t_closeness",       // global cumulative window over the
                              // ≤|bands| frame + 1-row (n, m) final
    "q309_decayed_covisitation", // 1-row max-date anchor final; rank
                                 // window over the 20 post-limit rows
    "q311_shapley_attribution",  // 16-row coalition-value aggregate +
                                 // the 1-row φ-total final
    "q313_kaplan_meier",      // KM running sums over DAY-grain risk
                              // sets (q262's reviewed shape)
    "q315_ccnet_buckets",     // language-offset prefix window over the
                              // ≤|langs| frame (the rank itself is the
                              // two-phase distributed pass)
    "q319_did_lift",          // 1-row 2×2-cell final over the 4-row
                              // cell aggregate (the q253 class)
    "q322_distill_calibration") // 10-bin reliability frame + 1-row
                                // ECE/Brier totals

  /** Every node of the plan, descending through AQE wrappers (an
    * AdaptiveSparkPlanExec is a LEAF to `collect` — its initial plan is
    * reached via the Scala-package-private accessor, public in
    * bytecode) and into planned subqueries. */
  private def allNodes(p: org.apache.spark.sql.execution.SparkPlan)
      : Seq[org.apache.spark.sql.execution.SparkPlan] = {
    val self = p match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.getClass.getMethod("initialPlan").invoke(a)
          .asInstanceOf[org.apache.spark.sql.execution.SparkPlan]
      case o => o
    }
    self +: (self.children ++ self.subqueries).flatMap(allNodes)
  }

  /** An `Exchange SinglePartition` is structurally exempt only when it
    * is the merge step of a bloom-filter build: its direct child is an
    * aggregate whose aggregate-expression set contains
    * `BloomFilterAggregate`. Spark's own InjectRuntimeFilter plans
    * exactly this shape (a global ObjectHashAggregate merging PARTIAL
    * SKETCH BUFFERS — one per partition, not rows; the same pre-reduced
    * class as q81's explicit bloom build) and it can appear under ANY
    * join as stats shift. Matching the child NODE's aggregate functions
    * — not nearby plan-string lines — keeps the audit stable under
    * plan-rendering shifts (wrapper nodes, line wrapping).  */
  private def isBloomMerge(
      e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec)
      : Boolean =
    e.child match {
      case agg: org.apache.spark.sql.execution.aggregate.BaseAggregateExec =>
        agg.aggregateExpressions.exists(_.aggregateFunction
          .isInstanceOf[org.apache.spark.sql.catalyst.expressions
            .aggregate.BloomFilterAggregate])
      case _ => false
    }

  test("no batch query plans a cartesian product, an unsanctioned " +
      "nested-loop join, or an unreviewed single-partition exchange") {
    val dir = sf("sf0.001")
    val bad = scala.collection.mutable.ListBuffer.empty[String]
    SparkEntry.queries.toSeq.sortBy(_._1)
      .filterNot(_._1.contains("streaming"))
      .foreach { case (name, fn) =>
        val planOpt =
          try Right(fn(spark, dir).queryExecution.executedPlan)
          catch { case e: Throwable => Left(s"PLAN FAILED: $e") }
        planOpt match {
          case Left(err) => bad += s"$name: $err"
          case Right(plan) =>
            val planStr = plan.toString
            if (planStr.contains("CartesianProduct"))
              bad += s"$name: CartesianProduct"
            val unreviewedSp = allNodes(plan).exists {
              case e: org.apache.spark.sql.execution.exchange
                  .ShuffleExchangeExec =>
                e.outputPartitioning ==
                  org.apache.spark.sql.catalyst.plans.physical
                    .SinglePartition && !isBloomMerge(e)
              case _ => false
            }
            if (unreviewedSp && !singlePartitionReviewed(name))
              bad += s"$name: unreviewed Exchange SinglePartition"
            if (planStr.contains("BroadcastNestedLoopJoin") &&
                !bnljAllowed(name))
              bad += s"$name: unsanctioned BroadcastNestedLoopJoin"
        }
      }
    assert(bad.isEmpty, s"scale anti-patterns found:\n${bad.mkString("\n")}")
  }
}
