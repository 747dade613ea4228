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
    // q141 deliberately NOT here: the at-scale dedup's candidate
    // generation is an equi-join on the IVF bucket id — if it ever
    // plans a nested loop, that's a regression this spec must catch
    "q60_gapfill_daily", "q63_tfidf", "q67_rfm_segments",
    "q75_salted_join", "q94_heavy_hitters",
    // q96 removed round 4: the fused single-pass sketch aggregation
    // has no cross-joined sub-aggregations left to sanction
    "q98_ri_audit", "q97_media_meta", "q39_kpis", "q20_dq_metrics",
    "q90_cond_bitwise", "q82_moments", "q73_incremental_agg",
    "q59_salted_agg", "q118_hll_distinct", "q119_approx_quantiles")

  // reviewed single-partition sites: global scalar finals + windows
  // over aggregate-grain frames (input cardinality is bounded by the
  // GROUP's cardinality, not the fact table's, at every scale)
  private val singlePartitionReviewed = Set(
    "q124_skyline",           // running max over DISTINCT prices
    "q18_conversion_rates",   // lag over the 4-row funnel
    "q20_dq_metrics", "q39_kpis", "q82_moments", // 1-row scalar finals
    "q47_moving_avg",         // frames over monthly totals
    "q60_gapfill_daily",      // spine bounds: 1-row min/max aggregate
    "q62_ntile_ranks",        // global quartiles: semantic total order
    "q63_tfidf",              // 1-row corpus doc-count scalar
    "q67_rfm_segments",       // global RFM quantile thresholds
    "q69_campaign_attr",      // bin spine from a 1-row bounds agg
    "q81_bloom_prune",        // bloom build: 1-row sketch aggregate
    "q94_heavy_hitters",      // candidate-merge final (≤k rows)
    "q96_kmv_setops",         // k-sized sketch heads + 1-row finals
    "q98_ri_audit",           // seven 1-row constraint scalars
    "q146_curation_funnel")   // 1-row six-sum funnel final

  test("no batch query plans a cartesian product, an unsanctioned " +
      "nested-loop join, or an unreviewed single-partition exchange") {
    val dir = sf("sf0.001")
    val bad = scala.collection.mutable.ListBuffer.empty[String]
    SparkEntry.queries.toSeq.sortBy(_._1)
      .filterNot(_._1.contains("streaming"))
      .foreach { case (name, fn) =>
        val plan =
          try fn(spark, dir).queryExecution.executedPlan.toString
          catch { case e: Throwable => s"PLAN FAILED: $e" }
        if (plan.contains("PLAN FAILED")) bad += s"$name: $plan"
        if (plan.contains("CartesianProduct"))
          bad += s"$name: CartesianProduct"
        // Spark's InjectRuntimeFilter builds its bloom filter with a
        // global ObjectHashAggregate whose merge is a SinglePartition
        // exchange over PARTIAL SKETCH BUFFERS (one per partition, not
        // rows) — the same pre-reduced class as q81's explicit bloom
        // build, and it can appear under ANY join as stats shift, so
        // it is exempted structurally rather than by name
        val lines = plan.split("\n")
        val unreviewedSp = lines.zipWithIndex.exists { case (l, i) =>
          l.contains("Exchange SinglePartition") &&
            !lines.drop(i + 1).take(2)
              .exists(_.contains("partial_bloom_filter_agg"))
        }
        if (unreviewedSp && !singlePartitionReviewed(name))
          bad += s"$name: unreviewed Exchange SinglePartition"
        if (plan.contains("BroadcastNestedLoopJoin") && !bnljAllowed(name))
          bad += s"$name: unsanctioned BroadcastNestedLoopJoin"
      }
    assert(bad.isEmpty, s"scale anti-patterns found:\n${bad.mkString("\n")}")
  }
}
