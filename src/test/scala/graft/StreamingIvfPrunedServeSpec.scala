package graft

import graft.streaming.StreamingIvfMaintainer

/** q286 — the unified index representation: the delete-maintained
  * state PUBLISHED as a cid-bucketed table and served with q161's
  * plan-time bucket pruning. Pins (1) result identity with the
  * full-state-scan serve (q237 — same contract, same oracle), and
  * (2) the strict-subset `SelectedBucketsCount` in the executed plan —
  * the assertion that the serve reads a pruned slice of the
  * post-delete index ON DISK, not merely post-filter.
  */
class StreamingIvfPrunedServeSpec extends SparkSpec {

  private val dir = sf("sf0.001")

  test("pruned serve from the published index equals the " +
      "full-state-scan serve bit-for-bit") {
    val pruned = StreamingIvfMaintainer.servedKnnPruned(spark, dir)
      .collect().toSeq
    val scan = StreamingIvfMaintainer.servedKnn(spark, dir)
      .collect().toSeq
    assert(pruned == scan)
    assert(pruned.nonEmpty)
  }

  test("the probe filter prunes published-index buckets at the scan") {
    // one query × 4 probes → ≤4 cids → ≤4 of the 8 buckets: the scan
    // must report a strict-subset SelectedBucketsCount
    val plan = StreamingIvfMaintainer
      .servedKnnPruned(spark, dir, nQueries = 1, k = 3)
      .queryExecution.executedPlan.toString
    val m = "SelectedBucketsCount: (\\d+) out of (\\d+)".r
      .findFirstMatchIn(plan)
    assert(m.isDefined, s"expected bucket pruning in plan:\n$plan")
    assert(m.get.group(1).toInt < m.get.group(2).toInt,
      s"expected a strict subset of buckets: ${m.get.matched}")
  }

  test("published index content equals the resolved assigned state") {
    val root = StreamingIvfMaintainer.drainedStateRoot(spark, dir)
    val state = graft.sources.DeltaLog
      .read(spark, s"$root/state/assigned", Seq("vec_id", "cid")).get
      .select("vec_id", "cid").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val pub = StreamingIvfMaintainer.publishedIndex(spark, dir)
      .select("vec_id", "cid").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pub == state)
    assert(pub.nonEmpty)
  }
}
