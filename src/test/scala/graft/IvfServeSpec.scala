package graft

import org.apache.spark.sql.functions._

import graft.operators.VectorOps

/** Serving from the persisted IVF index (q161): identical results to
  * the live-assignment q50 path, with the probed buckets pruned at the
  * SCAN (bucket pruning from the literal cid IN-filter).
  */
class IvfServeSpec extends SparkSpec {

  private val dir = sf("sf0.001")

  test("index-served kNN equals the live-assignment ivfKnn bit-for-bit") {
    val served = VectorOps.ivfKnnIndexed(spark, dir).collect().toSeq
    val live = VectorOps.ivfKnn(spark, dir).collect().toSeq
    assert(served == live)
    assert(served.nonEmpty)
  }

  test("the probe filter prunes index buckets at the scan") {
    // a narrow probe (2 queries × 2 probes → ≤4 cids) cannot cover all
    // 8 buckets; the scan must report a pruned SelectedBucketsCount
    val plan = VectorOps
      .ivfKnnIndexed(spark, dir, nQueries = 2, k = 3, nProbe = 2)
      .queryExecution.executedPlan.toString
    val m = "SelectedBucketsCount: (\\d+) out of (\\d+)".r
      .findFirstMatchIn(plan)
    assert(m.isDefined, s"expected bucket pruning in plan:\n$plan")
    assert(m.get.group(1).toInt < m.get.group(2).toInt,
      s"expected a strict subset of buckets: ${m.get.matched}")
  }

  // ---- q163: the unified index (train + persist + maintain + serve) ----

  test("unified index content: trained prev-build + frozen-centroid " +
      "append equals the from-scratch full assignment") {
    import org.apache.spark.sql.functions.col
    val h = graft.sources.IvfIndex.unified(spark, dir,
      nCentroidsArg = 16, iters = 2)
    val all = graft.sources.Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("embedding"))
    val full = VectorOps.ivfAssignTrained(spark, all, h.centroids, 1)
    def keyed(df: org.apache.spark.sql.DataFrame) =
      df.select("vec_id", "cid").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(keyed(h.table) == keyed(full))
    assert(h.table.count() == all.count(), "append lost or duplicated rows")
  }

  test("unified serve: multi-probe bucket pruning at the scan, " +
      "deterministic across calls") {
    val served = VectorOps.ivfKnnUnified(spark, dir).collect().toSeq
    assert(served.nonEmpty)
    assert(served == VectorOps.ivfKnnUnified(spark, dir).collect().toSeq)

    val plan = VectorOps
      .ivfKnnUnified(spark, dir, nQueries = 2, k = 3, nProbe = 2)
      .queryExecution.executedPlan.toString
    val m = "SelectedBucketsCount: (\\d+) out of (\\d+)".r
      .findFirstMatchIn(plan)
    assert(m.isDefined, s"expected bucket pruning in plan:\n$plan")
    assert(m.get.group(1).toInt < m.get.group(2).toInt,
      s"expected a strict subset of buckets: ${m.get.matched}")
  }
}
