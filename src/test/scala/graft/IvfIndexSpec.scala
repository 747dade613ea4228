package graft

import org.apache.spark.sql.functions._
import graft.operators.VectorOps
import graft.sources.{IvfIndex, Tables}

/** The persisted IVF index makes q141's 100 TB claim executable: the
  * assignment is a cid-bucketed TABLE and the Σ bucket² candidate
  * self-join reads co-located buckets with NO exchange on either side —
  * the same assertion BucketedJoinSpec makes for the fact⋈fact join.
  * And storage layout must never change results: the indexed dedup
  * (q153) equals the live-assignment dedup (q141) row for row.
  */
class IvfIndexSpec extends SparkSpec {

  private val dir = sf("sf0.001")

  test("candidate self-join over the bucketed index is exchange-free") {
    val assigned = IvfIndex.table(spark, dir, 16, 4)
    val prevBroadcast =
      spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760")
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled", "true")
    try {
      // force the sort-merge path so the assertion is about BUCKETING,
      // not about one side being broadcast-small
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.adaptive.enabled", "false")

      val pairs = VectorOps.pairsFromAssigned(assigned, 0.4, nProbe = 4)
      val plan = pairs.queryExecution.executedPlan.toString

      // the bucket-census broadcast join sits above; find the candidate
      // SELF-join (the sort-merge join on cid) and assert nothing below
      // it reshuffles the index
      val joinIdx = plan.indexOf("SortMergeJoin")
      assert(joinIdx >= 0, s"expected a sort-merge candidate join:\n$plan")
      assert(!plan.substring(joinIdx).contains("ShuffleExchange") &&
        !plan.substring(joinIdx).contains("Exchange hashpartitioning"),
        s"candidate join over the bucketed index still shuffles:\n$plan")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevBroadcast)
      spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
    }
  }

  test("indexed dedup (q153) is bit-identical to live-assignment dedup " +
      "(q141)") {
    val live = VectorOps.embeddingDedupIvf(spark, dir).collect().toSeq
    val indexed =
      VectorOps.embeddingDedupIvfIndexed(spark, dir).collect().toSeq
    assert(indexed == live)
  }

  test("index table content equals a live assignment") {
    val fromTable = IvfIndex.table(spark, dir, 16, 4)
      .select("vec_id", "cid").orderBy("vec_id", "cid").collect().toSeq
    val live = VectorOps.ivfAssign(spark,
        Tables.embeddings(spark, dir), 16, 4)
      .select("vec_id", "cid").orderBy("vec_id", "cid").collect().toSeq
    assert(fromTable == live)
  }
}
