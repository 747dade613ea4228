package graft

import org.apache.spark.sql.functions._

import graft.operators.Graphs

/** Connected components: min-label propagation over DataFrames. */
class GraphsSpec extends SparkSpec {

  private def comps(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    import spark.implicits._
    Graphs.components(edges.toDF("a", "b"), "a", "b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("chain collapses to min label across transitive hops") {
    // 1-2-3-4 chain plus isolated pair 10-11: (1,3) never appears as an
    // edge yet both must land in component 1.
    val m = comps(Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L)))
    assert(m == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L))
  }

  test("star and cycle converge; direction of input edges is irrelevant") {
    val m = comps(Seq((7L, 5L), (7L, 6L), (8L, 7L), // star centered at 7
      (20L, 21L), (21L, 22L), (22L, 20L)))          // 3-cycle
    assert(m(5L) == 5L || m(5L) == 5L) // min of {5,6,7,8} is 5
    assert(Set(5L, 6L, 7L, 8L).forall(m(_) == 5L))
    assert(Set(20L, 21L, 22L).forall(m(_) == 20L))
  }

  test("dedupClusters covers every document and marks one canonical per cluster") {
    val out = Graphs.dedupClusters(spark, sf("sf0.001")).cache()
    val total = spark.read.parquet(sf("sf0.001") + "/documents.parquet").count()
    assert(out.count() == total)
    // exactly one canonical per component, and it is the min doc_id
    val bad = out.groupBy("component")
      .agg(sum(when(col("is_canonical"), 1).otherwise(0)).as("n_canon"),
        min("doc_id").as("min_id"), first("component").as("c"))
      .filter(col("n_canon") =!= 1 || col("min_id") =!= col("c"))
      .count()
    assert(bad == 0)
    out.unpersist()
  }
}
