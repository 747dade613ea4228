package graft

import org.apache.spark.sql.functions._

import graft.operators.VectorOps

/** Incremental IVF index maintenance (q158): appending delta vectors to
  * the persisted index (frozen centroids) plus affected-cluster-only
  * re-closure must equal the full rebuild against the same centroids.
  */
class IncrementalIvfSpec extends SparkSpec {
  import spark.implicits._

  private val dir = sf("sf0.001")

  private def prevVecs = graft.sources.Tables.embeddings(spark, dir)
    .select($"vec_id", $"embedding").filter($"vec_id" % 6 =!= 0)
  private def allVecs = graft.sources.Tables.embeddings(spark, dir)
    .select($"vec_id", $"embedding")

  test("incremental verdict equals the full rebuild with frozen centroids") {
    val cents = VectorOps.centroidsOf(prevVecs, 16)
    // the index's centroid set excludes the delta ids below 16
    assert(cents.length == 13 && cents.forall(_._1 % 6 != 0))

    val inc = VectorOps.embeddingDedupIncremental(spark, dir)
      .collect().toSeq
    val fullAssigned = VectorOps.assignWithCentroids(spark, allVecs, cents, 4)
    val full = VectorOps
      .dedupVerdict(allVecs.select("vec_id"),
        VectorOps.pairsFromAssigned(fullAssigned, 0.4, 4))
      .withColumn("status",
        when($"vec_id" % 6 === 0, "appended").otherwise("indexed"))
      .orderBy("vec_id")
      .collect().toSeq
    assert(inc == full, "incremental must equal the full rebuild")
    assert(inc.nonEmpty && inc.exists(_.getString(4) == "appended"))
  }

  test("index-content invariant: prev assignment ∪ delta assignment " +
      "equals the full assignment (what a physical append preserves)") {
    val art = VectorOps.stagedIvfPrev(spark, dir, 16, 4, 0.4)
    val delta = allVecs.filter($"vec_id" % 6 === 0)
    val appended = art.assigned
      .select($"vec_id", $"cid")
      .unionByName(VectorOps
        .assignWithCentroids(spark, delta, art.centroids, 4)
        .select($"vec_id", $"cid"))
      .as[(Long, Long)].collect().toSet
    val full = VectorOps
      .assignWithCentroids(spark, allVecs, art.centroids, 4)
      .select($"vec_id", $"cid").as[(Long, Long)].collect().toSet
    assert(appended == full)
  }

  test("the delta probe broadcasts the delta side — no corpus-side shuffle") {
    val art = VectorOps.stagedIvfPrev(spark, dir, 16, 4, 0.4)
    val delta = allVecs.filter($"vec_id" % 6 === 0)
    val deltaAssigned =
      VectorOps.assignWithCentroids(spark, delta, art.centroids, 4)
    val plan = VectorOps
      .deltaPairs(deltaAssigned,
        art.assigned.select("vec_id", "cid", "embedding"), 0.4)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"expected broadcast:\n$plan")
    // below the join sit only the two scans (+ the BroadcastExchange of
    // the delta side) — the index side must not shuffle. The final
    // distinct's pair-grain exchange sits ABOVE the join and is fine.
    val joinSubtree = plan.substring(plan.indexOf("BroadcastHashJoin"))
    assert(!joinSubtree.contains("Exchange hashpartitioning"),
      s"index side must not shuffle:\n$plan")
  }
}
