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

  test("delete maintenance: a deleted canonical promotes a survivor; " +
      "a deleted bridge splits its cluster; untouched clusters keep labels") {
    import org.apache.spark.sql.Row
    // hand-built stored state: cluster {1,5,9} (canonical 1),
    // chain cluster {10-11-12} (11 is the only bridge),
    // untouched cluster {20,21}, singleton 30
    def df(rows: Seq[(Long, Long)], a: String, b: String) =
      rows.toDF(a, b)
    val comp = df(Seq(1L -> 1L, 5L -> 1L, 9L -> 1L,
      10L -> 10L, 11L -> 10L, 12L -> 10L,
      20L -> 20L, 21L -> 20L, 30L -> 30L), "vec_id", "component")
    val pairs = df(Seq(1L -> 5L, 1L -> 9L, 5L -> 9L,
      10L -> 11L, 11L -> 12L, 20L -> 21L), "ida", "idb")
    val art = VectorOps.IvfPrevArtifacts(Array.empty,
      assigned = spark.emptyDataFrame, pairs = pairs, comp = comp)
    val tomb = Seq(1L, 11L).toDF("vec_id") // the canonical + the bridge
    val out = VectorOps.deletesApplied(art, tomb)
      .select("vec_id", "component", "cluster_size", "is_canonical")
      .collect().toSeq
    val expected = Seq(
      Row(5L, 5L, 2L, true),   // survivor 5 promoted to canonical
      Row(9L, 5L, 2L, false),
      Row(10L, 10L, 1L, true), // bridge gone → {10} and {12} split
      Row(12L, 12L, 1L, true),
      Row(20L, 20L, 2L, true), // untouched cluster: stored labels kept
      Row(21L, 20L, 2L, false),
      Row(30L, 30L, 1L, true))
    assert(out == expected)
  }

  test("one epoch with BOTH verbs (appends + tombstones) equals the " +
      "full post-epoch rebuild with frozen prev centroids") {
    val all = allVecs
    val prev = prevVecs
    val cents = VectorOps.centroidsOf(prev, 16)
    val post = all.filter($"vec_id" % 6 === 0 || $"vec_id" % 7 =!= 3)
    val inc = VectorOps.embeddingDedupUpsertDelete(spark, dir)
      .collect().toSeq
    val full = VectorOps
      .dedupVerdict(post.select("vec_id"),
        VectorOps.pairsFromAssigned(
          VectorOps.assignWithCentroids(spark, post, cents, 4), 0.4, 4))
      .withColumn("status",
        when($"vec_id" % 6 === 0, "appended").otherwise("retained"))
      .orderBy("vec_id")
      .collect().toSeq
    assert(inc == full, "upsert+delete epoch must equal the rebuild")
    // the epoch really exercised both verbs on this fixture
    assert(inc.exists(_.getString(4) == "appended"))
    val postIds = post.select("vec_id").as[Long].collect().toSet
    val prevIds = prev.select("vec_id").as[Long].collect().toSet
    assert((prevIds -- postIds).nonEmpty,
      "fixture must contain at least one retired tombstone")
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
