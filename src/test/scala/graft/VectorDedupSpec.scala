package graft

import org.apache.spark.sql.functions._

import graft.operators.VectorOps

/** q141 (at-scale embedding dedup) semantics beyond the hash gate:
  * the IVF candidate generator has perfect PRECISION (bucketing can
  * only lose pairs, never invent them), and the cluster verdict obeys
  * its structural invariants on the full, uncapped table.
  */
class VectorDedupSpec extends SparkSpec {
  import spark.implicits._

  private val dir = sf("sf0.001")

  test("IVF candidates are a subset of the exact above-threshold pairs " +
      "(no false positives, only recall loss)") {
    val e = graft.sources.Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("embedding"))
    val ivf = VectorOps.ivfCandidatePairs(spark, e, nCentroids = 16,
      threshold = 0.4, nProbe = 4).as[(Long, Long)].collect().toSet
    // exact all-pairs over the same (small-SF) table
    val vecs = e.as[(Long, Array[Float])].collect()
    val exact = (for {
      (ia, va) <- vecs.iterator
      (ib, vb) <- vecs.iterator
      if ia < ib && VectorOps.cosOf(va, vb) >= 0.4
    } yield (ia, ib)).toSet
    assert(ivf.nonEmpty, "candidate generator found no pairs at all")
    assert(ivf.subsetOf(exact),
      s"false positives: ${(ivf -- exact).take(5)}")
  }

  test("multi-probe recall curve: monotone in nProbe, nProbe=4 " +
      "recovers >= 90% of exact pairs") {
    val r1 = VectorOps.ivfDedupPairRecall(spark, dir, nProbe = 1)
    val r2 = VectorOps.ivfDedupPairRecall(spark, dir, nProbe = 2)
    val r4 = VectorOps.ivfDedupPairRecall(spark, dir, nProbe = 4)
    // measured on this fixture: 0.29 / 0.61 / 0.94 — the floors leave
    // slack for regeneration but pin the shape of the curve
    assert(r1 <= r2 && r2 <= r4, s"recall not monotone: $r1 $r2 $r4")
    assert(r4 >= 0.9, s"nProbe=4 recall $r4 below 0.9")
    assert(r1 >= 0.1, s"single-probe recall $r1 collapsed")
  }

  test("dedup verdict invariants: exactly one canonical per component, " +
      "component = min member id, cluster_size consistent") {
    val d = VectorOps.embeddingDedupIvf(spark, dir).cache()
    val n = graft.sources.Tables.embeddings(spark, dir).count()
    assert(d.count() == n) // every vector gets a verdict, no cap

    // component is the minimum member id → canonical row exists and is
    // unique per component
    val perComp = d.groupBy("component")
      .agg(count(lit(1)).as("sz"),
        sum(col("is_canonical").cast("long")).as("n_canon"),
        min("vec_id").as("min_id"),
        max("cluster_size").as("max_cs"),
        min("cluster_size").as("min_cs"))
    assert(perComp.filter(col("n_canon") =!= 1).count() == 0)
    assert(perComp.filter(col("min_id") =!= col("component")).count() == 0)
    // cluster_size equals the component's row count on every member
    assert(perComp.filter(col("max_cs") =!= col("sz")
      || col("min_cs") =!= col("sz")).count() == 0)
    d.unpersist()
  }
}
