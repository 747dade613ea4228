package graft

import org.apache.spark.sql.functions._
import graft.operators.{TextOps, VectorOps}

/** The bucket-skew guard on a PLANTED pathological corpus — the hazard
  * SCALE.md names: an all-near-identical corpus collapses into one
  * IVF/LSH bucket and Σ bucket² degenerates to N². The guard sub-splits
  * oversized buckets deterministically (`id % ⌈n/cap⌉`), bounding pair
  * work to ~n·cap; the documented degrade is that clusters split along
  * sub-bucket lines (each sub-bucket still closes internally), and the
  * split is pure id arithmetic, so output is stable across reruns.
  * On every real gate SF the cap never binds (sub = 0 everywhere) and
  * output is bit-identical to the uncapped join — the driver gate
  * proves that side.
  */
class IvfSkewGuardSpec extends SparkSpec {
  import spark.implicits._

  private val n = 256
  private val cap = 32L

  // the purest adversary: EXACTLY identical vectors. Every centroid
  // ties at cosine 1.0, the tiebreak sends every vector to cid 0, and
  // the single bucket is the whole corpus.
  private lazy val identicalVecs =
    (0L until n.toLong).map(i => (i, Array.fill(8)(1.0f)))
      .toDF("vec_id", "embedding")

  test("uncapped: the pathological corpus really is quadratic") {
    val unc = VectorOps.ivfCandidatePairs(spark, identicalVecs,
      nCentroids = 4, threshold = 0.99, nProbe = 1,
      maxBucket = Long.MaxValue)
    assert(unc.count() == n.toLong * (n - 1) / 2)
  }

  test("capped: pair count is bounded by n·cap and the verdict is " +
      "stable sub-bucket clustering") {
    def capped = VectorOps.ivfCandidatePairs(spark, identicalVecs,
      nCentroids = 4, threshold = 0.99, nProbe = 1, maxBucket = cap)
    val cnt = capped.count()
    // nsub = ⌈256/32⌉ = 8 residue classes of 32: 8 · C(32,2) pairs
    assert(cnt == 8L * (32L * 31 / 2))
    assert(cnt <= n * cap, "degrade bound n·cap violated")

    // deterministic: a rerun emits the identical pair set
    val run1 = capped.orderBy("ida", "idb").collect().toSeq
    val run2 = capped.orderBy("ida", "idb").collect().toSeq
    assert(run1 == run2)

    // the degrade policy in action: each residue class closes into one
    // cluster (component = its min id = the residue), nothing is lost
    // from within a sub-bucket
    val verdict = VectorOps.dedupVerdict(
      identicalVecs.select("vec_id"), capped)
    val comps = verdict.groupBy("component")
      .agg(count(lit(1)).as("sz")).collect()
    assert(comps.length == 8)
    assert(comps.forall(_.getLong(1) == 32L))
  }

  test("LSH hyperplane path: capped candidate generation is bounded on " +
      "the identical corpus") {
    val unc = VectorOps.lshNearDups(spark, identicalVecs, dim = 8,
      threshold = 0.99, maxBucket = Long.MaxValue).count()
    val cpd = VectorOps.lshNearDups(spark, identicalVecs, dim = 8,
      threshold = 0.99, maxBucket = cap).count()
    assert(unc == n.toLong * (n - 1) / 2) // one bucket per band, quadratic
    assert(cpd == 8L * (32L * 31 / 2))    // residue classes, all bands agree
  }

  test("MinHash banded path: capped candidate generation is bounded on " +
      "an identical-document corpus") {
    val dir = s"${System.getProperty("java.io.tmpdir")}/graft-skew-docs"
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
    (0L until 64L).map(i => (i,
        "the quick brown fox jumps over the lazy dog again and again",
        "en", "web", 60L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")

    val unc = TextOps.minhashNearDups(spark, dir, 0.7,
      maxBucket = Long.MaxValue).count()
    val cpd = TextOps.minhashNearDups(spark, dir, 0.7,
      maxBucket = 8L).count()
    assert(unc == 64L * 63 / 2)      // identical docs: full clique
    assert(cpd == 8L * (8L * 7 / 2)) // ⌈64/8⌉ = 8 residue classes of 8
  }
}
