package graft

import org.apache.spark.sql.functions._
import graft.operators.{TextOps, VectorOps}

/** The bucket-skew guard on a PLANTED pathological corpus — the hazard
  * SCALE.md names: an all-near-identical corpus collapses into one
  * IVF/LSH bucket and Σ bucket² degenerates to N². The guard sub-splits
  * oversized buckets deterministically (`hash64(id) % ⌈n/cap⌉`),
  * bounding pair work to ~n·cap expected; the documented degrade is
  * that clusters split along sub-bucket lines (each sub-bucket still
  * closes internally), and the split is a seeded hash — no RNG — so
  * output is stable across reruns. On every real gate SF the cap never
  * binds (sub = 0 everywhere) and output is bit-identical to the
  * uncapped join — the driver gate proves that side.
  *
  * The hash key (not `id % nsub`) plus a FROZEN census is what lets the
  * cap compose with incremental maintenance: sub-bucket is a pure row
  * function given the census, so stored pairs, delta probes, and a full
  * recompute against the same census agree row-for-row — the last test
  * proves incremental ≡ full with the cap ACTIVE.
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

  /** Expected capped pair count: ids split by the same seeded hash the
    * guard uses (`nsub` residue classes), Σ C(class, 2). */
  private def hashClassPairs(ids: org.apache.spark.sql.DataFrame,
      idCol: String, nsub: Long): (Long, Seq[Long]) = {
    val sizes = ids
      .select(pmod(xxhash64(col(idCol)), lit(nsub)).as("s"))
      .groupBy("s").count().collect().map(_.getLong(1)).toSeq
    (sizes.map(m => m * (m - 1) / 2).sum, sizes)
  }

  test("uncapped: the pathological corpus really is quadratic") {
    val unc = VectorOps.ivfCandidatePairs(spark, identicalVecs,
      nCentroids = 4, threshold = 0.99, nProbe = 1,
      maxBucket = Long.MaxValue)
    assert(unc.count() == n.toLong * (n - 1) / 2)
  }

  test("capped: pair count is bounded by the sub-split and the verdict " +
      "is stable sub-bucket clustering") {
    def capped = VectorOps.ivfCandidatePairs(spark, identicalVecs,
      nCentroids = 4, threshold = 0.99, nProbe = 1, maxBucket = cap)
    val cnt = capped.count()
    // nsub = ⌈256/32⌉ = 8 hash residue classes; pairs close within a
    // class only: Σ C(class, 2) ≪ C(256, 2)
    val (expected, sizes) = hashClassPairs(
      identicalVecs.select("vec_id"), "vec_id", 8L)
    assert(cnt == expected)
    assert(cnt < n.toLong * (n - 1) / 2 / 4, "cap failed to bound pairs")

    // deterministic: a rerun emits the identical pair set
    val run1 = capped.orderBy("ida", "idb").collect().toSeq
    val run2 = capped.orderBy("ida", "idb").collect().toSeq
    assert(run1 == run2)

    // the degrade policy in action: each hash residue class closes into
    // one cluster, nothing is lost from within a sub-bucket
    val verdict = VectorOps.dedupVerdict(
      identicalVecs.select("vec_id"), capped)
    val comps = verdict.groupBy("component")
      .agg(count(lit(1)).as("sz")).collect()
    assert(comps.length == sizes.count(_ > 0))
    assert(comps.map(_.getLong(1)).sorted.toSeq == sizes.sorted)
  }

  test("LSH hyperplane path: capped candidate generation is bounded on " +
      "the identical corpus") {
    val unc = VectorOps.lshNearDups(spark, identicalVecs, dim = 8,
      threshold = 0.99, maxBucket = Long.MaxValue).count()
    val cpd = VectorOps.lshNearDups(spark, identicalVecs, dim = 8,
      threshold = 0.99, maxBucket = cap).count()
    assert(unc == n.toLong * (n - 1) / 2) // one bucket per band, quadratic
    // every band holds the same 256-row bucket, so every band splits
    // into the same hash classes — the distinct pair set is Σ C(class,2)
    val (expected, _) = hashClassPairs(
      identicalVecs.select("vec_id"), "vec_id", 8L)
    assert(cpd == expected)
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
    assert(unc == 64L * 63 / 2) // identical docs: full clique
    val (expected, _) = hashClassPairs(
      (0L until 64L).toDF("doc_id"), "doc_id", 8L) // ⌈64/8⌉ = 8 classes
    assert(cpd == expected)
  }

  test("ACTIVE cap composes with incrementality: a frozen census makes " +
      "incremental == full on the pathological corpus") {
    // the q158 split: prev corpus vs a delta append, frozen centroids
    val delta = identicalVecs.filter(col("vec_id") % 6 === 0)
    val prev = identicalVecs.filter(col("vec_id") % 6 =!= 0)
    val cents = VectorOps.centroidsOf(prev, 4)
    val prevAssigned = VectorOps.assignWithCentroids(spark, prev, cents, 1)
    // census FROZEN at build time, exactly like the centroids: nsub =
    // ⌈|prev bucket|/cap⌉, reused verbatim by every later pass
    val census = VectorOps.bucketCensus(prevAssigned, Seq("cid"), cap)
      .localCheckpoint()
    assert(census.count() == 1, "expected the one oversized bucket")

    val storedPairs = VectorOps.pairsFromAssigned(prevAssigned,
      threshold = 0.99, nProbe = 1, frozenCensus = Some(census))
    val deltaAssigned = VectorOps.assignWithCentroids(spark, delta, cents, 1)
    val unionAssigned = prevAssigned.unionByName(deltaAssigned)
    val probePairs = VectorOps.deltaPairs(deltaAssigned, unionAssigned,
      threshold = 0.99, frozenCensus = Some(census))

    val incremental = storedPairs.unionByName(probePairs).distinct()
      .as[(Long, Long)].collect().toSet
    val full = VectorOps.pairsFromAssigned(unionAssigned,
      threshold = 0.99, nProbe = 1, frozenCensus = Some(census))
      .as[(Long, Long)].collect().toSet
    assert(incremental == full,
      s"incremental (${incremental.size}) != full (${full.size}) " +
        "under an active frozen cap")
    // and the cap is genuinely ACTIVE: far below the uncapped clique
    assert(full.size < n * (n - 1) / 2 / 4)
    assert(full.nonEmpty)
  }
}
