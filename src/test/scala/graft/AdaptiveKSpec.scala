package graft

import graft.operators.VectorOps

/** The √n-class coarse-quantizer policy (round-8): K must sit exactly
  * at the 16 floor for every GATE corpus (that equality is what keeps
  * the DuckDB oracles' literal-16 centroid sets bit-identical), and
  * grow ~√n beyond it — 50 at the 10× ScaleGen fixture, 159 at 100×.
  */
class AdaptiveKSpec extends SparkSpec {

  test("gate corpora resolve to the 16 floor — oracle bit-identity") {
    for (d <- Seq(sf("sf0.001"), sf("sf0.01"), sf("sf0.1"))) {
      val n = graft.sources.Tables.embeddings(spark, d).count()
      assert(VectorOps.adaptiveK(n) == 16,
        s"$d: adaptiveK($n) != 16 — the q141/q153/q155/q163 oracles' " +
          "literal-16 centroid sets would diverge")
    }
  }

  test("policy grows ~sqrt(n) past the floor: 10x -> 50, 100x -> 159") {
    assert(VectorOps.adaptiveK(2048) == 16)  // boundary: still floor
    assert(VectorOps.adaptiveK(2049) == 17)  // first step past it
    assert(VectorOps.adaptiveK(20000) == 50)
    assert(VectorOps.adaptiveK(200000) == 159)
    // monotone non-decreasing over a sweep — an index never shrinks
    // its centroid count as the corpus grows
    val ks = (1L to 500L).map(i => VectorOps.adaptiveK(i * 1000))
    assert(ks.zip(ks.tail).forall { case (a, b) => a <= b })
  }

  test("adaptive default equals the explicit-16 result at a gate SF") {
    val dir = sf("sf0.001")
    val adaptive = VectorOps.embeddingDedupIvf(spark, dir)
      .collect().toSeq
    val explicit16 = VectorOps.embeddingDedupIvf(spark, dir, 16)
      .collect().toSeq
    assert(adaptive == explicit16)
  }
}
