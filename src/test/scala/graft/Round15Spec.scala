package graft

import graft.operators.Retrieval

/** Round-11 optimization equivalences (the second optimization round):
  * the retrieval driver-action fusion rewired bm25Scores/prfBm25 onto
  * queryCtx — ONE cohort collect + a checkpointed pruned posting pass
  * on the small-workload path, the unchanged shuffle plan on the
  * oversized path. The oracle gate proves the shipped (small) path;
  * this spec pins the two paths against EACH OTHER, so the
  * smallness threshold can never become a correctness knob.
  */
class Round15Spec extends SparkSpec {

  private val dir = sf("sf0.001")

  test("bm25 scores: small (collected cohort + pruned postings) path " +
      "≡ oversized (full posting shuffle) path") {
    import spark.implicits._
    val small = Retrieval.bm25ScoresAt(spark, dir, Double.MaxValue)
      .as[(Long, Long, Long)].collect().toSet
    val big = Retrieval.bm25ScoresAt(spark, dir, 0.0)
      .as[(Long, Long, Long)].collect().toSet
    assert(small.nonEmpty)
    assert(small == big)
  }
}
