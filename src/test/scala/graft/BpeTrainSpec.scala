package graft

import org.apache.spark.sql.functions._

import graft.operators.BpeTrain

/** q206 — BPE merge training. The hash gate proves Spark ≡ DuckDB on
  * the fixture; this spec proves the ALGORITHM: the exact greedy merge
  * sequence on the textbook "low/lower/lowest" corpus (hand-derived,
  * including the (count DESC, l, r) tie-breaks), plus the corpus-level
  * greedy invariants — chosen counts never increase across rounds, a
  * pair is never merged twice, and each round adds at most one symbol
  * to the vocabulary.
  */
class BpeTrainSpec extends SparkSpec {
  import spark.implicits._

  test("hand-computed merge sequence on the classic corpus") {
    // freqs: low×3, lower×1, lowest×1
    val docs = Seq("low low low lower lowest").toDF("text")
    val got = BpeTrain.bpeMergesFrom(docs, 6)
      .as[(Int, String, String, Long, Long)].collect().toSeq
      .map(r => (r._2, r._3, r._4))
    // round 1: (l,o)=5 ties (o,w)=5 → l ASC picks (l,o)
    // round 4: all counts 1 → (lowe,r) beats (lowe,s) on r ASC
    val want = Seq(
      ("l", "o", 5L), ("lo", "w", 5L), ("low", "e", 2L),
      ("lowe", "r", 1L), ("lowe", "s", 1L), ("lowes", "t", 1L))
    assert(got == want, got.toString)
  }

  test("greedy invariants on the fixture corpus") {
    val m = BpeTrain.bpeMerges(spark, sf("sf0.001"))
      .as[(Int, String, String, Long, Long)].collect().toSeq
      .sortBy(_._1)
    assert(m.size == 8)
    // chosen pair counts are non-increasing (a successor pair's count
    // is bounded by its constituent pair's pre-merge count)
    assert(m.sliding(2).forall { case Seq(a, b) => b._4 <= a._4 },
      m.map(_._4).toString)
    // no pair merges twice
    assert(m.map(r => (r._2, r._3)).distinct.size == m.size)
    // vocab grows by at most one symbol per round
    assert(m.sliding(2).forall { case Seq(a, b) => b._5 <= a._5 + 1 })
  }
}
