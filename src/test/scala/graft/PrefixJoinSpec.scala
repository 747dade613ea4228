package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.PrefixJoin

/** q201 — exact set-similarity join via prefix filtering.
  *
  * The hash gate proves equality with the relational oracle on the
  * fixture corpus; this spec pins the EXACTNESS claim itself (no false
  * negatives) against a brute-force all-pairs pass, both on the fixture
  * and on an adversarial corpus built so that every intersection token
  * sits LAST in the global rarity order — the case a too-short prefix
  * would miss — plus the plan-shape guarantee that candidates come from
  * an equi-join, never a cartesian.
  */
class PrefixJoinSpec extends SparkSpec {
  import spark.implicits._

  private def brute(docs: DataFrame, t: Double): Set[(Long, Long)] = {
    val a = docs.select(col("doc_id").as("ida"), col("toks").as("ta"))
    val b = docs.select(col("doc_id").as("idb"), col("toks").as("tb"))
    a.join(b, col("ida") < col("idb"))
      .withColumn("c", size(array_intersect($"ta", $"tb")).cast("double"))
      .withColumn("j", $"c" / ((size($"ta") + size($"tb")).cast("double") - $"c"))
      .filter($"j" >= t)
      .select("ida", "idb").as[(Long, Long)].collect().toSet
  }

  private def prefixPairs(docs: DataFrame, t: Double): Set[(Long, Long)] =
    PrefixJoin.similarityJoinOf(docs, t)
      .select("ida", "idb").as[(Long, Long)].collect().toSet

  test("prefix join ≡ brute force on the fixture corpus") {
    val docs = graft.sources.Tables.documents(spark, sf("sf0.001"))
      .select(col("doc_id"),
        array_distinct(graft.operators.TextOps.shingles(col("text")))
          .as("toks"))
      .cache()
    for (t <- Seq(0.3, 0.5, 0.8))
      assert(prefixPairs(docs, t) == brute(docs, t), s"threshold $t")
    docs.unpersist()
  }

  test("no false negatives when shared tokens are globally COMMON") {
    // Adversarial shape: the intersection tokens are the most common in
    // the corpus (df = n), so they rank LAST in every doc's rarity
    // order. The prefix bound must still admit each matching pair.
    // docs i: {common1, common2, common3, rare_i, rare'_i} — every pair
    // shares exactly the 3 common tokens, J = 3/7 ≈ 0.4286.
    val docs = (0L until 40L).map { i =>
      (i, Array("c1", "c2", "c3", s"r$i", s"rr$i"))
    }.toDF("doc_id", "toks").cache()
    for (t <- Seq(0.2, 0.42, 0.43, 0.6)) {
      val got = prefixPairs(docs, t)
      val want = brute(docs, t)
      assert(got == want, s"threshold $t: got ${got.size}, want ${want.size}")
      if (t <= 0.42) assert(want.size == 40 * 39 / 2) // sanity: all pairs match
      if (t >= 0.43) assert(want.isEmpty)
    }
    docs.unpersist()
  }

  test("mixed sizes and subset containment stay exact") {
    // subsets, supersets, disjoint singletons, duplicate sets
    val rows = Seq(
      (1L, Array("a", "b", "c", "d")),
      (2L, Array("a", "b", "c", "d")),          // exact dup of 1
      (3L, Array("a", "b")),                    // subset, J = 0.5
      (4L, Array("x")),                         // disjoint
      (5L, Array("a", "b", "c", "d", "e", "f", "g", "h")), // J(1,5)=0.5
      (6L, Array("e", "f", "g", "h")))
    val docs = rows.toDF("doc_id", "toks").cache()
    for (t <- Seq(0.3, 0.5, 0.51, 0.99, 1.0))
      assert(prefixPairs(docs, t) == brute(docs, t), s"threshold $t")
    docs.unpersist()
  }

  private def bruteContain(docs: DataFrame, t: Double): Set[(Long, Long)] = {
    val a = docs.filter(pmod(col("doc_id"), lit(25L)) === 0)
      .select(col("doc_id").as("eval_id"), col("toks").as("ta"))
    val b = docs.select(col("doc_id"), col("toks").as("tb"))
    a.join(b, col("eval_id") =!= col("doc_id"))
      .withColumn("c", size(array_intersect($"ta", $"tb")).cast("double"))
      .withColumn("cont", $"c" / size($"ta"))
      .filter($"cont" >= t)
      .select("eval_id", "doc_id").as[(Long, Long)].collect().toSet
  }

  private def prefixContain(docs: DataFrame, t: Double): Set[(Long, Long)] =
    PrefixJoin.containmentJoinOf(docs, t)
      .select("eval_id", "doc_id").as[(Long, Long)].collect().toSet

  test("containment join ≡ brute force on the fixture corpus") {
    val docs = graft.sources.Tables.documents(spark, sf("sf0.001"))
      .select(col("doc_id"),
        array_distinct(graft.operators.TextOps.shingles(col("text")))
          .as("toks"))
      .cache()
    for (t <- Seq(0.3, 0.5, 0.8))
      assert(prefixContain(docs, t) == bruteContain(docs, t),
        s"threshold $t")
    docs.unpersist()
  }

  test("containment catches a quote Jaccard misses") {
    // eval doc 25 = 6 shingle-tokens, fully quoted inside a 60-token
    // page: containment 1.0, Jaccard 0.1
    val quote = Array("q1", "q2", "q3", "q4", "q5", "q6")
    val page = quote ++ (1 to 54).map(i => s"p$i")
    val noise = (1 to 40).map(i => s"n$i").toArray
    val docs = Seq(
      (25L, quote), (1L, page), (2L, noise)).toDF("doc_id", "toks").cache()
    assert(prefixContain(docs, 0.9) == Set((25L, 1L)))
    assert(prefixContain(docs, 0.9) == bruteContain(docs, 0.9))
    // the symmetric join would reject it: J = 6/60 = 0.1
    assert(PrefixJoin.similarityJoinOf(docs, 0.5)
      .filter($"ida" === 1L || $"idb" === 1L).count() == 0)
    docs.unpersist()
  }

  test("plan has no cartesian product and candidates join on the token") {
    val df = PrefixJoin.similarityJoin(spark, sf("sf0.001"))
    val phys = df.queryExecution.executedPlan.toString
    assert(!phys.contains("CartesianProduct"), phys.take(2000))
    assert(!phys.contains("BroadcastNestedLoopJoin"), phys.take(2000))
  }
}
