package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, rng}

import graft.operators.PrefixJoin

/** Property proof for the q201/q209 exactness claims on ARBITRARY
  * random corpora, not just the fixture and the hand-built shapes:
  * for randomly drawn token-set corpora (small vocabularies force
  * heavy overlap — the hard case for prefix bounds) the prefix-filter
  * similarity join and the one-sided containment join must equal their
  * brute-force counterparts at every threshold tried. Generators are
  * driven with a fixed seed (the scalatest-scalacheck bridge isn't in
  * the offline cache — the WordpiecePropertySpec pattern).
  */
class PrefixJoinPropertySpec extends SparkSpec {
  import spark.implicits._

  private val corpusGen: Gen[Seq[(Long, Array[String])]] = for {
    vocabSize <- Gen.choose(4, 14) // small vocab ⇒ dense overlap
    nDocs <- Gen.choose(5, 28)
    docs <- Gen.listOfN(nDocs, for {
      m <- Gen.choose(1, 10)
      toks <- Gen.listOfN(m, Gen.choose(0, vocabSize - 1))
    } yield toks.distinct.map(i => s"t$i").toArray)
  } yield docs.zipWithIndex.map { case (t, i) => (i * 5L, t) }
  // ids stride 5 so some docs are eval-registry members (id % 25 == 0)

  private def drive[A](g: Gen[A], n: Int): Seq[A] = {
    var seed = rng.Seed(20260814L)
    (1 to n).map { _ =>
      val v = g.pureApply(Gen.Parameters.default, seed)
      seed = seed.next
      v
    }
  }

  private def bruteSim(docs: DataFrame, t: Double): Set[(Long, Long)] = {
    val a = docs.select(col("doc_id").as("ida"), col("toks").as("ta"))
    val b = docs.select(col("doc_id").as("idb"), col("toks").as("tb"))
    a.join(b, col("ida") < col("idb"))
      .withColumn("c", size(array_intersect($"ta", $"tb")).cast("double"))
      .withColumn("j",
        $"c" / ((size($"ta") + size($"tb")).cast("double") - $"c"))
      .filter($"j" >= t).select("ida", "idb")
      .as[(Long, Long)].collect().toSet
  }

  private def bruteCont(docs: DataFrame, t: Double): Set[(Long, Long)] = {
    val a = docs.filter(pmod(col("doc_id"), lit(25L)) === 0)
      .select(col("doc_id").as("eval_id"), col("toks").as("ta"))
    val b = docs.select(col("doc_id"), col("toks").as("tb"))
    a.join(b, col("eval_id") =!= col("doc_id"))
      .withColumn("c", size(array_intersect($"ta", $"tb")).cast("double"))
      .withColumn("cont", $"c" / size($"ta"))
      .filter($"cont" >= t).select("eval_id", "doc_id")
      .as[(Long, Long)].collect().toSet
  }

  test("float-boundary threshold keeps the exact-J pair (t=0.1, m=30)") {
    // t·m = 0.1·30 evaluates to 3.0000000000000004 in doubles: without
    // the downward slack the length filter prunes the pair outright AND
    // ceil shortens B's prefix from 28 to 27 — a silent false negative
    // on an EXACT-threshold pair (J = 3/30 = 0.1). The slack must keep
    // it; brute force is the referee.
    val a = (0L, (0 until 3).map(i => s"t$i").toArray)
    val b = (25L, (0 until 30).map(i => s"t$i").toArray) // superset
    val docs = Seq(a, b).toDF("doc_id", "toks").cache()
    val got = PrefixJoin.similarityJoinOf(docs, 0.1)
      .select("ida", "idb").as[(Long, Long)].collect().toSet
    assert(got == Set((0L, 25L)))
    // containment side: C(A→B)=1 trivially, but C(B→A)=3/30=0.1 with
    // eval doc B (id 25? no — eval ids are ≡0 mod 25, use A at id 0
    // reversed): make B the eval doc instead
    val docs2 = Seq((0L, b._2), (7L, a._2)).toDF("doc_id", "toks").cache()
    val cont = PrefixJoin.containmentJoinOf(docs2, 0.1)
      .select("eval_id", "doc_id").as[(Long, Long)].collect().toSet
    assert(cont.contains((0L, 7L)),
      "containment C(eval 30-tok → 3-tok subset) = 0.1 must survive t=0.1")
    docs.unpersist(); docs2.unpersist()
  }

  test("similarity join ≡ brute force on random dense corpora") {
    drive(corpusGen, 12).zipWithIndex.foreach { case (rows, i) =>
      val docs = rows.toDF("doc_id", "toks").cache()
      for (t <- Seq(0.1, 0.25, 0.5, 0.75)) {
        val got = PrefixJoin.similarityJoinOf(docs, t)
          .select("ida", "idb").as[(Long, Long)].collect().toSet
        assert(got == bruteSim(docs, t), s"corpus $i threshold $t")
      }
      docs.unpersist()
    }
  }

  test("containment join ≡ brute force on random dense corpora") {
    drive(corpusGen, 12).zipWithIndex.foreach { case (rows, i) =>
      val docs = rows.toDF("doc_id", "toks").cache()
      for (t <- Seq(0.1, 0.34, 0.67, 1.0)) {
        val got = PrefixJoin.containmentJoinOf(docs, t)
          .select("eval_id", "doc_id").as[(Long, Long)].collect().toSet
        assert(got == bruteCont(docs, t), s"corpus $i threshold $t")
      }
      docs.unpersist()
    }
  }
}
