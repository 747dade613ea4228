package graft

import org.apache.spark.sql.functions._
import graft.operators.{TextOps, VectorOps}
import graft.streaming.StreamingFunnel

/** North-star extension specs: dedup family, ANN, streaming parity. */
class ExtensionSpec extends SparkSpec {
  import spark.implicits._

  test("minhash LSH finds planted near-duplicates (and exact dups)") {
    // sf0.001 has exact dups planted? verify behavior on a crafted frame
    val base = "the quick brown fox jumps over the lazy dog again and again"
    val near = "the quick brown fox jumps over the lazy dog again and once"
    val far = "completely different words with nothing shared at all here now"
    val docs = Seq((0L, base), (1L, base), (2L, near), (3L, far))
      .toDF("doc_id", "text")
    val tmp = java.nio.file.Files.createTempDirectory("mh").toString
    docs.write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val pairs = TextOps.minhashNearDups(spark, tmp, threshold = 0.5)
      .select("ida", "idb").as[(Long, Long)].collect().toSet
    assert(pairs.contains((0L, 1L))) // exact dup always caught
    assert(pairs.contains((0L, 2L)) || pairs.contains((1L, 2L))) // near dup
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L)) // far doc excluded
  }

  test("simhash: identical docs share signature; near docs are close") {
    val got = TextOps.simhash(spark, sf("sf0.001"))
    assert(got.count() == 500)
    // deterministic across runs
    val a = got.collect().map(r => (r.getLong(0), r.getLong(1)))
    val b = TextOps.simhash(spark, sf("sf0.001")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(a.sameElements(b))
  }

  test("vector LSH near-dup finds planted near-identical embeddings") {
    val v = Array.tabulate(16)(i => 0.1f * (i + 1))
    val vNear = v.clone(); vNear(0) = v(0) + 1e-4f
    val vFar = Array.tabulate(16)(i => if (i % 2 == 0) -1.0f else 1.0f)
    val emb = Seq((0L, v.toSeq), (1L, vNear.toSeq), (2L, vFar.toSeq))
      .toDF("vec_id", "embedding")
    val pairs = VectorOps.lshNearDups(spark, emb, dim = 16, threshold = 0.99)
      .select("ida", "idb").as[(Long, Long)].collect().toSet
    assert(pairs == Set((0L, 1L)))
  }

  test("ivf: planted clusters are recovered through their own bucket") {
    // 4 tight clusters of 8 vectors each; cluster seeds are the first 4
    // ids so they double as IVF centroids. A query from cluster 0 must
    // find its cluster-mates (they share its probed bucket).
    val dim = 16
    def vecOf(cluster: Int, jitter: Int): Seq[Float] =
      Array.tabulate(dim)(i =>
        (if (i % 4 == cluster) 1.0f else 0.05f) + jitter * 1e-3f).toSeq
    val rows = for (c <- 0 until 4; j <- 0 until 8)
      yield ((c + 4L * j), vecOf(c, j)) // ids 0..3 are the 4 seeds
    val emb = rows.toDF("vec_id", "embedding")
    val got = graft.operators.VectorOps
      .ivfKnnOn(spark, emb, nQueries = 4, k = 5, nCentroids = 4, nProbe = 1)
    val byQuery = got.collect().groupBy(_.getLong(0))
    assert(byQuery.keySet == Set(0L, 1L, 2L, 3L))
    byQuery.foreach { case (q, ns) =>
      // with nProbe=1 every neighbor comes from the query's own cluster:
      // ids ≡ cluster (mod 4)
      assert(ns.forall(r => r.getLong(2) % 4 == q % 4), s"query $q: ${ns.toSeq}")
      assert(ns.map(_.getInt(1)).sorted.sameElements(1 to ns.length))
    }
  }

  test("ivf recall: full probe equals brute force exactly; partial probe trades") {
    val full = graft.operators.VectorOps
      .ivfRecallAtK(spark, sf("sf0.001"), nProbe = 16)
    assert(full == 1.0, s"full-probe recall $full != 1.0")
    val partial = graft.operators.VectorOps
      .ivfRecallAtK(spark, sf("sf0.001"), nProbe = 4)
    assert(partial > 0.2 && partial <= 1.0, s"partial-probe recall $partial")
  }

  test("ivf on testdata: deterministic and structurally sound") {
    val a = graft.operators.VectorOps.ivfKnn(spark, sf("sf0.001")).collect()
    val b = graft.operators.VectorOps.ivfKnn(spark, sf("sf0.001")).collect()
    assert(a.map(_.toSeq).toSeq == b.map(_.toSeq).toSeq)
    a.groupBy(_.getLong(0)).foreach { case (_, rows) =>
      val sims = rows.sortBy(_.getInt(1)).map(_.getDouble(3))
      assert(sims.sameElements(sims.sorted.reverse))
    }
  }

  test("knn self-consistency: neighbors ranked by descending similarity") {
    val knn = VectorOps.knnCosine(spark, sf("sf0.001"), nQueries = 3, k = 4)
      .collect()
    assert(knn.length == 12)
    knn.groupBy(_.getLong(0)).foreach { case (_, rows) =>
      val sims = rows.sortBy(_.getInt(1)).map(_.getDouble(3))
      assert(sims.sameElements(sims.sorted.reverse))
    }
  }

  test("streaming funnel equals batch funnel") {
    val streamed = StreamingFunnel.funnel(spark, sf("sf0.001")).collect()
    val batch = graft.operators.Events.funnel(spark, sf("sf0.001")).collect()
    assert(streamed.map(_.toSeq).toSeq == batch.map(_.toSeq).toSeq)
  }

  test("language id predicts en on english stopwords") {
    val out = TextOps.langId(spark, sf("sf0.001"))
    // vocabulary is english-ish; at least docs containing 'the'/'a' → en
    assert(out.filter($"predicted" === "en" && $"score_en" > 0).count() > 0)
    assert(out.filter($"score_en" > 0 && $"predicted" =!= "en").count() == 0)
  }
}
