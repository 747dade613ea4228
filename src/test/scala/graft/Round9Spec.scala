package graft

import org.apache.spark.sql.functions._

import graft.operators.{TextOps, VectorOps}
import graft.sources.Tables

/** Round-9 operators: semantics pinned beyond the hash gate — BM25
  * ranking invariants, the greedy subword segmenter on hand words,
  * exact temperature-mixture budgets and their tail-upsampling
  * property, the power-iteration Rayleigh-quotient gain, recall-audit
  * bounds, and streaming-top-k ≡ batch parity.
  */
class Round9Spec extends SparkSpec {
  import spark.implicits._

  val dir = sf("sf0.001")

  test("bm25: per-query ranks contiguous, scores non-increasing, no self") {
    val r = graft.operators.Retrieval.bm25(spark, dir).cache()
    assert(r.filter($"query_id" === $"doc_id").count() == 0)
    val perQ = r.groupBy("query_id").agg(
      count(lit(1)).as("n"), max("rank").as("mx"), min("rank").as("mn"))
    assert(perQ.filter($"mn" =!= 1 || $"mx" =!= $"n").count() == 0)
    // within a query, score never increases as rank increases
    val viol = r.as[(Long, Int, Long, Double)].collect().toSeq
      .groupBy(_._1).values.flatMap { rows =>
        rows.sortBy(_._2).sliding(2).collect {
          case Seq(a, b) if b._4 > a._4 + 1e-12 => (a, b)
        }
      }
    assert(viol.isEmpty, viol.take(3).toSeq.toString)
    // BM25 contributions are positive under the +1 idf form
    assert(r.filter($"score" <= 0.0).count() == 0)
    r.unpersist()
  }

  test("wordpiece: hand segmentations and corpus invariants") {
    assert(TextOps.wordpieceSegment("customer") == ((3, 0)))
    assert(TextOps.wordpieceSegment("window") == ((2, 0)))
    assert(TextOps.wordpieceSegment("the") == ((1, 0)))
    assert(TextOps.wordpieceSegment("query") == ((1, 1)))
    assert(TextOps.wordpieceSegment("spark") == ((1, 0)))
    val s = TextOps.wordpieceStats(spark, dir).cache()
    // pieces >= words (a word maps to >= 1 piece), unk <= words
    assert(s.filter($"n_pieces" < $"n_words").count() == 0)
    assert(s.filter($"n_unk" > $"n_words").count() == 0)
    assert(s.filter($"fertility" < 1.0).count() == 0)
    // every doc mentioning "query" has at least one [UNK]
    val withQ = Tables.documents(spark, dir)
      .filter($"text".contains("query")).select("doc_id")
    assert(s.join(withQ, "doc_id").filter($"n_unk" === 0).count() == 0)
    s.unpersist()
  }

  test("temperature mixture: exact budgets, tail languages upsampled") {
    val m = TextOps.temperatureMixture(spark, dir).cache()
    // kept count per language == its integer target, exactly
    val kept = m.filter($"keep").groupBy("lang")
      .agg(count(lit(1)).as("k"), first("n_target").as("t"))
    assert(kept.filter($"k" =!= $"t").count() == 0)
    // alpha = 0.5 gives every minority language a sample share at
    // least its corpus share (sqrt compresses toward uniform)
    val rows = m.select("lang", "c", "n_target").distinct()
      .as[(String, Long, Long)].collect()
    val n = rows.map(_._2).sum.toDouble
    val b = rows.map(_._3).sum.toDouble
    val minLang = rows.minBy(_._2)
    assert(minLang._3 / b >= minLang._2 / n - 1e-9,
      s"$minLang not upsampled")
    m.unpersist()
  }

  test("pca power: Rayleigh quotient beats the uniform start axis") {
    val v2 = VectorOps.leadingDirection(spark, dir)
    val n2 = math.sqrt(v2.map(x => x * x).sum)
    val u2 = v2.map(_ / n2)
    val u0 = Array.fill(64)(0.125)
    def rayleigh(u: Array[Double]): Double =
      Tables.embeddings(spark, dir)
        .select(VectorOps.dotLit(col("embedding"), u).as("p"))
        .agg(sum($"p" * $"p")).as[Double].head()
    assert(rayleigh(u2) >= rayleigh(u0) * (1.0 - 1e-9))
    // projections are deterministic across runs
    val a = VectorOps.pcaPowerProjection(spark, dir)
      .as[(Long, Long, Double)].collect().toSeq
    val b = VectorOps.pcaPowerProjection(spark, dir)
      .as[(Long, Long, Double)].collect().toSeq
    assert(a == b)
  }

  test("ann recall audit: bounds hold and the index mostly agrees") {
    val r = VectorOps.annRecallAudit(spark, dir).cache()
    assert(r.filter($"hits" < 0 || $"hits" > 5).count() == 0)
    assert(r.filter(abs($"recall_at_5" - $"hits" / 5.0) > 1e-12)
      .count() == 0)
    val meanR = r.agg(avg("recall_at_5")).as[Double].head()
    assert(meanR >= 0.5, s"mean recall@5 $meanR — 4-of-16-probe serve " +
      "should recover at least half the true neighbors")
    r.unpersist()
  }

  test("hard negatives: exactly the dense-farthest members of the pool") {
    val hn = graft.operators.Retrieval.hardNegatives(spark, dir)
      .select("query_id", "doc_id", "cos_sim")
      .as[(Long, Long, Double)].collect().toSeq
    assert(hn.forall { case (_, _, c) => c >= -1.0 - 1e-9 && c <= 1.0 + 1e-9 })
    // recompute the pool independently: selected = min-k by cosine
    val s = graft.operators.Retrieval.bm25(spark, dir, k = 20)
      .select("query_id", "doc_id").as[(Long, Long)].collect().toSeq
    val poolByQ = s.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    hn.groupBy(_._1).foreach { case (q, sel) =>
      assert(sel.forall(r => poolByQ(q).contains(r._2)),
        s"query $q selected outside its BM25 pool")
    }
  }

  test("dsir: exact budget, in-domain docs score higher") {
    val r = TextOps.dsirSelect(spark, dir).cache()
    val n = r.count()
    val b = n / 10
    assert(r.filter($"keep").count() == b)
    assert(r.filter($"keep" =!= ($"rank" <= b)).count() == 0)
    // ranks are a permutation of 1..n, cum_tokens ends at the total
    assert(r.agg(countDistinct("rank")).as[Long].head() == n)
    assert(r.agg(max("rank")).as[Long].head() == n)
    assert(r.agg(max("cum_tokens")).as[Long].head() ==
      r.agg(sum("n_tokens")).as[Long].head())
    // the point of DSIR: the target domain's docs rank higher
    val src = Tables.documents(spark, dir).select("doc_id", "source")
    val m = r.join(src, "doc_id")
      .groupBy($"source" === "src0")
      .agg(avg("logw")).as[(Boolean, Double)].collect().toMap
    assert(m(true) > m(false),
      s"src0 mean logw ${m(true)} not above corpus ${m(false)}")
    r.unpersist()
  }

  test("cluster data card: partition accounting and bounded stats") {
    val c = VectorOps.clusterDataCard(spark, dir).cache()
    val total = Tables.embeddings(spark, dir).count()
    assert(c.agg(sum("n_vecs")).as[Long].head() == total)
    assert(c.filter($"purity" <= 0.0 || $"purity" > 1.0).count() == 0)
    val nLabels = Tables.embeddings(spark, dir)
      .select("label").distinct().count()
    assert(c.filter($"label_entropy" < -1e-9 ||
      $"label_entropy" > math.log(nLabels.toDouble) + 1e-6).count() == 0)
    assert(c.filter($"mean_d2" < 0.0).count() == 0)
    c.unpersist()
  }

  test("mmr: three distinct picks, scores non-increasing") {
    val m = graft.operators.Retrieval.mmrRetrieve(spark, dir)
      .as[(Long, Int, Long, Double)].collect().toSeq
    m.groupBy(_._1).foreach { case (q, picks) =>
      assert(picks.map(_._3).distinct.size == picks.size,
        s"query $q repeated a pick")
      val byNo = picks.sortBy(_._2)
      assert(byNo.map(_._2) == (1 to byNo.size).toList)
      // MMR scores can only fall as the selected set grows
      byNo.sliding(2).foreach {
        case Seq(a, b) => assert(b._4 <= a._4 + 1e-9,
          s"query $q score rose from pick ${a._2} to ${b._2}")
        case _ =>
      }
    }
  }

  test("dedup profile: monotone in threshold, consistent with q33") {
    val p = TextOps.dedupProfile(spark, dir)
      .as[(Double, Long, Long, Double)].collect().toSeq.sortBy(_._1)
    assert(p.map(_._1) == Seq(0.5, 0.7, 0.9))
    assert(p.sliding(2).forall {
      case Seq(a, b) => b._2 <= a._2 && b._3 <= a._3
      case _ => true
    })
    assert(p.forall(r => r._4 >= 0.0 && r._4 <= 1.0))
    // the 0.7 row restates the q33 contract exactly
    val q33 = TextOps.minhashNearDups(spark, dir).count()
    assert(p.find(_._1 == 0.7).get._2 == q33)
  }

  test("event sequences: bounded prefix, faithful ordering") {
    val s = graft.operators.Events.eventSequences(spark, dir).cache()
    assert(s.filter(size(split($"seq", " ")) > 30).count() == 0)
    assert(s.filter(size(split($"seq", " ")) >
      $"n_events").count() == 0)
    val nUsers = Tables.events(spark, dir)
      .select("user_id").distinct().count()
    assert(s.count() == nUsers)
    // hand-replay one user's prefix
    val u = s.select("user_id").as[Long].head()
    val expect = Tables.events(spark, dir)
      .filter($"user_id" === u)
      .select("ts", "event_id", "event_type")
      .as[(java.sql.Timestamp, Long, String)].collect().toSeq
      .sortBy(r => (r._1.getTime, r._2)).take(30).map(_._3)
      .mkString(" ")
    assert(s.filter($"user_id" === u).select("seq").as[String].head()
      == expect)
    s.unpersist()
  }

  test("weighted sample: exact budget, weight actually tilts the draw") {
    val r = TextOps.weightedSample(spark, dir).cache()
    val n = r.count()
    assert(r.filter($"keep").count() == n / 5)
    assert(r.agg(countDistinct("rank")).as[Long].head() == n)
    // A-ES with w = length: the kept set skews long
    val kept = r.filter($"keep").agg(avg("n_tokens")).as[Double].head()
    val rest = r.filter(!$"keep").agg(avg("n_tokens")).as[Double].head()
    assert(kept > rest,
      s"kept mean $kept not above unkept mean $rest")
    r.unpersist()
  }

  test("embedding drift: identical halves read ~zero, a planted shift " +
      "does not") {
    val d = VectorOps.embeddingDrift(spark, dir).cache()
    assert(d.filter($"bucket" < -8 || $"bucket" > 7).count() == 0)
    val total = Tables.embeddings(spark, dir).count()
    assert(d.agg(sum($"n_a" + $"n_b")).as[Long].head() == total)
    val psi = d.select("psi").as[Double].head()
    assert(psi >= 0.0 && psi < 0.1,
      s"same-generator halves should read as no-drift, got $psi")
    // plant a real shift through the same arithmetic: compare the
    // reference half against ITSELF displaced by two buckets
    val g = d.select($"bucket", $"n_a", ($"bucket" - 2).as("b2"))
    val shifted = g.select($"bucket", $"n_a")
      .join(g.select($"b2".as("bucket"), $"n_a".as("n_b")),
        Seq("bucket"), "full_outer")
      .select(lit("embedding").as("event_type"), $"bucket",
        coalesce($"n_a", lit(0L)).as("n_a"),
        coalesce($"n_b", lit(0L)).as("n_b"))
    val psiShift = graft.operators.Analytics.psiFrom(shifted)
      .select("psi").as[Double].head()
    assert(psiShift > psi * 5,
      s"a 2-bucket displacement ($psiShift) should dwarf the null ($psi)")
    d.unpersist()
  }

  test("incremental posting stats equal the from-scratch aggregate") {
    val inc = TextOps.postingStatsIncremental(spark, dir)
    val full = Tables.documents(spark, dir)
      .select($"doc_id", explode(split($"text", " ")).as("t"))
      .groupBy("doc_id", "t").agg(count(lit(1)).as("c"))
      .groupBy("t").agg(count(lit(1)).as("df"), sum("c").as("tf"))
    assert(inc.as[(String, Long, Long)].collect().toSet ==
      full.as[(String, Long, Long)].collect().toSet)
    val totTok = Tables.documents(spark, dir)
      .select(explode(split($"text", " "))).count()
    assert(inc.agg(sum("tf")).as[Long].head() == totTok)
  }

  test("retrieval eval: metric bounds and recall consistency") {
    val m = VectorOps.retrievalEvalMart(spark, dir).cache()
    assert(m.filter($"mrr" < 0.0 || $"mrr" > 1.0).count() == 0)
    assert(m.filter($"ndcg" < 0.0 || $"ndcg" > 1.0 + 1e-9).count() == 0)
    // whenever the recall audit found >= 1 hit, MRR must be >= 1/5
    val r = VectorOps.annRecallAudit(spark, dir)
      .select($"query_id", $"hits")
    val joined = m.join(r, "query_id")
    assert(joined.filter($"hits" > 0 && $"mrr" < 0.2 - 1e-9).count() == 0)
    assert(joined.filter($"hits" === 0 && $"mrr" =!= 0.0).count() == 0)
    m.unpersist()
  }

  test("media card reconciles with the per-item decode") {
    val card = graft.operators.Multimodal.mediaCard(spark, dir).cache()
    val dims = graft.operators.Multimodal.mediaHeaderDims(spark, dir)
      .cache()
    assert(card.select("kind").as[String].collect().toSet ==
      Set("png", "jpeg"))
    assert(card.agg(sum("n_items")).as[Long].head() == dims.count())
    assert(card.agg(sum("n_corrupt")).as[Long].head() ==
      dims.filter($"width" === -1).count())
    assert(card.filter($"corrupt_rate" < 0.0 ||
      $"corrupt_rate" > 1.0).count() == 0)
    card.unpersist(); dims.unpersist()
  }

  test("skew advisor: per-key accounting holds") {
    val a = graft.operators.Analytics.skewAdvisor(spark, dir)
      .as[(String, Long, Long, Long, Double, Double)].collect().toSeq
    assert(a.map(_._1).sorted ==
      Seq("l_orderkey", "l_partkey", "l_suppkey"))
    val n = Tables.lineitem(spark, dir).count()
    a.foreach { case (k, rows, keys, mx, ratio, share) =>
      assert(rows == n, s"$k n_rows $rows != $n")
      assert(keys <= rows && mx <= rows)
      assert(ratio >= 1.0 - 1e-9, s"$k skew_ratio $ratio < 1")
      assert(math.abs(share - mx.toDouble / rows) < 1e-12)
    }
  }

  test("release manifest reconciles with its component stages") {
    val m = graft.operators.TextOps.releaseManifest(spark, dir)
      .collect()(0)
    val docs = Tables.documents(spark, dir)
    assert(m.getAs[Long]("n_ingested") == docs.count())
    val v = graft.operators.TextOps.curationVerdicts(spark, dir).cache()
    assert(m.getAs[Long]("n_scored") == v.count())
    // delete-aware accounting: eligible = shipped + retracted, and the
    // retraction feed is the doc-keyed tombstone rule (doc_id % 7 = 3)
    val eligible = v.filter($"keep")
    val released = eligible.filter($"doc_id" % 7 =!= 3)
    val removed = eligible.filter($"doc_id" % 7 === 3)
    assert(m.getAs[Long]("n_released") == released.count())
    assert(m.getAs[Long]("n_removed") == removed.count())
    assert(m.getAs[Long]("n_released") + m.getAs[Long]("n_removed")
      == eligible.count())
    assert(m.getAs[Long]("n_train") + m.getAs[Long]("n_val") +
      m.getAs[Long]("n_test") == m.getAs[Long]("n_released"))
    def tokMass(ids: org.apache.spark.sql.DataFrame): Long =
      docs.join(ids.select("doc_id"), "doc_id")
        .select(coalesce(sum(size(split($"text", " ")).cast("long")),
          lit(0L)))
        .as[Long].head()
    assert(m.getAs[Long]("n_tokens_released") == tokMass(released))
    assert(m.getAs[Long]("n_tokens_removed") == tokMass(removed))
    v.unpersist()
  }

  test("streaming top-k equals the batch aggregate bit-for-bit") {
    val streamed = graft.streaming.StreamingTopK.topSpenders(spark, dir)
      .as[(Int, Long, Long, Double)].collect().toSeq
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(desc("cents"), asc("user_id"))
    val batch = Tables.events(spark, dir)
      .filter($"event_type" === "purchase")
      .groupBy("user_id")
      .agg(sum(graft.util.Portable.cents2($"value")).as("cents"),
        count(lit(1)).as("n_purchases"))
      .withColumn("rank", row_number().over(w))
      .filter($"rank" <= 10)
      .select($"rank", $"user_id", $"n_purchases",
        ($"cents".cast("double") / lit(100.0)).as("revenue"))
      .as[(Int, Long, Long, Double)].collect().toSeq
    assert(streamed == batch)
  }
}
