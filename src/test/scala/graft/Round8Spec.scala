package graft

import org.apache.spark.sql.functions._

import graft.operators.{Analytics, Graphs, TimeTravel, VectorOps}
import graft.sources.DeltaLog

/** Round-8 operators: semantics pinned beyond the hash gate — the
  * leakage-safe split invariant (no near-dup pair straddles a split),
  * int8 quantization bounds and serving fidelity, the DeltaLog change
  * feed's insert/update/delete classification on a hand log, and PSI
  * drift arithmetic on planted distributions.
  */
class Round8Spec extends SparkSpec {
  import spark.implicits._

  val dir = sf("sf0.001")

  test("leakage-safe split: no near-dup pair straddles a split") {
    val split = Graphs.leakageSafeSplit(spark, dir).cache()
    // every component maps to exactly one split
    assert(split.groupBy("component")
      .agg(countDistinct("split").as("n"))
      .filter($"n" > 1).count() == 0)
    // pair-level restatement: both endpoints of every near-dup pair
    // land on the same side
    val pairs = graft.operators.TextOps.minhashNearDups(spark, dir)
      .select("ida", "idb")
    val a = split.select($"doc_id".as("ida"), $"split".as("sa"))
    val b = split.select($"doc_id".as("idb"), $"split".as("sb"))
    assert(pairs.join(a, "ida").join(b, "idb")
      .filter($"sa" =!= $"sb").count() == 0)
    // the split covers the corpus exactly once, and train dominates
    val n = graft.sources.Tables.documents(spark, dir).count()
    assert(split.count() == n)
    assert(split.select("doc_id").distinct().count() == n)
    val byS = split.groupBy("split").count().as[(String, Long)]
      .collect().toMap
    assert(byS.getOrElse("train", 0L) > byS.getOrElse("val", 0L))
    assert(byS.getOrElse("train", 0L) > byS.getOrElse("test", 0L))
    split.unpersist()
  }

  test("int8 knn: codes bounded, error small, top-1 mostly preserved") {
    val q8 = VectorOps.int8Knn(spark, dir).cache()
    // quantization error on every served pair is tiny for 64-dim
    // unit-ish vectors (|cos_q8 - cos_f32| well under 1%)
    assert(q8.filter(abs($"cos_q8" - $"cos_f32") > 0.01).count() == 0)
    // the int8 ranking preserves the exact top-1 for most queries
    val exact = VectorOps.knnCosine(spark, dir)
      .filter($"rank" === 1)
      .select($"query_id", $"neighbor_id".as("nn_exact"))
    val approx = q8.filter($"rank" === 1)
      .select($"query_id", $"neighbor_id".as("nn_q8"))
    val agree = exact.join(approx, "query_id")
      .filter($"nn_exact" === $"nn_q8").count()
    assert(agree >= 8, s"int8 top-1 agreement only $agree/10")
    q8.unpersist()
    // codes stay in the signed-byte range on the real corpus
    val e = graft.sources.Tables.embeddings(spark, dir)
    val m = array_max(transform($"embedding", x => abs(x.cast("double"))))
    val codes = e
      .withColumn("scale", when(m === 0.0, 1.0).otherwise(m))
      .withColumn("codes", transform($"embedding",
        x => floor(x.cast("double") / $"scale" * lit(127.0) + lit(0.5))
          .cast("long")))
      .select(explode($"codes").as("c"))
    assert(codes.filter($"c" > 127 || $"c" < -127).count() == 0)
  }

  test("change feed: classification on a hand-built log") {
    val root = s"${System.getProperty("java.io.tmpdir")}/graft_cf_${ProcessHandle.current().pid()}"
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(root))
    def up(rows: (Long, String)*) = rows.toDF("k", "v")
    def del(ks: Long*) = ks.toDF("k")
    // e0: seed k=1,2,3. e1: update k=1, insert k=4. e2: delete k=2,
    // delete k=99 (never present), insert k=5 then... k=5 arrives in e1.
    DeltaLog.commit(spark, root, 0L, up(1L -> "a", 2L -> "b", 3L -> "c"),
      None, Seq("k"))
    DeltaLog.commit(spark, root, 1L, up(1L -> "a2", 4L -> "d", 5L -> "e"),
      None, Seq("k"))
    DeltaLog.commit(spark, root, 2L, up(4L -> "d2"),
      Some(del(2L, 99L, 5L)), Seq("k"))
    val got = DeltaLog.changes(spark, root, Seq("k"), 1L, 3L).get
      .select("k", "change_type", "v")
      .as[(Long, String, Option[String])].collect()
      .map { case (k, t, v) => k -> (t, v) }.toMap
    assert(got(1L) == ("update", Some("a2")))     // pre-existing, upserted
    assert(got(4L) == ("insert", Some("d2")))     // new in range, net post-image
    assert(got(2L) == ("delete", None))           // pre-existing, deleted
    assert(!got.contains(99L))                    // delete of absent key nets out
    assert(!got.contains(5L))                     // insert+delete in range nets out
    assert(!got.contains(3L))                     // untouched in range
    // snapshot time travel: as-of 2 sees e0+e1 resolved
    val asOf2 = DeltaLog.read(spark, root, Seq("k"), Some(2L)).get
      .as[(Long, String)].collect().toMap
    assert(asOf2 == Map(1L -> "a2", 2L -> "b", 3L -> "c", 4L -> "d", 5L -> "e"))
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(root))
  }

  test("change feed refuses a compacted range") {
    val root = s"${System.getProperty("java.io.tmpdir")}/graft_cf2_${ProcessHandle.current().pid()}"
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(root))
    // CompactEvery + 2 epochs so epochs 0..CompactEvery-1 fold into a base
    (0L to DeltaLog.CompactEvery + 1L).foreach { e =>
      DeltaLog.commit(spark, root, e, Seq((e, s"v$e")).toDF("k", "v"),
        None, Seq("k"))
    }
    intercept[IllegalArgumentException] {
      DeltaLog.changes(spark, root, Seq("k"), 0L, 2L)
    }
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(root))
  }

  test("time travel scenario: snapshot at 6 equals replaying the log") {
    // independent replay: resolve epochs 0..5 with a plain window over
    // the same staged log the gated query reads
    val root = TimeTravel.stagedLog(spark, dir)
    val snap = DeltaLog.read(spark, root, Seq("order_id"), Some(6L)).get
    val full = DeltaLog.read(spark, root, Seq("order_id"), None).get
    // as-of-6 differs from the full state (epochs 6,7 add keys)
    assert(snap.count() < full.count())
    // and matches the q168 aggregate's total
    val agg = TimeTravel.asOfSnapshot(spark, dir)
      .agg(sum("n_orders")).as[Long].head()
    assert(agg == snap.count())
  }

  test("knn join: every vector gets k neighbors, never itself") {
    val kj = VectorOps.knnJoin(spark, dir).cache()
    val n = graft.sources.Tables.embeddings(spark, dir).count()
    // every vector serves as a query and fills its k slots (buckets at
    // this corpus/centroid ratio always hold ≥ k candidates)
    assert(kj.select("query_id").distinct().count() == n)
    assert(kj.groupBy("query_id").count().filter($"count" =!= 3).count() == 0)
    assert(kj.filter($"query_id" === $"neighbor_id").count() == 0)
    // ranks are dense 1..k and cosine non-increasing within a query
    val badOrder = kj.withColumn("prev",
      lag("cos_sim", 1).over(org.apache.spark.sql.expressions.Window
        .partitionBy("query_id").orderBy("rank")))
      .filter($"prev".isNotNull && $"prev" < $"cos_sim").count()
    assert(badOrder == 0)
    kj.unpersist()
  }

  test("maxsim: bounded by nSub, self-score is the maximum possible") {
    val ms = VectorOps.maxSimKnn(spark, dir).cache()
    // each of the 4 sub-maxes is a cosine ≤ 1 → maxsim ≤ 4
    assert(ms.filter($"maxsim" > 4.0 + 1e-9).count() == 0)
    // MaxSim(q,q) = nSub exactly (each sub matches itself at cos 1);
    // kernel-level check
    val e = graft.sources.Tables.embeddings(spark, dir)
      .select("embedding").as[Array[Float]].head()
    assert(VectorOps.maxSimOf(e, e, 4) == 4L * 1000000000L)
    ms.unpersist()
  }

  test("token budget sample: per-lang totals respect the budget rule") {
    val s = graft.operators.TextOps.tokenBudgetSample(spark, dir).cache()
    val d = graft.sources.Tables.documents(spark, dir)
      .select($"lang", size(split($"text", " ")).cast("long").as("t"))
      .groupBy("lang").agg(sum($"t").as("tot"))
      .withColumn("budget", expr("(tot * 2) div 5"))
    val agg = s.groupBy("lang").agg(sum("n_tokens").as("got"),
      max($"cum_tokens" - $"n_tokens").as("max_before"))
      .join(d, "lang")
    // the selection fills the budget: last-taken doc started under it,
    // and dropping the largest selected doc's worth cannot still reach it
    assert(agg.filter($"max_before" >= $"budget").count() == 0)
    assert(agg.filter($"got" < $"budget").count() == 0) // boundary doc kept
    s.unpersist()
  }

  test("cross-source overlap: endpoints always straddle the parity fence") {
    val x = graft.operators.TextOps.crossSourceOverlap(spark, dir)
    val bad = x.withColumn("pa",
        substring($"source_a", 4, 10).cast("int") % 2)
      .withColumn("pb", substring($"source_b", 4, 10).cast("int") % 2)
      .filter($"pa" === $"pb").count()
    assert(bad == 0)
    // subset of the full near-dup pair list
    val all = graft.operators.TextOps.minhashNearDups(spark, dir)
      .select("ida", "idb")
    assert(x.select("ida", "idb").except(all).count() == 0)
  }

  test("retrieval: hash embedding arithmetic and serving invariants") {
    import graft.operators.Retrieval
    val md = java.security.MessageDigest.getInstance("MD5")
    // hand-check: one token lands in exactly one dim with |w| = 1, and
    // repeating it doubles the weight
    val one = Retrieval.hashEmbedOf(md, "hello")
    assert(one.map(math.abs).sum == 1)
    val two = Retrieval.hashEmbedOf(md, "hello hello")
    assert(two.map(math.abs).sum == 2 && two.indexWhere(_ != 0) ==
      one.indexWhere(_ != 0))
    // cosine of a vector with itself is exactly 1
    assert(Retrieval.cosLL(two, two) == 1.0)
    // serving: never retrieves the query's own chunks; ranks dense 1..k
    val r = graft.operators.Retrieval.retrieve(spark, dir).cache()
    assert(r.filter($"query_id" === $"doc_id").count() == 0)
    assert(r.groupBy("query_id").agg(collect_list("rank").as("rs"))
      .filter(array_sort($"rs") =!= array(lit(1), lit(2), lit(3)))
      .count() == 0)
    r.unpersist()
  }

  test("pq: ADC identity and serving invariants") {
    val pq = VectorOps.pqKnn(spark, dir).cache()
    // approximate distances are non-negative and ranks fill 1..5
    assert(pq.filter($"adist" < 0).count() == 0)
    assert(pq.groupBy("query_id").count().filter($"count" =!= 5).count() == 0)
    assert(pq.filter($"query_id" === $"neighbor_id").count() == 0)
    // within a query, adist is non-decreasing with rank
    val bad = pq.withColumn("prev",
      lag("adist", 1).over(org.apache.spark.sql.expressions.Window
        .partitionBy("query_id").orderBy("rank")))
      .filter($"prev".isNotNull && $"prev" > $"adist").count()
    assert(bad == 0)
    pq.unpersist()
    // the ADC identity: summing per-subspace distances to the code's
    // centroids equals the distance to the reconstructed (concatenated)
    // vector — checked in plain arithmetic on synthetic data
    val q = Array.tabulate(8)(i => (i + 1).toFloat)
    val c0 = Array(0.5, 1.5, 2.5, 3.5) // subspace-0 centroid
    val c1 = Array(4.0, 6.0, 8.0, 10.0) // subspace-1 centroid
    def dsq(a: Array[Double], b: Array[Double]) =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    val qs = q.map(_.toDouble)
    val adc = dsq(qs.slice(0, 4), c0) + dsq(qs.slice(4, 8), c1)
    val full = dsq(qs, c0 ++ c1)
    assert(math.abs(adc - full) < 1e-9)
  }

  test("streaming drift monitor equals the batch statistic bit-for-bit") {
    val batch = Analytics.distributionDrift(spark, dir).collect().toSeq
    val cont = graft.streaming.StreamingDrift.driftMonitor(spark, dir)
      .collect().toSeq
    assert(cont == batch)
  }

  test("ivfadc: bucket restriction can only lose candidates, never invent") {
    val full = VectorOps.pqKnn(spark, dir)
      .select($"query_id", $"rank", $"adist".as("pq_adist"))
    val pruned = VectorOps.ivfAdcKnn(spark, dir)
      .select($"query_id", $"rank", $"adist".as("ivf_adist"))
    // full-search PQ scans a superset of the probed buckets, so at
    // every rank its distance is ≤ the bucket-restricted one
    assert(full.join(pruned, Seq("query_id", "rank"))
      .filter($"pq_adist" > $"ivf_adist" + 1e-12).count() == 0)
    // serving invariants
    assert(pruned.groupBy("query_id").count()
      .filter($"count" =!= 5).count() == 0)
  }

  test("residual ivfadc: deterministic; recall and rank fidelity " +
      "at least raw-PQ's (the q177 divergence, closed)") {
    val res1 = VectorOps.ivfAdcKnnResidual(spark, dir).collect().toSeq
    val res2 = VectorOps.ivfAdcKnnResidual(spark, dir).collect().toSeq
    // double-precision residual training is still deterministic
    assert(res1 == res2)
    // serving invariants: full rank lists, never self
    val byQ = res1.groupBy(_.getLong(0))
    assert(byQ.nonEmpty && byQ.values.forall(_.size == 5))
    assert(res1.forall(r => r.getLong(0) != r.getLong(2)))
    // exact L2 ground truth, driver-side (sf0.001 is tiny)
    val vecs = graft.sources.Tables.embeddings(spark, dir)
      .select($"vec_id", $"embedding").as[(Long, Array[Float])].collect()
    def l2(a: Array[Float], b: Array[Float]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { val d = a(i) - b(i); s += d * d; i += 1 }
      s
    }
    val exactOrder: Map[Long, Seq[Long]] = vecs.filter(_._1 < 10)
      .map { case (qid, qv) =>
        qid -> vecs.filter(_._1 != qid)
          .map { case (id, v) => (id, l2(qv, v)) }
          .sortBy { case (id, d) => (d, id) }.map(_._1).toSeq
      }.toMap
    def recallAt5(rows: Seq[org.apache.spark.sql.Row]): Double = {
      val g = rows.groupBy(_.getLong(0))
      g.map { case (q, rs) =>
        rs.map(_.getLong(2)).toSet
          .intersect(exactOrder(q).take(5).toSet).size
      }.sum.toDouble / (g.size * 5)
    }
    // mean exact-rank of the returned neighbors: how deep in the TRUE
    // ordering the served list reaches (lower = higher rank fidelity)
    def meanExactRank(rows: Seq[org.apache.spark.sql.Row]): Double = {
      val rs = rows.map(r =>
        exactOrder(r.getLong(0)).indexOf(r.getLong(2)).toDouble)
      rs.sum / rs.size
    }
    val raw = VectorOps.ivfAdcKnn(spark, dir).collect().toSeq
    val (rRes, rRaw) = (recallAt5(res1), recallAt5(raw))
    assert(rRes >= rRaw,
      s"residual recall@5 $rRes must be >= raw-PQ's $rRaw")
    val (dRes, dRaw) = (meanExactRank(res1), meanExactRank(raw))
    assert(dRes <= dRaw,
      s"residual mean exact-rank $dRes must be <= raw-PQ's $dRaw")
  }

  test("unigram lm: rare-token soup scores worse than common text") {
    val s = graft.operators.TextOps.unigramLmScore(spark, dir).cache()
    // NLL is positive (probabilities < 1) and finite everywhere
    assert(s.filter($"nll_nats" <= 0 || $"nll_nats".isNull).count() == 0)
    // documents made of the corpus's most common tokens must score
    // better (lower NLL) than the worst rare-token documents
    val best = s.agg(min("nll_nats")).as[Double].head()
    val worst = s.agg(max("nll_nats")).as[Double].head()
    assert(worst > best)
    // keep flag is consistent with the published cut
    assert(s.filter(($"nll_nats" <= 8.0) =!= $"keep").count() == 0)
    s.unpersist()
  }

  test("label outliers: z-scores center and flag consistently") {
    val o = VectorOps.labelOutliers(spark, dir).cache()
    // per label, z-scores sum to ~0 (they are centered by construction;
    // rounding to 6 decimals leaves sub-row noise)
    val off = o.groupBy("label").agg(sum("z").as("sz"), count(lit(1)).as("n"))
      .filter(abs($"sz") > $"n" * 0.001).count()
    assert(off == 0)
    // the flag matches the published threshold, and outliers are rare
    assert(o.filter(($"z" > 2.0) =!= $"is_outlier").count() == 0)
    val frac = o.filter($"is_outlier").count().toDouble / o.count()
    assert(frac < 0.2, s"outlier fraction $frac implausibly high")
    o.unpersist()
  }

  test("data card: entropy bounds and dup-rate consistency") {
    val card = graft.operators.TextOps.sourceDataCard(spark, dir).cache()
    // language-mix entropy bounded by ln(5) (five languages exist)
    assert(card.filter($"lang_entropy" < 0
      || $"lang_entropy" > math.log(5.0) + 1e-6).count() == 0)
    // TTR is a fraction; dup_rate a fraction
    assert(card.filter($"mean_ttr" <= 0 || $"mean_ttr" > 1.0).count() == 0)
    assert(card.filter($"dup_rate" < 0 || $"dup_rate" > 1.0).count() == 0)
    // dup docs across sources reconcile with the pair graph
    val nDup = graft.operators.TextOps.minhashNearDups(spark, dir)
      .select(explode(array($"ida", $"idb")).as("doc_id"))
      .distinct().count()
    val fromCard = card.select(($"dup_rate" * $"n_docs").as("d"))
      .agg(sum("d")).as[Double].head()
    assert(math.abs(fromCard - nDup) < 1e-6)
    card.unpersist()
  }

  test("novelty: a duplicated doc has zero novelty") {
    import graft.operators.TextOps
    val out = TextOps.ngramNovelty(spark, dir).cache()
    // every near-dup pair at jaccard 1.0 (exact dup) shares all
    // shingles → both sides' unique fraction is 0 for shared grams;
    // structural bounds instead: novelty ∈ [0, 1]
    assert(out.filter($"novelty" < 0 || $"novelty" > 1).count() == 0)
    out.unpersist()
    // hand corpus: doc 1 and 2 identical → novelty 0; doc 0 disjoint → 1
    import spark.implicits._
    val local = s"${System.getProperty("java.io.tmpdir")}/graft_nov_${ProcessHandle.current().pid()}"
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(local))
    Seq(
      (0L, "alpha beta gamma delta", "en", "web", 22L),
      (1L, "one two three four five", "en", "web", 23L),
      (2L, "one two three four five", "en", "web", 23L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$local/documents.parquet")
    val hand = TextOps.ngramNovelty(spark, local)
      .select("doc_id", "novelty").as[(Long, Double)].collect().toMap
    assert(hand(0L) == 1.0 && hand(1L) == 0.0 && hand(2L) == 0.0)
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(local))
  }

  test("psi drift: hand-planted shift is detected, identical halves are zero") {
    // identical distributions → every contribution rounds to 0
    val d = Analytics.distributionDrift(spark, dir)
    // structural: psi equals the sum of its own contributions per type
    val bad = d.groupBy("event_type", "psi")
      .agg(sum(floor($"contrib" * 1e9 + 0.5)).as("s"))
      .filter(abs($"psi" * 1e9 - $"s") > 1).count()
    assert(bad == 0)
    // PSI is non-negative by construction (p−q and ln(p/q) share sign)
    assert(d.filter($"contrib" < 0).count() == 0)
  }
}
