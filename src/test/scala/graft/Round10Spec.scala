package graft

import org.apache.spark.sql.functions._

import graft.operators.{Analytics, Features, Graphs, VectorOps}
import graft.sources.Tables

/** Round-10 operators (q202–q205): semantics pinned beyond the hash
  * gate — fold-complement arithmetic of the OOF target encoding, the
  * kNN label-noise verdict's internal consistency, triangle counts
  * against an independent naive pass, and the purged split's embargo
  * gap.
  */
class Round10Spec extends SparkSpec {
  import spark.implicits._

  val dir = sf("sf0.001")

  test("q202: fold complements and smoothing bounds") {
    val enc = Features.targetEncodeOof(spark, dir).cache()
    assert(enc.count() == 25) // 5 segments × 5 folds, all populated
    // Σ_f oof_n(c, f) = (K−1) · N_c  — every fold excluded exactly once
    val n = Tables.orders(spark, dir)
      .join(Tables.customer(spark, dir),
        $"o_custkey" === $"c_custkey")
      .groupBy($"c_mktsegment".as("segment"))
      .agg(count(lit(1)).as("total"))
    val sums = enc.groupBy("segment").agg(sum("oof_n").as("s"))
      .join(n, "segment")
      .filter($"s" =!= $"total" * 4)
    assert(sums.count() == 0)
    // smoothing pulls enc strictly between oof_mean and the prior side:
    // enc is a convex combination, so it can never escape the hull of
    // all oof_means and priors — cheap sanity: min/max of enc within
    // [min(oof_mean), max(oof_mean)] widened by the global mean
    val (lo, hi) = enc.agg(min("oof_mean"), max("oof_mean"))
      .as[(Double, Double)].head()
    assert(enc.filter($"enc" < lo - 1e-6 || $"enc" > hi + 1e-6)
      .count() == 0)
    enc.unpersist()
  }

  test("q203: verdict internal consistency") {
    val r = VectorOps.labelNoiseKnn(spark, dir).cache()
    assert(r.filter($"n_disagree" < 0 || $"n_disagree" > 10).count() == 0)
    // unanimous agreement forces the majority label to be the own label
    assert(r.filter($"n_disagree" === 0 &&
      $"majority_label" =!= $"label").count() == 0)
    // unanimous disagreement forces a foreign majority
    assert(r.filter($"n_disagree" === 10 &&
      $"majority_label" === $"label").count() == 0)
    // suspect ⟺ strict majority foreign
    assert(r.filter(($"n_disagree" * 2 > 10) =!= $"suspect").count() == 0)
    r.unpersist()
  }

  test("q204: oriented count ≡ naive three-way join; cc bounds") {
    val all = Graphs.triangleStatsAll(spark, dir).cache()
    assert(all.filter($"local_cc" < 0.0 || $"local_cc" > 1.0).count() == 0)
    // per-vertex counts sum to 3 × (naive id-ordered triangle count)
    val baskets = Tables.lineitem(spark, dir)
      .select($"l_orderkey".as("ok"), $"l_partkey".as("pk")).distinct()
    val e = baskets.as("a").join(baskets.as("b"),
        $"a.ok" === $"b.ok" && $"a.pk" < $"b.pk")
      .select($"a.pk".as("u"), $"b.pk".as("v")).distinct().cache()
    val naive = e.as("e1")
      .join(e.as("e2"), $"e2.u" === $"e1.v")
      .join(e.as("e3"), $"e3.u" === $"e1.u" && $"e3.v" === $"e2.v")
      .count()
    val got = all.agg(sum("n_triangles")).as[Long].head()
    assert(got == 3 * naive, s"sum=$got naive=$naive")
    e.unpersist(); all.unpersist()
  }

  test("q207: apply-pass accounting and compression direction") {
    val a = graft.operators.BpeTrain.bpeApply(spark, dir).cache()
    // each word costs at least one piece and at most its chars
    assert(a.filter($"n_pieces" > $"n_chars").count() == 0)
    assert(a.filter($"n_pieces" < $"n_words").count() == 0)
    assert(a.filter($"chars_per_piece" < 1.0).count() == 0)
    // word accounting reconciles with the raw corpus
    val words = Tables.documents(spark, dir)
      .select(explode(split($"text", " ")).as("w"))
      .filter($"w" =!= "").count()
    assert(a.agg(sum("n_words")).as[Long].head() == words)
    // zero merges ⟹ every piece is a single char ⟹ ratio exactly 1;
    // 8 merges must strictly compress somewhere
    val a0 = graft.operators.BpeTrain.bpeApply(spark, dir, iters = 0)
    assert(a0.filter($"chars_per_piece" =!= 1.0).count() == 0)
    assert(a.filter($"chars_per_piece" > 1.0).count() > 0)
    a.unpersist()
  }

  test("q208: k-anonymity accounting") {
    val r = Features.kAnonymity(spark, dir)
      .as[(Long, Long, Long, Long, Long, Double, Double)].head()
    val (nRows, nGroups, k, rowsBelow, groupsBelow, rate, avg) = r
    assert(nRows == Tables.customer(spark, dir).count())
    assert(k >= 1 && nGroups >= 1 && groupsBelow <= nGroups)
    assert(rowsBelow <= nRows && rate >= 0.0 && rate <= 1.0)
    assert(avg >= 1.0)
    // rows in sub-k groups are at most (k−1) · groupsBelow
    assert(rowsBelow <= 4 * groupsBelow)
  }

  test("q210: effective mass bounded by raw; singleton sources unscaled") {
    val r = graft.operators.TextOps.dedupWeights(spark, dir).cache()
    assert(r.agg(sum("n_docs")).as[Long].head() ==
      Tables.documents(spark, dir).count())
    assert(r.filter($"effective_tokens" > $"raw_tokens" + 1e-6).count() == 0)
    assert(r.filter($"inflation" < 1.0 - 1e-9).count() == 0)
    // a source with no dup member keeps its full mass (up to the
    // micro-floor, one millionth per doc)
    val clean = r.filter($"n_dup_docs" === 0)
    assert(clean.filter(
      $"raw_tokens" - $"effective_tokens" > $"n_docs" * 1e-6 + 1e-9)
      .count() == 0)
    r.unpersist()
  }

  test("q211: bigram scores positive; dup docs score identically") {
    val r = graft.operators.TextOps.bigramLmScore(spark, dir).cache()
    assert(r.filter($"nll_nats" <= 0.0).count() == 0)
    assert(r.filter(($"nll_nats" <= 7.0) =!= $"keep").count() == 0)
    // exact-duplicate texts must land on the identical score
    val dup = Tables.documents(spark, dir).filter($"doc_id" < 100)
      .groupBy("text").agg(collect_list("doc_id").as("ids"))
      .filter(size($"ids") > 1)
      .select(explode($"ids").as("doc_id"), md5($"text").as("h"))
    val per = dup.join(r, "doc_id")
      .groupBy("h").agg(countDistinct("nll_nats").as("nv"))
    assert(per.filter($"nv" =!= 1).count() == 0)
    r.unpersist()
  }

  test("q212: drained streaming monitor ≡ batch containment join") {
    val streamed = graft.streaming.StreamingDecontam
      .containmentStream(spark, dir)
      .as[(Long, Long, Double)].collect().toSet
    val batch = graft.operators.PrefixJoin.containmentJoin(spark, dir)
      .as[(Long, Long, Double)].collect().toSet
    assert(streamed == batch)
    // the landing really was sliced: the monitor processed >1 batch
    val land = graft.streaming.FixtureStaging.stageOnce("decon-split",
      sf("sf0.001") + "/documents.parquet", "/tmp/graft-decon")(_ => ())
    val n = new java.io.File(land).listFiles()
      .count(_.getName.endsWith(".parquet"))
    assert(n == 4, s"staged $n slices")
  }

  test("q213: stages partition the corpus; difficulty is monotone") {
    val r = graft.operators.TextOps.curriculumStages(spark, dir).cache()
    val total = Tables.documents(spark, dir).count()
    assert(r.agg(sum("n_docs")).as[Long].head() == total)
    // NTILE balance: stage sizes differ by at most one
    val sizes = r.groupBy("stage").agg(sum("n_docs").as("n"))
      .as[(Int, Long)].collect().toMap
    assert(sizes.size == 4)
    assert(sizes.values.max - sizes.values.min <= 1, sizes.toString)
    // later stages are harder: per-stage weighted mean NLL non-decreasing
    val means = r.select($"stage", $"mean_nll" * $"n_docs", $"n_docs")
      .toDF("stage", "w", "n").groupBy("stage")
      .agg((sum("w") / sum("n")).as("m"))
      .as[(Int, Double)].collect().sortBy(_._1).map(_._2)
    assert(means.sliding(2).forall { case Array(a, b) => b >= a - 1e-9 },
      means.mkString(","))
    r.unpersist()
  }

  test("q214: matrix accounts for every near-dup pair, normalized") {
    val m = graft.operators.TextOps.crossSourceDups(spark, dir).cache()
    val total = graft.operators.TextOps.minhashNearDups(spark, dir).count()
    assert(m.agg(sum("n_pairs")).as[Long].head() == total)
    assert(m.filter($"source_a" > $"source_b").count() == 0)
    m.unpersist()
  }

  test("q215: train-vs-train KL is exactly zero; others non-negative") {
    val r = graft.operators.TextOps.splitDivergence(spark, dir).cache()
    assert(r.filter($"split" === "train" && $"kl_vs_train" =!= 0.0)
      .count() == 0)
    // KL ≥ 0 mathematically; the nano-rounding of each term can leave
    // at most vocab · 5e-10 of drift
    assert(r.filter($"kl_vs_train" < -1e-5).count() == 0)
    assert(r.agg(sum("n_docs")).as[Long].head() ==
      Tables.documents(spark, dir).count())
    r.unpersist()
  }

  test("q216: no near-dup pair crosses a split boundary") {
    val m = graft.operators.Graphs.splitIntegrity(spark, dir).cache()
    assert(m.filter($"split_a" =!= $"split_b").count() == 0)
    assert(m.agg(sum("n_pairs")).as[Long].head() ==
      graft.operators.TextOps.minhashNearDups(spark, dir).count())
    m.unpersist()
  }

  test("q217: triplets — valid positives, rejected negatives, determinism") {
    val t = graft.operators.Analytics.tripletMining(spark, dir).cache()
    // rebuild the positive pair set independently
    val ob = Tables.lineitem(spark, dir)
      .select($"l_orderkey".as("ok"), $"l_partkey".as("pk")).distinct()
    val co = ob.as("a").join(ob.as("b"),
        $"a.ok" === $"b.ok" && $"a.pk" =!= $"b.pk")
      .groupBy($"a.pk".as("a"), $"b.pk".as("b"))
      .agg(count(lit(1)).as("s")).filter($"s" >= 2).cache()
    // the chosen positive has the anchor's max support
    val mx = co.groupBy("a").agg(max("s").as("mx"))
    assert(t.join(mx, $"anchor_id" === $"a")
      .filter($"support" =!= $"mx").count() == 0)
    // the negative is never a positive partner and never the anchor
    assert(t.join(co,
      $"anchor_id" === $"a" && $"neg_id" === $"b", "left_semi")
      .count() == 0)
    assert(t.filter($"neg_id" === $"anchor_id").count() == 0)
    // one triplet per anchor; rerun is bit-identical
    assert(t.groupBy("anchor_id").count().filter($"count" > 1)
      .count() == 0)
    val again = graft.operators.Analytics.tripletMining(spark, dir)
    assert(t.exceptAll(again).count() == 0 &&
      again.exceptAll(t).count() == 0)
    co.unpersist(); t.unpersist()
  }

  test("q218: kept is a budget-bounded prefix of the MMR order") {
    val r = graft.operators.Retrieval.ragContext(spark, dir).cache()
    // cum is the running sum in pick order
    val bad = r.groupBy("query_id")
      .agg(sum("n_tokens").as("s"), max("cum_tokens").as("mx"))
      .filter($"s" =!= $"mx")
    assert(bad.count() == 0)
    // kept ⟺ cum ≤ 120, and it forms a prefix (no kept after a drop)
    assert(r.filter(($"cum_tokens" <= 120) =!= $"kept").count() == 0)
    val perQ = r.select($"query_id", $"pick_no", $"kept")
      .as[(Long, Int, Boolean)].collect().groupBy(_._1)
    perQ.values.foreach { rows =>
      val ks = rows.sortBy(_._2).map(_._3)
      assert(!ks.zip(ks.drop(1)).exists { case (a, b) => !a && b },
        rows.toSeq.toString)
    }
    // docs are ≤100 tokens, so the first pick always fits a 120 budget
    assert(r.filter($"pick_no" === 1 && !$"kept").count() == 0)
    r.unpersist()
  }

  test("q219: coreset members are their cluster's nearest, ranks tight") {
    val r = graft.operators.VectorOps.coresetSelect(spark, dir).cache()
    // per cluster: ranks 1..min(per, size), distance non-decreasing
    val perC = r.as[(Long, Int, Long, Double)].collect()
      .groupBy(_._1).values
    perC.foreach { rows =>
      val s = rows.sortBy(_._2)
      assert(s.map(_._2).toSeq == (1 to s.length).toSeq)
      assert(s.sliding(2).forall {
        case Array(a, b) => b._4 >= a._4; case _ => true
      })
    }
    // every selected member really belongs to at most distance of the
    // full assignment's per-cluster 5th smallest: cross-check against
    // the q76 assignment
    val asg = graft.operators.VectorOps.kmeansQuantize(spark, dir)
      .select($"cid", $"vec_id", $"dist2")
    val fifth = asg.withColumn("rn",
        row_number().over(org.apache.spark.sql.expressions.Window
          .partitionBy("cid").orderBy(asc("dist2"), asc("vec_id"))))
      .filter($"rn" <= 5)
      .groupBy("cid").agg(max("dist2").as("mx"), count(lit(1)).as("n"))
    val joined = r.groupBy("cid")
      .agg(max("dist2").as("sel_mx"), count(lit(1)).as("sel_n"))
      .join(fifth, "cid")
    assert(joined.filter($"sel_n" =!= $"n").count() == 0)
    assert(joined.filter($"sel_mx" > $"mx" + 1e-6).count() == 0)
    r.unpersist()
  }

  test("q220: cv math reconciles; a planted metronome user flags") {
    val r = graft.operators.Events.botScore(spark, dir).cache()
    // every user with >= 3 events appears exactly once
    val users = Tables.events(spark, dir).groupBy("user_id")
      .agg(count(lit(1)).as("n")).filter($"n" >= 3).count()
    assert(r.count() == users)
    assert(r.filter($"gap_cv" < 0.0).count() == 0)
    assert(r.filter(($"gap_cv" < 0.85) =!= $"suspicious").count() == 0)
    // hand check one user: recompute cv from raw gaps
    val uid = r.select("user_id").as[Long].head()
    val gaps = Tables.events(spark, dir)
      .filter($"user_id" === uid)
      .orderBy("ts", "event_id")
      .select(unix_micros($"ts")).as[Long].collect()
      .sliding(2).map { case Array(a, b) => (b - a) / 1000000L }.toSeq
    val n = gaps.length.toDouble
    val s1 = gaps.sum.toDouble
    val s2 = gaps.map(g => g * g).sum.toDouble
    val want = math.sqrt(n * s2 - s1 * s1) / s1
    val got = r.filter($"user_id" === uid).select("gap_cv")
      .as[Double].head()
    assert(math.abs(got - want) < 1e-5, s"$got vs $want")
    r.unpersist()
  }

  test("q221: WOE signs track bin composition; IV non-negative") {
    val r = graft.operators.Features.woeIv(spark, dir).cache()
    // IV = Σ (p−q)·ln(p/q) ≥ 0 term-wise (up to micro-rounding)
    assert(r.filter($"iv" < -1e-5).count() == 0)
    // bins account for every lineitem row, per feature
    val total = Tables.lineitem(spark, dir).count()
    val perF = r.groupBy("feature").agg(sum("n").as("s"))
      .filter($"s" =!= total)
    assert(perF.count() == 0)
    // WOE > 0 ⟺ the bin is good-heavier than the population
    val (g, b) = Tables.lineitem(spark, dir).agg(
      sum(when($"l_returnflag" === "R", 0L).otherwise(1L)),
      sum(when($"l_returnflag" === "R", 1L).otherwise(0L)))
      .as[(Long, Long)].head()
    val bad = r.filter(
      ($"woe" > 1e-6) =!=
        (($"n" - $"n_bad") * b > $"n_bad" * g))
      .filter($"woe" =!= 0.0)
    assert(bad.count() == 0)
    r.unpersist()
  }

  test("q222: MI non-negative, bounded by the smaller marginal entropy") {
    val r = graft.operators.Features.mutualInfo(spark, dir).cache()
    assert(r.count() == 3)
    assert(r.filter($"mi_nats" < -1e-5).count() == 0)
    // MI(X;Y) ≤ min(H(X), H(Y)) ≤ ln(min cardinality); all features
    // here have ≤ 5 categories
    assert(r.filter($"mi_nats" > math.log(5.0) + 1e-6).count() == 0)
    r.unpersist()
  }

  test("q223: Benford shares and chi2 reconcile") {
    val r = graft.operators.Features.benfordAudit(spark, dir).cache()
    val n = Tables.orders(spark, dir).count()
    assert(r.agg(sum("n_obs")).as[Long].head() == n)
    // expected shares are the true Benford constants and sum to 1
    assert(math.abs(graft.operators.Features.BenfordP.sum - 1.0) < 1e-12)
    assert(r.filter($"benford_p" <= 0.0 || $"benford_p" >= 0.31)
      .count() == 0)
    assert(r.filter($"chi2_part" < 0.0).count() == 0)
    // observed shares sum to ~1 (val6 rounding only)
    val s = r.agg(sum("obs_share")).as[Double].head()
    assert(math.abs(s - 1.0) < 1e-4, s.toString)
    r.unpersist()
  }

  test("q224: bootstrap SE ~ CLT prediction; determinism") {
    val r = graft.operators.Analytics.bootstrapSe(spark, dir)
      .as[(Long, Long, Double, Double)].head()
    val (n, reps, mean, se) = r
    assert(reps == 32 && mean > 0 && se > 0)
    // CLT: SE(mean) ≈ sd/√n — bootstrap must land within 3× either way
    val stats = Tables.orders(spark, dir)
      .agg(stddev_pop($"o_totalprice"), count(lit(1)))
      .as[(Double, Long)].head()
    val clt = stats._1 / math.sqrt(stats._2.toDouble)
    assert(se > clt / 3 && se < clt * 3, s"se=$se clt=$clt")
    // pure function of the data: a rerun is bit-identical
    val again = graft.operators.Analytics.bootstrapSe(spark, dir)
      .as[(Long, Long, Double, Double)].head()
    assert(again == r)
  }

  test("q225: Chapman estimate brackets the known catalog") {
    val r = graft.operators.Analytics.captureRecapture(spark, dir)
      .as[(Long, Long, Long, Double, Long, Double)].head()
    val (n1, n2, m, est, truth, ratio) = r
    assert(m <= math.min(n1, n2))
    // the estimator can't fall below what was directly observed
    assert(est >= math.max(n1, n2) - 1e-6)
    // with dense TPC-H coverage it should land within 2× of truth
    assert(ratio > 0.5 && ratio < 2.0, s"ratio $ratio")
  }

  test("q226: Good–Turing identities") {
    val r = graft.operators.TextOps.unseenMass(spark, dir)
      .as[(Long, Long, Long, Long, Double, Double)].head()
    val (nTok, nTyp, hapax, dbl, mass, share) = r
    assert(hapax + dbl <= nTyp && nTyp <= nTok)
    assert(mass >= 0.0 && mass <= 1.0 && share >= 0.0 && share <= 1.0)
    // hand-recompute hapax from the corpus
    val h = Tables.documents(spark, dir)
      .select(explode(split($"text", " ")).as("t")).filter($"t" =!= "")
      .groupBy("t").count().filter($"count" === 1).count()
    assert(h == hapax)
  }

  test("q227: decomposition identities and anomaly calibration") {
    val r = graft.operators.Analytics.seasonalDecompose(spark, dir)
      .cache()
    // trend + seasonal + residual reassembles revenue (val6 rounding)
    val bad = r.filter(
      abs($"revenue" - ($"trend" + $"seasonal" + $"residual")) > 1e-3)
    assert(bad.count() == 0)
    // weekday seasonal components are mean-zero-ish by construction:
    // each is a mean of detrended values; their day-weighted sum is
    // the sum of all detrended values — small next to revenue scale
    val n = r.count()
    // 2σ flags a small minority under any unimodal residual dist
    val flagged = r.filter($"is_anomaly").count()
    assert(flagged < n / 4, s"$flagged of $n flagged")
    r.unpersist()
  }

  test("q228: overlap matrix — diagonal complete, cross cells bounded") {
    val r = graft.operators.TextOps.sourceOverlap(spark, dir).cache()
    val nSources = Tables.documents(spark, dir)
      .select("source").distinct().count()
    assert(r.filter($"source_a" === $"source_b").count() == nSources)
    assert(r.filter($"source_a" === $"source_b" && $"jaccard" =!= 1.0)
      .count() == 0)
    val cross = r.filter($"source_a" < $"source_b")
    assert(cross.filter($"n_shared" < 1).count() == 0) // cross rows only when shared
    assert(cross.filter(
      $"n_shared" > least($"na", $"nb")).count() == 0)
    assert(cross.filter($"jaccard" <= 0.0 || $"jaccard" > 1.0)
      .count() == 0)
    r.unpersist()
  }

  test("q229: quotas exact, tail upsampled, kept counts match") {
    val r = graft.operators.VectorOps.clusterBalancedSample(spark, dir)
      .cache()
    // exactly n_target kept per cluster (quota ≤ size by construction)
    val perC = r.groupBy("cid").agg(
      sum(when($"keep", 1L).otherwise(0L)).as("kept"),
      max("n_target").as("tgt"), max("cluster_size").as("sz"))
    assert(perC.filter($"kept" =!= $"tgt").count() == 0)
    assert(perC.filter($"tgt" > $"sz").count() == 0)
    // √-weighting: keep RATE decreases with cluster size (head
    // flattened, tail upsampled) — compare the largest vs smallest
    val rates = perC
      .select($"sz", $"tgt".cast("double") / $"sz".cast("double"))
      .as[(Long, Double)].collect().sortBy(_._1)
    if (rates.length >= 2 && rates.head._1 < rates.last._1)
      assert(rates.head._2 >= rates.last._2 - 1e-9,
        rates.mkString(","))
    r.unpersist()
  }

  test("q230: PK-FK joins estimate exactly; formula reconciles") {
    val r = graft.operators.Analytics.cardinalityAudit(spark, dir)
      .as[(String, Long, Long, Long, Long, Long, Double)]
      .collect().map(t => t._1 -> t).toMap
    // under a foreign-key join with full containment, the formula is
    // EXACT: |A ⋈ B| = |A| when B is the PK side and every key matches
    for ((_, (_, nl, nr, ndv, est, actual, ratio)) <- r) {
      assert(est == math.floor(nl.toDouble * nr / ndv + 0.5).toLong)
      assert(actual > 0 && ratio > 0.0)
    }
    // lineitem~orders: every lineitem has an order → actual = |lineitem|
    val lo = r("lineitem~orders")
    assert(lo._6 == Tables.lineitem(spark, dir).count())
    assert(math.abs(lo._7 - 1.0) < 0.05, lo.toString)
  }

  test("q205: splits partition orders; embargo gap holds") {
    val s = Features.purgedTemporalSplit(spark, dir).cache()
    val total = Tables.orders(spark, dir).count()
    assert(s.agg(sum("n_orders")).as[Long].head() == total)
    val m = s.select($"split", $"d_from", $"d_to")
      .as[(String, java.sql.Date, java.sql.Date)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    for {
      (a, b) <- Seq("1_train" -> "2_val", "2_val" -> "3_test")
      if m.contains(a) && m.contains(b)
    } {
      val gapDays = (m(b)._1.toLocalDate.toEpochDay
        - m(a)._2.toLocalDate.toEpochDay)
      val want = if (a == "1_train" || a == "2_val") 8 else 1
      assert(gapDays >= want, s"$a→$b gap $gapDays")
    }
    s.unpersist()
  }

  test("fixture baskets fit under MaxBasketWidth — the cap never binds, " +
      "so the capped collect_set matches the oracle's uncapped DISTINCT") {
    // q204/q217/q243/q249/q256/q279/q288 slice baskets to
    // Analytics.MaxBasketWidth while their oracles pair the uncapped
    // DISTINCT set; on TPC-H shapes the cap never binds (≤7
    // lineitems/order). If a future fixture violates this, the gates
    // would silently diverge — fail loudly here instead. Guard EVERY
    // gated fixture (incl. sf0.1) plus the ScaleGen 10× probe fixture
    // when it exists — the probe replicates per-order shape, but the
    // guard is what proves that, not the construction comment.
    val scaleDir = s"${System.getProperty("java.io.tmpdir")}/graft_sf1"
    val dirs = Seq(sf("sf0.001"), sf("sf0.01"), sf("sf0.1")) ++
      (if (new java.io.File(s"$scaleDir/lineitem.parquet").exists())
         Seq(scaleDir) else Nil)
    for (d <- dirs) {
      val maxWidth = Tables.lineitem(spark, d)
        .groupBy("l_orderkey")
        .agg(countDistinct("l_partkey").as("w"))
        .agg(max("w")).as[Long].head()
      assert(maxWidth <= Analytics.MaxBasketWidth,
        s"$d: max distinct parts/order $maxWidth exceeds the " +
          s"MaxBasketWidth=${Analytics.MaxBasketWidth} slice — the " +
          "q204/q217 oracles no longer match the capped Spark side")
    }
  }
}
