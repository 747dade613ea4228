package graft

import org.apache.spark.sql.functions._

import graft.operators.{Analytics, Events, TextOps, VectorOps}

/** Round-8 additions, second batch: IVFADC exact re-rank (q293),
  * greedy k-center (q294), HITS (q295), Holt forecast (q296), MAD
  * outliers (q297), tokenizer fertility (q298), Markov absorption
  * (q299). Each invariant here is INDEPENDENT of the oracle gate —
  * driver-side replays with different arithmetic paths, cross-query
  * consistency, and structural bounds.
  */
class Round12Spec extends SparkSpec {
  import spark.implicits._

  private val dir = sf("sf0.001")

  // ---- q293 IVFADC exact re-rank ----------------------------------

  test("q293: re-ranked cosines are the exact brute-force values and " +
      "recall@5 is >= plain ADC's") {
    val e = graft.sources.Tables.embeddings(spark, dir)
      .select($"vec_id", $"embedding").as[(Long, Array[Float])]
      .collect().toMap
    def bruteTop5(qi: Long): Seq[Long] =
      e.toSeq.filter(_._1 != qi)
        .map { case (ni, v) => (ni, VectorOps.cosOf(e(qi), v)) }
        .sortBy { case (ni, c) => (-c, ni) }.take(5).map(_._1)
    val truth = (0L until 10L).map(q => q -> bruteTop5(q).toSet).toMap

    val rr = VectorOps.ivfAdcRerank(spark, dir)
      .select($"query_id", $"rank", $"neighbor_id", $"cos_sim")
      .as[(Long, Int, Long, Double)].collect()
    def val6Of(x: Double): Double =
      math.floor(x * 1000000.0 + 0.5).toLong.toDouble / 1000000.0
    rr.foreach { case (qi, _, ni, cs) =>
      val exact = val6Of(VectorOps.cosOf(e(qi), e(ni)))
      assert(cs == exact, s"q$qi n$ni cos $cs != exact $exact")
    }
    val rrRecall = rr.count { case (qi, _, ni, _) => truth(qi)(ni) }
    val adc = VectorOps.ivfAdcKnn(spark, dir)
      .select($"query_id", $"neighbor_id").as[(Long, Long)].collect()
    val adcRecall = adc.count { case (qi, ni) => truth(qi)(ni) }
    assert(rrRecall >= adcRecall,
      s"re-rank recall $rrRecall < ADC recall $adcRecall")
    assert(rr.nonEmpty)
  }

  // ---- q294 greedy k-center ---------------------------------------

  test("q294: selection and assignment match a driver-side replay") {
    val e = graft.sources.Tables.embeddings(spark, dir)
      .select($"vec_id", $"embedding").as[(Long, Array[Float])]
      .collect().sortBy(_._1)
    def d6(a: Array[Float], b: Array[Float]): Long =
      math.floor((1.0 - VectorOps.cosOf(a, b)) * 1000000.0 + 0.5).toLong
    var sel = Vector(e.find(_._1 == 0L).get)
    for (_ <- 1 until 8) {
      val selIds = sel.map(_._1).toSet
      val next = e.filter(p => !selIds(p._1))
        .map { case (id, v) => (id, sel.map(c => d6(v, c._2)).min) }
        .maxBy { case (id, dm) => (dm, -id) }
      sel :+= e.find(_._1 == next._1).get
    }
    val expected = e.map { case (id, v) =>
      val best = sel.zipWithIndex
        .map { case ((cid, cv), pick) => (d6(v, cv), pick, cid) }.min
      id -> ((best._3, best._2, best._1))
    }.toMap
    val got = VectorOps.kcenterSelect(spark, dir)
      .select($"vec_id", $"center_id", $"pick_no", $"dist")
      .as[(Long, Long, Int, Double)].collect()
    assert(got.length == e.length)
    got.foreach { case (id, cid, pick, dist) =>
      val (ecid, epick, ed6) = expected(id)
      assert(cid == ecid && pick == epick, s"vec $id: ($cid,$pick) " +
        s"!= ($ecid,$epick)")
      assert(dist == ed6.toDouble / 1000000.0, s"vec $id dist")
    }
  }

  // ---- q295 HITS --------------------------------------------------

  test("q295: scores are micro-bounded, each side's max is exactly " +
      "10^6, and a driver-side replay agrees") {
    val rows = Analytics.brandHits(spark, dir)
      .select($"brand", $"hub_i", $"auth_i")
      .as[(String, Long, Long)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (b, h, a) =>
      assert(h >= 0 && h <= 1000000L, s"$b hub $h")
      assert(a >= 0 && a <= 1000000L, s"$b auth $a")
    }
    assert(rows.map(_._2).max == 1000000L)
    assert(rows.map(_._3).max == 1000000L)

    // driver replay from the q280-grain transition counts
    val tr = Analytics.brandTransitions(spark, dir, topK = Int.MaxValue)
      .select($"from_brand", $"to_brand", $"n")
      .as[(String, String, Long)].collect()
    val outN = tr.groupBy(_._1).map { case (s, es) => s -> es.map(_._3).sum }
    val p6 = tr.map { case (s, d, n) => (s, d, n * 1000000L / outN(s)) }
    val nodes = (p6.map(_._1) ++ p6.map(_._2)).distinct.sorted
    var h = nodes.map(_ -> 1000000L).toMap
    var a = nodes.map(_ -> 0L).toMap
    for (_ <- 1 to 2) {
      val araw = nodes.map(d =>
        d -> p6.filter(_._2 == d).map(e => e._3 * h(e._1) / 1000000L).sum)
        .toMap
      val amx = araw.values.max
      a = nodes.map(d => d -> araw(d) * 1000000L / amx).toMap
      val hraw = nodes.map(s =>
        s -> p6.filter(_._1 == s).map(e => e._3 * a(e._2) / 1000000L).sum)
        .toMap
      val hmx = hraw.values.max
      h = nodes.map(s => s -> hraw(s) * 1000000L / hmx).toMap
    }
    rows.foreach { case (b, hi, ai) =>
      assert(hi == h(b), s"$b hub $hi != replay ${h(b)}")
      assert(ai == a(b), s"$b auth $ai != replay ${a(b)}")
    }
  }

  // ---- q296 Holt forecast -----------------------------------------

  test("q296: the integer recurrence equals a driver-side dyadic " +
      "double replay (alpha = beta = 1/2 is exact in both)") {
    val daily = graft.sources.Tables.events(spark, dir)
      .groupBy($"event_type", to_date($"ts").as("day"))
      .agg(sum(graft.util.Portable.cents2($"value")).as("cents"))
      .select($"event_type", $"day".cast("string"), $"cents")
      .as[(String, String, Long)].collect()
      .groupBy(_._1).map { case (t, rs) =>
        t -> rs.sortBy(_._2).map(r => (r._2, r._3))
      }
    val got = Analytics.holtForecast(spark, dir)
      .select($"event_type", $"day".cast("string"), $"level", $"trend",
        $"forecast")
      .as[(String, String, Double, Double, Double)].collect()
    assert(got.nonEmpty)
    got.foreach { case (t, day, level, trend, forecast) =>
      val series = daily(t)
      val i = series.indexWhere(_._1 == day)
      assert(i >= 7, s"$t $day has full lag window")
      val ys = series.slice(i - 7, i + 1).map(_._2)
      // plain double recurrence: halves/quarters of integers stay
      // exact in IEEE doubles at these magnitudes
      var l = ys(0).toDouble; var b = 0.0
      for (k <- 1 to 7) {
        val y = ys(k).toDouble
        val lNew = (y + l + b) / 2.0
        b = (y - l + 3.0 * b) / 4.0
        l = lNew
      }
      assert(level == l / 100.0, s"$t $day level $level != ${l / 100.0}")
      assert(trend == b / 100.0, s"$t $day trend")
      assert(forecast == (l + b) / 100.0, s"$t $day forecast")
    }
  }

  // ---- q297 MAD outliers ------------------------------------------

  test("q297: one brand's median/MAD/outliers match a sorted replay") {
    val rows = Analytics.brandPriceMad(spark, dir)
      .select($"brand", $"n_parts", $"median_price", $"mad",
        $"n_outliers", $"max_dev")
      .as[(String, Long, Double, Double, Long, Double)].collect()
    assert(rows.nonEmpty)
    val cents = graft.sources.Tables.part(spark, dir)
      .select($"p_brand", graft.util.Portable.cents2($"p_retailprice"))
      .as[(String, Long)].collect().groupBy(_._1)
    def med2(xs: Seq[Long]): Long = { // doubled exact median
      val s = xs.sorted
      val n = s.length
      if (n % 2 == 1) 2 * s(n / 2) else s(n / 2 - 1) + s(n / 2)
    }
    rows.foreach { case (b, n, mp, mad, outl, maxDev) =>
      val xs = cents(b).map(_._2).toSeq
      assert(n == xs.length)
      val m2 = med2(xs)
      val dev2 = xs.map(x => math.abs(2 * x - m2))
      val mad4 = med2(dev2)
      assert(mp == m2.toDouble / 200.0, s"$b median")
      assert(mad == mad4.toDouble / 400.0, s"$b mad")
      assert(outl == dev2.count(d => 2 * d > 3 * mad4).toLong, s"$b outl")
      assert(maxDev == dev2.max.toDouble / 200.0, s"$b maxdev")
    }
  }

  // ---- q298 tokenizer fertility -----------------------------------

  test("q298: language sums reconcile with q56's per-document counts") {
    val perDoc = TextOps.regexTokens(spark, dir)
      .agg(sum($"n_ws_tokens"), sum($"n_regex_tokens"))
      .as[(Long, Long)].head()
    val mart = TextOps.tokenizerFertility(spark, dir)
      .agg(sum($"n_words"), sum($"n_tokens")).as[(Long, Long)].head()
    assert(mart == perDoc, s"mart $mart != per-doc $perDoc")
    val rows = TextOps.tokenizerFertility(spark, dir)
      .select($"n_tokens", $"n_words", $"fertility")
      .as[(Long, Long, Double)].collect()
    rows.foreach { case (tk, w, f) =>
      assert(f == (tk * 1000000L / w).toDouble / 1000000.0)
    }
  }

  // ---- q300 Markov removal attribution ----------------------------

  test("q300: removal never helps (re6 >= 0), effects are " +
      "micro-bounded, and a driver-side replay agrees") {
    val rows = Events.markovAttribution(spark, dir)
      .select($"channel", $"p_base6", $"p_rem6", $"re6")
      .as[(String, Long, Long, Long)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (c, pb, pr, re) =>
      assert(pr <= pb, s"$c removed chain converts MORE ($pr > $pb)")
      assert(re >= 0 && re <= 1000000L, s"$c re6 $re")
      assert(re == 1000000L - pr * 1000000L / pb, s"$c re6 arithmetic")
    }
    // driver replay over the collected (vocabulary-sized) matrix
    val tr = graft.sources.Tables.events(spark, dir)
      .withColumn("next_type", lead($"event_type", 1).over(
        org.apache.spark.sql.expressions.Window
          .partitionBy("user_id").orderBy($"ts", $"event_id")))
      .filter($"next_type".isNotNull)
      .groupBy($"event_type", $"next_type").agg(count(lit(1)).as("n"))
      .as[(String, String, Long)].collect()
    val outN = tr.groupBy(_._1).map { case (s, es) => s -> es.map(_._3).sum }
    val p6 = tr.map { case (s, d, n) => (s, d, n * 1000000L / outN(s)) }
    val states = (p6.map(_._1) ++ p6.map(_._2)).distinct
    def vIter(alive: ((String, String, Long)) => Boolean)
        : Map[String, Long] = {
      var v = states.map(s =>
        s -> (if (s == "purchase") 1000000L else 0L)).toMap
      for (_ <- 1 to 4)
        v = states.map { s =>
          s -> (if (s == "purchase") 1000000L
          else p6.filter(e => e._1 == s && alive(e))
            .map(e => e._3 * v(e._2) / 1000000L).sum)
        }.toMap
      v
    }
    val firstEv = graft.sources.Tables.events(spark, dir)
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy("user_id").orderBy($"ts", $"event_id")))
      .filter($"rn" === 1)
      .groupBy($"event_type").agg(count(lit(1)).as("cnt"))
      .as[(String, Long)].collect()
    val users = firstEv.map(_._2).sum
    val pi6 = firstEv.map { case (s, c) => (s, c * 1000000L / users) }
    def weighted(v: Map[String, Long]): Long =
      pi6.filter(p => v.contains(p._1))
        .map { case (s, p) => p * v(s) / 1000000L }.sum
    val pBase = weighted(vIter(_ => true))
    rows.foreach { case (c, pb, pr, _) =>
      assert(pb == pBase, s"$c p_base $pb != replay $pBase")
      val pRem = weighted(vIter(e => e._1 != c && e._2 != c))
      assert(pr == pRem, s"$c p_rem $pr != replay $pRem")
    }
  }

  // ---- q301 t-closeness -------------------------------------------

  test("q301: EMD is micro-bounded and matches a driver-side " +
      "cumulative-gap replay per cell") {
    val rows = graft.operators.Privacy.tCloseness(spark, dir)
      .select($"c_nationkey", $"segment", $"n", $"emd6", $"t_close")
      .as[(Int, String, Long, Long, Boolean)].collect()
    assert(rows.nonEmpty)
    val bf = graft.sources.Tables.customer(spark, dir)
      .select($"c_nationkey".cast("int"), $"c_mktsegment",
        floor(floor($"c_acctbal" * 100.0 + 0.5).cast("long")
          .cast("double") / 100000.0).cast("long"))
      .as[(Int, String, Long)].collect()
    val bands = bf.map(_._3).distinct.sorted
    val nn = bf.length.toLong
    val m = bands.length.toLong
    val gCum = bands.map { b =>
      b -> bf.count(_._3 <= b).toLong * 1000000L / nn
    }.toMap
    rows.foreach { case (nk, seg, n, emd6, tclose) =>
      val cell = bf.filter(r => r._1 == nk && r._2 == seg)
      assert(n == cell.length.toLong, s"($nk,$seg) n")
      val gap = bands.map { b =>
        math.abs(cell.count(_._3 <= b).toLong * 1000000L / n - gCum(b))
      }.sum
      assert(emd6 == gap / (m - 1), s"($nk,$seg) emd6")
      assert(emd6 >= 0 && emd6 <= 1000000L, s"($nk,$seg) bounds")
      assert(tclose == (emd6 <= 200000L), s"($nk,$seg) verdict")
    }
  }

  // ---- q302 zip member walk ---------------------------------------

  test("q302: generated shards are REAL zips — java.util.zip reads " +
      "the same members, sizes, and payloads") {
    val shards = graft.operators.Multimodal
      .syntheticZipShards(spark, 40)
      .select($"shard_id", $"bytes").as[(Long, Array[Byte])]
      .collect().toMap
    val walked = graft.operators.Multimodal.zipMemberWalk(spark, dir)
      .filter($"shard_id" < 40 && $"member_idx" >= 0)
      .select($"shard_id", $"member_idx", $"name", $"size_bytes",
        $"data_offset", $"payload_head")
      .as[(Long, Int, String, Long, Long, String)].collect()
      .groupBy(_._1)
    var checked = 0
    for ((sid, bytes) <- shards if sid % 17 != 0) {
      val zin = new java.util.zip.ZipInputStream(
        new java.io.ByteArrayInputStream(bytes))
      val jdk = Iterator.continually(zin.getNextEntry)
        .takeWhile(_ != null)
        .map { e =>
          val buf = zin.readAllBytes()
          (e.getName, buf.length.toLong,
            buf.take(8).map(b => f"$b%02X").mkString)
        }.toSeq
      val ours = walked(sid).sortBy(_._2)
        .map(r => (r._3, r._4, r._6)).toSeq
      assert(ours == jdk, s"shard $sid: $ours != jdk $jdk")
      // offsets point at the actual payload bytes
      walked(sid).foreach { case (_, _, _, sz, doff, head) =>
        val fromOff = bytes.slice(doff.toInt,
          doff.toInt + math.min(8L, sz).toInt)
          .map(b => f"$b%02X").mkString
        assert(head == fromOff)
      }
      checked += 1
    }
    assert(checked > 30)
  }

  test("q302: a flipped payload byte breaks the CRC cross-check and " +
      "the shard degrades to the sentinel") {
    val bytes = graft.operators.Multimodal.syntheticZipShards(spark, 2)
      .filter($"shard_id" === 1).select($"bytes")
      .as[Array[Byte]].head()
    // first member's payload starts after its 30-byte local header +
    // name; flip one payload byte (sizes are > 0 for shard 1)
    val nameLen = (bytes(26) & 0xff) | ((bytes(27) & 0xff) << 8)
    val tampered = bytes.clone()
    tampered(30 + nameLen) = (tampered(30 + nameLen) ^ 0x01).toByte
    // pristine bytes walk clean; the tampered byte breaks the CRC
    // cross-check and the walker degrades the whole shard
    val clean = graft.operators.Multimodal.walkZip(1L, bytes)
    assert(clean.nonEmpty && clean.forall(_._2 >= 0))
    val walked = graft.operators.Multimodal.walkZip(1L, tampered)
    assert(walked == Seq((1L, -1, "", -1L, -1L, "", false)),
      s"tampered shard should be the sentinel, got $walked")
    // and the JDK's own CRC validation agrees
    val zin = new java.util.zip.ZipInputStream(
      new java.io.ByteArrayInputStream(tampered))
    zin.getNextEntry
    val failed = try { zin.readAllBytes(); false }
    catch { case _: java.util.zip.ZipException => true }
    assert(failed, "JDK zip should reject the tampered CRC")
  }

  // ---- q303 chunk-grain near-dups ---------------------------------

  test("q303: a planted shared paragraph inside two otherwise-" +
      "distinct documents surfaces as a chunk pair") {
    val tmp = java.nio.file.Files
      .createTempDirectory("graft-q303").toString
    val para = (0 until 50).map(i => s"shared$i").mkString(" ")
    def filler(tag: String) =
      (0 until 80).map(i => s"${tag}_w$i").mkString(" ")
    val docs = Seq(
      (0L, filler("a") + " " + para, "en", "web", 0L),
      (1L, filler("b") + " " + para, "en", "web", 0L),
      (2L, filler("c"), "en", "web", 0L))
    spark.createDataFrame(docs)
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val pairs = graft.operators.TextOps.chunkNearDups(spark, tmp)
      .select($"doc_a", $"doc_b", $"n_chunk_pairs", $"max_jaccard")
      .as[(Long, Long, Long, Double)].collect()
    assert(pairs.exists { case (a, b, n, j) =>
      a == 0L && b == 1L && n >= 1 && j >= 0.7
    }, s"planted paragraph pair missing: ${pairs.toSeq}")
    assert(!pairs.exists(p => p._1 == 2L || p._2 == 2L),
      "the distinct doc must not pair")
    org.apache.commons.io.FileUtils
      .deleteDirectory(new java.io.File(tmp))
  }

  test("q303: every surfaced pair is cross-document with " +
      "jaccard >= 0.7 and ordered ids") {
    val rows = graft.operators.TextOps.chunkNearDups(spark, dir)
      .select($"doc_a", $"doc_b", $"n_chunk_pairs", $"max_jaccard")
      .as[(Long, Long, Long, Double)].collect()
    rows.foreach { case (a, b, n, j) =>
      assert(a < b, s"($a,$b) ordering")
      assert(n >= 1 && j >= 0.7, s"($a,$b) n=$n j=$j")
    }
  }

  // ---- q304 DP noisy release --------------------------------------

  test("q304: noise is the deterministic inverse-CDF geometric of " +
      "the cell hash; bounded; suppression matches the threshold") {
    val rows = graft.operators.Privacy.dpNoisyRelease(spark, dir)
      .select($"c_nationkey", $"segment", $"n", $"noise",
        $"noisy_count", $"suppressed")
      .as[(Int, String, Long, Long, Long, Boolean)].collect()
    assert(rows.nonEmpty)
    val md = java.security.MessageDigest.getInstance("MD5")
    rows.foreach { case (nk, seg, n, noise, nc, sup) =>
      assert(math.abs(noise) <= 14, s"($nk,$seg) noise $noise")
      assert(nc == n + noise)
      assert(sup == (nc < 5L))
      val h = graft.operators.TextOps.portable32Of(md, s"$nk|$seg")
      val u = ((h % 1000000L).toDouble + 0.5) / 1000000.0
      val up = 2.0 * u - 1.0
      val expected = math.signum(up).toLong *
        math.floor(math.log(1.0 - math.abs(up)) / -1.0).toLong
      assert(noise == expected, s"($nk,$seg) noise $noise != $expected")
    }
    // the mechanism must actually perturb: some cell has nonzero noise
    assert(rows.exists(_._4 != 0L))
  }

  // ---- q305 streaming Holt monitor --------------------------------

  test("q305: the drained streaming Holt monitor equals the batch " +
      "q296 recurrence bit-for-bit") {
    val got = graft.streaming.StreamingEwma.holtMonitor(spark, dir)
      .collect().toSeq
    val expected = Analytics.holtForecast(spark, dir).collect().toSeq
    assert(got == expected)
    assert(got.nonEmpty)
  }

  // ---- q306 fused RAG context / q307 agreement --------------------

  test("q306: picks are exactly q290's fused top-5 and the budget " +
      "rule is the greedy prefix") {
    val ctx = graft.operators.Retrieval.fusedRagContext(spark, dir)
      .select($"query_id", $"rank", $"doc_id", $"n_tokens",
        $"cum_tokens", $"kept")
      .as[(Long, Long, Long, Long, Long, Boolean)].collect()
    assert(ctx.nonEmpty)
    val fused = graft.operators.Retrieval.rrfFusion(spark, dir)
      .select($"query_id", $"rank", $"doc_id")
      .as[(Long, Long, Long)].collect().toSet
    assert(ctx.map(r => (r._1, r._2, r._3)).toSet == fused)
    ctx.groupBy(_._1).foreach { case (_, rows) =>
      val ordered = rows.sortBy(_._2)
      var cum = 0L
      ordered.foreach { r =>
        cum += r._4
        assert(r._5 == cum, s"cum mismatch at $r")
        assert(r._6 == (cum <= 120L), s"kept rule at $r")
      }
    }
  }

  test("q307: agreement counts reconcile with driver-side set " +
      "algebra over the three gated rankings") {
    def top5(df: org.apache.spark.sql.DataFrame): Map[Long, Set[Long]] =
      df.select($"query_id", $"doc_id").as[(Long, Long)].collect()
        .groupBy(_._1).map { case (q, rs) => q -> rs.map(_._2).toSet }
    val rrf5 = top5(graft.operators.Retrieval.rrfFusion(spark, dir))
    val lex5 = top5(graft.operators.Retrieval.bm25(spark, dir))
    val rows = graft.operators.Retrieval.retrievalAgreement(spark, dir)
      .select($"query_id", $"n_fused", $"lex_dense", $"rrf_lex",
        $"rrf_dense", $"fused_new")
      .as[(Long, Long, Long, Long, Long, Long)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (q, nf, ld, rl, rd, fn) =>
      assert(nf == rrf5(q).size.toLong)
      assert(rl == (rrf5(q) & lex5.getOrElse(q, Set.empty)).size.toLong,
        s"q$q rrf_lex")
      assert(Seq(ld, rl, rd, fn).forall(c => c >= 0 && c <= 5))
      // fused_new + |rrf ∩ (lex ∪ dense)| = n_fused; with only lex
      // available here: fused_new <= n_fused - rrf_lex
      assert(fn <= nf - rl, s"q$q fused_new $fn > ${nf - rl}")
    }
  }

  // ---- q308 Kneser-Ney bigram LM ----------------------------------

  test("q308: doc NLLs match a driver-side replay of the KN counts " +
      "and formula; discounted per-context mass stays <= 1") {
    val docs = graft.sources.Tables.documents(spark, dir)
      .select($"doc_id", $"text").as[(Long, String)].collect()
    val bgs = docs.flatMap { case (id, t) =>
      val ws = t.split(" ", -1)
      if (ws.length < 2) Seq.empty
      else ws.sliding(2).map(p => (id, p(0), p(1))).toSeq
    }
    val c12 = bgs.groupBy(b => (b._2, b._3)).view.mapValues(_.length.toLong).toMap
    val c1b = bgs.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    val n1p = c12.keys.toSeq.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val ncw = c12.keys.toSeq.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    val nt = c12.size.toLong
    def lp9(w1: String, w2: String): Long = {
      val p = ((c12((w1, w2)) * 4 - 3).toDouble / (c1b(w1) * 4).toDouble) +
        (3.0 * n1p(w1).toDouble / (c1b(w1) * 4).toDouble) *
        (ncw(w2).toDouble / nt.toDouble)
      math.floor(math.log(p) * 1000000000.0 + 0.5).toLong
    }
    val expected = bgs.filter(_._1 < 100).groupBy(_._1).map {
      case (id, bs) =>
        val slp = bs.map(b => lp9(b._2, b._3)).sum
        val nll = -(slp.toDouble / 1000000000.0) / bs.length
        id -> (bs.length.toLong,
          math.floor(nll * 1000000.0 + 0.5).toLong.toDouble / 1000000.0)
    }
    val got = TextOps.knBigramLmScore(spark, dir)
      .select($"doc_id", $"n_bigrams", $"nll_nats")
      .as[(Long, Long, Double)].collect()
    assert(got.nonEmpty && got.length == expected.size)
    got.foreach { case (id, n, nll) =>
      assert((n, nll) == expected(id), s"doc $id")
    }
    // discounted mass: sum over observed continuations of p(w|v) <= 1
    val byV = c12.keys.toSeq.groupBy(_._1)
    byV.take(50).foreach { case (v, ws) =>
      val mass = ws.map { case (_, w2) =>
        ((c12((v, w2)) * 4 - 3).toDouble / (c1b(v) * 4).toDouble) +
          (3.0 * n1p(v).toDouble / (c1b(v) * 4).toDouble) *
          (ncw(w2).toDouble / nt.toDouble)
      }.sum
      assert(mass <= 1.0 + 1e-9, s"context $v mass $mass")
    }
  }

  // ---- q309 decayed co-visitation ---------------------------------

  test("q309: the decayed ranking matches a driver-side replay with " +
      "dyadic shift weights") {
    val baskets = graft.sources.Tables.lineitem(spark, dir)
      .join(broadcast(graft.sources.Tables.part(spark, dir)),
        $"l_partkey" === $"p_partkey")
      .select($"l_orderkey", $"p_brand").distinct()
      .as[(Long, String)].collect().groupBy(_._1)
      .map { case (k, vs) => k -> vs.map(_._2).sorted.take(32) }
    val days = graft.sources.Tables.orders(spark, dir)
      .select($"o_orderkey", to_date($"o_orderdate").cast("string"))
      .as[(Long, String)].collect().toMap
    val maxd = java.time.LocalDate.parse(days.values.max)
    def w6(ok: Long): Long = {
      val age = java.time.temporal.ChronoUnit.DAYS
        .between(java.time.LocalDate.parse(days(ok)), maxd)
      1000000L >> math.min(age / 28, 20L).toInt
    }
    val agg = scala.collection.mutable.Map
      .empty[(String, String), (Long, Long)]
    baskets.foreach { case (ok, bs) =>
      for (a <- bs; b <- bs if a < b) {
        val (n, s) = agg.getOrElse((a, b), (0L, 0L))
        agg((a, b)) = (n + 1, s + w6(ok))
      }
    }
    val expected = agg.toSeq
      .sortBy { case ((a, b), (_, s)) => (-s, a, b) }.take(20)
      .zipWithIndex
      .map { case (((a, b), (n, s)), i) => (i + 1L, a, b, n, s) }
    val got = Analytics.decayedCovisitation(spark, dir)
      .select($"rank", $"brand_a", $"brand_b", $"n_orders", $"w6sum")
      .as[(Long, String, String, Long, Long)].collect().toSeq
    assert(got == expected)
  }

  // ---- q299 Markov absorption -------------------------------------

  test("q299: absorption probabilities are monotone in steps, " +
      "micro-bounded, and purchase is pinned at 10^6") {
    val rows = Events.funnelAbsorption(spark, dir)
      .select($"state", $"r1", $"r2", $"r3", $"r4")
      .as[(String, Long, Long, Long, Long)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (s, r1, r2, r3, r4) =>
      assert(r1 <= r2 && r2 <= r3 && r3 <= r4, s"$s monotone")
      assert(r1 >= 0 && r4 <= 1000000L, s"$s bounds")
      if (s == "purchase")
        assert(r1 == 1000000L && r4 == 1000000L, "purchase absorbing")
    }
    assert(rows.exists(_._1 == "purchase"))
  }
}
