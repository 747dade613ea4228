package graft

import org.apache.spark.sql.functions._

import graft.operators.{Analytics, Events, TextOps, VectorOps}

/** Round-8 additions, third batch: exact Shapley channel attribution
  * (q311), CUSUM mean-shift changepoints (q312), Kaplan–Meier
  * product-limit survival (q313). Every invariant is independent of
  * the oracle gate: driver-side replays through DIFFERENT arithmetic
  * (the literal textbook recursions), axioms (Shapley efficiency), and
  * cross-estimator consistency (KM vs Nelson–Aalen).
  */
class Round13Spec extends SparkSpec {
  import spark.implicits._

  private val dir = sf("sf0.001")

  // ---- q311 exact Shapley attribution ------------------------------

  /** Driver-side replay: per-user masks from raw events, v(S) by
    * direct subset enumeration, φ from the factorial-weight formula —
    * a different code path end to end. */
  private lazy val shapleyReplay: (Map[String, Long], Long, Long) = {
    val bits = Seq("click" -> 1, "error" -> 2, "signup" -> 4, "view" -> 8)
    val rows = graft.sources.Tables.events(spark, dir)
      .select($"user_id", $"event_type").as[(Long, String)].collect()
    val byUser = rows.groupBy(_._1).toSeq.map { case (_, es) =>
      val types = es.map(_._2).toSet
      val mask = bits.collect { case (t, b) if types(t) => b }.sum
      (mask, if (types("purchase")) 1L else 0L)
    }
    def v(s: Int): Long =
      byUser.collect { case (m, c) if (m & s) == m => c }.sum
    val w24 = Map(0 -> 6L, 1 -> 2L, 2 -> 2L, 3 -> 6L)
    val phi = bits.map { case (ch, b) =>
      ch -> (0 until 16).filter(s => (s & b) == 0).map { s =>
        w24(Integer.bitCount(s)) * (v(s | b) - v(s))
      }.sum
    }.toMap
    (phi, v(15), v(0))
  }

  test("q311: phi24 matches a driver-side subset-enumeration replay") {
    val got = Events.shapleyAttribution(spark, dir)
      .select($"channel", $"phi24").as[(String, Long)].collect().toMap
    val (phi, _, _) = shapleyReplay
    assert(got == phi, s"operator $got != replay $phi")
  }

  test("q311: efficiency axiom — credits sum to v(C) - v(empty), " +
      "and monotone v makes every credit non-negative") {
    val (phi, vFull, vEmpty) = shapleyReplay
    assert(phi.values.sum == 24L * (vFull - vEmpty))
    assert(phi.values.forall(_ >= 0L))
    assert(vFull > 0L)
  }

  // ---- q312 CUSUM closed form vs the textbook recursion ------------

  test("q312: the prefix-sum closed form equals the literal " +
      "max(0, S + x - k) recursion, alarms and peaks included") {
    val part = graft.sources.Tables.part(spark, dir)
      .select($"p_partkey", $"p_brand")
    val daily = graft.sources.Tables.lineitem(spark, dir)
      .join(part, $"l_partkey" === $"p_partkey")
      .select($"p_brand".as("brand"), to_date($"l_shipdate").as("day"),
        graft.util.Portable.cents2(
          $"l_extendedprice" * (lit(1.0) - $"l_discount")).as("c"))
      .groupBy("brand", "day").agg(sum("c").as("x"))
      .select($"brand", $"day".cast("string"), $"x")
      .as[(String, String, Long)].collect()
    // literal Page (1954) recursion, per brand in day order
    val expected = daily.groupBy(_._1).flatMap { case (brand, rows) =>
      val ordered = rows.sortBy(_._2)
      val xs = ordered.map(_._3)
      val k = xs.sum / xs.length // integer div, same allowance
      val h = 2 * k
      var sp = 0L
      var sm = 0L
      val states = xs.zip(ordered.map(_._2)).map { case (x, day) =>
        sp = math.max(0L, sp + x - k)
        sm = math.max(0L, sm + k - x)
        (day, sp, sm)
      }
      Seq(("up", states.map(s => (s._1, s._2))),
        ("down", states.map(s => (s._1, s._3)))).map {
        case (dir, ss) =>
          val peak = ss.sortBy { case (day, st) => (-st, day) }.head
          (brand, dir, ss.count(_._2 > h).toLong, peak._1,
            peak._2.toDouble / 100.0)
      }
    }.toSet
    val got = Analytics.cusumChangepoints(spark, dir)
      .select($"brand", $"direction", $"n_alarm_days",
        $"peak_day".cast("string"), $"peak_stat")
      .as[(String, String, Long, String, Double)].collect().toSet
    assert(got == expected,
      s"closed form diverges: extra=${got -- expected} " +
        s"missing=${expected -- got}")
    assert(got.nonEmpty && got.exists(_._3 > 0L))
  }

  // ---- q319 difference-in-differences -------------------------------

  test("q319: the 2x2 scalars replay from driver-side cell sums and " +
      "the significance flag is the stated threshold") {
    val part = graft.sources.Tables.part(spark, dir)
      .select($"p_partkey", $"p_brand")
    val daily = graft.sources.Tables.lineitem(spark, dir)
      .join(part, $"l_partkey" === $"p_partkey")
      .select($"p_brand".as("brand"), to_date($"l_shipdate").as("day"),
        graft.util.Portable.cents2(
          $"l_extendedprice" * (lit(1.0) - $"l_discount")).as("c"))
      .groupBy("brand", "day").agg(sum("c").as("x"))
      .select($"brand", ($"day" >= lit("1995-06-01").cast("date"))
        .as("post"), $"x")
      .as[(String, Boolean, Long)].collect()
    def hash32(s: String): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      java.lang.Long.parseLong(
        md.digest(s.getBytes("UTF-8")).take(4)
          .map(b => f"$b%02x").mkString, 16)
    }
    val cells = daily.groupBy(r => (hash32(r._1) % 2 == 1, r._2))
      .map { case (k, rs) =>
        k -> (rs.length.toLong, rs.map(_._3).sum,
          rs.map(r => BigInt(r._3) * BigInt(r._3)).sum)
      }
    def mv(t: Boolean, p: Boolean): (Double, Double, Long) = {
      val (n, s, ss) = cells((t, p))
      val m = s.toDouble / n.toDouble
      val v = (ss.toDouble - s.toDouble * s.toDouble / n.toDouble) /
        (n.toDouble - 1.0)
      (m, v, n)
    }
    val (mtp, vtp, ntp) = mv(true, true)
    val (mtr, vtr, ntr) = mv(true, false)
    val (mcp, vcp, ncp) = mv(false, true)
    val (mcr, vcr, ncr) = mv(false, false)
    val did = (mtp - mtr) - (mcp - mcr)
    val se = math.sqrt(vtp / ntp + vtr / ntr + vcp / ncp + vcr / ncr)
    def v6(x: Double) = math.floor(x * 1e6 + 0.5) / 1e6
    val row = Analytics.didPromoLift(spark, dir).collect()(0)
    assert(row.getAs[Long]("n_t_post") == ntp)
    assert(row.getAs[Double]("did_estimate") == v6(did / 100.0))
    assert(row.getAs[Double]("se") == v6(se / 100.0))
    assert(row.getAs[Double]("t_stat") == v6(did / se))
    assert(row.getAs[Boolean]("significant") == (math.abs(did / se) > 1.96))
  }

  // ---- q320 streaming CUSUM monitor ---------------------------------

  test("q320: the drained streaming reading equals the batch closed " +
      "form bit-for-bit (maintenance is invisible)") {
    val batch = graft.sources.Tables.events(spark, dir)
      .groupBy($"event_type", to_date($"ts").as("day"))
      .agg(sum(graft.util.Portable.cents2($"value")).as("x"))
    val expected = graft.operators.Analytics
      .cusumFrom(batch, "event_type").collect().toSeq
    val got = graft.streaming.StreamingEwma.cusumMonitor(spark, dir)
      .collect().toSeq
    assert(got == expected)
    assert(got.size == 10) // 5 channels x 2 directions, always present
  }

  // ---- q321 logistic quality distillation ---------------------------

  test("q321: the trained weights replay exactly from a driver-side " +
      "gradient loop, and the student beats the majority baseline") {
    val rows = graft.sources.Tables.documents(spark, dir)
      .select($"text", $"n_chars").as[(String, Long)].collect()
      .map { case (text, nChars) =>
        val toks = text.split(" ", -1)
        val y = if (toks.distinct.length * 20 > toks.length * 11) 1 else 0
        val xs = Array(1,
          if (toks.length < 30) 1 else 0, if (toks.length < 45) 1 else 0,
          if (toks.length < 60) 1 else 0, if (toks.length < 80) 1 else 0,
          if (toks.length < 100) 1 else 0,
          if (nChars < 300) 1 else 0, if (nChars < 600) 1 else 0)
        (y, xs)
      }
    val k = 8
    val n = rows.length.toLong
    var w = Array.fill(k)(0L)
    for (_ <- 1 to 5) {
      val g = Array.fill(k)(0L)
      rows.foreach { case (y, xs) =>
        val z9 = (0 until k).map(i => xs(i) * w(i)).sum
        val zD = z9.toDouble / 1e9
        val p = 0.5 + zD / (2.0 * (1.0 + math.abs(zD)))
        val d9 = math.floor((p - y.toDouble) * 1e9 + 0.5).toLong
        (0 until k).foreach(i => g(i) += xs(i) * d9)
      }
      w = (0 until k).map(i => w(i) - g(i) / n).toArray
    }
    val got = graft.operators.Features.logisticQualityDistill(spark, dir)
      .select($"feature_idx", $"w9", $"train_acc")
      .as[(Int, Long, Double)].collect().sortBy(_._1)
    assert(got.map(_._2).toSeq == w.toSeq,
      s"weights ${got.map(_._2).toSeq} != replay ${w.toSeq}")
    val majority = math.max(rows.count(_._1 == 1), rows.count(_._1 == 0))
      .toDouble / n
    assert(got.head._3 > majority + 0.05,
      s"acc ${got.head._3} does not beat majority $majority")
  }

  // ---- q322 calibration card ----------------------------------------

  test("q322: bins cover the corpus, confidence sits inside its bin, " +
      "and ECE/Brier replay from the driver-side model") {
    val nDocs = graft.sources.Tables.documents(spark, dir).count()
    val rows = graft.operators.Features.distillCalibration(spark, dir)
      .select($"bin", $"n", $"confidence", $"realized", $"gap",
        $"ece", $"brier")
      .as[(Int, Long, Double, Double, Double, Double, Double)].collect()
    assert(rows.map(_._2).sum == nDocs)
    rows.foreach { case (bin, _, conf, real, gap, ece, brier) =>
      assert(bin >= 0 && bin <= 9)
      assert(conf >= bin / 10.0 - 1e-6 && conf <= (bin + 1) / 10.0 + 1e-6,
        s"bin $bin confidence $conf outside its bin")
      assert(real >= 0.0 && real <= 1.0)
      assert(gap >= 0.0 && gap <= 1.0)
      assert(ece >= 0.0 && ece <= 1.0 && brier >= 0.0 && brier <= 1.0)
    }
    // ECE is the n-weighted mean |gap| — recompute from the bin rows
    val eceBits = rows.map { case (_, n, conf, real, _, _, _) =>
      math.floor(math.abs(real - conf) * 1e9 + 0.5).toLong * n }.sum
    val v6 = math.floor(eceBits.toDouble / nDocs / 1e9 * 1e6 + 0.5) / 1e6
    // conf/real are val6-rounded in the output; allow one micro-ulp
    assert(math.abs(rows.head._6 - v6) <= 2e-6,
      s"ece ${rows.head._6} vs bin-row recompute $v6")
  }

  // ---- q323 banded fuzzy join ----------------------------------------

  test("q323: the banded serve returns exactly q83's pairs") {
    val builtin = graft.operators.Relational.fuzzyNamePairs(spark, dir)
      .collect().toSeq
    val banded = graft.operators.Relational
      .fuzzyNamePairsBanded(spark, dir).collect().toSeq
    assert(banded == builtin)
    assert(banded.nonEmpty)
  }

  // ---- q324 split-conformal intervals --------------------------------

  test("q324: qhat is the replayed k-th smallest calibration residual " +
      "and coverage replays from the scoring window") {
    val daily = graft.sources.Tables.events(spark, dir)
      .groupBy($"event_type", to_date($"ts").as("day"))
      .agg(sum(graft.util.Portable.cents2($"value")).as("c"))
      .select($"event_type", $"day".cast("string"), $"c")
      .as[(String, String, Long)].collect()
    val split = "2024-01-22"
    val expected = daily.groupBy(_._1).map { case (t, rows) =>
      val xs = rows.sortBy(_._2)
      val fc = xs.indices.flatMap { i =>
        val terms = (1 to 8).flatMap { k =>
          if (i - k >= 0) Some((xs(i - k)._3 * (1L << (8 - k)),
            1L << (8 - k))) else None
        }
        val den = terms.map(_._2).sum
        if (den == 0) None
        else Some((xs(i)._2,
          math.abs(xs(i)._3 - terms.map(_._1).sum / den)))
      }
      val (cal, score) = fc.partition(_._1 < split)
      val sorted = cal.map(_._2).sorted
      val k = math.min((4 * cal.size + 8) / 5, cal.size)
      val qhat = sorted(k - 1)
      val covered = score.count(_._2 <= qhat)
      t -> (cal.size.toLong, score.size.toLong,
        qhat.toDouble / 100.0,
        math.floor(covered.toDouble / score.size * 1e6 + 0.5) / 1e6)
    }
    val got = Analytics.conformalForecast(spark, dir)
      .select($"event_type", $"n_cal", $"n_score", $"qhat", $"coverage")
      .as[(String, Long, Long, Double, Double)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4, r._5)).toMap
    assert(got == expected, s"got $got want $expected")
    assert(got.size == 5)
  }

  // ---- q325 streaming conformal monitor ------------------------------

  test("q325: the drained streaming reading equals the batch " +
      "conformal readout bit-for-bit") {
    val expected = Analytics.conformalForecast(spark, dir).collect().toSeq
    val got = graft.streaming.StreamingEwma.conformalMonitor(spark, dir)
      .collect().toSeq
    assert(got == expected)
    assert(got.size == 5)
  }

  // ---- q313 Kaplan–Meier ------------------------------------------

  test("q313: survival is non-increasing, in (0,1], and consistent " +
      "with q262's Nelson-Aalen via S <= exp(-H) + eps") {
    val km = Analytics.kaplanMeier(spark, dir)
      .select($"day", $"km_survival").as[(Long, Double)].collect()
      .sortBy(_._1)
    assert(km.nonEmpty)
    km.foreach { case (_, s) => assert(s >= 0.0 && s <= 1.0) }
    km.sliding(2).foreach {
      case Array((_, a), (_, b)) => assert(b <= a + 1e-9)
      case _ =>
    }
    val na = Analytics.repeatPurchaseHazard(spark, dir)
      .select($"day", $"cum_hazard").as[(Long, Double)].collect().toMap
    km.foreach { case (day, s) =>
      assert(s <= math.exp(-na(day)) + 1e-6,
        s"day $day: KM $s > exp(-H) ${math.exp(-na(day))}")
    }
  }

  test("q313: matches a driver-side product-limit replay from the " +
      "endpoint histogram") {
    val p = graft.sources.Tables.events(spark, dir)
      .filter($"event_type" === "purchase")
      .select($"user_id", $"event_id", unix_micros($"ts").as("us"))
      .as[(Long, Long, Long)].collect()
    val endUs = p.map(_._3).max
    val dayUs = 86400000000L
    val ends = p.groupBy(_._1).toSeq.map { case (_, es) =>
      val ts = es.sortBy(e => (e._3, e._2)).map(_._3)
      if (ts.length >= 2) ((ts(1) - ts(0)) / dayUs, true)
      else ((endUs - ts(0)) / dayUs, false)
    }
    val days = ends.groupBy(_._1).toSeq.sortBy(_._1)
    var atRisk = ends.size.toLong
    var cumL9 = 0L
    var hitZero = false
    val expected = days.flatMap { case (day, es) =>
      val d = es.count(_._2).toLong
      val row = if (d > 0) {
        if (d == atRisk) hitZero = true
        else cumL9 += math.floor(
          math.log((atRisk - d).toDouble / atRisk) * 1e9 + 0.5).toLong
        val s = if (hitZero) 0.0
          else math.floor(math.exp(cumL9 / 1e9) * 1e6 + 0.5) / 1e6
        Some((day, atRisk, d, s))
      } else None
      atRisk -= es.size
      row
    }
    val got = Analytics.kaplanMeier(spark, dir)
      .select($"day", $"n_risk", $"n_converted", $"km_survival")
      .as[(Long, Long, Long, Double)].collect().sortBy(_._1).toSeq
    assert(got == expected)
  }

  // ---- q314 binary-quantization serve ------------------------------

  test("q314: hamming matches the packed sign codes, re-ranked " +
      "cosines are exact, and BQ recall@5 is a real signal") {
    val e = graft.sources.Tables.embeddings(spark, dir)
      .select($"vec_id", $"embedding").as[(Long, Array[Float])]
      .collect().toMap
    def bruteTop5(qi: Long): Set[Long] =
      e.toSeq.filter(_._1 != qi)
        .map { case (ni, v) => (ni, VectorOps.cosOf(e(qi), v)) }
        .sortBy { case (ni, c) => (-c, ni) }.take(5).map(_._1).toSet
    val got = VectorOps.bqKnn(spark, dir)
      .select($"query_id", $"neighbor_id", $"hamming", $"cos_sim")
      .as[(Long, Long, Int, Double)].collect()
    got.foreach { case (qi, ni, h, cs) =>
      val hx = VectorOps.bqHamming(
        VectorOps.bqPack(e(qi)), VectorOps.bqPack(e(ni)))
      assert(h == hx, s"q$qi n$ni hamming $h != packed $hx")
      val exact =
        math.floor(VectorOps.cosOf(e(qi), e(ni)) * 1e6 + 0.5) / 1e6
      assert(cs == exact)
      assert(h >= 0 && h <= e(qi).length)
    }
    val recall = got.count { case (qi, ni, _, _) => bruteTop5(qi)(ni) }
    assert(recall >= got.length / 2,
      s"BQ recall $recall/${got.length} below the half floor")
  }

  // ---- q317 DSv2 aggregate pushdown ---------------------------------

  private def eventGenScans(df: org.apache.spark.sql.DataFrame)
      : Seq[graft.sources.v2.EventGenScan] = {
    import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    def leaves(p: org.apache.spark.sql.execution.SparkPlan)
        : Seq[org.apache.spark.sql.execution.SparkPlan] =
      p match {
        case a: AdaptiveSparkPlanExec => leaves(a.initialPlan)
        case other => other.collectLeaves().flatMap {
          case a: AdaptiveSparkPlanExec => leaves(a.initialPlan)
          case l => Seq(l)
        }
      }
    leaves(df.queryExecution.executedPlan).collect {
      case b: BatchScanExec => b.scan
    }.collect { case s: graft.sources.v2.EventGenScan => s }
  }

  test("q317: the executed scan serves the pushed aggregation, and a " +
      "non-absorbable filter falls back to the row path with " +
      "identical results") {
    val pushed = graft.sources.v2.EventGen.aggPushSummary(spark, dir)
    val scans = eventGenScans(pushed)
    assert(scans.nonEmpty && scans.forall(_.aggPushed),
      s"expected an agg-pushed EventGenScan, got ${scans.map(_.description())}")
    // same aggregate with a residual (non-absorbable) filter: pushdown
    // must decline, results must agree
    val fallback = spark.read.format("graft-eventgen")
      .option("rows", 100000L).option("partitions", 10)
      .option("users", 500L).load()
      .filter($"event_id" >= 20000L && $"event_id" < 80000L)
      .filter(length($"event_type") > 0) // residual: blocks agg pushdown
      .groupBy("event_type")
      .agg(count($"event_id").as("n_events"),
        sum("user_id").as("sum_uid"),
        min("value").as("min_value"),
        max("value").as("max_value"))
    val fbScans = eventGenScans(fallback)
    assert(fbScans.nonEmpty && fbScans.forall(!_.aggPushed))
    val a = pushed.orderBy("event_type").collect().toSeq
    val b = fallback.orderBy("event_type").collect().toSeq
    assert(a == b, s"pushed $a != fallback $b")
    assert(a.size == 5)
  }

  test("q317: distinct aggregates decline pushdown but stay correct") {
    val distinctQ = spark.read.format("graft-eventgen")
      .option("rows", 10000L).option("partitions", 4)
      .option("users", 500L).load()
      .groupBy("event_type")
      .agg(countDistinct("user_id").as("n_users"))
    assert(eventGenScans(distinctQ).forall(!_.aggPushed))
    assert(distinctQ.collect().map(_.getLong(1)).forall(n =>
      n > 0 && n <= 500))
  }

  // ---- q318 WARC record walk ----------------------------------------

  private def warcBytes(records: Seq[(String, Array[Byte])]): Array[Byte] =
    records.flatMap { case (uri, payload) =>
      (s"WARC/1.0\r\nWARC-Type: response\r\nWARC-Target-URI: $uri\r\n" +
        s"WARC-Date: 2024-01-01T00:00:00Z\r\n" +
        s"Content-Length: ${payload.length}\r\n\r\n")
        .getBytes("US-ASCII") ++ payload ++ "\r\n\r\n".getBytes("US-ASCII")
    }.toArray

  test("q318: the walker parses hand-built WARC bytes and degrades " +
      "every violation to the sentinel") {
    import graft.operators.Multimodal.warcWalk
    val good = warcBytes(Seq(
      ("http://a/1", "hello".getBytes("US-ASCII")),
      ("http://a/2", Array.empty[Byte]),
      ("http://a/3", Array.tabulate(12)(_.toByte))))
    assert(warcWalk(7L, good) == Seq(
      (7L, 0, "response", "http://a/1", 5L, "68656C6C6F"),
      (7L, 1, "response", "http://a/2", 0L, ""),
      (7L, 2, "response", "http://a/3", 12L, "0001020304050607")))
    val sentinel = Seq((7L, -1, "", "", -1L, ""))
    // truncation mid-payload
    assert(warcWalk(7L, good.dropRight(9)) == sentinel)
    // broken record separator
    val noSep = good.clone(); noSep(good.length - 1) = 'x'.toByte
    assert(warcWalk(7L, noSep) == sentinel)
    // bad version line
    val badV = good.clone(); badV(5) = '2'.toByte
    assert(warcWalk(7L, badV) == sentinel)
    // non-numeric Content-Length
    val cl = new String(good, "ISO-8859-1")
      .replaceFirst("Content-Length: 5", "Content-Length: 5x")
      .getBytes("ISO-8859-1")
    assert(warcWalk(7L, cl) == sentinel)
    // garbage trailer after a clean last record
    assert(warcWalk(7L, good ++ Array[Byte](0)) == sentinel)
  }

  test("q318: the gated walk reconciles with the generator's closed " +
      "form (record population and payload streams)") {
    val got = graft.operators.Multimodal.warcRecordWalk(spark, dir)
      .select($"shard_id", $"record_idx", $"target_uri",
        $"content_length", $"payload_head")
      .as[(Long, Int, String, Long, String)].collect()
    val (bad, good) = got.partition(_._2 == -1)
    assert(bad.map(_._1).toSet == (0L until 500L).filter(_ % 17 == 0).toSet)
    good.groupBy(_._1).foreach { case (sid, rs) =>
      assert(rs.length == (sid % 3 + 2).toInt, s"shard $sid count")
    }
    val md = java.security.MessageDigest.getInstance("MD5")
    good.filter(_._1 < 40).foreach { case (sid, j, uri, len, head) =>
      assert(uri == s"http://ex.com/s$sid/p$j")
      assert(len == (sid * 37 + j * 19) % 300)
      val hexStream = (1 to 19).map(_ =>
        md.digest(s"$sid:$j".getBytes("UTF-8"))
          .map(b => f"$b%02x").mkString).mkString
      assert(head == hexStream.take(math.min(16L, len * 2).toInt)
        .toUpperCase)
    }
  }

  // ---- q326 DSv2 limit / top-N pushdown ------------------------------

  test("q326: the executed scan's id range collapsed to the top-N " +
      "window, a bare LIMIT pushes too, and a residual filter falls " +
      "back with identical rows") {
    val pushed = graft.sources.v2.EventGen.topNPushSummary(spark, dir)
    val scans = eventGenScans(pushed)
    assert(scans.nonEmpty)
    assert(scans.forall(_.idRange == (79950L, 80000L)),
      s"got ranges ${scans.map(_.idRange)}")
    assert(scans.forall(_.limitShape.exists(_.startsWith("topN"))))
    // bare LIMIT: any n generated rows satisfy it — range shrinks to n
    val lim = spark.read.format("graft-eventgen")
      .option("rows", 100000L).option("partitions", 10)
      .option("users", 500L).load().limit(7)
    val limScans = eventGenScans(lim)
    assert(limScans.forall(_.idRange == (0L, 7L)))
    assert(limScans.forall(_.limitShape.exists(_.startsWith("limit"))))
    assert(lim.count() == 7)
    // fallback: a residual filter blocks the pushdown, rows unchanged
    val fallback = spark.read.format("graft-eventgen")
      .option("rows", 100000L).option("partitions", 10)
      .option("users", 500L).load()
      .filter($"event_id" >= 20000L && $"event_id" < 80000L)
      .filter(length($"event_type") > 0)
      .orderBy($"event_id".desc)
      .limit(50)
    assert(eventGenScans(fallback).forall(_.limitShape.isEmpty))
    assert(fallback.collect().toSeq == pushed.collect().toSeq)
  }

  // ---- q327 BQ-over-IVF composed serve -------------------------------

  test("q327: candidates come only from probed buckets, hamming " +
      "matches the packed codes, cosines are exact, and recall is " +
      "within reach of plain BQ's") {
    val e = graft.sources.Tables.embeddings(spark, dir)
      .select($"vec_id", $"embedding").as[(Long, Array[Float])]
      .collect().toMap
    val cents = e.toSeq.filter(_._1 < 16).sortBy(_._1)
    def bucketOf(v: Array[Float]): Long =
      cents.map { case (c, cv) => (c, VectorOps.cosOf(v, cv)) }
        .maxBy { case (c, s) => (s, -c) }._1
    def probesOf(qv: Array[Float]): Set[Long] =
      cents.map { case (c, cv) => (c, VectorOps.cosOf(qv, cv)) }
        .sortBy { case (c, s) => (-s, c) }.take(4).map(_._1).toSet
    val got = VectorOps.bqIvfKnn(spark, dir)
      .select($"query_id", $"neighbor_id", $"hamming", $"cos_sim")
      .as[(Long, Long, Int, Double)].collect()
    assert(got.nonEmpty)
    got.foreach { case (qi, ni, h, cs) =>
      assert(probesOf(e(qi))(bucketOf(e(ni))),
        s"neighbor $ni of query $qi outside the probed buckets")
      assert(h == VectorOps.bqHamming(
        VectorOps.bqPack(e(qi)), VectorOps.bqPack(e(ni))))
      val exact =
        math.floor(VectorOps.cosOf(e(qi), e(ni)) * 1e6 + 0.5) / 1e6
      assert(cs == exact)
    }
    // the composed serve prunes buckets, so its recall is bounded by
    // plain BQ's; both shortlists are 32-deep
    val bq = VectorOps.bqKnn(spark, dir)
      .select($"query_id", $"neighbor_id").as[(Long, Long)].collect()
      .groupBy(_._1).map { case (q, ns) => q -> ns.map(_._2).toSet }
    val agree = got.count { case (qi, ni, _, _) => bq(qi)(ni) }
    assert(agree * 2 >= got.length,
      s"composed serve agrees with plain BQ on only $agree/${got.length}")
  }

  // ---- q315 CCNet perplexity buckets --------------------------------

  test("q315: per-language tercile sizes are exact rank thirds and " +
      "volumes reconcile with the corpus") {
    val docs = graft.sources.Tables.documents(spark, dir)
      .groupBy($"lang").count().as[(String, Long)].collect().toMap
    val got = TextOps.ccnetPerplexityBuckets(spark, dir)
      .select($"lang", $"bucket", $"n_docs", $"kept")
      .as[(String, String, Long, Boolean)].collect()
    got.groupBy(_._1).foreach { case (lang, rows) =>
      val n = docs(lang)
      val by = rows.map(r => r._2 -> r._3).toMap
      // |head| = floor(n/3), |middle| = floor(2n/3) - floor(n/3)
      assert(by.getOrElse("head", 0L) == n / 3, s"$lang head")
      assert(by.getOrElse("middle", 0L) == 2 * n / 3 - n / 3,
        s"$lang middle")
      assert(by.getOrElse("tail", 0L) == n - 2 * n / 3, s"$lang tail")
      assert(rows.map(_._3).sum == n)
    }
    got.foreach { case (_, b, _, kept) => assert(kept == (b != "tail")) }
    assert(got.map(_._1).distinct.length == docs.size)
  }

  // ---- q316 margin-based bitext mining ------------------------------

  test("q316: margins replay from brute-force directional " +
      "neighborhoods and the accept flag is the stated threshold") {
    val e = graft.sources.Tables.embeddings(spark, dir)
      .select($"vec_id", $"label", $"embedding")
      .as[(Long, Int, Array[Float])].collect()
    val src = e.filter(_._2 < 5).map(t => t._1 -> t._3).toMap
    val tgt = e.filter(_._2 >= 5).map(t => t._1 -> t._3).toMap
    def cos9(a: Array[Float], b: Array[Float]): Long =
      math.floor(VectorOps.cosOf(a, b) * 1e9 + 0.5).toLong
    def top4(q: Array[Float], side: Map[Long, Array[Float]])
        : Seq[(Long, Long)] =
      side.toSeq.map { case (i, v) => (i, cos9(q, v)) }
        .sortBy { case (i, c) => (-c, i) }.take(4)
    val got = VectorOps.bitextMargin(spark, dir)
      .select($"src_id", $"tgt_id", $"margin", $"accepted")
      .as[(Long, Long, Double, Boolean)].collect()
    assert(got.nonEmpty)
    got.foreach { case (si, ti, m, acc) =>
      assert(src.contains(si) && si < 30)
      assert(tgt.contains(ti))
      val fwd = top4(src(si), tgt)
      val sf9 = fwd.map(_._2).sum
      // the reported pick must be the best-margin member of fwd
      val margins = fwd.map { case (ci, c9) =>
        val sb9 = top4(tgt(ci), src).map(_._2).sum
        (ci, math.floor(8.0 * c9 / (sf9 + sb9) * 1e6 + 0.5).toLong)
      }
      val best = margins.sortBy { case (ci, m6) => (-m6, ci) }.head
      assert(ti == best._1 && m == best._2.toDouble / 1e6,
        s"src $si: got ($ti, $m) want $best")
      assert(acc == (best._2 >= 1050000L))
    }
  }
}
