package graft

import org.apache.spark.sql.functions._

import graft.operators.{Analytics, Events}
import graft.sources.Tables

/** q260/q261/q262 — session path trigrams, grouped box-plot quartiles,
  * and the Nelson–Aalen repeat-purchase hazard: each checked against a
  * full driver-side brute recomputation at sf0.001 (the invariants the
  * hash gate can't state are exactly "the distributed plan equals the
  * obvious sequential algorithm"). */
class PathSurvivalSpec extends SparkSpec {
  import spark.implicits._

  val dir = sf("sf0.001")

  private lazy val rawEvents: Seq[(Long, Long, Long, String)] =
    Tables.events(spark, dir)
      .select(col("user_id"), unix_micros(col("ts")).as("us"),
        col("event_id"), col("event_type"))
      .as[(Long, Long, Long, String)].collect().toSeq

  test("q260: equals the sequential sessionize-then-count algorithm") {
    val gapUs = 30L * 60 * 1000000
    val trigrams = rawEvents.groupBy(_._1).values.flatMap { evs =>
      val sorted = evs.sortBy(e => (e._2, e._3))
      // session ids by running count of >30-min gaps
      val sess = sorted.zip(
        sorted.map(_._2).sliding(2).map(p =>
          if (p.length == 2 && p(1) - p(0) > gapUs) 1 else 0)
          .scanLeft(0)(_ + _).toSeq)
      sess.sliding(3).collect {
        case Seq((a, sa), (b, _), (c, sc)) if sa == sc =>
          (a._4, b._4, c._4)
      }
    }.toSeq
    val counts = trigrams.groupBy(identity).view.mapValues(_.size)
      .toSeq.map { case ((s1, s2, s3), n) => (s1, s2, s3, n.toLong) }
    val expected = counts
      .sortBy { case (s1, s2, s3, n) => (-n, s1, s2, s3) }
      .take(20).zipWithIndex
      .map { case ((s1, s2, s3, n), i) => (i + 1L, s1, s2, s3, n) }
    val got = Events.sessionPathTrigrams(spark, dir)
      .select("rank", "step1", "step2", "step3", "n")
      .as[(Long, String, String, String, Long)].collect().toSeq
    assert(got == expected)
    // shares are n / total over ALL trigrams (not just the top 20)
    val total = counts.map(_._4).sum
    val shares = Events.sessionPathTrigrams(spark, dir)
      .select("n", "share").as[(Long, Double)].collect()
    shares.foreach { case (n, s) =>
      assert(s == math.floor(n.toDouble / total * 1e6 + 0.5) / 1e6)
    }
  }

  test("q261: grouped quartiles and Tukey fences equal the " +
      "sequential per-brand computation") {
    val rows = Tables.lineitem(spark, dir)
      .join(broadcast(Tables.part(spark, dir)),
        col("l_partkey") === col("p_partkey"))
      .select(col("p_brand"),
        floor(col("l_extendedprice") * 100.0 + 0.5).cast("long"))
      .as[(String, Long)].collect().toSeq
    val expected = rows.groupBy(_._1).toSeq.map { case (brand, vs) =>
      val cents = vs.map(_._2).sorted
      val n = cents.length.toLong
      def qu(p: Int, of: Int): Long =
        cents(((n * p + of - 1) / of - 1).toInt) // smallest c: rank*of >= n*p
      val (q1, q2, q3) = (qu(1, 4), qu(1, 2), qu(3, 4))
      val nOut = cents.count(c =>
        c * 2 < q1 * 2 - (q3 - q1) * 3 || c * 2 > q3 * 2 + (q3 - q1) * 3)
      (brand, n, q1 / 100.0, q2 / 100.0, q3 / 100.0,
        (q3 - q1) / 100.0, nOut.toLong)
    }.sortBy(_._1)
    val got = Analytics.brandPriceBoxplot(spark, dir)
      .as[(String, Long, Double, Double, Double, Double, Long)]
      .collect().toSeq
    assert(got == expected)
  }

  test("q262: Nelson-Aalen table equals the sequential estimator; " +
      "risk sets shrink, cumulative hazard grows") {
    val dayUs = 86400000000L
    val purchases = rawEvents.filter(_._4 == "purchase")
    val endUs = purchases.map(_._2).max
    val spans = purchases.groupBy(_._1).values.map { evs =>
      val ts = evs.sortBy(e => (e._2, e._3)).map(_._2)
      if (ts.length >= 2) (Some((ts(1) - ts(0)) / dayUs), None)
      else (None, Some((endUs - ts(0)) / dayUs))
    }.toSeq
    val endedAt = spans.groupBy { case (e, c) => e.getOrElse(c.get) }
      .view.mapValues(_.size.toLong).toMap
    val days = endedAt.keys.toSeq.sorted
    var atRisk = spans.size.toLong
    var cumNano = 0L
    val expected = days.flatMap { d =>
      val di = spans.count(_._1.contains(d)).toLong
      val row = if (di > 0) {
        cumNano += di * 1000000000L / atRisk
        Some((d, atRisk, di,
          math.floor(di.toDouble / atRisk * 1e6 + 0.5) / 1e6,
          cumNano.toDouble / 1e9))
      } else None
      atRisk -= endedAt(d)
      row
    }
    val got = Analytics.repeatPurchaseHazard(spark, dir)
      .as[(Long, Long, Long, Double, Double)].collect().toSeq
    assert(got == expected)
    // monotonicity invariants
    got.sliding(2).foreach {
      case Seq(a, b) =>
        assert(a._2 >= b._2, "risk set must shrink over time")
        assert(a._5 <= b._5, "cumulative hazard must not decrease")
      case _ =>
    }
  }

  test("q263: Wilson bounds bracket the point estimate inside [0,1] " +
      "and equal the sequential formula") {
    val got = Analytics.weeklyConversionWilson(spark, dir)
      .as[(java.sql.Date, Long, Long, Double, Double, Double)]
      .collect().toSeq
    assert(got.nonEmpty)
    def r6(x: Double) = math.floor(x * 1e6 + 0.5) / 1e6
    got.foreach { case (_, nu, nb, conv, lo, hi) =>
      val n = nu.toDouble; val k = nb.toDouble
      val z = 1.96; val z2 = 1.96 * 1.96
      val phat = k / n
      val denom = 1.0 + z2 / n
      val center = (phat + z2 / (2.0 * n)) / denom
      val half = z * math.sqrt(phat * (1.0 - phat) / n
        + z2 / (4.0 * n * n)) / denom
      assert(conv == r6(phat))
      assert(lo == r6(center - half) && hi == r6(center + half))
      assert(lo >= 0.0 - 1e-9 && hi <= 1.0 + 1e-9,
        "Wilson stays inside the unit interval")
      assert(lo <= conv && conv <= hi)
    }
  }

  test("q265: stage latencies equal the sequential first-touch " +
      "pair computation") {
    val stages = Seq("signup", "view", "click", "purchase")
    val firsts = rawEvents.groupBy(_._1).values.map { evs =>
      stages.map(t => evs.filter(_._4 == t) match {
        case e if e.nonEmpty => Some(e.map(_._2).min)
        case _ => None
      })
    }.toSeq
    val pairNames = Seq("signup_to_view", "view_to_click",
      "click_to_purchase")
    val expected = pairNames.zipWithIndex.map { case (name, i) =>
      val gaps = firsts.flatMap { f =>
        for (a <- f(i); b <- f(i + 1) if b >= a) yield b - a
      }.sorted
      val hours = gaps.map(_ / 3600000000L)
      val n = hours.length
      def q(p: Int, of: Int) = hours.distinct.sorted.find(h =>
        hours.count(_ <= h).toLong * of >= n.toLong * p).get
      val mean = math.floor(gaps.map(BigInt(_)).sum.toDouble /
        n / 3.6e9 * 1e6 + 0.5) / 1e6
      (name, n.toLong, q(1, 2), q(9, 10), mean)
    }.sortBy(_._1)
    val got = Analytics.funnelStageLatency(spark, dir)
      .as[(String, Long, Long, Long, Double)].collect().toSeq
    assert(got == expected)
  }

  test("q266: the like-for-like index equals the sequential " +
      "comparable-set computation and coverage is in (0, 1]") {
    val rows = Tables.lineitem(spark, dir)
      .select(trunc(col("l_shipdate"), "month").cast("string"),
        col("l_partkey"),
        floor(col("l_extendedprice") * 100.0 + 0.5).cast("long"))
      .as[(String, Long, Long)].collect().toSeq
    val byMp = rows.groupBy(r => (r._1, r._2)).view
      .mapValues(_.map(_._3).sum).toMap
    def mi(m: String) = m.substring(0, 4).toInt * 12 +
      m.substring(5, 7).toInt
    val months = byMp.keys.map(_._1).toSeq.distinct.sorted
    val expected = months.flatMap { m =>
      val cur = byMp.filter(_._1._1 == m)
      // previous OBSERVED month per part must also be calendar-adjacent
      val prevObs = byMp.keys.filter(k => mi(k._1) < mi(m))
        .groupBy(_._2).view.mapValues(_.map(_._1).maxBy(mi)).toMap
      val comp = cur.keys.filter(k =>
        prevObs.get(k._2).exists(pm => mi(pm) == mi(m) - 1)).toSeq
      if (comp.isEmpty) None else {
        val tot = cur.values.sum
        val cc = comp.map(k => byMp(k)).sum
        val cp = comp.map(k => byMp((prevObs(k._2), k._2))).sum
        def r6(x: Double) = math.floor(x * 1e6 + 0.5) / 1e6
        Some((m, cur.size.toLong, comp.size.toLong, tot / 100.0,
          r6(cc.toDouble / cp), r6(cc.toDouble / tot)))
      }
    }
    val got = Analytics.comparableRevenueIndex(spark, dir)
      .select(col("month").cast("string"), col("n_parts"),
        col("n_comparable"), col("revenue"), col("index_mom"),
        col("coverage"))
      .as[(String, Long, Long, Double, Double, Double)].collect().toSeq
    assert(got == expected)
    got.foreach { r => assert(r._6 > 0.0 && r._6 <= 1.0) }
  }

  test("q267: top movers equal the sequential per-part OLS ranking") {
    val li = Tables.lineitem(spark, dir)
      .select(col("l_partkey"), to_date(col("l_shipdate")).cast("string"),
        floor(col("l_quantity") * 100.0 + 0.5).cast("long"))
      .as[(Long, String, Long)].collect().toSeq
    val d0 = li.map(_._2).min
    def days(d: String) = java.time.temporal.ChronoUnit.DAYS.between(
      java.time.LocalDate.parse(d0), java.time.LocalDate.parse(d))
    val slopes = li.groupBy(_._1).toSeq.flatMap { case (pk, rs) =>
      val xy = rs.map(r => (days(r._2), r._3))
      val n = xy.length.toLong
      val sx = xy.map(_._1).sum; val sy = xy.map(_._2).sum
      val sxy = xy.map(p => p._1 * p._2).sum
      val sxx = xy.map(p => p._1 * p._1).sum
      val den = n * sxx - sx * sx
      if (n >= 2 && den > 0) {
        val s = math.floor((n * sxy - sx * sy).toDouble * 30.0 /
          den.toDouble / 100.0 * 1e6 + 0.5) / 1e6
        Some((pk, s))
      } else None
    }
    val expected = slopes.sortBy { case (pk, s) => (-s, pk) }.take(20)
      .zipWithIndex.map { case ((pk, s), i) => (i + 1L, pk, s) }
    val got = Analytics.demandTrendMovers(spark, dir)
      .select("rank", "partkey", "slope_30d")
      .as[(Long, Long, Double)].collect().toSeq
    assert(got == expected)
  }

  private lazy val segCents: (Seq[Long], Seq[Long]) = {
    val rows = Tables.orders(spark, dir)
      .join(broadcast(Tables.customer(spark, dir)),
        col("o_custkey") === col("c_custkey"))
      .filter(col("c_mktsegment").isin("BUILDING", "MACHINERY"))
      .select((col("c_mktsegment") === "BUILDING"),
        floor(col("o_totalprice") * 100.0 + 0.5).cast("long"))
      .as[(Boolean, Long)].collect().toSeq
    (rows.filter(_._1).map(_._2), rows.filterNot(_._1).map(_._2))
  }

  test("q268: U and z equal the sequential midrank computation") {
    val (a, b) = segCents
    val n1 = a.length.toLong; val n2 = b.length.toLong
    val all = (a.map((_, true)) ++ b.map((_, false))).sortBy(_._1)
    // average ranks per tied value group
    val r1 = all.zipWithIndex.groupBy(_._1._1).toSeq.map {
      case (_, g) =>
        val mid = g.map(_._2 + 1L).sum.toDouble / g.length
        mid * g.count(_._1._2)
    }.sum
    val u1 = r1 - n1 * (n1 + 1) / 2.0
    val ties = all.groupBy(_._1).values
      .map(g => { val t = g.size.toLong; t * t * t - t }).sum
    val nn = (n1 + n2).toDouble
    val varU = n1.toDouble * n2 / 12.0 *
      ((nn + 1.0) - ties / (nn * (nn - 1.0)))
    val z = (u1 - n1.toDouble * n2 / 2.0) / math.sqrt(varU)
    val got = Analytics.rankSumTest(spark, dir)
      .as[(Long, Long, Double, Double, Double, Boolean)].head()
    assert(got._1 == n1 && got._2 == n2)
    assert(got._3 == u1, "U must be exact")
    assert(math.abs(got._4 - u1 / (n1.toDouble * n2)) < 2e-6)
    assert(math.abs(got._5 - z) < 2e-6)
    assert(got._6 == (math.abs(z) > 1.96))
  }

  test("q269: D equals the sequential max CDF gap exactly") {
    val (a, b) = segCents
    val n1 = a.length.toLong; val n2 = b.length.toLong
    val values = (a ++ b).distinct.sorted
    val dx = values.map { v =>
      val cum1 = a.count(_ <= v).toLong
      val cum2 = b.count(_ <= v).toLong
      math.abs(cum1 * n2 - cum2 * n1)
    }.max
    val got = Analytics.ksTest(spark, dir)
      .as[(Long, Long, Double, Double, Boolean)].head()
    assert(got._1 == n1 && got._2 == n2)
    def r6(x: Double) = math.floor(x * 1e6 + 0.5) / 1e6
    assert(got._3 == r6(dx.toDouble / (n1.toDouble * n2.toDouble)),
      "D must be the exact integer argmax ratio")
    val crit = 1.358 * math.sqrt((n1.toDouble + n2.toDouble) /
      (n1.toDouble * n2.toDouble))
    assert(math.abs(got._4 - crit) < 2e-6)
  }

  test("q270: LTV telescopes per cohort and conserves total revenue") {
    val g = Analytics.cohortLtv(spark, dir).cache()
    val rows = g.select("cohort_week", "weeks_since", "n_users",
        "revenue", "cum_revenue", "ltv_per_user")
      .as[(java.sql.Date, Int, Long, Double, Double, Double)]
      .collect().toSeq
    rows.groupBy(_._1).values.foreach { cs =>
      val seq = cs.sortBy(_._2)
      var run = 0.0
      seq.foreach { r =>
        run += r._4
        assert(math.abs(r._5 - run) < 1e-6,
          "cum_revenue must be the running sum of revenue")
        val ltv = math.floor(r._5 / r._3 * 1e6 + 0.5) / 1e6
        assert(math.abs(r._6 - ltv) < 2e-6)
      }
    }
    // conservation: last cum per cohort sums to total purchase revenue
    val total = Tables.events(spark, dir)
      .filter(col("event_type") === "purchase")
      .agg(sum(floor(col("value") * 100.0 + 0.5).cast("long")))
      .as[Long].head()
    val lastSum = rows.groupBy(_._1).values
      .map(_.maxBy(_._2)._5).sum
    assert(math.abs(lastSum - total / 100.0) < 1e-4)
    g.unpersist()
  }

  test("q271: ABC classes partition the parts with contiguous ranks " +
      "and match the sequential classification") {
    val rev = Tables.lineitem(spark, dir)
      .groupBy("l_partkey")
      .agg(sum(floor(col("l_extendedprice") * 100.0 + 0.5).cast("long"))
        .as("cents"))
      .as[(Long, Long)].collect().toSeq
    val sorted = rev.sortBy { case (pk, c) => (-c, pk) }
    val tot = rev.map(_._2).sum
    var cum = 0L
    val classed = sorted.map { case (_, c) =>
      cum += c
      if (cum * 5 <= tot * 4) "A"
      else if (cum * 20 <= tot * 19) "B" else "C"
    }
    val expected = classed.zip(sorted).groupBy(_._1).toSeq
      .map { case (cl, xs) =>
        (cl, xs.size.toLong, xs.map(_._2._2).sum) }
      .sortBy(_._1)
    val got = Analytics.abcClassification(spark, dir)
      .select("abc_class", "n_parts", "revenue", "rank_from", "rank_to")
      .as[(String, Long, Double, Long, Long)].collect().toSeq
    assert(got.map(t => (t._1, t._2)) ==
      expected.map(t => (t._1, t._2)))
    got.zip(expected).foreach { case (g2, e) =>
      assert(math.abs(g2._3 - e._3 / 100.0) < 1e-6)
    }
    // contiguous, complete rank coverage
    val spans = got.sortBy(_._4)
    assert(spans.head._4 == 1L)
    spans.sliding(2).foreach {
      case Seq(a, b) => assert(b._4 == a._5 + 1)
      case _ =>
    }
    assert(spans.last._5 == rev.size.toLong)
  }

  test("q272: dispersion equals the sequential power-sum computation") {
    val ks = Tables.lineitem(spark, dir)
      .groupBy("l_orderkey").agg(count(lit(1)).as("k"))
      .join(Tables.orders(spark, dir),
        col("l_orderkey") === col("o_orderkey"))
      .select(col("o_orderpriority"), col("k"))
      .as[(String, Long)].collect().toSeq
    def r6(x: Double) = math.floor(x * 1e6 + 0.5) / 1e6
    val expected = ks.groupBy(_._1).toSeq.map { case (p, xs) =>
      val n = xs.size.toLong
      val sk = xs.map(_._2).sum
      val skk = xs.map(x => x._2 * x._2).sum
      val mean = sk.toDouble / n
      val vr = (n * skk - sk * sk).toDouble / (n.toDouble * (n - 1.0))
      (p, n, r6(mean), r6(vr), r6(vr / mean), vr / mean > 1.0)
    }.sortBy(_._1)
    val got = Analytics.basketDispersion(spark, dir)
      .as[(String, Long, Double, Double, Double, Boolean)]
      .collect().toSeq
    assert(got == expected)
  }

  private lazy val rawOrders: Seq[(Long, String, Long)] =
    Tables.orders(spark, dir)
      .select(col("o_custkey"), to_date(col("o_orderdate")).cast("string"),
        floor(col("o_totalprice") * 100.0 + 0.5).cast("long"))
      .as[(Long, String, Long)].collect().toSeq

  test("q273: the decomposition equals the sequential first-month " +
      "split and conserves revenue") {
    val om = rawOrders.map { case (ck, d, c) => (ck, d.substring(0, 7), c) }
    val firstM = om.groupBy(_._1).view.mapValues(_.map(_._2).min).toMap
    def r6(x: Double) = math.floor(x * 1e6 + 0.5) / 1e6
    val expected = om.groupBy(_._2).toSeq.map { case (m, os) =>
      val newOs = os.filter(o => firstM(o._1) == m)
      val tot = os.map(_._3).sum
      val nw = newOs.map(_._3).sum
      (m, os.size.toLong, os.map(_._1).distinct.size.toLong,
        newOs.map(_._1).distinct.size.toLong,
        tot / 100.0, nw / 100.0, r6(nw.toDouble / tot))
    }.sortBy(_._1)
    val got = Analytics.newVsReturning(spark, dir)
      .select(col("month").cast("string").substr(0, 7), col("n_orders"),
        col("n_customers"), col("n_new_customers"), col("revenue"),
        col("new_revenue"), col("new_share"))
      .as[(String, Long, Long, Long, Double, Double, Double)]
      .collect().toSeq
    assert(got == expected)
    // in a customer's first month every order is new: per-month new
    // counts can never exceed totals, and the earliest month is all-new
    assert(got.head._6 == got.head._5 && got.head._7 == 1.0)
  }

  test("q274: entry-type conversion equals the sequential " +
      "sessionization with the q263 Wilson tree") {
    val gapUs = 30L * 60 * 1000000
    val sessions = rawEvents.groupBy(_._1).values.flatMap { evs =>
      val sorted = evs.sortBy(e => (e._2, e._3))
      val sessIds = sorted.map(_._2).sliding(2).map(p =>
        if (p.length == 2 && p(1) - p(0) > gapUs) 1 else 0)
        .scanLeft(0)(_ + _).toSeq
      sorted.zip(sessIds).groupBy(_._2).values.map { g =>
        val inOrder = g.map(_._1)
        (inOrder.head._4, inOrder.exists(_._4 == "purchase"))
      }
    }.toSeq
    def r6(x: Double) = math.floor(x * 1e6 + 0.5) / 1e6
    val expected = sessions.groupBy(_._1).toSeq.map { case (t, ss) =>
      val n = ss.size.toLong
      val k = ss.count(_._2).toLong
      val nd = n.toDouble; val kd = k.toDouble
      val z2 = 1.96 * 1.96
      val phat = kd / nd
      val denom = 1.0 + z2 / nd
      val center = (phat + z2 / (2.0 * nd)) / denom
      val half = 1.96 * math.sqrt(phat * (1.0 - phat) / nd
        + z2 / (4.0 * nd * nd)) / denom
      (t, n, k, r6(phat), r6(center - half), r6(center + half))
    }.sortBy(_._1)
    val got = Analytics.entryTypeConversion(spark, dir)
      .as[(String, Long, Long, Double, Double, Double)].collect().toSeq
    assert(got == expected)
  }

  test("q275: the migration matrix equals the sequential rubric " +
      "scoring and accounts for every customer once") {
    val days = rawOrders.map(_._2).sorted
    val d0 = java.time.LocalDate.parse(days.head)
    val d1 = java.time.LocalDate.parse(days.last)
    val span = java.time.temporal.ChronoUnit.DAYS.between(d0, d1)
    val spend = rawOrders.groupBy { case (ck, d, _) =>
      val off = java.time.temporal.ChronoUnit.DAYS.between(
        d0, java.time.LocalDate.parse(d))
      (ck, if (off * 2 <= span) 1 else 2)
    }.view.mapValues(_.map(_._3).sum).toSeq
    val h1 = spend.filter(_._1._2 == 1).map(_._2).sorted
    def cut(p: Int, of: Int): Long =
      h1(((h1.length.toLong * p + of - 1) / of - 1).toInt)
    val (q1, q2, q3) = (cut(1, 4), cut(1, 2), cut(3, 4))
    def tier(c: Long) =
      if (c <= q1) 1 else if (c <= q2) 2 else if (c <= q3) 3 else 4
    val byCust = spend.groupBy(_._1._1)
    val cells = byCust.values.map { ss =>
      val m = ss.map { case ((_, h), c) => h -> tier(c) }.toMap
      (m.getOrElse(1, 0), m.getOrElse(2, 0))
    }.toSeq
    val tot = cells.size.toLong
    def r6(x: Double) = math.floor(x * 1e6 + 0.5) / 1e6
    val expected = cells.groupBy(identity).toSeq.map { case ((a, b), xs) =>
      (a, b, xs.size.toLong, r6(xs.size.toDouble / tot))
    }.sortBy(t => (t._1, t._2))
    val got = Analytics.spendQuartileMigration(spark, dir)
      .as[(Int, Int, Long, Double)].collect().toSeq
    assert(got == expected)
    assert(got.map(_._3).sum == tot, "every customer exactly once")
  }

  test("q276: ordered-funnel counts equal the sequential " +
      "first-after-previous walk and never exceed unordered reach") {
    val stages = Seq("signup", "view", "click", "purchase")
    val byUser = rawEvents.groupBy(_._1)
    val reach = Array.fill(4)(0L)
    byUser.values.foreach { evs =>
      var prevT = Long.MinValue
      var stageIdx = 0
      var continue = true
      while (stageIdx < 4 && continue) {
        val cand = evs.filter(e => e._4 == stages(stageIdx) &&
          (if (stageIdx == 0) true else e._2 > prevT))
        if (cand.isEmpty) continue = false
        else {
          prevT = cand.map(_._2).min
          reach(stageIdx) += 1
          stageIdx += 1
        }
      }
    }
    val got = Events.orderedFunnel(spark, dir)
      .select("stage_rank", "n_reached")
      .as[(Int, Long)].collect().toMap
    (1 to 4).foreach { r => assert(got(r) == reach(r - 1)) }
    // ordered reach is monotone non-increasing
    (2 to 4).foreach { r => assert(got(r) <= got(r - 1)) }
    // and bounded by the unordered per-stage user counts
    val unordered = rawEvents.groupBy(_._4).view
      .mapValues(_.map(_._1).distinct.size.toLong).toMap
    stages.zipWithIndex.foreach { case (s, i) =>
      assert(got(i + 1) <= unordered.getOrElse(s, 0L))
    }
  }

  test("q277: the windowed funnel equals the sequential walk and is " +
      "dominated by the unwindowed q276") {
    val stages = Seq("signup", "view", "click", "purchase")
    val winUs = 72L * 3600000000L
    val reach = Array.fill(4)(0L)
    rawEvents.groupBy(_._1).values.foreach { evs =>
      var prevT = Long.MinValue
      var i = 0
      var go = true
      while (i < 4 && go) {
        val cand = evs.filter(e => e._4 == stages(i) &&
          (i == 0 || (e._2 > prevT && e._2 <= prevT + winUs)))
        if (cand.isEmpty) go = false
        else { prevT = cand.map(_._2).min; reach(i) += 1; i += 1 }
      }
    }
    val got = Events.windowedFunnel(spark, dir)
      .select("stage_rank", "n_reached").as[(Int, Long)].collect().toMap
    (1 to 4).foreach { r => assert(got(r) == reach(r - 1)) }
    val unwindowed = Events.orderedFunnel(spark, dir)
      .select("stage_rank", "n_reached").as[(Int, Long)].collect().toMap
    (1 to 4).foreach { r => assert(got(r) <= unwindowed(r)) }
  }

  test("q278: heatmap cells equal the sequential count and cover " +
      "every event exactly once") {
    val got = Events.trafficHeatmap(spark, dir)
      .select("dow", "hour", "n_events")
      .as[(Int, Int, Long)].collect().toSeq
    assert(got.map(_._3).sum == rawEvents.size.toLong)
    // recompute a sample cell sequentially via the same 0=Sunday math
    val byCell = Tables.events(spark, dir)
      .select((dayofweek(col("ts")) - 1), hour(col("ts")))
      .as[(Int, Int)].collect()
      .groupBy(identity).view.mapValues(_.length.toLong).toMap
    got.foreach { case (d, h, n) => assert(byCell((d, h)) == n) }
    assert(got.forall(c => c._1 >= 0 && c._1 <= 6 &&
      c._2 >= 0 && c._2 <= 23))
  }

  test("q279: in-row triple expansion equals the sequential " +
      "3-subset count over distinct baskets") {
    val ob = Tables.lineitem(spark, dir)
      .join(broadcast(Tables.part(spark, dir)),
        col("l_partkey") === col("p_partkey"))
      .select(col("l_orderkey"), col("p_brand")).distinct()
      .as[(Long, String)].collect().toSeq
    val counts = scala.collection.mutable.Map
      .empty[(String, String, String), Long]
    ob.groupBy(_._1).values.foreach { rows =>
      val bs = rows.map(_._2).distinct.sorted
      for {
        i <- bs.indices; j <- (i + 1) until bs.size
        k <- (j + 1) until bs.size
      } {
        val key = (bs(i), bs(j), bs(k))
        counts(key) = counts.getOrElse(key, 0L) + 1
      }
    }
    val expected = counts.toSeq.filter(_._2 >= 4)
      .map { case ((a, b, c), s) => (a, b, c, s) }
      .sortBy(t => (t._1, t._2, t._3))
    val got = Analytics.brandTriples(spark, dir)
      .as[(String, String, String, Long)].collect().toSeq
    assert(got == expected)
  }

  test("q280: transition top-20 equals the sequential rep-brand " +
      "lead chain") {
    val rep = Tables.lineitem(spark, dir)
      .join(broadcast(Tables.part(spark, dir)),
        col("l_partkey") === col("p_partkey"))
      .select(col("l_orderkey"), col("p_brand"),
        floor(col("l_extendedprice") * 100.0 + 0.5).cast("long"),
        col("l_partkey"))
      .as[(Long, String, Long, Long)].collect().toSeq
      .groupBy(_._1).view.mapValues(rs =>
        rs.minBy(r => (-r._3, r._4))._2).toMap
    val rows = Tables.orders(spark, dir)
      .select(col("o_custkey"), to_date(col("o_orderdate")).cast("string"),
        col("o_orderkey"))
      .as[(Long, String, Long)].collect().toSeq
      .filter(r => rep.contains(r._3))
    val trans = rows.groupBy(_._1).values.flatMap { os =>
      val seq = os.sortBy(o => (o._2, o._3)).map(o => rep(o._3))
      seq.zip(seq.tail)
    }.toSeq
    val counts = trans.groupBy(identity).view.mapValues(_.size.toLong)
    val expected = counts.toSeq
      .map { case ((f, t), n) => (f, t, n) }
      .sortBy { case (f, t, n) => (-n, f, t) }.take(20).zipWithIndex
      .map { case ((f, t, n), i) => (i + 1L, f, t, n) }
    val got = Analytics.brandTransitions(spark, dir)
      .as[(Long, String, String, Long)].collect().toSeq
    assert(got == expected)
  }

  test("q281: chi-square equals the sequential contingency " +
      "computation; V sits in [0, 1]") {
    val cells = Tables.orders(spark, dir)
      .join(broadcast(Tables.customer(spark, dir)),
        col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_mktsegment"), col("o_orderpriority"))
      .agg(count(lit(1)).as("o"))
      .as[(String, String, Long)].collect().toSeq
    val n = cells.map(_._3).sum
    val rT = cells.groupBy(_._1).view.mapValues(_.map(_._3).sum).toMap
    val cT = cells.groupBy(_._2).view.mapValues(_.map(_._3).sum).toMap
    val chiNano = cells.map { case (s, p, o) =>
      val diff = (o * n - rT(s) * cT(p)).toDouble
      math.floor(diff * diff /
        (n.toDouble * rT(s).toDouble * cT(p).toDouble) * 1.0e9).toLong
    }.sum
    def r6(x: Double) = math.floor(x * 1e6 + 0.5) / 1e6
    val chi2 = chiNano.toDouble / 1.0e9
    val nr = rT.size.toLong; val nc = cT.size.toLong
    val v = math.sqrt(chi2 / (n * math.min(nr - 1, nc - 1)).toDouble)
    val got = Analytics.chiSquareIndependence(spark, dir)
      .as[(Long, Long, Long, Long, Double, Double, Option[Boolean])]
      .head()
    assert(got._1 == n && got._2 == nr && got._3 == nc)
    assert(got._4 == (nr - 1) * (nc - 1))
    assert(got._5 == r6(chi2))
    assert(got._6 == r6(v))
    assert(got._5 >= 0.0 && got._6 >= 0.0 && got._6 <= 1.0)
    if (got._4 == 16) assert(got._7.contains(chi2 > 26.296))
  }

  test("q282: affinity top-20 equals the sequential lift ranking") {
    val cells = Tables.lineitem(spark, dir)
      .join(Tables.orders(spark, dir),
        col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(Tables.customer(spark, dir)),
        col("o_custkey") === col("c_custkey"))
      .join(broadcast(Tables.part(spark, dir)),
        col("l_partkey") === col("p_partkey"))
      .groupBy(col("c_mktsegment"), col("p_brand"))
      .agg(count(lit(1)).as("o"))
      .as[(String, String, Long)].collect().toSeq
    val n = cells.map(_._3).sum
    val rT = cells.groupBy(_._1).view.mapValues(_.map(_._3).sum).toMap
    val cT = cells.groupBy(_._2).view.mapValues(_.map(_._3).sum).toMap
    def r6(x: Double) = math.floor(x * 1e6 + 0.5) / 1e6
    val expected = cells.filter(_._3 >= 50).map { case (s, b, o) =>
      (s, b, o, r6(o.toDouble * n.toDouble /
        (rT(s).toDouble * cT(b).toDouble)))
    }.sortBy { case (s, b, _, l) => (-l, s, b) }.take(20).zipWithIndex
      .map { case ((s, b, o, l), i) => (i + 1L, s, b, o, l) }
    val got = Analytics.segmentBrandAffinity(spark, dir)
      .as[(Long, String, String, Long, Double)].collect().toSeq
    assert(got == expected)
  }

  test("q283: log2 buckets are exact bit lengths and cover every " +
      "order once") {
    val cents = rawOrders.map(_._3).filter(_ > 0)
    val byBucket = cents.groupBy(c => 63 - java.lang.Long
      .numberOfLeadingZeros(c)).view.mapValues(v =>
        (v.size.toLong, v.sum)).toMap
    val got = Analytics.valueHistogramLog2(spark, dir)
      .as[(Long, Double, Long, Double, Double)].collect().toSeq
    assert(got.map(_._3).sum == cents.size.toLong)
    got.foreach { case (b, lo, nn, rev, _) =>
      val (en, es) = byBucket(b.toInt)
      assert(nn == en && rev == es / 100.0)
      assert(lo == (1L << b).toDouble / 100.0)
    }
    assert(byBucket.keySet == got.map(_._1.toInt).toSet)
  }

  test("q284: cohort repeat rates equal the sequential split with " +
      "the q263 Wilson tree") {
    val byCust = rawOrders.groupBy(_._1)
    def r6(x: Double) = math.floor(x * 1e6 + 0.5) / 1e6
    val expected = byCust.values.map { os =>
      (os.map(_._2.substring(0, 7)).min, os.size >= 2)
    }.toSeq.groupBy(_._1).toSeq.map { case (m, cs) =>
      val n = cs.size.toLong; val k = cs.count(_._2).toLong
      val nd = n.toDouble; val kd = k.toDouble
      val z2 = 1.96 * 1.96
      val phat = kd / nd
      val denom = 1.0 + z2 / nd
      val center = (phat + z2 / (2.0 * nd)) / denom
      val half = 1.96 * math.sqrt(phat * (1.0 - phat) / nd
        + z2 / (4.0 * nd * nd)) / denom
      (m, n, k, r6(phat), r6(center - half), r6(center + half))
    }.sortBy(_._1)
    val got = Analytics.cohortRepeatRate(spark, dir)
      .select(col("cohort_month").cast("string").substr(0, 7),
        col("n_customers"), col("n_repeaters"), col("repeat_rate"),
        col("wilson_lo"), col("wilson_hi"))
      .as[(String, Long, Long, Double, Double, Double)]
      .collect().toSeq
    assert(got == expected)
  }

  test("q285: discount bands cover every lineitem once with exact " +
      "average quantities") {
    val rows = Tables.lineitem(spark, dir)
      .select(floor(col("l_discount") * 100.0 + 0.5).cast("long"),
        floor(col("l_quantity") * 100.0 + 0.5).cast("long"))
      .as[(Long, Long)].collect().toSeq
    def r6(x: Double) = math.floor(x * 1e6 + 0.5) / 1e6
    val got = Analytics.discountResponse(spark, dir)
      .select("pct", "n_lines", "avg_qty")
      .as[(Long, Long, Double)].collect().toSeq
    assert(got.map(_._2).sum == rows.size.toLong)
    val byPct = rows.groupBy(_._1)
    got.foreach { case (p, n, avg) =>
      val xs = byPct(p)
      assert(n == xs.size.toLong)
      assert(avg == r6(xs.map(_._2).sum.toDouble / 100.0 / xs.size))
    }
  }

  test("q264: shares sum to 1 per month, ranks are dense, and the " +
      "delta/rank-move chain matches the previous observed month") {
    val g = Analytics.brandShareShift(spark, dir).cache()
    g.groupBy("month").agg(sum("share").as("s"))
      .as[(java.sql.Date, Double)].collect()
      .foreach { case (m, s) =>
        assert(math.abs(s - 1.0) < 1e-4, s"$m shares sum to $s") }
    assert(g.groupBy("month")
      .agg(count(lit(1)).as("k"), max("rank_in_month").as("mx"))
      .filter(col("mx") =!= col("k")).count() == 0)
    // recompute the lag chain sequentially
    val rows = g.select("month", "brand", "share", "rank_in_month",
        "share_delta", "rank_move")
      .as[(java.sql.Date, String, Double, Long,
        Option[Double], Option[Long])].collect().toSeq
    rows.groupBy(_._2).values.foreach { bs =>
      val seq = bs.sortBy(_._1.getTime)
      assert(seq.head._5.isEmpty && seq.head._6.isEmpty)
      seq.sliding(2).foreach {
        case Seq(prev, cur) =>
          assert(cur._6.contains(prev._4 - cur._4))
          // deltas were rounded from unrounded shares: tolerance 2e-6
          assert(math.abs(cur._5.get - (cur._3 - prev._3)) < 2e-6)
        case _ =>
      }
    }
    g.unpersist()
  }
}
