package graft

import org.apache.spark.sql.functions._

import graft.operators.{Analytics, Privacy}
import graft.sources.Tables

/** q248/q249/q250 — the release-diversity audit, the item-item
  * recommender, and the EWMA forecaster: invariants the hash gate
  * can't state (symmetry, bound checks, independent recomputation). */
class RecsForecastSpec extends SparkSpec {
  import spark.implicits._

  val dir = sf("sf0.001")

  test("q248: accounting is total, status matches l, mode bounds hold") {
    val a = Privacy.lDiversity(spark, dir).cache()
    // every customer lands in exactly one cell
    assert(a.agg(sum("n")).as[Long].head() ==
      Tables.customer(spark, dir).count())
    // status is exactly the l >= 3 predicate
    assert(a.filter((col("l_distinct") >= 3) =!=
      (col("status") === "diverse")).count() == 0)
    // the modal band can't exceed the cell, nor l the cell size
    assert(a.filter(col("max_f") > col("n")
      || col("l_distinct") > col("n")).count() == 0)
    // top_share is the adversary's confidence: in (0, 1]
    assert(a.filter(col("top_share") <= 0.0
      || col("top_share") > 1.0).count() == 0)
    a.unpersist()
  }

  test("q249: cosine is symmetric, bounded, and matches a brute " +
      "recomputation on sampled pairs") {
    val r = Analytics.itemItemRecs(spark, dir).cache()
    assert(r.filter(col("cosine") <= 0.0 || col("cosine") > 1.0)
      .count() == 0)
    assert(r.filter(col("co") < 2).count() == 0)
    // per-item ranks are 1..k dense
    val badRank = r.groupBy("part_id")
      .agg(count(lit(1)).as("k"), max("rank").as("mx"), min("rank").as("mn"))
      .filter(col("mx") =!= col("k") || col("mn") =!= 1)
    assert(badRank.count() == 0)
    // brute recompute: for every emitted (u, v), cosine must equal
    // |orders(u) ∩ orders(v)| / sqrt(|orders(u)|·|orders(v)|)
    val bo = Tables.lineitem(spark, dir)
      .select(col("l_orderkey").as("okey"), col("l_partkey").as("id"))
      .distinct().cache()
    val deg = bo.groupBy("id").agg(count(lit(1)).as("d"))
    val brute = r.select(col("part_id").as("u"), col("rec_part_id").as("v"),
        col("co"), col("cosine"))
      .join(bo.select(col("id").as("u"), col("okey")), "u")
      .join(bo.select(col("id").as("v"), col("okey")), Seq("v", "okey"))
      .groupBy("u", "v", "co", "cosine").agg(count(lit(1)).as("co2"))
    assert(brute.filter(col("co") =!= col("co2")).count() == 0)
    val check = brute.join(deg.select(col("id").as("u"), col("d").as("du")), "u")
      .join(deg.select(col("id").as("v"), col("d").as("dv")), "v")
      .withColumn("c2", graft.util.Portable.val6(col("co2").cast("double")
        / sqrt((col("du") * col("dv")).cast("double"))))
      .filter(col("c2") =!= col("cosine"))
    assert(check.count() == 0, "cosine mismatch vs brute recomputation")
    // symmetry of the underlying similarity: where BOTH directions
    // survive the top-k cut, the cosines agree
    val sym = r.select(col("part_id").as("u"), col("rec_part_id").as("v"),
        col("cosine").as("cuv"))
      .join(r.select(col("rec_part_id").as("u"), col("part_id").as("v"),
        col("cosine").as("cvu")), Seq("u", "v"))
      .filter(col("cuv") =!= col("cvu"))
    assert(sym.count() == 0)
    bo.unpersist(); r.unpersist()
  }

  test("q252: CUPED preserves the pooled mean exactly, arms are a " +
      "balanced deterministic split") {
    val r = Analytics.cupedExperiment(spark, dir)
      .select(col("arm"), col("n"), col("post_mean"),
        col("adj_post_mean"), col("var_ratio"))
      .as[(String, Long, Double, Double, Double)].collect()
    assert(r.map(_._1).sorted.toSeq == Seq("control", "treatment"))
    val total = r.map(_._2).sum
    // the hash split is unbiased: neither arm under 40% on this fixture
    r.foreach { case (arm, n, _, _, ratio) =>
      assert(n > total * 0.4, s"$arm badly unbalanced: $n of $total")
      assert(ratio > 0.0 && !ratio.isNaN, s"$arm degenerate ratio $ratio")
    }
    // θ is the POOLED optimum, so the pooled adjusted variance can
    // never exceed the raw pooled variance (per-arm CAN inflate when
    // the arm's own cov/var differs from pooled — that's expected).
    // Recompute user-grain moments independently to state it.
    val u = Tables.events(spark, dir)
      .groupBy("user_id")
      .agg(
        coalesce(sum(when(col("event_type") === "purchase"
          && col("ts") < Analytics.DriftBoundary,
          graft.util.Portable.cents2(col("value")))), lit(0L)).as("x"),
        coalesce(sum(when(col("event_type") === "purchase"
          && col("ts") >= Analytics.DriftBoundary,
          graft.util.Portable.cents2(col("value")))), lit(0L)).as("y"))
      .select(col("x").cast("double"), col("y").cast("double"))
      .as[(Double, Double)].collect()
    val n = u.length.toDouble
    val (mx, my) = (u.map(_._1).sum / n, u.map(_._2).sum / n)
    val varX = u.map(p => (p._1 - mx) * (p._1 - mx)).sum / n
    val varY = u.map(p => (p._2 - my) * (p._2 - my)).sum / n
    val cov = u.map(p => (p._1 - mx) * (p._2 - my)).sum / n
    val theta = cov / varX
    val varAdj = varY - 2 * theta * cov + theta * theta * varX
    assert(varAdj <= varY * (1 + 1e-12),
      s"pooled CUPED inflated variance: $varAdj vs $varY")
    // algebraic identity: Σ n·adj_mean = Σ n·mean (θ-weighted pre-term
    // telescopes against the pooled X̄) — up to val6 rounding of means
    val raw = r.map { case (_, n, m, _, _) => n * m }.sum
    val adj = r.map { case (_, n, _, a, _) => n * a }.sum
    assert(math.abs(raw - adj) <= total * 1e-6 * 2,
      s"CUPED moved the pooled mean: raw $raw vs adj $adj")
  }

  test("q255: backtest flag counts equal the forecaster's own flags; " +
      "scores are in-range") {
    val bt = Analytics.forecastBacktest(spark, dir)
      .select(col("n_days"), col("smape"), col("bias"), col("n_high"),
        col("n_low"), col("alert_rate"))
      .as[(Long, Double, Double, Long, Long, Double)].head()
    val fc = Analytics.ewmaForecast(spark, dir).cache()
    assert(bt._1 == fc.count())
    assert(bt._4 == fc.filter(col("flag") === "high").count())
    assert(bt._5 == fc.filter(col("flag") === "low").count())
    // sMAPE is bounded in [0, 2]; |bias| can't exceed smape
    assert(bt._2 >= 0.0 && bt._2 <= 2.0)
    assert(math.abs(bt._3) <= bt._2 + 1e-9)
    assert(bt._6 >= 0.0 && bt._6 <= 1.0)
    fc.unpersist()
  }

  test("q256: rules are internally consistent and lift is symmetric " +
      "in the underlying frame") {
    val r = Analytics.associationRules(spark, dir).cache()
    assert(r.count() == 20)
    assert(r.filter(col("support") < 2).count() == 0)
    assert(r.filter(col("confidence") <= 0.0 || col("confidence") > 1.0)
      .count() == 0)
    // lift must be decreasing in rank (ties broken deterministically)
    val lifts = r.orderBy("rank").select("lift").as[Double].collect()
    assert(lifts.zip(lifts.tail).forall { case (a, b) => a >= b })
    // lift(u→v) = lift(v→u): where the mirrored rule also made top-k,
    // the values agree (confidence is the asymmetric one)
    val sym = r.select(col("antecedent").as("u"),
        col("consequent").as("v"), col("lift").as("luv"))
      .join(r.select(col("consequent").as("u"),
        col("antecedent").as("v"), col("lift").as("lvu")), Seq("u", "v"))
      .filter(col("luv") =!= col("lvu"))
    assert(sym.count() == 0)
    r.unpersist()
  }

  test("q257: Gini and decile-share bounds; revenue accounting is " +
      "total over active customers") {
    val g = Analytics.revenueConcentration(spark, dir).cache()
    assert(g.filter(col("gini") < 0.0 || col("gini") >= 1.0)
      .count() == 0)
    // the top decile can never hold less than a tenth of revenue
    assert(g.filter(col("top_decile_share") < 0.1 * 0.9).count() == 0)
    assert(g.filter(col("top_decile_share") > 1.0).count() == 0)
    val total = g.agg(sum("revenue")).as[Double].head()
    val want = Tables.orders(spark, dir)
      .agg(graft.util.Portable.sumMoney2(col("o_totalprice")))
      .as[Double].head()
    assert(math.abs(total - want) < 0.02 * g.count(),
      s"segment revenues $total do not account for $want")
    g.unpersist()
  }

  test("q258: bucketed-CDF quantiles match brute hour-grain " +
      "percentiles; mean is the exact ratio") {
    val r = Analytics.purchaseGaps(spark, dir)
      .as[(Long, Long, Long, Long, Double)].head()
    val gapsUs = {
      val byUser = Tables.events(spark, dir)
        .filter(col("event_type") === "purchase")
        .select(col("user_id"), col("event_id"),
          unix_micros(col("ts")).as("us"))
        .as[(Long, Long, Long)].collect()
        .groupBy(_._1)
      byUser.values.flatMap { rows =>
        val sorted = rows.map(x => (x._3, x._2)).toSeq.sorted
        sorted.zip(sorted.tail).map { case ((a, _), (b, _)) => b - a }
      }.toSeq.sorted
    }
    assert(r._1 == gapsUs.length)
    val hours = gapsUs.map(_ / 3600000000L)
    def q(p: Int, of: Int): Long = {
      // smallest bucket h with cum·of >= n·p — recomputed brutely
      val n = hours.length
      hours.distinct.sorted.find(h =>
        hours.count(_ <= h).toLong * of >= n.toLong * p).get
    }
    assert(r._2 == q(1, 2), "median bucket mismatch")
    assert(r._3 == q(9, 10), "p90 bucket mismatch")
    assert(r._4 == hours.max)
    val mean = math.floor(gapsUs.map(BigInt(_)).sum.toDouble
      / gapsUs.length.toDouble / 3.6e9 * 1e6 + 0.5) / 1e6
    assert(r._5 == mean)
  }

  test("q259: shares telescope — nations sum to their region, " +
      "regions sum to the world") {
    val g = Analytics.revenueByGeo(spark, dir).cache()
    val regionShareSums = g.groupBy("region")
      .agg(sum("share_of_region").as("s"))
      .as[(String, Double)].collect()
    regionShareSums.foreach { case (rg, s) =>
      assert(math.abs(s - 1.0) < 1e-4, s"$rg shares sum to $s")
    }
    val worldSum = g.select("region", "region_share").distinct()
      .agg(sum("region_share")).as[Double].head()
    assert(math.abs(worldSum - 1.0) < 1e-4)
    // ranks are dense 1..k per region
    val badRank = g.groupBy("region")
      .agg(count(lit(1)).as("k"), max("rank_in_region").as("mx"))
      .filter(col("mx") =!= col("k"))
    assert(badRank.count() == 0)
    g.unpersist()
  }

  test("q250: forecast equals the independently-computed trailing " +
      "weighted mean; flags are the cross-multiplied band") {
    val f = Analytics.ewmaForecast(spark, dir)
    val days = Tables.orders(spark, dir)
      .groupBy(to_date(col("o_orderdate")).as("day"))
      .agg(sum(graft.util.Portable.cents2(col("o_totalprice"))).as("cents"))
      .orderBy("day")
      .as[(java.sql.Date, Long)].collect()
    val byDay = days.map(_._1).zipWithIndex.toMap
    val cents = days.map(_._2)
    val got = f.select(col("day"), col("revenue"), col("forecast"),
      col("flag")).as[(java.sql.Date, Double, Double, String)].collect()
    // first observed day has no history: exactly one row is dropped
    assert(got.length == days.length - 1)
    got.foreach { case (day, rev, fc, flag) =>
      val i = byDay(day)
      assert(i > 0)
      val lags = (1 to 8).filter(_ <= i)
        .map(k => (cents(i - k), 1L << (8 - k)))
      val num = lags.map { case (c, w) => c * w }.sum
      val den = lags.map(_._2).sum
      val expect = math.floor(num.toDouble / den.toDouble / 100.0
        * 1e6 + 0.5) / 1e6
      assert(fc == expect, s"$day forecast $fc != $expect")
      assert(rev == cents(i).toDouble / 100.0)
      val c = cents(i)
      val expFlag = if (c * 2 * den > num * 3) "high"
        else if (c * 2 * den < num) "low" else "ok"
      assert(flag == expFlag, s"$day flag $flag != $expFlag")
    }
  }
}
