package graft

import org.apache.spark.sql.functions._
import graft.operators.{Events, Relational, Scd2}

/** Specs for the round-2 relational extensions: as-of lookup, pivot,
  * cube, frame windows, deterministic sampling.
  */
class RelationalExtSpec extends SparkSpec {
  import spark.implicits._

  private val dir = sf("sf0.001")

  test("asOfLookup: probe resolves to the interval covering it") {
    val rows = Scd2.asOfLookup(spark, dir)
    // keys born at T2 (order_id % 10 >= 8, the 'fresh' 20%) must have no
    // version at the 2024-03-01 probe but exactly one at 2024-07-01
    val fresh = rows.filter($"order_id" % 10 >= 8)
    assert(fresh.filter($"probe_ts" < lit("2024-06-01")).count() == 0)
    val freshLater = fresh.filter($"probe_ts" > lit("2024-06-01"))
      .groupBy("order_id").count().select("count").distinct().as[Long].collect()
    assert(freshLater.sameElements(Array(1L)))
    // changed keys (order_id % 5 == 0 with a real status flip) see the OLD
    // status at probe 1 and 'D' at probe 2
    val flipped = rows.filter($"order_id" % 5 === 0 && $"order_id" % 10 < 8)
    assert(flipped.filter($"probe_ts" > lit("2024-06-01"))
      .filter($"order_status" =!= "D").count() == 0)
    // no probe ever matches more than one version (intervals don't overlap)
    assert(rows.groupBy("order_id", "probe_ts").count()
      .filter($"count" > 1).count() == 0)
  }

  test("pivotEventCounts: wide counts match the long-form groupBy") {
    val wide = Events.pivotEventCounts(spark, dir)
    val long = graft.sources.Tables.events(spark, dir)
      .groupBy("user_id", "event_type").count()
    val purchases = long.filter($"event_type" === "purchase")
      .select($"user_id", $"count".as("n"))
    val joined = wide.join(purchases, Seq("user_id"), "left")
      .select($"user_id", $"n_purchase", coalesce($"n", lit(0L)).as("n"))
    assert(joined.filter($"n_purchase" =!= $"n").count() == 0)
  }

  test("cubeRevenue: grand total row equals full-table aggregate") {
    val cube = Relational.cubeRevenue(spark, dir)
    val grand = cube.filter($"c_mktsegment".isNull && $"o_orderstatus".isNull)
      .select("n_orders").as[Long].collect()
    val expected = graft.sources.Tables.orders(spark, dir).count()
    assert(grand.sameElements(Array(expected)))
    // cube ⊃ rollup: status-only subtotal rows exist
    assert(cube.filter($"c_mktsegment".isNull && $"o_orderstatus".isNotNull)
      .count() > 0)
  }

  test("movingAvgRevenue: ma3 is the mean of the trailing window") {
    val rows = Relational.movingAvgRevenue(spark, dir)
      .orderBy("month").collect()
    assert(rows.length > 3)
    val r = rows(3)
    val trailing = Seq(rows(1), rows(2), rows(3))
      .map(x => math.round(x.getAs[Double]("revenue") * 100))
    val expected = trailing.sum.toDouble / 3 / 100.0
    assert(math.abs(r.getAs[Double]("revenue_ma3") - expected) < 1e-9)
    // cumulative is monotone for positive revenue
    val cums = rows.map(_.getAs[Double]("revenue_cum"))
    assert(cums.zip(cums.tail).forall { case (a, b) => b >= a })
  }

  test("plan shapes: broadcast as-of join, pushed filters, scan-local sample") {
    // q43: the point-in-time lookup must be a broadcast hash join with
    // the range predicate as a residual — never a nested-loop range join
    val asOf = Scd2.asOfLookup(spark, dir).queryExecution.executedPlan.toString
    assert(asOf.contains("BroadcastHashJoin"), s"as-of not broadcast:\n$asOf")
    assert(!asOf.contains("BroadcastNestedLoopJoin"),
      "as-of degenerated to nested-loop")
    // q51: the date filter must reach the orders parquet scan
    val semi = Relational.customersWithOrders(spark, dir)
      .queryExecution.executedPlan.toString
    assert(semi.contains("LessThan(o_orderdate"), s"filter not pushed:\n$semi")
    // q48: the hash sample is a scan-side filter — no Exchange before it
    val sampPlan = Relational.hashSample(spark, dir)
      .queryExecution.executedPlan.toString
    val filterIdx = sampPlan.indexOf("Filter")
    val exchangeIdx = sampPlan.indexOf("Exchange")
    assert(filterIdx >= 0 &&
      (exchangeIdx < 0 || exchangeIdx < filterIdx),
      s"sample filter runs above a shuffle:\n$sampPlan")
  }

  test("unpivotEventCounts: melt is the exact inverse of the pivot") {
    val wide = Events.pivotEventCounts(spark, dir)
    val long = Events.unpivotEventCounts(spark, dir)
    // every positive cell round-trips; zero cells are dropped
    val cells = wide.count() * 4
    val zeros = Seq("n_signup", "n_view", "n_click", "n_purchase")
      .map(c => wide.filter(col(c) === 0).count()).sum
    assert(long.count() == cells - zeros)
    val back = long.groupBy("user_id").pivot("stage").sum("n_events")
    val views = back.select($"user_id", coalesce($"view", lit(0L)).as("v"))
      .join(wide.select($"user_id", $"n_view"), "user_id")
    assert(views.filter($"v" =!= $"n_view").count() == 0)
  }

  test("percentileDiscPrices: quantiles are actual data values, ordered") {
    val rows = Relational.percentileDiscPrices(spark, dir)
    val prices = graft.sources.Tables.part(spark, dir)
      .select($"p_brand", $"p_retailprice").collect()
      .groupBy(_.getString(0)).view.mapValues(_.map(_.getDouble(1)).toSet)
    rows.collect().foreach { r =>
      val vals = prices(r.getString(0))
      Seq(1, 2, 3).foreach(i => assert(vals.contains(r.getDouble(i)),
        s"p${i} of ${r.getString(0)} not a data value"))
      assert(r.getDouble(1) <= r.getDouble(2) && r.getDouble(2) <= r.getDouble(3))
    }
  }

  test("bloomPrunedRevenue: equals the exact semi join; bloom probe in plan") {
    val pruned = Relational.bloomPrunedRevenue(spark, dir)
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("might_contain"), s"no bloom probe in plan:\n$plan")
    import graft.sources.Tables
    val keys = Tables.supplier(spark, dir)
      .join(Tables.nation(spark, dir).filter($"n_name" === "NATION_3"),
        $"s_nationkey" === $"n_nationkey")
      .select($"s_suppkey")
    val exact = Tables.lineitem(spark, dir)
      .join(keys, $"l_suppkey" === $"s_suppkey", "left_semi")
      .groupBy(date_format($"l_shipdate", "yyyy-MM").as("ship_month"))
      .agg(graft.util.Portable.sumMoney4(
        $"l_extendedprice" * (lit(1.0) - $"l_discount")).as("revenue"),
        count(lit(1)).as("n_items"))
    assert(pruned.except(exact).count() == 0 && exact.except(pruned).count() == 0)
    assert(pruned.count() > 0)
  }

  test("groupedMoments: matches driver-side exact moments to 1e-6") {
    val li = graft.sources.Tables.lineitem(spark, dir)
      .select($"l_linestatus", $"l_quantity", $"l_extendedprice").collect()
    val byStatus = li.groupBy(_.getString(0))
    Relational.groupedMoments(spark, dir).collect().foreach { r =>
      val rows = byStatus(r.getString(0))
      val xs = rows.map(x => math.floor(x.getDouble(1) * 100.0 + 0.5))
      val ys = rows.map(x => math.floor(x.getDouble(2) + 0.5))
      val n = rows.length.toDouble
      def m(v: Array[Double]) = v.sum / n
      val sdx = math.sqrt(xs.map(x => (x - m(xs)) * (x - m(xs))).sum / n) / 100.0
      val sdy = math.sqrt(ys.map(y => (y - m(ys)) * (y - m(ys))).sum / n)
      val cov = xs.zip(ys).map { case (x, y) => (x - m(xs)) * (y - m(ys)) }.sum
      val corr = cov / math.sqrt(xs.map(x => (x - m(xs)) * (x - m(xs))).sum *
        ys.map(y => (y - m(ys)) * (y - m(ys))).sum)
      assert(r.getLong(1) == rows.length)
      assert(math.abs(r.getDouble(2) - sdx) < 1e-6, s"stddev_qty ${r.getString(0)}")
      assert(math.abs(r.getDouble(3) - sdy) < 1e-6, s"stddev_price ${r.getString(0)}")
      assert(math.abs(r.getDouble(4) - corr) < 1e-6, s"corr ${r.getString(0)}")
    }
  }

  test("fuzzyNamePairs: complete and minimal vs brute force") {
    val names = graft.sources.Tables.part(spark, dir)
      .select($"p_brand", $"p_name").distinct().collect()
      .map(r => (r.getString(0), r.getString(1)))
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1)((i, j) =>
        if (i == 0) j else if (j == 0) i else 0)
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    val expected = (for {
      (ba, na) <- names; (bb, nb) <- names
      if ba == bb && na < nb && lev(na, nb) <= 2
    } yield (ba, na, nb, lev(na, nb).toLong)).toSet
    val got = Relational.fuzzyNamePairs(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2), r.getLong(3)))
      .toSet
    assert(got == expected)
  }

  test("rangeFrameRevenue: trailing window is value-based, not row-based") {
    val rows = Relational.rangeFrameRevenue(spark, dir).collect()
      .map(r => (r.getString(0), r.getDate(1).toLocalDate.toEpochDay,
        r.getDouble(2), r.getDouble(3)))
    val byPrio = rows.groupBy(_._1)
    rows.foreach { case (prio, day, _, rev7) =>
      val expect = byPrio(prio)
        .filter(x => x._2 >= day - 6 && x._2 <= day)
        .map(x => math.round(x._3 * 100)).sum / 100.0
      assert(math.abs(rev7 - expect) < 1e-9, s"$prio day=$day")
    }
    // at least one sparse gap must exist for RANGE to differ from ROWS
    val anyGap = byPrio.values.exists { v =>
      val ds = v.map(_._2).sorted
      ds.zip(ds.tail).exists { case (a, b) => b - a > 1 }
    }
    assert(anyGap, "test data has no date gaps; RANGE≡ROWS here")
  }

  test("bagOpsDays: multiplicities are max(0,v-p) and min(v,p) per day") {
    val ev = graft.sources.Tables.events(spark, dir)
      .filter($"event_type".isin("view", "purchase"))
      .select($"user_id", to_date($"ts").as("day"), $"event_type").collect()
      .map(r => (r.getLong(0), r.getDate(1).toString, r.getString(2)))
    val counts = ev.groupBy(x => (x._1, x._2)).view.mapValues { g =>
      (g.count(_._3 == "view").toLong, g.count(_._3 == "purchase").toLong)
    }.toMap
    val expExc = counts.toSeq.groupBy(_._1._1).view
      .mapValues(_.map { case (_, (v, p)) => math.max(0L, v - p) }.sum)
      .filter(_._2 > 0).toMap
    val expInt = counts.toSeq.groupBy(_._1._1).view
      .mapValues(_.map { case (_, (v, p)) => math.min(v, p) }.sum)
      .filter(_._2 > 0).toMap
    val got = Events.bagOpsDays(spark, dir).collect()
      .groupBy(_.getString(0)).view
      .mapValues(_.map(r => r.getLong(1) -> r.getLong(2)).toMap).toMap
    assert(got("except_all") == expExc)
    assert(got("intersect_all") == expInt)
  }

  test("arrayFuncs: csv is sorted-distinct; flags consistent") {
    Events.arrayFuncs(spark, dir).collect().foreach { r =>
      val types = r.getString(1).split(",").toSeq
      assert(types == types.sorted && types.distinct == types)
      assert(r.getLong(2) == types.length)
      assert(r.getString(3) == types.head)
      assert(r.getBoolean(4) == types.contains("purchase"))
    }
  }

  test("kmvSetOps: estimates within KMV error; all sketch heads fused " +
      "into one aggregation pass") {
    val df = Events.kmvSetOps(spark, dir)
    val plan = df.queryExecution.executedPlan.toString
    // round-4 shape: the three kmv_sketch heads + exacts come out of a
    // single ObjectHashAggregate — no per-head sub-aggregation jobs
    assert(plan.contains("kmv_sketch"), s"sketch aggregate missing:\n$plan")
    assert("ObjectHashAggregate".r.findAllIn(plan).size == 2, // partial+final
      s"sketch heads not fused into one aggregation:\n$plan")
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("Join"),
      s"fused plan must not join sub-aggregations:\n$plan")
    val r = df.collect().head
    def chk(exact: String, est: String): Unit = {
      val (e, a) = (r.getAs[Long](exact).toDouble, r.getAs[Long](est).toDouble)
      // standard KMV relative error ~1/sqrt(k) = 12.5%; allow 3 sigma
      assert(math.abs(a - e) <= math.max(3.0, 0.375 * e), s"$est=$a vs $exact=$e")
    }
    chk("exact_view", "est_view")
    chk("exact_purchase", "est_purchase")
    chk("exact_union", "est_union")
    chk("exact_intersection", "est_intersection")
    val j = r.getAs[Double]("jaccard_est")
    assert(j >= 0.0 && j <= 1.0)
  }

  test("hashSample: deterministic, ~5% rate, stable across runs") {
    val s1 = Relational.hashSample(spark, dir).select("o_orderkey")
      .as[Long].collect()
    val s2 = Relational.hashSample(spark, dir).select("o_orderkey")
      .as[Long].collect()
    assert(s1.sameElements(s2))
    val total = graft.sources.Tables.orders(spark, dir).count()
    assert(s1.length > total * 0.02 && s1.length < total * 0.09)
  }
}
