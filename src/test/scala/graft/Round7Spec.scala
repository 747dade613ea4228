package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.operators.{Events, Graphs, Relational}
import graft.sources.Bucketing

/** Round-7 operators: semantics pinned beyond the hash gate —
  * gaps-and-islands streaks, activity bitmaps, Markov transitions,
  * recursive-CTE reachability, the skyline frontier rewrite, and the
  * two-phase dense-rank replacement for the single-partition global
  * ROW_NUMBER.
  */
class Round7Spec extends SparkSpec {
  import spark.implicits._

  test("streaks: island arithmetic on a hand-built calendar") {
    // user a: 1-2-3 . 5-6 → max 3, 2 streaks; user b: one day → 1, 1
    val ev = Seq(
      ("a", "2024-01-01"), ("a", "2024-01-02"), ("a", "2024-01-03"),
      ("a", "2024-01-05"), ("a", "2024-01-06"), ("a", "2024-01-02"),
      ("b", "2024-03-09")
    ).toDF("user_id", "d")
      .select($"user_id", to_date($"d").as("d"))
    val days = ev.distinct()
    val anchored = days.withColumn("anchor",
      date_sub($"d", row_number().over(
        Window.partitionBy("user_id").orderBy("d"))))
    val runs = anchored.groupBy("user_id", "anchor")
      .agg(count(lit(1)).as("len"))
    val out = runs.groupBy("user_id")
      .agg(max($"len").as("max_streak"), count(lit(1)).as("n_streaks"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    assert(out("a") == (3L, 2L))
    assert(out("b") == (1L, 1L))
  }

  test("streaks on testdata: max_streak bounded by active days") {
    val df = Events.streaks(spark, sf("sf0.001"))
    assert(df.columns.toSeq ==
      Seq("user_id", "max_streak", "n_streaks", "first_active"))
    val bad = df.filter($"max_streak" < 1 || $"n_streaks" < 1).count()
    assert(bad == 0)
  }

  test("activity bitmap: popcount equals distinct day-slots") {
    val bm = Events.activityBitmap(spark, sf("sf0.001"))
    val slots = graft.sources.Tables.events(spark, sf("sf0.001"))
      .select($"user_id",
        pmod(datediff(to_date($"ts"), to_date(lit("1995-01-01"))), lit(64))
          .as("slot"))
      .groupBy("user_id").agg(countDistinct($"slot").as("n_slots"))
    val joined = bm.join(slots, "user_id")
      .filter($"active_slots" =!= $"n_slots")
    assert(joined.count() == 0)
  }

  test("markov transitions: rows normalize to 1 per from_type") {
    val m = Events.markovTransitions(spark, sf("sf0.001"))
    val sums = m.groupBy("from_type").agg(sum($"p").as("s"))
      .collect().map(_.getDouble(1))
    // val4 rounds half-up per row: each of ≤5 rows may move the sum by
    // up to ±0.5e-4
    assert(sums.forall(s => s > 0.999 && s <= 1.0005), sums.toSeq)
  }

  test("brand reach: origin at hop 0, everything within the bound") {
    val r = Graphs.brandReach(spark, sf("sf0.001")).collect()
    val byHop = r.groupBy(_.getInt(1))
    assert(byHop(0).length == 1) // exactly the origin
    assert(r.forall(row => row.getInt(1) >= 0 && row.getInt(1) <= 3))
    assert(r.forall(_.getLong(2) >= 1L))
  }

  test("skyline: frontier form equals the quadratic dominance filter") {
    val parts = graft.sources.Tables.part(spark, sf("sf0.001"))
      .select($"p_partkey", $"p_retailprice", $"p_size".cast("long")).collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getLong(2)))
    val brute = parts.filter { case (_, pr, sz) =>
      !parts.exists { case (_, qr, qz) =>
        qr <= pr && qz >= sz && (qr < pr || qz > sz) }
    }.map(_._1).toSet
    val got = Relational.skylineParts(spark, sf("sf0.001"))
      .select("p_partkey").collect().map(_.getLong(0)).toSet
    assert(got == brute)
  }

  test("denseGlobalRank equals the single-partition global row_number") {
    val dim = graft.sources.Tables.customer(spark, sf("sf0.001"))
    val twoPhase = Relational.denseGlobalRank(dim, "c_custkey", "sk", 0L)
      .select($"c_custkey", $"sk").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val global = dim.withColumn("sk",
        row_number().over(Window.orderBy("c_custkey")).cast("long"))
      .select($"c_custkey", $"sk").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(twoPhase == global)
  }

  test("bucketed revenue equals the plain-table join") {
    val dir = sf("sf0.001")
    val got = Bucketing.bucketedRevenue(spark, dir).collect()
    val t = graft.sources.Tables
    val exp = t.lineitem(spark, dir)
      .join(t.orders(spark, dir), $"l_orderkey" === $"o_orderkey")
      .groupBy("o_orderpriority")
      .agg(graft.util.Portable.sumMoney4(
          $"l_extendedprice" * (lit(1.0) - $"l_discount")).as("revenue"),
        count(lit(1)).as("n_items"))
      .orderBy("o_orderpriority").collect()
    assert(got.toSeq == exp.toSeq)
  }
}
