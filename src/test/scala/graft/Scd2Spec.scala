package graft

import org.apache.spark.sql.functions._
import graft.operators.Scd2

/** SCD2 invariants (SURVEY §5 strategy item 4):
  * exactly one current row per key; contiguous non-overlapping
  * [valid_from, valid_to) intervals; close-and-insert in one pass
  * (the reference's MATCHED branch defers the insert — we fix that,
  * SURVEY §2.9); no-change merges are identity.
  */
class Scd2Spec extends SparkSpec {
  import spark.implicits._

  private val cfg = Scd2.Config("id", Seq("status", "amount"), "sk")
  private def ts(s: String) = to_timestamp(lit(s))

  private def dim0 = Scd2.initialLoad(
    Seq((1L, "open", 10.0), (2L, "open", 20.0), (3L, "paid", 30.0))
      .toDF("id", "status", "amount"),
    cfg, ts("2024-01-01 00:00:00"))

  test("initial load: all rows current, dense SKs from 1") {
    val d = dim0.collect()
    assert(d.length == 3)
    assert(d.forall(_.getAs[Boolean]("is_current")))
    assert(dim0.select("sk").as[Long].collect().sorted.sameElements(Array(1L, 2L, 3L)))
  }

  test("merge closes changed, inserts new version and new keys") {
    val staging = Seq(
      (1L, "shipped", 10.0), // changed → close + insert
      (2L, "open", 20.0),    // unchanged
      (4L, "open", 40.0))    // new key
      .toDF("id", "status", "amount")
    val merged = Scd2.merge(dim0, staging, cfg, ts("2024-02-01 00:00:00"))

    // key 1: one closed (valid_to = merge ts) + one current (new sk)
    val k1 = merged.filter($"id" === 1).orderBy("valid_from").collect()
    assert(k1.length == 2)
    assert(!k1(0).getAs[Boolean]("is_current")
      && k1(0).getAs[java.sql.Timestamp]("valid_to").toString.startsWith("2024-02-01"))
    assert(k1(1).getAs[Boolean]("is_current")
      && k1(1).getAs[String]("status") == "shipped")

    // exactly one current row per key
    val curPerKey = merged.filter($"is_current").groupBy("id").count()
      .filter($"count" =!= 1).count()
    assert(curPerKey == 0)

    // key 3 absent from staging stays current untouched (no deletes)
    val k3 = merged.filter($"id" === 3).collect()
    assert(k3.length == 1 && k3(0).getAs[Boolean]("is_current"))

    // new SKs continue past MAX(existing)
    val sks = merged.select("sk").as[Long].collect()
    assert(sks.distinct.length == sks.length && sks.max == 5L)

    // intervals per key are contiguous and non-overlapping
    val bad = merged.selectExpr("id", "valid_from", "valid_to")
      .withColumn("next_from",
        lead($"valid_from", 1).over(org.apache.spark.sql.expressions.Window
          .partitionBy("id").orderBy("valid_from")))
      .filter($"next_from".isNotNull && $"valid_to" =!= $"next_from")
      .count()
    assert(bad == 0)
  }

  test("no-change merge is identity on row content") {
    val staging = Seq((1L, "open", 10.0), (2L, "open", 20.0), (3L, "paid", 30.0))
      .toDF("id", "status", "amount")
    val merged = Scd2.merge(dim0, staging, cfg, ts("2024-03-01 00:00:00"))
    assert(merged.count() == 3)
    assert(merged.filter($"is_current").count() == 3)
    assert(merged.agg(max("valid_from")).first().getTimestamp(0)
      .toString.startsWith("2024-01-01"))
  }

  test("as-of lookup join is NOT hard-broadcast: forced-large history " +
      "falls back to a shuffled join") {
    // With broadcast disabled entirely (static + adaptive thresholds),
    // a hard broadcast() hint would still force BroadcastHashJoin; the
    // as-of lookup must instead degrade to a key-shuffled join — the
    // shape that survives a dimension history too big for the driver.
    val conf = spark.conf
    val saved = Seq(
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.autoBroadcastJoinThreshold")
      .map(k => k -> conf.getOption(k))
    try {
      saved.foreach { case (k, _) => conf.set(k, "-1") }
      val df = Scd2.asOfLookup(spark, sf("sf0.001"))
      df.collect() // execute so AQE finalizes the physical plan
      val plan = df.queryExecution.executedPlan.toString
      // The probe⋈history join is the line carrying the validity-range
      // residual (valid_from <= ts < valid_to). denseGlobalRank's
      // metadata-sized offset broadcast elsewhere in the lineage is
      // expected and fine — only the history join must degrade.
      val asOfJoinLines = plan.linesIterator
        .filter(l => l.contains("Join") && l.contains("valid_from")).toSeq
      assert(asOfJoinLines.nonEmpty, s"as-of join not found in plan:\n$plan")
      assert(asOfJoinLines.forall(!_.contains("BroadcastHashJoin")),
        s"as-of lookup must not broadcast when disabled:\n$plan")
    } finally saved.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None) => conf.unset(k)
    }
  }

  test("generic asOfJoin: probes resolve to the covering version; " +
      "pre-birth probes drop; currentView is the latest") {
    val staging = Seq((1L, "shipped", 10.0)).toDF("id", "status", "amount")
    val hist = Scd2.merge(dim0, staging, cfg, ts("2024-02-01 00:00:00"))
    val probes = Seq(
      (1L, "2024-01-15 00:00:00"), // between load and merge → "open"
      (1L, "2024-03-01 00:00:00"), // after merge → "shipped"
      (1L, "2023-12-01 00:00:00"), // before birth → dropped
      (9L, "2024-03-01 00:00:00")) // unknown key → dropped
      .toDF("id", "at").withColumn("at", to_timestamp($"at"))
    val got = Scd2.asOfJoin(probes, hist, "id", "at")
      .select("id", "at", "status").orderBy("at")
      .as[(Long, java.sql.Timestamp, String)].collect()
    assert(got.length == 2)
    assert(got(0)._3 == "open" && got(1)._3 == "shipped")
    assert(Scd2.currentView(hist).count() == 3) // one per live key
  }

  test("second merge after a change keeps full history") {
    val s1 = Seq((1L, "shipped", 10.0)).toDF("id", "status", "amount")
    val m1 = Scd2.merge(dim0, s1, cfg, ts("2024-02-01 00:00:00"))
    val s2 = Seq((1L, "delivered", 10.0)).toDF("id", "status", "amount")
    val m2 = Scd2.merge(m1, s2, cfg, ts("2024-03-01 00:00:00"))
    val k1 = m2.filter($"id" === 1).orderBy("valid_from")
      .select("status", "is_current").as[(String, Boolean)].collect()
    assert(k1.toSeq == Seq(("open", false), ("shipped", false), ("delivered", true)))
  }
}
