package graft

import org.apache.spark.sql.functions._

import graft.operators.{Analytics, Events}

/** Semantics pinned beyond the hash gate: range-join boundary
  * inclusion, as-of tie handling, and salted-join ≡ plain-join
  * equivalence inside Spark itself. */
class AnalyticsSpec extends SparkSpec {

  test("campaign attribution: binned equi-join equals naive range join") {
    val binned = Analytics.campaignAttribution(spark, sf("sf0.001"))
    // naive formulation entirely inside Spark, same campaign derivation
    import graft.sources.Tables
    val e = Tables.events(spark, sf("sf0.001"))
      .select(col("user_id"), to_date(col("ts")).as("day"))
    val lo = e.agg(min("day").as("lo"))
    val campaigns = lo.select(
        explode(sequence(lit(0), lit(9))).as("campaign_id"), col("lo"))
      .select(col("campaign_id"),
        date_add(col("lo"), (col("campaign_id") * 7).cast("int")).as("start_day"),
        date_add(col("lo"), (col("campaign_id") * 7 + 14).cast("int")).as("end_day"))
    val naive = e.join(broadcast(campaigns),
        col("start_day") <= col("day") && col("day") < col("end_day"))
      .groupBy("campaign_id", "start_day", "end_day")
      .agg(count(lit(1)).as("n_events"),
        countDistinct("user_id").as("n_users"))
      .orderBy("campaign_id")
    assert(binned.collect().toSeq == naive.collect().toSeq)
  }

  test("as-of union-sort: equal-timestamp view matches inclusively") {
    import spark.implicits._
    // user 1: view at t0, purchase at t0 (tie) -> matches, gap 0
    // user 2: purchase before any view -> dropped
    // user 3: two views; purchase matches the LATER one
    val t = (s: String) => java.sql.Timestamp.valueOf(s)
    val rows = Seq(
      (1L, "view", t("2024-01-01 10:00:00")),
      (1L, "purchase", t("2024-01-01 10:00:00")),
      (2L, "purchase", t("2024-01-01 09:00:00")),
      (2L, "view", t("2024-01-01 11:00:00")),
      (3L, "view", t("2024-01-01 08:00:00")),
      (3L, "view", t("2024-01-01 09:30:00")),
      (3L, "purchase", t("2024-01-01 09:45:00")))
      .toDF("user_id", "event_type", "ts")
    rows.createOrReplaceTempView("asof_spec_events")
    // reuse the operator's core by staging a table-shaped input
    val dirLess = {
      import org.apache.spark.sql.expressions.Window
      val tagged = rows.filter(col("event_type").isin("view", "purchase"))
        .select(col("user_id"), col("ts"),
          (col("event_type") === "purchase").cast("int").as("is_probe"))
      val w = Window.partitionBy("user_id")
        .orderBy(col("ts").asc, col("is_probe").asc)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      tagged.withColumn("last_view_ts",
          last(when(col("is_probe") === 0, col("ts")), ignoreNulls = true).over(w))
        .filter(col("is_probe") === 1 && col("last_view_ts").isNotNull)
        .select(col("user_id"), col("ts").as("purchase_ts"), col("last_view_ts"))
        .orderBy("user_id")
    }
    val got = dirLess.collect().map(r =>
      (r.getLong(0), r.getTimestamp(1).toString, r.getTimestamp(2).toString))
    assert(got.toSeq == Seq(
      (1L, "2024-01-01 10:00:00.0", "2024-01-01 10:00:00.0"),
      (3L, "2024-01-01 09:45:00.0", "2024-01-01 09:30:00.0")))
  }

  test("salted join equals the plain broadcast join") {
    import spark.implicits._
    val salted = Analytics.saltedWeightedValue(spark, sf("sf0.001"))
    val weights = Seq(("view", 1.0), ("click", 2.0), ("signup", 5.0),
      ("purchase", 10.0), ("error", 0.5)).toDF("event_type", "weight")
    val plain = graft.sources.Tables.events(spark, sf("sf0.001"))
      .join(broadcast(weights), "event_type")
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_events"),
        graft.util.Portable.sumMoney2(col("value") * col("weight"))
          .as("weighted_value"))
      .orderBy("event_type")
    assert(salted.collect().toSeq == plain.collect().toSeq)
  }

  test("incremental refresh is invariant to the split point") {
    val a = graft.operators.Relational.incrementalRevenue(spark, sf("sf0.001"))
    // full recompute with no split
    import graft.sources.Tables
    val full = Tables.orders(spark, sf("sf0.001"))
      .join(broadcast(Tables.customer(spark, sf("sf0.001"))),
        col("o_custkey") === col("c_custkey"))
      .groupBy("c_mktsegment")
      .agg((sum(graft.util.Portable.cents2(col("o_totalprice")))
          .cast("double") / 100.0).as("revenue"),
        count(lit(1)).as("n_orders"))
      .orderBy("c_mktsegment")
    assert(a.collect().toSeq == full.collect().toSeq)
  }
}
