package graft

import org.apache.spark.sql.functions._

import graft.streaming.StreamingJoin

/** Stream-stream join: drained AvailableNow result must equal the batch
  * range self-join (exactly-once append semantics), and the state must
  * be expirable (watermarks on both sides + a two-sided time bound).
  */
class StreamingJoinSpec extends SparkSpec {
  import spark.implicits._

  test("drained stream-stream join equals the batch range self-join") {
    val dir = sf("sf0.001")
    val got = StreamingJoin.viewsBeforePurchases(spark, dir)
      .collect().map(r => (r.getLong(0), r.getTimestamp(1), r.getTimestamp(2)))

    val ev = graft.sources.Tables.events(spark, dir)
    val v = ev.filter($"event_type" === "view")
      .select($"user_id".as("vu"), $"ts".as("view_ts"))
    val p = ev.filter($"event_type" === "purchase")
      .select($"user_id", $"ts".as("purchase_ts"))
    val expected = p.join(v, $"user_id" === $"vu"
        && $"view_ts" >= $"purchase_ts" - expr("INTERVAL 1 HOUR")
        && $"view_ts" <= $"purchase_ts")
      .select($"user_id", $"purchase_ts", $"view_ts")
      .orderBy("user_id", "purchase_ts", "view_ts")
      .collect().map(r => (r.getLong(0), r.getTimestamp(1), r.getTimestamp(2)))

    assert(got.sameElements(expected))
    assert(got.nonEmpty)
  }

  test("left outer variant: every purchase resolves — matches equal the " +
      "inner join, unmatched purchases emit exactly one null row") {
    val dir = sf("sf0.001")
    val out = StreamingJoin.purchasesWithViewAttribution(spark, dir).cache()
    // no sentinel leakage
    assert(out.filter($"user_id" === -1).count() == 0)
    // matched slice ≡ the inner-join query
    val inner = StreamingJoin.viewsBeforePurchases(spark, dir)
    assert(out.filter($"view_ts".isNotNull).count() == inner.count())
    // outer verdicts exist and cover every unmatched purchase exactly once
    val ev = graft.sources.Tables.events(spark, dir)
    val p = ev.filter($"event_type" === "purchase").count()
    val matchedPurchases = out.filter($"view_ts".isNotNull)
      .select("user_id", "purchase_ts").distinct().count()
    val nulls = out.filter($"view_ts".isNull).count()
    assert(nulls > 0, "no outer verdicts — the sentinel flush is broken")
    assert(matchedPurchases + nulls == p)
    out.unpersist()
  }
}
