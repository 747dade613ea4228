package graft

import org.apache.spark.sql.functions._
import graft.operators.{Events, Relational}
import graft.util.Portable

/** Operator-level specs on tiny in-memory frames + the sf0.001 harness. */
class OperatorSpec extends SparkSpec {
  import spark.implicits._

  test("portable32 equals DuckDB CAST('0x'||substr(md5,1,8) AS BIGINT)") {
    // md5('hello') = 5d41402abc4b2a76... → 0x5d41402a = 1564557354
    val got = Seq("hello").toDF("s")
      .select(Portable.portable32($"s")).as[Long].head()
    assert(got == 1564557354L)
  }

  test("val2/sumMoney2 round-trip exact cents") {
    val df = Seq(1.005, 2.675, -1.005).toDF("x") // classic half-up traps
    val vals = df.select(Portable.val2($"x")).as[Double].collect()
    // floor(x*100+0.5) on the IEEE values: 1.005*100 = 100.49999999999999
    // → 100 → 1.0; 2.675*100 = 267.50000000000006 → 268 → 2.68;
    // -1.005*100 = -100.49999999999999 → +0.5 → floor = -100 → -1.0.
    // What matters is not decimal half-up exactness but that ANY engine
    // doing IEEE-754 gets the same bits (verified vs DuckDB in tools/check.py).
    assert(vals.toSeq == Seq(1.0, 2.68, -1.0))
    val s = df.agg(Portable.sumMoney2($"x")).as[Double].head()
    assert(s == (100L + 268L - 100L) / 100.0)
  }

  test("funnel zero-fills missing stages in rank order") {
    val f = Events.funnel(spark, sf("sf0.001")).collect()
    assert(f.map(_.getAs[String]("stage")).toSeq ==
      Seq("signup", "view", "click", "purchase"))
    assert(f.forall(_.getAs[Long]("n_events") > 0))
  }

  test("sessionize: session ids restart per user, durations non-negative") {
    val s = Events.sessionize(spark, sf("sf0.001"))
    assert(s.filter($"duration_s" < 0).count() == 0)
    assert(s.filter($"session_id" === 0).select("user_id").distinct().count() ==
      s.select("user_id").distinct().count()) // every user has session 0
  }

  test("top-k plans as TakeOrderedAndProject (no global sort)") {
    val plan = Relational.topCustomers(spark, sf("sf0.001"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"))
  }

  test("brand performance broadcasts the part dimension") {
    val plan = Relational.brandPerformance(spark, sf("sf0.001"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"))
  }

  test("filter and projection are pushed to the parquet scan") {
    val qe = Relational.filterTopkOrders(spark, sf("sf0.001"))
      .queryExecution.executedPlan.toString
    assert(qe.contains("PushedFilters: [IsNotNull(o_orderstatus)"))
  }
}
