package graft

import org.apache.spark.sql.functions._
import graft.functions.HammingDistance

class HammingSpec extends SparkSpec {
  import spark.implicits._

  test("hamming: correct values via Column API, nulls propagate") {
    val df = Seq((5L, 3L), (0L, -1L), (7L, 7L)).toDF("a", "b")
    val got = df.select(HammingDistance.hamming($"a", $"b")).as[Int].collect()
    assert(got.toSeq == Seq(2, 64, 0))
    val withNull = Seq((Some(1L), None: Option[Long]))
      .toDF("a", "b")
      .select(HammingDistance.hamming($"a", $"b"))
    assert(withNull.first().isNullAt(0))
  }

  test("hamming: registered SQL function, inside whole-stage codegen") {
    HammingDistance.register(spark)
    // parquet-backed input so the plan isn't constant-folded away
    graft.sources.Tables.events(spark, sf("sf0.001"))
      .createOrReplaceTempView("hx_events")
    val df = spark.sql(
      "SELECT hamming(event_id, user_id) AS h FROM hx_events LIMIT 5")
    assert(df.collect().forall(r => r.getInt(0) >= 0 && r.getInt(0) <= 64))
    // the expression must not force a codegen fallback: the Project
    // carrying hammingdistance must be inside a codegen stage ("*(n)")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.linesIterator.exists(l =>
      l.contains("hammingdistance") && l.contains("*(")))
  }

  test("type check rejects non-long inputs") {
    val ex = intercept[Exception] {
      Seq(("x", 1L)).toDF("a", "b")
        .select(HammingDistance.hamming($"a", $"b")).collect()
    }
    assert(ex.getMessage.toLowerCase.contains("bigint"))
  }
}
