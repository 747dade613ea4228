package graft

import org.apache.spark.sql.functions._
import graft.operators.Silver

class SilverSpec extends SparkSpec {

  test("observed: DQ counters ride the job itself (no extra pass) and " +
      "report exact row/null counts") {
    import spark.implicits._
    val df = Seq(("a", Some(1)), ("b", None), (null, Some(3)), ("d", None))
      .toDF("s", "v")
    val obs = Silver.observed(df, "dq_probe", Seq("s", "v"))
    // one action drives both the query and the counters (collect, not
    // count: count() builds a separate QueryExecution and the metrics
    // attach to the observed frame's own execution)
    assert(obs.collect().length == 4)
    val m = obs.queryExecution.observedMetrics("dq_probe")
    assert(m.getAs[Long]("rows") == 4)
    assert(m.getAs[Long]("nulls_s") == 1)
    assert(m.getAs[Long]("nulls_v") == 2)
  }

  import spark.implicits._

  test("fillNulls: median for numerics, Unknown for strings, overrides win") {
    val df = Seq(
      (Some(1.0), Option("a"), Some(10L)),
      (None, None, None),
      (Some(3.0), Option("b"), Some(30L)))
      .toDF("x", "s", "z")
    val out = Silver.fillNulls(df, medianCols = Seq("x"),
      overrides = Map("z" -> 0L))
    val r = out.orderBy("x").collect()
    assert(out.filter($"x".isNull || $"s".isNull || $"z".isNull).count() == 0)
    assert(out.filter($"s" === "Unknown").count() == 1)
    assert(out.filter($"z" === 0L).count() == 1)
    // median of {1,3} ∈ [1,3]
    val filled = out.agg(sum($"x")).first().getDouble(0)
    assert(filled >= 5.0 && filled <= 7.0)
  }

  test("parseTimestamp walks formats with NULL-on-fail") {
    val df = Seq("2024-01-02 03:04:05", "02-03-2024 04:05",
      "2024-01-02", "garbage").toDF("t")
    val out = df.withColumn("ts", Silver.parseTimestamp($"t"))
    val got = out.select("ts").collect().map(r =>
      Option(r.getTimestamp(0)).map(_.toString).orNull)
    assert(got(0) == "2024-01-02 03:04:05.0")
    assert(got(1) == "2024-03-02 04:05:00.0") // dd-MM-yyyy HH:mm
    assert(got(2) == "2024-01-02 00:00:00.0")
    assert(got(3) == null)
  }

  test("dedupByKey keeps first row per key by sort order") {
    val df = Seq((1, 5, "late"), (1, 1, "first"), (2, 2, "only"))
      .toDF("k", "ord", "tag")
    val out = Silver.dedupByKey(df, Seq("k"), Seq($"ord".asc))
    assert(out.count() == 2)
    assert(out.filter($"k" === 1).select("tag").as[String].head() == "first")
  }

  test("withDurationDays filters invalid rows and derives day counts") {
    val df = Seq(
      (Option("2024-01-01 00:00:00"), Option("2024-01-11 00:00:00")),
      (Option("2024-01-01 00:00:00"), None))
      .toDF("a", "b")
      .select(to_timestamp($"a").as("a"), to_timestamp($"b").as("b"))
    val out = Silver.withDurationDays(df, "a", "b", "days")
    assert(out.count() == 1)
    assert(out.select("days").as[Int].head() == 10)
  }

  test("nullCounts one-pass per-column counters") {
    val df = Seq((Some(1), Option("x")), (None, None), (None, Option("y")))
      .toDF("a", "b")
    val m = Silver.nullCounts(df, Seq("a", "b"))
    assert(m == Map("a" -> 2L, "b" -> 1L))
  }
}
