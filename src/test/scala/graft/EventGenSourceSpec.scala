package graft

import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
import org.apache.spark.sql.functions._

/** DSv2 connector contract: determinism, column pruning, filter
  * pushdown, and partition pruning must all be observable in the plan,
  * not just in the results. */
class EventGenSourceSpec extends SparkSpec {

  private def gen(rows: Long = 1000L, parts: Int = 4) =
    spark.read.format("graft-eventgen")
      .option("rows", rows).option("partitions", parts).load()

  private def scanOf(df: org.apache.spark.sql.DataFrame): BatchScanExec =
    df.queryExecution.executedPlan.collectFirst { case b: BatchScanExec => b }.get

  test("row count, schema, and bit-reproducibility") {
    val df = gen()
    assert(df.count() == 1000)
    assert(df.columns.toSeq ==
      Seq("event_id", "ts", "user_id", "event_type", "value"))
    val s1 = df.agg(sum("value"), sum("user_id")).collect()(0)
    val s2 = gen().agg(sum("value"), sum("user_id")).collect()(0)
    assert(s1 == s2)
  }

  test("generation matches the Portable.portable32 contract") {
    import graft.util.Portable
    val row = gen().filter(col("event_id") === 42L).collect()(0)
    val h = graft.sources.v2.EventGen.hash32(42L)
    // cross-check the JVM hash against the SQL portable32 on a literal
    val sqlH = spark.range(1).select(
      Portable.portable32(lit("42"))).collect()(0).getLong(0)
    assert(h == sqlH)
    assert(row.getAs[Long]("user_id") == h % 500)
    assert(row.getAs[Double]("value") == (h % 10000).toDouble / 100.0)
  }

  test("column pruning reaches the scan") {
    val out = scanOf(gen().select("event_type")).output
    assert(out.map(_.name) == Seq("event_type"))
  }

  test("filter pushdown narrows the scan and prunes partitions") {
    val full = scanOf(gen(rows = 1000, parts = 4))
    assert(full.inputRDD.getNumPartitions == 4)
    // [500, 750) intersects exactly one 250-wide chunk
    val narrow = gen(rows = 1000, parts = 4)
      .filter(col("event_id") >= 500L && col("event_id") < 750L)
    val scan = scanOf(narrow)
    assert(scan.inputRDD.getNumPartitions == 1)
    assert(narrow.count() == 250)
    // absorbed filters are exact: boundaries included/excluded correctly
    val ids = narrow.agg(min("event_id"), max("event_id")).collect()(0)
    assert(ids.getLong(0) == 500 && ids.getLong(1) == 749)
  }

  test("micro-batch stream drains in rate-limited triggers and equals batch") {
    import org.apache.spark.sql.streaming.Trigger
    val stream = spark.readStream.format("graft-eventgen")
      .option("rows", 5000).option("batchRows", 1000).load()
      .groupBy("event_type").count()
    val q = stream.writeStream.outputMode("complete").format("memory")
      .queryName("eventgen_spec_sink").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    // admission control: 5000 ids / 1000 per trigger => at least 5 batches
    assert(q.recentProgress.count(_.numInputRows > 0) >= 5)
    assert(q.recentProgress.filter(_.numInputRows > 0)
      .forall(_.numInputRows <= 1000))
    val streamed = spark.table("eventgen_spec_sink")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val batch = gen(rows = 5000).groupBy("event_type").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(streamed == batch)
  }

  test("residual filters still apply on top of absorbed ones") {
    val df = gen(rows = 1000, parts = 4)
      .filter(col("event_id") < 100L && col("event_type") === "view")
    val expected = (0L until 100L).count(id =>
      graft.sources.v2.EventGen.types(
        ((graft.sources.v2.EventGen.hash32(id) / 500) % 5).toInt) == "view")
    assert(df.count() == expected)
  }
}
