package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.operators.Analytics
import graft.sources.Tables
import graft.util.Portable

/** q251 — micro-batch-slicing invariance: the monitor's reading must
  * not depend on how the feed was chopped into batches. The gate
  * proves the single-batch drain equals the oracle; this forces a
  * MULTI-batch replay (one file per trigger over a split landing dir)
  * and asserts the same equality against the batch recomputation. */
class StreamingEwmaSpec extends SparkSpec {

  test("q251: forced multi-batch replay equals the batch recurrence") {
    val dir = sf("sf0.001")
    val landing = Files.createTempDirectory("graft-ewma-landing").toString
    val events = Tables.events(spark, dir).cache()
    events.repartition(4).write.mode("overwrite").parquet(landing)

    val raw = spark.readStream
      .schema(events.schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(landing)
    val agg = raw
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(sum(Portable.cents2(col("value"))).as("cents"))
    val name = "ewma_multibatch_sink"
    val q = agg.writeStream
      .outputMode("complete")
      .format("memory")
      .queryName(name)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    assert(q.recentProgress.count(_.numInputRows > 0) >= 4,
      "replay did not actually split into multiple micro-batches")

    val got = Analytics.ewmaFrom(spark.table(name), Seq("event_type"))
      .orderBy("event_type", "day").collect().toSeq
    val want = Analytics.ewmaFrom(
        events.groupBy(col("event_type"), to_date(col("ts")).as("day"))
          .agg(sum(Portable.cents2(col("value"))).as("cents")),
        Seq("event_type"))
      .orderBy("event_type", "day").collect().toSeq
    assert(got.nonEmpty && got == want,
      "multi-batch reading diverged from the batch recurrence")
    events.unpersist()
  }
}
