package graft

import org.apache.spark.sql.functions._

import graft.sources.v2.AuditSink

/** DSv2 write-side sink: per-task metrics travel as commit messages;
  * the driver-side report must equal batch-computed counts, appends
  * must accumulate, and truncate must reset the slot.
  */
class AuditSinkSpec extends SparkSpec {

  private val dir = sf("sf0.001")

  test("audit metrics equal batch null/row counts; append accumulates; truncate resets") {
    val ev = graft.sources.Tables.events(spark, dir)
    val expectedRows = ev.count()
    val expectedNulls = ev.schema.fieldNames.map(f =>
      f -> ev.filter(col(f).isNull).count()).toMap

    ev.write.format("graft-audit").option("name", "spec1")
      .mode("append").save()
    val r1 = AuditSink.report("spec1").get
    assert(r1.rows == expectedRows)
    assert(r1.nullCounts == expectedNulls)
    assert(r1.commits == 1L)

    // append again: metrics accumulate across commits
    ev.write.format("graft-audit").option("name", "spec1")
      .mode("append").save()
    val r2 = AuditSink.report("spec1").get
    assert(r2.rows == expectedRows * 2)
    assert(r2.commits == 2L)

    // overwrite (truncate capability): slot resets instead of accumulating
    ev.limit(10).write.format("graft-audit").option("name", "spec1")
      .mode("overwrite").save()
    val r3 = AuditSink.report("spec1").get
    assert(r3.rows == 10L)
    assert(r3.commits == 1L)
  }

  test("streaming write: drained stream metrics equal the batch counts") {
    val ev = graft.sources.Tables.events(spark, dir)
    val ckpt = java.nio.file.Files
      .createTempDirectory("audit-stream-ckpt").toString
    val q = graft.streaming.StreamingFunnel.eventsStream(spark, dir)
      .writeStream.format("graft-audit").option("name", "specStream")
      .option("checkpointLocation", ckpt)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val r = AuditSink.report("specStream").get
    assert(r.rows == ev.count())
    assert(r.nullCounts("event_type") ==
      ev.filter(col("event_type").isNull).count())
  }
}
