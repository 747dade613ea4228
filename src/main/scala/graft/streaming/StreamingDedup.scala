package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Streaming deduplication — the ingestion-side twin of the batch exact
  * dedup (q12): at-least-once transports (Kafka redelivery, file-source
  * replays) hand the engine duplicate events, and the stream must emit
  * each logical event exactly once.
  *
  * `dropDuplicatesWithinWatermark` keys state by `event_id` and drops
  * state for keys older than the watermark — state is bounded by the
  * duplicate-arrival horizon (how far apart duplicates can land), NOT by
  * stream history, which is what makes it deployable at 100 TB/day: an
  * unbounded `dropDuplicates` would accrete every id ever seen.
  *
  * The verify scenario makes the duplication REAL: the staged source
  * directory contains the events file twice (two symlinks), so the
  * file stream delivers every event exactly twice; the deduped per-type
  * counts must equal the batch distinct counts — which is the oracle.
  */
object StreamingDedup {

  /** Stage a landing dir with the events file TWICE (simulated
    * at-least-once redelivery of the whole topic). */
  private def dupDir(dir: String): String = {
    import java.nio.file.{Files, Paths}
    val key = java.util.UUID.nameUUIDFromBytes(("dup:" + dir).getBytes)
      .toString.take(8)
    val d = Paths.get(s"/tmp/graft-stream-dup-$key")
    if (!Files.exists(d)) {
      Files.createDirectories(d)
      Files.createSymbolicLink(d.resolve("events_a.parquet"),
        Paths.get(s"$dir/events.parquet"))
      Files.createSymbolicLink(d.resolve("events_b.parquet"),
        Paths.get(s"$dir/events.parquet"))
    }
    d.toString
  }

  /** Per-type counts after exactly-once dedup of a doubled stream. */
  def dedupedCounts(spark: SparkSession, dir: String): DataFrame = {
    val deduped = spark.readStream
      .schema(StreamingFunnel.rawSchema)
      .parquet(dupDir(dir))
      .withColumn("ts", timestamp_micros(expr("ts DIV 1000")))
      .withWatermark("ts", "1 hour")
      .dropDuplicatesWithinWatermark("event_id")
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_events"))

    val name = "streaming_dedup_sink"
    val q = deduped.writeStream
      .outputMode("update")
      .format("memory")
      .queryName(name)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()

    // update-mode sink holds one row per trigger per key: keep the max
    spark.table(name)
      .groupBy("event_type").agg(max(col("n_events")).as("n_events"))
      .orderBy("event_type")
  }
}
