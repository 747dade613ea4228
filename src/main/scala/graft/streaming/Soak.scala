package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.operators.Events

/** Sustained-throughput soak (BASELINE.md): the streaming funnel under
  * `Trigger.ProcessingTime` with a rate-limited unbounded source — the
  * one reference-derived perf floor (README.md:154 claims 1M events/day
  * ≈ 12 events/s) never measured under non-drain conditions.
  *
  * Shape under test is the production funnel: an unbounded source
  * (`rate`, the broker stand-in — swap `.format` for kafka and nothing
  * else changes), a scan-local projection shaping offsets into events,
  * a stream-static broadcast join against the stage dimension, and a
  * watermarked sliding-window count/sum aggregation. Sink is `noop`, so
  * the number measures the ENGINE, not a sink.
  *
  * Backpressure semantics: `rowsPerSecond` is the offered load. The
  * engine keeps up iff batch durations stay under the trigger interval;
  * the printed `events_per_sec` is rows actually processed / wall time,
  * and `avg_batch_ms`/`max_batch_ms` expose whether the pipeline was
  * saturated or idling. State stays bounded by the watermark horizon ×
  * window count regardless of run length — the property that lets this
  * run for days, sampled here for `secs` seconds.
  *
  * Usage: runMain graft.streaming.Soak [secs] [rowsPerSecond]
  */
object Soak {
  def main(args: Array[String]): Unit = {
    val secs = args.headOption.map(_.toInt).getOrElse(120)
    val rate = args.lift(1).map(_.toInt).getOrElse(500000)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = graft.util.Sessions.withGraftDefaults(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    import spark.implicits._
    val stages = Events.stages.map(_._1)
    val stageDf = broadcast(Events.stages.toDF("stage", "stage_rank"))

    val src = spark.readStream.format("rate")
      .option("rowsPerSecond", rate)
      .option("numPartitions", cpus.toInt)
      .load() // (timestamp, value)
    val events = src.select(
      col("timestamp").as("ts"),
      col("value").as("event_id"),
      pmod(col("value"), lit(9973L)).as("user_id"),
      element_at(
        array(stages.map(lit): _*),
        (pmod(col("value"), lit(stages.length.toLong)) + 1).cast("int"))
        .as("event_type"),
      pmod(col("value"), lit(100L)).cast("double").as("value"))
    val agg = events
      .withWatermark("ts", "10 seconds")
      .join(stageDf, col("event_type") === col("stage"))
      .groupBy(window(col("ts"), "10 seconds", "5 seconds"),
        col("stage"), col("stage_rank"))
      .agg(count(lit(1)).as("n_events"), sum(col("value")).as("stage_value"))

    // accumulate EVERY progress event via a listener — `recentProgress`
    // retains only the last ~100 entries, which silently undercounts any
    // run longer than ~100 triggers
    // steady-state window: the clock starts at the FIRST progress event
    // (end of the warmup batch, whose rows are excluded) and stops at the
    // last one — sleep + stop()/awaitTermination drain time and first-
    // batch warmup would otherwise bias the reported throughput in a
    // direction that depends on whether the final batch lands before
    // stop()
    val rowsAcc = new java.util.concurrent.atomic.AtomicLong(0)
    val nBatches = new java.util.concurrent.atomic.AtomicLong(0)
    val msSum = new java.util.concurrent.atomic.AtomicLong(0)
    val msMax = new java.util.concurrent.atomic.AtomicLong(0)
    val firstNanos = new java.util.concurrent.atomic.AtomicLong(0)
    val lastNanos = new java.util.concurrent.atomic.AtomicLong(0)
    val listener = new org.apache.spark.sql.streaming.StreamingQueryListener {
      override def onQueryStarted(
          e: org.apache.spark.sql.streaming.StreamingQueryListener.QueryStartedEvent): Unit = ()
      override def onQueryProgress(
          e: org.apache.spark.sql.streaming.StreamingQueryListener.QueryProgressEvent): Unit = {
        val now = System.nanoTime()
        if (firstNanos.compareAndSet(0L, now)) return // warmup batch: starts the clock, rows excluded
        lastNanos.set(now)
        rowsAcc.addAndGet(e.progress.numInputRows)
        val ms = e.progress.durationMs.getOrDefault("triggerExecution", 0L).longValue
        if (ms > 0) {
          nBatches.incrementAndGet()
          msSum.addAndGet(ms)
          msMax.accumulateAndGet(ms, Math.max(_, _))
        }
      }
      override def onQueryTerminated(
          e: org.apache.spark.sql.streaming.StreamingQueryListener.QueryTerminatedEvent): Unit = ()
    }
    spark.streams.addListener(listener)

    val q = agg.writeStream
      .outputMode("update")
      .format("noop")
      .trigger(Trigger.ProcessingTime("1 second"))
      .start()
    Thread.sleep(secs * 1000L)
    q.stop()
    q.awaitTermination()
    spark.streams.removeListener(listener)
    val elapsed = (lastNanos.get() - firstNanos.get()) / 1e9
    require(elapsed > 0, "fewer than two progress events — run longer")

    val rows = rowsAcc.get()
    val avgMs = if (nBatches.get() > 0) msSum.get() / nBatches.get() else 0L
    val maxMs = msMax.get()
    println(
      s"""{"metric":"soak_events_per_sec","value":${(rows / elapsed).round},""" +
      s""""unit":"rows/sec","offered_rows_per_sec":$rate,""" +
      s""""elapsed_sec":${elapsed.round},"input_rows":$rows,""" +
      s""""n_batches":${nBatches.get()},"avg_batch_ms":$avgMs,""" +
      s""""max_batch_ms":$maxMs}""")
    spark.stop()
  }
}
