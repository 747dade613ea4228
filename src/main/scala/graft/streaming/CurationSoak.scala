package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types._

/** Sustained soak of the CONTINUOUS curation maintainer (q162's shape
  * under `Trigger.ProcessingTime`) — proves the delta-sized state
  * commits hold up as a RUNNING process, not just over the gated
  * two-batch replay:
  *
  *   - a feeder thread lands one doc-delta parquet file per tick
  *     (adds + re-crawls + tombstones) on the file source, after an
  *     initial corpus-sized seed file;
  *   - every micro-batch runs ONE incremental step and commits ONLY
  *     its keyed deltas ([[StreamingCuration.applyBatch]] — the exact
  *     code path the gate verifies);
  *   - measurement: steady-state docs/s between first and last
  *     progress events (warmup excluded, the Soak discipline), and
  *     per-batch state-commit BYTES read back from the DeltaLog epoch
  *     dirs — the artifact that shows write I/O scales with the delta,
  *     not the accumulated corpus.
  *
  * Usage: runMain graft.streaming.CurationSoak [secs] [docsPerTick]
  */
object CurationSoak {

  private val wordPool: Array[String] = Array(
    "spark", "query", "table", "scan", "merge", "join", "filter", "agg",
    "window", "stream", "batch", "sort", "hash", "key", "row", "column",
    "data", "value", "group", "order", "part", "line", "vector", "dup",
    "fast", "slow", "big", "small", "customer", "the", "a", "of")

  private def docText(id: Long, salt: Int): String = {
    val rnd = new scala.util.Random(id * 7919 + salt)
    (0 until 60).map(_ => wordPool(rnd.nextInt(wordPool.length)))
      .mkString(" ")
  }

  def main(args: Array[String]): Unit = {
    val secs = args.headOption.map(_.toInt).getOrElse(60)
    val perTick = args.lift(1).map(_.toInt).getOrElse(200)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = graft.util.Sessions.withGraftDefaults(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val pid = ProcessHandle.current().pid()
    val root = s"/tmp/graft-cursoak-p$pid"
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(root))
    FixtureStaging.deleteOnExit(root)
    val land = s"$root/landing"
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(land))

    val docSchema = StructType(Seq(
      StructField("doc_id", LongType), StructField("lang", StringType),
      StructField("text", StringType), StructField("deleted", BooleanType)))

    // tiny fixed benchmark registry for the decontamination stage
    val eval = (0L until 20L).map(i => (i * 1000 + 7, docText(i, 999)))
      .toDF("doc_id", "text")

    val fileSeq = new java.util.concurrent.atomic.AtomicLong(0)
    val nextId = new java.util.concurrent.atomic.AtomicLong(0)
    // single-threaded mutation: seeded on the main thread BEFORE the
    // feeder starts; only the feeder touches it afterwards
    val live = scala.collection.mutable.ArrayBuffer[Long]()
    def land1(df: DataFrame): Unit = {
      val n = fileSeq.getAndIncrement()
      val tmp = java.nio.file.Files.createTempDirectory("cursoak").toString
      df.coalesce(1).write.mode("overwrite").parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .filter(_.getName.endsWith(".parquet")).head
      java.nio.file.Files.move(part.toPath,
        java.nio.file.Paths.get(f"$land/$n%06d.parquet"))
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(tmp))
    }
    def mkDocs(ids: Seq[Long], salt: Int): DataFrame =
      ids.map(i => (i, if (i % 5 == 0) "es" else "en", docText(i, salt), false))
        .toDF("doc_id", "lang", "text", "deleted")

    // seed corpus (batch 0 — its delta IS the corpus)
    val seedIds = (0L until 2000L)
    live ++= seedIds
    land1(mkDocs(seedIds, 0))
    nextId.set(2000L)

    // feeder: one delta file per second — adds, re-crawls, tombstones
    val stop = new java.util.concurrent.atomic.AtomicBoolean(false)
    val feeder = new Thread(() => {
      val rnd = new scala.util.Random(42)
      while (!stop.get()) {
        val adds = (0 until perTick).map(_ => nextId.getAndIncrement())
        live ++= adds
        val pool = live.toArray
        val recrawl = (0 until perTick / 10)
          .map(_ => pool(rnd.nextInt(pool.length))).distinct
        val gone = (0 until perTick / 20)
          .map(_ => pool(rnd.nextInt(pool.length)))
          .distinct.filterNot(recrawl.contains)
        live --= gone
        val tombs = gone.map(g => (g, null.asInstanceOf[String],
          null.asInstanceOf[String], true))
          .toDF("doc_id", "lang", "text", "deleted")
        land1(mkDocs(adds ++ recrawl, salt = rnd.nextInt(1 << 20))
          .unionByName(tombs))
        Thread.sleep(1000)
      }
    })

    // Soak-discipline measurement: clock runs between first and last
    // progress events; the seed batch is the excluded warmup
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
        if (firstNanos.compareAndSet(0L, now)) return
        if (e.progress.numInputRows == 0) return // idle trigger
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

    // per-epoch committed bytes, sampled immediately after each batch —
    // DeltaLog compaction deletes folded epoch dirs later, so an
    // end-of-run scan would under-count
    val epochBytes =
      new java.util.concurrent.ConcurrentHashMap[Long, Long]()
    def sampleEpoch(e: Long): Unit = {
      val tables = Seq("corpus", "verdicts", "sigs", "pairs", "comp", "status")
      val total = tables.map { t =>
        val d = new java.io.File(f"$root/state/$t/e$e%010d")
        if (d.exists())
          org.apache.commons.io.FileUtils.sizeOfDirectory(d) else 0L
      }.sum
      epochBytes.put(e, total)
    }

    val q = spark.readStream
      .schema(docSchema)
      .option("maxFilesPerTrigger", 1)
      .parquet(land)
      .writeStream
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        StreamingCuration.applyBatch(spark, root, eval, batch, batchId)
        sampleEpoch(batchId)
        ()
      }
      .option("checkpointLocation", s"$root/ckpt")
      .trigger(Trigger.ProcessingTime("1 second"))
      .start()
    feeder.start()
    Thread.sleep(secs * 1000L)
    stop.set(true)
    feeder.join()
    // stop() interrupts the in-flight batch; DeltaLog's marker-last
    // commits make the abort harmless (the half-written epoch has no
    // _READY and is invisible), so the termination error is expected
    q.stop()
    try q.awaitTermination()
    catch { case _: org.apache.spark.sql.streaming.StreamingQueryException => () }
    spark.streams.removeListener(listener)

    import scala.jdk.CollectionConverters._
    val eb = epochBytes.asScala.toMap
    val deltaEpochs = eb.filter(_._1 > 0)
    val corpusRows = graft.sources.DeltaLog
      .read(spark, s"$root/state/corpus", Seq("doc_id"))
      .map(_.count()).getOrElse(0L)
    val elapsed = (lastNanos.get() - firstNanos.get()) / 1e9
    require(elapsed > 0, "fewer than two progress events — run longer")
    val avgMs = if (nBatches.get() > 0) msSum.get() / nBatches.get() else 0L
    val avgDeltaBytes =
      if (deltaEpochs.nonEmpty) deltaEpochs.values.sum / deltaEpochs.size else 0L
    println(
      s"""{"metric":"curation_soak_docs_per_sec",""" +
      s""""value":${(rowsAcc.get() / elapsed).round},"unit":"docs/sec",""" +
      s""""elapsed_sec":${elapsed.round},"input_docs":${rowsAcc.get()},""" +
      s""""n_batches":${nBatches.get()},"avg_batch_ms":$avgMs,""" +
      s""""max_batch_ms":${msMax.get()},""" +
      s""""final_corpus_docs":$corpusRows,""" +
      s""""seed_commit_bytes":${eb.getOrElse(0L, 0L)},""" +
      s""""avg_delta_commit_bytes":$avgDeltaBytes,""" +
      s""""max_delta_commit_bytes":${
        if (deltaEpochs.nonEmpty) deltaEpochs.values.max else 0L}}""")
    spark.stop()
  }
}
