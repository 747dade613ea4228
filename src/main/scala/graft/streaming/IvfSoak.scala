package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types._

/** Sustained soak of the CONTINUOUS IVF index maintainer (q235's shape
  * under `Trigger.ProcessingTime`) — proves the delta-sized index
  * commits hold as a RUNNING process, not just over the gated
  * two-batch replay:
  *
  *   - a feeder thread lands one vector-delta parquet per tick
  *     (appends + tombstones; every fifth append duplicates its
  *     predecessor so clusters actually form and re-closure runs);
  *   - every micro-batch applies ONE [[VectorOps.ivfEpochStep]] via
  *     [[StreamingIvfMaintainer.applyBatch]] — the exact code path the
  *     q235 gate verifies — committing only keyed deltas to the four
  *     DeltaLog state tables;
  *   - measurement: steady-state vectors/s between first and last
  *     progress events (seed batch excluded as warmup), and per-batch
  *     state-commit BYTES read back from the epoch dirs — the artifact
  *     showing write I/O scales with the delta, not the index.
  *
  * Usage: runMain graft.streaming.IvfSoak [secs] [vecsPerTick]
  */
object IvfSoak {

  private val Dim = 64

  private def vecOf(id: Long): Array[Float] = {
    // every fifth id duplicates its predecessor: near-dup clusters
    // exist, so tombstones and appends actually touch components
    val base = if (id % 5 == 1 && id > 0) id - 1 else id
    val rnd = new scala.util.Random(base * 6364136223846793005L + 1442695040888963407L)
    Array.fill(Dim)(rnd.nextFloat() * 2f - 1f)
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
    val root = s"/tmp/graft-ivfsoak-p$pid"
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(root))
    FixtureStaging.deleteOnExit(root)
    val land = s"$root/landing"
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(land))

    val vecSchema = StructType(Seq(
      StructField("vec_id", LongType),
      StructField("embedding", ArrayType(FloatType)),
      StructField("deleted", BooleanType)))

    val fileSeq = new java.util.concurrent.atomic.AtomicLong(0)
    val nextId = new java.util.concurrent.atomic.AtomicLong(0)
    // single-threaded mutation: seeded on the main thread BEFORE the
    // feeder starts; only the feeder touches it afterwards
    val live = scala.collection.mutable.ArrayBuffer[Long]()
    def land1(df: DataFrame): Unit = {
      val n = fileSeq.getAndIncrement()
      val tmp = java.nio.file.Files.createTempDirectory("ivfsoak").toString
      df.coalesce(1).write.mode("overwrite").parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .filter(_.getName.endsWith(".parquet")).head
      java.nio.file.Files.move(part.toPath,
        java.nio.file.Paths.get(f"$land/$n%06d.parquet"))
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(tmp))
    }
    def mkVecs(ids: Seq[Long]): DataFrame =
      ids.map(i => (i, vecOf(i), false)).toDF("vec_id", "embedding", "deleted")

    // seed index (batch 0 — the one corpus-sized build)
    val seedIds = (0L until 2000L)
    live ++= seedIds
    land1(mkVecs(seedIds))
    nextId.set(2000L)

    // feeder: one delta file per second — appends + tombstones
    val stop = new java.util.concurrent.atomic.AtomicBoolean(false)
    val feeder = new Thread(() => {
      val rnd = new scala.util.Random(42)
      while (!stop.get()) {
        val adds = (0 until perTick).map(_ => nextId.getAndIncrement())
        live ++= adds
        val pool = live.toArray
        val gone = (0 until perTick / 20)
          .map(_ => pool(rnd.nextInt(pool.length)))
          .distinct.filterNot(adds.contains)
        live --= gone
        val tombs = gone
          .map(g => (g, null.asInstanceOf[Array[Float]], true))
          .toDF("vec_id", "embedding", "deleted")
        land1(mkVecs(adds).unionByName(tombs))
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
    // DeltaLog compaction deletes folded epoch dirs later
    val epochBytes =
      new java.util.concurrent.ConcurrentHashMap[Long, Long]()
    def sampleEpoch(e: Long): Unit = {
      val tables = Seq("centroids", "assigned", "pairs", "comp")
      val total = tables.map { t =>
        val d = new java.io.File(f"$root/state/$t/e$e%010d")
        if (d.exists())
          org.apache.commons.io.FileUtils.sizeOfDirectory(d) else 0L
      }.sum
      epochBytes.put(e, total)
    }

    val q = spark.readStream
      .schema(vecSchema)
      .option("maxFilesPerTrigger", 1)
      .parquet(land)
      .writeStream
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        StreamingIvfMaintainer.applyBatch(spark, root, batch, batchId)
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
    // CODA EPOCH: one single-tombstone delta — the clean delta-sized
    // publish data point (touched cids = that vector's nProbe
    // assignments; publish rewrites only their buckets), reported
    // separately from the steady-state epochs whose 200-vector deltas
    // legitimately touch most of the K=16 clusters (the fixed-K cap
    // regime; at adaptive K the steady state looks like this coda)
    def publogLines(): Seq[String] = {
      val p = java.nio.file.Paths.get(s"$root/published/assigned/_publog")
      if (!java.nio.file.Files.exists(p)) Seq.empty
      else new String(java.nio.file.Files.readAllBytes(p), "UTF-8")
        .linesIterator.toSeq
    }
    val codaId = live.head
    land1(Seq((codaId, null.asInstanceOf[Array[Float]], true))
      .toDF("vec_id", "embedding", "deleted"))
    // files process 1:1 per trigger in landing order, so the coda's
    // batch id is the last landed file's sequence number — wait for
    // ITS publog line (any earlier line is just backlog draining)
    val codaEpoch = fileSeq.get() - 1
    // the 1 file/s feed outpaces ~4 s batches, so a backlog drains
    // first; budget generously — the wait is bounded by the queue
    val deadline = System.nanoTime() + 420L * 1000 * 1000 * 1000
    while (!publogLines().exists(_.startsWith(s"epoch=$codaEpoch "))
        && System.nanoTime() < deadline)
      Thread.sleep(500)
    // stop() interrupts the in-flight batch; DeltaLog's marker-last
    // commits make the abort harmless (no _READY → invisible)
    q.stop()
    try q.awaitTermination()
    catch { case _: org.apache.spark.sql.streaming.StreamingQueryException => () }
    spark.streams.removeListener(listener)

    import scala.jdk.CollectionConverters._
    val eb = epochBytes.asScala.toMap
    val deltaEpochs = eb.filter(_._1 > 0)
    val indexRows = graft.sources.DeltaLog
      .read(spark, s"$root/state/assigned", Seq("vec_id", "cid"))
      .map(_.count()).getOrElse(0L)
    val elapsed = (lastNanos.get() - firstNanos.get()) / 1e9
    require(elapsed > 0, "fewer than two progress events — run longer")
    val avgMs = if (nBatches.get() > 0) msSum.get() / nBatches.get() else 0L
    val avgDeltaBytes =
      if (deltaEpochs.nonEmpty) deltaEpochs.values.sum / deltaEpochs.size else 0L
    // publish-side cost from the artifact's own _publog: the seed line
    // is the one index-sized write; every epoch line must be
    // delta-sized (affected buckets only) — the evidence that keeping
    // the READ artifact fresh costs delta I/O, not index I/O
    case class Pub(epoch: Long, files: Int, bytes: Long)
    val pubLines = {
      val p = java.nio.file.Paths.get(s"$root/published/assigned/_publog")
      if (!java.nio.file.Files.exists(p)) Seq.empty[Pub]
      else new String(java.nio.file.Files.readAllBytes(p), "UTF-8")
        .linesIterator.toSeq.map { l =>
          val kv = l.split(" ").map(_.split("=", 2))
            .map(a => a(0) -> a.lift(1).getOrElse("")).toMap
          Pub(kv("epoch").toLong, kv("files").toInt, kv("bytes").toLong)
        }
    }
    val seedPub = pubLines.find(_.epoch == 0L).map(_.bytes).getOrElse(0L)
    // the coda is the single-tombstone delta, reported on its own; the
    // steady-state average excludes it
    val codaPub = pubLines.find(_.epoch == codaEpoch)
    val epochPubs = pubLines.filter(p =>
      p.epoch > 0L && p.epoch != codaEpoch)
    val avgPubBytes =
      if (epochPubs.nonEmpty) epochPubs.map(_.bytes).sum / epochPubs.size
      else 0L
    val avgPubFiles =
      if (epochPubs.nonEmpty)
        epochPubs.map(_.files).sum.toDouble / epochPubs.size
      else 0.0
    println(
      s"""{"metric":"ivf_soak_vecs_per_sec",""" +
      s""""value":${(rowsAcc.get() / elapsed).round},"unit":"vecs/sec",""" +
      s""""elapsed_sec":${elapsed.round},"input_vecs":${rowsAcc.get()},""" +
      s""""n_batches":${nBatches.get()},"avg_batch_ms":$avgMs,""" +
      s""""max_batch_ms":${msMax.get()},""" +
      s""""final_index_rows":$indexRows,""" +
      s""""seed_commit_bytes":${eb.getOrElse(0L, 0L)},""" +
      s""""avg_delta_commit_bytes":$avgDeltaBytes,""" +
      s""""max_delta_commit_bytes":${
        if (deltaEpochs.nonEmpty) deltaEpochs.values.max else 0L},""" +
      s""""seed_publish_bytes":$seedPub,""" +
      s""""avg_epoch_publish_bytes":$avgPubBytes,""" +
      f""""avg_epoch_publish_files":$avgPubFiles%.1f,""" +
      s""""coda_tombstone_publish_bytes":${
        codaPub.map(_.bytes).getOrElse(0L)},""" +
      s""""coda_tombstone_publish_files":${
        codaPub.map(_.files).getOrElse(0)},""" +
      s""""final_index_publish_bytes":${
        Option(new java.io.File(s"$root/published/assigned").listFiles())
          .getOrElse(Array.empty[java.io.File])
          .filter(_.getName.endsWith(".parquet")).map(_.length()).sum}}""")
    spark.stop()
  }
}
