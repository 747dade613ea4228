package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types._

/** Sustained soak of the SEGMENT-published BM25 store (q328's shape
  * under `Trigger.ProcessingTime`) — proves the Lucene storage model
  * holds as a RUNNING process, not just over the gated two-batch
  * replay:
  *
  *   - a feeder thread lands one document-delta parquet per tick
  *     (upserts + replacements of earlier docs + tombstones — the
  *     full mention vocabulary the resolve has to handle);
  *   - every micro-batch appends ONE immutable segment via
  *     [[SegmentedBm25Index.applySegment]] and then runs the
  *     auto-compaction policy [[SegmentedBm25Index.maybeCompact]] —
  *     the exact maintainer-loop code path the q328 drain runs;
  *   - measurement: docs/s through the store, the MAXIMUM live
  *     segment count ever observed (the policy's bound: must stay
  *     ≤ maxSegments + 1 under continuous epochs), how many folds
  *     fired, and — the serve-invariance coda — the full serve result
  *     hashed immediately before and after a FORCED final compaction
  *     (must be identical: the merge changes representation, never
  *     results).
  *
  * Usage: runMain graft.streaming.Bm25SegmentSoak [secs] [docsPerTick]
  */
object Bm25SegmentSoak {

  private def textOf(id: Long, gen: Int): String = {
    val rnd = new scala.util.Random(
      id * 6364136223846793005L + gen * 1442695040888963407L)
    val n = 20 + rnd.nextInt(30)
    (0 until n).map(_ => s"w${rnd.nextInt(500)}").mkString(" ")
  }

  def main(args: Array[String]): Unit = {
    val secs = args.headOption.map(_.toInt).getOrElse(60)
    val docsPerTick = args.drop(1).headOption.map(_.toInt).getOrElse(200)
    val spark = graft.util.Sessions.withGraftDefaults(SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")}]")
      .config("spark.sql.shuffle.partitions", "8"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val base = java.nio.file.Files
      .createTempDirectory("graft-bm25seg-soak").toString
    FixtureStaging.deleteOnExit(base)
    val landing = s"$base/landing"
    val root = s"$base/store"
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(landing))
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(root))

    val docSchema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType),
      StructField("deleted", BooleanType)))

    // feeder: each tick upserts a fresh id block, REPLACES a slice of
    // the previous block (same ids, new text), and tombstones a slice
    // of the block before that — every mention class, continuously
    @volatile var stop = false
    val feeder = new Thread(() => {
      var tick = 0L
      while (!stop) {
        val fresh = (0 until docsPerTick).map { i =>
          (tick * docsPerTick + i, textOf(tick * docsPerTick + i, 0), false)
        }
        val replaced =
          if (tick == 0) Nil
          else (0 until docsPerTick / 5).map { i =>
            val id = (tick - 1) * docsPerTick + i
            (id, textOf(id, tick.toInt), false)
          }
        val tombs =
          if (tick < 2) Nil
          else (0 until docsPerTick / 10).map { i =>
            ((tick - 2) * docsPerTick + i, null.asInstanceOf[String], true)
          }
        (fresh ++ replaced ++ tombs).toDF("doc_id", "text", "deleted")
          .coalesce(1).write.mode("overwrite")
          .parquet(s"$base/stage-$tick")
        val src = new java.io.File(s"$base/stage-$tick")
          .listFiles().filter(_.getName.endsWith(".parquet")).head
        java.nio.file.Files.move(src.toPath,
          java.nio.file.Paths.get(s"$landing/batch-$tick.parquet"))
        tick += 1
        Thread.sleep(400)
      }
    })
    feeder.start()

    var maxLive = 0
    var folds = 0
    var epochs = 0L
    var docs = 0L
    val t0 = System.nanoTime()
    val q = spark.readStream.schema(docSchema)
      .option("maxFilesPerTrigger", 1)
      .parquet(landing)
      .writeStream
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val n = batch.count()
        val before = SegmentedBm25Index.segments(root).size
        SegmentedBm25Index.applySegment(spark, root, batch, batchId)
        SegmentedBm25Index.maybeCompact(spark, root)
        val after = SegmentedBm25Index.segments(root).size
        if (after < before + 1) folds += 1
        maxLive = math.max(maxLive, math.max(before + 1, after))
        epochs += 1
        docs += n
      }
      .option("checkpointLocation", s"$base/ckpt")
      .trigger(Trigger.ProcessingTime("400 milliseconds"))
      .start()
    Thread.sleep(secs * 1000L)
    stop = true
    q.stop(); q.awaitTermination(); feeder.join()
    val elapsed = (System.nanoTime() - t0) / 1e9

    def serveHash(): (Long, Int) = {
      val rows = SegmentedBm25Index.servedBm25At(spark, root)
        .collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
      (rows.map(_.hashCode.toLong).sum, rows.length)
    }
    val (hBefore, nBefore) = serveHash()
    SegmentedBm25Index.compact(spark, root)
    val (hAfter, nAfter) = serveHash()
    val identical = hBefore == hAfter && nBefore == nAfter
    require(identical, "serve changed across the final compaction")
    require(nBefore > 0, "empty serve — soak produced no queryable state")

    println(f"""{"soak":"bm25_segment_store","secs":$elapsed%.1f,""" +
      s""""epochs":$epochs,"docs":$docs,""" +
      f""""docs_per_sec":${docs / elapsed}%.1f,""" +
      s""""max_live_segments":$maxLive,""" +
      s""""bound":${SegmentedBm25Index.MaxLiveSegments + 1},""" +
      s""""folds":$folds,"serve_rows":$nBefore,""" +
      s""""serve_identical_across_compaction":$identical}""")
    spark.stop()
  }
}
