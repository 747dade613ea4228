package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types._

import graft.operators.IncrementalCuration

/** CONTINUOUS incremental curation (q162) — q157's day-2 delta run as a
  * running process: document batches (upserts + tombstones) land on a
  * file source, and every micro-batch applies ONE incremental step
  * ([[IncrementalCuration.incrementalStep]]) against the persisted
  * artifact tables via `foreachBatch`, exactly the maintainer a living
  * corpus deploys:
  *
  *   - batch 0 seeds the prev snapshot (every doc "added" to an empty
  *     corpus — the incremental step degenerates to the full chain);
  *   - batch 1 delivers the snapshot delta: added + re-crawled docs as
  *     upserts, removed docs as TOMBSTONES (`deleted = true`) — the
  *     CDC convention for retraction on an append-only transport;
  *   - each step persists the updated corpus + artifacts (verdicts,
  *     signatures, pairs, component labels) under a per-batch state dir
  *     with a `_READY` marker — the crash-safe handoff to the next
  *     batch, ForeachBatchMerge's epoch discipline.
  *
  * After the drain, the verdict table must equal q157's — and therefore
  * the oracle's FULL recompute of the current snapshot — bit-for-bit:
  * the gate proves batch-incremental ≡ stream-incremental ≡ full.
  *
  * Scale: per batch the work is delta-sized (the q157 argument); state
  * tables are parquet dirs here and real tables in deployment. The
  * file source with `maxFilesPerTrigger = 1` pins the batch boundary
  * deterministically (files carry strictly increasing mtimes).
  */
object StreamingCuration {

  private val docSchema = StructType(Seq(
    StructField("doc_id", LongType), StructField("lang", StringType),
    StructField("text", StringType), StructField("deleted", BooleanType)))

  /** Stage the two-batch landing dir per fixture signature (shared
    * staged-dir protocol): b0 = prev snapshot, b1 = delta upserts +
    * tombstones, mtimes ascending so the file source replays in order. */
  private def stagedLanding(spark: SparkSession, dir: String): String =
    FixtureStaging.stageOnce("curstream", s"$dir/documents.parquet",
      "/tmp/graft-curstream") { d =>
      import java.nio.file.Files
      val prev = IncrementalCuration.snapshotPrev(spark, dir)
        .withColumn("deleted", lit(false))
      val cur = IncrementalCuration.snapshotCur(spark, dir)
      // delta: additions (in cur, not prev), re-crawls (text changed),
      // and tombstones for removals (in prev, not cur)
      val adds = cur.filter(col("doc_id") % 6 === 0)
      val changes = cur.filter(col("doc_id") % 11 === 0
        && col("doc_id") % 6 =!= 0)
      val tombs = prev.select("doc_id").filter(col("doc_id") % 7 === 0)
        .select(col("doc_id"), lit(null).cast("string").as("lang"),
          lit(null).cast("string").as("text"))
      val delta = adds.unionByName(changes).withColumn("deleted", lit(false))
        .unionByName(tombs.withColumn("deleted", lit(true)))
      def land(df: DataFrame, name: String, mtime: Long): Unit = {
        val tmp = Files.createTempDirectory("graft-curstream").toString
        df.coalesce(1).write.mode("overwrite").parquet(tmp)
        val part = new java.io.File(tmp).listFiles()
          .filter(_.getName.endsWith(".parquet")).head
        Files.copy(part.toPath, d.resolve(name))
        d.resolve(name).toFile.setLastModified(mtime)
        org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(tmp))
      }
      val t0 = System.currentTimeMillis() - 60000
      land(prev, "0000_seed.parquet", t0)
      land(delta, "0001_delta.parquet", t0 + 30000)
    }

  /** Drain the two-batch replay and return the final verdict table —
    * identical contract (and oracle) to q157. */
  def curationStream(spark: SparkSession, dir: String): DataFrame = {
    import java.nio.file.{Files, Paths}
    val land = stagedLanding(spark, dir)
    val key = FixtureStaging.key("curstream-state", s"$dir/documents.parquet")
    val pid = ProcessHandle.current().pid()
    val root = s"/tmp/graft-curstream-run-$key-p$pid"
    // the scenario replays from scratch every invocation (deterministic
    // end state); state + checkpoint live and die together, and the
    // per-pid root is removed on JVM exit so runs don't accumulate
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(root))
    FixtureStaging.deleteOnExit(root)
    val eval = IncrementalCuration.evalRegistry(spark, dir)

    // driver-held pointer to the latest committed state dir
    val latest = new java.util.concurrent.atomic.AtomicReference[String](null)

    def readState(path: String) = (
      spark.read.parquet(s"$path/corpus"),
      IncrementalCuration.PrevArtifacts(
        verdicts = spark.read.parquet(s"$path/verdicts"),
        sigs = spark.read.parquet(s"$path/sigs"),
        pairs = spark.read.parquet(s"$path/pairs"),
        comp = spark.read.parquet(s"$path/comp")))

    val q = spark.readStream
      .schema(docSchema)
      .option("maxFilesPerTrigger", 1)
      .parquet(land)
      .writeStream
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val (prevCorpus, prevArt) = Option(latest.get()) match {
          case Some(p) => readState(p)
          case None => (
            spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
              StructType(docSchema.fields.take(3))),
            IncrementalCuration.emptyArtifacts(spark))
        }
        val ups = batch.filter(!col("deleted"))
          .select("doc_id", "lang", "text")
        val ids = batch.select("doc_id")
        val cur = prevCorpus.join(ids, Seq("doc_id"), "left_anti")
          .unionByName(ups)
          .localCheckpoint() // the step reads it many times
        val res = IncrementalCuration
          .incrementalStep(prevArt, prevCorpus, cur, eval)
        val out = s"$root/state/b$batchId"
        cur.write.mode("overwrite").parquet(s"$out/corpus")
        res.artifacts.verdicts.write.mode("overwrite").parquet(s"$out/verdicts")
        res.artifacts.sigs.write.mode("overwrite").parquet(s"$out/sigs")
        res.artifacts.pairs.write.mode("overwrite").parquet(s"$out/pairs")
        res.artifacts.comp.write.mode("overwrite").parquet(s"$out/comp")
        res.verdicts.write.mode("overwrite").parquet(s"$out/result")
        Files.createFile(Paths.get(s"$out/_READY")) // commit marker last
        latest.set(out)
        ()
      }
      .option("checkpointLocation", s"$root/ckpt")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()

    spark.read.parquet(s"${latest.get()}/result").orderBy("doc_id")
  }
}
