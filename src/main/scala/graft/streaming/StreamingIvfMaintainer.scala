package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types._

import graft.operators.{Graphs, VectorOps}
import graft.sources.DeltaLog

/** CONTINUOUS IVF index maintenance (q235) — q233's one-epoch
  * upsert+delete step as a running process: vector batches (upserts +
  * tombstones) land on a file source and every micro-batch applies one
  * [[VectorOps.ivfEpochStep]] against the persisted index state via
  * `foreachBatch`, committing ONLY the epoch's keyed deltas into four
  * log-structured [[DeltaLog]] tables — the deployment shape of a
  * living ANN/dedup index under a CDC feed (GDPR retractions, re-crawl
  * replacements, daily appends):
  *
  *   - batch 0 seeds the index: the full build chain (assign →
  *     bucketed pairs → components) over the first snapshot, with
  *     centroids frozen at the snapshot's first-K and committed as a
  *     state table of their own;
  *   - batch 1+ delivers CDC epochs: upserts assign against the FROZEN
  *     centroids and probe the surviving index, tombstones retire
  *     their assignment and pair rows additively, and only the
  *     affected clusters re-close ([[VectorOps.ivfEpochStep]]'s
  *     composition rules);
  *   - per state table, a batch commits upserts of changed rows and
  *     deletes of retired keys — write I/O is delta-sized, matching
  *     the delta-sized compute; DeltaLog's epoch discipline
  *     (`_READY`-marked epoch dirs, replay-safe `< batchId`
  *     resolution) makes a crashed batch invisible and a replayed one
  *     idempotent, exactly q162's crash story.
  *
  * The gate proves the whole lifecycle: after the drain, the resolved
  * component table must equal q233's one-shot epoch — and therefore
  * the oracle's FULL rebuild over the post-epoch corpus — bit-for-bit
  * (streaming-incremental ≡ staged-incremental ≡ full).
  *
  * Scale: the seed batch is the one corpus-sized write (any index is
  * built once); every later batch touches delta ∪ affected-cluster
  * rows only. State tables are parquet DeltaLogs here and real tables
  * in deployment; auto-compaction bounds the log fold.
  */
object StreamingIvfMaintainer {

  private val NCentroids = 16
  private val Threshold = 0.4
  private val NProbe = 4

  private val vecSchema = StructType(Seq(
    StructField("vec_id", LongType),
    StructField("embedding", ArrayType(FloatType)),
    StructField("deleted", BooleanType)))

  /** Stage the two-batch landing dir per fixture signature: b0 = prev
    * corpus snapshot (vec_id % 6 ≠ 0), b1 = the CDC epoch — appends
    * (% 6 = 0) as upserts plus tombstones for the prev keys with
    * vec_id % 7 = 3 (q231/q233's retraction feed). Mtimes ascend so
    * the file source replays the epochs in order. */
  private def stagedLanding(spark: SparkSession, dir: String): String =
    FixtureStaging.stageOnce("ivfstream", s"$dir/embeddings.parquet",
      "/tmp/graft-ivfstream") { d =>
      import java.nio.file.Files
      val all = graft.sources.Tables.embeddings(spark, dir)
        .select(col("vec_id"), col("embedding"))
      val prev = all.filter(col("vec_id") % 6 =!= 0)
      val seed = prev.withColumn("deleted", lit(false))
      val epoch = all.filter(col("vec_id") % 6 === 0)
        .withColumn("deleted", lit(false))
        .unionByName(prev.filter(col("vec_id") % 7 === 3)
          .select(col("vec_id"),
            lit(null).cast(ArrayType(FloatType)).as("embedding"))
          .withColumn("deleted", lit(true)))
      def land(df: DataFrame, name: String, mtime: Long): Unit = {
        val tmp = Files.createTempDirectory("graft-ivfstream").toString
        df.coalesce(1).write.mode("overwrite").parquet(tmp)
        val part = new java.io.File(tmp).listFiles()
          .filter(_.getName.endsWith(".parquet")).head
        Files.copy(part.toPath, d.resolve(name))
        d.resolve(name).toFile.setLastModified(mtime)
        org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(tmp))
      }
      val t0 = System.currentTimeMillis() - 60000
      land(seed, "0000_seed.parquet", t0)
      land(epoch, "0001_epoch.parquet", t0 + 30000)
    }

  /** Per-run scratch root (state logs + checkpoint), per fixture
    * signature AND pid — exposed so the spec can audit per-batch
    * commit sizes on disk. */
  def runRoot(dir: String): String = {
    val key = FixtureStaging.key("ivfstream-state", s"$dir/embeddings.parquet")
    val pid = ProcessHandle.current().pid()
    s"/tmp/graft-ivfstream-run-$key-p$pid"
  }

  /** In-memory snapshot of the four resolved state tables as of epoch
    * `upTo` (exclusive), each localCheckpointed — the cross-batch
    * cache that removes the per-batch log-resolution floor: a running
    * maintainer resolves from the DeltaLog only on FIRST contact
    * (restart/recovery — the crash story is unchanged, the log stays
    * the source of truth), then advances the snapshot by folding in
    * each epoch's own committed delta (a broadcast anti-join + union —
    * map-only over the in-memory parent, no log re-read, no
    * resolve-shuffle). A replay of an older batch (cache ahead) falls
    * back to the log's `< batchId` snapshot read and never regresses
    * the cache. */
  private case class Snapshot(upTo: Long, centroids: DataFrame,
      assigned: DataFrame, pairs: DataFrame, comp: DataFrame)
  private val snapshots =
    new java.util.concurrent.ConcurrentHashMap[String, Snapshot]()

  /** Advance the cached snapshot monotonically (a replayed older batch
    * recomputes an old snapshot — never let it clobber a newer one). */
  private def advance(root: String, s: Snapshot): Unit =
    snapshots.merge(root, s,
      (old, nw) => if (nw.upTo > old.upTo) nw else old)

  /** stored + one epoch's committed (upserts, deletes) → the next
    * resolved state: touched keys leave, upserts enter. The touched
    * key set is delta-sized → broadcast, so the fold is ONE map-only
    * pass over the stored snapshot. */
  private def foldDelta(stored: DataFrame, delta: Option[
      (DataFrame, Option[DataFrame])], keys: Seq[String]): DataFrame =
    delta match {
      case None => stored
      case Some((ups, dels)) =>
        val k = keys.map(col)
        val touched = ups.select(k: _*)
          .unionByName(dels.map(_.select(k: _*))
            .getOrElse(ups.select(k: _*).limit(0)))
          .distinct()
        stored.join(broadcast(touched), keys, "left_anti")
          .unionByName(ups)
    }

  /** ONE maintainer step: resolve the four state tables as of epochs
    * `< batchId` (from the in-memory snapshot when it is current,
    * from the log on restart/replay), seed on first contact (full
    * build chain), otherwise run [[VectorOps.ivfEpochStep]] and commit
    * only its keyed deltas — then fold those committed deltas into the
    * snapshot so the next batch skips the log resolution. */
  def applyBatch(spark: SparkSession, root: String, batch: DataFrame,
      batchId: Long): Unit = {
    import scala.concurrent.{Await, ExecutionContext, Future}
    import scala.concurrent.duration.Duration
    implicit val ec: ExecutionContext = ExecutionContext.global
    def log(t: String) = s"$root/state/$t"
    // the epoch step consumes assigned twice, pairs thrice and comp
    // three times — each frame is localCheckpointed once per batch
    // (at snapshot-advance time on the hot path, at resolution time on
    // the restart path); the four independent resolutions run
    // concurrently (one resolution latency per batch, not four)
    def resolved(t: String, keys: Seq[String]) = Future(
      DeltaLog.read(spark, log(t), keys, Some(batchId))
        .map(_.localCheckpoint()))
    val rs = Option(snapshots.get(root)).filter(_.upTo == batchId) match {
      case Some(s) =>
        Seq(Some(s.centroids), Some(s.assigned), Some(s.pairs),
          Some(s.comp))
      case None =>
        Await.result(Future.sequence(Seq(
          resolved("centroids", Seq("cid")),
          resolved("assigned", Seq("vec_id", "cid")),
          resolved("pairs", Seq("ida", "idb")),
          resolved("comp", Seq("vec_id")))), Duration.Inf)
    }
    val ups = batch.filter(!col("deleted")).select("vec_id", "embedding")
    rs.head match {
      case None =>
        // seed epoch: the full build chain — the one corpus-sized
        // commit an index pays exactly once in its life
        val cents = VectorOps.centroidsOf(ups, NCentroids)
        val assigned = VectorOps
          .assignWithCentroids(spark, ups, cents, NProbe)
          .localCheckpoint()
        // uncapped, matching the epoch step's deltaPairs (capped
        // stored pairs + an uncapped delta probe would diverge)
        val pairs = VectorOps.pairsFromAssigned(assigned, Threshold,
            NProbe, maxBucket = Long.MaxValue)
          .localCheckpoint()
        val comp = ups.select("vec_id")
          .join(Graphs.components(pairs, "ida", "idb")
            .withColumnRenamed("id", "vec_id"), Seq("vec_id"), "left")
          .select(col("vec_id"),
            coalesce(col("comp"), col("vec_id")).as("component"))
        val centsDf = {
          import spark.implicits._
          spark.createDataset(cents.toSeq).toDF("cid", "cv")
        }
        Await.result(Future.sequence(Seq(
          Future(DeltaLog.commit(spark, log("centroids"), batchId,
            centsDf, None, Seq("cid"))),
          Future(DeltaLog.commit(spark, log("assigned"), batchId,
            assigned, None, Seq("vec_id", "cid"))),
          Future(DeltaLog.commit(spark, log("pairs"), batchId,
            pairs, None, Seq("ida", "idb"))),
          Future(DeltaLog.commit(spark, log("comp"), batchId,
            comp, None, Seq("vec_id"))))), Duration.Inf)
        advance(root, Snapshot(batchId + 1, centsDf.localCheckpoint(),
          assigned, pairs, comp.localCheckpoint()))
      case Some(centsDf) =>
        import spark.implicits._
        val cents = centsDf.select(col("cid"), col("cv"))
          .as[(Long, Array[Float])].collect().sortBy(_._1)
        val tomb = batch.filter(col("deleted")).select("vec_id")
          .localCheckpoint() // fans into the affected set + anti-joins
        val d = VectorOps.ivfEpochStep(spark, cents, rs(1).get,
          rs(2).get, rs(3).get, ups, tomb, Threshold, NProbe)
        Await.result(Future.sequence(Seq(
          Future(DeltaLog.commit(spark, log("assigned"), batchId,
            d.deltaAssigned, Some(d.retiredAssigned), Seq("vec_id", "cid"))),
          Future(DeltaLog.commit(spark, log("pairs"), batchId,
            d.newPairs, Some(d.retiredPairs), Seq("ida", "idb"))),
          Future(DeltaLog.commit(spark, log("comp"), batchId,
            d.reclosed, Some(tomb), Seq("vec_id"))))), Duration.Inf)
        // advance the snapshot by folding in the deltas JUST COMMITTED,
        // read back from the log (the source of truth — a replayed
        // batch folds the ORIGINAL committed delta, not its recompute);
        // the three folds checkpoint concurrently
        def folded(stored: DataFrame, t: String, keys: Seq[String]) =
          Future(foldDelta(stored,
            DeltaLog.epochDelta(spark, log(t), batchId), keys)
            .localCheckpoint())
        val nf = Await.result(Future.sequence(Seq(
          folded(rs(1).get, "assigned", Seq("vec_id", "cid")),
          folded(rs(2).get, "pairs", Seq("ida", "idb")),
          folded(rs(3).get, "comp", Seq("vec_id")))), Duration.Inf)
        advance(root,
          Snapshot(batchId + 1, rs.head.get, nf(0), nf(1), nf(2)))
    }
    ()
  }

  /** Fixture dir → drained state root: the replay runs ONCE per
    * process per fixture (the end state is deterministic), then every
    * consumer — the q235 verdict, the q237 serve — reads the same
    * committed state. computeIfAbsent also serializes concurrent
    * first-callers (the Verify harness runs queries in parallel): two
    * drains racing on one pid root would clobber each other's
    * checkpoint. */
  private val drained =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** Drain the two-batch replay (once per process) and return the
    * state root holding the four committed DeltaLog tables. */
  def drainedStateRoot(spark: SparkSession, dir: String): String =
    drained.computeIfAbsent(dir, _ => drain(spark, dir))

  private def drain(spark: SparkSession, dir: String): String = {
    val land = stagedLanding(spark, dir)
    val root = runRoot(dir)
    // deterministic end state: replay from scratch per process;
    // state + checkpoint live and die together with the pid root
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(root))
    FixtureStaging.deleteOnExit(root)

    val lastBatch =
      new java.util.concurrent.atomic.AtomicReference[java.lang.Long](null)
    val q = spark.readStream
      .schema(vecSchema)
      .option("maxFilesPerTrigger", 1)
      .parquet(land)
      .writeStream
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        applyBatch(spark, root, batch, batchId)
        lastBatch.set(batchId)
        ()
      }
      .option("checkpointLocation", s"$root/ckpt")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()

    if (lastBatch.get() == null)
      throw new IllegalStateException(
        s"no batches drained from $land — the staged landing dir is " +
          "empty (a foreign process blessed a half-staged dir?) or the " +
          "fixture path is wrong")
    root
  }

  /** q235: the final cluster verdict — identical contract (and oracle)
    * to q233's one-shot epoch. The verdict assembles at read time from
    * the resolved component table; the corpus-sized materialization
    * happens once at the END, not once per batch. */
  def maintainerStream(spark: SparkSession, dir: String): DataFrame = {
    val root = drainedStateRoot(spark, dir)
    val comp = DeltaLog.read(spark, s"$root/state/comp", Seq("vec_id")).get
    comp
      .withColumn("cluster_size",
        count(lit(1)).over(Window.partitionBy("component")))
      .withColumn("is_canonical", col("vec_id") === col("component"))
      .withColumn("status",
        when(col("vec_id") % 6 === 0, "appended").otherwise("retained"))
      .orderBy("vec_id")
  }

  /** q237: ANN SERVED from the maintained state — the read that makes
    * the maintainer worth running: after the drain, top-k queries are
    * answered from the resolved `assigned` state table (multi-probe
    * rows, tombstones retired, appends present) against the frozen
    * `centroids` state, never touching the original corpus. This gates
    * the state tables q235's verdict doesn't reach (assigned +
    * centroids): the oracle recomputes probe-and-rank over the
    * post-epoch corpus from scratch, so a hash match proves the
    * delta-maintained inverted lists ARE the post-epoch index.
    *
    * Both sides are multi-probe (the state stores each vector in its
    * top-`nProbe` buckets, q233's assignment discipline), so a
    * (query, neighbor) pair can meet in several probed buckets —
    * candidates dedupe before ranking, mirrored by the oracle's
    * DISTINCT. Scale: probe lists are driver-side metadata
    * (nQueries × nProbe); the serve is one broadcast equi-join on cid
    * over ~nProbe²/K of the index plus a per-query top-k window. */
  /** READ-OPTIMIZED PUBLISH of the delete-maintained index — the
    * round-7 review's "unify the two representations" step: the
    * resolved post-epoch `assigned` state written ONCE as a
    * cid-bucketed, cid-sorted table in the same
    * [[graft.sources.Bucketing]] layout the append-only index artifact
    * (q153/q163) serves from. The DeltaLog state tables remain the
    * WRITE path (delta-sized commits, crash-safe epoch replay); this
    * publish is the READ path — the Lucene/RocksDB segment-publish
    * analog, giving the delete-maintained index q161's plan-time
    * bucket pruning instead of q237's full-state scan.
    *
    * At 100 TB the publish rewrite is restricted to the epoch's
    * AFFECTED buckets: the per-epoch DeltaLog commits already carry
    * the touched cid set (deltaAssigned ∪ retiredAssigned keys), and
    * hashing those cids to bucket ids names exactly the bucket files
    * to rewrite — every untouched bucket's files carry over. Here the
    * drained two-batch state publishes in one write, amortized per
    * fixture signature across processes by [[Bucketing.ensure]]'s
    * catalog + file-lock discipline (the end state is deterministic,
    * so any process publishes identical content). */
  def publishedIndex(spark: SparkSession, dir: String): DataFrame = {
    val root = drainedStateRoot(spark, dir)
    val tag = dir.replaceAll("[^A-Za-z0-9]", "_")
    val sig = FixtureStaging.key("ivfmpub", s"$dir/embeddings.parquet")
    val name = s"b_ivfmpub_s${sig}_$tag"
    graft.sources.Bucketing.ensure(spark, name,
      DeltaLog.read(spark, s"$root/state/assigned",
        Seq("vec_id", "cid")).get,
      "cid", sweep = Some(("b_ivfmpub_s", s"_$tag")))
    spark.table(name)
  }

  /** q286: bucket-PRUNED ANN served from the delete-maintained index —
    * [[servedKnn]]'s exact contract (same oracle: multi-probe
    * probe-and-rank recomputed over the post-epoch corpus) answered
    * from the [[publishedIndex]] artifact with q161's serving
    * discipline: per-query probe lists computed driver-side against
    * the frozen `centroids` state (metadata-sized), and the probed cid
    * set reaching the scan as a LITERAL IN-filter so the bucketed
    * table prunes to the probed buckets at PLAN time
    * (`SelectedBucketsCount` — StreamingIvfPrunedServeSpec pins the
    * strict subset). The serve reads ~nProbe·nQueries/K of the
    * post-delete index ON DISK — deletes and pruning together, where
    * q161 had pruning without deletes and q237 deletes without
    * pruning. */
  def servedKnnPruned(spark: SparkSession, dir: String,
      nQueries: Int = 10, k: Int = 5): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val root = drainedStateRoot(spark, dir)
    val idx = publishedIndex(spark, dir)
    val cents = DeltaLog.read(spark, s"$root/state/centroids", Seq("cid")).get
      .select(col("cid"), col("cv"))
      .as[(Long, Array[Float])].collect().sortBy(_._1)
    // queries: the first ids still in the post-epoch corpus, read off
    // the published index itself (multi-probe rows dedupe to one
    // embedding per vec_id). At scale this is a key lookup against the
    // vec_id-keyed state, not an index scan.
    val queries = idx.filter(col("vec_id") < nQueries)
      .groupBy("vec_id").agg(first("embedding").as("qv"))
      .as[(Long, Array[Float])].collect().toSeq
    val probesLocal = queries.flatMap { case (qid, qv) =>
      cents.map { case (cid, cv) => (cid, VectorOps.cosOf(qv, cv)) }
        .sortBy { case (cid, s) => (-s, cid) }
        .take(NProbe)
        .map { case (cid, _) => (qid, cid, qv) }
    }
    val probedCids = probesLocal.map(_._2).distinct.sorted
    val probes = probesLocal.toDF("query_id", "cid", "qv")
    val rankW = Window.partitionBy("query_id")
      .orderBy(desc("cos"), asc("neighbor_id"))
    broadcast(probes)
      .join(idx.filter(col("cid").isin(probedCids: _*)), "cid")
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        col("qv"), col("embedding"))
      .as[(Long, Long, Array[Float], Array[Float])]
      .mapPartitions(_.map { case (qi, ni, qv, v) =>
        (qi, ni, VectorOps.cosOf(qv, v)) })
      .toDF("query_id", "neighbor_id", "cos")
      .distinct() // multi-probe × multi-probe: pairs meet in >1 bucket
      .withColumn("rn", row_number().over(rankW))
      .filter(col("rn") <= k)
      .select(col("query_id"), col("rn").as("rank"), col("neighbor_id"),
        graft.util.Portable.val6(col("cos")).as("cos_sim"))
      .orderBy("query_id", "rank")
  }

  def servedKnn(spark: SparkSession, dir: String,
      nQueries: Int = 10, k: Int = 5): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val root = drainedStateRoot(spark, dir)
    val assigned =
      DeltaLog.read(spark, s"$root/state/assigned", Seq("vec_id", "cid")).get
    val cents = DeltaLog.read(spark, s"$root/state/centroids", Seq("cid")).get
      .select(col("cid"), col("cv"))
      .as[(Long, Array[Float])].collect().sortBy(_._1)
    // queries: the first ids still in the post-epoch corpus — served
    // from the state itself (vec_id grain), embeddings read per query
    val qids = assigned.select("vec_id").distinct()
      .filter(col("vec_id") < nQueries)
    val queries = assigned.join(qids, Seq("vec_id"), "left_semi")
      .groupBy("vec_id").agg(first("embedding").as("qv"))
      .as[(Long, Array[Float])].collect().toSeq
    val probesLocal = queries.flatMap { case (qid, qv) =>
      cents.map { case (cid, cv) => (cid, VectorOps.cosOf(qv, cv)) }
        .sortBy { case (cid, s) => (-s, cid) }
        .take(NProbe)
        .map { case (cid, _) => (qid, cid, qv) }
    }
    val probes = probesLocal.toDF("query_id", "cid", "qv")
    val rankW = Window.partitionBy("query_id")
      .orderBy(desc("cos"), asc("neighbor_id"))
    broadcast(probes)
      .join(assigned, "cid")
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        col("qv"), col("embedding"))
      .as[(Long, Long, Array[Float], Array[Float])]
      .mapPartitions(_.map { case (qi, ni, qv, v) =>
        (qi, ni, VectorOps.cosOf(qv, v)) })
      .toDF("query_id", "neighbor_id", "cos")
      .distinct() // multi-probe × multi-probe: pairs meet in >1 bucket
      .withColumn("rn", row_number().over(rankW))
      .filter(col("rn") <= k)
      .select(col("query_id"), col("rn").as("rank"), col("neighbor_id"),
        graft.util.Portable.val6(col("cos")).as("cos_sim"))
      .orderBy("query_id", "rank")
  }
}
