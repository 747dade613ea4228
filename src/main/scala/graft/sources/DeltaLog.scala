package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Log-structured keyed state table: per-epoch DELTA commits (keyed
  * upserts + key-only deletes) instead of full-table rewrites — the
  * write path a continuously-maintained state table needs at 100 TB,
  * where per-batch I/O must scale with the batch's delta, not the
  * accumulated corpus. This is the LSM/commit-log dataflow a production
  * table format implements; reduced here to parquet dirs + markers:
  *
  *   - `commit(epoch, upserts, deletes)` writes ONLY the delta rows
  *     under `root/e<epoch>/{up,del}` and blesses them with a `_READY`
  *     marker written LAST — a half-written epoch (crash mid-commit) is
  *     invisible to readers and rebuilt on replay. Commits are
  *     IDEMPOTENT per epoch (an already-committed epoch is a no-op),
  *     which is exactly the foreachBatch epoch-id replay discipline
  *     ([[graft.streaming.ForeachBatchMerge]]).
  *   - `read(upToExclusive)` resolves the current state: last write per
  *     key wins, a later delete kills an earlier upsert. Bounding by
  *     epoch gives SNAPSHOT reads — a replayed batch N reads the state
  *     as of N-1 even if some tables already committed parts of N
  *     (per-table commit crashes recover per-table).
  *   - read cost grows with the live epoch count, so [[commit]]
  *     auto-COMPACTS: once `CompactEvery` fully-superseded epochs
  *     accumulate, the resolved state folds into one `base<id>` snapshot
  *     (covering epochs ≤ id) and the folded dirs are removed. The
  *     newest epoch is never folded, so a crashed batch's replay can
  *     still read its as-of-N-1 snapshot. Compaction is O(state) every
  *     K batches — amortized O(state/K) per batch against delta-sized
  *     commits the rest of the time.
  *
  * Contract: one row per key per epoch on the upsert side, and a key is
  * never upserted and deleted in the same epoch. Single writer (the
  * streaming query's driver), readers any time — same as ParquetMerge.
  */
object DeltaLog {

  /** Fold the log into a base snapshot once this many fully-superseded
    * live epochs accumulate (the newest epoch never folds). */
  val CompactEvery = 8

  private def fs(spark: SparkSession, path: String) =
    new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def epochDir(root: String, e: Long) = f"$root/e$e%010d"
  private def baseDir(root: String, e: Long) = f"$root/base$e%010d"

  private val EpochRe = "e(\\d{10})".r
  private val BaseRe = "base(\\d{10})".r

  /** Committed (epoch dirs, base dirs) under `root`, by `_READY`. */
  private def listCommitted(spark: SparkSession,
      root: String): (Seq[Long], Seq[Long]) = {
    val f = fs(spark, root)
    if (!f.exists(new Path(root))) return (Nil, Nil)
    val names = f.listStatus(new Path(root)).toSeq
      .filter(s => s.isDirectory &&
        f.exists(new Path(s.getPath, "_READY")))
      .map(_.getPath.getName)
    (names.collect { case EpochRe(e) => e.toLong }.sorted,
      names.collect { case BaseRe(e) => e.toLong }.sorted)
  }

  /** Commit one epoch's delta: `upserts` (full rows) and optional
    * `deleteKeys` (key columns only). Writes are delta-sized; the
    * `_READY` marker commits atomically-enough for a single writer
    * (half-written dirs are ignored and rebuilt on replay). No-op if
    * the epoch is already committed. */
  def commit(spark: SparkSession, root: String, epoch: Long,
      upserts: DataFrame, deleteKeys: Option[DataFrame],
      keyCols: Seq[String]): Unit = {
    val f = fs(spark, root)
    val dir = epochDir(root, epoch)
    if (f.exists(new Path(dir, "_READY"))) return // epoch replay
    f.delete(new Path(dir), true)
    upserts.write.mode("overwrite").parquet(s"$dir/up")
    deleteKeys.foreach(
      _.repartition(1).write.mode("overwrite").parquet(s"$dir/del"))
    f.create(new Path(dir, "_READY")).close()
    maybeCompact(spark, root, keyCols)
  }

  /** Resolve the table state from all committed epochs `< upToExclusive`
    * (all of them when None): newest upsert per key, unless a newer
    * delete killed it. None when nothing is committed in range. */
  def read(spark: SparkSession, root: String, keyCols: Seq[String],
      upToExclusive: Option[Long] = None): Option[DataFrame] = {
    val (eps0, bases0) = listCommitted(spark, root)
    val eps = eps0.filter(e => upToExclusive.forall(e < _))
    val base = bases0.filter(b => upToExclusive.forall(b < _)).maxOption
    val live = base.map(b => eps.filter(_ > b)).getOrElse(eps)
    if (base.isEmpty && live.isEmpty) return None
    val f = fs(spark, root)
    val ups = (base.map(b => spark.read.parquet(s"${baseDir(root, b)}/up")
        .withColumn("_e", lit(b))).toSeq ++
      live.map(e => spark.read.parquet(s"${epochDir(root, e)}/up")
        .withColumn("_e", lit(e))))
      .reduce(_ unionByName _)
    val cols = ups.columns.filter(_ != "_e").toSeq
    val k = keyCols.map(col)
    // map-side-combinable argmax per key (no window): the row struct
    // rides along, max_by on the epoch picks the newest version
    val lastUp = ups.groupBy(k: _*)
      .agg(max_by(struct(ups.columns.map(col): _*), col("_e")).as("_r"))
      .select(col("_r.*"))
    val dels = live
      .filter(e => f.exists(new Path(s"${epochDir(root, e)}/del")))
      .map(e => spark.read.parquet(s"${epochDir(root, e)}/del")
        .withColumn("_de", lit(e)))
      .reduceOption(_ unionByName _)
    val resolved = dels match {
      case None => lastUp
      case Some(d) =>
        val lastDel = d.groupBy(k: _*).agg(max(col("_de")).as("_de"))
        lastUp.join(lastDel, keyCols, "left")
          .filter(col("_de").isNull || col("_e") > col("_de"))
    }
    Some(resolved.select(cols.map(col): _*))
  }

  /** Highest committed epoch (or compacted base) under `root` — the
    * freshness reference a published read artifact stamps itself
    * against. None when nothing is committed. */
  def lastEpoch(spark: SparkSession, root: String): Option[Long] = {
    val (eps, bases) = listCommitted(spark, root)
    (eps ++ bases).maxOption
  }

  /** Read back exactly one committed epoch's delta — (upserts,
    * deleteKeys if any); None if the epoch is not committed. The
    * epoch must still be live (the newest epoch never compacts, so
    * reading back the epoch just committed is always safe) — this is
    * what lets a maintainer fold its own commit into an in-memory
    * snapshot instead of re-resolving the whole log next batch. */
  def epochDelta(spark: SparkSession, root: String, epoch: Long)
      : Option[(DataFrame, Option[DataFrame])] = {
    val f = fs(spark, root)
    val dir = epochDir(root, epoch)
    if (!f.exists(new Path(dir, "_READY"))) return None
    val dels =
      if (f.exists(new Path(s"$dir/del")))
        Some(spark.read.parquet(s"$dir/del"))
      else None
    Some((spark.read.parquet(s"$dir/up"), dels))
  }

  /** Change feed over the epoch range `[fromInclusive, toExclusive)` —
    * the CDC read a downstream consumer (index maintainer, cache
    * invalidator, replication target) runs between two points in time:
    * each key touched in the range appears once with its NET effect,
    * classified against the snapshot as of `fromInclusive`:
    *
    *   - `insert` — newest in-range action is an upsert and the key was
    *     absent from the pre-snapshot;
    *   - `update` — newest action is an upsert over a pre-existing key
    *     (row carries the post-image values);
    *   - `delete` — newest action is a delete of a pre-existing key
    *     (value columns null). A delete of a never-present key nets to
    *     nothing and is dropped.
    *
    * Requires the range's epochs to still be live (not folded into a
    * base snapshot) — the same retention contract a production table
    * format puts on its change feed. Read cost is the range's delta
    * rows plus one keyed probe of the pre-snapshot; nothing
    * corpus-sized moves.
    */
  def changes(spark: SparkSession, root: String, keyCols: Seq[String],
      fromInclusive: Long, toExclusive: Long): Option[DataFrame] = {
    val (eps, bases) = listCommitted(spark, root)
    require(!bases.exists(_ >= fromInclusive),
      s"change feed [$fromInclusive,$toExclusive) partially compacted " +
        s"into base ${bases.max} — raise retention or lower the range")
    val in = eps.filter(e => e >= fromInclusive && e < toExclusive)
    if (in.isEmpty) return None
    val f = fs(spark, root)
    val ups = in.map(e => spark.read.parquet(s"${epochDir(root, e)}/up")
        .withColumn("_e", lit(e)))
      .reduce(_ unionByName _)
    val cols = ups.columns.filter(_ != "_e").toSeq
    val valCols = cols.filterNot(keyCols.contains)
    val k = keyCols.map(col)
    val lastUp = ups.groupBy(k: _*)
      .agg(max_by(struct(ups.columns.map(col): _*), col("_e")).as("_r"))
      .select(col("_r.*"))
    val lastDel = in
      .filter(e => f.exists(new Path(s"${epochDir(root, e)}/del")))
      .map(e => spark.read.parquet(s"${epochDir(root, e)}/del")
        .withColumn("_de", lit(e)))
      .reduceOption(_ unionByName _)
      .map(_.groupBy(k: _*).agg(max(col("_de")).as("_de")))
    val acted = lastDel match {
      case None => lastUp.withColumn("_de", lit(null).cast("long"))
      case Some(d) => lastUp.join(d, keyCols, "full_outer")
    }
    val pre = read(spark, root, keyCols, Some(fromInclusive)) match {
      case Some(s) => s.select(k: _*).withColumn("_pre", lit(true))
      case None => lastUp.limit(0).select(k: _*).withColumn("_pre", lit(true))
    }
    val isDelete = col("_de").isNotNull &&
      (col("_e").isNull || col("_de") > col("_e"))
    val joined = acted.join(pre, keyCols, "left")
      .withColumn("change_type",
        when(isDelete && col("_pre").isNotNull, "delete")
          .when(!isDelete && col("_pre").isNotNull, "update")
          .when(!isDelete && col("_pre").isNull, "insert"))
      .filter(col("change_type").isNotNull)
    Some(joined.select(
      keyCols.map(col) ++ Seq(col("change_type")) ++
        valCols.map(c =>
          when(col("change_type") === "delete", lit(null))
            .otherwise(col(c)).as(c)): _*))
  }

  /** Stage a two-epoch retraction log once per (fixture signature,
    * process) and return its CDC DELETE feed — the tombstone plumbing
    * the incremental index maintainers consume (q231 IVF, q232 posting
    * stats): epoch 1 upserts the corpus key set (the index's key state
    * as of its build), epoch 2 commits `keys.filter(tombPred)` as
    * key-only deletes (a GDPR takedown / re-crawl retraction batch).
    * The feed is read back through [[changes]] — the maintainer sees
    * exactly what a production CDC consumer would: net `delete` rows
    * for keys that existed in the pre-snapshot, nothing else.
    *
    * Scale: both commits are delta-sized writes (keys only); the change
    * feed moves the tombstone batch plus one keyed probe of the
    * pre-snapshot. Nothing corpus-sized rewrites — that is the entire
    * point of routing deletes through the log instead of a rebuild. */
  def stagedTombstones(spark: SparkSession, tag: String,
      fixturePath: String, keys: DataFrame, tombPred: Column,
      keyCol: String): DataFrame = {
    val root = graft.streaming.FixtureStaging.stageOnce(tag, fixturePath,
      s"${System.getProperty("java.io.tmpdir")}/graft_$tag") { d =>
      commit(spark, s"$d/log", 1L, keys, None, Seq(keyCol))
      commit(spark, s"$d/log", 2L, keys.limit(0),
        Some(keys.filter(tombPred)), Seq(keyCol))
    }
    changes(spark, s"$root/log", Seq(keyCol), 2L, 3L)
      .getOrElse(throw new IllegalStateException(
        s"tombstone log at $root/log has no committed epoch 2"))
      .filter(col("change_type") === "delete")
      .select(keyCol)
  }

  /** Fold fully-superseded epochs (everything but the newest) into a
    * base snapshot once `CompactEvery` of them accumulate. The newest
    * epoch stays live so a crashed batch N's replay can still resolve
    * state as of N-1. Marker-last, deletions after — crash-safe. */
  private def maybeCompact(spark: SparkSession, root: String,
      keyCols: Seq[String]): Unit = {
    val (eps, bases) = listCommitted(spark, root)
    val base = bases.maxOption
    val live = base.map(b => eps.filter(_ > b)).getOrElse(eps)
    if (live.size < 2) return
    val foldable = live.init // never fold the newest epoch
    if (foldable.size < CompactEvery) return
    val bid = foldable.max
    val f = fs(spark, root)
    val bdir = baseDir(root, bid)
    f.delete(new Path(bdir), true)
    read(spark, root, keyCols, Some(bid + 1)).foreach { resolved =>
      resolved.write.mode("overwrite").parquet(s"$bdir/up")
      f.create(new Path(bdir, "_READY")).close()
      eps.filter(_ <= bid)
        .foreach(e => f.delete(new Path(epochDir(root, e)), true))
      bases.filter(_ < bid)
        .foreach(b => f.delete(new Path(baseDir(root, b)), true))
    }
  }
}
