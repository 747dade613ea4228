package graft

import org.apache.spark.sql.functions._

import graft.streaming.{SegmentedBm25Index, StreamingBm25Index}

/** q328 — BM25 served from the SEGMENT store (per-epoch immutable
  * segments + tombstone sidecars). Pins the storage model's three
  * contracts:
  *   1. representation invisibility: the segmented serve equals the
  *      bucketed q292 serve row-for-row on the drained fixture (the
  *      oracle gate re-proves both against DuckDB);
  *   2. append-only: committing a new epoch leaves every prior segment
  *      file byte-identical (length + mtime + content hash) — the
  *      no-rewrite property that makes per-epoch cost Θ(delta) where
  *      the bucketed artifact's in-place rewrite is Θ(touched buckets);
  *   3. compaction invariance: folding all segments into one changes
  *      the resolved state and manifest totals not at all.
  * Plus the replay discipline (an already-committed epoch is a no-op)
  * and the latest-mention-wins resolve (upsert replaces, tombstone
  * kills).
  */
class SegmentedBm25Spec extends SparkSpec {

  private val dir = sf("sf0.001")

  private def mkBatch(rows: Seq[(Long, String, Boolean)]) = {
    import spark.implicits._
    rows.toDF("doc_id", "text", "deleted")
  }

  private def freshRoot(): String = {
    val root = java.nio.file.Files
      .createTempDirectory("graft-bm25seg-spec").toString
    graft.streaming.FixtureStaging.deleteOnExit(root)
    root
  }

  private def fileState(root: String): Map[String, (Long, Long, Int)] = {
    import scala.jdk.CollectionConverters._
    java.nio.file.Files.walk(java.nio.file.Paths.get(root))
      .iterator().asScala
      .filter(java.nio.file.Files.isRegularFile(_))
      .map { p =>
        val bytes = java.nio.file.Files.readAllBytes(p)
        p.toString -> (bytes.length.toLong,
          java.nio.file.Files.getLastModifiedTime(p).toMillis,
          java.util.Arrays.hashCode(bytes))
      }.toMap
  }

  test("latest-mention-wins resolve: upsert replaces, tombstone kills; " +
      "manifest totals stay additive") {
    val root = freshRoot()
    SegmentedBm25Index.applySegment(spark, root,
      mkBatch(Seq((1L, "a b b", false), (2L, "c c", false),
        (3L, "d", false))), 0L)
    SegmentedBm25Index.applySegment(spark, root,
      mkBatch(Seq((2L, "e", false), // replaces doc 2
        (3L, null, true))), 1L)     // kills doc 3
    val live = SegmentedBm25Index.resolvedDoclenForSpec(spark, root)
      .filter(col("dl").isNotNull)
      .select("doc_id", "dl").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(live == Set((1L, 3L), (2L, 1L)))
    val posts = SegmentedBm25Index.livePostingsForSpec(spark, root, None)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .toSet
    assert(posts == Set(("a", 1L, 1L), ("b", 1L, 2L), ("e", 2L, 1L)))
    val (nd, nt) = SegmentedBm25Index.totalsForSpec(spark, root)
    assert((nd, nt) == (2L, 4L)) // docs {1, 2}; tokens 3 + 1
  }

  test("appending an epoch rewrites NOTHING: prior segment files are " +
      "byte-identical, and replay of a committed epoch is a no-op") {
    val root = freshRoot()
    SegmentedBm25Index.applySegment(spark, root,
      mkBatch(Seq((1L, "a b", false), (2L, "c", false))), 0L)
    val before = fileState(root)
    SegmentedBm25Index.applySegment(spark, root,
      mkBatch(Seq((4L, "f g", false), (1L, null, true))), 1L)
    val after = fileState(root)
    // every pre-existing file untouched (bytes AND mtime)
    before.foreach { case (p, st) =>
      assert(after.get(p).contains(st), s"segment file rewritten: $p")
    }
    assert(after.size > before.size)
    // replaying the committed epoch changes nothing at all
    SegmentedBm25Index.applySegment(spark, root,
      mkBatch(Seq((4L, "f g", false), (1L, null, true))), 1L)
    assert(fileState(root) == after)
    val live = SegmentedBm25Index.resolvedDoclenForSpec(spark, root)
      .filter(col("dl").isNotNull)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(live == Set(2L, 4L))
  }

  test("compaction folds segments to one and changes the resolved " +
      "state and totals not at all") {
    val root = freshRoot()
    SegmentedBm25Index.applySegment(spark, root,
      mkBatch(Seq((1L, "a b", false), (2L, "c", false),
        (3L, "d d", false))), 0L)
    SegmentedBm25Index.applySegment(spark, root,
      mkBatch(Seq((2L, "e e e", false), (3L, null, true),
        (5L, "a", false))), 1L)
    def snapshot() = (
      SegmentedBm25Index.livePostingsForSpec(spark, root, None)
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
        .toSet,
      SegmentedBm25Index.resolvedDoclenForSpec(spark, root)
        .filter(col("dl").isNotNull).select("doc_id", "dl").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet,
      SegmentedBm25Index.totalsForSpec(spark, root))
    val before = snapshot()
    SegmentedBm25Index.compact(spark, root)
    assert(SegmentedBm25Index.segments(root).size == 1)
    assert(snapshot() == before)
    // and the store still absorbs post-compaction epochs
    SegmentedBm25Index.applySegment(spark, root,
      mkBatch(Seq((1L, null, true))), 2L)
    val live = SegmentedBm25Index.resolvedDoclenForSpec(spark, root)
      .filter(col("dl").isNotNull)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(live == Set(2L, 5L))
  }

  test("within-batch conflicts resolve deterministically: tombstone " +
      "beats upsert, duplicate upserts collapse to one mention") {
    val root = freshRoot()
    SegmentedBm25Index.applySegment(spark, root,
      mkBatch(Seq((1L, "a a", false), (2L, "b", false))), 0L)
    // one batch: doc 1 upserted AND tombstoned (tombstone wins),
    // doc 2 upserted twice (one mention survives), doc 3 fresh
    SegmentedBm25Index.applySegment(spark, root,
      mkBatch(Seq((1L, "x y", false), (1L, null, true),
        (2L, "c c", false), (2L, "c c", false),
        (3L, "d", false))), 1L)
    val live = SegmentedBm25Index.resolvedDoclenForSpec(spark, root)
      .filter(col("dl").isNotNull).select("doc_id", "dl").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(live == Set((2L, 2L), (3L, 1L)))
    val posts = SegmentedBm25Index.livePostingsForSpec(spark, root, None)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .toSet
    assert(posts == Set(("c", 2L, 2L), ("d", 3L, 1L)))
    val (nd, nt) = SegmentedBm25Index.totalsForSpec(spark, root)
    assert((nd, nt) == (2L, 3L))
  }

  test("compaction publish order is crash-safe: after the merged " +
      "segment's _READY but before cleanup, every read is already " +
      "correct (no resurrection, no double-counted totals), and the " +
      "next compact sweeps the leftovers") {
    val root = freshRoot()
    SegmentedBm25Index.applySegment(spark, root,
      mkBatch(Seq((1L, "a b", false), (2L, "c", false),
        (3L, "d d", false))), 0L)
    SegmentedBm25Index.applySegment(spark, root,
      mkBatch(Seq((2L, "e e e", false), (3L, null, true),
        (5L, "a", false))), 1L)
    def snapshot() = (
      SegmentedBm25Index.livePostingsForSpec(spark, root, None)
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
        .toSet,
      SegmentedBm25Index.resolvedDoclenForSpec(spark, root)
        .filter(col("dl").isNotNull).select("doc_id", "dl").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet,
      SegmentedBm25Index.totalsForSpec(spark, root))
    val before = snapshot()
    // simulated crash: merged segment committed, folded segments NOT
    // yet deleted — the exact window the naive delete-first order
    // would have emptied the store in (or, replayed later, would have
    // resurrected doc 3 via latest-mention-wins)
    SegmentedBm25Index.compact(spark, root, failBeforeCleanup = true)
    val leftover = new java.io.File(root).listFiles()
      .count(_.getName.matches("c?seg\\d{10}"))
    assert(leftover == 3, "crash window: folded dirs + merged dir on disk")
    assert(SegmentedBm25Index.segments(root).size == 1,
      "reads must see ONLY the merged segment through the crash window")
    assert(snapshot() == before)
    // recovery: the next compact sweeps the folded leftovers
    SegmentedBm25Index.compact(spark, root)
    assert(new java.io.File(root).listFiles()
      .count(_.getName.matches("c?seg\\d{10}")) == 1)
    assert(snapshot() == before)
    // and the store still absorbs post-compaction epochs: a batch id
    // AFTER the folded ones must not collide with the merged segment
    SegmentedBm25Index.applySegment(spark, root,
      mkBatch(Seq((1L, null, true), (6L, "f", false))), 2L)
    val live = SegmentedBm25Index.resolvedDoclenForSpec(spark, root)
      .filter(col("dl").isNotNull)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(live == Set(2L, 5L, 6L))
  }

  test("auto-compaction policy: the maintainer trigger folds the " +
      "store past MaxLiveSegments, the serve state is unchanged, and " +
      "segment count stays bounded under continuous epochs") {
    val root = freshRoot()
    val bound = 3
    var maxSeen = 0
    // 12 continuous epochs: upserts + a rolling tombstone, policy
    // checked after every epoch exactly as the drain loop runs it
    (0 until 12).foreach { e =>
      val rows = Seq(
        (e.toLong, s"w$e x$e", false),
        (1000L + e, s"y$e", false)) ++
        (if (e >= 3) Seq((e.toLong - 3, null.asInstanceOf[String], true))
         else Nil)
      SegmentedBm25Index.applySegment(spark, root, mkBatch(rows), e.toLong)
      SegmentedBm25Index.maybeCompact(spark, root, bound)
      maxSeen = math.max(maxSeen, SegmentedBm25Index.segments(root).size)
    }
    assert(maxSeen <= bound + 1,
      s"policy must bound live segments at $bound + 1, saw $maxSeen")
    // the folded store resolves to exactly the from-scratch state
    val live = SegmentedBm25Index.resolvedDoclenForSpec(spark, root)
      .filter(col("dl").isNotNull).select("doc_id").collect()
      .map(_.getLong(0)).toSet
    val expect = ((9L to 11L) ++ (1000L to 1011L)).toSet
    assert(live == expect)
    val (nd, nt) = SegmentedBm25Index.totalsForSpec(spark, root)
    assert(nd == expect.size.toLong)
    assert(nt == (9 to 11).map(_ => 2L).sum + 12L)
  }

  test("the segmented serve equals the bucketed q292 serve " +
      "row-for-row — two storage models, one query contract") {
    val seg = SegmentedBm25Index.servedBm25(spark, dir).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
      .toSeq
    val bucketed = StreamingBm25Index.servedBm25(spark, dir).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
      .toSeq
    assert(seg.nonEmpty)
    assert(seg == bucketed)
    // freshness: the store's committed frontier is the drained landing's
    // last epoch (seed 0 + CDC epoch 1) — the _READY marker IS the
    // publish, so there is no separate artifact to go stale
    assert(SegmentedBm25Index.servedEpoch(spark, dir) == 1L)
  }

  test("the query-term prune pushes into every per-segment posting " +
      "scan (the per-segment analogue of bucket pruning)") {
    val root = SegmentedBm25Index.drainedRoot(spark, dir)
    // two terms → an In(t, ...) source filter (one term folds to EqualTo)
    val plan = SegmentedBm25Index
      .livePostingsForSpec(spark, root, Some(Seq("a", "the")))
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [In(t, "),
      s"expected the IN(t, ...) filter pushed to the parquet scans:\n$plan")
  }
}
