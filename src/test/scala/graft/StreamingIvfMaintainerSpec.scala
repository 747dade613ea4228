package graft

import org.apache.spark.sql.functions._

import graft.operators.VectorOps
import graft.sources.Tables
import graft.streaming.StreamingIvfMaintainer

/** Continuous IVF index maintenance (q235): the drained two-batch
  * replay (seed build + CDC epoch of appends and tombstones) must land
  * on exactly the staged one-shot epoch's verdict (q233) — and its
  * per-batch DeltaLog commits must be delta-sized, not index-sized.
  */
class StreamingIvfMaintainerSpec extends SparkSpec {

  test("drained maintainer equals the staged one-shot epoch bit-for-bit, " +
      "with delta-sized batch-1 commits") {
    val dir = sf("sf0.001")
    val streamed = StreamingIvfMaintainer.maintainerStream(spark, dir)
      .collect().toSeq
    val staged = VectorOps.embeddingDedupUpsertDelete(spark, dir)
      .collect().toSeq
    assert(streamed == staged)
    assert(streamed.nonEmpty)
    // both CDC verbs visible: appends present, tombstones absent
    val ids = streamed.map(_.getLong(0)).toSet
    val all = Tables.embeddings(spark, dir).select("vec_id")
      .collect().map(_.getLong(0)).toSet
    val tombs = all.filter(v => v % 6 != 0 && v % 7 == 3)
    assert(streamed.exists(_.getString(4) == "appended"))
    assert(tombs.nonEmpty && ids.intersect(tombs).isEmpty,
      "tombstoned vectors must not survive the epoch")

    // --- per-batch state COMMITS are delta-sized, not index-sized ---
    // (the 100 TB property: a CDC epoch writes its delta ∪ affected
    // clusters, never the whole index)
    val stateRoot = s"${StreamingIvfMaintainer.runRoot(dir)}/state"
    def committedRows(table: String, epoch: Long): Long = {
      val edir = f"$stateRoot/$table/e$epoch%010d"
      def cnt(sub: String): Long = {
        val d = new java.io.File(s"$edir/$sub")
        if (d.exists()) spark.read.parquet(d.toString).count() else 0L
      }
      cnt("up") + cnt("del")
    }
    val tables = Seq("assigned", "pairs", "comp")
    val b0 = tables.map(committedRows(_, 0L)).sum
    val b1 = tables.map(committedRows(_, 1L)).sum
    // batch 0 IS the index build (corpus-sized, paid once); batch 1
    // commits the epoch's delta — assignment rows for ~1/6 appends,
    // retired rows for ~1/7 tombstones, relabels for affected clusters
    assert(b0 > 0 && b1 > 0)
    assert(b1 < b0 / 2,
      s"batch-1 state commit ($b1 rows) should be delta-sized vs the " +
        s"index-sized seed commit ($b0 rows)")
    // centroids commit once at seed and never again (frozen contract)
    assert(committedRows("centroids", 0L) > 0)
    assert(!new java.io.File(
      f"$stateRoot/centroids/e${1L}%010d").exists())
  }
}
