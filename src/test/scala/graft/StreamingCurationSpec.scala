package graft

import org.apache.spark.sql.functions._

import graft.streaming.StreamingCuration
import graft.operators.{IncrementalCuration => IC}

/** Continuous incremental curation (q162): the drained two-batch replay
  * (seed + delta-with-tombstones) must land on exactly the q157 verdict
  * table — batch-incremental ≡ stream-incremental ≡ full recompute.
  */
class StreamingCurationSpec extends SparkSpec {
  import spark.implicits._

  test("drained stream equals the batch incremental run (and therefore " +
      "the full recompute) bit-for-bit") {
    val dir = sf("sf0.001")
    val streamed = StreamingCuration.curationStream(spark, dir)
      .collect().toSeq
    val batch = IC.incrementalCuration(spark, dir).collect().toSeq
    assert(streamed == batch)
    assert(streamed.nonEmpty)
    // tombstoned docs emit no verdict; the delta batch's statuses are
    // visible in the final table
    val statuses = streamed.map(_.getString(7)).toSet
    assert(statuses == Set("added", "changed", "unchanged"))

    // --- per-batch state COMMITS are delta-sized, not corpus-sized ---
    // (the 100 TB property: write I/O per batch scales with the batch)
    val stateRoot = s"${StreamingCuration.runRoot(dir)}/state"
    def committedRows(table: String, epoch: Long): Long = {
      val edir = f"$stateRoot/$table/e$epoch%010d"
      def cnt(sub: String): Long = {
        val d = new java.io.File(s"$edir/$sub")
        if (d.exists()) spark.read.parquet(d.toString).count() else 0L
      }
      cnt("up") + cnt("del")
    }
    val tables = Seq("corpus", "verdicts", "sigs", "pairs", "comp")
    val b0 = tables.map(committedRows(_, 0L)).sum
    val b1 = tables.map(committedRows(_, 1L)).sum
    // batch 0's delta IS the whole corpus (the seed); batch 1's delta is
    // the snapshot diff (≈ 1/6 adds + 1/11 changes + 1/7 tombstones plus
    // affected-cluster relabels) — a small fraction of the seed commit
    assert(b0 > 0 && b1 > 0)
    assert(b1 < b0 / 2,
      s"batch-1 state commit ($b1 rows) should be delta-sized vs the " +
        s"corpus-sized seed commit ($b0 rows)")
    // the corpus table's batch-1 commit is EXACTLY the delta: adds +
    // changes upserted, tombstones deleted
    val prev = IC.snapshotPrev(spark, dir)
    val cur = IC.snapshotCur(spark, dir)
    val adds = cur.filter(col("doc_id") % 6 === 0).count()
    val changes =
      cur.filter(col("doc_id") % 11 === 0 && col("doc_id") % 6 =!= 0).count()
    val tombs = prev.filter(col("doc_id") % 7 === 0).count()
    assert(committedRows("corpus", 1L) == adds + changes + tombs)
  }
}
