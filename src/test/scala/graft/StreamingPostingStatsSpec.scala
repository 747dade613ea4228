package graft

import org.apache.spark.sql.functions._

import graft.sources.Tables
import graft.streaming.StreamingPostingStats

/** Continuous posting-stats maintenance (q236): the drained two-batch
  * replay must equal the from-scratch stats of the post-epoch corpus,
  * and per-batch commits must be touched-vocabulary-sized. */
class StreamingPostingStatsSpec extends SparkSpec {
  import spark.implicits._

  test("drained maintainer equals the from-scratch post-epoch stats, " +
      "with touched-rows-sized commits and exact delete subtraction") {
    val dir = sf("sf0.001")
    val streamed = StreamingPostingStats.statsStream(spark, dir)
      .collect().toSeq
    val postEpoch = Tables.documents(spark, dir)
      .filter(col("doc_id") % 6 === 0 || col("doc_id") % 7 =!= 3)
    val scratch = postEpoch
      .select(col("doc_id"), explode(split(col("text"), " ")).as("t"))
      .groupBy("doc_id", "t").agg(count(lit(1)).as("c"))
      .groupBy("t").agg(count(lit(1)).as("df"), sum("c").as("tf"))
      .orderBy("t").collect().toSeq
    assert(streamed == scratch)
    assert(streamed.nonEmpty)
    // no zero/negative rows may linger after subtraction (BM25 reads
    // this table; df = 0 is a divide-by-zero)
    assert(streamed.forall(r => r.getLong(1) > 0 && r.getLong(2) > 0))

    // --- per-batch state COMMITS are delta-sized ---
    val stateRoot = s"${StreamingPostingStats.runRoot(dir)}/state"
    def committedRows(table: String, epoch: Long): Long = {
      val edir = f"$stateRoot/$table/e$epoch%010d"
      def cnt(sub: String): Long = {
        val d = new java.io.File(s"$edir/$sub")
        if (d.exists()) spark.read.parquet(d.toString).count() else 0L
      }
      cnt("up") + cnt("del")
    }
    // the corpus table's batch-1 commit is EXACTLY the epoch delta:
    // appends upserted, tombstones deleted
    val docs = Tables.documents(spark, dir)
    val appends = docs.filter(col("doc_id") % 6 === 0).count()
    val tombs = docs
      .filter(col("doc_id") % 6 =!= 0 && col("doc_id") % 7 === 3).count()
    assert(tombs > 0)
    assert(committedRows("corpus", 1L) == appends + tombs)
    assert(committedRows("corpus", 0L) == docs.count() - appends)
    // the stats table commits at vocabulary grain, bounded by the
    // touched-terms count (this corpus's vocab is tiny, so the bound
    // is the vocab itself — the invariant is no blow-up past it)
    val vocab = docs.select(explode(split(col("text"), " "))).distinct().count()
    assert(committedRows("stats", 1L) <= vocab)
    assert(committedRows("stats", 0L) <= vocab)
  }
}
