package graft

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
  }
}
