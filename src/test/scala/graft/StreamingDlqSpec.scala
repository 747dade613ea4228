package graft

import org.apache.spark.sql.functions._

import graft.streaming.StreamingDlq

/** q310 — dead-letter routing. Pins the two claims the mart's hash
  * gate can't see directly: (1) epoch replay is a no-op on BOTH sinks
  * (the crash-between-commits story), and (2) the routing is a
  * PARTITION — every event lands on exactly one side, none on both,
  * none dropped.
  */
class StreamingDlqSpec extends SparkSpec {
  import spark.implicits._

  private val dir = sf("sf0.001")

  private def ids(root: String, t: String): Set[Long] =
    graft.sources.DeltaLog
      .read(spark, s"$root/state/$t", Seq("event_id")).get
      .select($"event_id").as[Long].collect().toSet

  test("replaying a committed epoch is a no-op on both sinks") {
    val root = StreamingDlq.drainedStateRoot(spark, dir)
    val m0 = ids(root, "main")
    val d0 = ids(root, "dlq")
    // re-apply epoch 0 with DIFFERENT content: the _READY guard must
    // skip both commits, exactly what a post-crash replay relies on
    val fake = spark.range(1)
      .select(lit("999999999|1|view|123").as("value"))
    StreamingDlq.applyBatch(spark, root, fake, 0L)
    assert(ids(root, "main") == m0)
    assert(ids(root, "dlq") == d0)
    assert(!m0.contains(999999999L) && !d0.contains(999999999L))
  }

  test("the routing partitions the corpus: disjoint sides, full cover") {
    val root = StreamingDlq.drainedStateRoot(spark, dir)
    val m = ids(root, "main")
    val d = ids(root, "dlq")
    assert((m & d).isEmpty, "an event landed on both sides")
    val all = graft.sources.Tables.events(spark, dir)
      .select($"event_id").as[Long].collect().toSet
    assert(m ++ d == all, "routing dropped or invented events")
    assert(d == all.filter(_ % 13 == 0), "quarantine rule")
  }
}
