package graft

import org.apache.spark.sql.functions._

import graft.sources.DeltaLog

/** The log-structured keyed state table (q162's commit path): per-epoch
  * delta commits resolve to last-write-wins state, snapshot reads bound
  * by epoch, idempotent replay, and auto-compaction that folds
  * superseded epochs without changing the resolved state.
  */
class DeltaLogSpec extends SparkSpec {
  import spark.implicits._

  private def freshRoot(tag: String): String = {
    val root = s"${System.getProperty("java.io.tmpdir")}/graft-deltalog-$tag"
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(root))
    root
  }

  private def stateOf(root: String, upTo: Option[Long] = None) =
    DeltaLog.read(spark, root, Seq("k"), upTo).get
      .orderBy("k").as[(Long, String)].collect().toSeq

  test("upserts, deletes, and snapshot reads resolve last-write-wins") {
    val root = freshRoot("basic")
    assert(DeltaLog.read(spark, root, Seq("k")).isEmpty)

    DeltaLog.commit(spark, root, 0,
      Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "v"), None, Seq("k"))
    DeltaLog.commit(spark, root, 1,
      Seq((2L, "B"), (4L, "d")).toDF("k", "v"),
      Some(Seq(Tuple1(3L)).toDF("k")), Seq("k"))
    assert(stateOf(root) == Seq((1L, "a"), (2L, "B"), (4L, "d")))
    // snapshot read as of epoch 1 (exclusive) sees only epoch 0
    assert(stateOf(root, Some(1L)) == Seq((1L, "a"), (2L, "b"), (3L, "c")))

    // a key deleted then re-upserted in a later epoch lives again
    DeltaLog.commit(spark, root, 2,
      Seq((3L, "c2")).toDF("k", "v"), None, Seq("k"))
    assert(stateOf(root).contains((3L, "c2")))
  }

  test("replaying a committed epoch is a no-op (foreachBatch recovery)") {
    val root = freshRoot("replay")
    DeltaLog.commit(spark, root, 0,
      Seq((1L, "a")).toDF("k", "v"), None, Seq("k"))
    // the replay offers DIFFERENT content; the committed epoch wins —
    // exactly the epoch-id idempotence foreachBatch recovery relies on
    DeltaLog.commit(spark, root, 0,
      Seq((1L, "WRONG")).toDF("k", "v"), None, Seq("k"))
    assert(stateOf(root) == Seq((1L, "a")))
  }

  test("compaction folds superseded epochs and preserves the state") {
    val root = freshRoot("compact")
    // epoch e upserts key e%5 with value "v<e>" and deletes key (e+2)%5:
    // churn over a 5-key space across CompactEvery+3 epochs
    val n = DeltaLog.CompactEvery + 3
    (0 until n).foreach { e =>
      DeltaLog.commit(spark, root, e.toLong,
        Seq(((e % 5).toLong, s"v$e")).toDF("k", "v"),
        Some(Seq(Tuple1(((e + 2) % 5).toLong)).toDF("k")), Seq("k"))
    }
    // reference: replay the same ops driver-side
    val ref = scala.collection.mutable.Map[Long, String]()
    (0 until n).foreach { e =>
      ref((e % 5).toLong) = s"v$e"
      ref.remove(((e + 2) % 5).toLong)
    }
    assert(stateOf(root) == ref.toSeq.sortBy(_._1))

    // a base snapshot exists and the folded epoch dirs are gone
    val names = new java.io.File(root).listFiles().map(_.getName).toSet
    assert(names.exists(_.startsWith("base")),
      s"expected a base snapshot in $names")
    val liveEpochs = names.count(_.matches("e\\d{10}"))
    assert(liveEpochs < n,
      s"expected folded epochs to be removed, still have $liveEpochs")
    // the newest epoch is never folded (crash-replay needs as-of-N-1)
    assert(names.contains(f"e${n - 1}%010d"))
  }

  test("stagedTombstones yields exactly the pre-existing tombstoned keys") {
    // keyed on the sf0.001 embeddings fixture: epoch 1 upserts the key
    // set, epoch 2 tombstones vec_id % 7 == 3; the CDC feed must return
    // exactly those keys (they all pre-exist) and nothing else
    val dir = sf("sf0.001")
    val keys = graft.sources.Tables.embeddings(spark, dir)
      .select(col("vec_id"))
    val got = DeltaLog.stagedTombstones(spark, "tombspec",
        s"$dir/embeddings.parquet", keys, col("vec_id") % 7 === 3,
        "vec_id")
      .as[Long].collect().toSet
    val want = keys.filter(col("vec_id") % 7 === 3)
      .as[Long].collect().toSet
    assert(got == want && got.nonEmpty)
  }
}
