package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.sources.{DeltaLog, Tables}
import graft.streaming.StreamingIvfMaintainer

/** The streaming IVF maintainer's crash story, tested end-to-end (not
  * just DeltaLog in isolation): a batch that died after committing
  * SOME state tables must be invisible to the replayed batch's state
  * resolution, and the replay must converge to the clean run's exact
  * state — epoch idempotence per table + `< batchId` resolution
  * composing through ivfEpochStep. */
class IvfMaintainerRecoverySpec extends SparkSpec {

  private val dir = sf("sf0.001")

  private def batches: (DataFrame, DataFrame) = {
    val all = Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("embedding"))
    val prev = all.filter(col("vec_id") % 6 =!= 0)
    val seed = prev.withColumn("deleted", lit(false))
    val epoch = all.filter(col("vec_id") % 6 === 0)
      .withColumn("deleted", lit(false))
      .unionByName(prev.filter(col("vec_id") % 7 === 3)
        .select(col("vec_id"),
          lit(null).cast(ArrayType(FloatType)).as("embedding"))
        .withColumn("deleted", lit(true)))
    (seed, epoch)
  }

  private def resolvedState(root: String): Seq[Seq[String]] = {
    def dump(t: String, keys: Seq[String], cols: Seq[String]) =
      DeltaLog.read(spark, s"$root/state/$t", keys).get
        .select(cols.map(col): _*).orderBy(cols.map(col): _*)
        .collect().map(_.toString).toSeq
    Seq(dump("assigned", Seq("vec_id", "cid"), Seq("vec_id", "cid")),
      dump("pairs", Seq("ida", "idb"), Seq("ida", "idb")),
      dump("comp", Seq("vec_id"), Seq("vec_id", "component")))
  }

  test("a batch that crashed after committing one table replays to " +
      "the clean run's exact state; full replay is a no-op") {
    val (seed, epoch) = batches
    val pid = ProcessHandle.current().pid()
    val rootA = s"/tmp/graft-ivfrec-a-p$pid"
    val rootB = s"/tmp/graft-ivfrec-b-p$pid"
    for (r <- Seq(rootA, rootB))
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(r))

    // clean run
    StreamingIvfMaintainer.applyBatch(spark, rootA, seed, 0L)
    StreamingIvfMaintainer.applyBatch(spark, rootA, epoch, 1L)
    val clean = resolvedState(rootA)

    // crashed run: seed lands, then the epoch-1 attempt commits ONLY
    // the pairs table (copied from the clean run's epoch dir, _READY
    // and all) before dying
    StreamingIvfMaintainer.applyBatch(spark, rootB, seed, 0L)
    val e1 = f"e${1L}%010d"
    org.apache.commons.io.FileUtils.copyDirectory(
      new java.io.File(s"$rootA/state/pairs/$e1"),
      new java.io.File(s"$rootB/state/pairs/$e1"))
    // recovery replays batch 1: resolution at < 1 must not see the
    // partial commit; the pairs commit itself must no-op
    StreamingIvfMaintainer.applyBatch(spark, rootB, epoch, 1L)
    assert(resolvedState(rootB) == clean,
      "recovered state diverges from the clean run")

    // replaying an already-committed batch changes nothing
    StreamingIvfMaintainer.applyBatch(spark, rootA, epoch, 1L)
    assert(resolvedState(rootA) == clean,
      "replaying a committed batch mutated state")

    for (r <- Seq(rootA, rootB))
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(r))
  }
}
