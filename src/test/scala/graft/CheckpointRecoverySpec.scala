package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Exactly-once across a query RESTART: stateful streaming aggregation
  * resumes from its checkpoint — prior state intact, already-committed
  * batches not reprocessed — the fault-tolerance contract a 100 TB
  * deployment leans on every time an executor or driver dies
  * mid-stream. (The reference's event pipeline has no recovery story
  * at all; this pins ours.)
  */
class CheckpointRecoverySpec extends SparkSpec {
  import spark.implicits._

  test("stateful aggregation resumes from checkpoint without " +
      "double-counting") {
    val ckpt = java.nio.file.Files
      .createTempDirectory("graft_ckpt").toString
    val state = new java.util.concurrent.ConcurrentHashMap[String, Long]()
    implicit val sqlCtx = spark.sqlContext
    val src = MemoryStream[String]

    def startQuery() = src.toDF().toDF("k")
      .groupBy("k").agg(count(lit(1)).as("n"))
      .writeStream
      .outputMode("update") // update mode emits only keys touched per batch
      .option("checkpointLocation", ckpt)
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        batch.collect().foreach(r =>
          state.put(r.getString(0), r.getLong(1)))
        ()
      }
      .start()

    // run 1: two batches, then a clean stop
    val q1 = startQuery()
    src.addData("a", "b")
    q1.processAllAvailable()
    src.addData("a")
    q1.processAllAvailable()
    q1.stop()
    assert(state.get("a") == 2L && state.get("b") == 1L)

    // run 2: NEW query object, same checkpoint — state must carry over
    val q2 = startQuery()
    src.addData("a", "c")
    q2.processAllAvailable()
    q2.stop()

    // a = 3 proves prior state survived; a batch replay would overshoot,
    // a state loss would reset to 1
    assert(state.get("a") == 3L, s"state after restart: $state")
    assert(state.get("b") == 1L)
    assert(state.get("c") == 1L)
  }
}
