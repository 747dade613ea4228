package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Stateful streaming on the RocksDB state store — the provider a
  * 100 TB deployment runs (state spills off-heap to local SST files
  * instead of living on the JVM heap like the default HDFS-backed
  * map; changelog checkpointing bounds recovery). The toy default
  * hides exactly the failure mode that kills big stateful jobs —
  * executor OOM when keyspace outgrows the heap — so the engine's
  * streaming operators must be proven against the scale provider.
  */
class RocksDbStateSpec extends SparkSpec {
  import spark.implicits._

  test("stateful aggregation + checkpoint restart on RocksDB state store") {
    val conf = spark.conf
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = conf.getOption(key)
    conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val ckpt = java.nio.file.Files
        .createTempDirectory("graft_rocks_ckpt").toString
      val state = new java.util.concurrent.ConcurrentHashMap[String, Long]()
      implicit val sqlCtx = spark.sqlContext
      val src = MemoryStream[String]
      def startQuery() = src.toDF().toDF("k")
        .groupBy("k").agg(count(lit(1)).as("n"))
        .writeStream
        .outputMode("update")
        .option("checkpointLocation", ckpt)
        .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
          b.collect().foreach(r => state.put(r.getString(0), r.getLong(1)))
          ()
        }
        .start()

      val q1 = startQuery()
      src.addData("a", "b", "a")
      q1.processAllAvailable()
      // the running query must actually be on RocksDB, not the default
      val usedProvider = q1.lastProgress.stateOperators.head
        .customMetrics.keySet.toString
      assert(usedProvider.contains("rocksdb"),
        s"expected rocksdb custom metrics, got $usedProvider")
      q1.stop()
      assert(state.get("a") == 2L && state.get("b") == 1L)

      // restart from the RocksDB checkpoint: state carries over
      val q2 = startQuery()
      src.addData("a")
      q2.processAllAvailable()
      q2.stop()
      assert(state.get("a") == 3L, s"state after restart: $state")
    } finally prev match {
      case Some(v) => conf.set(key, v)
      case None => conf.unset(key)
    }
  }
}
