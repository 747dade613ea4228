package graft

import org.apache.spark.sql.SparkSession

/** Plan inspector: `runMain graft.Explain <sfDir> [query ...]` prints
  * the formatted physical plan for each named query (default: all
  * batch queries). The review loop for every operator: check that
  * filters/projections reach the scan (PushedFilters/ReadSchema), small
  * dimensions broadcast, and WholeStageCodegen spans stay wide.
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val only = args.drop(1).toSet
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      // testdata timestamps are untagged INT64 (timestamp[us], no tz);
      // Spark 4 would infer TIMESTAMP_NTZ — read them as session-tz
      // TIMESTAMP (UTC) as the oracle comparison and every gate expect
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      // bucketed joins whose equi-keys EXTEND the bucket key (e.g. the
      // IVF index self-join on (cid, _sub)) stay exchange-free: children
      // co-partitioned on a subset of the join keys is exactly what a
      // bucketed layout provides (IvfIndexSpec pins the plan)
      .config("spark.sql.requireAllClusterKeysForCoPartition", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    SparkEntry.queries.toSeq.sortBy(_._1)
      .filterNot(_._1.contains("streaming"))
      .filter { case (n, _) => only.isEmpty || only(n) }
      .foreach { case (name, fn) =>
        println(s"\n========== $name ==========")
        try fn(spark, sfDir).explain("formatted")
        catch { case e: Throwable => println(s"EXPLAIN FAILED: $e") }
      }
    spark.stop()
  }
}
