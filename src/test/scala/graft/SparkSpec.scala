package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared local session for specs (one per suite, lazy). */
trait SparkSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    // testdata timestamps are untagged INT64 (timestamp[us], no tz);
    // Spark 4 would infer TIMESTAMP_NTZ — read them as session-tz
    // TIMESTAMP (UTC) as the oracle comparison and every gate expect
    .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
    // mirror the product sessions: bucketed joins whose equi-keys extend
    // the bucket key (IVF index self-join) stay exchange-free
    .config("spark.sql.requireAllClusterKeysForCoPartition", "false")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .config("spark.sql.warehouse.dir",
      s"${System.getProperty("java.io.tmpdir")}/graft_warehouse_test")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  def sf(n: String): String = s"/root/testdata/$n"
}
