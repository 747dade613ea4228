package graft

import org.apache.spark.sql.functions._
import graft.operators.Gold

class GoldWriteSpec extends SparkSpec {
  import spark.implicits._

  test("fact write partitions by month and prunes on read") {
    val out = java.nio.file.Files.createTempDirectory("gold").toString
    val fact = Gold.factOrderItems(spark, sf("sf0.001"))
    Gold.writeFactPartitioned(fact, out)

    // hive-style month directories exist
    val dirs = new java.io.File(out).listFiles()
      .filter(_.isDirectory).map(_.getName).filter(_.startsWith("order_month="))
    assert(dirs.length > 70) // 80 months in the data

    // a month filter prunes partitions at plan time
    val df = spark.read.parquet(out)
      .filter($"order_month" === "1995-06")
    val scan = df.queryExecution.executedPlan.toString
    assert(scan.contains("PartitionFilters: [isnotnull(order_month"))
    assert(df.count() > 0)
    assert(df.select("order_month").distinct().as[String].collect()
      .toSeq == Seq("1995-06"))

    // row content round-trips (modulo the added partition column)
    assert(spark.read.parquet(out).count() == fact.count())
  }

  test("gold rebuild is idempotent: rerun + overwrite reproduce content") {
    // the engine has no rand()/monotonic ids in the fact path, so a
    // rerun computes the identical table — the property that makes
    // full-reload (the reference's WRITE_TRUNCATE) and retry-on-failure
    // safe at any scale
    val dir = sf("sf0.001")
    val a = Gold.factOrderItems(spark, dir)
    val b = Gold.factOrderItems(spark, dir)
    assert(a.collect().map(_.toSeq).toSeq == b.collect().map(_.toSeq).toSeq)

    val out = java.nio.file.Files.createTempDirectory("goldi").toString
    Gold.writeFactPartitioned(Gold.factOrderItems(spark, dir), out)
    val first = spark.read.parquet(out).orderBy("order_id", "line_number")
      .collect().map(_.toSeq).toSeq
    Gold.writeFactPartitioned(Gold.factOrderItems(spark, dir), out)
    val second = spark.read.parquet(out).orderBy("order_id", "line_number")
      .collect().map(_.toSeq).toSeq
    assert(first == second)
  }
}
