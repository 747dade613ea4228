package graft

import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Proof of the SCALE.md claim that bucketing removes the fact⋈fact
  * shuffle: orders and lineitem written `bucketBy(orderkey)` join with
  * NO Exchange in the physical plan — the repeated-gold-build path at
  * 100 TB, where re-shuffling both sides per run is the dominant cost.
  */
class BucketedJoinSpec extends SparkSpec {
  import spark.implicits._

  test("co-bucketed fact tables join without a shuffle") {
    val dir = sf("sf0.001")
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
    Tables.orders(spark, dir).write.mode("overwrite")
      .format("parquet").bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .saveAsTable("b_orders")
    Tables.lineitem(spark, dir).write.mode("overwrite")
      .format("parquet").bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .saveAsTable("b_lineitem")

    val prevBroadcast = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760")
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled", "true")
    try {
      // force the sort-merge path so the assertion is about BUCKETING,
      // not about one side being broadcast-small
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.adaptive.enabled", "false")

      val joined = spark.table("b_lineitem")
        .join(spark.table("b_orders"), $"l_orderkey" === $"o_orderkey")
        .groupBy("o_orderpriority").agg(count(lit(1)).as("n"))
      val plan = joined.queryExecution.executedPlan.toString

      // the JOIN itself must read co-located buckets: no Exchange may
      // appear below the SortMergeJoin (the groupBy above it still
      // shuffles — find the join subtree and check it)
      val joinIdx = plan.indexOf("SortMergeJoin")
      assert(joinIdx >= 0, s"expected a sort-merge join:\n$plan")
      assert(!plan.substring(joinIdx).contains("Exchange"),
        s"bucketed join still shuffles:\n$plan")

      // and it is not just plan-cosmetic: results match the plain join
      val expected = Tables.lineitem(spark, dir)
        .join(Tables.orders(spark, dir), $"l_orderkey" === $"o_orderkey")
        .groupBy("o_orderpriority").agg(count(lit(1)).as("n"))
      assert(joined.orderBy("o_orderpriority").collect().toSeq ==
        expected.orderBy("o_orderpriority").collect().toSeq)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevBroadcast)
      spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
      spark.sql("DROP TABLE IF EXISTS b_orders")
      spark.sql("DROP TABLE IF EXISTS b_lineitem")
    }
  }
}
