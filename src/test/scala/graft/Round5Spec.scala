package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.types._

import graft.operators.{Events, Relational}

/** Specs for the round-5 additions (lateral top-k, map surface, JSON
  * round trip) plus two plan-shape guarantees that matter at scale:
  * nested schema pruning and query-attached observe() metrics.
  */
class Round5Spec extends SparkSpec {
  import spark.implicits._

  private val dir = sf("sf0.001")

  test("lateralTopOrders: decorrelated to a window limit, k bounded") {
    val df = Relational.lateralTopOrders(spark, dir)
    // Catalyst must rewrite the correlated LIMIT into a per-key window,
    // not a per-row nested loop: the optimized plan carries a Window
    // and no CartesianProduct
    val opt = df.queryExecution.optimizedPlan.toString
    assert(opt.contains("row_number") || opt.contains("Window"),
      s"expected window-decorrelated lateral:\n$opt")
    assert(!df.queryExecution.executedPlan.toString.contains("CartesianProduct"))
    // no customer exceeds k=2 rows, and the 2 rows are that customer's max
    val counts = df.groupBy("c_custkey").count()
    assert(counts.filter($"count" > 2).count() == 0)
    val probe = df.filter($"c_custkey" === 1).select("top_price")
      .as[Double].collect().toSet
    val brute = graft.sources.Tables.orders(spark, dir)
      .filter($"o_custkey" === 1).select("o_totalprice")
      .as[Double].collect().sorted(Ordering[Double].reverse).take(2).toSet
    assert(probe == brute)
  }

  test("mapFuncs: totals equal raw recounts and counts_json parses back") {
    val rows = Events.mapFuncs(spark, dir)
    val raw = graft.sources.Tables.events(spark, dir)
      .filter($"event_type".isNotNull)
      .groupBy("user_id").agg(count(lit(1)).as("n_raw"))
    assert(rows.join(raw, "user_id")
      .filter($"total_events" =!= $"n_raw").count() == 0)
    // the emitted JSON is a faithful map: parse it back and re-total
    val reparsed = rows.select($"user_id", $"total_events",
      from_json($"counts_json", MapType(StringType, LongType)).as("m"))
      .select($"user_id", $"total_events",
        aggregate(map_values($"m"), lit(0L), (a, v) => a + v).as("re_total"))
    assert(reparsed.filter($"total_events" =!= $"re_total").count() == 0)
  }

  test("jsonRoundTrip: parsed counts equal raw lineitem cardinality") {
    val rows = Relational.jsonRoundTrip(spark, dir)
    val raw = graft.sources.Tables.lineitem(spark, dir)
      .filter($"l_orderkey" < 500)
      .groupBy($"l_orderkey".as("order_id"))
      .agg(count(lit(1)).as("n_raw"))
    assert(rows.join(raw, "order_id")
      .filter($"n_items" =!= $"n_raw").count() == 0)
  }

  test("nested schema pruning: one leaf selected reads one leaf") {
    val path = s"${System.getProperty("java.io.tmpdir")}/graft_nested_spec"
    graft.sources.Tables.lineitem(spark, dir)
      .select(col("l_orderkey"), struct(
        struct(col("l_returnflag").as("flag"), col("l_linestatus").as("status"))
          .as("meta"),
        struct(col("l_extendedprice").as("price"), col("l_discount").as("disc"),
          col("l_tax").as("tax")).as("amounts")).as("detail"))
      .write.mode("overwrite").parquet(path)
    val df = spark.read.parquet(path)
      .select(col("l_orderkey"), col("detail.amounts.price"))
    df.collect()
    val scan = df.queryExecution.executedPlan.collectFirst {
      case s: FileSourceScanExec => s
    }.get
    // requiredSchema must contain the price leaf but NOT the sibling
    // leaves — at 100 TB reading 1 of 5 nested leaves is 5× less IO
    val readSchema = scan.requiredSchema.catalogString
    assert(readSchema.contains("price"), readSchema)
    assert(!readSchema.contains("flag") && !readSchema.contains("tax"),
      s"nested pruning failed: $readSchema")
  }

  test("observe(): DQ metrics ride the query without a second scan") {
    val observed = graft.sources.Tables.orders(spark, dir)
      .observe("dq",
        count(lit(1)).as("n_rows"),
        sum(when(col("o_totalprice").isNull, 1L).otherwise(0L)).as("null_price"))
      .filter(col("o_orderstatus") === "O")
    // collect() on the observed dataset itself — count() would spin up
    // a separate QueryExecution and the metrics would attach there
    val kept = observed.collect().length.toLong
    val metrics = observed.queryExecution.observedMetrics("dq")
    // the metric sees ALL rows flowing past the observe point — the
    // pre-filter cardinality — while the query result is filtered
    val total = graft.sources.Tables.orders(spark, dir).count()
    assert(metrics.getAs[Long]("n_rows") == total)
    assert(metrics.getAs[Long]("null_price") == 0L)
    assert(kept < total)
  }
}
