package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables
import graft.util.Portable._

/** Gold-layer star-schema fact build (SURVEY §2 J1–J4, F7, F16, P2;
  * reference ecom_Gold_Layer.ipynb:62–125).
  *
  * The reference builds `fact_order_items` by joining orders⋈customers⋈
  * payments in the warehouse, then enriching with driver-side dict
  * lookups for surrogate keys and a demo `ON TRUE` cross join for
  * products/sellers (ecom_Gold_Layer.ipynb:81–82). Here the same star
  * comes out of real equi-joins on the TESTDATA schema: lineitem is the
  * fact spine; orders co-shuffles with it on the order key; part and
  * supplier are broadcast dimension lookups (the Spark form of the
  * reference's SK dicts, ecom_Gold_Layer.ipynb:37–48); the date SK is
  * computed, not joined (F7).
  *
  * Scale: one fact↔fact shuffle (lineitem⋈orders on orderkey) + one on
  * custkey for the customer attrs; both AQE-managed. All dimension joins
  * broadcast. Derived money metrics stay in decimal until the boundary.
  * Written out this would be `partitionBy(order_date)` parquet, bucketed
  * by order_sk for downstream mart co-location.
  */
object Gold {

  /** Full typed fact row set, deterministic order. Derived metrics
    * follow the reference's patterns (ecom_Gold_Layer.ipynb:109–111
    * total_amount = price*qty + freight; app.py:256–260 fee/margin
    * arithmetic) re-based on real lineitem columns. */
  def factOrderItems(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
    val o = Tables.orders(spark, dir)
    val c = Tables.customer(spark, dir)
    val p = Tables.part(spark, dir)
    val s = Tables.supplier(spark, dir)
    li.join(o, li("l_orderkey") === o("o_orderkey"))
      .join(c, o("o_custkey") === c("c_custkey"))
      .join(broadcast(p), li("l_partkey") === p("p_partkey"))
      .join(broadcast(s), li("l_suppkey") === s("s_suppkey"))
      .select(
        col("l_orderkey").as("order_id"),
        col("l_linenumber").as("line_number"),
        col("o_custkey").as("customer_id"),
        col("l_partkey").as("product_id"),
        col("l_suppkey").as("seller_id"),
        col("c_mktsegment").as("customer_segment"),
        col("p_brand").as("product_brand"),
        col("s_name").as("seller_name"),
        col("o_orderstatus").as("order_status"),
        to_date(col("o_orderdate")).as("order_date"),
        date_format(col("o_orderdate"), "yyyyMMdd").cast("int").as("date_sk"),
        date_format(col("l_shipdate"), "yyyyMMdd").cast("int").as("ship_date_sk"),
        val2(col("l_quantity")).as("quantity"),
        val2(col("l_extendedprice")).as("gross_amount"),
        val4(col("l_extendedprice") * (lit(1.0) - col("l_discount")))
          .as("net_amount"),
        val4(col("l_extendedprice") * (lit(1.0) - col("l_discount"))
          * (lit(1.0) + col("l_tax"))).as("charged_amount"),
        val4(col("l_extendedprice") * col("l_discount"))
          .as("discount_amount"))
      .orderBy("order_id", "line_number")
  }

  /** Write the fact with the storage layout the reference declares for
    * its big tables (Scd_Type2.sql:91–92 `PARTITION BY DATE(valid_from)
    * CLUSTER BY order_id`, SURVEY §4): parquet partitioned by order
    * month — so month-range queries prune directories — and sorted
    * within partitions by the clustering key, so parquet row-group
    * min/max stats make point lookups skip. A saveAsTable deployment
    * would add `bucketBy(n, "order_id")` for co-located joins; plain
    * parquet paths can't carry bucket metadata. */
  def writeFactPartitioned(fact: DataFrame, path: String): Unit =
    fact
      .withColumn("order_month", date_format(col("order_date"), "yyyy-MM"))
      .repartition(col("order_month"))
      .sortWithinPartitions("order_id", "line_number")
      .write.mode("overwrite")
      .partitionBy("order_month")
      .parquet(path)

  /** Generated date dimension (reference builds dim_date and a
    * full_date → date_sk lookup, ecom_Gold_Layer.ipynb:53–57; F7):
    * one sequence-explode over the order-date range, no input scan.
    * iso_dow = 1 (Monday) … 7 — portable across engines. */
  def dateDim(spark: SparkSession, dir: String): DataFrame =
    spark.range(1)
      .select(explode(sequence(
        lit("1995-01-01").cast("date"), lit("2001-12-31").cast("date")))
        .as("full_date"))
      .select(
        col("full_date"),
        date_format(col("full_date"), "yyyyMMdd").cast("int").as("date_sk"),
        year(col("full_date")).as("year"),
        quarter(col("full_date")).as("quarter"),
        month(col("full_date")).as("month"),
        (weekday(col("full_date")) + 1).as("iso_dow"))
      .orderBy("full_date")

  /** Lifecycle fact from the cleansed event stream (golden output
    * `Data Sets/Cleansed Data/fact_order_lifecycle.csv`): audit columns
    * drop, `date_sk` derives yyyymmdd from the event timestamp — the
    * degenerate-dimension star shape the reference's dashboard reads
    * (app.py:58). Map-only: no shuffle, stays in whole-stage codegen;
    * GoldenFixtureSpec pins it against the published fact file. */
  def lifecycleFact(cleansed: DataFrame): DataFrame =
    cleansed.select(
      col("event_id"), col("order_id"), col("customer_id"),
      date_format(col("event_timestamp"), "yyyyMMdd").cast("int").as("date_sk"),
      col("event_type"), col("event_timestamp"),
      col("payment_value"), col("lifecycle_step"))

  /** Dashboard KPI scalars in one pass (reference app.py:179–205,
    * 253–261 — F19/A2/A6/A8: totals, average order value, status
    * share). One row out; everything derived from exact sums. */
  def kpis(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir).agg(
      count(lit(1)).as("total_orders"),
      sumMoney2(col("o_totalprice")).as("total_revenue"),
      (sumMoney2(col("o_totalprice")) / count(lit(1))).as("avg_order_value"),
      val4(sum(when(col("o_orderstatus") === "O", 1).otherwise(0))
        .cast("double") * 100.0 / count(lit(1))).as("open_pct"))

  /** Mart: product performance (reference gold_product_performance,
    * README.md:83; consumed by app.py:371–445) over the fact. */
  def productPerformance(spark: SparkSession, dir: String): DataFrame =
    factOrderItems(spark, dir)
      .groupBy("product_brand")
      .agg(
        sumMoney4(col("net_amount")).as("revenue"),
        sumMoney2(col("quantity")).as("units"),
        countDistinct(col("order_id")).as("n_orders"))
      .orderBy("product_brand")
}
