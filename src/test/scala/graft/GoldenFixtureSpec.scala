package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.operators.{Gold, Silver}

/** End-to-end parity against the reference's PUBLISHED outputs — the
  * only ground truth the reference ships (`Data Sets/Cleansed Data/`).
  *
  * 1. Raw `synthetic_order_lifecycle.csv` → [[Silver.cleanseLifecycle]]
  *    must reproduce the cleansed golden file bit-for-bit (5,052 rows,
  *    0-fill, constant audit ts, floor-toward--inf day counts — the
  *    golden file contains negative days, so `datediff` semantics would
  *    fail here).
  * 2. Cleansed golden → [[Gold.lifecycleFact]] must reproduce the
  *    published `fact_order_lifecycle.csv`.
  * 3. `dim_products` / `dim_sellers` golden files (whose RAW inputs are
  *    absent from the checkout — `.MISSING_LARGE_BLOBS:1–8`): assert
  *    our Silver cleanse post-conditions hold and the cleanse is
  *    IDEMPOTENT on them — rerunning dedup + median/Unknown/zip fills
  *    over the reference's own output changes nothing. That is the
  *    strongest statement available without the raw CSVs.
  */
class GoldenFixtureSpec extends SparkSpec {
  import spark.implicits._

  private val base = "/root/reference/Data Sets"
  private val goldenLoadTs = java.sql.Timestamp.valueOf("2025-11-06 18:56:55.137075")

  private val lifecycleSchema = StructType(Seq(
    StructField("event_id", StringType),
    StructField("order_id", StringType),
    StructField("customer_id", StringType),
    StructField("event_type", StringType),
    StructField("event_timestamp", StringType),
    StructField("customer_name", StringType),
    StructField("customer_email", StringType),
    StructField("customer_city", StringType),
    StructField("customer_state", StringType),
    StructField("payment_value", DoubleType),
    StructField("lifecycle_step", IntegerType)))

  private def csv(path: String, schema: StructType): DataFrame =
    spark.read.option("header", "true").schema(schema).csv(path)

  private lazy val cleansedGolden: DataFrame = {
    val schema = StructType(lifecycleSchema.fields ++ Seq(
      StructField("load_timestamp", StringType),
      StructField("days_since_event", IntegerType)))
    csv(s"$base/Cleansed Data/synthetic_order_lifecycle.csv", schema)
      .withColumn("event_timestamp",
        Silver.parseTimestamp(col("event_timestamp"), Silver.lifecycleFormats))
      .withColumn("load_timestamp",
        Silver.parseTimestamp(col("load_timestamp"), Silver.lifecycleFormats))
  }

  private def assertFramesEqual(ours: DataFrame, golden: DataFrame,
      label: String): Unit = {
    assert(ours.columns.toSeq == golden.columns.toSeq,
      s"$label: column order ${ours.columns.toSeq} vs ${golden.columns.toSeq}")
    val n = golden.count()
    assert(ours.count() == n, s"$label: row count")
    val extra = ours.exceptAll(golden).count()
    val missing = golden.exceptAll(ours).count()
    assert(extra == 0 && missing == 0,
      s"$label: $extra rows not in golden, $missing golden rows not produced")
  }

  test("Silver cleanse reproduces the published cleansed lifecycle file") {
    val raw = csv(s"$base/Raw Datasets/synthetic_order_lifecycle.csv",
      lifecycleSchema)
    val ours = Silver.cleanseLifecycle(raw, goldenLoadTs)
    assertFramesEqual(ours, cleansedGolden, "cleansed lifecycle")
    // the quirks individually, so a regression names itself:
    assert(ours.filter(col("payment_value").isNull).count() == 0)
    assert(ours.filter(col("payment_value") === 0.0).count() == 3789,
      "the reference's 0-fill count (3,789 NULL payment rows)")
    assert(ours.filter(col("days_since_event") < 0).count() > 0,
      "negative day counts (events after the batch instant) must survive")
  }

  test("Gold lifecycle fact reproduces the published fact file") {
    val factSchema = StructType(Seq(
      StructField("event_id", StringType),
      StructField("order_id", StringType),
      StructField("customer_id", StringType),
      StructField("date_sk", IntegerType),
      StructField("event_type", StringType),
      StructField("event_timestamp", StringType),
      StructField("payment_value", DoubleType),
      StructField("lifecycle_step", IntegerType)))
    val golden = csv(s"$base/Cleansed Data/fact_order_lifecycle.csv", factSchema)
      .withColumn("event_timestamp",
        Silver.parseTimestamp(col("event_timestamp"), Silver.lifecycleFormats))
    val ours = Gold.lifecycleFact(cleansedGolden)
    assertFramesEqual(ours, golden, "lifecycle fact")
  }

  test("dim_products golden: Silver post-conditions hold and the " +
      "cleanse is idempotent on the reference's own output") {
    val schema = StructType(Seq(
      StructField("product_id", StringType),
      StructField("product_category_name", StringType),
      StructField("product_name_lenght", IntegerType),
      StructField("product_description_lenght", IntegerType),
      StructField("product_photos_qty", IntegerType),
      StructField("product_weight_g", IntegerType),
      StructField("product_length_cm", IntegerType),
      StructField("product_height_cm", IntegerType),
      StructField("product_width_cm", IntegerType),
      StructField("load_timestamp", StringType),
      StructField("product_sk", LongType)))
    val golden = csv(s"$base/Cleansed Data/dim_products.csv", schema)
    assert(golden.count() == 32951, "published dim_products row count")
    // post-conditions of the reference cleanse = post-conditions of ours
    val nullCells = golden.select(golden.columns.map(c =>
      sum(col(c).isNull.cast("long")).as(c)): _*).first()
    assert((0 until nullCells.length).forall(i => nullCells.getLong(i) == 0),
      "no NULLs survive the cleanse")
    assert(golden.filter(col("product_category_name") === "Unknown")
      .count() > 0, "string NULLs were filled 'Unknown'")
    assert(golden.select("load_timestamp").distinct().count() == 1,
      "one constant audit timestamp per batch")
    // idempotence: dedup + median/Unknown fills change nothing
    val again = Silver.fillNulls(Silver.dedup(golden),
      medianCols = Seq("product_weight_g"))
    assertFramesEqual(again, golden, "dim_products idempotence")
  }

  test("dim_sellers golden: post-conditions, zip-fill quirk form, " +
      "idempotence") {
    val schema = StructType(Seq(
      StructField("seller_id", StringType),
      StructField("seller_zip_code_prefix", StringType),
      StructField("seller_city", StringType),
      StructField("seller_state", StringType),
      StructField("Latitude", DoubleType),
      StructField("Longitude", DoubleType),
      StructField("load_timestamp", StringType),
      StructField("seller_sk", LongType)))
    val golden = csv(s"$base/Cleansed Data/dim_sellers.csv", schema)
    assert(golden.count() == 3095, "published dim_sellers row count")
    val nullZip = golden.filter(col("seller_zip_code_prefix").isNull).count()
    assert(nullZip == 0, "zip NULLs were filled (the '0' quirk, " +
      "ecom_Silver_Layer.ipynb zip/postal branch)")
    assert(golden.select("load_timestamp").distinct().count() == 1)
    // idempotence with the zip override in place (NULL zips → "0")
    val again = Silver.fillNulls(Silver.dedup(golden),
      overrides = Map("seller_zip_code_prefix" -> "0"))
    assertFramesEqual(again, golden, "dim_sellers idempotence")
  }
}
