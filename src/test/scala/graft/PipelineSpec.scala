package graft

import org.apache.spark.sql.functions._

/** End-to-end pipeline spec: one run over the reference's raw CSV on a
  * temp dir, funnel mart checked against an independently-derived
  * oracle (a direct count over the raw file, bypassing every pipeline
  * stage), SCD2 layer checked on its invariants.
  */
class PipelineSpec extends SparkSpec {
  import spark.implicits._

  private val rawCsv =
    "/root/reference/Data Sets/Raw Datasets/synthetic_order_lifecycle.csv"

  private lazy val out = {
    val dir = java.nio.file.Files.createTempDirectory("graft_pipeline_spec")
    dir.toFile.deleteOnExit()
    Pipeline.run(spark, rawCsv, dir.toString,
      java.sql.Timestamp.valueOf("2025-11-06 18:56:55.137075"))
  }

  test("funnel mart equals a direct count over the raw file") {
    // oracle: nothing from the pipeline — raw text straight to counts
    val oracle = spark.read.option("header", "true").csv(rawCsv)
      .groupBy("event_type").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val funnel = out.funnel.collect()
    assert(funnel.length == 4)
    assert(funnel.map(_.getAs[Int]("stage_rank")).toSeq == Seq(1, 2, 3, 4))
    funnel.foreach { r =>
      assert(r.getAs[Long]("n_events") == oracle(r.getAs[String]("stage")),
        s"stage ${r.getAs[String]("stage")}")
    }
  }

  test("the WIRED pipeline's silver and fact layers equal the " +
      "reference's published files (not just the operators in isolation)") {
    import org.apache.spark.sql.types._
    // golden cleansed file, parsed exactly as in GoldenFixtureSpec
    val schema = StructType(Seq(
      StructField("event_id", StringType), StructField("order_id", StringType),
      StructField("customer_id", StringType), StructField("event_type", StringType),
      StructField("event_timestamp", StringType), StructField("customer_name", StringType),
      StructField("customer_email", StringType), StructField("customer_city", StringType),
      StructField("customer_state", StringType), StructField("payment_value", DoubleType),
      StructField("lifecycle_step", IntegerType),
      StructField("load_timestamp", StringType),
      StructField("days_since_event", IntegerType)))
    val golden = spark.read.option("header", "true").schema(schema)
      .csv("/root/reference/Data Sets/Cleansed Data/synthetic_order_lifecycle.csv")
      .withColumn("event_timestamp", graft.operators.Silver.parseTimestamp(
        col("event_timestamp"), graft.operators.Silver.lifecycleFormats))
      .withColumn("load_timestamp", graft.operators.Silver.parseTimestamp(
        col("load_timestamp"), graft.operators.Silver.lifecycleFormats))
    // the pipeline's silver parquet (bronze adds + re-orders nothing:
    // align column order before frame compare)
    val silver = out.silver.select(golden.columns.map(col): _*)
    assert(silver.exceptAll(golden).count() == 0 &&
      golden.exceptAll(silver).count() == 0,
      "pipeline silver layer must be bit-identical to the published file")
  }

  test("every layer is written and row-count-consistent") {
    assert(out.bronze.count() == 5052)
    assert(out.silver.count() == 5052) // no dups, no unparseable rows
    assert(out.fact.count() == 5052)
    // fact carries no audit columns, silver does
    assert(out.silver.columns.contains("load_timestamp"))
    assert(!out.fact.columns.contains("load_timestamp"))
    assert(out.fact.columns.contains("date_sk"))
  }

  test("SCD2 order dimension: progressed orders carry closed+current " +
      "versions, one current row per key") {
    val hist = out.dimOrderHistory
    val nOrders = out.silver.select("order_id").distinct().count()
    // exactly one current version per order
    assert(hist.filter($"is_current").count() == nOrders)
    val multiCurrent = hist.filter($"is_current").groupBy("order_id")
      .count().filter($"count" > 1).count()
    assert(multiCurrent == 0)
    // orders that progressed past step 2 changed state → 2 versions
    val progressed = out.silver.filter($"lifecycle_step" > 2)
      .select("order_id").distinct().count()
    assert(progressed > 0)
    assert(hist.filter(!$"is_current").count() == progressed)
    // every closed interval abuts its successor
    val bad = hist.selectExpr("order_id", "valid_from", "valid_to")
      .withColumn("next_from", lead($"valid_from", 1).over(
        org.apache.spark.sql.expressions.Window
          .partitionBy("order_id").orderBy("valid_from")))
      .filter($"next_from".isNotNull && $"valid_to" =!= $"next_from")
      .count()
    assert(bad == 0)
  }
}
