package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Parquet table loaders for the TESTDATA star schema (TESTDATA.md).
  *
  * Mirrors the reference's source surface (SURVEY.md §2.1): the
  * reference reads CSVs into a warehouse (ecom_Bronze_Layer.ipynb:38–58);
  * here every layer is columnar parquet read lazily so Catalyst pushes
  * filters and prunes columns down to the scan.
  */
object Tables {
  val all: Seq[String] = Seq("region", "nation", "customer", "supplier",
    "part", "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = load(s, d, "lineitem")
  /** The events table ships with nanosecond parquet timestamps, which
    * Spark's reader rejects; with `spark.sql.legacy.parquet.nanosAsLong`
    * the column arrives as a long we truncate to microseconds — the same
    * truncation DuckDB applies, so event-time semantics match the oracle.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    val raw = load(s, d, "events")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts",
          org.apache.spark.sql.functions.timestamp_micros(
            org.apache.spark.sql.functions.expr("ts DIV 1000")))
      case _ => raw
    }
  }
  def documents(s: SparkSession, d: String): DataFrame = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")

  /** Defensive read (reference app.py:13–20 returns an empty frame when
    * the extract is missing): missing path → empty frame with schema. */
  def loadOrEmpty(spark: SparkSession, dir: String, name: String,
      schema: org.apache.spark.sql.types.StructType): DataFrame =
    if (new java.io.File(s"$dir/$name.parquet").exists())
      spark.read.schema(schema).parquet(s"$dir/$name.parquet")
    else spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
}
