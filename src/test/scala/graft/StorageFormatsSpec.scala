package graft

import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Source/sink coverage beyond parquet+csv: ORC round-trip with
  * predicate pushdown reaching the scan, JSON-lines round-trip, and
  * catalog-managed tables (saveAsTable → SQL over the catalog) — the
  * storage surfaces a drop-in engine replacement gets asked for first.
  */
class StorageFormatsSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(name: String) =
    s"${System.getProperty("java.io.tmpdir")}/graft_fmt_$name"

  test("ORC round-trip is lossless and pushes predicates to the scan") {
    val src = Tables.orders(spark, sf("sf0.001"))
      .select("o_orderkey", "o_orderstatus", "o_totalprice", "o_orderdate")
    src.write.mode("overwrite").orc(tmp("orders_orc"))
    val back = spark.read.orc(tmp("orders_orc"))
    assert(back.count() == src.count())
    assert(back.exceptAll(src).count() == 0 && src.exceptAll(back).count() == 0)
    // filter + projection must reach the ORC scan, as with parquet
    val q = back.filter($"o_orderstatus" === "F").select("o_orderkey")
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(o_orderstatus), " +
      "EqualTo(o_orderstatus,F)]"), s"no ORC pushdown:\n$plan")
    assert(plan.contains("ReadSchema: struct<o_orderkey:bigint,o_orderstatus:string>"),
      s"no ORC column pruning:\n$plan")
  }

  test("JSON-lines round-trip preserves values (schema re-applied on read)") {
    val src = Tables.nation(spark, sf("sf0.001"))
    src.write.mode("overwrite").json(tmp("nation_json"))
    val back = spark.read.schema(src.schema).json(tmp("nation_json"))
    assert(back.exceptAll(src).count() == 0 && src.exceptAll(back).count() == 0)
  }

  test("catalog-managed table: saveAsTable then SQL over the catalog") {
    spark.sql("DROP TABLE IF EXISTS graft_nation_managed")
    Tables.nation(spark, sf("sf0.001"))
      .write.mode("overwrite").saveAsTable("graft_nation_managed")
    val n = spark.sql(
      "SELECT COUNT(*) AS n FROM graft_nation_managed WHERE n_regionkey = 0")
      .as[Long].head()
    val expect = Tables.nation(spark, sf("sf0.001"))
      .filter($"n_regionkey" === 0).count()
    assert(n == expect)
    assert(spark.catalog.tableExists("graft_nation_managed"))
    spark.sql("DROP TABLE graft_nation_managed")
  }

  test("schema evolution: mergeSchema unions drifted batch schemas, " +
      "missing columns read as null") {
    import org.apache.spark.sql.functions._
    // batch 1 writes (n_nationkey, n_name); batch 2 adds a column —
    // the standard additive drift a long-lived lake table accretes
    val dir = java.nio.file.Files
      .createTempDirectory("graft_schema_evo").toString
    val nation = Tables.nation(spark, sf("sf0.001"))
    nation.select($"n_nationkey", $"n_name")
      .write.mode("append").parquet(dir)
    nation.select($"n_nationkey", $"n_name",
        $"n_regionkey".as("region_added"))
      .write.mode("append").parquet(dir)

    val merged = spark.read.option("mergeSchema", "true").parquet(dir)
    assert(merged.columns.sorted.toSeq ==
      Seq("n_name", "n_nationkey", "region_added"))
    val total = nation.count()
    assert(merged.count() == 2 * total)
    // exactly the batch-1 rows surface the missing column as null
    assert(merged.filter($"region_added".isNull).count() == total)
    // and batch-2 values survive intact
    assert(merged.filter($"region_added".isNotNull)
      .agg(sum("region_added")).as[Long].head() ==
      nation.agg(sum("n_regionkey")).as[Long].head())
  }
}
