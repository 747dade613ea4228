package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.util.Portable._

/** Bucketed (hash-clustered) table layout — the storage-side answer to
  * the join shuffle. The reference clusters its SCD2 dimension on the
  * business key (`CLUSTER BY order_id`, Scd_Type2.sql:92) so BigQuery
  * co-locates merge probes; Spark's equivalent is `bucketBy(n, key)` on
  * write: both sides of a fact⋈fact join pre-hashed into the same
  * bucket count join with NO exchange on either side — at 100 TB the
  * single biggest plan win available, because the orders⋈lineitem
  * shuffle (the full fact width, twice) simply disappears from every
  * downstream query that joins on the bucketed key.
  *
  * This environment's catalog is in-memory, so the bucketing METADATA
  * dies with the session while the files persist; [[ensure]] therefore
  * (re)registers or (re)writes idempotently: table in catalog → reuse;
  * else write once per session into the session warehouse. The write
  * `repartition`s on the key first so each bucket lands as ONE sorted
  * file (multi-file buckets would force a per-bucket sort back into
  * the read plan).
  */
object Bucketing {

  val NumBuckets = 8

  /** Register `name` as a bucketed table of `df` clustered on `key`.
    * Files live at a deterministic external path: a fresh session with
    * an empty in-memory catalog but surviving files re-REGISTERS (DDL
    * only, no rewrite) — exactly how a real metastore-less deployment
    * re-attaches its bucketed layout. */
  def ensure(spark: SparkSession, name: String, df: => DataFrame,
      key: String): Unit =
    if (!spark.catalog.tableExists(name)) {
      val path =
        s"${System.getProperty("java.io.tmpdir")}/graft_bucketed/$name"
      if (new java.io.File(path, "_SUCCESS").exists()) {
        spark.sql(s"CREATE TABLE $name (${df.schema.toDDL}) USING PARQUET " +
          s"CLUSTERED BY ($key) SORTED BY ($key) INTO $NumBuckets BUCKETS " +
          s"LOCATION '$path'")
      } else {
        df.repartition(NumBuckets, col(key))
          .write
          .bucketBy(NumBuckets, key)
          .sortBy(key)
          .option("path", path)
          .mode("overwrite")
          .saveAsTable(name)
      }
    }

  /** Revenue per order priority off the bucketed orders⋈lineitem join.
    * Identical semantics to the plain-table join (the oracle states it
    * over the raw tables); the bucketed plan replaces both join-input
    * exchanges with bucket-aligned scans — `BucketedJoinSpec` asserts
    * the join subtree is exchange-free. The post-join agg still
    * shuffles, but on the 5-row priority domain after map-side partial
    * aggregation. */
  def bucketedRevenue(spark: SparkSession, dir: String): DataFrame = {
    val tag = dir.replaceAll("[^A-Za-z0-9]", "_")
    // fixture content signature + process id in the name (= the path
    // key): a regenerated fixture re-buckets instead of re-registering
    // stale surviving files, and two JVMs never overwrite each other's
    // bucketed write — the IvfIndex hardening, applied here too
    val pid = ProcessHandle.current().pid()
    def k(t: String) =
      graft.streaming.FixtureStaging.key("bkt", s"$dir/$t.parquet")
    val ot = s"b_orders_${k("orders")}_j${pid}_$tag"
    val lt = s"b_lineitem_${k("lineitem")}_j${pid}_$tag"
    ensure(spark, ot, Tables.orders(spark, dir)
      .select("o_orderkey", "o_orderpriority"), "o_orderkey")
    ensure(spark, lt, Tables.lineitem(spark, dir)
      .select("l_orderkey", "l_extendedprice", "l_discount"), "l_orderkey")
    spark.table(lt)
      .join(spark.table(ot), col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_orderpriority")
      .agg(
        sumMoney4(col("l_extendedprice") * (lit(1.0) - col("l_discount")))
          .as("revenue"),
        count(lit(1)).as("n_items"))
      .orderBy("o_orderpriority")
  }
}
