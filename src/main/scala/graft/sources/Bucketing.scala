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

  private val localLocks =
    new java.util.concurrent.ConcurrentHashMap[String, Object]()

  /** Per-table-name monitor shared with other builders in this JVM
    * (IvfIndex's two-phase build and the maintainer's publish
    * registration use the same serialization). */
  private[graft] def lockFor(name: String): Object =
    localLocks.computeIfAbsent(name, _ => new Object)

  /** Register `name` as a bucketed table of `df` clustered on `key`.
    * Files live at a deterministic external path: a fresh session with
    * an empty in-memory catalog but surviving files re-REGISTERS (DDL
    * only, no rewrite) — exactly how a real metastore-less deployment
    * re-attaches its bucketed layout, and what lets the index build
    * amortize ACROSS JVMs. Concurrency: a per-name monitor serializes
    * this JVM's query threads (Verify runs four) and an OS file lock
    * serializes concurrent JVMs (Verify + Bench) on the shared path —
    * the loser of the race re-registers the winner's files.
    *
    * `sweep = Some((prefix, suffix))` names the logical table's
    * GENERATION family: when this call writes fresh files (a new
    * content signature — i.e. the fixture was regenerated), sibling
    * dirs `prefix*suffix` under the shared base, and their `.lock`
    * files, are stale generations and get deleted. Without the sweep
    * they accumulate unboundedly across fixture regenerations. Safe
    * because a stale generation's fixture no longer exists: only a JVM
    * started BEFORE the regeneration could still read it, and the
    * driver regenerates between rounds when no graft JVM is live. */
  def ensure(spark: SparkSession, name: String, df: => DataFrame,
      key: String, sweep: Option[(String, String)] = None): Unit = {
    val mon = localLocks.computeIfAbsent(name, _ => new Object)
    mon.synchronized {
      if (spark.catalog.tableExists(name)) return
      val base = s"${System.getProperty("java.io.tmpdir")}/graft_bucketed"
      java.nio.file.Files.createDirectories(java.nio.file.Paths.get(base))
      val ch = java.nio.channels.FileChannel.open(
        java.nio.file.Paths.get(s"$base/$name.lock"),
        java.nio.file.StandardOpenOption.CREATE,
        java.nio.file.StandardOpenOption.WRITE)
      val lock = ch.lock()
      try {
        val path = s"$base/$name"
        if (new java.io.File(path, "_SUCCESS").exists()) {
          spark.sql(s"CREATE TABLE $name (${df.schema.toDDL}) USING PARQUET " +
            s"CLUSTERED BY ($key) SORTED BY ($key) INTO $NumBuckets BUCKETS " +
            s"LOCATION '$path'")
        } else {
          sweep.foreach { case (prefix, suffix) =>
            Option(new java.io.File(base).listFiles()).getOrElse(Array.empty)
              .filter { f =>
                val n = f.getName.stripSuffix(".lock")
                n != name && n.startsWith(prefix) && n.endsWith(suffix)
              }
              .foreach(org.apache.commons.io.FileUtils.deleteQuietly(_))
          }
          df.repartition(NumBuckets, col(key))
            .write
            .bucketBy(NumBuckets, key)
            .sortBy(key)
            .option("path", path)
            .mode("overwrite")
            .saveAsTable(name)
        }
      } finally {
        lock.release()
        ch.close()
      }
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
    // fixture content signature in the name (= the path key): a
    // regenerated fixture re-buckets instead of re-registering stale
    // surviving files; ensure()'s file lock handles concurrent JVMs,
    // so the shared path keeps cross-JVM reuse
    def k(t: String) =
      graft.streaming.FixtureStaging.key("bkt", s"$dir/$t.parquet")
    val ot = s"b_orders_${k("orders")}_$tag"
    val lt = s"b_lineitem_${k("lineitem")}_$tag"
    ensure(spark, ot, Tables.orders(spark, dir)
      .select("o_orderkey", "o_orderpriority"), "o_orderkey",
      sweep = Some(("b_orders_", s"_$tag")))
    ensure(spark, lt, Tables.lineitem(spark, dir)
      .select("l_orderkey", "l_extendedprice", "l_discount"), "l_orderkey",
      sweep = Some(("b_lineitem_", s"_$tag")))
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
