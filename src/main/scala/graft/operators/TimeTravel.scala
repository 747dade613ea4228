package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.{DeltaLog, Tables}
import graft.streaming.FixtureStaging
import graft.util.Portable

/** Time travel + change feed over the [[DeltaLog]] keyed state table —
  * the two lakehouse read verbs q162's commit path implies but nothing
  * gated yet exercised: read the table AS OF an epoch, and read the NET
  * changes BETWEEN two epochs (the CDC feed an index maintainer or
  * replication consumer tails).
  *
  * The gated scenario derives a deterministic 8-epoch history from the
  * `orders` fixture (pure modular arithmetic — no clocks, no randoms):
  * epoch e inserts the keys `o_orderkey % 8 = e`, re-prices every third
  * key of the previous epoch (`status → 'R'`, +$1.00), and deletes
  * every fifth key of the epoch before that. A key is therefore never
  * upserted and deleted in the same epoch (the DeltaLog contract), and
  * every action's net effect is a closed-form function of the key — so
  * the DuckDB oracle states the expected snapshot/feed directly from
  * `orders` while the Spark side must reproduce it through the real
  * log machinery: marker-committed epoch dirs, last-write-wins keyed
  * resolution, delete masking, epoch-bounded reads.
  *
  * Scale: the log is built once per fixture signature (per-pid staging
  * dir); snapshot reads are one map-side-combinable `max_by` per key;
  * the change feed touches only the range's delta rows plus one keyed
  * probe of the pre-snapshot. Eight epochs stay below the
  * auto-compaction threshold, so the full feed range remains live —
  * the retention contract [[DeltaLog.changes]] documents.
  */
object TimeTravel {

  val Epochs = 8

  /** Build (once per fixture signature) the 8-epoch orders history log
    * and return its root. Commits are epoch-idempotent, so a crashed
    * half-build is simply re-driven to completion on the next call. */
  def stagedLog(spark: SparkSession, dir: String): String = {
    val tmp = System.getProperty("java.io.tmpdir")
    val staged = FixtureStaging.stageOnce("deltalog-tt",
      s"$dir/orders.parquet", s"$tmp/graft_tt") { d =>
      val root = d.resolve("log").toString
      val o = Tables.orders(spark, dir).select(
        col("o_orderkey").as("order_id"),
        col("o_orderstatus").as("status"),
        Portable.cents2(col("o_totalprice")).as("cents"))
      (0 until Epochs).foreach { e =>
        val ins = o.filter(col("order_id") % 8 === e)
        val ups =
          if (e >= 1)
            ins.unionByName(
              o.filter(col("order_id") % 8 === (e - 1) &&
                  col("order_id") % 3 === 0)
                .withColumn("status", lit("R"))
                .withColumn("cents", col("cents") + 100))
          else ins
        val dels =
          if (e >= 2)
            Some(o.filter(col("order_id") % 8 === (e - 2) &&
                col("order_id") % 5 === 0)
              .select("order_id"))
          else None
        DeltaLog.commit(spark, root, e, ups, dels, Seq("order_id"))
      }
    }
    s"$staged/log"
  }

  /** q167: the net change feed for epochs [4, 6) — inserts, post-image
    * updates, and deletes classified against the as-of-4 snapshot. */
  def changeFeed(spark: SparkSession, dir: String): DataFrame = {
    val root = stagedLog(spark, dir)
    DeltaLog.changes(spark, root, Seq("order_id"), 4L, 6L)
      .getOrElse(sys.error(s"no committed epochs in [4,6) under $root"))
      .select(col("order_id"), col("change_type"), col("status"),
        (col("cents").cast("double") / 100.0).as("total_price"))
      .orderBy("order_id")
  }

  /** q168: the table AS OF epoch 6 (time travel), aggregated by status
    * — count and exact money totals over the resolved snapshot. */
  def asOfSnapshot(spark: SparkSession, dir: String): DataFrame = {
    val root = stagedLog(spark, dir)
    DeltaLog.read(spark, root, Seq("order_id"), Some(6L))
      .getOrElse(sys.error(s"no committed epochs before 6 under $root"))
      .groupBy("status")
      .agg(count(lit(1)).as("n_orders"),
        (sum(col("cents")).cast("double") / 100.0).as("total_revenue"))
      .orderBy("status")
  }
}
