package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** SCD Type 2 as a stream — the §2.9 → §2.10 bridge SURVEY.md maps out:
  * the same close-and-insert semantics as [[graft.operators.Scd2]], but
  * maintained incrementally per key with `flatMapGroupsWithState`
  * instead of a full staging⋈dimension re-join per batch.
  *
  * State per business key = the OPEN version (tracked attrs +
  * valid_from). Each change event either starts the first version,
  * closes the open version and opens a new one (emitting both), or is
  * an unchanged no-op — the same three branches as the batch MERGE
  * (reference Scd_Type2.sql:38–53), minus the re-join.
  *
  * Emission protocol (append mode can't dump final state): every state
  * change also emits the new OPEN version as a `is_current = true` row
  * with `valid_to = null`; [[finalizeHistory]] then keeps all closed
  * rows plus the latest open row per key, preferring the closed copy
  * when a version was later closed. `StreamingScd2Spec` proves the
  * result equals the batch merge's history exactly (modulo surrogate
  * keys, which need a global assignment by construction).
  *
  * Scale: one shuffle on the business key (same as the batch join);
  * state is one version per live key. Surrogate keys are assigned at
  * sink time from a key-range reservation (or the batch dense/
  * monotonic options) — deliberately NOT in the stream, where global
  * contiguity would serialize.
  */
object StreamingScd2 {

  case class CdcRow(key: Long, status: String, price: Double,
      priority: String, ts: Timestamp)
  case class OpenVersion(status: String, price: Double, priority: String,
      from: Timestamp)
  case class VersionRow(key: Long, status: String, price: Double,
      priority: String, valid_from: Timestamp, valid_to: Option[Timestamp],
      is_current: Boolean)

  def update(key: Long, rows: Iterator[CdcRow],
      state: GroupState[OpenVersion]): Iterator[VersionRow] = {
    var out = List.empty[VersionRow]
    var cur = state.getOption
    rows.toSeq.sortBy(_.ts.getTime).foreach { r =>
      cur match {
        case None =>
          cur = Some(OpenVersion(r.status, r.price, r.priority, r.ts))
          out ::= VersionRow(key, r.status, r.price, r.priority, r.ts,
            None, is_current = true)
        case Some(c)
            if c.status != r.status || c.price != r.price
              || c.priority != r.priority =>
          out ::= VersionRow(key, c.status, c.price, c.priority, c.from,
            Some(r.ts), is_current = false)
          cur = Some(OpenVersion(r.status, r.price, r.priority, r.ts))
          out ::= VersionRow(key, r.status, r.price, r.priority, r.ts,
            None, is_current = true)
        case _ => () // unchanged: no new version (same as batch merge)
      }
    }
    cur.foreach(state.update)
    out.reverse.iterator
  }

  def versions(evs: Dataset[CdcRow]): Dataset[VersionRow] = {
    import evs.sparkSession.implicits._
    evs.groupByKey(_.key)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.NoTimeout)(update)
  }

  /** The q23 scenario replayed as a two-batch CDC stream (initial load
    * at T1, flip-batch at T2) in the DEPLOYMENT shape end-to-end: each
    * CDC batch is written straight from the orders scan into a landing
    * directory (executor-side — no driver collect anywhere, so the
    * harness itself survives an unbounded orders table), and the
    * stateful query drains the landing folder twice with
    * `Trigger.AvailableNow` against one checkpoint — the second drain
    * restarts from the checkpoint, reads only the NEW files, and
    * recovers the per-key open-version state from the state store,
    * exactly how a scheduled production drain of a CDC bucket runs.
    * Emissions append to a parquet sink across both drains; the final
    * history is a batch read of that sink. Output = the full history
    * minus surrogate keys (a sink-time global assignment by design),
    * oracle-checked as q55. */
  def ordersScenarioStream(spark: org.apache.spark.sql.SparkSession,
      dir: String): DataFrame = {
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("graft_sscd2").toString
    val land = s"$base/landing"
    val out = s"$base/out"
    val ckpt = s"$base/ckpt"

    val o = graft.sources.Tables.orders(spark, dir).select(
      col("o_orderkey").as("key"), col("o_orderstatus").as("status"),
      col("o_totalprice").cast("double").as("price"),
      col("o_orderpriority").as("priority"))

    def drain(): Unit = {
      val evs = spark.readStream
        .schema(org.apache.spark.sql.Encoders.product[CdcRow].schema)
        .parquet(land)
        .as[CdcRow]
      val q = versions(evs).writeStream
        .outputMode("append")
        .format("parquet").option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }

    // batch 1: initial load (80% of keys) lands at T1, first drain
    o.filter(col("key") % 10 < 8)
      .withColumn("ts", to_timestamp(lit("2024-01-01 00:00:00")))
      .write.mode("append").parquet(land)
    drain()
    // batch 2: CDC flip-batch lands at T2, second drain resumes from
    // the checkpoint (new files only, state recovered)
    o.withColumn("status",
        when(col("key") % 5 === 0, lit("D")).otherwise(col("status")))
      .withColumn("ts", to_timestamp(lit("2024-06-01 00:00:00")))
      .write.mode("append").parquet(land)
    drain()

    finalizeHistory(spark.read.parquet(out), graft.operators.Scd2.FarFuture)
      .select(col("key").as("order_id"), col("status").as("order_status"),
        col("price").as("total_price"), col("priority"),
        col("valid_from"), col("valid_to"), col("is_current"))
      .orderBy("order_id", "valid_from")
  }

  /** Collapse the emission log into the history table: all closed rows,
    * plus the latest open row per key unless that same version was
    * later closed (closed copy wins). */
  def finalizeHistory(emitted: DataFrame, farFuture: String): DataFrame = {
    val closed = emitted.filter(!col("is_current"))
    val open = emitted.filter(col("is_current"))
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("key")
          .orderBy(desc("valid_from"))))
      .filter(col("rn") === 1).drop("rn")
      .join(closed.select(col("key").as("ck"),
        col("valid_from").as("cf")),
        col("key") === col("ck") && col("valid_from") === col("cf"),
        "left_anti")
    closed.unionByName(open)
      .withColumn("valid_to",
        coalesce(col("valid_to"), to_timestamp(lit(farFuture))))
  }
}
