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
    * at T1, flip-batch at T2) through a MemoryStream — the driver-side
    * collect feeds the in-memory source and is test-harness plumbing,
    * not the operator's data path (production reads Kafka/files).
    * Output = the full history minus surrogate keys (a sink-time global
    * assignment by design), oracle-checked as q55. */
  def ordersScenarioStream(spark: org.apache.spark.sql.SparkSession,
      dir: String): DataFrame = {
    import spark.implicits._
    val t1 = Timestamp.valueOf("2024-01-01 00:00:00")
    val t2 = Timestamp.valueOf("2024-06-01 00:00:00")
    val o = graft.sources.Tables.orders(spark, dir).select(
      col("o_orderkey").as("key"), col("o_orderstatus").as("status"),
      col("o_totalprice").as("price"), col("o_orderpriority").as("priority"))
      .as[(Long, String, Double, String)].collect()
    val batch1 = o.filter(_._1 % 10 < 8)
      .map { case (k, s, p, pr) => CdcRow(k, s, p, pr, t1) }
    val batch2 = o.map { case (k, s, p, pr) =>
      CdcRow(k, if (k % 5 == 0) "D" else s, p, pr, t2)
    }

    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input =
      org.apache.spark.sql.execution.streaming.runtime.MemoryStream[CdcRow]
    val sink = "streaming_scd2_" +
      java.util.UUID.randomUUID().toString.take(8)
    val q = versions(input.toDS())
      .writeStream.outputMode("append").format("memory").queryName(sink)
      .trigger(org.apache.spark.sql.streaming.Trigger.ProcessingTime(0))
      .start()
    try {
      input.addData(batch1.toSeq); q.processAllAvailable()
      input.addData(batch2.toSeq); q.processAllAvailable()
    } finally q.stop()

    finalizeHistory(spark.table(sink), graft.operators.Scd2.FarFuture)
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
