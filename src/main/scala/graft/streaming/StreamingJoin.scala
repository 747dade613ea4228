package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Stream-stream inner join with event-time range bounds (SURVEY §2.10
  * — the last streaming join shape the surface was missing; q53 covers
  * stream-static). Purchase events join the same user's view events
  * from the preceding hour: last-hour attribution as a continuously
  * running query.
  *
  * Both sides carry a watermark and the join condition bounds view_ts
  * to [purchase_ts - 1h, purchase_ts], which is what lets Spark's
  * symmetric hash join EXPIRE state: a buffered view older than
  * (watermark - 1h) can never match a future purchase and is dropped,
  * so state is bounded by the time-bound × arrival rate, not by
  * history — the property that makes this run forever at 100 TB/day.
  * Append mode emits each matched pair exactly once when it becomes
  * final. `Trigger.AvailableNow` drains the bounded testdata, making
  * the result equal the batch range self-join, which IS the oracle.
  */
object StreamingJoin {

  def viewsBeforePurchases(spark: SparkSession, dir: String): DataFrame = {
    val views = StreamingFunnel.eventsStream(spark, dir)
      .filter(col("event_type") === "view")
      .select(col("user_id").as("v_user"), col("ts").as("view_ts"))
      .withWatermark("view_ts", "2 hours")
    val purchases = StreamingFunnel.eventsStream(spark, dir)
      .filter(col("event_type") === "purchase")
      .select(col("user_id").as("user_id"), col("ts").as("purchase_ts"))
      .withWatermark("purchase_ts", "2 hours")

    val joined = purchases.join(views,
      expr("""user_id = v_user
             |AND view_ts >= purchase_ts - INTERVAL 1 HOUR
             |AND view_ts <= purchase_ts""".stripMargin))
      .select(col("user_id"), col("purchase_ts"), col("view_ts"))

    val name = "streaming_join_sink"
    val q = joined.writeStream
      .outputMode("append")
      .format("memory")
      .queryName(name)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()

    spark.table(name)
      .orderBy("user_id", "purchase_ts", "view_ts")
  }
}
