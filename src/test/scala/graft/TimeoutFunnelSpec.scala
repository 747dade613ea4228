package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger
import graft.streaming.StatefulFunnel
import graft.streaming.StatefulFunnel.{Outcome, TimedEv}

/** Event-time-timeout semantics of the stateful funnel: a key that goes
  * quiet mid-funnel is emitted as abandoned once the WATERMARK (not
  * wall-clock) passes its timeout; completed funnels emit immediately
  * and never linger in state. Driven through multiple micro-batches
  * with a MemoryStream so the watermark actually advances.
  */
class TimeoutFunnelSpec extends SparkSpec {

  private def ts(h: Int) = Timestamp.valueOf(f"2024-01-01 $h%02d:00:00")

  test("quiet mid-funnel key times out as abandoned; purchaser completes") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[TimedEv]
    val sink = "timeout_funnel_sink"
    val q = StatefulFunnel.outcomes(input.toDS())
      .writeStream.outputMode("append").format("memory").queryName(sink)
      .trigger(Trigger.ProcessingTime(0)).start()
    try {
      // batch 1: user 1 stalls after 'view' (stage 2); user 2 purchases
      input.addData(
        TimedEv(1L, "signup", ts(0)), TimedEv(1L, "view", ts(1)),
        TimedEv(2L, "signup", ts(0)), TimedEv(2L, "view", ts(0)),
        TimedEv(2L, "click", ts(0)), TimedEv(2L, "purchase", ts(1)))
      q.processAllAvailable()
      val afterB1 = spark.table(sink).as[Outcome].collect().toSet
      // completion emits immediately; the stalled key emits nothing yet
      assert(afterB1 == Set(Outcome(2L, 4, abandoned = false)), s"$afterB1")

      // batch 2: unrelated activity at t+9h pushes the watermark past
      // user 1's timeout (view@01:00 + 2h window = 03:00)
      input.addData(TimedEv(3L, "signup", ts(9)))
      q.processAllAvailable()
      // one more empty-ish batch so the timeout callback fires after the
      // watermark update is committed
      input.addData(TimedEv(3L, "view", ts(9)))
      q.processAllAvailable()

      val all = spark.table(sink).as[Outcome].collect().toSet
      assert(all.contains(Outcome(1L, 2, abandoned = true)),
        s"stalled key not abandoned: $all")
      assert(!all.exists(o => o.user_id == 2L && o.abandoned))
    } finally q.stop()
  }
}
