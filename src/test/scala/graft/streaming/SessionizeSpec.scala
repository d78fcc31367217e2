package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.{OutputMode, Trigger}

class SessionizeSpec extends SparkSpec {

  import Sessionize._

  // offset from epoch: a timestamp equal to the INITIAL watermark (0)
  // would be dropped as late by stateful streaming ops
  private def ts(minute: Int) = new java.sql.Timestamp((1000L + minute) * 60000L)

  test("batch sessionization: gap splits, aggregates, per-key isolation") {
    import spark.implicits._
    val events = Seq(
      Event(1L, ts(0), 1.0), Event(1L, ts(4), 2.0),   // session A (gap 5m)
      Event(1L, ts(20), 3.0),                          // session B
      Event(2L, ts(1), 10.0)                           // other user
    ).toDS()
    val out = sessionize(events, gapMs = 5 * 60000L, streaming = false)
      .collect().sortBy(s => (s.user_id, s.session_start.getTime))
    assert(out.length === 3)
    assert(out(0) === Session(1L, ts(0), ts(4), 2, 3.0))
    assert(out(1) === Session(1L, ts(20), ts(20), 1, 3.0))
    assert(out(2) === Session(2L, ts(1), ts(1), 1, 10.0))
  }

  test("window-algebra batch form agrees with the stateful operator, one shuffle") {
    import spark.implicits._
    // 40 users × 100 events at varied gaps — enough sessions to make
    // agreement non-vacuous
    val events = (0 until 4000).map { i =>
      Event((i % 40).toLong, ts((i / 40) * (1 + i % 3)), (i % 7).toDouble)
    }.toDS()
    val stateful = sessionize(events, gapMs = 5 * 60000L, streaming = false)
      .collect().map(s => (s.user_id, s.session_start.getTime, s.session_end.getTime,
        s.n_events, s.sum_value)).sortBy(t => (t._1, t._2))
    val windowed = sessionizeBatchWindows(events, gapMs = 5 * 60000L)
    val win = windowed
      .collect().map(r => (r.getLong(0), r.getTimestamp(1).getTime,
        r.getTimestamp(2).getTime, r.getInt(3), r.getDouble(4)))
      .sortBy(t => (t._1, t._2))
    assert(win.toSeq === stateful.toSeq)
    // both window functions share the partitioning → a single Exchange
    val nExchanges = "Exchange".r.findAllIn(
      windowed.queryExecution.executedPlan.toString).length
    assert(nExchanges <= 2,   // 1 window shuffle + the final agg's
      s"expected shared window partitioning, got $nExchanges exchanges")
  }

  test("streaming: sessions close via event-time timeout as watermark advances") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Event]
    val sessions = sessionizeStream(spark, mem.toDS(), gapMs = 5 * 60000L,
      watermark = "1 minute")
    val q = sessions.writeStream.format("memory").queryName("sessions_out")
      .outputMode(OutputMode.Append).trigger(Trigger.ProcessingTime(0)).start()
    try {
      // batch 1: two events in one session; watermark still early
      mem.addData(Event(1L, ts(0), 1.0), Event(1L, ts(2), 2.0))
      q.processAllAvailable()
      assert(spark.table("sessions_out").count() === 0)   // session still open

      // batch 2: a far-future event advances the watermark past
      // lastTs+gap → the open session times out and emits
      mem.addData(Event(2L, ts(60), 5.0))
      q.processAllAvailable()
      mem.addData(Event(2L, ts(61), 1.0))                 // nudge another batch
      q.processAllAvailable()

      val rows = spark.table("sessions_out").as[Session].collect()
      assert(rows.exists(s => s.user_id == 1L && s.n_events == 2 && s.sum_value == 3.0),
        rows.mkString(", "))
    } finally q.stop()
  }
}
