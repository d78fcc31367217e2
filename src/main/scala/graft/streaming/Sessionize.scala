package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Event-time sessionization with custom state — the
  * `flatMapGroupsWithState` capability (SURVEY §2.10 extension): group
  * events per user into sessions closed by a gap of inactivity.
  *
  * State per key = the one open session (bounded memory). Within each
  * micro-batch the group's events are sorted in memory — bounded by
  * events-per-key-per-batch, not by total history. Closed sessions
  * emit in Append mode; the open session emits when the event-time
  * watermark passes its timeout (lastTs + gap), so results are final
  * and late data beyond the watermark is dropped — exactly the
  * streaming semantics the batch `window()` path cannot express.
  * The same call works on a batch Dataset (state starts empty, whole
  * group in one invocation, trailing session emitted eagerly).
  */
object Sessionize {

  final case class Event(user_id: Long, ts: java.sql.Timestamp, value: Double)
  final case class SessionState(start: Long, lastTs: Long, n: Int, sumValue: Double)
  final case class Session(
      user_id: Long, session_start: java.sql.Timestamp,
      session_end: java.sql.Timestamp, n_events: Int, sum_value: Double)

  def sessionize(
      events: Dataset[Event],
      gapMs: Long,
      streaming: Boolean): Dataset[Session] = {
    val spark = events.sparkSession
    import spark.implicits._
    val gapUs = gapMs * 1000L

    // Timestamps carried as epoch MICROseconds — Timestamp.getTime is
    // millisecond-truncating and the corpus has µs event times; a gap
    // straddling a sub-ms boundary must resolve identically here and
    // in the SQL oracle. Local defs: the task closure must not
    // capture the (non-serializable) enclosing object.
    def toUs(t: java.sql.Timestamp): Long = {
      val i = t.toInstant
      i.getEpochSecond * 1000000L + i.getNano / 1000L
    }
    def toTs(us: Long): java.sql.Timestamp = {
      val t = new java.sql.Timestamp(Math.floorDiv(us, 1000L))
      t.setNanos((Math.floorMod(us, 1000000L) * 1000L).toInt)
      t
    }

    def close(uid: Long, s: SessionState): Session =
      Session(uid, toTs(s.start), toTs(s.lastTs), s.n, s.sumValue)

    def fn(uid: Long, it: Iterator[Event], state: GroupState[SessionState]): Iterator[Session] = {
      if (it.isEmpty) { // timeout firing: close the open session
        val out = state.getOption.map(close(uid, _)).iterator.toSeq
        state.remove()
        return out.iterator
      }
      val sorted = it.toSeq.sortBy(e => toUs(e.ts))
      val closed = Seq.newBuilder[Session]
      var cur = state.getOption
      for (e <- sorted) {
        val t = toUs(e.ts)
        cur match {
          case Some(s) if t - s.lastTs <= gapUs =>
            cur = Some(SessionState(s.start, math.max(s.lastTs, t), s.n + 1, s.sumValue + e.value))
          case Some(s) =>
            closed += close(uid, s)
            cur = Some(SessionState(t, t, 1, e.value))
          case None =>
            cur = Some(SessionState(t, t, 1, e.value))
        }
      }
      cur.foreach { s =>
        state.update(s)
        if (streaming) state.setTimeoutTimestamp((s.lastTs + gapUs) / 1000L)
      }
      if (!streaming) { // batch: no future batches — flush the open session
        cur.foreach(s => closed += close(uid, s))
        state.remove()
      }
      closed.result().iterator
    }

    events.groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append,
        if (streaming) GroupStateTimeout.EventTimeTimeout
        else GroupStateTimeout.NoTimeout)(fn)
  }

  /** Batch sessionization as pure WINDOW algebra — the mega-key-safe
    * form: lag → gap flag → running session count → session groupBy.
    * [[sessionize]]'s batch mode materializes each user's events in
    * one task's memory (fine until one user has millions of events);
    * this plan sorts within Spark's spillable window sort instead, and
    * both window functions share one partitioning so the whole thing
    * is a SINGLE shuffle plus codegen'd expressions. Identical output
    * to the stateful operator — q39 (stateful) and q64 (window) are
    * checked against the same oracle.
    *
    * Gap arithmetic is in epoch MICROseconds (`unix_micros`) for the
    * same sub-ms determinism reason as the stateful path.
    */
  def sessionizeBatchWindows(
      events: Dataset[Event],
      gapMs: Long): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val spark = events.sparkSession
    import spark.implicits._
    val w = Window.partitionBy($"user_id").orderBy($"ts", $"value")
    events.toDF()
      .withColumn("__us", unix_micros($"ts"))
      .withColumn("__brk",
        when(($"__us" - lag($"__us", 1).over(w)) <= gapMs * 1000L, 0)
          .otherwise(1))                 // null lag (first event) → 1
      .withColumn("__sid",
        sum($"__brk").over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy($"user_id", $"__sid")
      .agg(
        min($"ts").as("session_start"),
        max($"ts").as("session_end"),
        count(lit(1)).cast("int").as("n_events"),
        sum($"value").as("sum_value"))
      .drop("__sid")
  }

  /** Convenience: raw events DataFrame (ts timestamp) → sessions, with
    * the watermark that drives both late-data drop and state timeout.
    */
  def sessionizeStream(
      spark: SparkSession,
      events: Dataset[Event],
      gapMs: Long,
      watermark: String = "10 minutes"): Dataset[Session] =
    sessionize(
      events.withWatermark("ts", watermark).as[Event](org.apache.spark.sql.Encoders.product[Event]),
      gapMs, streaming = true)
}
