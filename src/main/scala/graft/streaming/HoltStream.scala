package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming shape of [[graft.operators.Holt.smooth]]: per-key
  * double-exponential (level + trend) smoothing carried across
  * micro-batches — the TRENDED member of the streaming-smoother
  * ladder ([[EwmaStream]] fixed-gain level, [[KalmanStream]]
  * annealed-gain level, this one level + trend), for live
  * per-series forecasting ("where is this series heading next
  * step") over millions of keys.
  *
  * State per key is (level, trend, seen) — exact fdiv integer fixed
  * point, O(keys) total, exactly the batch operator's fold state.
  * Parity contract (the [[EwmaStream]] discipline, spec-pinned):
  * rows apply in (day, eventId) order within each micro-batch; under
  * ordered arrival the streamed trajectory is BIT-EQUAL to the batch
  * [[graft.operators.Holt.smooth]] fold over the union — all-integer
  * state, zero drift to tolerate.
  */
object HoltStream {

  final case class HIn(key: String, eventId: Long, day: Long, xq: Long)

  final case class HOut(
      key: String, day: Long, xq: Long, level: Long, trend: Long,
      forecast: Long)

  /** (level, trend, any-observation-seen). */
  final case class HState(l: Long, b: Long, seen: Boolean)

  def smooth(
      in: Dataset[HIn],
      alphaDen: Long,
      betaDen: Long): Dataset[HOut] = {
    require(alphaDen >= 1L && betaDen >= 1L)
    val spark = in.sparkSession
    import spark.implicits._
    in.groupByKey(_.key)
      .flatMapGroupsWithState[HState, HOut](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (k: String, rows: Iterator[HIn], state: GroupState[HState]) =>
          var st = state.getOption.getOrElse(HState(0L, 0L, seen = false))
          val out = rows.toSeq.sortBy(r => (r.day, r.eventId)).map { r =>
            if (!st.seen) st = HState(r.xq, 0L, seen = true)
            else {
              val d = graft.operators.LogReg.fdiv(
                r.xq - st.l - st.b, alphaDen)
              val l = st.l + st.b + d
              st = HState(l, st.b + graft.operators.LogReg.fdiv(d, betaDen),
                seen = true)
            }
            HOut(k, r.day, r.xq, st.l, st.b, st.l + st.b)
          }
          state.update(st)
          out.iterator
      }
  }
}
