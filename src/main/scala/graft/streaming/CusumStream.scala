package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming shape of [[graft.operators.Cusum]]: the two-sided drift
  * alarm carried across micro-batches — the live "ingest volume
  * shifted" monitor, emitting per-observation cumulative sums and
  * alarm flags as points arrive.
  *
  * Unlike the batch operator (which derives μ from the in-sample
  * mean), the stream takes the reference level and the derived
  * slack/threshold as PARAMETERS — the SPC convention: a control
  * chart monitors against a target fixed ahead of time (here,
  * typically last period's batch μ). With identical parameters the
  * stream is row-for-row the batch recurrence (spec-pinned).
  *
  * State per series is (su, sl) — two longs, the [[EwmaStream]]
  * minimal-carry class; rows apply in `rn` order within each batch,
  * ordered arrival across batches is the usual partitioned-log
  * contract.
  */
object CusumStream {

  final case class CusumIn(seriesId: Long, rn: Long, xq: Long)

  final case class CusumOut(
      seriesId: Long, rn: Long, xq: Long, su: Long, sl: Long, alarm: Boolean)

  final case class SideState(su: Long, sl: Long)

  def alarms(
      in: Dataset[CusumIn],
      mu: Long,
      slack: Long,
      thresh: Long): Dataset[CusumOut] = {
    val spark = in.sparkSession
    import spark.implicits._
    in.groupByKey(_.seriesId)
      .flatMapGroupsWithState[SideState, CusumOut](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (sid: Long, rows: Iterator[CusumIn], state: GroupState[SideState]) =>
          var st = state.getOption.getOrElse(SideState(0L, 0L))
          val out = rows.toSeq.sortBy(_.rn).map { r =>
            val su = math.max(0L, st.su + r.xq - mu - slack)
            val sl = math.max(0L, st.sl + mu - r.xq - slack)
            st = SideState(su, sl)
            CusumOut(sid, r.rn, r.xq, su, sl, su > thresh || sl > thresh)
          }
          state.update(st)
          out.iterator
      }
  }
}
