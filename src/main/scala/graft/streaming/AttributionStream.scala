package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Stateful streaming attribution journeys — the incremental
  * counterpart of q212's batch multi-touch attribution: each user's
  * touch history folds into (first touch, last touch, touch count)
  * as events arrive, and the user's FIRST purchase freezes the
  * journey (the q212 contract: only touches strictly before the
  * first conversion carry credit). A downstream id-keyed upsert sink
  * always holds the current journey table; the channel roll-up
  * (first/last/linear-ppm credits) is then a channel-sized batch
  * aggregate over the sink — so the expensive per-event work is
  * incremental and the tiny report query stays batch.
  *
  * Unlike the single-registry streams ([[ComponentStream]],
  * [[KCoreStream]], [[HeavyHitterStream]]) this state is NATURALLY
  * SHARDED — the group key is the user, journeys never interact — so
  * it scales horizontally with executors; no shape-honesty caveat
  * needed.
  *
  * Ordering contract (the [[ScoreStream]]/[[SprtStream]] convention):
  * events are folded in (event-time, event_id) order WITHIN each
  * batch, and batches are assumed event-time ordered per user across
  * batches (at-least-once replays of already-folded touches would
  * double-count; feed this stream from an offset-deduplicated
  * source, the [[KafkaShaped]] sink convention). A touch arriving
  * after the user's conversion is ignored — frozen means frozen —
  * which also makes post-freeze duplicate delivery harmless.
  *
  * Emission contract (upsert-convergent): one row per user per batch
  * IF the journey changed; an id-keyed upsert converges to exactly
  * the batch per-user attribution frame over any in-order split —
  * pinned in AttributionStreamSpec.
  */
object AttributionStream {

  final case class Touch(
      user_id: Long, us: Long, event_id: Long, event_type: String)

  final case class Journey(
      user_id: Long, converted: Boolean, n_touch: Long,
      first_channel: String, last_channel: String)

  /** converted + touch count + (us, id, channel) extremes. */
  final case class JState(
      converted: Boolean, nt: Long,
      fUs: Long, fId: Long, fCh: String,
      lUs: Long, lId: Long, lCh: String)

  def journeys(events: Dataset[Touch]): Dataset[Journey] = {
    val spark = events.sparkSession
    import spark.implicits._

    def fn(user: Long, it: Iterator[Touch],
        state: GroupState[JState]): Iterator[Journey] = {
      var st = state.getOption.getOrElse(
        JState(converted = false, 0L, Long.MaxValue, 0L, "", Long.MinValue, 0L, ""))
      val before = st
      // fold in (event-time, id) order within the batch
      it.toSeq.sortBy(t => (t.us, t.event_id)).foreach { t =>
        if (!st.converted) {
          if (t.event_type == "purchase") st = st.copy(converted = true)
          else {
            val beforeFirst =
              t.us < st.fUs || (t.us == st.fUs && t.event_id < st.fId)
            val afterLast =
              t.us > st.lUs || (t.us == st.lUs && t.event_id > st.lId)
            val first =
              if (beforeFirst) (t.us, t.event_id, t.event_type)
              else (st.fUs, st.fId, st.fCh)
            val last =
              if (afterLast) (t.us, t.event_id, t.event_type)
              else (st.lUs, st.lId, st.lCh)
            st = JState(converted = false, st.nt + 1,
              first._1, first._2, first._3, last._1, last._2, last._3)
          }
        }
      }
      if (st == before) Iterator.empty
      else {
        state.update(st)
        Iterator.single(Journey(user, st.converted, st.nt, st.fCh, st.lCh))
      }
    }

    events.groupByKey(_.user_id)
      .flatMapGroupsWithState(
        OutputMode.Append(), GroupStateTimeout.NoTimeout())(fn)
  }
}
