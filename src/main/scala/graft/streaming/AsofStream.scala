package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming as-of enrichment — the incremental shape of
  * [[graft.plans.AsofJoinNative]]: a stream of events is enriched
  * with the latest preceding update of the same key (the CDC
  * stream-enrichment pattern: attach the most recent price/profile/
  * model-version to each arriving event).
  *
  * Both sides arrive as ONE tagged stream (side 0 = update carrying a
  * payload, side 1 = event to enrich); state per key is a ring of the
  * most recent `maxVersions` (ts, payload) updates, so a late-ish
  * event can still bind to the version that preceded IT rather than
  * the newest one — exact against retained versions, and bounded:
  * O(keys · maxVersions) state, the [[NearDupStream]] cap discipline.
  *
  * Parity contract (spec-pinned, the [[SemDeDupStream]] discipline):
  * replayed in event-time order, the streamed output is row-for-row
  * the batch as-of join of the same rows. Updates older than the
  * retained ring bind to None — the documented cap trade, exactly
  * like the batch operator run over a compacted right side.
  */
object AsofStream {

  /** side 0 = update (value = payload); side 1 = event (id = event id). */
  final case class AsofIn(key: Long, ts: Long, side: Int, id: Long, value: Double)

  final case class Enriched(id: Long, key: Long, ts: Long, asof: Option[Double])

  /** Parallel lists (ts ascending) — the encoder-friendly state shape
    * of [[NearDupStream.BucketState]] (tuples inside collections
    * break state-encoder codegen).
    */
  final case class KeyState(tss: List[Long], vals: List[Double])

  /** Enrich the tagged stream: updates mutate per-key state, events
    * emit their as-of payload. Within a micro-batch rows are applied
    * in (ts, side) order — updates before events at equal ts, the
    * batch operator's inclusive rule.
    */
  def enriched(
      in: Dataset[AsofIn],
      maxVersions: Int = 64): Dataset[Enriched] = {
    val spark = in.sparkSession
    import spark.implicits._
    in.groupByKey(_.key)
      .flatMapGroupsWithState[KeyState, Enriched](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (key: Long, rows: Iterator[AsofIn], state: GroupState[KeyState]) =>
          val st = state.getOption.getOrElse(KeyState(Nil, Nil))
          var versions = st.tss.zip(st.vals).toVector
          val out = scala.collection.mutable.ArrayBuffer.empty[Enriched]
          rows.toSeq.sortBy(r => (r.ts, r.side)).foreach { r =>
            if (r.side == 0) {
              // insert in ts order (arrivals may interleave), cap ring
              val idx = versions.indexWhere(_._1 > r.ts)
              val at = if (idx < 0) versions.length else idx
              versions = (versions.take(at) :+ ((r.ts, r.value))) ++ versions.drop(at)
              if (versions.length > maxVersions)
                versions = versions.takeRight(maxVersions)
            } else {
              // latest retained version with ts <= event ts
              val m = versions.takeWhile(_._1 <= r.ts).lastOption
              out += Enriched(r.id, key, r.ts, m.map(_._2))
            }
          }
          state.update(KeyState(versions.map(_._1).toList, versions.map(_._2).toList))
          out.iterator
      }
  }

  /** DataFrame surface with the batch operator's column convention. */
  def enrichedDf(in: Dataset[AsofIn], maxVersions: Int = 64): DataFrame = {
    val spark = in.sparkSession
    import spark.implicits._
    enriched(in, maxVersions)
      .select($"id", $"key", $"ts", $"asof".as("__asof_value"))
  }
}
