package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming shape of [[graft.operators.QuantileSketch]]: the
  * per-group fixed-resolution bucket counts carried across
  * micro-batches in flatMapGroupsWithState, with the quantile
  * read-out re-emitted after every batch — the live p50/p99 latency
  * or price dashboard, updated incrementally instead of re-sorting
  * history.
  *
  * The bucket-count state is a commutative MONOID (unlike the
  * [[EwmaStream]]/[[CusumStream]] recurrences, which need ordered
  * arrival): counts merge in any order, so the final emission is
  * bit-identical to the batch read-out under ANY batch split —
  * no ordering contract at all, the strongest parity in the
  * streaming family (spec-pinned). State per group is the bucket
  * map, bounded by value-range/W exactly like the batch sketch —
  * O(groups · range/W) total, never O(rows).
  */
object QuantileStream {

  final case class QIn(g: String, c: Long)

  /** One read-out row per (group, pct) per micro-batch; `batchSeq`
    * is the per-group batch ordinal (1-based).
    */
  final case class QOut(
      g: String, batchSeq: Long, pct: Int,
      n: Long, targetRank: Long, estCents: Long)

  final case class QState(seq: Long, buckets: Map[Long, Long])

  /** Same semantics as batch sketch+quantiles: bucket = c DIV W,
    * rank = ⌈pct·n/100⌉, estimate = containing bucket's upper edge.
    */
  def quantiles(
      in: Dataset[QIn],
      bucketWidth: Long,
      pcts: Seq[Int]): Dataset[QOut] = {
    require(bucketWidth >= 1 && pcts.nonEmpty)
    val spark = in.sparkSession
    import spark.implicits._
    in.groupByKey(_.g)
      .flatMapGroupsWithState[QState, QOut](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (g: String, rows: Iterator[QIn], state: GroupState[QState]) =>
          val st = state.getOption.getOrElse(QState(0L, Map.empty))
          val m = scala.collection.mutable.Map.empty[Long, Long] ++ st.buckets
          rows.foreach { r =>
            val b = Math.floorDiv(r.c, bucketWidth)
            m.update(b, m.getOrElse(b, 0L) + 1L)
          }
          val seq = st.seq + 1L
          state.update(QState(seq, m.toMap))
          val sorted = m.toSeq.sortBy(_._1)
          val n = sorted.map(_._2).sum
          val out = pcts.sorted.map { pct =>
            val rank = (pct.toLong * n + 99L) / 100L
            var cum = 0L
            val bucket = sorted.find { case (_, cnt) =>
              cum += cnt; cum >= rank
            }.map(_._1).getOrElse(sorted.last._1)
            QOut(g, seq, pct, n, rank,
              bucket * bucketWidth + (bucketWidth - 1L))
          }
          out.iterator
      }
  }
}
