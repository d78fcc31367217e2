package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.operators.Sampling

/** Streaming shape of the q271 KMV distinct sketch: per-group
  * "k smallest distinct hash values" carried across micro-batches in
  * flatMapGroupsWithState, the (k−1)·2³²/R_k estimate re-emitted
  * after every batch — the third member of the streaming sketch
  * family next to [[HllStream]] (registers) and [[QuantileStream]]
  * (buckets).
  *
  * The state is a commutative IDEMPOTENT monoid (truncated sorted
  * distinct union — a set-min operation), so like [[HllStream]] the
  * final state is bit-identical to the batch sketch under ANY batch
  * split, ANY arrival order, and DUPLICATED delivery (a replayed key
  * hashes to an element already in — or already truncated out of —
  * the set). State per group is ≤ k longs, never O(keys).
  *
  * The estimate mirrors the q271 oracle chain exactly:
  * floor((kk−1)·2³²/hk + 0.5) over the retained count kk and k-th
  * minimum hk — one IEEE chain, engine-free.
  */
object KmvStream {

  final case class KmvIn(g: String, key: Long)

  /** One read-out per group per micro-batch: retained count, k-th
    * minimum, and the estimate.
    */
  final case class KmvOut(g: String, batchSeq: Long, kk: Long, hk: Long, est: Long)

  final case class KmvState(seq: Long, mins: Array[Long])

  /** The q271 estimate chain on a retained-min set. */
  def estimateScalar(kk: Long, hk: Long): Long =
    math.floor((kk - 1).toDouble * 4294967296.0 / hk.toDouble + 0.5).toLong

  def distinctCounts(in: Dataset[KmvIn], k: Int = 1024): Dataset[KmvOut] = {
    require(k >= 2)
    val spark = in.sparkSession
    import spark.implicits._
    in.groupByKey(_.g)
      .flatMapGroupsWithState[KmvState, KmvOut](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (g: String, rows: Iterator[KmvIn], state: GroupState[KmvState]) =>
          val st = state.getOption.getOrElse(KmvState(0L, Array.empty[Long]))
          val merged = (st.mins.iterator ++
              rows.map(r => Sampling.hashBitsScalar(r.key)))
            .toArray.distinct.sorted.take(k)
          val seq = st.seq + 1L
          state.update(KmvState(seq, merged))
          val kk = merged.length.toLong
          val hk = if (kk > 0) merged(kk.toInt - 1) else 0L
          Iterator.single(KmvOut(g, seq, kk, hk,
            if (kk >= 2) estimateScalar(kk, hk) else 0L))
      }
  }
}
