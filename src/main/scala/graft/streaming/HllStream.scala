package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.functions.HyperLogLog
import graft.operators.Sampling

/** Streaming shape of [[graft.functions.HyperLogLog]]: per-group
  * registers carried across micro-batches in flatMapGroupsWithState,
  * with the cardinality estimate re-emitted after every batch — the
  * live distinct-users/distinct-keys dashboard, updated incrementally
  * instead of re-scanning history.
  *
  * The register state is a commutative IDEMPOTENT monoid
  * (element-wise max), so — like [[QuantileStream]], and stronger
  * than the ordered recurrences — the final registers are
  * bit-identical to the batch sketch under ANY batch split, ANY
  * arrival order, and DUPLICATED delivery (max is idempotent:
  * at-least-once replay cannot move a register). State per group is
  * exactly [[HyperLogLog.M]] small ints (~4 KB), never O(keys).
  *
  * The per-batch estimate replays the batch read-out arithmetic
  * scalar-side, term for term (dyadic 2^−r sums are exact and
  * order-free; same libm ln; same r4 snap), so a streamed estimate
  * equals [[HyperLogLog.estimate]] over the same registers exactly —
  * spec-pinned against the batch column.
  */
object HllStream {

  final case class HllIn(g: String, key: Long)

  /** One read-out per group per micro-batch: the estimate plus the
    * register checksums that pin the full state.
    */
  final case class HllOut(
      g: String, batchSeq: Long, est: Double, sumRho: Long, vZero: Long)

  final case class HllState(seq: Long, regs: Array[Int])

  /** Scalar twin of [[HyperLogLog.estimate]] — the identical IEEE
    * chain (exact dyadic sum, AlphaM2 / s, linear-counting branch,
    * r4 snap).
    */
  def estimateScalar(regs: Array[Int]): Double = {
    var s = 0.0
    var v = 0L
    var i = 0
    while (i < HyperLogLog.M) {
      s += 1.0 / (1L << regs(i))
      if (regs(i) == 0) v += 1
      i += 1
    }
    val raw = HyperLogLog.AlphaM2 / s
    val corrected =
      if (raw <= 2.5 * HyperLogLog.M && v > 0)
        HyperLogLog.M.toDouble * math.log(HyperLogLog.M.toDouble / v.toDouble)
      else raw
    math.floor(corrected * 10000.0 + 0.5) / 10000.0
  }

  def distinctCounts(in: Dataset[HllIn]): Dataset[HllOut] = {
    val spark = in.sparkSession
    import spark.implicits._
    in.groupByKey(_.g)
      .flatMapGroupsWithState[HllState, HllOut](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (g: String, rows: Iterator[HllIn], state: GroupState[HllState]) =>
          val st = state.getOption.getOrElse(
            HllState(0L, new Array[Int](HyperLogLog.M)))
          val regs = st.regs.clone()
          rows.foreach { r =>
            val h = Sampling.hashBitsScalar(r.key)
            val j = (h >> HyperLogLog.WBits).toInt
            val rr = HyperLogLog.rho(h & HyperLogLog.WMask)
            if (rr > regs(j)) regs(j) = rr
          }
          val seq = st.seq + 1L
          state.update(HllState(seq, regs))
          Iterator.single(HllOut(g, seq, estimateScalar(regs),
            regs.foldLeft(0L)(_ + _), regs.count(_ == 0).toLong))
      }
  }
}
