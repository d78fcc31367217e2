package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming shape of [[graft.operators.Sprt]]: the sequential
  * probability ratio walk carried across micro-batches — the live
  * "stop this experiment" monitor. Each arriving trial advances the
  * arm's integer LLR walk; once a boundary is crossed the decision
  * FREEZES (the sequential-test contract: you stop at first crossing
  * — later trials must not un-decide), and subsequent rows re-emit
  * the frozen decision state.
  *
  * Same integer micro-nat literals as the batch operator; with the
  * same trial order the emitted first-crossing state is bit-equal to
  * `Sprt.decide`'s (spec-pinned, including crossings that happen
  * mid-batch and decisions frozen across batch boundaries).
  *
  * State per arm is three longs + a flag — O(arms) total, the
  * [[EwmaStream]] minimal-carry class; rows apply in `rn` order
  * within each batch, ordered arrival across batches is the usual
  * partitioned-log contract.
  */
object SprtStream {

  final case class SprtIn(arm: String, rn: Long, succ: Boolean)

  final case class SprtOut(
      arm: String, rn: Long, n: Long, llrMicro: Long, decision: String)

  final case class SprtState(n: Long, llr: Long, decided: String)

  def decisions(
      in: Dataset[SprtIn],
      stepMicro: Long = graft.operators.Sprt.LlrStepMicro,
      thresholdMicro: Long = graft.operators.Sprt.ThresholdMicro)
      : Dataset[SprtOut] = {
    val spark = in.sparkSession
    import spark.implicits._
    in.groupByKey(_.arm)
      .flatMapGroupsWithState[SprtState, SprtOut](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (arm: String, rows: Iterator[SprtIn], state: GroupState[SprtState]) =>
          var st = state.getOption.getOrElse(SprtState(0L, 0L, "continue"))
          val out = rows.toSeq.sortBy(_.rn).map { r =>
            if (st.decided == "continue") {
              val llr = st.llr + (if (r.succ) stepMicro else -stepMicro)
              val n = st.n + 1
              val dec =
                if (llr >= thresholdMicro) "accept_h1"
                else if (llr <= -thresholdMicro) "accept_h0"
                else "continue"
              st = SprtState(n, llr, dec)
            }
            SprtOut(arm, r.rn, st.n, st.llr, st.decided)
          }
          state.update(st)
          out.iterator
      }
  }
}
