package graft.streaming

import graft.operators.Linkage
import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming record linkage — [[Linkage]]'s Fellegi–Sunter scoring
  * under the [[NearDupStream]]/[[SemDeDupStream]] state discipline:
  * "is the arriving record the same entity as anything seen", per
  * blocking key, without rescanning history. An arriving record is
  * scored against the block's retained members with the SAME integer
  * micro-nat weights as the batch operator (one [[Linkage.micro]]
  * fixed-point arithmetic, so a replayed stream reproduces batch
  * scores exactly — spec-pinned parity); pairs at or above `minScore`
  * are emitted once, canonically ordered.
  *
  * State: the most recent `maxPerBlock` records per block in a FIFO
  * ring (a flood of one block forgets oldest members; new arrivals
  * still match the retained ones), idle blocks evicted after
  * `stateTtlMs` via processing-time timeout (0 disables — bounded
  * corpora and tests). Per-pair work is |fields| scalar agreements —
  * the levenshtein/equality/numeric predicates' scalar twins.
  */
object LinkageStream {

  /** One comparison field over the record's `vals` array (index-
    * aligned): scalar agreement predicate + the m/u priors. Weights
    * are the identical integer micro-nats as [[Linkage.Field]].
    */
  final case class ScalarField(
      name: String,
      agree: (String, String) => Boolean,
      m: Double,
      u: Double) {
    require(m > 0 && m < 1 && u > 0 && u < 1 && m > u,
      s"need 0 < u < m < 1, got m=$m u=$u")
    val wAgree: Long = Linkage.micro(m / u)
    val wDisagree: Long = Linkage.micro((1 - m) / (1 - u))
  }

  final case class LinkRec(id: Long, block: Long, vals: Array[String])
  final case class BlockState(size: Int, ids: List[Long], vals: List[Array[String]])
  final case class LinkPair(id_a: Long, id_b: Long, fs_score: Long)

  def linkPairs(
      recs: Dataset[LinkRec],
      fields: Seq[ScalarField],
      minScore: Long,
      maxPerBlock: Int = 4096,
      stateTtlMs: Long = 6 * 3600 * 1000L): Dataset[LinkPair] = {
    val spark = recs.sparkSession
    import spark.implicits._
    val streaming = recs.isStreaming

    def score(a: Array[String], b: Array[String]): Long = {
      var s = 0L
      var i = 0
      while (i < fields.length) {
        val f = fields(i)
        s += (if (f.agree(a(i), b(i))) f.wAgree else f.wDisagree)
        i += 1
      }
      s
    }

    def fn(block: Long, it: Iterator[LinkRec],
        state: GroupState[BlockState]): Iterator[LinkPair] = {
      if (!it.hasNext) { state.remove(); return Iterator.empty }
      var st = state.getOption.getOrElse(BlockState(0, Nil, Nil))
      val out = Seq.newBuilder[LinkPair]
      // deterministic within-batch arrival order (emission must not
      // depend on task scheduling)
      for (rec <- it.toSeq.sortBy(_.id)) {
        st.ids.lazyZip(st.vals).foreach { (mid, mvals) =>
          if (mid != rec.id) {
            val s = score(mvals, rec.vals)
            if (s >= minScore)
              out += LinkPair(math.min(mid, rec.id), math.max(mid, rec.id), s)
          }
        }
        st =
          if (st.size < maxPerBlock)
            BlockState(st.size + 1, rec.id :: st.ids, rec.vals :: st.vals)
          else
            BlockState(st.size, (rec.id :: st.ids).take(maxPerBlock),
              (rec.vals :: st.vals).take(maxPerBlock))
      }
      state.update(st)
      if (streaming && stateTtlMs > 0) state.setTimeoutDuration(stateTtlMs)
      out.result().iterator
    }

    val timeout =
      if (streaming && stateTtlMs > 0) GroupStateTimeout.ProcessingTimeTimeout
      else GroupStateTimeout.NoTimeout
    recs.groupByKey(_.block)
      .flatMapGroupsWithState(OutputMode.Append, timeout)(fn)
  }
}
