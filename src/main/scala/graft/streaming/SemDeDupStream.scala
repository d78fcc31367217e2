package graft.streaming

import graft.operators.KMeans
import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Stateful streaming SEMANTIC dedup — the incremental counterpart of
  * `KMeans.semanticDedup` (q119), completing the streaming near-dup
  * family: [[NearDupStream]] answers "is the arriving doc a
  * token-level near-dup of anything seen", this one answers the same
  * for EMBEDDING similarity. An arriving vector is assigned to its
  * k-means cell by a PRE-TRAINED model (training is a batch concern —
  * the model is a k·dim closure constant, exactly the SemDeDup
  * blocking trade: recall loss at cell boundaries for Σ n_cell² work),
  * then compared by exact cosine against the cell's retained members.
  *
  * State discipline is [[NearDupStream]]'s, per CELL instead of per
  * LSH bucket: the most recent `maxPerCell` (id, vector) members in a
  * FIFO ring (a flood of one topic forgets oldest members; new dups
  * still match the retained ones), idle cells evicted after
  * `stateTtlMs` via processing-time timeout (`0` disables — bounded
  * corpora and tests). Cell count is fixed at k, so TOTAL state is ≤
  * k · maxPerCell vectors — unlike the bucket stream, the ceiling is
  * a configuration constant, not data-dependent.
  *
  * Emission is exactly-once per pair (each doc lives in ONE cell, so
  * a pair can only meet there — no cross-band duplicate emissions to
  * drop). Cosine accumulates left-to-right in double and rounds
  * HALF_UP to 6 — bit-identical to the batch grid join's codegen
  * `cosine_sim` + `round(cos, 6)`, so a stream replay of a corpus
  * reproduces q119's rows exactly (pinned by SemDeDupStreamSpec).
  * The same call works on a batch Dataset (state starts empty, one
  * invocation per group).
  */
object SemDeDupStream {

  final case class EmbDoc(doc_id: Long, vec: Array[Float])
  final case class CellRow(cell: Int, doc_id: Long, vec: Array[Float])
  final case class CellState(size: Int, ids: List[Long], vecs: List[Array[Float]])
  final case class SemPair(id_a: Long, id_b: Long, cos: Double)

  /** Left-to-right double cosine, the scalar twin of the codegen
    * `cosine_sim` expression (CosineSimilarity.scala) — same
    * accumulation order, so the same doubles.
    */
  private def cosine(a: Array[Float], b: Array[Float]): Double = {
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < a.length) {
      val x = a(i).toDouble; val y = b(i).toDouble
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  def semanticPairs(
      docs: Dataset[EmbDoc],
      model: KMeans.Model,
      threshold: Double,
      maxPerCell: Int = 4096,
      stateTtlMs: Long = 6 * 3600 * 1000L): Dataset[SemPair] = {
    val spark = docs.sparkSession
    import spark.implicits._
    // evaluated HERE: the state fn must not capture the Dataset
    val streaming = docs.isStreaming

    // cell assignment is a narrow map, the streaming mirror of
    // KMeans.assignCells (model rides the closure)
    val cellRows = docs.mapPartitions { it =>
      it.map(d => CellRow(model.assign(d.vec), d.doc_id, d.vec))
    }

    def fn(cell: Int, it: Iterator[CellRow],
        state: GroupState[CellState]): Iterator[SemPair] = {
      if (!it.hasNext) {               // TTL fired: cell idle → evict
        state.remove()
        return Iterator.empty
      }
      var st = state.getOption.getOrElse(CellState(0, Nil, Nil))
      val out = Seq.newBuilder[SemPair]
      // deterministic arrival order within a batch (emission must not
      // depend on task scheduling)
      for (row <- it.toSeq.sortBy(_.doc_id)) {
        st.ids.lazyZip(st.vecs).foreach { (mid, mvec) =>
          if (mid != row.doc_id) {
            val c = cosine(mvec, row.vec)
            if (c > threshold)
              out += SemPair(math.min(mid, row.doc_id), math.max(mid, row.doc_id),
                // HALF_UP at 6, matching the batch round(cos, 6)
                java.math.BigDecimal.valueOf(c)
                  .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue())
          }
        }
        // FIFO ring: newest first, oldest dropped at the cap. The
        // tracked size keeps the common below-cap arrival an O(1)
        // prepend; the O(cap) rebuild only happens once full, where
        // the required cosine work is O(cap) anyway
        st = if (st.size < maxPerCell)
          CellState(st.size + 1, row.doc_id :: st.ids, row.vec :: st.vecs)
        else
          CellState(maxPerCell, (row.doc_id :: st.ids).take(maxPerCell),
            (row.vec :: st.vecs).take(maxPerCell))
      }
      if (streaming) {
        state.update(st)
        if (stateTtlMs > 0) state.setTimeoutDuration(stateTtlMs)
      } else state.remove()
      out.result().iterator
    }

    cellRows.groupByKey(_.cell)
      .flatMapGroupsWithState(OutputMode.Append,
        if (streaming && stateTtlMs > 0) GroupStateTimeout.ProcessingTimeTimeout
        else GroupStateTimeout.NoTimeout)(fn)
  }
}
