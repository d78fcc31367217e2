package graft.streaming

import graft.functions.TextFunctions
import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Stateful streaming BM25 maintenance — the lexical-retrieval
  * counterpart of [[IncrementalIndex]] (which maintains the DENSE
  * side): a STANDING keyword query over an incrementally-arriving
  * corpus, the alerting/monitoring shape (watch a crawl for documents
  * matching a topic, keep the current top-k fresh). Batch counterpart:
  * `TextSearch.bm25TopK` (q52).
  *
  * Parity discipline: each batch folds the new documents into the
  * tracked index state — per-doc token length and query-term
  * frequencies only (the state is O(docs·|query|), never the token
  * stream) — then recomputes BM25 with the batch operator's
  * arithmetic verbatim: Lucene idf ln(1+(N−df+0.5)/(df+0.5)), length
  * norm k1·(1−b+b·len/avgLen) with the same long→double promotion
  * order, contribution idf·tf·(k1+1)/(tf+norm), and the score
  * HALF_UP-rounded to `scale` decimals BEFORE ordering (so libm /
  * summation-order ulp differences can never flip a rank — the same
  * argument the batch operator makes for its oracle). The LAST
  * batch's emission therefore equals `bm25TopK` over the same
  * documents — pinned in Bm25StreamSpec.
  *
  * Emission model: BM25 is globally coupled (every new document
  * shifts N, avgLen, and df, hence every score), so each batch emits
  * the COMPLETE current top-k stamped with a batch tick — a
  * downstream sink overwrites its k rows per tick (the
  * complete-refresh contract), which is why this stream needs no
  * tombstones: k is small by construction.
  *
  * Re-delivery: documents are keyed by id — an id seen again REPLACES
  * its previous text (at-least-once replay of an unchanged document
  * is a no-op; an updated document re-scores), matching the
  * exactly-once-upsert reading of a CDF/kafka channel.
  *
  * State cap (the family's rule): past `maxDocs`, least-recently-
  * touched documents are evicted before scoring, so the standing
  * query tracks a bounded recent corpus — the documented recall
  * trade; retained scores are exact for the tracked corpus.
  *
  * SINGLE-TASK CEILING (shared with the registry family —
  * PageRankStream, CentralityStream, SsspStream): the global coupling
  * above forces `groupByKey(_ => 0)`, so ALL state and the full
  * per-batch re-score of every tracked document serialize onto ONE
  * task — O(maxDocs·|query|) work per tick on a single executor core.
  * That is the correct shape for a standing query over a BOUNDED
  * recent corpus (the alerting use-case), and exactly wrong for
  * corpus-scale retrieval: do not raise `maxDocs` past what one core
  * re-scores within the trigger interval (~10⁵–10⁶ docs·terms per
  * second); for corpus-scale lexical search, use the batch
  * `TextSearch.bm25TopK` over the full table instead.
  */
object Bm25Stream extends Serializable {

  final case class Doc(id: Long, text: String)

  /** One standing-query result row: `tick` identifies the batch, rank
    * is 1-based within it. */
  final case class Hit(tick: Long, rank: Int, id: Long, score: Double, nHit: Long)

  final case class Registry(
      lens: Map[Long, Long],
      tfs: Map[Long, Map[String, Long]],
      touch: Map[Long, Long],
      tick: Long)

  def topKAssignments(
      docs: Dataset[Doc],
      query: Seq[String],
      k: Int,
      k1: Double = 1.2,
      b: Double = 0.75,
      scale: Int = 4,
      maxDocs: Int = 1 << 20): Dataset[Hit] = {
    require(query.nonEmpty, "query terms required")
    val spark = docs.sparkSession
    import spark.implicits._
    val terms = query.toSet

    def fn(key: Int, it: Iterator[Doc],
        state: GroupState[Registry]): Iterator[Hit] = {
      val st = state.getOption.getOrElse(Registry(Map.empty, Map.empty, Map.empty, 0L))
      val lens = scala.collection.mutable.HashMap.from(st.lens)
      val tfs = scala.collection.mutable.HashMap.from(st.tfs)
      val touch = scala.collection.mutable.HashMap.from(st.touch)
      val tick = st.tick + 1

      it.foreach { d =>
        // the batch tokenizer contract, scalar twin (one tokenizer,
        // not two drifting copies — TextFunctions.tokensScalar)
        val toks = TextFunctions.tokensScalar(d.text)
        lens(d.id) = toks.length.toLong
        val tf = scala.collection.mutable.HashMap.empty[String, Long]
        toks.foreach { t =>
          if (terms.contains(t)) tf(t) = tf.getOrElse(t, 0L) + 1L
        }
        tfs(d.id) = tf.toMap
        touch(d.id) = tick
      }

      // cap FIRST (the PageRankStream discipline): evict least-
      // recently-touched docs, then score exactly the survivors
      if (lens.size > maxDocs) {
        lens.keys.toSeq
          .sortBy(id => (touch.getOrElse(id, 0L), id))
          .take(lens.size - maxDocs)
          .foreach { id => lens.remove(id); tfs.remove(id); touch.remove(id) }
      }

      val out: Seq[Hit] = if (lens.isEmpty) Seq.empty else {
        // the batch arithmetic, verbatim promotion order
        val nDocs = lens.size.toLong
        val totalLen = lens.valuesIterator.sum
        val avgLen = totalLen.toDouble / nDocs
        val df = scala.collection.mutable.HashMap.empty[String, Long]
        tfs.foreach { case (_, tf) =>
          tf.keysIterator.foreach(t => df(t) = df.getOrElse(t, 0L) + 1L)
        }
        val scored = tfs.iterator.flatMap { case (id, tf) =>
          if (tf.isEmpty) None
          else {
            val len = lens(id)
            val norm = k1 * ((1.0 - b) + b * len / avgLen)
            // deterministic term order for the double sum; the final
            // HALF_UP round absorbs any remaining ulp vs the batch
            // aggregation order
            var s = 0.0
            tf.toSeq.sortBy(_._1).foreach { case (t, f) =>
              val d = df(t)
              val idf = math.log(1.0 + (nDocs - d + 0.5) / (d + 0.5))
              s += idf * f * (k1 + 1.0) / (f + norm)
            }
            val score = BigDecimal(s)
              .setScale(scale, BigDecimal.RoundingMode.HALF_UP).toDouble
            Some((id, score, tf.size.toLong))
          }
        }.toSeq
        scored.sortBy { case (id, score, _) => (-score, id) }
          .take(k).zipWithIndex
          .map { case ((id, score, nHit), i) => Hit(tick, i + 1, id, score, nHit) }
      }

      state.update(Registry(lens.toMap, tfs.toMap, touch.toMap, tick))
      out.iterator
    }

    docs.groupByKey(_ => 0)
      .flatMapGroupsWithState(
        OutputMode.Append(), GroupStateTimeout.NoTimeout())(fn)
  }
}
