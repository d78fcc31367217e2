package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Stateful streaming SPAN-level dedup — the incremental counterpart
  * of q124 (C4/RefinedWeb span dedup): as documents arrive, each
  * consecutive `width`-token span is kept iff no earlier document
  * (or earlier position) already contributed the same span. The
  * batch form answers "which spans survive over this corpus"; this
  * one answers "which spans of the document arriving NOW are new" —
  * the mutation an ingest pipeline applies before writing training
  * shards.
  *
  * Keying and state follow the [[NearDupStream]] discipline: group
  * by a 64-bit span hash (the shuffle key never carries span text),
  * store a second independent 64-bit hash per seen span in the
  * bucket's capped list — matching on 128 combined bits, the same
  * collision budget the batch operator documents for its at-scale
  * hashed-key variant. Bucket state is FIFO-capped (a bucket is
  * almost always a single span; the cap only guards adversarial
  * collisions) and idle buckets evict after `stateTtlMs` — the dedup
  * horizon is explicitly the TTL.
  *
  * First-arrival ownership: within a micro-batch, rows process in
  * (doc_id, pos) order, so a corpus replayed in doc_id order yields
  * EXACTLY the batch operator's lexicographic-min-(doc_id, pos)
  * owners (spec-pinned); out-of-order streams keep first-ARRIVAL
  * semantics, which is what "seen before" means on a stream.
  */
object SpanDedupStream {

  final case class Doc(doc_id: Long, text: String)
  final case class SpanRow(bucket: Long, h2: Long, doc_id: Long, pos: Int, seg: String)
  final case class BucketSeen(size: Int, h2s: List[Long])
  final case class KeptSpan(doc_id: Long, pos: Int, seg: String)

  /** splitmix64 finalizer (the BloomFilter/SplittableRandom mix). */
  private def mix(x: Long): Long = {
    var z = x + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  private def hash64(s: String, seed: Long): Long = {
    // FNV-1a over UTF-16 code units, seed-mixed — cheap, dependency-
    // free, independent across seeds for the 128-bit combined match
    var h = 0xcbf29ce484222325L ^ mix(seed)
    var i = 0
    while (i < s.length) {
      h ^= s.charAt(i)
      h *= 0x100000001b3L
      i += 1
    }
    h
  }

  def keptSpans(
      docs: Dataset[Doc],
      width: Int = 10,
      maxPerBucket: Int = 64,
      stateTtlMs: Long = 6 * 3600 * 1000L): Dataset[KeptSpan] = {
    val spark = docs.sparkSession
    import spark.implicits._
    require(width > 0)
    val streaming = docs.isStreaming

    val rows = docs.mapPartitions { it =>
      it.flatMap { d =>
        val toks = graft.functions.TextFunctions.tokensScalar(d.text)
        toks.grouped(width).zipWithIndex.map { case (g, pos) =>
          val seg = g.mkString(" ")
          SpanRow(hash64(seg, 1L), hash64(seg, 2L), d.doc_id, pos, seg)
        }
      }
    }

    def fn(bucket: Long, it: Iterator[SpanRow],
        state: GroupState[BucketSeen]): Iterator[KeptSpan] = {
      if (!it.hasNext) {               // TTL fired: bucket idle → evict
        state.remove()
        return Iterator.empty
      }
      var st = state.getOption.getOrElse(BucketSeen(0, Nil))
      val out = Seq.newBuilder[KeptSpan]
      // deterministic arrival order within a batch: replaying a
      // corpus in doc order reproduces the batch owner rule
      for (row <- it.toSeq.sortBy(r => (r.doc_id, r.pos))) {
        if (!st.h2s.contains(row.h2)) {
          out += KeptSpan(row.doc_id, row.pos, row.seg)
          st =
            if (st.size < maxPerBucket) BucketSeen(st.size + 1, row.h2 :: st.h2s)
            else BucketSeen(maxPerBucket, (row.h2 :: st.h2s).take(maxPerBucket))
        }
      }
      if (streaming) {
        state.update(st)
        if (stateTtlMs > 0) state.setTimeoutDuration(stateTtlMs)
      } else state.remove()
      out.result().iterator
    }

    rows.groupByKey(_.bucket)
      .flatMapGroupsWithState(OutputMode.Append,
        if (streaming && stateTtlMs > 0) GroupStateTimeout.ProcessingTimeTimeout
        else GroupStateTimeout.NoTimeout)(fn)
  }
}
