package graft.streaming

import graft.operators.Dedup.MinHasher
import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Stateful streaming NEAR-duplicate detection — the incremental
  * counterpart of `Dedup.minhashPairs`: as documents arrive, each is
  * checked against previously-seen documents that share an LSH band
  * bucket, without ever re-scanning history. The batch operators
  * answer "which pairs exist in this corpus"; this one answers "is
  * the document arriving NOW a near-dup of anything seen so far" —
  * the shape a training-data ingest pipeline actually needs.
  *
  * State: per (band, bucket) key, the most recent `maxPerBucket`
  * (id, signature) members — a FIFO ring. The cap bounds DEGENERATE
  * buckets (a boilerplate flood silently forgets oldest members; new
  * dups still match the retained near-identical ones, and emission
  * per arriving doc is ≤ cap × bands candidates, never corpus-
  * sized). Bucket COUNT still grows with distinct content, so
  * buckets idle longer than `stateTtlMs` are evicted via processing-
  * time timeout — total state is O(buckets active within the TTL
  * window), and the dedup horizon is explicitly the TTL, not "all
  * history" (unbounded history on an endless stream is unbounded
  * memory in ANY exact design). `stateTtlMs = 0` disables eviction
  * (bounded-corpus streams and tests only — note that with a TTL the
  * engine schedules timeout-only micro-batches, which busy-loops a
  * `Trigger.ProcessingTime(0)` test harness waiting on
  * `processAllAvailable`).
  *
  * Emission is at-least-once across bands (a pair sharing several
  * buckets emits from each); route the output through
  * `dropDuplicates(id_a, id_b)` in batch or
  * `dropDuplicatesWithinWatermark` on a pair key in streaming.
  * The same call works on a batch Dataset (state starts empty, one
  * invocation per group) — used by the deterministic spec.
  */
object NearDupStream {

  final case class Doc(doc_id: Long, text: String)
  final case class BandRow(band: Int, key: Int, doc_id: Long, sig: Array[Long])
  final case class BucketState(size: Int, ids: List[Long], sigs: List[Array[Long]])
  final case class CandPair(id_a: Long, id_b: Long, est_jaccard: Double)

  def nearDupPairs(
      docs: Dataset[Doc],
      hasher: MinHasher = MinHasher(),
      bands: Int = 16,
      threshold: Double = 0.7,
      maxPerBucket: Int = 64,
      stateTtlMs: Long = 6 * 3600 * 1000L): Dataset[CandPair] = {
    val spark = docs.sparkSession
    import spark.implicits._
    require(hasher.numHashes % bands == 0, "bands must divide numHashes")
    val rowsPerBand = hasher.numHashes / bands
    // evaluated HERE: the state fn must not capture the Dataset
    val streaming = docs.isStreaming

    val bandRows = docs.mapPartitions { it =>
      it.flatMap { d =>
        val sig = hasher.signature(d.text)
        sig.grouped(rowsPerBand).zipWithIndex.map { case (slice, b) =>
          BandRow(b, scala.util.hashing.MurmurHash3.arrayHash(slice, 17), d.doc_id, sig)
        }
      }
    }

    def fn(key: (Int, Int), it: Iterator[BandRow],
        state: GroupState[BucketState]): Iterator[CandPair] = {
      if (!it.hasNext) {               // TTL fired: bucket idle → evict
        state.remove()
        return Iterator.empty
      }
      var st = state.getOption.getOrElse(BucketState(0, Nil, Nil))
      val out = Seq.newBuilder[CandPair]
      // arrival order within a batch is made deterministic by id —
      // emission (which member-set each doc sees) must not depend on
      // task scheduling
      for (row <- it.toSeq.sortBy(_.doc_id)) {
        st.ids.lazyZip(st.sigs).foreach { (mid, msig) =>
          if (mid != row.doc_id) {
            val est = hasher.estJaccard(msig, row.sig)
            if (est >= threshold)
              out += CandPair(math.min(mid, row.doc_id), math.max(mid, row.doc_id),
                // HALF_UP like the batch operators' Spark round(), so
                // stream and batch score a pair identically on exact
                // .5 midpoints (est is ≥ 0)
                math.floor(est * 10000 + 0.5) / 10000)
          }
        }
        // FIFO ring: newest first, oldest dropped at the cap; tracked
        // size keeps below-cap arrivals an O(1) prepend (the O(cap)
        // rebuild only happens once full, where the comparison work
        // is O(cap) anyway)
        st = if (st.size < maxPerBucket)
          BucketState(st.size + 1, row.doc_id :: st.ids, row.sig :: st.sigs)
        else
          BucketState(maxPerBucket, (row.doc_id :: st.ids).take(maxPerBucket),
            (row.sig :: st.sigs).take(maxPerBucket))
      }
      if (streaming) {
        state.update(st)
        if (stateTtlMs > 0) state.setTimeoutDuration(stateTtlMs)
      } else state.remove()
      out.result().iterator
    }

    bandRows.groupByKey(r => (r.band, r.key))
      .flatMapGroupsWithState(OutputMode.Append,
        if (streaming && stateTtlMs > 0) GroupStateTimeout.ProcessingTimeTimeout
        else GroupStateTimeout.NoTimeout)(fn)
  }
}
