package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.multimodal.ImageDedup

/** Stateful streaming PERCEPTUAL near-duplicate detection — the
  * incremental counterpart of [[graft.multimodal.ImageDedup
  * .nearDupPairs]], completing the batch/stream pairing for the
  * scanned-image leg the way [[NearDupStream]] does for MinHash
  * text: as scans arrive (already hashed — e.g.
  * `ImageDedup.dHash(PdfRasterCodec(), pdfBytes)` in the decode
  * map), each is checked against previously seen hashes sharing a
  * pigeonhole block, without re-scanning history. "Is the scan
  * arriving NOW a copy of anything seen" is the ingest-time question
  * that makes the OCR pass affordable at 100 TB — duplicates are
  * dropped before the model, not after.
  *
  * Recall: the 56-bit dHash splits into `maxHamming + 1` blocks —
  * two hashes within `maxHamming` differ in at most `maxHamming`
  * blocks, so they AGREE on at least one and meet in its bucket
  * (exact, same argument as the batch operator). Candidates are then
  * confirmed by true Hamming distance, so emissions are exact pairs,
  * at-least-once across blocks (a pair agreeing on several blocks
  * emits from each — route through `dropDuplicates(id_a, id_b)` /
  * `dropDuplicatesWithinWatermark` downstream).
  *
  * State: per (block, value) bucket, a FIFO ring of the most recent
  * `maxPerBucket` (id, phash) members; buckets idle past
  * `stateTtlMs` are evicted on processing-time timeout (`0` disables
  * — bounded corpora and tests). Same bounds discipline and caveats
  * as [[NearDupStream]]: a flood of identical scans forgets oldest
  * members but keeps matching new arrivals against the retained
  * ones, and per-arrival emission is ≤ cap × blocks, never
  * corpus-sized.
  */
object ScanDedupStream {

  final case class Scan(media_id: Long, phash: Long)
  final case class BlockRow(block: Int, bval: Long, media_id: Long, phash: Long)
  final case class BucketState(size: Int, ids: List[Long], hashes: List[Long])
  final case class ScanPair(id_a: Long, id_b: Long, hamming: Long)

  def nearDupPairs(
      scans: Dataset[Scan],
      maxHamming: Int = 2,
      maxPerBucket: Int = 64,
      stateTtlMs: Long = 6 * 3600 * 1000L): Dataset[ScanPair] = {
    val spark = scans.sparkSession
    import spark.implicits._
    require(maxHamming >= 0 && maxHamming < ImageDedup.HashBits,
      s"maxHamming must be in [0, ${ImageDedup.HashBits}), got $maxHamming")
    val blocks = maxHamming + 1
    val base = ImageDedup.HashBits / blocks
    val streaming = scans.isStreaming

    val blockRows = scans.flatMap { s =>
      (0 until blocks).map { i =>
        val width = if (i == blocks - 1) ImageDedup.HashBits - i * base else base
        val mask = (1L << width) - 1
        BlockRow(i, (s.phash >>> (i * base)) & mask, s.media_id, s.phash)
      }
    }

    def fn(key: (Int, Long), it: Iterator[BlockRow],
        state: GroupState[BucketState]): Iterator[ScanPair] = {
      if (!it.hasNext) {                      // TTL fired: bucket idle
        state.remove()
        return Iterator.empty
      }
      var st = state.getOption.getOrElse(BucketState(0, Nil, Nil))
      val out = Seq.newBuilder[ScanPair]
      // deterministic emission within a micro-batch regardless of
      // task order (the NearDupStream discipline)
      for (row <- it.toSeq.sortBy(_.media_id)) {
        st.ids.lazyZip(st.hashes).foreach { (mid, mh) =>
          if (mid != row.media_id) {
            val d = java.lang.Long.bitCount(mh ^ row.phash)
            if (d <= maxHamming)
              out += ScanPair(math.min(mid, row.media_id),
                math.max(mid, row.media_id), d.toLong)
          }
        }
        // a re-delivered media_id must not occupy a second ring slot
        // (at-least-once sources re-send rows; duplicates would halve
        // the effective ring) — drop the old occurrence, then insert
        // at the head as the freshest member (r15 ADVICE)
        val (ids0, hashes0) =
          if (st.ids.contains(row.media_id)) {
            val kept = st.ids.zip(st.hashes).filter(_._1 != row.media_id)
            (kept.map(_._1), kept.map(_._2))
          } else (st.ids, st.hashes)
        val ids1 = (row.media_id :: ids0).take(maxPerBucket)
        val hashes1 = (row.phash :: hashes0).take(maxPerBucket)
        st = BucketState(ids1.size, ids1, hashes1)
      }
      if (streaming) {
        state.update(st)
        if (stateTtlMs > 0) state.setTimeoutDuration(stateTtlMs)
      } else state.remove()
      out.result().iterator
    }

    blockRows.groupByKey(r => (r.block, r.bval))
      .flatMapGroupsWithState(OutputMode.Append,
        if (streaming && stateTtlMs > 0) GroupStateTimeout.ProcessingTimeTimeout
        else GroupStateTimeout.NoTimeout)(fn)
  }
}
