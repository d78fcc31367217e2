package graft.streaming

import graft.SparkSpec
import graft.multimodal.ImageDedup
import graft.pipeline.{PdfGen, PdfRasterCodec}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.{OutputMode, Trigger}

/** Streaming perceptual scan-dedup ≡ batch: the stream's cumulative
  * pair set over the q349 corpus (rasterPdf originals + planted
  * twins, hashed through the REAL PdfRasterCodec extraction) is
  * bit-identical to ImageDedup.nearDupPairs on the same hashes, with
  * the twins arriving in a LATER delta so the cross-micro-batch
  * state path is the one exercised.
  */
class ScanDedupStreamSpec extends SparkSpec {
  import ScanDedupStream.Scan

  private val MaxHamming = 2
  private val Ids = 0L until 24L

  private def hashes: Seq[(Long, Long)] = {
    val codec = PdfRasterCodec()
    Ids.flatMap { id =>
      Seq((id * 2, ImageDedup.dHash(codec, PdfGen.rasterPdf(id))),
        (id * 2 + 1, ImageDedup.dHash(codec, PdfGen.rasterPdfTwin(id))))
    }
  }

  test("cross-batch stream pairs == batch pigeonhole pairs, bit-exact") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val hs = hashes

    val batch = ImageDedup.nearDupPairs(
        hs.toDF("media_id", "phash"), "media_id", maxHamming = MaxHamming)
      .as[(Long, Long, Long)].collect().toSet
    spark.catalog.clearCache()               // nearDupPairs persists its hash frame
    assert(batch.size >= Ids.size)           // every planted twin found
    assert(hs.toMap.size === Ids.size * 2)

    val mem = MemoryStream[Scan]
    val q = ScanDedupStream.nearDupPairs(mem.toDS(),
        maxHamming = MaxHamming, stateTtlMs = 0)
      .writeStream.format("memory").queryName("scandedup_out")
      .outputMode(OutputMode.Append).trigger(Trigger.ProcessingTime(0)).start()
    try {
      // originals first …
      mem.addData(hs.filter(_._1 % 2 == 0).map(h => Scan(h._1, h._2)): _*)
      q.processAllAvailable()
      // … twins in a later delta: every planted pair must cross state
      mem.addData(hs.filter(_._1 % 2 == 1).map(h => Scan(h._1, h._2)): _*)
      q.processAllAvailable()
      val streamed = spark.table("scandedup_out")
        .dropDuplicates("id_a", "id_b")
        .as[(Long, Long, Long)].collect().toSet
      assert(streamed === batch)
    } finally q.stop()
  }

  test("batch mode: flood emissions bounded by the state cap") {
    import spark.implicits._
    val flood = (1L to 150L).map(i => Scan(i, 0x00FFAA5500FF33L)).toDS()
    val pairs = ScanDedupStream.nearDupPairs(flood, maxHamming = 2, maxPerBucket = 3)
      .dropDuplicates("id_a", "id_b")
    val n = pairs.count()
    assert(n <= 150L * 3)                    // not n^2/2 = 11k
    assert(n >= 149L)                        // chain connectivity survives
  }

  test("hashes farther than maxHamming never pair") {
    import spark.implicits._
    val far = Seq(Scan(1L, 0L), Scan(2L, -1L)).toDS()   // Hamming 64
    assert(ScanDedupStream.nearDupPairs(far, maxHamming = 3).isEmpty)
  }

  test("re-delivered media_id occupies ONE ring slot (no eviction by dup)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val h = 0x123456789abcdL
    val mem = MemoryStream[Scan]
    val q = ScanDedupStream.nearDupPairs(mem.toDS(), maxHamming = 0,
        maxPerBucket = 2, stateTtlMs = 0)
      .writeStream.format("memory").queryName("scandedup_redeliver")
      .outputMode(OutputMode.Append).trigger(Trigger.ProcessingTime(0)).start()
    try {
      for (id <- Seq(1L, 2L, 2L, 3L)) {      // 2 is re-delivered
        mem.addData(Scan(id, h)); q.processAllAvailable()
      }
      val pairs = spark.table("scandedup_redeliver")
        .dropDuplicates("id_a", "id_b").as[(Long, Long, Long)].collect().toSet
      // without insert-dedup the re-delivered 2 occupies a second slot
      // of the cap-2 ring, evicting member 1 — and (1, 3) is lost
      assert(pairs === Set((1L, 2L, 0L), (1L, 3L, 0L), (2L, 3L, 0L)))
    } finally q.stop()
  }
}
