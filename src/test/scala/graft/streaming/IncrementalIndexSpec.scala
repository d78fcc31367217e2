package graft.streaming

import java.nio.file.Files

import graft.SparkSpec
import graft.pipeline.{Chunk, HashingEmbedder}
import org.apache.spark.sql.functions._

class IncrementalIndexSpec extends SparkSpec {

  test("AvailableNow sync: embeds only new chunks, idempotent re-run") {
    import spark.implicits._
    val base = Files.createTempDirectory("graft-stream")
    val chunksDir = s"$base/chunks"
    val indexDir = s"$base/index"
    val ckpt = s"$base/ckpt"
    val e = HashingEmbedder(dim = 64)

    // batch 1
    Seq(Chunk(1L, 0, "1_0", "first chunk text for the index"),
        Chunk(2L, 0, "2_0", "second chunk text for the index"))
      .toDS().write.mode("append").parquet(chunksDir)
    IncrementalIndex.syncOnce(spark, chunksDir, indexDir, ckpt, e)
    assert(spark.read.parquet(indexDir).count() === 2)

    // batch 2 appended: only the delta is embedded
    Seq(Chunk(3L, 0, "3_0", "third chunk arrives later"))
      .toDS().write.mode("append").parquet(chunksDir)
    IncrementalIndex.syncOnce(spark, chunksDir, indexDir, ckpt, e)
    val idx = spark.read.parquet(indexDir)
    assert(idx.count() === 3)
    assert(idx.select("chunk_id").as[String].collect().sorted === Array("1_0", "2_0", "3_0"))

    // re-run with no new input: no duplicates (checkpointed exactly-once)
    IncrementalIndex.syncOnce(spark, chunksDir, indexDir, ckpt, e)
    assert(spark.read.parquet(indexDir).count() === 3)

    // embeddings identical to batch-mode inference
    val fromStream = idx.filter($"chunk_id" === "3_0")
      .select("embedding").as[Array[Float]].head()
    assert(fromStream.toSeq === e.embedOne("third chunk arrives later").toSeq)
  }

  test("extraction → chunk → AvailableNow sync parity on a MIXED binary " +
    "corpus (ObjStm, RC4- and AES-256-decryptable, locked, plain bytes)") {
    import spark.implicits._
    import graft.pipeline._
    val base = Files.createTempDirectory("graft-stream-mixed")
    val (chunksDir, indexDir, ckpt) = (s"$base/chunks", s"$base/index", s"$base/ckpt")
    val e = HashingEmbedder(dim = 32)
    def longText(tag: String) = (1 to 12).map(i =>
      s"$tag sentence number $i with enough characters to clear the filter")
      .mkString("\n")
    val docs = Seq(
      (1L, PdfGen.simple(longText("simplefont"))),
      (2L, PdfGen.objStm(longText("objstm"))),
      (3L, PdfGen.encrypted(longText("rcfouropen"))),      // RC4, readable by design
      (4L, PdfGen.encryptedAes256(longText("aesvfive"),    // V5/R6 behind an
        xrefTail = true)),                                 // xref-stream container
      (5L, PdfGen.encrypted(longText("lockedbody"), "hunter2")), // stays ciphertext
      (6L, longText("plainbytes").getBytes("UTF-8")),
      // r16 image-leg containers: no text layer, so they route to the
      // image leg (OCR renditions feed the stand-in) — the stream
      // parity below must hold over their chunks too
      (7L, PdfGen.subbitPdf(7L)),             // 3 mod 4: 1-bit /Indexed
      (8L, PdfGen.jbig2TextPdf(9L)),          // odd: /JBIG2Globals layout
      (9L, PdfGen.iccPdf(1L)))                // ICCBased RGB
    val binDocs = docs.map { case (id, b) => (id, b, b.length.toLong) }
      .toDF("doc_id", "content", "filesize")
    val extracted = OcrPipeline.extractTextAudited(
      spark, binDocs, AutoPartitioner(TextPartitioner()), parallelism = 4)
    // every extraction branch fired where expected
    val paths = extracted.select($"doc_id", $"extract_path")
      .as[(Long, String)].collect().toMap
    assert(paths(1L) === ExtractPath.PdfText)
    assert(paths(2L) === ExtractPath.PdfText)
    assert(paths(3L) === ExtractPath.PdfDecrypted)
    assert(paths(4L) === ExtractPath.PdfDecrypted)
    assert(paths(5L) === ExtractPath.PdfEncrypted)
    assert(paths(6L) === ExtractPath.NonPdf)
    assert(paths(7L) === ExtractPath.PdfImage)
    assert(paths(8L) === ExtractPath.PdfImage)
    assert(paths(9L) === ExtractPath.PdfImage)
    val chunks = Inference.chunkDocuments(
      spark, extracted.select($"doc_id", $"text"), width = 120)
    // batch reference: extraction + chunking + embedding in one pass
    val batchRef = Inference.embedChunks(chunks, e).collect()
      .map(c => (c.chunk_id, c.chunk, c.embedding.toSeq)).toSet
    assert(batchRef.nonEmpty)
    // streaming: first wave, then the decrypt-leg docs arrive as a
    // LATER delta — the sync must embed exactly the new chunks
    chunks.filter($"doc_id" <= 2L).write.mode("append").parquet(chunksDir)
    IncrementalIndex.syncOnce(spark, chunksDir, indexDir, ckpt, e)
    chunks.filter($"doc_id" > 2L).write.mode("append").parquet(chunksDir)
    IncrementalIndex.syncOnce(spark, chunksDir, indexDir, ckpt, e)
    val streamed = spark.read.parquet(indexDir)
      .select($"chunk_id", $"chunk", $"embedding")
      .as[(String, String, Array[Float])]
      .collect().map { case (id, c, v) => (id, c, v.toSeq) }.toSet
    assert(streamed === batchRef, "stream chunk set must equal batch")
    // the decrypted text layers really are in the index…
    assert(streamed.exists(_._2.contains("rcfouropen")))
    assert(streamed.exists(_._2.contains("aesvfive")))
    // …and the locked document's plaintext is not (ciphertext only)
    assert(!streamed.exists(_._2.contains("lockedbody")))
  }

  test("windowedEventStats: streaming AvailableNow result matches batch") {
    import spark.implicits._
    val base = Files.createTempDirectory("graft-events")
    val eventsDir = s"$base/events"
    val rows = Seq(
      ("2024-01-01 00:05:00", "click", 1.0),
      ("2024-01-01 00:55:00", "click", 2.0),
      ("2024-01-01 01:10:00", "view", 5.0),
      ("2024-01-01 02:01:00", "click", 7.0))
      .toDF("ts_s", "event_type", "value")
      .select(to_timestamp($"ts_s").as("ts"), $"event_type", $"value")
    rows.write.parquet(eventsDir)

    val batchResult = IncrementalIndex.windowedEventStats(rows)
      .orderBy("hour_start", "event_type").collect().toSeq

    val stream = spark.readStream.schema(rows.schema).parquet(eventsDir)
    val q = IncrementalIndex.windowedEventStats(stream)
      .writeStream.format("memory").queryName("winstats")
      .outputMode("complete")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val streamResult = spark.table("winstats")
      .orderBy("hour_start", "event_type").collect().toSeq
    assert(streamResult === batchResult)
    assert(batchResult.map(_.getLong(2)).sum === 4)
  }
}
