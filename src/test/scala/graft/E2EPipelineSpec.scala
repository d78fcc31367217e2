package graft

import java.nio.charset.StandardCharsets

import graft.pipeline._
import org.apache.spark.sql.functions._

/** End-to-end pipeline test (SURVEY §5.4): the full E1→E3 flow of the
  * reference — binary documents → OCR/partition → chunk → embed →
  * index → top-k similarity search — run deterministically in one
  * Spark job graph with the local seam implementations.
  */
class E2EPipelineSpec extends SparkSpec {

  test("documents → extract → chunk → embed → search returns the planted doc") {
    import spark.implicits._
    val docs = Seq(
      (1L, ("catalyst optimizer rules rewrite spark logical plans into physical plans " * 4).trim),
      (2L, ("tomato gardening requires patient watering and rich soil every day " * 4).trim),
      (3L, ("market volatility drives bond yields and equity risk premia lower " * 4).trim))
    val binDocs = docs.map { case (id, t) =>
      (id, t.getBytes(StandardCharsets.UTF_8), t.length.toLong)
    }.toDF("doc_id", "content", "filesize")

    // E2: OCR seam + LPT placement, keyed (not positional) texts
    val texts = OcrPipeline.extractText(spark, binDocs, TextPartitioner(), parallelism = 2)

    // chunk (generator, min-length filter) with "i_j" ids
    val chunks = Inference.chunkDocuments(spark, texts, width = 120, minChars = 20)
    assert(chunks.count() > 3)    // every doc chunked into several pieces

    // E3: batched inference, then index + search (U10/U11)
    val embedder = HashingEmbedder(dim = 64)
    val index = Inference.embedChunks(chunks, embedder, batchSize = 2).toDF()
    val hits = VectorSearch.searchText(index, "embedding", "chunk_id",
        "spark catalyst optimizer physical plans", embedder, k = 3)
      .select($"doc_id").as[Long].collect()

    assert(hits.nonEmpty)
    assert(hits.head === 1L)                       // planted doc ranks first
    assert(hits.take(3).count(_ == 1L) >= 2)       // its chunks dominate top-3

    // determinism: the whole flow reruns to identical results
    val again = VectorSearch.searchText(index, "embedding", "chunk_id",
        "spark catalyst optimizer physical plans", embedder, k = 3)
      .select($"doc_id").as[Long].collect()
    assert(again.toSeq === hits.toSeq)
  }
}
