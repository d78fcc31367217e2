package graft.pipeline

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets
import java.nio.file.Files
import java.util.concurrent.atomic.AtomicInteger

import com.sun.net.httpserver.HttpServer
import graft.SparkSpec
import org.scalatest.BeforeAndAfterAll

/** The PRODUCTION seams composed end-to-end — one test driving
  * fetch (HttpFetcher against a live local server) → OCR seam →
  * chunk → embed (HttpEmbedder against a live JSON endpoint) →
  * index → searchText, asserted row-identical to the deterministic
  * golden path (LocalFileFetcher-style direct files +
  * HashingEmbedder) over the same corpus. Each seam already has its
  * own spec; this closes the remaining integration risk — the
  * reference's E1→E3 chain (`01-download-pdfs.py` →
  * `03-model-inference-on-chunks.py` → `ocr-tesseract-unstructured
  * .py:167-171`) never runs its stages in isolation.
  *
  * The embed endpoint replays HashingEmbedder server-side, so the
  * HTTP stack's vectors (float → JSON → float, an exact round-trip
  * by Float.toString's shortest-representation guarantee) must equal
  * the in-process golden vectors bit-for-bit — any drift in batching,
  * alignment, or parsing fails the equality.
  */
class ProductionSeamsE2ESpec extends SparkSpec with BeforeAndAfterAll {

  private val Dim = 64
  private val hashing = HashingEmbedder(dim = Dim)
  private val fetchHits = new AtomicInteger(0)
  private val embedCalls = new AtomicInteger(0)
  private val maxBatch = new AtomicInteger(0)
  private var server: HttpServer = _
  private var port: Int = _

  private val corpus: Map[Long, String] = Map(
    1L -> ("distributed join performance depends on shuffle layout and broadcast thresholds. " * 4),
    2L -> ("vector search retrieves nearest neighbors from an embedding index efficiently. " * 4),
    3L -> ("streaming watermarks bound state growth for late arriving events in pipelines. " * 4),
    4L -> ("query optimizers push filters below joins and prune unused columns aggressively. " * 4),
    5L -> ("broadcast joins avoid shuffling the large fact table across the cluster network. " * 4),
    6L -> "too tiny to chunk")

  override def beforeAll(): Unit = {
    super.beforeAll()
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/docs/", ex => {
      val name = ex.getRequestURI.getPath.stripPrefix("/docs/")
      corpus.collectFirst {
        case (id, text) if name == s"doc_$id.pdf" => text
      } match {
        case Some(text) =>
          fetchHits.incrementAndGet()
          val b = text.getBytes(StandardCharsets.UTF_8)
          ex.sendResponseHeaders(200, b.length)
          ex.getResponseBody.write(b)
        case None => ex.sendResponseHeaders(404, -1)
      }
      ex.close()
    })
    server.createContext("/embed", ex => {
      embedCalls.incrementAndGet()
      val in = mapper.readTree(ex.getRequestBody).path("input")
      maxBatch.getAndUpdate(m => math.max(m, in.size()))
      val out = mapper.createObjectNode()
      val data = out.putArray("data")
      (0 until in.size()).foreach { i =>
        val e = data.addObject().putArray("embedding")
        hashing.embedOne(in.get(i).asText()).foreach(e.add)
      }
      val b = mapper.writeValueAsString(out).getBytes(StandardCharsets.UTF_8)
      ex.getResponseHeaders.add("Content-Type", "application/json")
      ex.sendResponseHeaders(200, b.length)
      ex.getResponseBody.write(b)
      ex.close()
    })
    server.start()
    port = server.getAddress.getPort
  }

  override def afterAll(): Unit = {
    server.stop(0)
    super.afterAll()
  }

  test("fetch → OCR → chunk → embed → index → searchText: production stack ≡ golden path") {
    import spark.implicits._
    val query = "broadcast join shuffle performance"
    val httpEmbedder = HttpEmbedder(s"http://127.0.0.1:$port/embed", dim = Dim,
      connectTimeoutMs = 5000, requestTimeoutMs = 5000)

    // ---------- production stack ----------
    val dstDir = Files.createTempDirectory("graft-e2e-prod")
    val work = corpus.keys.toSeq.sorted
      .map(id => (s"http://127.0.0.1:$port/docs/doc_$id.pdf", s"$dstDir/doc_$id.pdf"))
      .toDF("url", "filename")
    val done = Seq.empty[String].toDF("filename")
    val fetched = Ingest.fetchMissing(spark, work, done, HttpFetcher())
    assert(fetched.filter($"ok").count() === corpus.size.toLong)
    assert(fetchHits.get() === corpus.size)

    // idempotency across the composed stack: a re-run fetches nothing
    Ingest.fetchMissing(spark, work, done, HttpFetcher())
    assert(fetchHits.get() === corpus.size)

    val bin = OcrPipeline.readBinaryDocs(spark, dstDir.toString)
    val text = OcrPipeline.extractText(spark, bin, TextPartitioner(), parallelism = 2)
    val chunks = Inference.chunkDocuments(spark, text)
    // small batch to force several POSTs through the cap logic
    val embedded = Inference.embedChunks(chunks, httpEmbedder, batchSize = 4)
    val index = embedded.toDF().select($"chunk_id", $"embedding")
    val prod = VectorSearch.searchText(index, "embedding", "chunk_id",
        query, httpEmbedder, k = 5)
      .select($"chunk_id", $"sim").as[(String, Double)].collect().toSeq
    assert(embedCalls.get() >= 2 && maxBatch.get() <= 150)

    // ---------- golden deterministic path, same corpus ----------
    val goldDir = Files.createTempDirectory("graft-e2e-gold")
    corpus.foreach { case (id, t) =>
      Files.write(goldDir.resolve(s"doc_$id.pdf"), t.getBytes(StandardCharsets.UTF_8))
    }
    val gBin = OcrPipeline.readBinaryDocs(spark, goldDir.toString)
    val gText = OcrPipeline.extractText(spark, gBin, TextPartitioner(), parallelism = 2)
    val gChunks = Inference.chunkDocuments(spark, gText)
    val gIndex = Inference.embedChunks(gChunks, hashing)
      .toDF().select($"chunk_id", $"embedding")
    val golden = VectorSearch.searchText(gIndex, "embedding", "chunk_id",
        query, hashing, k = 5)
      .select($"chunk_id", $"sim").as[(String, Double)].collect().toSeq

    // row-identical: same chunk ids, same similarity DOUBLES, same order
    assert(prod === golden)
    assert(prod.size === 5 && prod.head._2 > 0.0)
    // the HTTP vectors themselves are bit-identical to in-process ones
    val prodVecs = index.as[(String, Array[Float])].collect().toMap
    val goldVecs = gIndex.as[(String, Array[Float])].collect().toMap
    assert(prodVecs.keySet === goldVecs.keySet)
    assert(prodVecs.forall { case (id, v) => v.toSeq == goldVecs(id).toSeq })
  }
}
