package graft.pipeline

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets
import java.util.concurrent.atomic.AtomicInteger

import com.sun.net.httpserver.HttpServer
import graft.SparkSpec
import org.scalatest.BeforeAndAfterAll

/** [[HttpEmbedder]] against a real local JSON endpoint (JDK built-in
  * server), covering the reference's model-serving semantics
  * (`03-model-inference-on-chunks.py:96-109`): batched POST of ≤150
  * inputs, aligned response vectors, and the null-on-failure contract
  * (timeout / non-200 / malformed response → null vectors, task
  * survives).
  */
class HttpEmbedderSpec extends SparkSpec with BeforeAndAfterAll {

  private val requests = new AtomicInteger(0)
  private val maxBatch = new AtomicInteger(0)
  private var server: HttpServer = _
  private var port: Int = _
  private val dim = 4

  /** Echo embedder: vector j of text i is (len(text_i) + j). */
  override def beforeAll(): Unit = {
    super.beforeAll()
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/embed", ex => {
      requests.incrementAndGet()
      val in = mapper.readTree(ex.getRequestBody).path("input")
      maxBatch.getAndUpdate(m => math.max(m, in.size()))
      val out = mapper.createObjectNode()
      val data = out.putArray("data")
      (0 until in.size()).foreach { i =>
        val e = data.addObject().putArray("embedding")
        (0 until dim).foreach(j => e.add(in.get(i).asText().length.toFloat + j))
      }
      val b = mapper.writeValueAsString(out).getBytes(StandardCharsets.UTF_8)
      ex.getResponseHeaders.add("Content-Type", "application/json")
      ex.sendResponseHeaders(200, b.length)
      ex.getResponseBody.write(b)
      ex.close()
    })
    server.createContext("/down", ex => { ex.sendResponseHeaders(503, -1); ex.close() })
    server.createContext("/short", ex => {
      // one embedding regardless of input count → mis-sized response
      val b = """{"data":[{"embedding":[1,2,3,4]}]}""".getBytes(StandardCharsets.UTF_8)
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

  private def embedder(path: String = "/embed", cap: Int = 150) =
    HttpEmbedder(s"http://127.0.0.1:$port$path", dim = dim, batchCap = cap,
      connectTimeoutMs = 2000, requestTimeoutMs = 2000)

  test("one batch, aligned vectors") {
    val vecs = embedder().embed(Seq("a", "bbb"))
    assert(vecs.map(_.toSeq) == Seq(Seq(1f, 2f, 3f, 4f), Seq(3f, 4f, 5f, 6f)))
  }

  test("batches above the cap are re-split; every request honors ≤cap") {
    requests.set(0); maxBatch.set(0)
    val texts = (1 to 340).map(i => "x" * (i % 7 + 1))
    val vecs = embedder(cap = 150).embed(texts)
    assert(vecs.size == 340)
    assert(requests.get() == 3)           // 150 + 150 + 40
    assert(maxBatch.get() <= 150)
    assert(vecs.zip(texts).forall { case (v, t) => v(0) == t.length.toFloat })
  }

  test("non-200 → null vectors, aligned, no throw") {
    val vecs = embedder("/down").embed(Seq("a", "b", "c"))
    assert(vecs.size == 3)
    assert(vecs.forall(_ == null))
  }

  test("mis-sized response → null vectors (never misaligned)") {
    val vecs = embedder("/short").embed(Seq("a", "b"))
    assert(vecs.size == 2)
    assert(vecs.forall(_ == null))
  }

  test("connection refused → null vectors") {
    val e = HttpEmbedder(s"http://127.0.0.1:1/embed", dim = dim,
      connectTimeoutMs = 300, requestTimeoutMs = 300)
    assert(e.embed(Seq("a")) == Seq(null))
  }

  test("drives Inference.embedChunks over executors (U9 end-to-end)") {
    import spark.implicits._
    val chunks = (0L until 10L).map(i => Chunk(i, 0, s"${i}_0", "t" * (i.toInt + 1)))
      .toDS()
    val out = Inference.embedChunks(chunks, embedder(), batchSize = 4)
      .collect().sortBy(_.doc_id)
    assert(out.length == 10)
    assert(out.forall(c => c.embedding(0) == c.chunk.length.toFloat))
  }
}
