package graft.pipeline

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets
import java.nio.file.Files
import java.util.concurrent.atomic.AtomicInteger

import com.sun.net.httpserver.HttpServer
import graft.SparkSpec
import org.scalatest.BeforeAndAfterAll

/** [[HttpFetcher]] against a real local HTTP server (JDK built-in),
  * covering the reference's download semantics
  * (`01-download-pdfs.py:105-120`): 200 → bytes persisted, non-200 →
  * None and no file, connection failure → None, exists → skip
  * without re-fetching.
  */
class HttpFetcherSpec extends SparkSpec with BeforeAndAfterAll {

  private val hits = new AtomicInteger(0)
  private var server: HttpServer = _
  private var port: Int = _
  private val body = "fake pdf bytes for the fetcher"

  override def beforeAll(): Unit = {
    super.beforeAll()
    server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/ok.pdf", ex => {
      hits.incrementAndGet()
      val b = body.getBytes(StandardCharsets.UTF_8)
      ex.sendResponseHeaders(200, b.length)
      ex.getResponseBody.write(b)
      ex.close()
    })
    server.createContext("/gone.pdf", ex => {
      ex.sendResponseHeaders(404, -1)
      ex.close()
    })
    server.start()
    port = server.getAddress.getPort
  }

  override def afterAll(): Unit = {
    server.stop(0)
    super.afterAll()
  }

  test("200 → file persisted atomically, size returned; repeat skips the network") {
    val dst = Files.createTempDirectory("graft-http").resolve("sub/ok.pdf")
    val f = HttpFetcher()
    assert(f.fetch(s"http://127.0.0.1:$port/ok.pdf", dst.toString) === Some(body.length.toLong))
    assert(new String(Files.readAllBytes(dst), StandardCharsets.UTF_8) === body)
    assert(hits.get() === 1)
    // idempotent: exists → no second request (ref :100-101)
    assert(f.fetch(s"http://127.0.0.1:$port/ok.pdf", dst.toString) === Some(body.length.toLong))
    assert(hits.get() === 1)
    // no temp droppings
    assert(Files.list(dst.getParent).count() === 1)
  }

  test("non-200 → None and no file left behind") {
    val dst = Files.createTempDirectory("graft-http").resolve("gone.pdf")
    assert(HttpFetcher().fetch(s"http://127.0.0.1:$port/gone.pdf", dst.toString) === None)
    assert(!Files.exists(dst))
    assert(Files.list(dst.getParent).count() === 0)
  }

  test("connection refused / bad url → None") {
    val dst = Files.createTempDirectory("graft-http").resolve("x.pdf")
    assert(HttpFetcher(connectTimeoutMs = 500, requestTimeoutMs = 500)
      .fetch("http://127.0.0.1:1/x.pdf", dst.toString) === None)
    assert(HttpFetcher().fetch("not a url", dst.toString) === None)
  }

  test("fetchMissing drives HttpFetcher over executors (S9 end-to-end)") {
    import spark.implicits._
    val dstDir = Files.createTempDirectory("graft-http-dst")
    val work = Seq(
      (s"http://127.0.0.1:$port/ok.pdf", s"$dstDir/a.pdf"),
      (s"http://127.0.0.1:$port/gone.pdf", s"$dstDir/b.pdf")
    ).toDF("url", "filename")
    val done = Seq.empty[String].toDF("filename")
    val res = Ingest.fetchMissing(spark, work, done, HttpFetcher())
      .collect().map(r => r.getString(1) -> ((Option(r.get(2)), r.getBoolean(3)))).toMap
    assert(res(s"$dstDir/a.pdf") === ((Some(body.length.toLong), true)))
    assert(res(s"$dstDir/b.pdf") === ((None, false)))
    assert(Files.exists(dstDir.resolve("a.pdf")))
    assert(!Files.exists(dstDir.resolve("b.pdf")))
  }
}
