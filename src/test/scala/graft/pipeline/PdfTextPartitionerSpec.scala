package graft.pipeline

import java.nio.charset.StandardCharsets

import org.scalatest.funsuite.AnyFunSuite

/** Pure-JVM PDF text extraction: fixture PDFs are generated in-test
  * (raw and FlateDecode content streams — no binary, no external
  * file), covering the content-stream operator surface (Tj, TJ with
  * kerning, ', hex strings, escapes/octal/nesting) and the failure
  * contract on junk/corrupt input.
  */
class PdfTextPartitionerSpec extends AnyFunSuite {

  private def deflate(b: Array[Byte]): Array[Byte] = {
    val d = new java.util.zip.Deflater()
    d.setInput(b); d.finish()
    val out = new java.io.ByteArrayOutputStream()
    val buf = new Array[Byte](8192)
    while (!d.finished()) out.write(buf, 0, d.deflate(buf))
    d.end()
    out.toByteArray
  }

  /** Minimal single-page PDF around the given content stream. */
  private def pdf(contentStream: String, compress: Boolean): Array[Byte] = {
    val data =
      if (compress) deflate(contentStream.getBytes(StandardCharsets.ISO_8859_1))
      else contentStream.getBytes(StandardCharsets.ISO_8859_1)
    val filter = if (compress) "/Filter /FlateDecode " else ""
    val bos = new java.io.ByteArrayOutputStream()
    def w(s: String): Unit = bos.write(s.getBytes(StandardCharsets.ISO_8859_1))
    w("%PDF-1.4\n")
    w("1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj\n")
    w("2 0 obj << /Type /Pages /Kids [3 0 R] /Count 1 >> endobj\n")
    w("3 0 obj << /Type /Page /Parent 2 0 R /Contents 4 0 R " +
      "/Resources << /Font << /F1 5 0 R >> >> >> endobj\n")
    w(s"4 0 obj << $filter/Length ${data.length} >>\nstream\n")
    bos.write(data)
    w("\nendstream endobj\n")
    w("5 0 obj << /Type /Font /Subtype /Type1 /BaseFont /Helvetica >> endobj\n")
    w("trailer << /Root 1 0 R >>\n%%EOF\n")
    bos.toByteArray
  }

  private val p = PdfTextPartitioner()

  test("raw content stream: Tj text comes out verbatim") {
    val doc = pdf("BT /F1 12 Tf 72 720 Td (Hello graft engine) Tj ET", compress = false)
    assert(p.partition(doc, PartitionStrategy.OcrOnly) === Seq("Hello graft engine"))
  }

  test("FlateDecode content stream inflates and extracts identically") {
    val cs = "BT /F1 12 Tf 72 720 Td (Hello graft engine) Tj ET"
    val raw = p.partition(pdf(cs, compress = false), PartitionStrategy.OcrOnly)
    val flate = p.partition(pdf(cs, compress = true), PartitionStrategy.OcrOnly)
    assert(flate === raw)
    assert(flate === Seq("Hello graft engine"))
  }

  test("TJ kerning arrays, hex strings, line-advancing shows, escapes") {
    val cs =
      "BT /F1 12 Tf 72 720 Td [(Spark) -250 ( native)] TJ " +
        "<20656E67696E65> Tj " +                   // " engine", same line
        "(next line) ' " +
        "0 -14 Td (esc \\(parens\\) \\134 and octal \\101) Tj ET"
    val got = p.partition(pdf(cs, compress = true), PartitionStrategy.OcrOnly)
    assert(got.size === 1)
    val lines = got.head.split("\n").toSeq
    assert(lines(0) === "Spark native engine")
    assert(lines(1) === "next line")
    assert(lines(2) === "esc (parens) \\ and octal A")
  }

  test("nested parens and multi-stream documents: one element per " +
    "text-bearing stream; textless streams drop") {
    // two content streams + one binary (textless) stream
    val bos = new java.io.ByteArrayOutputStream()
    def w(s: String): Unit = bos.write(s.getBytes(StandardCharsets.ISO_8859_1))
    w("%PDF-1.4\n")
    w("4 0 obj << /Length 34 >>\nstream\nBT ((nested (deep)) ok) Tj ET\nendstream endobj\n")
    val bin = deflate(Array.tabulate[Byte](64)(_.toByte))
    w(s"6 0 obj << /Filter /FlateDecode /Length ${bin.length} >>\nstream\n")
    bos.write(bin)
    w("\nendstream endobj\n")
    w("7 0 obj << /Length 20 >>\nstream\nBT (page two) Tj ET\nendstream endobj\n")
    w("%%EOF\n")
    val got = p.partition(bos.toByteArray, PartitionStrategy.OcrOnly)
    assert(got === Seq("(nested (deep)) ok", "page two"))
  }

  test("failure contract: non-PDF bytes, corrupt flate, truncated stream") {
    assert(p.partition(null, PartitionStrategy.OcrOnly) === Seq.empty)
    assert(p.partition("not a pdf".getBytes, PartitionStrategy.OcrOnly) === Seq.empty)
    // corrupt flate payload: stream skipped, no throw
    val bos = new java.io.ByteArrayOutputStream()
    def w(s: String): Unit = bos.write(s.getBytes(StandardCharsets.ISO_8859_1))
    w("%PDF-1.4\n5 0 obj << /Filter /FlateDecode /Length 8 >>\nstream\n")
    bos.write(Array[Byte](1, 2, 3, 4, 5, 6, 7, 8))
    w("\nendstream endobj\n%%EOF\n")
    assert(p.partition(bos.toByteArray, PartitionStrategy.OcrOnly) === Seq.empty)
    // stream with no endstream: skipped, no throw
    val t = "%PDF-1.4\n5 0 obj << /Length 4 >>\nstream\nBT (x"
    assert(p.partition(t.getBytes, PartitionStrategy.OcrOnly) === Seq.empty)
  }

  test("filters outside the subset are skipped, not misparsed") {
    val bos = new java.io.ByteArrayOutputStream()
    def w(s: String): Unit = bos.write(s.getBytes(StandardCharsets.ISO_8859_1))
    w("%PDF-1.4\n5 0 obj << /Filter /DCTDecode /Length 10 >>\nstream\n")
    bos.write("(fake) Tj ".getBytes(StandardCharsets.ISO_8859_1))
    w("\nendstream endobj\n%%EOF\n")
    assert(p.partition(bos.toByteArray, PartitionStrategy.OcrOnly) === Seq.empty)
  }

  test("AutoPartitioner dispatch: PDF magic routes here, other bytes " +
    "fall through, textless PDFs fall through too") {
    val auto = AutoPartitioner(TextPartitioner())
    val doc = pdf("BT (via pdf branch) Tj ET", compress = true)
    assert(auto.partition(doc, PartitionStrategy.OcrOnly) === Seq("via pdf branch"))
    val txt = "plain text\n\nsecond page".getBytes(StandardCharsets.UTF_8)
    assert(auto.partition(txt, PartitionStrategy.OcrOnly) ===
      Seq("plain text", "second page"))
    // a PDF whose only stream is image-like falls through to base
    // (which reads it as UTF-8-ish bytes — non-empty, proving the
    // fall-through happened rather than an empty hard stop)
    val bos = new java.io.ByteArrayOutputStream()
    def w(s: String): Unit = bos.write(s.getBytes(StandardCharsets.ISO_8859_1))
    w("%PDF-1.4\n5 0 obj << /Filter /DCTDecode /Length 4 >>\nstream\n")
    bos.write(Array[Byte](1, 2, 3, 4))
    w("\nendstream endobj\n%%EOF\n")
    assert(auto.partition(bos.toByteArray, PartitionStrategy.OcrOnly).nonEmpty)
  }
}
