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

  // ----- Type0/CID composite fonts with ToUnicode CMaps (the shape
  // of modern subset-TrueType PDFs — the reference's arXiv corpus)

  test("Type0/Identity-H: 2-byte hex show strings decode through the " +
    "ToUnicode CMap (generator round trip, multi-page)") {
    val text = "Catalyst rewrites logical plans\nTungsten codegen\fpage two here"
    val got = p.partition(PdfGen.type0(text), PartitionStrategy.OcrOnly)
    assert(got === Seq(
      "Catalyst rewrites logical plans\nTungsten codegen", "page two here"))
  }

  test("Type0: non-ASCII BMP chars survive the CMap round trip") {
    val text = "métadonnées — Ünïcode ✓"
    val got = p.partition(PdfGen.type0(text), PartitionStrategy.OcrOnly)
    assert(got === Seq(text))
  }

  test("hand-built CMap: bfrange start form increments the last " +
    "UTF-16 unit, array form maps per code, bfchar maps ligatures " +
    "to multi-char expansions") {
    val cmap =
      """begincmap
        |1 begincodespacerange
        |<0000> <FFFF>
        |endcodespacerange
        |1 beginbfchar
        |<0001> <00660069>
        |endbfchar
        |2 beginbfrange
        |<0010> <0012> <0041>
        |<0020> <0021> [<005A> <0079>]
        |endbfrange
        |endcmap""".stripMargin
    val parsed = PdfTextPartitioner.parseCMap(cmap, composite = true).get
    assert(parsed.codeBytes === 2)
    assert(parsed.map(0x0001) === "fi")              // ligature expansion
    assert(parsed.map(0x0010) === "A")
    assert(parsed.map(0x0011) === "B")
    assert(parsed.map(0x0012) === "C")
    assert(parsed.map(0x0020) === "Z")
    assert(parsed.map(0x0021) === "y")
  }

  test("full document with a hand-built raw ToUnicode stream: Tf " +
    "switches decoding between the composite and the simple font") {
    val cmap = "begincmap\n1 begincodespacerange\n<0000> <FFFF>\n" +
      "endcodespacerange\n2 beginbfchar\n<0003> <0048>\n<0007> <0069>\n" +
      "endbfchar\nendcmap"
    val bos = new java.io.ByteArrayOutputStream()
    def w(s: String): Unit = bos.write(s.getBytes(StandardCharsets.ISO_8859_1))
    w("%PDF-1.5\n")
    w("3 0 obj << /Type /Page /Contents 4 0 R /Resources << /Font " +
      "<< /F1 5 0 R /F2 8 0 R >> >> >> endobj\n")
    // F1 composite shows <0003 0007> -> "Hi"; F2 simple shows bytes
    val cs = "BT /F1 12 Tf <00030007> Tj /F2 10 Tf ( there) Tj ET"
    w(s"4 0 obj << /Length ${cs.length} >>\nstream\n$cs\nendstream endobj\n")
    w("5 0 obj << /Type /Font /Subtype /Type0 /Encoding /Identity-H " +
      "/ToUnicode 7 0 R >> endobj\n")
    w(s"7 0 obj << /Length ${cmap.length} >>\nstream\n$cmap\nendstream endobj\n")
    w("8 0 obj << /Type /Font /Subtype /Type1 /BaseFont /Courier >> endobj\n")
    w("%%EOF\n")
    val got = p.partition(bos.toByteArray, PartitionStrategy.OcrOnly)
    assert(got === Seq("Hi there"))
  }

  test("Type0 WITHOUT a ToUnicode CMap yields no text (glyph ids are " +
    "not text) and AutoPartitioner falls through to the OCR seam") {
    val bos = new java.io.ByteArrayOutputStream()
    def w(s: String): Unit = bos.write(s.getBytes(StandardCharsets.ISO_8859_1))
    w("%PDF-1.5\n")
    w("3 0 obj << /Type /Page /Contents 4 0 R /Resources << /Font " +
      "<< /F1 5 0 R >> >> >> endobj\n")
    val cs = "BT /F1 12 Tf <00030007> Tj ET"
    w(s"4 0 obj << /Length ${cs.length} >>\nstream\n$cs\nendstream endobj\n")
    w("5 0 obj << /Type /Font /Subtype /Type0 /Encoding /Identity-H >> endobj\n")
    w("%%EOF\n")
    val doc = bos.toByteArray
    // a CMap-less composite font contributes nothing: CIDs are glyph
    // ids, not characters, so the document must fall through to OCR
    assert(p.partition(doc, PartitionStrategy.OcrOnly) === Seq.empty)
    val (_, path) = AutoPartitioner(TextPartitioner())
      .partitionWithPath(doc, PartitionStrategy.OcrOnly)
    assert(path === ExtractPath.PdfFallback)
  }

  test("Type0 WITHOUT a CMap suppresses glyph ids ABOVE the control range too " +
    "(raw Latin-1 fallback would leak printable garbage)") {
    val bos = new java.io.ByteArrayOutputStream()
    def w(s: String): Unit = bos.write(s.getBytes(StandardCharsets.ISO_8859_1))
    w("%PDF-1.5\n")
    w("3 0 obj << /Type /Page /Contents 4 0 R /Resources << /Font " +
      "<< /F1 5 0 R >> >> >> endobj\n")
    // CIDs 0x0041/0x0042: the low bytes are printable 'A'/'B', so a
    // raw fallback would emit " A B" and trim would KEEP it
    val cs = "BT /F1 12 Tf <00410042> Tj ET"
    w(s"4 0 obj << /Length ${cs.length} >>\nstream\n$cs\nendstream endobj\n")
    w("5 0 obj << /Type /Font /Subtype /Type0 /Encoding /Identity-H >> endobj\n")
    w("%%EOF\n")
    val doc = bos.toByteArray
    assert(p.partition(doc, PartitionStrategy.OcrOnly) === Seq.empty)
    val (_, path) = AutoPartitioner(TextPartitioner())
      .partitionWithPath(doc, PartitionStrategy.OcrOnly)
    assert(path === ExtractPath.PdfFallback)
  }

  test("indirect '/Length N 0 R' with a multi-digit object number never " +
    "truncates the stream (regex backtracking regression)") {
    val bos = new java.io.ByteArrayOutputStream()
    def w(s: String): Unit = bos.write(s.getBytes(StandardCharsets.ISO_8859_1))
    w("%PDF-1.5\n")
    w("3 0 obj << /Type /Page /Contents 4 0 R >> endobj\n")
    // '/Length 102 0 R': a backtracking match would read length=10 and
    // truncate the 29-byte stream to its first 10 bytes
    val cs = "BT (indirect length body) Tj ET"
    w(s"4 0 obj << /Length 102 0 R >>\nstream\n$cs\nendstream endobj\n")
    w(s"102 0 obj ${cs.length} endobj\n")
    w("%%EOF\n")
    assert(p.partition(bos.toByteArray, PartitionStrategy.OcrOnly) ===
      Seq("indirect length body"))
  }

  test("ASCII 'N M obj…endobj' bytes INSIDE a stream payload cannot clobber " +
    "a real object (phantom-object regression)") {
    val cmap = "begincmap\n1 begincodespacerange\n<0000> <FFFF>\n" +
      "endcodespacerange\n1 beginbfchar\n<0003> <0058>\nendbfchar\nendcmap"
    val bos = new java.io.ByteArrayOutputStream()
    def w(s: String): Unit = bos.write(s.getBytes(StandardCharsets.ISO_8859_1))
    w("%PDF-1.5\n")
    w("3 0 obj << /Type /Page /Contents 4 0 R /Resources << /Font " +
      "<< /F1 5 0 R >> >> >> endobj\n")
    val cs = "BT /F1 12 Tf <0003> Tj ET"
    w(s"4 0 obj << /Length ${cs.length} >>\nstream\n$cs\nendstream endobj\n")
    w("5 0 obj << /Type /Font /Subtype /Type0 /Encoding /Identity-H " +
      "/ToUnicode 7 0 R >> endobj\n")
    // a RAW stream whose payload happens to spell an object header for
    // number 7 — under payload-blind scanning it would overwrite the
    // real ToUnicode object below with garbage
    val evil = "7 0 obj << /Junk true >> endobj"
    w(s"6 0 obj << /Length ${evil.length} >>\nstream\n$evil\nendstream endobj\n")
    w(s"7 0 obj << /Length ${cmap.length} >>\nstream\n$cmap\nendstream endobj\n")
    w("%%EOF\n")
    assert(p.partition(bos.toByteArray, PartitionStrategy.OcrOnly)
      .exists(_.contains("X")), "real ToUnicode object was clobbered by payload bytes")
  }

  test("indirect /Font resource dictionary resolves through the " +
    "object table") {
    val cmap = "begincmap\n1 begincodespacerange\n<0000> <FFFF>\n" +
      "endcodespacerange\n1 beginbfchar\n<0041> <0058>\nendbfchar\nendcmap"
    val bos = new java.io.ByteArrayOutputStream()
    def w(s: String): Unit = bos.write(s.getBytes(StandardCharsets.ISO_8859_1))
    w("%PDF-1.5\n")
    w("3 0 obj << /Type /Page /Contents 4 0 R /Resources << /Font 9 0 R >> >> endobj\n")
    val cs = "BT /F1 12 Tf <0041> Tj ET"
    w(s"4 0 obj << /Length ${cs.length} >>\nstream\n$cs\nendstream endobj\n")
    w("5 0 obj << /Type /Font /Subtype /Type0 /Encoding /Identity-H " +
      "/ToUnicode 7 0 R >> endobj\n")
    w(s"7 0 obj << /Length ${cmap.length} >>\nstream\n$cmap\nendstream endobj\n")
    w("9 0 obj << /F1 5 0 R >> endobj\n")
    w("%%EOF\n")
    assert(p.partition(bos.toByteArray, PartitionStrategy.OcrOnly) === Seq("X"))
  }

  // ----- DecodeParms predictors on Flate streams

  test("PNG Up predictor (/Predictor 12) content stream round-trips " +
    "through the generator") {
    val text = "predicted content stream line one\nand a second line"
    val got = p.partition(PdfGen.predictorFlate(text), PartitionStrategy.OcrOnly)
    assert(got === Seq(text))
  }

  test("PNG Sub + None predictor rows decode; TIFF predictor 2 decodes") {
    val cs = "BT (pq) Tj ET"   // 13 bytes
    // PNG, columns=13: one row, filter 1 (Sub): out[k]=raw[k]+out[k-1]
    val raw = cs.getBytes(StandardCharsets.ISO_8859_1)
    val sub = new Array[Byte](raw.length + 1)
    sub(0) = 1
    for (k <- raw.indices)
      sub(k + 1) = if (k == 0) raw(0) else ((raw(k) & 0xff) - (raw(k - 1) & 0xff)).toByte
    def doc(enc: Array[Byte], parms: String): Array[Byte] = {
      val data = deflate(enc)
      val bos = new java.io.ByteArrayOutputStream()
      def w(s: String): Unit = bos.write(s.getBytes(StandardCharsets.ISO_8859_1))
      w("%PDF-1.5\n")
      w(s"4 0 obj << /Filter /FlateDecode /DecodeParms << $parms >> " +
        s"/Length ${data.length} >>\nstream\n")
      bos.write(data)
      w("\nendstream endobj\n%%EOF\n")
      bos.toByteArray
    }
    assert(p.partition(doc(sub, "/Predictor 15 /Columns 13"),
      PartitionStrategy.OcrOnly) === Seq("pq"))
    // TIFF predictor 2, columns = full length: horizontal differencing
    val tiff = new Array[Byte](raw.length)
    tiff(0) = raw(0)
    for (k <- 1 until raw.length)
      tiff(k) = ((raw(k) & 0xff) - (raw(k - 1) & 0xff)).toByte
    assert(p.partition(doc(tiff, s"/Predictor 2 /Columns ${raw.length}"),
      PartitionStrategy.OcrOnly) === Seq("pq"))
  }

  test("/Length bounds win over the EOL-trim heuristic: a deflate " +
    "payload ending in a CR byte keeps its last byte") {
    // find a content stream whose DEFLATE output ends with 0x0D — the
    // case where trimming 'one \\n then one \\r' before endstream eats
    // a real data byte and the whole stream fails to inflate
    // (observed in the q344 audit: doc 496's container lost its text)
    val base = "BT /F1 12 Tf (length bounded payload) Tj ET"
    val cs = Iterator.iterate(base)(_ + " ")
      .take(4096).find(c => deflate(c.getBytes(StandardCharsets.ISO_8859_1)).last == 0x0D)
      .getOrElse(fail("no CR-terminated deflate found in 4096 tries"))
    val data = deflate(cs.getBytes(StandardCharsets.ISO_8859_1))
    val bos = new java.io.ByteArrayOutputStream()
    def w(s: String): Unit = bos.write(s.getBytes(StandardCharsets.ISO_8859_1))
    w("%PDF-1.5\n")
    w(s"4 0 obj << /Filter /FlateDecode /Length ${data.length} >>\nstream\n")
    bos.write(data)
    w("\nendstream endobj\n%%EOF\n")
    assert(p.partition(bos.toByteArray, PartitionStrategy.OcrOnly) ===
      Seq("length bounded payload"))
  }

  test("malformed predictor streams are skipped, never half-decoded") {
    // truncated: data length not a row multiple
    val data = deflate(Array[Byte](2, 10, 20, 30, 2, 5))   // stride 4, 6 bytes
    val bos = new java.io.ByteArrayOutputStream()
    def w(s: String): Unit = bos.write(s.getBytes(StandardCharsets.ISO_8859_1))
    w("%PDF-1.5\n")
    w(s"4 0 obj << /Filter /FlateDecode /DecodeParms << /Predictor 12 " +
      s"/Columns 3 >> /Length ${data.length} >>\nstream\n")
    bos.write(data)
    w("\nendstream endobj\n%%EOF\n")
    assert(p.partition(bos.toByteArray, PartitionStrategy.OcrOnly) === Seq.empty)
  }

  // ----- non-Flate stream filters (LZW, ASCIIHex, ASCII85, chains)

  test("LZW decoder: hand-derived 9-bit code vector (256,45,258,65,260," +
    "66,262,257 for bytes 45*3 65*3 66*3) decodes exactly") {
    // greedy LZW over 45 45 45 65 65 65 66 66 66: clear, literal 45,
    // (45,45)=258, literal 65, (65,65)=260, literal 66, (66,66)=262,
    // EOD — packed MSB-first into 80 0B 60 44 18 21 0A 0D 01
    val enc = Array(0x80, 0x0B, 0x60, 0x44, 0x18, 0x21, 0x0A, 0x0D, 0x01)
      .map(_.toByte)
    val got = PdfTextPartitioner.lzwDecode(enc, earlyChange = 1)
    assert(got.map(_.toSeq) ===
      Some(Seq[Byte](45, 45, 45, 65, 65, 65, 66, 66, 66)))
  }

  test("LZW decoder matches the JDK's independent TIFF-LZW encoder " +
    "(TIFF LZW ≡ PDF LZW with EarlyChange=1) across width boundaries") {
    // a 128x128 gray image = 16 KiB of structured pixels — enough
    // dictionary growth to cross the 9→10→11-bit code boundaries
    val w = 128; val h = 128
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    val px = Array.tabulate(w * h)(i =>
      (((i % w) * 7 + (i / w) * 13 + (i % 11) * 31) % 256).toByte)
    img.getRaster.setDataElements(0, 0, w, h, px)
    val bos = new java.io.ByteArrayOutputStream()
    val writer = javax.imageio.ImageIO.getImageWritersByFormatName("TIFF").next()
    val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
    writer.setOutput(ios)
    val prm = writer.getDefaultWriteParam
    prm.setCompressionMode(javax.imageio.ImageWriteParam.MODE_EXPLICIT)
    prm.setCompressionType("LZW")
    writer.write(null, new javax.imageio.IIOImage(img, null, null), prm)
    ios.close(); writer.dispose()
    val tif = bos.toByteArray
    // minimal TIFF walk: II/MM byte order, IFD entries for strip
    // offsets (273), counts (279), compression (259), predictor (317)
    val le = tif(0) == 'I'
    def u16(o: Int) =
      if (le) (tif(o) & 0xff) | ((tif(o + 1) & 0xff) << 8)
      else ((tif(o) & 0xff) << 8) | (tif(o + 1) & 0xff)
    def u32(o: Int): Long =
      if (le) (tif(o) & 0xffL) | ((tif(o + 1) & 0xffL) << 8) |
        ((tif(o + 2) & 0xffL) << 16) | ((tif(o + 3) & 0xffL) << 24)
      else ((tif(o) & 0xffL) << 24) | ((tif(o + 1) & 0xffL) << 16) |
        ((tif(o + 2) & 0xffL) << 8) | (tif(o + 3) & 0xffL)
    val ifd = u32(4).toInt
    val n = u16(ifd)
    var offsets = Seq.empty[Int]; var counts = Seq.empty[Int]
    var compression = -1; var predictor = 1
    for (k <- 0 until n) {
      val e = ifd + 2 + 12 * k
      val tag = u16(e); val typ = u16(e + 2); val cnt = u32(e + 4).toInt
      def values: Seq[Int] = {
        val sz = if (typ == 3) 2 else 4
        val vo = if (cnt * sz <= 4) e + 8 else u32(e + 8).toInt
        (0 until cnt).map(i => if (typ == 3) u16(vo + 2 * i) else u32(vo + 4 * i).toInt)
      }
      tag match {
        case 273 => offsets = values
        case 279 => counts = values
        case 259 => compression = values.head
        case 317 => predictor = values.head
        case _ => ()
      }
    }
    assert(compression === 5, "JDK writer did not produce LZW")
    val strips = offsets.zip(counts).map { case (o, c) =>
      PdfTextPartitioner.lzwDecode(
        java.util.Arrays.copyOfRange(tif, o, o + c), earlyChange = 1)
        .getOrElse(fail(s"strip at $o failed to LZW-decode"))
    }
    var decoded = strips.toArray.flatten
    if (predictor == 2) {
      // horizontal differencing per row (the same TIFF predictor the
      // /DecodeParms leg reverses)
      val out = decoded.clone()
      for (r <- 0 until h; k <- 1 until w)
        out(r * w + k) = ((out(r * w + k) + out(r * w + k - 1)) & 0xff).toByte
      decoded = out
    }
    assert(decoded.length === px.length)
    assert(decoded.toSeq === px.toSeq,
      "LZW decode disagrees with the JDK TIFF encoder")
  }

  test("LZW encoder/decoder round-trip crosses the 10-bit boundary " +
    "and a full-table clear-free run stays exact") {
    val data = Array.tabulate(40000)(i =>
      (((i * i) % 251 + (i % 17) * 3) % 256).toByte)
    val enc = PdfGen.lzwEncode(data)
    assert(PdfTextPartitioner.lzwDecode(enc).map(_.toSeq) === Some(data.toSeq))
  }

  test("ASCIIHex decode: whitespace, EOD '>', odd-digit padding, junk → None") {
    def d(s: String) = PdfTextPartitioner.asciiHexDecode(
      s.getBytes(StandardCharsets.ISO_8859_1)).map(b =>
      new String(b, StandardCharsets.ISO_8859_1))
    assert(d("48 65 6C 6C 6F>") === Some("Hello"))
    assert(d("48656C6C6F") === Some("Hello"))
    assert(d("7>") === Some("p"))                 // odd digit pads 0 → 0x70
    assert(d("4 8 6 5>") === Some("He"))
    assert(d("48!65>") === None)
  }

  test("ASCII85 decode: Wikipedia Leviathan prefix, z shortcut, partial " +
    "groups, '~>' EOD, round-trip with the fixture encoder") {
    def d(s: String) = PdfTextPartitioner.ascii85Decode(
      s.getBytes(StandardCharsets.ISO_8859_1)).map(b =>
      new String(b, StandardCharsets.ISO_8859_1))
    assert(d("9jqo^~>") === Some("Man "))         // the canonical vector
    assert(d("z~>") === Some("\u0000\u0000\u0000\u0000"))
    assert(d("v~>") === None)                     // out of range
    val payloads = Seq("a", "ab", "abc", "abcd", "abcde",
      "The quick brown fox jumps over the lazy dog")
    for (p <- payloads) {
      val enc = PdfGen.ascii85Encode(p.getBytes(StandardCharsets.ISO_8859_1))
      assert(PdfTextPartitioner.ascii85Decode(enc).map(b =>
        new String(b, StandardCharsets.ISO_8859_1)) === Some(p), s"payload '$p'")
    }
  }

  test("RunLengthDecode: literal runs, repeat runs, EOD, truncated runs → None; " +
    "and a RunLength content stream extracts end-to-end") {
    def d(b: Array[Byte]) = PdfTextPartitioner.runLengthDecode(b).map(_.toSeq)
    // literal run of 3 ("abc"), repeat run of 4 ('x'), EOD
    val enc = Array[Byte](2, 'a', 'b', 'c', (257 - 4 + 256).toByte, 'x', 128.toByte)
    assert(d(enc) === Some("abcxxxx".getBytes.toSeq))
    assert(d(Array[Byte](5, 'a')) === None)         // literal run truncated
    assert(d(Array[Byte](200.toByte)) === None)     // repeat run truncated
    // end-to-end: a content stream behind /RunLengthDecode
    def rlEncode(data: Array[Byte]): Array[Byte] = {
      val out = new java.io.ByteArrayOutputStream()
      data.grouped(127).foreach { g =>
        out.write(g.length - 1); out.write(g, 0, g.length)
      }
      out.write(128)
      out.toByteArray
    }
    val cs = "BT (run length page) Tj ET".getBytes(StandardCharsets.ISO_8859_1)
    val bos = new java.io.ByteArrayOutputStream()
    def w(x: String): Unit = bos.write(x.getBytes(StandardCharsets.ISO_8859_1))
    val data = rlEncode(cs)
    w("%PDF-1.4\n")
    w(s"4 0 obj << /Filter /RunLengthDecode /Length ${data.length} >>\nstream\n")
    bos.write(data)
    w("\nendstream endobj\n%%EOF\n")
    assert(p.partition(bos.toByteArray, PartitionStrategy.OcrOnly) ===
      Seq("run length page"))
  }

  test("filter chains: LZW, [ASCII85+Flate], ASCIIHex content streams " +
    "all extract through PdfGen.filterChain (one element per page)") {
    val text = "lzw page alpha\na85 flate page beta\nhex page gamma"
    val got = p.partition(PdfGen.filterChain(text), PartitionStrategy.OcrOnly)
    assert(got === Seq("lzw page alpha", "a85 flate page beta", "hex page gamma"))
  }

  // ----- PDF 1.5+ compressed object streams (ObjStm)

  test("ObjStm: font dict + ToUnicode reference INSIDE a compressed " +
    "object stream are found; glyph-id CIDs decode through the CMap") {
    val text = "object streams hide the fonts"
    val got = p.partition(PdfGen.objStm(text), PartitionStrategy.OcrOnly)
    assert(got === Seq(text))
    // the discovery really is via ObjStm: the font binding exists
    val fonts = PdfTextPartitioner.fontMap(PdfGen.objStm(text))
    assert(fonts.contains("F1") && fonts("F1").codeBytes === 1)
  }

  test("ObjStm regression fails CLOSED: a corrupted ObjStm payload " +
    "yields no text (glyph ids are control bytes, not garbage text)") {
    val bytes = PdfGen.objStm("closed on regression")
    val s = new String(bytes, StandardCharsets.ISO_8859_1)
    // corrupt the ObjStm stream payload (object 4) so it no longer
    // inflates: the font binding disappears, show strings decode to
    // raw control bytes, trim leaves nothing → OCR-seam fallback
    val at = s.indexOf("stream", s.indexOf("/ObjStm")) + 8
    val broken = bytes.clone()
    broken(at) = (broken(at) ^ 0x55).toByte
    broken(at + 1) = (broken(at + 1) ^ 0x55).toByte
    assert(p.partition(broken, PartitionStrategy.OcrOnly) === Seq.empty)
    val auto = AutoPartitioner(TextPartitioner())
    assert(auto.partitionWithPath(broken, PartitionStrategy.OcrOnly)._2 ===
      ExtractPath.PdfFallback)
  }

  test("expandObjStm: malformed headers (offset past payload, short " +
    "pair list) skip entries, never throw; later position wins collisions") {
    // top-level object 5 AND a LATER ObjStm claiming object 5: the
    // definition latest in the byte stream wins (appended-update
    // semantics; the reverse ordering is pinned in the round-15
    // cross-container test below)
    val inner = "5 0\n<< /FromObjStm true >>"
    val first = 4                               // header "5 0\n" is 4 bytes
    val data = deflate(inner.getBytes(StandardCharsets.ISO_8859_1))
    val bos = new java.io.ByteArrayOutputStream()
    def w(x: String): Unit = bos.write(x.getBytes(StandardCharsets.ISO_8859_1))
    w("%PDF-1.5\n")
    w("5 0 obj << /TopLevel true >> endobj\n")
    w(s"4 0 obj << /Type /ObjStm /N 1 /First $first /Filter /FlateDecode /Length ${data.length} >>\nstream\n")
    bos.write(data)
    w("\nendstream endobj\n%%EOF\n")
    val objs = PdfTextPartitioner.objects(bos.toByteArray)
    assert(objs(5).dict.contains("/FromObjStm"),
      "the later (appended) definition must win, even inside an ObjStm")
    // malformed: /First beyond payload → entries skipped, no throw
    val bos2 = new java.io.ByteArrayOutputStream()
    def w2(x: String): Unit = bos2.write(x.getBytes(StandardCharsets.ISO_8859_1))
    w2("%PDF-1.5\n")
    w2(s"4 0 obj << /Type /ObjStm /N 1 /First 99999 /Filter /FlateDecode /Length ${data.length} >>\nstream\n")
    bos2.write(data)
    w2("\nendstream endobj\n%%EOF\n")
    assert(!PdfTextPartitioner.objects(bos2.toByteArray).contains(5))
  }

  test("inline images (BI…ID…EI) are skipped: binary payloads that " +
    "spell show operators never inject garbage text") {
    // payload contains "(fake) Tj", a non-delimited EIx, and binary
    // bytes; only the real whitespace-delimited EI terminates
    val cs = "BT (before) Tj ET " +
      "BI /W 2 /H 2 /BPC 8 /CS /G ID (fake) Tj EIxÿ EI " +
      "BT (after) Tj ET"
    assert(p.partition(pdf(cs, compress = false), PartitionStrategy.OcrOnly) ===
      Seq("before\nafter"))
    // unterminated image: rest of the stream skipped, never misparsed
    val cs2 = "BT (kept) Tj ET BI /W 1 ID  (lost) Tj"
    assert(p.partition(pdf(cs2, compress = false), PartitionStrategy.OcrOnly) ===
      Seq("kept"))
  }

  test("per-page font scoping: the same /F1 name bound to DIFFERENT " +
    "fonts on different pages decodes each page under its own CMap") {
    def cmapStream(num: Int, entries: Seq[(Int, Char)]): String = {
      val body = "begincmap\n1 begincodespacerange\n<00> <FF>\nendcodespacerange\n" +
        s"${entries.size} beginbfchar\n" +
        entries.map { case (c, ch) => f"<$c%02X> <${ch.toInt}%04X>" }.mkString("\n") +
        "\nendbfchar\nendcmap"
      s"$num 0 obj << /Length ${body.length} >>\nstream\n$body\nendstream endobj\n"
    }
    val cs = "BT /F1 12 Tf <0102> Tj ET"
    val bos = new java.io.ByteArrayOutputStream()
    def w(x: String): Unit = bos.write(x.getBytes(StandardCharsets.ISO_8859_1))
    w("%PDF-1.4\n")
    w("1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj\n")
    w("2 0 obj << /Type /Pages /Kids [10 0 R 11 0 R] /Count 2 >> endobj\n")
    w("5 0 obj << /Type /Font /Subtype /Type0 /Encoding /Identity-H /ToUnicode 7 0 R >> endobj\n")
    w("6 0 obj << /Type /Font /Subtype /Type0 /Encoding /Identity-H /ToUnicode 8 0 R >> endobj\n")
    w(cmapStream(7, Seq(0x01 -> 'A', 0x02 -> 'B')))
    w(cmapStream(8, Seq(0x01 -> 'Z', 0x02 -> 'Y')))
    w("10 0 obj << /Type /Page /Parent 2 0 R /Contents 100 0 R " +
      "/Resources << /Font << /F1 5 0 R >> >> >> endobj\n")
    w("11 0 obj << /Type /Page /Parent 2 0 R /Contents 101 0 R " +
      "/Resources << /Font << /F1 6 0 R >> >> >> endobj\n")
    w(s"100 0 obj << /Length ${cs.length} >>\nstream\n$cs\nendstream endobj\n")
    w(s"101 0 obj << /Length ${cs.length} >>\nstream\n$cs\nendstream endobj\n")
    w("%%EOF\n")
    // a global first-binding-wins map would decode BOTH pages as AB
    assert(p.partition(bos.toByteArray, PartitionStrategy.OcrOnly) ===
      Seq("AB", "ZY"))
    // and the indirect /Resources N 0 R form scopes identically
    val bos2 = new java.io.ByteArrayOutputStream()
    def w2(x: String): Unit = bos2.write(x.getBytes(StandardCharsets.ISO_8859_1))
    w2("%PDF-1.4\n")
    w2("5 0 obj << /Type /Font /Subtype /Type0 /Encoding /Identity-H /ToUnicode 7 0 R >> endobj\n")
    w2(cmapStream(7, Seq(0x01 -> 'Q', 0x02 -> 'R')))
    w2("20 0 obj << /Font << /F1 5 0 R >> >> endobj\n")
    w2("10 0 obj << /Type /Page /Contents 100 0 R /Resources 20 0 R >> endobj\n")
    w2(s"100 0 obj << /Length ${cs.length} >>\nstream\n$cs\nendstream endobj\n")
    w2("%%EOF\n")
    assert(p.partition(bos2.toByteArray, PartitionStrategy.OcrOnly) === Seq("QR"))
  }

  // ----- encrypted PDFs and raster-image routing

  test("empty-password RC4 PDFs decrypt and extract (pdf_decrypted); " +
    "password-locked ones stay ciphertext (pdf_encrypted)") {
    val text = "readable by design despite encryption"
    val open = PdfGen.encrypted(text)
    assert(PdfTextPartitioner.isEncrypted(open))
    // the REAL decrypt path: standard-handler V2/R3 key derivation,
    // /U validation with the empty password, per-object RC4 - and
    // the recovered plaintext goes through the one normal walk
    assert(p.partition(open, PartitionStrategy.OcrOnly) === Seq(text))
    val auto = AutoPartitioner(TextPartitioner())
    assert(auto.partitionWithPath(open, PartitionStrategy.OcrOnly)._2 ===
      ExtractPath.PdfDecrypted)
    // a real user password fails the empty-password /U check: the
    // ciphertext is never touched and the label stays pdf_encrypted
    val locked = PdfGen.encrypted("locked secret", "hunter2")
    assert(PdfTextPartitioner.isEncrypted(locked))
    assert(p.partition(locked, PartitionStrategy.OcrOnly) === Seq.empty)
    assert(auto.partitionWithPath(locked, PartitionStrategy.OcrOnly)._2 ===
      ExtractPath.PdfEncrypted)
    // plain fixtures are NOT flagged
    assert(!PdfTextPartitioner.isEncrypted(PdfGen.simple("open text")))
    assert(!PdfTextPartitioner.isEncrypted(PdfGen.objStm("open text")))
    // fail-closed: skipping the crypto path finds only ciphertext
    assert(PdfTextPartitioner.contentStreams(open)
      .map(PdfTextPartitioner.shownText(_)).forall(_.trim.isEmpty))
  }

  test("AES-128 (/AESV2 V4/R4) empty-password PDFs decrypt and extract; " +
    "locked AES stays ciphertext; space-padded tails are harmless") {
    val text = "aes encrypted but readable by design"
    val open = PdfGen.encryptedAes(text)
    assert(PdfTextPartitioner.isEncrypted(open))
    assert(p.partition(open, PartitionStrategy.OcrOnly) === Seq(text))
    val auto = AutoPartitioner(TextPartitioner())
    assert(auto.partitionWithPath(open, PartitionStrategy.OcrOnly)._2 ===
      ExtractPath.PdfDecrypted)
    val locked = PdfGen.encryptedAes("aes locked secret", "hunter2")
    assert(p.partition(locked, PartitionStrategy.OcrOnly) === Seq.empty)
    assert(auto.partitionWithPath(locked, PartitionStrategy.OcrOnly)._2 ===
      ExtractPath.PdfEncrypted)
    // multi-page: padding discipline holds per stream
    val multi = PdfGen.encryptedAes("page one here\fpage two there")
    assert(p.partition(multi, PartitionStrategy.OcrOnly) ===
      Seq("page one here", "page two there"))
    // AES crypto primitive round-trip + malformed-shape rejection
    val key = PdfCrypt.md5("k".getBytes).take(16)
    val msg = "sixteen byte msg plus some tail".getBytes("UTF-8")
    assert(PdfCrypt.aesDecrypt(key, PdfCrypt.aesEncrypt(key, msg))
      .map(_.toSeq) === Some(msg.toSeq))
    assert(PdfCrypt.aesDecrypt(key, Array[Byte](1, 2, 3)) === None)
  }

  test("PdfCrypt algorithm internals: R2 and R3 round-trips, object-key " +
    "derivation truncates at 16 bytes, wrong password fails, dict strings") {
    import PdfCrypt._
    // RC4 is an involution under the same key
    val key = Array[Byte](1, 2, 3, 4, 5)
    val msg = "attack at dawn".getBytes("UTF-8")
    assert(rc4(key, rc4(key, msg)).toSeq === msg.toSeq)
    // R2/40-bit: U = RC4(key, Pad) - full 32-byte comparison
    val id0 = md5("fixture-id".getBytes("UTF-8"))
    val o2 = computeO(Array.empty, Array.empty, r = 2, length = 40)
    val sec2base = StdSecurity(2, 1, 40, o2, Array.empty, -44, id0)
    val u2 = computeU(fileKey(sec2base), id0, r = 2)
    assert(u2.length === 32)
    assert(emptyUserPasswordWorks(sec2base.copy(u = u2)))
    // R3/128-bit with a REAL password: empty must fail
    val pwd = "s3cret".getBytes("UTF-8")
    val o3 = computeO(Array.empty, pwd, r = 3, length = 128)
    val sec3base = StdSecurity(3, 2, 128, o3, Array.empty, -44, id0)
    val u3 = computeU(fileKey(sec3base, pwd), id0, r = 3)
    assert(!emptyUserPasswordWorks(sec3base.copy(u = u3)))
    // object keys: n+5 capped at 16
    assert(objectKey(new Array[Byte](16), 7, 0).length === 16)
    assert(objectKey(new Array[Byte](5), 7, 0).length === 10)
    // dict strings parse both hex and literal (with octal escapes)
    assert(dictString("<< /O <414243> >>", "/O").get.toSeq ===
      "ABC".getBytes.toSeq)
    assert(dictString("<< /O (A\\102\\() >>", "/O").get.toSeq ===
      "AB(".getBytes.toSeq)
    assert(dictString("<< /ID [<4142> <4343>] >>", "/ID").get.toSeq ===
      "AB".getBytes.toSeq)
  }

  test("image-only PDFs: raster XObject detected, routed to the image/" +
    "OCR leg as pdf_image (not the generic fallback)") {
    val img = PdfGen.dctImageOnly(6L)
    assert(PdfTextPartitioner.hasRasterImage(img))
    assert(p.partition(img, PartitionStrategy.OcrOnly) === Seq.empty)
    val auto = AutoPartitioner(TextPartitioner())
    assert(auto.partitionWithPath(img, PartitionStrategy.OcrOnly)._2 ===
      ExtractPath.PdfImage)
    // text-bearing and plain fixtures are NOT image-routed
    assert(!PdfTextPartitioner.hasRasterImage(PdfGen.simple("has text")))
    // a PDF with BOTH a text layer and an image keeps pdf_text (the
    // text layer wins, like the reference's partition step)
    val both = {
      val s = new String(PdfGen.dctImageOnly(1L), StandardCharsets.ISO_8859_1)
      val cs = "BT (text beats image) Tj ET"
      val extra = s"200 0 obj << /Length ${cs.length} >>\nstream\n" +
        s"$cs\nendstream endobj\n"
      (s.replace("%%EOF\n", extra + "%%EOF\n")).getBytes(StandardCharsets.ISO_8859_1)
    }
    assert(auto.partitionWithPath(both, PartitionStrategy.OcrOnly)._2 ===
      ExtractPath.PdfText)
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

  // ---------- round 15: V5 AES-256, /StmF gating, xref-stream
  // containers, incremental-update shadowing, /Differences ----------

  private def hexStr(b: Array[Byte]) = b.map(x => f"${x & 0xff}%02x").mkString

  test("AES-256 (V5/R6 /AESV3) empty-password PDFs decrypt and extract " +
    "(the modern-writer default); R5 too; locked V5 stays ciphertext") {
    val text = "aes-256 readable by design"
    val open = PdfGen.encryptedAes256(text)
    assert(PdfTextPartitioner.isEncrypted(open))
    assert(p.partition(open, PartitionStrategy.OcrOnly) === Seq(text))
    val auto = AutoPartitioner(TextPartitioner())
    assert(auto.partitionWithPath(open, PartitionStrategy.OcrOnly)._2 ===
      ExtractPath.PdfDecrypted)
    // R5 (the deprecated pre-ISO revision: plain SHA-256 derivation)
    val r5 = PdfGen.encryptedAes256("pre-iso r5 revision", r = 5)
    assert(p.partition(r5, PartitionStrategy.OcrOnly) ===
      Seq("pre-iso r5 revision"))
    // a real password fails the V5 /U validation: ciphertext untouched
    val locked = PdfGen.encryptedAes256("v5 locked secret", "hunter2")
    assert(p.partition(locked, PartitionStrategy.OcrOnly) === Seq.empty)
    assert(auto.partitionWithPath(locked, PartitionStrategy.OcrOnly)._2 ===
      ExtractPath.PdfEncrypted)
    // multi-page: one shared file key, per-stream IVs
    assert(p.partition(PdfGen.encryptedAes256("page one\fpage two"),
      PartitionStrategy.OcrOnly) === Seq("page one", "page two"))
  }

  test("xref-stream-only encryption container: /Encrypt lives in the " +
    "/Type /XRef stream dict (no trailer keyword), and still decrypts") {
    val text = "modern xref-stream container"
    val doc = PdfGen.encryptedAes256(text, xrefTail = true)
    assert(!new String(doc, StandardCharsets.ISO_8859_1).contains("trailer"))
    assert(PdfTextPartitioner.isEncrypted(doc))
    assert(PdfCrypt.parse(doc).isDefined,
      "parse must fall back to the /XRef stream dict for /Encrypt and /ID")
    assert(p.partition(doc, PartitionStrategy.OcrOnly) === Seq(text))
    assert(AutoPartitioner(TextPartitioner())
      .partitionWithPath(doc, PartitionStrategy.OcrOnly)._2 ===
      ExtractPath.PdfDecrypted)
  }

  test("V5 derivation internals: R5 is one SHA-256, R6 hardened hash " +
    "differs, entries round-trip, wrong password and tampered /Perms fail") {
    import PdfCrypt._
    val pwd = "pw".getBytes("UTF-8")
    val salt = md5("salt".getBytes).take(8)
    val sha256 = java.security.MessageDigest.getInstance("SHA-256")
    sha256.update(pwd); sha256.update(salt)
    assert(hash2B(5, pwd, salt, Array.empty).toSeq === sha256.digest().toSeq)
    assert(hash2B(6, pwd, salt, Array.empty).length === 32)
    assert(hash2B(6, pwd, salt, Array.empty).toSeq !==
      hash2B(5, pwd, salt, Array.empty).toSeq)
    val fk = Array.tabulate(32)(i => (i * 7 + 3).toByte)
    val (u, ue, o, oe, perms) = computeV5Entries(6, fk, -44)
    assert(u.length === 48 && ue.length === 32 &&
      o.length === 48 && oe.length === 32 && perms.length === 16)
    val sec = StdSecurity(6, 5, 256, o, u, -44, Array.empty,
      aes = true, ue = ue, permsV5 = perms)
    assert(fileKeyV5(sec).map(_.toSeq) === Some(fk.toSeq))
    assert(emptyUserPasswordWorks(sec))
    // built FOR a real password: the empty password must not open it
    val (u2, ue2, o2, oe2, p2) = computeV5Entries(6, fk, -44, pwd, pwd)
    assert(fileKeyV5(StdSecurity(6, 5, 256, o2, u2, -44, Array.empty,
      aes = true, ue = ue2, permsV5 = p2)) === None)
    // a tampered /Perms fails closed even when /U validates
    assert(fileKeyV5(sec.copy(
      permsV5 = perms.map(b => (b ^ 0x5a).toByte))) === None)
  }

  test("V4 /StmF /Identity (or absent): streams are PLAINTEXT — the " +
    "file passes through untranscrypted and the text extracts") {
    // r14 ADVICE: gating V4 on '/AESV2 present' alone would AES-
    // 'decrypt' plaintext streams to blanks, losing recoverable text
    val text = "v4 identity streams stay plaintext"
    val plainPdf = PdfGen.simple(text)
    val id0 = PdfCrypt.md5("v4-identity".getBytes("UTF-8"))
    val o = PdfCrypt.computeO(Array.empty, Array.empty, r = 4, length = 128)
    val secBase = PdfCrypt.StdSecurity(4, 4, 128, o, Array.empty, -44, id0)
    val u = PdfCrypt.computeU(PdfCrypt.fileKey(secBase), id0, r = 4)
    val tail =
      "9 0 obj << /Filter /Standard /V 4 /R 4 /Length 128 /P -44 " +
        "/CF << /StdCF << /CFM /AESV2 >> >> " +        // NO /StmF ⇒ Identity
        s"/O <${hexStr(o)}> /U <${hexStr(u)}> >> endobj\n" +
        "trailer << /Size 10 /Root 1 0 R /Encrypt 9 0 R " +
        s"/ID [<${hexStr(id0)}> <${hexStr(id0)}>] >>\nstartxref\n0\n%%EOF\n"
    val doc = new String(plainPdf, StandardCharsets.ISO_8859_1)
      .replace("%%EOF\n", tail).getBytes(StandardCharsets.ISO_8859_1)
    assert(PdfTextPartitioner.isEncrypted(doc))
    val sec = PdfCrypt.parse(doc).get
    assert(sec.streamsPlain && !sec.aes)
    assert(p.partition(doc, PartitionStrategy.OcrOnly) === Seq(text))
    assert(AutoPartitioner(TextPartitioner())
      .partitionWithPath(doc, PartitionStrategy.OcrOnly)._2 ===
      ExtractPath.PdfDecrypted)
  }

  test("V4 /StdCF /CFM /V2 (RC4 crypt filter) decrypts under the " +
    "per-object RC4 keys") {
    val text = "v4 rc4 crypt filter body"
    val plainPdf = PdfGen.simple(text)
    val id0 = PdfCrypt.md5("v4-rc4".getBytes("UTF-8"))
    val o = PdfCrypt.computeO(Array.empty, Array.empty, r = 4, length = 128)
    val secBase = PdfCrypt.StdSecurity(4, 4, 128, o, Array.empty, -44, id0)
    val fk = PdfCrypt.fileKey(secBase)
    val u = PdfCrypt.computeU(fk, id0, r = 4)
    val tail =
      "9 0 obj << /Filter /Standard /V 4 /R 4 /Length 128 /P -44 " +
        "/CF << /StdCF << /CFM /V2 /AuthEvent /DocOpen >> >> " +
        "/StmF /StdCF /StrF /StdCF " +
        s"/O <${hexStr(o)}> /U <${hexStr(u)}> >> endobj\n" +
        "trailer << /Size 10 /Root 1 0 R /Encrypt 9 0 R " +
        s"/ID [<${hexStr(id0)}> <${hexStr(id0)}>] >>\nstartxref\n0\n%%EOF\n"
    val assembled = new String(plainPdf, StandardCharsets.ISO_8859_1)
      .replace("%%EOF\n", tail).getBytes(StandardCharsets.ISO_8859_1)
    val doc = PdfCrypt.encryptStreams(assembled, fk)
    // ciphertext without the crypto path: nothing decodable
    assert(PdfTextPartitioner.contentStreams(doc)
      .map(PdfTextPartitioner.shownText(_)).forall(_.trim.isEmpty))
    assert(p.partition(doc, PartitionStrategy.OcrOnly) === Seq(text))
  }

  test("incremental update: an appended redefinition of a content " +
    "object wins — superseded page content is never extracted") {
    val doc = PdfGen.withUpdatedContent(
      PdfGen.simple("old stale body"), 100, "fresh replacement body")
    assert(p.partition(doc, PartitionStrategy.OcrOnly) ===
      Seq("fresh replacement body"))
    // two updates: the LAST one is the visible definition
    val doc2 = PdfGen.withUpdatedContent(doc, 100, "second revision")
    assert(p.partition(doc2, PartitionStrategy.OcrOnly) ===
      Seq("second revision"))
  }

  test("objects(): duplicate numbers resolve by byte position across " +
    "containers — a LATER ObjStm beats an earlier top-level and vice versa") {
    def objStmObj(num: Int, body: String): String = {
      val header = s"$num 0\n"
      val payload = header + body + "\n"
      s"4 0 obj << /Type /ObjStm /N 1 /First ${header.length} " +
        s"/Length ${payload.length} >>\nstream\n$payload\nendstream endobj\n"
    }
    // top-level first, ObjStm appended after (incremental update
    // packing its replacements into an object stream)
    val a = ("%PDF-1.5\n5 0 obj << /Old (stale) >> endobj\n" +
      objStmObj(5, "<< /New (fresh) >>") + "%%EOF\n")
      .getBytes(StandardCharsets.ISO_8859_1)
    assert(PdfTextPartitioner.objects(a)(5).dict.contains("/New"))
    // ObjStm first, top-level appended after (the common writer shape)
    val b = ("%PDF-1.5\n" + objStmObj(5, "<< /Old (stale) >>") +
      "5 0 obj << /New (fresh) >> endobj\n%%EOF\n")
      .getBytes(StandardCharsets.ISO_8859_1)
    assert(PdfTextPartitioner.objects(b)(5).dict.contains("/New"))
  }

  test("an unterminated stream (no endstream to EOF) cannot fabricate " +
    "phantom objects from its payload bytes") {
    val bytes = ("%PDF-1.5\n1 0 obj << /Q 1 >>\nstream\n" +
      "GARBAGE 2 0 obj << /Evil 1 >> endobj MORE GARBAGE")
      .getBytes(StandardCharsets.ISO_8859_1)
    val objs = PdfTextPartitioner.objects(bytes)
    assert(objs.contains(1))
    assert(!objs.contains(2),
      "payload bytes after an unterminated stream are not object headers")
  }

  test("/Differences remap: TeX-style simple fonts decode through the " +
    "glyph-name table; unknown names drop to the OCR seam, never mojibake") {
    val text = "remapped glyphs decode fine"
    val doc = PdfGen.differences(text)
    assert(p.partition(doc, PartitionStrategy.OcrOnly) === Seq(text))
    // adversarial by construction: ignoring the remap yields high-
    // Latin-1 mojibake, not the text
    val raw = PdfTextPartitioner.contentStreams(doc)
      .map(PdfTextPartitioner.shownText(_)).mkString.trim
    assert(raw !== text)
    // ligatures and accents through the AGL table
    val fancy = "café ﬁne –dash– ‘quoted’"
    assert(p.partition(PdfGen.differences(fancy),
      PartitionStrategy.OcrOnly) === Seq(fancy))
    // unknown subset-private names (gNN): NO text — the document
    // falls to the OCR seam instead of emitting raw bytes
    val bad = PdfGen.differences("cannot decode this", unknownGlyphs = true)
    assert(p.partition(bad, PartitionStrategy.OcrOnly) === Seq.empty)
    assert(AutoPartitioner(TextPartitioner())
      .partitionWithPath(bad, PartitionStrategy.OcrOnly)._2 ===
      ExtractPath.PdfFallback)
  }

  test("/WinAnsiEncoding: CP1252 typographic block decodes (Latin-1 " +
    "would read invisible control chars); /Differences overrides base") {
    val text = "he said “scale” — it’s ‘fast’ … €99 – done™"
    val doc = PdfGen.winAnsi(text)
    assert(p.partition(doc, PartitionStrategy.OcrOnly) === Seq(text))
    // the same bytes under a Latin-1-only walk are NOT the text
    // (0x80-0x9F land as control chars — silent corruption)
    val raw = PdfTextPartitioner.contentStreams(doc)
      .map(PdfTextPartitioner.shownText(_)).mkString.trim
    assert(raw !== text)
    // base-table shape: exactly the CP1252 block over Latin-1
    val win = PdfTextPartitioner.encodingBase(Some("WinAnsiEncoding"))
    assert(win(0x93) === "“" && win(0x94) === "”")
    assert(win(0x96) === "–" && win(0x97) === "—")
    assert(win(0x80) === "€" && win(0x99) === "™")
    assert(win(0x81) === "" && win(0x9d) === "")     // undefined → drop
    assert(win(0xe9) === "é" && win(0x41) === "A")   // Latin-1 half intact
    // MacRoman upper half through the JDK's own charset (guarded)
    if (java.nio.charset.Charset.isSupported("x-MacRoman")) {
      val mac = PdfTextPartitioner.encodingBase(Some("MacRomanEncoding"))
      assert(mac(0xd2) === "“" && mac(0xd3) === "”")
      assert(mac(0xa5) === "•")
      assert(mac(0x41) === "A")
    }
    // /BaseEncoding + /Differences compose: the remap wins over base
    val objs = Map(1 -> PdfTextPartitioner.PdfObj(
      "<< /BaseEncoding /WinAnsiEncoding /Differences [ 147 /bullet ] >>",
      () => None))
    val fontDict = "<< /Subtype /Type1 /Encoding 1 0 R >>"
    assert(PdfTextPartitioner.baseEncodingName(objs, fontDict) ===
      Some("WinAnsiEncoding"))
    assert(PdfTextPartitioner.differencesMap(objs, fontDict) ===
      Some(Map(0x93 -> "•")))
  }

  test("line breaks track VERTICAL moves only: horizontal Td and " +
    "same-y Tm keep the line; vertical Td / new-y Tm / T* break it") {
    import PdfTextPartitioner.shownText
    // horizontal kerning inside one line (the TeX output shape)
    assert(shownText("BT (one) Tj 12 0 Td (two) Tj ET") === "onetwo")
    assert(shownText(
      "BT 1 0 0 1 72 700 Tm (a) Tj 1 0 0 1 120 700 Tm (b) Tj ET") === "ab")
    // vertical moves break
    assert(shownText("BT (one) Tj 0 -14 Td (two) Tj ET") === "one\ntwo")
    assert(shownText(
      "BT 1 0 0 1 72 700 Tm (a) Tj 1 0 0 1 72 686 Tm (b) Tj ET") === "a\nb")
    assert(shownText("BT (a) Tj T* (b) Tj ET") === "a\nb")
    // TD behaves like Td; TJ kerning numbers never leak into the test
    assert(shownText("BT [(x) -120 (y)] TJ 8 0 TD (z) Tj ET") === "xyz")
    // a vertical Td INVALIDATES the remembered Tm y: a later Tm back
    // at a previously-seen y is a REAL line change (two-column shape),
    // not horizontal placement
    assert(shownText(
      "BT 1 0 0 1 72 700 Tm (a1) Tj 0 -14 Td (a2) Tj " +
        "1 0 0 1 306 700 Tm (b1) Tj ET") === "a1\na2\nb1")
  }

  test("TJ word gaps: a kerning number ≤ −180/1000 em becomes one " +
    "space (TeX spaces are positioning gaps, not space glyphs)") {
    import PdfTextPartitioner.shownText
    assert(shownText("BT [(the) -333 (quick) -290 (fox)] TJ ET") ===
      "the quick fox")
    // plain inter-letter kerning stays glued
    assert(shownText("BT [(ker) -50 (ned) -120 (pair)] TJ ET") ===
      "kernedpair")
    // leading / doubled gaps never produce stray or double spaces
    assert(shownText("BT [-400 (lead) -400 -400 (tail)] TJ ET") ===
      "lead tail")
    // Tj is gap-blind (no kerning operands by definition)
    assert(shownText("BT (solid) Tj ET") === "solid")
  }

  test("incremental update on a MULTI-page doc: the replacement body " +
    "keeps the superseded stream's position — page order survives") {
    val doc = PdfGen.withUpdatedContent(
      PdfGen.simple("old page one\fpage two stays"), 100, "new page one")
    assert(p.partition(doc, PartitionStrategy.OcrOnly) ===
      Seq("new page one", "page two stays"))
  }

  test("V4 key length reads the TOP-LEVEL /Length even when the /CF " +
    "sub-dict declares its own byte-count /Length first") {
    val text = "cf dict length must not shadow the key bits"
    val plainPdf = PdfGen.simple(text)
    val id0 = PdfCrypt.md5("v4-cflen".getBytes("UTF-8"))
    val o = PdfCrypt.computeO(Array.empty, Array.empty, r = 4, length = 128)
    val secBase = PdfCrypt.StdSecurity(4, 4, 128, o, Array.empty, -44, id0)
    val fk = PdfCrypt.fileKey(secBase)
    val u = PdfCrypt.computeU(fk, id0, r = 4)
    // adversarial ordering: the crypt filter's /Length 16 (BYTES)
    // appears before the top-level /Length 128 (BITS)
    val tail =
      "9 0 obj << /Filter /Standard /V 4 /R 4 /P -44 " +
        "/CF << /StdCF << /CFM /V2 /Length 16 /AuthEvent /DocOpen >> >> " +
        "/StmF /StdCF /StrF /StdCF /Length 128 " +
        s"/O <${hexStr(o)}> /U <${hexStr(u)}> >> endobj\n" +
        "trailer << /Size 10 /Root 1 0 R /Encrypt 9 0 R " +
        s"/ID [<${hexStr(id0)}> <${hexStr(id0)}>] >>\nstartxref\n0\n%%EOF\n"
    val assembled = new String(plainPdf, StandardCharsets.ISO_8859_1)
      .replace("%%EOF\n", tail).getBytes(StandardCharsets.ISO_8859_1)
    val doc = PdfCrypt.encryptStreams(assembled, fk)
    assert(PdfCrypt.parse(doc).map(_.length) === Some(128))
    assert(p.partition(doc, PartitionStrategy.OcrOnly) === Seq(text))
    assert(PdfCrypt.withoutCfDict(
      "<< /CF << /StdCF << /Length 16 >> >> /Length 128 >>")
      .contains("/Length 128"))
    assert(!PdfCrypt.withoutCfDict(
      "<< /CF << /StdCF << /Length 16 >> >> /Length 128 >>")
      .contains("/Length 16"))
  }

  test("xref-stream container: '/ID'-spelling garbage BEFORE the xref " +
    "object cannot shadow the dict's real /ID") {
    val text = "poisoned back window still decrypts"
    val doc = PdfGen.encryptedAes256(text, xrefTail = true)
    val s = new String(doc, StandardCharsets.ISO_8859_1)
    val at = s.indexOf("8 0 obj")
    assert(at > 0)
    // binary-looking junk carrying '/ID <...>' lands within what a
    // 2048-byte back-window from '/XRef' would scan
    val poisoned = (s.substring(0, at) +
      "% /ID <00112233445566778899aabbccddeeff> junk\n" +
      s.substring(at)).getBytes(StandardCharsets.ISO_8859_1)
    assert(PdfCrypt.parse(poisoned).isDefined)
    assert(p.partition(poisoned, PartitionStrategy.OcrOnly) === Seq(text))
  }

  test("glyphToText: AGL table, uniXXXX (multi-unit), uXXXX[XX] code " +
    "points, unknown names → None") {
    import PdfTextPartitioner.glyphToText
    assert(glyphToText("a") === Some("a"))
    assert(glyphToText("nine") === Some("9"))
    assert(glyphToText("fi") === Some("ﬁ"))
    assert(glyphToText("sigma") === Some("σ"))
    assert(glyphToText("eacute") === Some("é"))
    assert(glyphToText("endash") === Some("–"))
    assert(glyphToText("uni0041") === Some("A"))
    assert(glyphToText("uni00410042") === Some("AB"))
    assert(glyphToText("u0041") === Some("A"))
    assert(glyphToText("u1F600") === Some(new String(Character.toChars(0x1F600))))
    assert(glyphToText("g42") === None)
    assert(glyphToText("uniXYZW") === None)
    assert(glyphToText("unknownglyphname") === None)
    // AGL excludes surrogates: a lone surrogate would be a malformed
    // String that downstream UTF-8 turns into U+FFFD noise
    assert(glyphToText("uniD800") === None)
    assert(glyphToText("uniDFFF") === None)
    assert(glyphToText("uD83D") === None)
  }
}
