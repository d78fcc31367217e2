package graft.pipeline

import java.nio.charset.StandardCharsets

/** Deterministic minimal-PDF generator — demo/fixture input for the
  * binary leg of the pipeline (PipelineMain's extraction audit, the
  * partitioner specs). Emits the three container shapes the
  * extraction subset handles, so [[AutoPartitioner]]'s branches are
  * all exercisable without any external corpus:
  *
  *  - [[simple]]: classic byte-encoded (Type1-style) fonts, literal
  *    strings, Flate-compressed content;
  *  - [[type0]]: a composite **Type0/Identity-H font with a
  *    `/ToUnicode` CMap** (`beginbfchar` blocks, 2-byte hex show
  *    strings) — the shape of modern subset-TrueType PDFs, i.e. the
  *    reference's actual arXiv corpus (`01-download-pdfs.py:105-112`);
  *  - [[predictorFlate]]: Flate content behind a PNG Up predictor
  *    (`/DecodeParms << /Predictor 12 … >>`), the object-stream-era
  *    encoding.
  *
  * These are linear-scan PDFs (no xref table): exactly the subset
  * [[PdfTextPartitioner]] parses. NOT a document-authoring feature —
  * a generator for driving the real extraction branch end-to-end.
  */
object PdfGen {

  private def esc(s: String): String =
    s.flatMap {
      case '\\' => "\\\\"
      case '(' => "\\("
      case ')' => "\\)"
      case c if c.toInt > 255 => "?"            // Latin-1 subset for simple fonts
      case c => c.toString
    }

  private def deflate(b: Array[Byte]): Array[Byte] = {
    val d = new java.util.zip.Deflater()
    d.setInput(b); d.finish()
    val out = new java.io.ByteArrayOutputStream()
    val buf = new Array[Byte](8192)
    while (!d.finished()) out.write(buf, 0, d.deflate(buf))
    d.end()
    out.toByteArray
  }

  /** One page's content stream showing `lines` with Td line breaks. */
  private def contentOps(shows: Seq[String]): String =
    "BT /F1 12 Tf 72 720 Td " +
      shows.map(s => s"$s Tj").mkString(" 0 -14 Td ") + " ET"

  private def assemble(objs: Seq[String]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    bos.write("%PDF-1.5\n".getBytes(StandardCharsets.ISO_8859_1))
    objs.foreach(o => bos.write(o.getBytes(StandardCharsets.ISO_8859_1)))
    bos.write("%%EOF\n".getBytes(StandardCharsets.ISO_8859_1))
    bos.toByteArray
  }

  private def streamObj(num: Int, dictExtra: String, data: Array[Byte]): String = {
    val payload = new String(data, StandardCharsets.ISO_8859_1)
    s"$num 0 obj << $dictExtra/Length ${data.length} >>\nstream\n$payload\nendstream endobj\n"
  }

  /** Byte-encoded-font PDF: one content stream per form-feed page. */
  def simple(text: String, compress: Boolean = true): Array[Byte] = {
    val pages = text.split('\f').toSeq
    val head = Seq(
      "1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj\n",
      s"2 0 obj << /Type /Pages /Kids [${pages.indices.map(i => s"${10 + i} 0 R").mkString(" ")}] /Count ${pages.size} >> endobj\n",
      "5 0 obj << /Type /Font /Subtype /Type1 /BaseFont /Helvetica >> endobj\n")
    val body = pages.zipWithIndex.flatMap { case (p, i) =>
      val cs = contentOps(
        p.split('\n').map(_.trim).filter(_.nonEmpty).toSeq.map(l => s"(${esc(l)})"))
      val data =
        if (compress) deflate(cs.getBytes(StandardCharsets.ISO_8859_1))
        else cs.getBytes(StandardCharsets.ISO_8859_1)
      val filter = if (compress) "/Filter /FlateDecode " else ""
      Seq(
        s"${10 + i} 0 obj << /Type /Page /Parent 2 0 R /Contents ${100 + i} 0 R " +
          "/Resources << /Font << /F1 5 0 R >> >> >> endobj\n",
        streamObj(100 + i, filter, data))
    }
    assemble(head ++ body)
  }

  /** Composite-font PDF: a Type0/Identity-H font whose ToUnicode CMap
    * (Flate-compressed, bfchar blocks of ≤ 100 entries) maps 2-byte
    * CIDs — here CID = the char's UTF-16 code unit — back to Unicode;
    * show strings are 2-byte hex. */
  def type0(text: String): Array[Byte] = {
    val chars = text.filterNot(c => c == '\n' || c == '\f').distinct.sorted
    val cmapBody = {
      val entries = chars.map(c => f"<${c.toInt}%04X> <${c.toInt}%04X>")
      val blocks = entries.grouped(100).map(g =>
        s"${g.size} beginbfchar\n${g.mkString("\n")}\nendbfchar").mkString("\n")
      "/CIDInit /ProcSet findresource begin\n12 dict begin\nbegincmap\n" +
        "/CIDSystemInfo << /Registry (graft) /Ordering (demo) /Supplement 0 >> def\n" +
        "/CMapName /graft-demo def\n/CMapType 2 def\n" +
        "1 begincodespacerange\n<0000> <FFFF>\nendcodespacerange\n" +
        blocks + "\nendcmap\nCMapName currentdict /CMap defineresource pop\nend\nend"
    }
    val pages = text.split('\f').toSeq
    def hexShow(line: String): String =
      "<" + line.map(c => f"${c.toInt}%04X").mkString + ">"
    val head = Seq(
      "1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj\n",
      s"2 0 obj << /Type /Pages /Kids [${pages.indices.map(i => s"${10 + i} 0 R").mkString(" ")}] /Count ${pages.size} >> endobj\n",
      "5 0 obj << /Type /Font /Subtype /Type0 /BaseFont /GRAFT+Demo " +
        "/Encoding /Identity-H /DescendantFonts [6 0 R] /ToUnicode 7 0 R >> endobj\n",
      "6 0 obj << /Type /Font /Subtype /CIDFontType2 /BaseFont /GRAFT+Demo >> endobj\n",
      streamObj(7, "/Filter /FlateDecode ",
        deflate(cmapBody.getBytes(StandardCharsets.ISO_8859_1))))
    val body = pages.zipWithIndex.flatMap { case (p, i) =>
      val cs = contentOps(
        p.split('\n').map(_.trim).filter(_.nonEmpty).toSeq.map(hexShow))
      Seq(
        s"${10 + i} 0 obj << /Type /Page /Parent 2 0 R /Contents ${100 + i} 0 R " +
          "/Resources << /Font << /F1 5 0 R >> >> >> endobj\n",
        streamObj(100 + i, "/Filter /FlateDecode ",
          deflate(cs.getBytes(StandardCharsets.ISO_8859_1))))
    }
    assemble(head ++ body)
  }

  /** PNG-Up-predictor encode: rows of `columns` bytes, each prefixed
    * with filter type 2 and differenced against the previous row;
    * input padded with spaces to a whole row (harmless in a content
    * stream). */
  private def pngUpEncode(data: Array[Byte], columns: Int): Array[Byte] = {
    val padded = data ++ Array.fill(
      (columns - data.length % columns) % columns)(' '.toByte)
    val rows = padded.length / columns
    val out = new Array[Byte]((columns + 1) * rows)
    var r = 0
    while (r < rows) {
      out(r * (columns + 1)) = 2
      var k = 0
      while (k < columns) {
        val up = if (r == 0) 0 else padded((r - 1) * columns + k) & 0xff
        out(r * (columns + 1) + 1 + k) =
          (((padded(r * columns + k) & 0xff) - up) & 0xff).toByte
        k += 1
      }
      r += 1
    }
    out
  }

  /** Byte-encoded-font PDF whose content stream is PNG-Up-predicted
    * then Flate-compressed (`/DecodeParms << /Predictor 12 /Columns
    * 24 >>`). Single page. */
  def predictorFlate(text: String): Array[Byte] = {
    val cs = contentOps(
      text.split('\n').map(_.trim).filter(_.nonEmpty).toSeq.map(l => s"(${esc(l)})"))
    val columns = 24
    val data = deflate(pngUpEncode(cs.getBytes(StandardCharsets.ISO_8859_1), columns))
    assemble(Seq(
      "1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj\n",
      "2 0 obj << /Type /Pages /Kids [10 0 R] /Count 1 >> endobj\n",
      "5 0 obj << /Type /Font /Subtype /Type1 /BaseFont /Helvetica >> endobj\n",
      "10 0 obj << /Type /Page /Parent 2 0 R /Contents 100 0 R " +
        "/Resources << /Font << /F1 5 0 R >> >> >> endobj\n",
      streamObj(100,
        s"/Filter /FlateDecode /DecodeParms << /Predictor 12 /Columns $columns >> ",
        data)))
  }

  /** PDF-LZW encode (TIFF-style MSB-first 9→12-bit codes, clear=256,
    * EOD=257, EarlyChange=1) — fixture-side counterpart of
    * `PdfTextPartitioner.lzwDecode`, whose convention is
    * independently pinned against the PDF 1.7 §7.4.4.2 spec vector. */
  private[pipeline] def lzwEncode(data: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    var bitBuf = 0L; var bitCnt = 0
    var width = 9
    var nextCode = 258
    def put(code: Int): Unit = {
      bitBuf = (bitBuf << width) | code; bitCnt += width
      while (bitCnt >= 8) {
        bitCnt -= 8; out.write(((bitBuf >>> bitCnt) & 0xff).toInt)
      }
    }
    val dict = scala.collection.mutable.Map.empty[scala.collection.immutable.ArraySeq[Byte], Int]
    def key(b: Array[Byte]) = scala.collection.immutable.ArraySeq.unsafeWrapArray(b)
    put(256)
    var prev = Array.empty[Byte]
    for (b <- data) {
      val cand = prev :+ b
      val k = key(cand)
      if (prev.isEmpty) prev = cand
      else if (dict.contains(k)) prev = cand
      else {
        val code = if (prev.length == 1) prev(0) & 0xff else dict(key(prev))
        put(code)
        if (nextCode < 4096) {
          dict(k) = nextCode; nextCode += 1
          // encoder bumps at the NATURAL boundary (nextCode == 2^w);
          // the decoder's table runs one entry behind, so its
          // EarlyChange=1 bump (table+1 == 2^w) lands on the same
          // emitted code — the classic TIFF/PDF compensation
          if (width < 12 && nextCode >= (1 << width)) width += 1
        }
        prev = Array(b)
      }
    }
    if (prev.nonEmpty)
      put(if (prev.length == 1) prev(0) & 0xff else dict(key(prev)))
    put(257)
    if (bitCnt > 0) out.write(((bitBuf << (8 - bitCnt)) & 0xff).toInt)
    out.toByteArray
  }

  /** ASCII85 encode with the `~>` terminator (no `z` shortcut — the
    * decoder handles it, fixtures don't need it). */
  private[pipeline] def ascii85Encode(data: Array[Byte]): Array[Byte] = {
    val sb = new StringBuilder
    var i = 0
    while (i + 4 <= data.length) {
      var v = 0L; var k = 0
      while (k < 4) { v = (v << 8) | (data(i + k) & 0xffL); k += 1 }
      val cs = new Array[Char](5)
      var j = 4
      while (j >= 0) { cs(j) = ('!' + (v % 85).toInt).toChar; v /= 85; j -= 1 }
      sb.appendAll(cs)
      i += 4
    }
    val rem = data.length - i
    if (rem > 0) {
      var v = 0L; var k = 0
      while (k < 4) { v = (v << 8) | (if (k < rem) data(i + k) & 0xffL else 0L); k += 1 }
      val cs = new Array[Char](5)
      var j = 4
      while (j >= 0) { cs(j) = ('!' + (v % 85).toInt).toChar; v /= 85; j -= 1 }
      sb.appendAll(cs.take(rem + 1))
    }
    sb.append("~>")
    sb.toString.getBytes(StandardCharsets.ISO_8859_1)
  }

  /** Modern object-stream PDF (the arXiv shape): catalog, pages, page
    * dict, and the Type0 FONT dict — with its `/ToUnicode 7 0 R`
    * reference — live compressed inside a `/Type /ObjStm`, exactly
    * where PDF-1.5+ writers put them; only the two real streams (the
    * CMap and the content) are top-level, as the spec requires. CIDs
    * are 1-byte GLYPH IDS (1..k over the text's distinct chars), not
    * Unicode code units, so a parser that cannot see inside the
    * ObjStm has no font binding, decodes the show strings to raw
    * control bytes, and extracts nothing — the fixture fails CLOSED
    * to the OCR seam when object-stream support regresses (for texts
    * with ≤ 32 distinct chars; beyond that the spec's bit-exact
    * assertion is the net). */
  def objStm(text: String): Array[Byte] = {
    val body = text.split('\n').map(_.trim).filter(_.nonEmpty).toSeq
    val chars = body.mkString.distinct.sorted
    // 1-byte glyph-id code space caps at 255 distinct chars; richer
    // texts keep the composite-font container without the ObjStm
    // wrapper (same pdf_text routing, so the demo oracle stays total)
    if (chars.length > 255) return type0(text)
    val gid: Map[Char, Int] = chars.zipWithIndex.map { case (c, i) => c -> (i + 1) }.toMap
    val cmapBody = {
      val entries = chars.map(c => f"<${gid(c)}%02X> <${c.toInt}%04X>")
      val blocks = entries.grouped(100).map(g =>
        s"${g.size} beginbfchar\n${g.mkString("\n")}\nendbfchar").mkString("\n")
      "/CIDInit /ProcSet findresource begin\n12 dict begin\nbegincmap\n" +
        "/CIDSystemInfo << /Registry (graft) /Ordering (objstm) /Supplement 0 >> def\n" +
        "/CMapName /graft-objstm def\n/CMapType 2 def\n" +
        "1 begincodespacerange\n<00> <FF>\nendcodespacerange\n" +
        blocks + "\nendcmap\nCMapName currentdict /CMap defineresource pop\nend\nend"
    }
    def gidShow(line: String): String =
      "<" + line.map(c => f"${gid(c)}%02X").mkString + ">"
    val cs = contentOps(body.map(gidShow))
    // objects compressed into the ObjStm: no obj/endobj wrappers
    val inner = Seq(
      1 -> "<< /Type /Catalog /Pages 2 0 R >>",
      2 -> "<< /Type /Pages /Kids [10 0 R] /Count 1 >>",
      5 -> ("<< /Type /Font /Subtype /Type0 /BaseFont /GRAFT+ObjStm " +
        "/Encoding /Identity-H /DescendantFonts [6 0 R] /ToUnicode 7 0 R >>"),
      6 -> "<< /Type /Font /Subtype /CIDFontType2 /BaseFont /GRAFT+ObjStm >>",
      10 -> ("<< /Type /Page /Parent 2 0 R /Contents 100 0 R " +
        "/Resources << /Font << /F1 5 0 R >> >> >>"))
    val bodies = inner.map(_._2 + "\n")
    val offsets = bodies.scanLeft(0)(_ + _.length).init
    val header = inner.map(_._1).zip(offsets)
      .map { case (n, o) => s"$n $o" }.mkString(" ") + "\n"
    val payload = header + bodies.mkString
    val objStmData = deflate(payload.getBytes(StandardCharsets.ISO_8859_1))
    assemble(Seq(
      streamObj(4,
        s"/Type /ObjStm /N ${inner.size} /First ${header.length} /Filter /FlateDecode ",
        objStmData),
      streamObj(7, "/Filter /FlateDecode ",
        deflate(cmapBody.getBytes(StandardCharsets.ISO_8859_1))),
      streamObj(100, "/Filter /FlateDecode ",
        deflate(cs.getBytes(StandardCharsets.ISO_8859_1)))))
  }

  /** Three-page PDF exercising the non-Flate text-side filters: page
    * one's content is `/LZWDecode`, page two's a
    * `[/ASCII85Decode /FlateDecode]` chain (decode order: a85 coat
    * first, then inflate), page three's `/ASCIIHexDecode`. */
  def filterChain(text: String): Array[Byte] = {
    val lines = text.split('\n').map(_.trim).filter(_.nonEmpty).toSeq
    val third = math.max(1, (lines.size + 2) / 3)
    val pages = lines.grouped(third).toSeq.take(3).padTo(3, Seq("-"))
    def ops(p: Seq[String]) =
      contentOps(p.map(l => s"(${esc(l)})")).getBytes(StandardCharsets.ISO_8859_1)
    assemble(Seq(
      "1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj\n",
      "2 0 obj << /Type /Pages /Kids [10 0 R 11 0 R 12 0 R] /Count 3 >> endobj\n",
      "5 0 obj << /Type /Font /Subtype /Type1 /BaseFont /Helvetica >> endobj\n",
      "10 0 obj << /Type /Page /Parent 2 0 R /Contents 100 0 R " +
        "/Resources << /Font << /F1 5 0 R >> >> >> endobj\n",
      "11 0 obj << /Type /Page /Parent 2 0 R /Contents 101 0 R " +
        "/Resources << /Font << /F1 5 0 R >> >> >> endobj\n",
      "12 0 obj << /Type /Page /Parent 2 0 R /Contents 102 0 R " +
        "/Resources << /Font << /F1 5 0 R >> >> >> endobj\n",
      streamObj(100, "/Filter /LZWDecode ", lzwEncode(ops(pages(0)))),
      streamObj(101, "/Filter [/ASCII85Decode /FlateDecode] ",
        ascii85Encode(deflate(ops(pages(1))))),
      streamObj(102, "/Filter /ASCIIHexDecode ",
        (ops(pages(2)).map(b => f"${b & 0xff}%02X").mkString + ">")
          .getBytes(StandardCharsets.ISO_8859_1))))
  }

  /** Image-only PDF: one raster XObject behind `/DCTDecode` (junk
    * JPEG-ish bytes — never decoded, only classified) and a content
    * stream that PAINTS it without showing text — the scanned-PDF
    * shape that must route to the image/OCR leg (`pdf_image`). */
  def dctImageOnly(docId: Long): Array[Byte] = {
    val jpeg = Array[Byte](0xff.toByte, 0xd8.toByte, 0xff.toByte, 0xe0.toByte) ++
      Array.tabulate(64)(i => ((i * 31 + docId) & 0xff).toByte) ++
      Array[Byte](0xff.toByte, 0xd9.toByte)
    val cs = "q 400 0 0 400 100 300 cm /Im1 Do Q".getBytes(StandardCharsets.ISO_8859_1)
    assemble(Seq(
      "1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj\n",
      "2 0 obj << /Type /Pages /Kids [10 0 R] /Count 1 >> endobj\n",
      "10 0 obj << /Type /Page /Parent 2 0 R /Contents 100 0 R " +
        "/Resources << /XObject << /Im1 20 0 R >> >> >> endobj\n",
      streamObj(20, "/Type /XObject /Subtype /Image /Width 8 /Height 8 " +
        "/ColorSpace /DeviceRGB /BitsPerComponent 8 /Filter /DCTDecode ", jpeg),
      streamObj(100, "", cs)))
  }

  /** Forward TIFF predictor 2 (horizontal byte differencing) at
    * bpc 8. */
  private def tiffEncode(data: Array[Byte], rowLen: Int, bpp: Int): Array[Byte] = {
    require(rowLen > 0 && data.length % rowLen == 0, "rows must be whole")
    val out = data.clone()
    var r = 0
    while (r < out.length) {
      var k = rowLen - 1
      while (k >= bpp) {
        out(r + k) = (((data(r + k) & 0xff) - (data(r + k - bpp) & 0xff)) & 0xff).toByte
        k -= 1
      }
      r += rowLen
    }
    out
  }

  /** Image-only PDF whose raster is REAL decodable pixel data, BY
    * FORMULA ([[graft.operators.Sampling.hashBitsScalar]] salt 348 —
    * the q176/q202 one-formula-zero-literals rule, so the q348
    * oracle recomputes every pixel in SQL). One 16×16 8-bit image,
    * encoding cycled by `docId % 4` to keep every decode leg of
    * [[PdfImages]] live in one corpus:
    *
    *  - 0: DeviceGray, plain `/FlateDecode`;
    *  - 1: DeviceGray, Flate behind a PNG Up predictor
    *    (`/DecodeParms << /Predictor 12 /Columns 16 >>`);
    *  - 2: DeviceGray, Flate behind TIFF horizontal differencing
    *    (`/Predictor 2`);
    *  - 3: DeviceRGB through a transport coat
    *    (`/Filter [/ASCII85Decode /FlateDecode]`).
    *
    * The page paints the image and shows no text — the scanned-PDF
    * shape ([[dctImageOnly]]'s routing class, `pdf_image`), but with
    * pixels the pure-JVM path can actually recover. */
  def rasterPdf(docId: Long): Array[Byte] = rasterImage(docId, perturb = false)

  /** [[rasterPdf]]'s NEAR-DUP twin: the identical image except the
    * very first sample bumped one level (mod 256) — at most two luma
    * cells' gradient comparisons can move, so (original, twin) land
    * within Hamming 2 of each other under
    * [[graft.multimodal.ImageDedup.dHash]]. The q349 planted-pair
    * corpus. */
  def rasterPdfTwin(docId: Long): Array[Byte] = rasterImage(docId, perturb = true)

  private def rasterImage(docId: Long, perturb: Boolean): Array[Byte] = {
    val W = 16; val H = 16
    val variant = math.floorMod(docId, 4L).toInt
    val rgb = variant == 3
    val comps = if (rgb) 3 else 1
    val raw = Array.tabulate(W * H * comps) { q =>
      val n = if (rgb) docId * 768L + q else docId * 256L + q
      (graft.operators.Sampling.hashBitsScalar(n, 348L) % 256L).toByte
    }
    if (perturb) raw(0) = (((raw(0) & 0xff) + 1) % 256).toByte
    val rowLen = W * comps
    val (filterDict, payload) = variant match {
      case 0 => ("/Filter /FlateDecode ", deflate(raw))
      case 1 => ("/Filter /FlateDecode " +
        s"/DecodeParms << /Predictor 12 /Columns $W >> ",
        deflate(pngUpEncode(raw, rowLen)))
      case 2 => ("/Filter /FlateDecode " +
        s"/DecodeParms << /Predictor 2 /Columns $W >> ",
        deflate(tiffEncode(raw, rowLen, 1)))
      case _ => ("/Filter [/ASCII85Decode /FlateDecode] ",
        ascii85Encode(deflate(raw)))
    }
    val cs = if (rgb) "/DeviceRGB" else "/DeviceGray"
    val paint = s"q ${25 * W} 0 0 ${25 * H} 100 300 cm /Im1 Do Q"
      .getBytes(StandardCharsets.ISO_8859_1)
    assemble(Seq(
      "1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj\n",
      "2 0 obj << /Type /Pages /Kids [10 0 R] /Count 1 >> endobj\n",
      "10 0 obj << /Type /Page /Parent 2 0 R /Contents 100 0 R " +
        "/Resources << /XObject << /Im1 20 0 R >> >> >> endobj\n",
      streamObj(20, s"/Type /XObject /Subtype /Image /Width $W /Height $H " +
        s"/ColorSpace $cs /BitsPerComponent 8 $filterDict", payload),
      streamObj(100, "", paint)))
  }

  /** Image-only PDF carrying a REAL CCITT Group 4 scan: a 16×16
    * bilevel bitmap BY FORMULA (hashBits salt 350, bit = parity —
    * 1 ⇒ black), G4-encoded by [[CcittG4.encode]] and declared the
    * way scanners/writers do (`/CCITTFaxDecode`, `/DecodeParms
    * << /K -1 /Columns 16 /Rows 16 >>`, `/BitsPerComponent 1`). The
    * q350 oracle recomputes the bits in SQL, so the whole
    * encode→container→decode path is a live tripwire. */
  def ccittPdf(docId: Long): Array[Byte] = {
    val W = 16; val H = 16
    val px = Array.tabulate(W * H) { p =>
      val black =
        graft.operators.Sampling.hashBitsScalar(docId * 256L + p, 350L) % 2L == 1L
      if (black) 0.toByte else 255.toByte
    }
    // cycle the fax GROUP by doc id so every CCITT decode leg runs
    // live under q350's pixel-level oracle: 0 mod 4 ⇒ G4 (/K -1),
    // 1 mod 4 ⇒ G3 1D (/K 0, the PDF-common no-EOL shape),
    // 2 mod 4 ⇒ byte-aligned G4 (/EncodedByteAlign true — r15 ADVICE:
    // previously only G3 honored the flag),
    // 3 mod 4 ⇒ G3 mixed (/K 4, EOL + tag per line)
    val (kDecl, payload) = math.floorMod(docId, 4L) match {
      case 1L => ("/K 0", CcittG4.encodeG3(px, W, H, 0))
      case 2L => ("/K -1 /EncodedByteAlign true",
        CcittG4.encode(px, W, H, byteAlign = true))
      case 3L => ("/K 4 /EndOfLine true", CcittG4.encodeG3(px, W, H, 4))
      case _ => ("/K -1", CcittG4.encode(px, W, H))
    }
    val paint = s"q ${25 * W} 0 0 ${25 * H} 100 300 cm /Im1 Do Q"
      .getBytes(StandardCharsets.ISO_8859_1)
    assemble(Seq(
      "1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj\n",
      "2 0 obj << /Type /Pages /Kids [10 0 R] /Count 1 >> endobj\n",
      "10 0 obj << /Type /Page /Parent 2 0 R /Contents 100 0 R " +
        "/Resources << /XObject << /Im1 20 0 R >> >> >> endobj\n",
      streamObj(20, s"/Type /XObject /Subtype /Image /Width $W /Height $H " +
        s"/ColorSpace /DeviceGray /BitsPerComponent 1 " +
        s"/Filter /CCITTFaxDecode " +
        s"/DecodeParms << $kDecl /Columns $W /Rows $H /BlackIs1 false >> ", payload),
      streamObj(100, "", paint)))
  }

  /** Image-only PDF carrying a REAL JBIG2 scan: a 16×16 bilevel
    * bitmap BY FORMULA (hashBits salt 352, parity ⇒ black), encoded
    * by [[Jbig2.encode]] (MQ arithmetic coder + template-0 generic
    * region + embedded segment headers) and declared the way
    * scanners do (`/Filter /JBIG2Decode`, `/BitsPerComponent 1`).
    * The q352 oracle recomputes the bits in SQL — one wrong Qe-table
    * entry, context bit, or segment offset anywhere in
    * encode→container→decode shifts the hash. */
  def jbig2Pdf(docId: Long): Array[Byte] = {
    val W = 16; val H = 16
    val px = Array.tabulate(W * H) { p =>
      val black =
        graft.operators.Sampling.hashBitsScalar(docId * 256L + p, 352L) % 2L == 1L
      if (black) 1.toByte else 0.toByte
    }
    // cycle the coding mode by doc id so ALL THREE decoder paths run
    // live under q352's pixel-level oracle (the hash only matches if
    // plain MQ, TPGDON row-copy, and MMR/T.6 each reproduce the same
    // bitmap): 0 ⇒ plain, 2 ⇒ MMR, odd ⇒ TPGDON
    val mode = math.floorMod(docId, 4L)
    val payload = Jbig2.encode(px, W, H,
      tpgdon = mode % 2 == 1, mmr = mode == 2)
    val paint = s"q ${25 * W} 0 0 ${25 * H} 100 300 cm /Im1 Do Q"
      .getBytes(StandardCharsets.ISO_8859_1)
    assemble(Seq(
      "1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj\n",
      "2 0 obj << /Type /Pages /Kids [10 0 R] /Count 1 >> endobj\n",
      "10 0 obj << /Type /Page /Parent 2 0 R /Contents 100 0 R " +
        "/Resources << /XObject << /Im1 20 0 R >> >> >> endobj\n",
      streamObj(20, s"/Type /XObject /Subtype /Image /Width $W /Height $H " +
        s"/ColorSpace /DeviceGray /BitsPerComponent 1 " +
        s"/Filter /JBIG2Decode ", payload),
      streamObj(100, "", paint)))
  }

  /** Image-only PDF carrying a JBIG2 scan coded under GBTEMPLATE
    * 1, 2, or 3 (§6.2.5.3 — r17, previously declines): the smaller
    * generic contexts real encoders pick for speed. Template cycles
    * `1 + docId % 3`, TPGDON by bit 2. Pixels BY FORMULA (salt 395)
    * so the q369 oracle replays them — a wrong context pixel, AT
    * slot, or TPGD pseudo-context in ANY of the three templates
    * shifts the hash. */
  def jbig2TemplatePdf(docId: Long): Array[Byte] = {
    val W = 16; val H = 16
    val px = Array.tabulate(W * H) { p =>
      (graft.operators.Sampling.hashBitsScalar(docId * 256L + p, 395L) % 2L).toByte
    }
    val template = 1 + math.floorMod(docId, 3L).toInt
    val tpgdon = math.floorMod(docId >> 2, 2L) == 1L
    val payload = Jbig2.encode(px, W, H, tpgdon = tpgdon, template = template)
    val paint = s"q ${25 * W} 0 0 ${25 * H} 100 300 cm /Im1 Do Q"
      .getBytes(StandardCharsets.ISO_8859_1)
    assemble(Seq(
      "1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj\n",
      "2 0 obj << /Type /Pages /Kids [10 0 R] /Count 1 >> endobj\n",
      "10 0 obj << /Type /Page /Parent 2 0 R /Contents 100 0 R " +
        "/Resources << /XObject << /Im1 20 0 R >> >> >> endobj\n",
      streamObj(20, s"/Type /XObject /Subtype /Image /Width $W /Height $H " +
        "/ColorSpace /DeviceGray /BitsPerComponent 1 " +
        "/Filter /JBIG2Decode ", payload),
      streamObj(100, "", paint)))
  }

  /** Pack per-pixel sample values into the PDF §8.9.5.2 row-aligned
    * bit layout (each row starts on a byte boundary). */
  private def packSamples(vals: Array[Int], w: Int, h: Int, bpc: Int): Array[Byte] = {
    val rowBytes = (w * bpc + 7) / 8
    val out = new Array[Byte](rowBytes * h)
    var y = 0
    while (y < h) {
      var i = 0
      while (i < w) {
        val bitPos = i * bpc
        val idx = y * rowBytes + (bitPos >> 3)
        out(idx) = (out(idx) |
          ((vals(y * w + i) & ((1 << bpc) - 1)) << (8 - bpc - (bitPos & 7)))).toByte
        i += 1
      }
      y += 1
    }
    out
  }

  /** Image-only PDF whose raster uses SUB-8-BIT samples or an
    * `/Indexed` palette — the r15-verdict top-next shape (TIFF→PDF
    * converters emit 1-bit Flate bilevel; palette images are the
    * other common non-8-bit scan). 16×16, pixels BY FORMULA
    * (hashBits salt 353; palettes salt 354 — the q348
    * one-formula-zero-literals rule), encoding cycled by `docId % 4`
    * so every new decode leg runs live under one oracle:
    *
    *  - 0: **1-bit DeviceGray** Flate (sample v ∈ {0,1} → luma
    *    v·255);
    *  - 1: **4-bit DeviceGray** Flate (v ∈ [0,16) → luma v·17);
    *  - 2: **4-bit `/Indexed [/DeviceRGB 15 <hex>]`** — direct
    *    array, hex-string palette, RGB base;
    *  - 3: **1-bit `/Indexed`** with the colorspace array, base, and
    *    lookup all INDIRECT objects (array ref → base ref → stream
    *    lookup), gray base.
    *
    * Every page ALSO carries an INLINE 1-bit gray image with RAW
    * (unfiltered) data (salt 355, exact derived-length parse,
    * objNum −1) — the inline sub-8-bit leg in the same sweep. */
  def subbitPdf(docId: Long): Array[Byte] = {
    val W = 16; val H = 16
    def hv(n: Long, salt: Long): Long =
      graft.operators.Sampling.hashBitsScalar(n, salt)
    val variant = math.floorMod(docId, 4L).toInt
    val (dictExtra, payload, extraObjs) = variant match {
      case 0 =>
        val vals = Array.tabulate(W * H)(p => (hv(docId * 256L + p, 353L) % 2L).toInt)
        ("/ColorSpace /DeviceGray /BitsPerComponent 1 /Filter /FlateDecode ",
          deflate(packSamples(vals, W, H, 1)), Seq.empty[String])
      case 1 =>
        val vals = Array.tabulate(W * H)(p => (hv(docId * 256L + p, 353L) % 16L).toInt)
        ("/ColorSpace /DeviceGray /BitsPerComponent 4 /Filter /FlateDecode ",
          deflate(packSamples(vals, W, H, 4)), Seq.empty[String])
      case 2 =>
        val vals = Array.tabulate(W * H)(p => (hv(docId * 256L + p, 353L) % 16L).toInt)
        val palette = Array.tabulate(48)(i => (hv(docId * 48L + i, 354L) % 256L).toInt)
        val hex = palette.map(v => f"$v%02X").mkString
        (s"/ColorSpace [/Indexed /DeviceRGB 15 <$hex>] " +
          "/BitsPerComponent 4 /Filter /FlateDecode ",
          deflate(packSamples(vals, W, H, 4)), Seq.empty[String])
      case _ =>
        val vals = Array.tabulate(W * H)(p => (hv(docId * 256L + p, 353L) % 2L).toInt)
        val lut = Array.tabulate(2)(i => (hv(docId * 2L + i, 354L) % 256L).toByte)
        ("/ColorSpace 7 0 R /BitsPerComponent 1 /Filter /FlateDecode ",
          deflate(packSamples(vals, W, H, 1)),
          Seq(
            "7 0 obj [/Indexed 8 0 R 1 9 0 R] endobj\n",
            "8 0 obj /DeviceGray endobj\n",
            streamObj(9, "", lut)))
    }
    val inlineVals =
      Array.tabulate(W * H)(p => (hv(docId * 256L + p, 355L) % 2L).toInt)
    val inlineData =
      new String(packSamples(inlineVals, W, H, 1), StandardCharsets.ISO_8859_1)
    val cs = s"q ${25 * W} 0 0 ${25 * H} 100 300 cm /Im1 Do Q " +
      s"q ${25 * W} 0 0 ${25 * H} 100 40 cm " +
      s"BI /W $W /H $H /BPC 1 /CS /G ID $inlineData EI Q"
    assemble(Seq(
      "1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj\n",
      "2 0 obj << /Type /Pages /Kids [10 0 R] /Count 1 >> endobj\n",
      "10 0 obj << /Type /Page /Parent 2 0 R /Contents 100 0 R " +
        "/Resources << /XObject << /Im1 20 0 R >> >> >> endobj\n") ++
      extraObjs ++ Seq(
      streamObj(20, s"/Type /XObject /Subtype /Image /Width $W /Height $H " +
        dictExtra, payload),
      streamObj(100, "/Filter /FlateDecode ",
        deflate(cs.getBytes(StandardCharsets.ISO_8859_1)))))
  }

  /** Image-only PDF in the CIE `/Lab` colorspace (closed-form
    * §8.6.5.4): 16×16, samples BY FORMULA (salt 359); even ids carry
    * the `[/Lab <<…>>]` array directly (default `/Range`), odd ids
    * behind an object reference with an explicit `/Range` — the q356
    * oracle recomputes the full Lab → linear-sRGB conversion in SQL.
    */
  def labPdf(docId: Long): Array[Byte] = {
    val W = 16; val H = 16
    val raw = Array.tabulate(W * H * 3) { q =>
      (graft.operators.Sampling.hashBitsScalar(docId * 768L + q, 359L) % 256L).toByte
    }
    val indirect = math.floorMod(docId, 2L) == 1L
    val labArr =
      if (indirect)
        "[/Lab << /WhitePoint [0.9505 1 1.089] /Range [-128 127 -128 127] >>]"
      else "[/Lab << /WhitePoint [0.9505 1 1.089] >>]"
    val csDecl =
      if (indirect) "/ColorSpace 7 0 R " else s"/ColorSpace $labArr "
    val paint = s"q ${25 * W} 0 0 ${25 * H} 100 300 cm /Im1 Do Q"
      .getBytes(StandardCharsets.ISO_8859_1)
    assemble(Seq(
      "1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj\n",
      "2 0 obj << /Type /Pages /Kids [10 0 R] /Count 1 >> endobj\n",
      "10 0 obj << /Type /Page /Parent 2 0 R /Contents 100 0 R " +
        "/Resources << /XObject << /Im1 20 0 R >> >> >> endobj\n") ++
      (if (indirect) Seq(s"7 0 obj $labArr endobj\n") else Seq.empty) ++ Seq(
      streamObj(20, s"/Type /XObject /Subtype /Image /Width $W /Height $H " +
        s"$csDecl/BitsPerComponent 8 /Filter /FlateDecode ", deflate(raw)),
      streamObj(100, "", paint)))
  }

  /** Image-only PDF whose raster carries an `/SMask` soft mask (PDF
    * 32000-1 §11.6.5.2): the 16×16 base (gray for even ids, salt
    * 360; RGB for odd, salt 360 over 768) composites through an
    * 8×8 gray mask (salt 361 — half-size, exercising the
    * nearest-neighbor sampling §11.6.5.3 allows). The q357 oracle
    * recomputes `out = (v·m + 255·(255−m) + 127) / 255` per
    * component in SQL. */
  def smaskPdf(docId: Long): Array[Byte] = {
    val W = 16; val H = 16; val MW = 8; val MH = 8
    def hv(n: Long, salt: Long): Long =
      graft.operators.Sampling.hashBitsScalar(n, salt)
    val rgb = math.floorMod(docId, 2L) == 1L
    val comps = if (rgb) 3 else 1
    val base = Array.tabulate(W * H * comps) { q =>
      (hv(docId * (256L * comps) + q, 360L) % 256L).toByte
    }
    val mask = Array.tabulate(MW * MH) { q =>
      (hv(docId * 64L + q, 361L) % 256L).toByte
    }
    val cs = if (rgb) "/DeviceRGB" else "/DeviceGray"
    val paint = s"q ${25 * W} 0 0 ${25 * H} 100 300 cm /Im1 Do Q"
      .getBytes(StandardCharsets.ISO_8859_1)
    assemble(Seq(
      "1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj\n",
      "2 0 obj << /Type /Pages /Kids [10 0 R] /Count 1 >> endobj\n",
      "10 0 obj << /Type /Page /Parent 2 0 R /Contents 100 0 R " +
        "/Resources << /XObject << /Im1 20 0 R >> >> >> endobj\n",
      streamObj(20, s"/Type /XObject /Subtype /Image /Width $W /Height $H " +
        s"/ColorSpace $cs /BitsPerComponent 8 /SMask 21 0 R " +
        "/Filter /FlateDecode ", deflate(base)),
      streamObj(21, s"/Type /XObject /Subtype /Image /Width $MW /Height $MH " +
        "/ColorSpace /DeviceGray /BitsPerComponent 8 " +
        "/Filter /FlateDecode ", deflate(mask)),
      streamObj(100, "", paint)))
  }

  /** Image-only PDF whose raster colorspace is `/ICCBased` — the
    * wrapper real writers put around plain device spaces, resolved to
    * the device alternate by the profile's `/N` component count
    * (§8.6.5.5; the junk profile payload is never read). Cycled by
    * `docId % 2`: 0 ⇒ gray behind a FULLY INDIRECT chain
    * (`/ColorSpace 7 0 R` → `[/ICCBased 8 0 R]` → stream `/N 1`);
    * 1 ⇒ RGB behind a direct array (`/ColorSpace [/ICCBased 8 0 R]`,
    * `/N 3`). Pixels BY FORMULA (salt 358) for the q355 replay. */
  def iccPdf(docId: Long): Array[Byte] = {
    val W = 16; val H = 16
    val rgb = math.floorMod(docId, 2L) == 1L
    val comps = if (rgb) 3 else 1
    val raw = Array.tabulate(W * H * comps) { q =>
      val n = if (rgb) docId * 768L + q else docId * 256L + q
      (graft.operators.Sampling.hashBitsScalar(n, 358L) % 256L).toByte
    }
    val iccPayload = Array.tabulate(32)(i => ((i * 7 + docId) & 0xff).toByte)
    val csDecl =
      if (rgb) "/ColorSpace [/ICCBased 8 0 R] " else "/ColorSpace 7 0 R "
    val paint = s"q ${25 * W} 0 0 ${25 * H} 100 300 cm /Im1 Do Q"
      .getBytes(StandardCharsets.ISO_8859_1)
    assemble(Seq(
      "1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj\n",
      "2 0 obj << /Type /Pages /Kids [10 0 R] /Count 1 >> endobj\n",
      "10 0 obj << /Type /Page /Parent 2 0 R /Contents 100 0 R " +
        "/Resources << /XObject << /Im1 20 0 R >> >> >> endobj\n") ++
      (if (!rgb) Seq("7 0 obj [/ICCBased 8 0 R] endobj\n") else Seq.empty) ++ Seq(
      streamObj(8, s"/N $comps /Alternate ${if (rgb) "/DeviceRGB" else "/DeviceGray"} ",
        iccPayload),
      streamObj(20, s"/Type /XObject /Subtype /Image /Width $W /Height $H " +
        s"$csDecl/BitsPerComponent 8 /Filter /FlateDecode ", deflate(raw)),
      streamObj(100, "", paint)))
  }

  /** Image-only PDF whose raster colorspace is a single-colorant
    * `/Separation` or `/DeviceN` with a tint-transform function (PDF
    * 32000-1 §8.6.6.4-5 + §7.10) — the spot-color scan shape that
    * previously stranded as `opaque`. Cycled by `docId % 3`:
    *
    *  - 0 ⇒ `/Separation` → DeviceRGB through a TYPE 2 exponential
    *    (N=1; C0/C1 components `hash(id·8+j, 369) % 256 / 255`);
    *  - 1 ⇒ `/Separation /All` → DeviceGray through a TYPE 3
    *    stitching of two type-2 halves (`/Bounds [0.5]`, constants
    *    salt 370);
    *  - 2 ⇒ single-name `/DeviceN` → DeviceRGB through a TYPE 0
    *    sampled stream (`/Size [17]`, 8-bit, samples
    *    `hash(id·64 + k·3+j, 371) % 256` — 16 ≠ a multiple of 255,
    *    so interpolation exercises REAL fractions).
    *
    * Odd ids put the colorspace array behind an object reference.
    * Tint pixels BY FORMULA (salt 368); every function constant is
    * written as `Double.toString` of the salt-derived value, which
    * round-trips exactly through the text parse — the q361 oracle
    * replays each evaluation step in SQL. */
  def sepPdf(docId: Long): Array[Byte] = {
    val W = 16; val H = 16
    def hv(n: Long, salt: Long): Long =
      graft.operators.Sampling.hashBitsScalar(n, salt)
    val tint = Array.tabulate(W * H) { p =>
      (hv(docId * 256L + p, 368L) % 256L).toByte
    }
    val leg = math.floorMod(docId, 3L).toInt
    def frac(n: Long, salt: Long): String =
      java.lang.Double.toString((hv(n, salt) % 256L) / 255.0)
    val (csArr, fnObjs) = leg match {
      case 0 =>
        val c0 = (0 until 3).map(j => frac(docId * 8L + j, 369L)).mkString(" ")
        val c1 = (0 until 3).map(j => frac(docId * 8L + 4 + j, 369L)).mkString(" ")
        ("[/Separation /Spot0 /DeviceRGB 30 0 R]",
          Seq(s"30 0 obj << /FunctionType 2 /Domain [0 1] " +
            s"/C0 [$c0] /C1 [$c1] /N 1 >> endobj\n"))
      case 1 =>
        val a0 = frac(docId * 8L, 370L); val a1 = frac(docId * 8L + 1, 370L)
        val b0 = frac(docId * 8L + 2, 370L); val b1 = frac(docId * 8L + 3, 370L)
        ("[/Separation /All /DeviceGray 30 0 R]",
          Seq(
            "30 0 obj << /FunctionType 3 /Domain [0 1] " +
              "/Functions [31 0 R 32 0 R] /Bounds [0.5] " +
              "/Encode [0 1 0 1] >> endobj\n",
            s"31 0 obj << /FunctionType 2 /Domain [0 1] /C0 [$a0] " +
              s"/C1 [$a1] /N 1 >> endobj\n",
            s"32 0 obj << /FunctionType 2 /Domain [0 1] /C0 [$b0] " +
              s"/C1 [$b1] /N 1 >> endobj\n"))
      case _ =>
        val samples = Array.tabulate(17 * 3)(i =>
          (hv(docId * 64L + i, 371L) % 256L).toByte)
        ("[/DeviceN [/Ink0] /DeviceRGB 30 0 R]",
          Seq(streamObj(30, "/FunctionType 0 /Domain [0 1] " +
            "/Range [0 1 0 1 0 1] /Size [17] /BitsPerSample 8 ", samples)))
    }
    val indirect = math.floorMod(docId, 2L) == 1L
    val csDecl =
      if (indirect) "/ColorSpace 7 0 R " else s"/ColorSpace $csArr "
    val paint = s"q ${25 * W} 0 0 ${25 * H} 100 300 cm /Im1 Do Q"
      .getBytes(StandardCharsets.ISO_8859_1)
    assemble(Seq(
      "1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj\n",
      "2 0 obj << /Type /Pages /Kids [10 0 R] /Count 1 >> endobj\n",
      "10 0 obj << /Type /Page /Parent 2 0 R /Contents 100 0 R " +
        "/Resources << /XObject << /Im1 20 0 R >> >> >> endobj\n") ++
      (if (indirect) Seq(s"7 0 obj $csArr endobj\n") else Seq.empty) ++
      fnObjs ++ Seq(
      streamObj(20, s"/Type /XObject /Subtype /Image /Width $W /Height $H " +
        s"$csDecl/BitsPerComponent 8 /Filter /FlateDecode ", deflate(tint)),
      streamObj(100, "", paint)))
  }

  /** Image-only PDF whose tint transform is a TYPE 4 PostScript
    * calculator (PDF 32000-1 §7.10.5 — r17), the most common real
    * tint-transform shape. Cycled by `docId % 2`:
    *
    *  - 0 ⇒ `/Separation` → DeviceRGB, 1-in program exercising
    *    dup/exch/roll/mul/sub: `(t·C0, t·C1, 1 − t·C2)`;
    *  - 1 ⇒ TWO-ink `/DeviceN` → DeviceGray, 2-in program:
    *    `1 − (t1·C1 + t0·C0)` — multi-colorant DeviceN, previously
    *    a decline.
    *
    * Ink pixels BY FORMULA (salts 390/391, interleaved for the 2-ink
    * leg), constants salt 392 written as `Double.toString`; ids with
    * bit 1 set route the colorspace array behind an object
    * reference. The q367 oracle replays every program step in SQL. */
  def tintCalcPdf(docId: Long): Array[Byte] = {
    val W = 16; val H = 16
    def hv(n: Long, salt: Long): Long =
      graft.operators.Sampling.hashBitsScalar(n, salt)
    def frac(n: Long): String =
      java.lang.Double.toString((hv(n, 392L) % 256L) / 255.0)
    val leg = math.floorMod(docId, 2L).toInt
    val (csArr, fnObjs, raw) = if (leg == 0) {
      val c0 = frac(docId * 8L); val c1 = frac(docId * 8L + 1)
      val c2 = frac(docId * 8L + 2)
      val prog = s"{ dup dup $c0 mul exch $c1 mul 3 2 roll $c2 mul 1 exch sub }"
        .getBytes(StandardCharsets.ISO_8859_1)
      ("[/Separation /Spot0 /DeviceRGB 30 0 R]",
        Seq(streamObj(30, "/FunctionType 4 /Domain [0 1] " +
          "/Range [0 1 0 1 0 1] ", prog)),
        Array.tabulate(W * H)(p =>
          (hv(docId * 256L + p, 390L) % 256L).toByte))
    } else {
      val c0 = frac(docId * 8L + 4); val c1 = frac(docId * 8L + 5)
      val prog = s"{ $c1 mul exch $c0 mul add 1 exch sub }"
        .getBytes(StandardCharsets.ISO_8859_1)
      ("[/DeviceN [/I0 /I1] /DeviceGray 30 0 R]",
        Seq(streamObj(30, "/FunctionType 4 /Domain [0 1 0 1] " +
          "/Range [0 1] ", prog)),
        Array.tabulate(W * H * 2) { q =>
          val p = q / 2
          val salt = if (q % 2 == 0) 390L else 391L
          (hv(docId * 256L + p, salt) % 256L).toByte
        })
    }
    val indirect = math.floorMod(docId >> 1, 2L) == 1L
    val csDecl =
      if (indirect) "/ColorSpace 7 0 R " else s"/ColorSpace $csArr "
    val paint = s"q ${25 * W} 0 0 ${25 * H} 100 300 cm /Im1 Do Q"
      .getBytes(StandardCharsets.ISO_8859_1)
    assemble(Seq(
      "1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj\n",
      "2 0 obj << /Type /Pages /Kids [10 0 R] /Count 1 >> endobj\n",
      "10 0 obj << /Type /Page /Parent 2 0 R /Contents 100 0 R " +
        "/Resources << /XObject << /Im1 20 0 R >> >> >> endobj\n") ++
      (if (indirect) Seq(s"7 0 obj $csArr endobj\n") else Seq.empty) ++
      fnObjs ++ Seq(
      streamObj(20, s"/Type /XObject /Subtype /Image /Width $W /Height $H " +
        s"$csDecl/BitsPerComponent 8 /Filter /FlateDecode ", deflate(raw)),
      streamObj(100, "", paint)))
  }

  /** Image-only PDF carrying a JPEG 2000 (`/JPXDecode`) payload: a
    * REAL JP2 box stream built by [[Jp2Header.buildJp2]] (signature,
    * ftyp, jp2h/ihdr, a stub jp2c codestream with junk entropy data —
    * never decoded, classified + header-parsed only). The image dict
    * deliberately carries WRONG dims and NO /ColorSpace: PDF 32000-1
    * §7.4.9 says the codestream is authoritative for JPX, so the
    * audit surface must report the header's 48×24 gray, not the
    * dict's lie — a live tripwire for the header parse. */
  def jpxPdf(docId: Long): Array[Byte] = {
    val payload = Jp2Header.buildJp2(48, 24, 1, 8,
      payload = Array.tabulate(64)(i => ((i * 17 + docId) & 0xff).toByte))
    val cs = "q 480 0 0 240 50 400 cm /Im1 Do Q".getBytes(StandardCharsets.ISO_8859_1)
    assemble(Seq(
      "1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj\n",
      "2 0 obj << /Type /Pages /Kids [10 0 R] /Count 1 >> endobj\n",
      "10 0 obj << /Type /Page /Parent 2 0 R /Contents 100 0 R " +
        "/Resources << /XObject << /Im1 20 0 R >> >> >> endobj\n",
      streamObj(20, "/Type /XObject /Subtype /Image /Width 9 /Height 9 " +
        "/BitsPerComponent 8 /Filter /JPXDecode ", payload),
      streamObj(100, "", cs)))
  }

  /** Image-only PDF carrying a SYMBOL-CODED JBIG2 scan — the shape
    * real scanner encoders (Acrobat, Xerox) emit for TEXT pages: a
    * symbol dictionary of glyph bitmaps + a text region placing them
    * ([[Jbig2.encodeText]]). 16×16 page as a 4×4 grid of 4×4
    * "glyphs"; glyph pixels BY FORMULA (salt 356), glyph choice per
    * cell BY FORMULA (salt 357), so the q354 oracle recomputes every
    * page pixel in SQL. ODD doc ids put the dictionary in a separate
    * `/JBIG2Globals` stream object (the shared-dictionary PDF
    * layout); even ids embed it inline — both must decode
    * identically. */
  def jbig2TextPdf(docId: Long): Array[Byte] = {
    val W = 16; val H = 16
    def hv(n: Long, salt: Long): Long =
      graft.operators.Sampling.hashBitsScalar(n, salt)
    val symbols = (0 until 4).map { s =>
      (4, 4, Array.tabulate(16)(p =>
        if (hv(s * 16L + p, 356L) % 2L == 1L) 1.toByte else 0.toByte))
    }
    val placements = for (cy <- 0 until 4; cx <- 0 until 4) yield
      ((hv(docId * 16L + cy * 4 + cx, 357L) % 4L).toInt, cx * 4, cy * 4)
    val globalsSep = math.floorMod(docId, 2L) == 1L
    val (stream, globals) =
      Jbig2.encodeText(W, H, symbols, placements, separateGlobals = globalsSep)
    val dp =
      if (globalsSep) "/DecodeParms << /JBIG2Globals 21 0 R >> " else ""
    val paint = s"q ${25 * W} 0 0 ${25 * H} 100 300 cm /Im1 Do Q"
      .getBytes(StandardCharsets.ISO_8859_1)
    assemble(Seq(
      "1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj\n",
      "2 0 obj << /Type /Pages /Kids [10 0 R] /Count 1 >> endobj\n",
      "10 0 obj << /Type /Page /Parent 2 0 R /Contents 100 0 R " +
        "/Resources << /XObject << /Im1 20 0 R >> >> >> endobj\n") ++
      (if (globalsSep) Seq(streamObj(21, "", globals)) else Seq.empty) ++ Seq(
      streamObj(20, s"/Type /XObject /Subtype /Image /Width $W /Height $H " +
        "/ColorSpace /DeviceGray /BitsPerComponent 1 " +
        s"/Filter /JBIG2Decode $dp", stream),
      streamObj(100, "", paint)))
  }

  /** Image-only PDF carrying a HUFFMAN-CODED JBIG2 text page (T.88
    * SDHUFF=1/SBHUFF=1, standard tables — the mode older hardware
    * encoders emit): same symbol-dictionary + text-region layout as
    * [[jbig2TextPdf]] but with Annex B Huffman integers, runcode
    * symbol-ID codes, and height-class COLLECTIVE bitmaps —
    * MMR-coded for even doc ids, uncompressed for odd (§6.5.9, both
    * real shapes); ids ≡ 2,3 (mod 4) route the dictionary through
    * `/JBIG2Globals`. Glyph pixels BY FORMULA (salt 362), glyph
    * choice per cell BY FORMULA (salt 363) for the q358 oracle. */
  def jbig2HuffPdf(docId: Long): Array[Byte] = {
    val W = 16; val H = 16
    def hv(n: Long, salt: Long): Long =
      graft.operators.Sampling.hashBitsScalar(n, salt)
    val symbols = (0 until 4).map { s =>
      (4, 4, Array.tabulate(16)(p =>
        if (hv(s * 16L + p, 362L) % 2L == 1L) 1.toByte else 0.toByte))
    }
    val placements = for (cy <- 0 until 4; cx <- 0 until 4) yield
      ((hv(docId * 16L + cy * 4 + cx, 363L) % 4L).toInt, cx * 4, cy * 4)
    val mmr = math.floorMod(docId, 2L) == 0L
    val globalsSep = math.floorMod(docId, 4L) >= 2L
    val (stream, globals) = Jbig2.encodeTextHuff(W, H, symbols, placements,
      separateGlobals = globalsSep, mmrCollective = mmr)
    val dp =
      if (globalsSep) "/DecodeParms << /JBIG2Globals 21 0 R >> " else ""
    val paint = s"q ${25 * W} 0 0 ${25 * H} 100 300 cm /Im1 Do Q"
      .getBytes(StandardCharsets.ISO_8859_1)
    assemble(Seq(
      "1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj\n",
      "2 0 obj << /Type /Pages /Kids [10 0 R] /Count 1 >> endobj\n",
      "10 0 obj << /Type /Page /Parent 2 0 R /Contents 100 0 R " +
        "/Resources << /XObject << /Im1 20 0 R >> >> >> endobj\n") ++
      (if (globalsSep) Seq(streamObj(21, "", globals)) else Seq.empty) ++ Seq(
      streamObj(20, s"/Type /XObject /Subtype /Image /Width $W /Height $H " +
        "/ColorSpace /DeviceGray /BitsPerComponent 1 " +
        s"/Filter /JBIG2Decode $dp", stream),
      streamObj(100, "", paint)))
  }

  /** Image-only PDF carrying a JBIG2 page whose regions compose
    * under EXTERNAL combination operators (§7.4.8.5 region-info
    * bits 0-2 — r17, previously ignored as OR): region A (rows 0-11,
    * salt 379) REPLACEs, region B (rows 8-15, salt 380) XORs, region
    * C (the 8×8 center box, salt 381) ANDs, applied in segment order
    * onto a page whose DEFAULT PIXEL is docId % 2 (page flags bit 2).
    * The q364 oracle replays the full sequential composition —
    * a region treated as OR, a skipped default fill, or a wrong
    * application order shifts pixels in the overlap bands. */
  def regionOpsPdf(docId: Long): Array[Byte] = {
    val W = 16; val H = 16
    def hv(n: Long, salt: Long): Long =
      graft.operators.Sampling.hashBitsScalar(n, salt)
    def bit(n: Long, salt: Long): Byte = (hv(n, salt) % 2L).toByte
    val a = Array.tabulate(16 * 12)(p => bit(docId * 192L + p, 379L))
    val b = Array.tabulate(16 * 8)(p => bit(docId * 128L + p, 380L))
    val c = Array.tabulate(8 * 8)(p => bit(docId * 64L + p, 381L))
    val defPx = math.floorMod(docId, 2L).toInt
    val stream = Jbig2.encodeRegions(W, H,
      Seq((0, 0, 16, 12, a), (0, 8, 16, 8, b), (4, 4, 8, 8, c)),
      ops = Seq(4, 2, 1), pageDefPixel = defPx)
    val paint = s"q ${25 * W} 0 0 ${25 * H} 100 300 cm /Im1 Do Q"
      .getBytes(StandardCharsets.ISO_8859_1)
    assemble(Seq(
      "1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj\n",
      "2 0 obj << /Type /Pages /Kids [10 0 R] /Count 1 >> endobj\n",
      "10 0 obj << /Type /Page /Parent 2 0 R /Contents 100 0 R " +
        "/Resources << /XObject << /Im1 20 0 R >> >> >> endobj\n",
      streamObj(20, s"/Type /XObject /Subtype /Image /Width $W /Height $H " +
        "/ColorSpace /DeviceGray /BitsPerComponent 1 " +
        "/Filter /JBIG2Decode ", stream),
      streamObj(100, "", paint)))
  }

  /** Image-only PDF carrying a JBIG2 text page exercising the §6.4.5
    * PLACEMENT MODES (r17): transposed placement and all four
    * reference corners (mode = docId % 8: transposed = mode ≥ 4,
    * corner = mode % 4), XOR composition over an OVERLAPPING 5×5
    * glyph grid (stride 3, so interior pixels are covered twice and
    * the op algebra is observable), SBDEFPIXEL = (docId >> 3) & 1,
    * strip height cycling by (docId >> 4) % 4. The decoded page is
    * the same whatever the mode — the WIRE encoding differs
    * completely — so the q363 oracle replays pure geometry:
    * pixel = (defpixel + Σ covering glyph bits) mod 2 (glyph salt
    * 374, choice salt 375). */
  def jbig2ModesPdf(docId: Long): Array[Byte] = {
    val W = 16; val H = 16
    def hv(n: Long, salt: Long): Long =
      graft.operators.Sampling.hashBitsScalar(n, salt)
    val symbols = (0 until 4).map { s =>
      (4, 4, Array.tabulate(16)(p =>
        if (hv(s * 16L + p, 374L) % 2L == 1L) 1.toByte else 0.toByte))
    }
    val placements = for (gy <- 0 until 5; gx <- 0 until 5) yield
      ((hv(docId * 32L + gy * 5 + gx, 375L) % 4L).toInt, gx * 3, gy * 3)
    val mode = math.floorMod(docId, 8L).toInt
    val transposed = mode >= 4
    val corner = mode % 4
    val defPixel = math.floorMod(docId >> 3, 2L).toInt
    val logStrips = math.floorMod(docId >> 4, 4L).toInt
    val (stream, _) = Jbig2.encodeText(W, H, symbols, placements,
      logStrips = logStrips, refCorner = corner, transposed = transposed,
      combOp = 2, defPixel = defPixel)
    val paint = s"q ${25 * W} 0 0 ${25 * H} 100 300 cm /Im1 Do Q"
      .getBytes(StandardCharsets.ISO_8859_1)
    assemble(Seq(
      "1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj\n",
      "2 0 obj << /Type /Pages /Kids [10 0 R] /Count 1 >> endobj\n",
      "10 0 obj << /Type /Page /Parent 2 0 R /Contents 100 0 R " +
        "/Resources << /XObject << /Im1 20 0 R >> >> >> endobj\n",
      streamObj(20, s"/Type /XObject /Subtype /Image /Width $W /Height $H " +
        "/ColorSpace /DeviceGray /BitsPerComponent 1 " +
        "/Filter /JBIG2Decode ", stream),
      streamObj(100, "", paint)))
  }

  /** Image-only PDF carrying a JBIG2 text page whose Huffman tables
    * are CUSTOM (T.88 §7.4.13 type-53 table segments, the §B.2
    * assembly): all six selectable tables — DH/DW/BMSIZE on the
    * dictionary, FS/DS/DT on the text region — arrive as referred
    * table segments with selector 3 (B-flag 1 for BMSIZE), the shape
    * [[Jbig2.decode]] previously declined. Same page layout as
    * [[jbig2HuffPdf]]; collective bitmaps MMR for even ids,
    * uncompressed for odd; ids ≡ 2,3 (mod 4) route the dictionary
    * AND its tables through `/JBIG2Globals`. Glyph pixels BY FORMULA
    * (salt 372), glyph choice per cell BY FORMULA (salt 373) for the
    * q362 oracle. */
  def jbig2CustomTablePdf(docId: Long): Array[Byte] = {
    val W = 16; val H = 16
    def hv(n: Long, salt: Long): Long =
      graft.operators.Sampling.hashBitsScalar(n, salt)
    val symbols = (0 until 4).map { s =>
      (4, 4, Array.tabulate(16)(p =>
        if (hv(s * 16L + p, 372L) % 2L == 1L) 1.toByte else 0.toByte))
    }
    val placements = for (cy <- 0 until 4; cx <- 0 until 4) yield
      ((hv(docId * 16L + cy * 4 + cx, 373L) % 4L).toInt, cx * 4, cy * 4)
    val mmr = math.floorMod(docId, 2L) == 0L
    val globalsSep = math.floorMod(docId, 4L) >= 2L
    val (stream, globals) = Jbig2.encodeTextHuff(W, H, symbols, placements,
      separateGlobals = globalsSep, mmrCollective = mmr, customTables = true)
    val dp =
      if (globalsSep) "/DecodeParms << /JBIG2Globals 21 0 R >> " else ""
    val paint = s"q ${25 * W} 0 0 ${25 * H} 100 300 cm /Im1 Do Q"
      .getBytes(StandardCharsets.ISO_8859_1)
    assemble(Seq(
      "1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj\n",
      "2 0 obj << /Type /Pages /Kids [10 0 R] /Count 1 >> endobj\n",
      "10 0 obj << /Type /Page /Parent 2 0 R /Contents 100 0 R " +
        "/Resources << /XObject << /Im1 20 0 R >> >> >> endobj\n") ++
      (if (globalsSep) Seq(streamObj(21, "", globals)) else Seq.empty) ++ Seq(
      streamObj(20, s"/Type /XObject /Subtype /Image /Width $W /Height $H " +
        "/ColorSpace /DeviceGray /BitsPerComponent 1 " +
        s"/Filter /JBIG2Decode $dp", stream),
      streamObj(100, "", paint)))
  }

  /** Image-only PDF carrying a REFINEMENT-CODED JBIG2 text page
    * (SDREFAGG=1, §6.3 template 1 — the lossy-to-lossless chain):
    * dictionary A holds 4 base glyphs (salt 365), dictionary B
    * refines each into a variant (pixels flipped where salt-366
    * mix ≡ 0 mod 4), and the text region places among all 8 (choice
    * salt 367 mod 8). Odd doc ids route BOTH dictionaries through
    * `/JBIG2Globals`. The q360 oracle replays every page pixel. */
  def jbig2RefinedPdf(docId: Long): Array[Byte] = {
    val W = 16; val H = 16
    def hv(n: Long, salt: Long): Long =
      graft.operators.Sampling.hashBitsScalar(n, salt)
    val base = (0 until 4).map { s =>
      (4, 4, Array.tabulate(16)(p =>
        if (hv(s * 16L + p, 365L) % 2L == 1L) 1.toByte else 0.toByte))
    }
    val refined = (0 until 4).map { s =>
      val bpx = base(s)._3
      val t = Array.tabulate(16) { p =>
        val flip = if (hv(s * 16L + p, 366L) % 4L == 0L) 1 else 0
        (((bpx(p) & 1) + flip) % 2).toByte
      }
      (4, 4, t, s, (s % 3) - 1, (s % 2))      // varied reference offsets
    }
    val placements = for (cy <- 0 until 4; cx <- 0 until 4) yield
      ((hv(docId * 16L + cy * 4 + cx, 367L) % 8L).toInt, cx * 4, cy * 4)
    val globalsSep = math.floorMod(docId, 2L) == 1L
    // ids ≡ 2,3 (mod 4) code the refining dictionary under GRTEMPLATE
    // 0 (the 13-bit AT-carrying context — r17); others template 1.
    // Same pixels either way: the q360 oracle is template-blind.
    val rtemplate = if (math.floorMod(docId, 4L) >= 2L) 0 else 1
    val (stream, globals) = Jbig2.encodeTextRefined(W, H, base, refined,
      placements, separateGlobals = globalsSep, rtemplate = rtemplate)
    val dp =
      if (globalsSep) "/DecodeParms << /JBIG2Globals 21 0 R >> " else ""
    val paint = s"q ${25 * W} 0 0 ${25 * H} 100 300 cm /Im1 Do Q"
      .getBytes(StandardCharsets.ISO_8859_1)
    assemble(Seq(
      "1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj\n",
      "2 0 obj << /Type /Pages /Kids [10 0 R] /Count 1 >> endobj\n",
      "10 0 obj << /Type /Page /Parent 2 0 R /Contents 100 0 R " +
        "/Resources << /XObject << /Im1 20 0 R >> >> >> endobj\n") ++
      (if (globalsSep) Seq(streamObj(21, "", globals)) else Seq.empty) ++ Seq(
      streamObj(20, s"/Type /XObject /Subtype /Image /Width $W /Height $H " +
        "/ColorSpace /DeviceGray /BitsPerComponent 1 " +
        s"/Filter /JBIG2Decode $dp", stream),
      streamObj(100, "", paint)))
  }

  /** Image-only PDF carrying a JBIG2 text page with PER-INSTANCE
    * refinement (SBREFINE=1, §6.4.11 — r17): each 4×4 cell places a
    * glyph (choice salt 384) either directly (IARI=0) or refined
    * into its variant (refine flag salt 385; variant = glyph XOR
    * flips where salt-383 mix ≡ 0 mod 4; reference offsets vary by
    * glyph). GRTEMPLATE = docId % 2; ids with bit 1 set route the
    * dictionary through `/JBIG2Globals`. Glyph pixels salt 382. The
    * q365 oracle replays every page pixel. */
  def jbig2InstRefinedPdf(docId: Long): Array[Byte] = {
    val W = 16; val H = 16
    def hv(n: Long, salt: Long): Long =
      graft.operators.Sampling.hashBitsScalar(n, salt)
    val symbols = (0 until 4).map { s =>
      (4, 4, Array.tabulate(16)(p =>
        if (hv(s * 16L + p, 382L) % 2L == 1L) 1.toByte else 0.toByte))
    }
    val cells = for (cy <- 0 until 4; cx <- 0 until 4) yield (cx, cy)
    val placements = cells.map { case (cx, cy) =>
      ((hv(docId * 16L + cy * 4 + cx, 384L) % 4L).toInt, cx * 4, cy * 4)
    }
    val variants = cells.zip(placements).map { case ((cx, cy), (k, _, _)) =>
      if (hv(docId * 16L + cy * 4 + cx, 385L) % 2L == 1L) {
        val g = symbols(k)._3
        val v = Array.tabulate(16) { p =>
          val flip = if (hv(k * 16L + p, 383L) % 4L == 0L) 1 else 0
          (((g(p) & 1) + flip) % 2).toByte
        }
        Some((v, (k % 3) - 1, k % 2))
      } else None
    }
    val rtemplate = math.floorMod(docId, 2L).toInt
    val globalsSep = math.floorMod(docId >> 1, 2L) == 1L
    val (stream, globals) = Jbig2.encodeTextInstRefined(W, H, symbols,
      placements, variants, rtemplate, globalsSep)
    val dp =
      if (globalsSep) "/DecodeParms << /JBIG2Globals 21 0 R >> " else ""
    val paint = s"q ${25 * W} 0 0 ${25 * H} 100 300 cm /Im1 Do Q"
      .getBytes(StandardCharsets.ISO_8859_1)
    assemble(Seq(
      "1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj\n",
      "2 0 obj << /Type /Pages /Kids [10 0 R] /Count 1 >> endobj\n",
      "10 0 obj << /Type /Page /Parent 2 0 R /Contents 100 0 R " +
        "/Resources << /XObject << /Im1 20 0 R >> >> >> endobj\n") ++
      (if (globalsSep) Seq(streamObj(21, "", globals)) else Seq.empty) ++ Seq(
      streamObj(20, s"/Type /XObject /Subtype /Image /Width $W /Height $H " +
        "/ColorSpace /DeviceGray /BitsPerComponent 1 " +
        s"/Filter /JBIG2Decode $dp", stream),
      streamObj(100, "", paint)))
  }

  /** Image-only PDF carrying a JBIG2 text page whose dictionary uses
    * MULTI-AGGREGATE refinement (REFAGGNINST = 2, §6.5.8.2.2 — r17):
    * aggregate j is a 4×4 text region OR-ing two refined instances —
    * base glyph j (flips salt 387) and base glyph (j+1) mod 4 (flips
    * salt 388) — both at (0,0); the page places aggregates by cell
    * choice salt 389. GRTEMPLATE = docId % 2; ids with bit 1 set
    * route both dictionaries through `/JBIG2Globals`. Base glyph
    * pixels salt 386. The q366 oracle replays every page pixel. */
  def jbig2AggPdf(docId: Long): Array[Byte] = {
    val W = 16; val H = 16
    def hv(n: Long, salt: Long): Long =
      graft.operators.Sampling.hashBitsScalar(n, salt)
    val base = (0 until 4).map { s =>
      (4, 4, Array.tabulate(16)(p =>
        if (hv(s * 16L + p, 386L) % 2L == 1L) 1.toByte else 0.toByte))
    }
    val aggregates = (0 until 4).map { j =>
      def variant(bi: Int, salt: Long): Array[Byte] = {
        val g = base(bi)._3
        Array.tabulate(16) { p =>
          val flip = if (hv(j * 16L + p, salt) % 4L == 0L) 1 else 0
          (((g(p) & 1) + flip) % 2).toByte
        }
      }
      (4, 4, Seq(
        (j, 0, 0, variant(j, 387L)),
        ((j + 1) % 4, 0, 0, variant((j + 1) % 4, 388L))))
    }
    val placements = for (cy <- 0 until 4; cx <- 0 until 4) yield
      ((hv(docId * 16L + cy * 4 + cx, 389L) % 4L).toInt, cx * 4, cy * 4)
    val rtemplate = math.floorMod(docId, 2L).toInt
    val globalsSep = math.floorMod(docId >> 1, 2L) == 1L
    val (stream, globals) = Jbig2.encodeTextAggregate(W, H, base,
      aggregates, placements, rtemplate, globalsSep)
    val dp =
      if (globalsSep) "/DecodeParms << /JBIG2Globals 21 0 R >> " else ""
    val paint = s"q ${25 * W} 0 0 ${25 * H} 100 300 cm /Im1 Do Q"
      .getBytes(StandardCharsets.ISO_8859_1)
    assemble(Seq(
      "1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj\n",
      "2 0 obj << /Type /Pages /Kids [10 0 R] /Count 1 >> endobj\n",
      "10 0 obj << /Type /Page /Parent 2 0 R /Contents 100 0 R " +
        "/Resources << /XObject << /Im1 20 0 R >> >> >> endobj\n") ++
      (if (globalsSep) Seq(streamObj(21, "", globals)) else Seq.empty) ++ Seq(
      streamObj(20, s"/Type /XObject /Subtype /Image /Width $W /Height $H " +
        "/ColorSpace /DeviceGray /BitsPerComponent 1 " +
        s"/Filter /JBIG2Decode $dp", stream),
      streamObj(100, "", paint)))
  }

  /** Image-only PDF carrying a TWO-PASS JBIG2 page (§7.4.7 — r17):
    * a 16×16 base raster (salt 393) followed by a REFINEMENT REGION
    * segment that replaces the 8×8 center box with a variant (flips
    * where salt-394 mix ≡ 0 mod 4), coded against the composed page
    * beneath it — the progressive layout real encoders emit for
    * lossy-to-lossless. TPGRON on for odd ids; GRTEMPLATE cycles by
    * bit 1. The q368 oracle replays the final page: skipping the
    * refinement pass (the old behavior) leaves base pixels in the
    * box and every odd hash shifts. */
  def jbig2RefineRegionPdf(docId: Long): Array[Byte] = {
    val W = 16; val H = 16
    def hv(n: Long, salt: Long): Long =
      graft.operators.Sampling.hashBitsScalar(n, salt)
    val base = Array.tabulate(W * H) { p =>
      (hv(docId * 256L + p, 393L) % 2L).toByte
    }
    val target = Array.tabulate(8 * 8) { q =>
      val p = (4 + q / 8) * W + (4 + q % 8)
      val flip = if (hv(docId * 64L + q, 394L) % 4L == 0L) 1 else 0
      (((base(p) & 1) + flip) % 2).toByte
    }
    val tpgron = math.floorMod(docId, 2L) == 1L
    val template = math.floorMod(docId >> 1, 2L).toInt
    val stream = Jbig2.encodeWithRefinementRegion(base, W, H,
      4, 4, 8, 8, target, template, tpgron)
    val paint = s"q ${25 * W} 0 0 ${25 * H} 100 300 cm /Im1 Do Q"
      .getBytes(StandardCharsets.ISO_8859_1)
    assemble(Seq(
      "1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj\n",
      "2 0 obj << /Type /Pages /Kids [10 0 R] /Count 1 >> endobj\n",
      "10 0 obj << /Type /Page /Parent 2 0 R /Contents 100 0 R " +
        "/Resources << /XObject << /Im1 20 0 R >> >> >> endobj\n",
      streamObj(20, s"/Type /XObject /Subtype /Image /Width $W /Height $H " +
        "/ColorSpace /DeviceGray /BitsPerComponent 1 " +
        "/Filter /JBIG2Decode ", stream),
      streamObj(100, "", paint)))
  }

  /** Image-only PDF carrying a STRIPED JBIG2 page (§7.4.8.5:
    * unknown-height page info + per-stripe regions + end-of-stripe
    * segments — the layout scanners emit at large page sizes).
    * Pixels BY FORMULA (salt 364), stripe height cycles 1-6 by doc
    * id (including heights that don't divide the page) — the q359
    * oracle replays the pixels, so a stripe mis-composition or a
    * height finalized short shifts the hash. */
  def stripedJbig2Pdf(docId: Long): Array[Byte] = {
    val W = 16; val H = 16
    val px = Array.tabulate(W * H) { p =>
      (graft.operators.Sampling.hashBitsScalar(docId * 256L + p, 364L) % 2L).toByte
    }
    val stripeH = 1 + math.floorMod(docId, 6L).toInt
    val stream = Jbig2.encodeStriped(px, W, H, stripeH)
    val paint = s"q ${25 * W} 0 0 ${25 * H} 100 300 cm /Im1 Do Q"
      .getBytes(StandardCharsets.ISO_8859_1)
    assemble(Seq(
      "1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj\n",
      "2 0 obj << /Type /Pages /Kids [10 0 R] /Count 1 >> endobj\n",
      "10 0 obj << /Type /Page /Parent 2 0 R /Contents 100 0 R " +
        "/Resources << /XObject << /Im1 20 0 R >> >> >> endobj\n",
      streamObj(20, s"/Type /XObject /Subtype /Image /Width $W /Height $H " +
        "/ColorSpace /DeviceGray /BitsPerComponent 1 " +
        "/Filter /JBIG2Decode ", stream),
      streamObj(100, "", paint)))
  }

  /** Image-only PDF whose raster is an INLINE image (`BI … ID … EI`,
    * abbreviated keys, Flate-compressed data INSIDE a Flate-compressed
    * content stream) — the second raster carrier, PDF 32000-1 §8.9.7.
    * Pixels by formula (hashBits salt 351, gray), so the q351 oracle
    * replays the whole nested decode in SQL. */
  def inlineImagePdf(docId: Long): Array[Byte] = {
    val W = 16; val H = 16
    val px = Array.tabulate(W * H) { p =>
      (graft.operators.Sampling.hashBitsScalar(docId * 256L + p, 351L) % 256L).toByte
    }
    val cs = s"q ${25 * W} 0 0 ${25 * H} 100 300 cm " +
      s"BI /W $W /H $H /BPC 8 /CS /G /F /Fl ID " +
      new String(deflate(px), StandardCharsets.ISO_8859_1) +
      " EI Q"
    assemble(Seq(
      "1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj\n",
      "2 0 obj << /Type /Pages /Kids [10 0 R] /Count 1 >> endobj\n",
      "10 0 obj << /Type /Page /Parent 2 0 R /Contents 100 0 R >> endobj\n",
      streamObj(100, "/Filter /FlateDecode ",
        deflate(cs.getBytes(StandardCharsets.ISO_8859_1)))))
  }

  /** REAL RC4-encrypted PDF (standard security handler, V2/R3,
    * 128-bit): a [[simple]] body whose stream payloads are encrypted
    * in place under spec per-object keys — the forward pass of
    * [[PdfCrypt]]'s algorithms 1/2/3/5. With the default EMPTY user
    * password the file is readable by design (any viewer opens it
    * silently; `PdfCrypt.decryptStreams` recovers the text layer →
    * `pdf_decrypted`); with a real `userPwd` the /U check fails for
    * the empty password and the document stays ciphertext →
    * `pdf_encrypted`. Fail-closed either way: a regression that
    * skips the crypto path finds only ciphertext and extracts
    * nothing. */
  def encrypted(text: String, userPwd: String = ""): Array[Byte] =
    encryptedFrom(simple(text), text, userPwd)

  /** RC4-encrypt ANY assembled linear fixture (streams rewritten in
    * place under spec per-object keys; `/Encrypt` appended as object
    * 9 — free in every PdfGen layout). [[encrypted]] wraps the text
    * fixture; [[encryptedRaster]] wraps the scanned shape. */
  private[pipeline] def encryptedFrom(
      plain: Array[Byte], idSeed: String, userPwd: String): Array[Byte] = {
    val r = 3; val v = 2; val len = 128; val perms = -44
    val id0 = PdfCrypt.md5(idSeed.getBytes(StandardCharsets.UTF_8))
    val pwd = userPwd.getBytes(StandardCharsets.ISO_8859_1)
    val o = PdfCrypt.computeO(Array.empty, pwd, r, len)
    val sec = PdfCrypt.StdSecurity(r, v, len, o, Array.empty, perms, id0)
    val fk = PdfCrypt.fileKey(sec, pwd)
    val u = PdfCrypt.computeU(fk, id0, r)
    def hex(b: Array[Byte]) = b.map(x => f"${x & 0xff}%02x").mkString
    val tail =
      s"9 0 obj << /Filter /Standard /V $v /R $r /Length $len /P $perms " +
        s"/O <${hex(o)}> /U <${hex(u)}> >> endobj\n" +
      "trailer << /Size 10 /Root 1 0 R /Encrypt 9 0 R " +
        s"/ID [<${hex(id0)}> <${hex(id0)}>] >>\nstartxref\n0\n%%EOF\n"
    val assembledPlain =
      new String(plain, StandardCharsets.ISO_8859_1).replace("%%EOF\n", tail)
        .getBytes(StandardCharsets.ISO_8859_1)
    PdfCrypt.encryptStreams(assembledPlain, fk)
  }

  /** ENCRYPTED scanned document: [[rasterPdf]]'s image-only body
    * under standard-handler RC4 — readable by design with the empty
    * password, but carrying NO text layer, so the decrypt leg must
    * fall through to IMAGE extraction over the decrypted bytes
    * (routing: `pdf_image`, not `pdf_encrypted`). */
  def encryptedRaster(docId: Long, userPwd: String = ""): Array[Byte] =
    encryptedFrom(rasterPdf(docId), s"raster:$docId", userPwd)

  /** REAL AES-128-CBC encrypted PDF (standard handler V4/R4 with the
    * /AESV2 crypt filter — the most common readable-by-design
    * encryption in modern corpora): stream payloads are IV‖ciphertext
    * with PKCS#5 padding, assembled at their encrypted lengths (AES
    * grows payloads, so unlike the RC4 fixture this builds the
    * document around the ciphertext rather than rewriting in place).
    * Empty `userPwd` ⇒ `pdf_decrypted`; a real one ⇒ `pdf_encrypted`. */
  def encryptedAes(text: String, userPwd: String = ""): Array[Byte] = {
    val r = 4; val v = 4; val len = 128; val perms = -44
    val id0 = PdfCrypt.md5(("aes:" + text).getBytes(StandardCharsets.UTF_8))
    val pwd = userPwd.getBytes(StandardCharsets.ISO_8859_1)
    val o = PdfCrypt.computeO(Array.empty, pwd, r, len)
    val sec = PdfCrypt.StdSecurity(r, v, len, o, Array.empty, perms, id0,
      aes = true, encryptMetadata = true)
    val fk = PdfCrypt.fileKey(sec, pwd)
    val u = PdfCrypt.computeU(fk, id0, r)
    def hex(b: Array[Byte]) = b.map(x => f"${x & 0xff}%02x").mkString
    def encStream(num: Int, dictExtra: String, plain: Array[Byte]): String =
      streamObj(num,
        dictExtra, PdfCrypt.aesEncrypt(PdfCrypt.objectKey(fk, num, 0, aes = true), plain))
    val pages = text.split('\f').toSeq
    val head = Seq(
      "1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj\n",
      s"2 0 obj << /Type /Pages /Kids [${pages.indices.map(i => s"${10 + i} 0 R").mkString(" ")}] /Count ${pages.size} >> endobj\n",
      "5 0 obj << /Type /Font /Subtype /Type1 /BaseFont /Helvetica >> endobj\n")
    val body = pages.zipWithIndex.flatMap { case (p, i) =>
      val cs = contentOps(
        p.split('\n').map(_.trim).filter(_.nonEmpty).toSeq.map(l => s"(${esc(l)})"))
      Seq(
        s"${10 + i} 0 obj << /Type /Page /Parent 2 0 R /Contents ${100 + i} 0 R " +
          "/Resources << /Font << /F1 5 0 R >> >> >> endobj\n",
        encStream(100 + i, "/Filter /FlateDecode ",
          deflate(cs.getBytes(StandardCharsets.ISO_8859_1))))
    }
    val tail =
      s"9 0 obj << /Filter /Standard /V $v /R $r /Length $len /P $perms " +
        "/CF << /StdCF << /CFM /AESV2 /AuthEvent /DocOpen /Length 16 >> >> " +
        "/StmF /StdCF /StrF /StdCF " +
        s"/O <${hex(o)}> /U <${hex(u)}> >> endobj\n" +
      "trailer << /Size 10 /Root 1 0 R /Encrypt 9 0 R " +
        s"/ID [<${hex(id0)}> <${hex(id0)}>] >>\nstartxref\n0\n%%EOF\n"
    val bos = new java.io.ByteArrayOutputStream()
    bos.write("%PDF-1.6\n".getBytes(StandardCharsets.ISO_8859_1))
    (head ++ body).foreach(x => bos.write(x.getBytes(StandardCharsets.ISO_8859_1)))
    bos.write(tail.getBytes(StandardCharsets.ISO_8859_1))
    bos.toByteArray
  }

  /** REAL AES-256 encrypted PDF (standard handler V5 with the /AESV3
    * crypt filter, R 6 by default — the CURRENT writer default): one
    * file key for every stream (no per-object derivation at V5),
    * /U‖/UE computed with the ISO 32000-2 Algorithm 2.B hardened hash
    * (R 5 uses the plain-SHA-256 pre-ISO derivation), /Perms carrying
    * the spec's `adb` marker. Empty `userPwd` ⇒ readable by design
    * (`pdf_decrypted`); a real one ⇒ `pdf_encrypted`. `xrefTail`
    * emits the encryption reference in a `/Type /XRef` STREAM
    * dictionary instead of a `trailer` keyword — the xref-stream-only
    * container every modern writer produces, which a trailer-only
    * parser never sees. */
  def encryptedAes256(
      text: String, userPwd: String = "", r: Int = 6,
      xrefTail: Boolean = false): Array[Byte] = {
    val v = 5; val perms = -44
    val pwd = userPwd.getBytes(StandardCharsets.ISO_8859_1)
    val fk = PdfCrypt.md5(("v5:" + text).getBytes(StandardCharsets.UTF_8)) ++
      PdfCrypt.md5(("v5b:" + text).getBytes(StandardCharsets.UTF_8))
    val (u, ue, o, oe, permsV5) =
      PdfCrypt.computeV5Entries(r, fk, perms, pwd, pwd)
    val id0 = PdfCrypt.md5(("v5id:" + text).getBytes(StandardCharsets.UTF_8))
    def hex(b: Array[Byte]) = b.map(x => f"${x & 0xff}%02x").mkString
    def encStream(num: Int, dictExtra: String, plain: Array[Byte]): String =
      streamObj(num, dictExtra,
        PdfCrypt.aesEncrypt(fk, plain, Array((num & 0xff).toByte)))
    val pages = text.split('\f').toSeq
    val head = Seq(
      "1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj\n",
      s"2 0 obj << /Type /Pages /Kids [${pages.indices.map(i => s"${10 + i} 0 R").mkString(" ")}] /Count ${pages.size} >> endobj\n",
      "5 0 obj << /Type /Font /Subtype /Type1 /BaseFont /Helvetica >> endobj\n")
    val body = pages.zipWithIndex.flatMap { case (p, i) =>
      val cs = contentOps(
        p.split('\n').map(_.trim).filter(_.nonEmpty).toSeq.map(l => s"(${esc(l)})"))
      Seq(
        s"${10 + i} 0 obj << /Type /Page /Parent 2 0 R /Contents ${100 + i} 0 R " +
          "/Resources << /Font << /F1 5 0 R >> >> >> endobj\n",
        encStream(100 + i, "/Filter /FlateDecode ",
          deflate(cs.getBytes(StandardCharsets.ISO_8859_1))))
    }
    val encDict =
      s"9 0 obj << /Filter /Standard /V $v /R $r /Length 256 /P $perms " +
        "/CF << /StdCF << /CFM /AESV3 /AuthEvent /DocOpen /Length 32 >> >> " +
        "/StmF /StdCF /StrF /StdCF " +
        s"/O <${hex(o)}> /U <${hex(u)}> /OE <${hex(oe)}> /UE <${hex(ue)}> " +
        s"/Perms <${hex(permsV5)}> >> endobj\n"
    val tail =
      if (!xrefTail)
        encDict +
          "trailer << /Size 10 /Root 1 0 R /Encrypt 9 0 R " +
          s"/ID [<${hex(id0)}> <${hex(id0)}>] >>\nstartxref\n0\n%%EOF\n"
      else {
        // xref STREAM container: /Encrypt + /ID live in the stream
        // dict; the (plaintext — xref streams are never encrypted)
        // payload is a token deflate blob, unused by the linear scan
        val xr = deflate(Array[Byte](0, 0, 0))
        encDict +
          streamObj(8,
            "/Type /XRef /Size 10 /W [1 2 1] /Root 1 0 R /Encrypt 9 0 R " +
              s"/ID [<${hex(id0)}> <${hex(id0)}>] /Filter /FlateDecode ", xr) +
          "startxref\n0\n%%EOF\n"
      }
    val bos = new java.io.ByteArrayOutputStream()
    bos.write("%PDF-1.7\n".getBytes(StandardCharsets.ISO_8859_1))
    (head ++ body).foreach(x => bos.write(x.getBytes(StandardCharsets.ISO_8859_1)))
    bos.write(tail.getBytes(StandardCharsets.ISO_8859_1))
    bos.toByteArray
  }

  /** Char → AGL glyph name, inverted from the extractor's own table
    * (single-codepoint values only) — fixture-side counterpart of
    * [[PdfTextPartitioner.glyphToText]]. */
  private lazy val glyphNameFor: Map[Char, String] =
    PdfTextPartitioner.GlyphNames.collect {
      case (n, v) if v.length == 1 => v.head -> n
    }

  /** Simple-font PDF whose `/Encoding /Differences` array remaps the
    * text's distinct chars to codes 161+ (TeX Type1 subset shape): a
    * parser that ignores the remap emits high-Latin-1 mojibake, one
    * that honors it recovers the text. Chars without a known glyph
    * name fall back to '?'. With `unknownGlyphs`, every name becomes
    * a `gNN` subset-private glyph — no text must extract (the
    * document falls to the OCR seam rather than emitting raw
    * bytes). Texts with > 90 distinct chars fall back to [[simple]]
    * (the code space above 160 is exhausted). */
  def differences(text: String, unknownGlyphs: Boolean = false): Array[Byte] = {
    val lines = text.split('\n').map(_.trim).filter(_.nonEmpty).toSeq
    val safe = lines.map(_.map(c =>
      if (glyphNameFor.contains(c)) c else '?'))
    val chars = safe.mkString.distinct
    if (chars.length > 90) return simple(text)
    val code: Map[Char, Int] = chars.zipWithIndex
      .map { case (c, i) => c -> (161 + i) }.toMap
    val names = chars.zipWithIndex.map { case (c, i) =>
      if (unknownGlyphs) s"g${40 + i}" else glyphNameFor(c) }
    val diffs = s"161 ${names.map("/" + _).mkString(" ")}"
    def encShow(line: String): String =
      "(" + line.map(c => code(c).toChar).flatMap {
        case '\\' => "\\\\"
        case '(' => "\\("
        case ')' => "\\)"
        case c => c.toString
      } + ")"
    val cs = contentOps(safe.map(encShow))
    assemble(Seq(
      "1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj\n",
      "2 0 obj << /Type /Pages /Kids [10 0 R] /Count 1 >> endobj\n",
      "5 0 obj << /Type /Font /Subtype /Type1 /BaseFont /GRAFT+Diff " +
        s"/Encoding << /Type /Encoding /Differences [ $diffs ] >> >> endobj\n",
      "10 0 obj << /Type /Page /Parent 2 0 R /Contents 100 0 R " +
        "/Resources << /Font << /F1 5 0 R >> >> >> endobj\n",
      streamObj(100, "/Filter /FlateDecode ",
        deflate(cs.getBytes(StandardCharsets.ISO_8859_1)))))
  }

  /** Simple-font PDF declaring `/Encoding /WinAnsiEncoding`, show
    * strings encoded as CP1252 bytes — typographic quotes, dashes,
    * and the € sign land in 0x80-0x9F, where a Latin-1-only parser
    * reads INVISIBLE control characters (silent corruption, the worst
    * failure mode). Chars outside CP1252 fall back to '?'. */
  def winAnsi(text: String): Array[Byte] = {
    val cp = java.nio.charset.Charset.forName("windows-1252")
    val enc = cp.newEncoder()
    val lines = text.split('\n').map(_.trim).filter(_.nonEmpty).toSeq
    def show(l: String): String = {
      val safe = l.map(c => if (enc.canEncode(c)) c else '?')
      "(" + new String(safe.getBytes(cp), StandardCharsets.ISO_8859_1).flatMap {
        case '\\' => "\\\\"
        case '(' => "\\("
        case ')' => "\\)"
        case c => c.toString
      } + ")"
    }
    val cs = contentOps(lines.map(show))
    assemble(Seq(
      "1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj\n",
      "2 0 obj << /Type /Pages /Kids [10 0 R] /Count 1 >> endobj\n",
      "5 0 obj << /Type /Font /Subtype /Type1 /BaseFont /Helvetica " +
        "/Encoding /WinAnsiEncoding >> endobj\n",
      "10 0 obj << /Type /Page /Parent 2 0 R /Contents 100 0 R " +
        "/Resources << /Font << /F1 5 0 R >> >> >> endobj\n",
      streamObj(100, "/Filter /FlateDecode ",
        deflate(cs.getBytes(StandardCharsets.ISO_8859_1)))))
  }

  /** Append an incremental update that REDEFINES `objNum` with a new
    * Flate content stream showing `newText` — the PDF 32000-1 §7.5.6
    * shape (replacement objects appended after the original body and
    * `%%EOF`). Extraction must see ONLY the new text for that object:
    * the last definition in the byte stream is the visible one. */
  def withUpdatedContent(
      pdf: Array[Byte], objNum: Int, newText: String): Array[Byte] = {
    val cs = contentOps(newText.split('\n').map(_.trim)
      .filter(_.nonEmpty).toSeq.map(l => s"(${esc(l)})"))
    val upd = streamObj(objNum, "/Filter /FlateDecode ",
      deflate(cs.getBytes(StandardCharsets.ISO_8859_1))) +
      "trailer << /Size 200 /Root 1 0 R /Prev 9 >>\nstartxref\n0\n%%EOF\n"
    pdf ++ upd.getBytes(StandardCharsets.ISO_8859_1)
  }

  /** Deterministic per-document container choice for the pipeline's
    * extraction-audit demo: doc_id mod 8 cycles composite-font PDF,
    * simple PDF, predictor-encoded PDF, plain UTF-8 bytes,
    * object-stream PDF, filter-chain PDF (LZW/A85+Flate/AHx),
    * image-only PDF, encrypted PDF — so one run exercises every
    * [[ExtractPath]]: mods 0-2 and 4-5 ⇒ pdf_text (slots 1-2
    * alternate by mod 16 into the WinAnsi and /Differences encodings
    * — still pdf_text, so the audit oracle is unchanged while both
    * decode legs stay live), 3 ⇒ non_pdf,
    * 6 ⇒ pdf_image; slot 7 cycles by doc_id mod 32 over BOTH crypto
    * families — empty-password RC4 (7) and empty-password AES-256
    * V5/R6 behind an xref-stream container (23), both ⇒
    * pdf_decrypted; password-locked RC4 (15) and password-locked V5
    * (31), both ⇒ pdf_encrypted. The q344 oracle's mod-16 routing
    * (7 ⇒ decrypted, 15 ⇒ encrypted) is UNCHANGED because the labels
    * are: a regression in either crypto family shifts its mod-32
    * residue class across buckets and the audit row set stops
    * matching. */
  def demo(docId: Long, text: String): Array[Byte] = {
    // a blank/whitespace document still gets a NON-EMPTY container —
    // a PDF with zero show operators would extract nothing and route
    // to pdf_fallback, silently diverging from q344's deterministic
    // mod-8 routing oracle (which says text-bearing mods ⇒ pdf_text
    // unconditionally); stamping the id keeps the container honest
    // and the routing total
    val t = if (text == null || text.trim.isEmpty) s"doc $docId" else text
    (math.floorMod(docId, 8L).toInt: @unchecked) match {
      case 0 => type0(t)
      // slots 1-2 alternate by mod 16 so the round-15 encoding legs
      // (WinAnsi CP1252 block; /Differences glyph remap) run live in
      // every demo/audit sweep — all four containers are pdf_text, so
      // q344's routing oracle is untouched, but a decode regression
      // in either leg empties its text and shifts the label
      case 1 =>
        if (math.floorMod(docId, 16L) == 9L) winAnsi(t) else simple(t)
      case 2 =>
        if (math.floorMod(docId, 16L) == 10L) differences(t)
        else predictorFlate(t)
      case 3 => t.getBytes(StandardCharsets.UTF_8)
      case 4 => objStm(t)
      case 5 => filterChain(t)
      // slot 6 cycles by mod 64 (mod 128/256 for the r17 thematic
      // splits) so the image-leg container shapes run live in every
      // audit sweep: classify-only DCT, the REAL CCITT path, the r16
      // sub-8-bit//Indexed shapes, and the JBIG2 + tint-transform
      // legs — all route pdf_image, so q344's mod-8 oracle is
      // untouched, but an assembly or routing regression shifts its
      // residue class across buckets. Each generator receives
      // docId DIV M (its slot's modulus), not docId: selecting on a
      // residue pins docId's low bits, which would FREEZE every
      // generator-internal "cycles by id % 2/4/8" leg to one value
      // (review finding) — the division hands each slot's members
      // consecutive generator ids, so all internal legs cycle
      case 6 =>
        val m64 = math.floorMod(docId, 64L)
        val m128 = math.floorMod(docId, 128L)
        val m256 = math.floorMod(docId, 256L)
        val d64 = math.floorDiv(docId, 64L)
        val d128 = math.floorDiv(docId, 128L)
        val d256 = math.floorDiv(docId, 256L)
        m64 match {
          case 22L => ccittPdf(d64 * 2)
          case 30L => ccittPdf(d64 * 2 + 1)
          case 54L => subbitPdf(d64)
          case 38L =>
            if (m128 == 102L) jbig2ModesPdf(d128)
            else jbig2TextPdf(d128)
          case 14L =>
            if (m128 == 78L) jbig2CustomTablePdf(d128)
            else jbig2HuffPdf(d128)           // r17: SDHUFF/SBHUFF leg
          case 46L => m256 match {
            case 110L => regionOpsPdf(d256 * 2)
            case 238L => regionOpsPdf(d256 * 2 + 1)
            case 174L => jbig2RefineRegionPdf(d256) // r17: two-pass leg
            case _ => stripedJbig2Pdf(d256)   // r17: striped-page leg
          }
          case 62L => m256 match {
            case 126L => jbig2InstRefinedPdf(d256)  // r17: SBREFINE leg
            case 190L => jbig2AggPdf(d256)          // r17: multi-aggregate
            case 62L => jbig2RefinedPdf(d256 * 2)   // r17: SDREFAGG leg
            case _ => jbig2RefinedPdf(d256 * 2 + 1) // (residue 254)
          }
          case 6L => m256 match {
            case 70L => sepPdf(d256 * 2)
            case 198L => sepPdf(d256 * 2 + 1)
            case 134L => tintCalcPdf(d256)
            // residue 6 splits once more so the GBTEMPLATE 1-3 leg
            // runs live without evicting the classify-only DCT default
            case 6L if math.floorMod(docId, 512L) == 262L =>
              jbig2TemplatePdf(math.floorDiv(docId, 512L))
            case _ => dctImageOnly(docId)
          }
          case _ => dctImageOnly(docId)
        }
      case 7 => math.floorMod(docId, 32L) match {
        case 7L => encrypted(t)                     // RC4, readable by design
        case 23L => encryptedAes256(t, xrefTail = true) // V5/R6, xref-stream
        case 15L => encrypted(t, "owner-locked")    // RC4, real password
        case _ => encryptedAes256(t, "owner-locked") // 31: V5, real password
      }
    }
  }
}
