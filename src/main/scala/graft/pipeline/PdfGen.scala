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

  /** Deterministic per-document container choice for the pipeline's
    * extraction-audit demo: doc_id mod 4 cycles composite-font PDF,
    * simple PDF, predictor-encoded PDF, plain UTF-8 bytes — so one
    * run exercises every [[ExtractPath]]. */
  def demo(docId: Long, text: String): Array[Byte] = {
    // a blank/whitespace document still gets a NON-EMPTY container —
    // a PDF with zero show operators would extract nothing and route
    // to pdf_fallback, silently diverging from q344's deterministic
    // mod-4 routing oracle (which says mods 0-2 ⇒ pdf_text
    // unconditionally); stamping the id keeps the container honest
    // and the routing total
    val t = if (text == null || text.trim.isEmpty) s"doc $docId" else text
    (math.floorMod(docId, 4L).toInt: @unchecked) match {
      case 0 => type0(t)
      case 1 => simple(t)
      case 2 => predictorFlate(t)
      case 3 => t.getBytes(StandardCharsets.UTF_8)
    }
  }
}
