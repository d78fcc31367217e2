package graft.pipeline

import java.io.ByteArrayOutputStream
import java.nio.charset.StandardCharsets
import java.util.zip.{DataFormatException, Inflater}

/** Pure-JVM PDF text extraction — the REAL extraction branch of the
  * reference's partition step (`ocr-tesseract-unstructured.py:78-84`
  * routes native-text PDFs through `unstructured`'s text path before
  * falling back to OCR) for the subset of PDFs this JVM can decode
  * without any new dependency:
  *
  *  - content streams stored RAW or `/FlateDecode`-compressed
  *    (`java.util.zip.Inflater`); streams with any other filter, or
  *    with `/DecodeParms` predictors, are skipped;
  *  - simple byte-encoded fonts (Standard/WinAnsi-like): string bytes
  *    map 1:1 to Latin-1 chars. CID/composite fonts with ToUnicode
  *    CMaps are out of scope — scanned/hi-res documents belong to the
  *    [[TesseractPartitioner]] path, which [[OcrRuntime]] selects
  *    when the binary exists.
  *
  * Extraction walks every decodable stream and interprets the
  * text-showing operators of the content-stream language: `Tj`,
  * `TJ` (kerning numbers ignored), `'` and `"` (line-advancing
  * shows), with `(…)` literal strings (escapes, octal, nesting) and
  * `<…>` hex strings. Each stream that shows text becomes one
  * page-like element — the granularity [[TextPartitioner]] produces
  * from form-feed splits, so downstream chunk/embed plumbing is
  * identical across all three seam implementations.
  *
  * Failure contract (U1/U2 null discipline): non-PDF bytes, corrupt
  * Flate data, or a malformed stream yield `Seq.empty` / skip the
  * stream — one bad document never kills a corpus-wide job.
  */
final case class PdfTextPartitioner() extends PdfPartitioner {

  override def partition(
      content: Array[Byte],
      strategy: PartitionStrategy): Seq[String] = {
    if (content == null || !PdfTextPartitioner.hasPdfMagic(content))
      return Seq.empty
    try {
      PdfTextPartitioner.contentStreams(content)
        .map(PdfTextPartitioner.shownText)
        .map(_.trim).filter(_.nonEmpty)
    } catch { case scala.util.control.NonFatal(_) => Seq.empty }
  }
}

object PdfTextPartitioner {

  /** `%PDF-` file magic (spec allows junk AFTER the header line, not
    * before it — renderers that tolerate leading junk are out of this
    * subset's scope). */
  def hasPdfMagic(b: Array[Byte]): Boolean =
    b != null && b.length >= 5 &&
      b(0) == '%' && b(1) == 'P' && b(2) == 'D' && b(3) == 'F' && b(4) == '-'

  /** All decodable stream payloads, as Latin-1 strings (byte ≡ char,
    * so offsets and literal-string bytes survive the round trip). */
  private[pipeline] def contentStreams(bytes: Array[Byte]): Seq[String] = {
    val s = new String(bytes, StandardCharsets.ISO_8859_1)
    val out = Seq.newBuilder[String]
    var i = s.indexOf("stream")
    while (i >= 0) {
      // skip the "stream" inside "endstream"
      val isEndKw = i >= 3 && s.regionMatches(i - 3, "endstream", 0, 9)
      if (!isEndKw) {
        var ds = i + 6
        if (ds < s.length && s.charAt(ds) == '\r') ds += 1
        if (ds < s.length && s.charAt(ds) == '\n') ds += 1
        val e = s.indexOf("endstream", ds)
        if (e < 0) { i = -1 }
        else {
          // the object dictionary sits between the previous "obj"
          // token and the stream keyword
          val objIdx = s.lastIndexOf("obj", i)
          val dict = if (objIdx >= 0) s.substring(objIdx, i) else ""
          var de = e
          if (de > ds && s.charAt(de - 1) == '\n') de -= 1
          if (de > ds && s.charAt(de - 1) == '\r') de -= 1
          val flate = dict.contains("/FlateDecode")
          val otherFilter = dict.contains("/Filter") && !flate
          val predictors =
            dict.contains("/DecodeParms") || dict.contains("/DecodeParams")
          if (!otherFilter && !predictors && de > ds) {
            val data = java.util.Arrays.copyOfRange(bytes, ds, de)
            val decoded = if (flate) inflate(data) else Some(data)
            decoded.foreach(d =>
              out += new String(d, StandardCharsets.ISO_8859_1))
          }
          i = s.indexOf("stream", e + 9)
        }
      } else i = s.indexOf("stream", i + 6)
    }
    out.result()
  }

  private def inflate(data: Array[Byte]): Option[Array[Byte]] = {
    val inf = new Inflater()
    try {
      inf.setInput(data)
      val out = new ByteArrayOutputStream()
      val buf = new Array[Byte](8192)
      var ok = true
      while (ok && !inf.finished()) {
        val n = inf.inflate(buf)
        if (n > 0) out.write(buf, 0, n)
        else if (inf.needsInput() || inf.needsDictionary()) ok = false
      }
      if (ok) Some(out.toByteArray) else None
    } catch { case _: DataFormatException => None }
    finally inf.end()
  }

  private def isDelim(c: Char): Boolean =
    c == '(' || c == ')' || c == '<' || c == '>' || c == '[' || c == ']' ||
      c == '{' || c == '}' || c == '/' || c == '%'

  private def isRegular(c: Char): Boolean =
    !c.isWhitespace && !isDelim(c) && c != 0

  private def isNumber(tok: String): Boolean =
    tok.nonEmpty && tok.forall(c => c.isDigit || c == '.' || c == '+' || c == '-')

  /** Text shown by one content stream: strings of `Tj`/`TJ`/`'`/`"`
    * in stream order; a positioning operator (`Td`/`TD`/`T*`/`ET`/
    * line-advancing show) between two shows becomes one newline. */
  private[pipeline] def shownText(cs: String): String = {
    val out = new StringBuilder
    val operands = scala.collection.mutable.ArrayBuffer.empty[String]
    var brokeLine = false
    val n = cs.length
    var i = 0
    def emit(): Unit = {
      if (operands.nonEmpty) {
        if (out.nonEmpty && brokeLine) out.append('\n')
        operands.foreach(out.append(_))
        brokeLine = false
      }
    }
    while (i < n) {
      val c = cs.charAt(i)
      if (c == '%') {
        while (i < n && cs.charAt(i) != '\n' && cs.charAt(i) != '\r') i += 1
      } else if (c == '(') {
        val (str, j) = literalString(cs, i); operands += str; i = j
      } else if (c == '<') {
        if (i + 1 < n && cs.charAt(i + 1) == '<') i += 2
        else { val (str, j) = hexString(cs, i); operands += str; i = j }
      } else if (c == '>' || c == '[' || c == ']' || c == '{' || c == '}') {
        i += 1
      } else if (c == '/') {
        i += 1
        while (i < n && isRegular(cs.charAt(i))) i += 1
      } else if (isRegular(c)) {
        val start = i
        while (i < n && isRegular(cs.charAt(i))) i += 1
        val tok = cs.substring(start, i)
        if (!isNumber(tok)) {
          tok match {
            case "Tj" | "TJ" => emit()
            case "'" | "\"" => brokeLine = true; emit()
            case "Td" | "TD" | "T*" | "ET" => brokeLine = true
            case _ => ()
          }
          operands.clear()
        }
      } else i += 1
    }
    out.toString
  }

  /** `(…)` literal string from `start` (at the '('): returns (value,
    * index after the closing paren). Handles nesting, the standard
    * escapes, octal escapes, and backslash line continuations. */
  private def literalString(cs: String, start: Int): (String, Int) = {
    val sb = new StringBuilder
    var depth = 1
    var i = start + 1
    val n = cs.length
    while (i < n && depth > 0) {
      val c = cs.charAt(i)
      if (c == '\\' && i + 1 < n) {
        cs.charAt(i + 1) match {
          case 'n' => sb.append('\n'); i += 2
          case 'r' => sb.append('\r'); i += 2
          case 't' => sb.append('\t'); i += 2
          case 'b' => sb.append('\b'); i += 2
          case 'f' => sb.append('\f'); i += 2
          case '(' => sb.append('('); i += 2
          case ')' => sb.append(')'); i += 2
          case '\\' => sb.append('\\'); i += 2
          case '\r' =>
            i += 2; if (i < n && cs.charAt(i) == '\n') i += 1
          case '\n' => i += 2
          case d if d >= '0' && d <= '7' =>
            var v = 0; var k = i + 1; var cnt = 0
            while (k < n && cnt < 3 &&
                cs.charAt(k) >= '0' && cs.charAt(k) <= '7') {
              v = v * 8 + (cs.charAt(k) - '0'); k += 1; cnt += 1
            }
            sb.append((v & 0xff).toChar); i = k
          case other => sb.append(other); i += 2
        }
      } else if (c == '(') { depth += 1; sb.append(c); i += 1 }
      else if (c == ')') { depth -= 1; if (depth > 0) sb.append(c); i += 1 }
      else { sb.append(c); i += 1 }
    }
    (sb.toString, i)
  }

  /** `<…>` hex string; odd digit counts pad with 0 per spec. */
  private def hexString(cs: String, start: Int): (String, Int) = {
    val digits = new StringBuilder
    var i = start + 1
    val n = cs.length
    while (i < n && cs.charAt(i) != '>') {
      val c = cs.charAt(i)
      if (c.isDigit || (c >= 'a' && c <= 'f') || (c >= 'A' && c <= 'F'))
        digits.append(c)
      i += 1
    }
    if (i < n) i += 1
    if (digits.length % 2 == 1) digits.append('0')
    val sb = new StringBuilder
    var k = 0
    while (k < digits.length) {
      sb.append(Integer.parseInt(digits.substring(k, k + 2), 16).toChar)
      k += 2
    }
    (sb.toString, i)
  }
}

/** Per-document format dispatch over the seam: bytes with the PDF
  * magic go through the pure-JVM [[PdfTextPartitioner]] (native-text
  * branch); everything else falls through to `base` — the probed
  * tesseract path for raster images, or the deterministic stand-in.
  * This mirrors the reference's partition step, which tries the
  * native text layer before OCR (`ocr-tesseract-unstructured.py:
  * 78-84`). If the PDF subset yields nothing (e.g. a scanned PDF
  * with image-only pages), the document falls THROUGH to `base` so
  * an OCR-capable deployment still gets a shot at it.
  */
final case class AutoPartitioner(base: PdfPartitioner) extends PdfPartitioner {
  private val pdf = PdfTextPartitioner()
  override def partition(
      content: Array[Byte],
      strategy: PartitionStrategy): Seq[String] =
    if (PdfTextPartitioner.hasPdfMagic(content)) {
      val els = pdf.partition(content, strategy)
      if (els.nonEmpty) els else base.partition(content, strategy)
    } else base.partition(content, strategy)
}
