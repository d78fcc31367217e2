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
  *  - content streams stored RAW or behind the text-side filters —
  *    `/FlateDecode` (`java.util.zip.Inflater`), `/LZWDecode` (PDF's
  *    TIFF-style 9→12-bit LZW with `/EarlyChange`), `/ASCIIHexDecode`,
  *    `/ASCII85Decode`, and `/RunLengthDecode` — singly or as a
  *    `/Filter [...]` chain
  *    applied in declaration order, including `/DecodeParms` PNG
  *    predictors 10-15 and TIFF predictor 2 (8-bit components) after
  *    a Flate/LZW stage; raster codecs (`DCTDecode`/`JPXDecode`/
  *    CCITT/JBIG2) are never text — documents whose only streams are
  *    raster images route to the image/OCR leg via
  *    [[AutoPartitioner]] (`ExtractPath.PdfImage`), not silently
  *    skipped;
  *  - **PDF 1.5+ compressed object streams (`/Type /ObjStm`)**: the
  *    linear object scan also scans INSIDE inflated ObjStm payloads
  *    (header of `/N` (num, offset) pairs, bodies from `/First`), so
  *    font dictionaries, page resources, and ToUnicode references
  *    that modern writers compress into object streams are visible —
  *    without this the round-13 Type0 leg never fires on
  *    xref-stream-era files. Parsing cross-reference streams is
  *    thereby unnecessary: the scan finds objects by walking bytes,
  *    not by chasing the xref. A number defined more than once — the
  *    incremental-update shape, where a writer APPENDS replacement
  *    objects after the original body — resolves to the definition
  *    LATEST in the byte stream, whether top-level or inside a later
  *    ObjStm, and only the winning definition's stream body is
  *    extracted (superseded page content never leaks into the text);
  *  - **encrypted PDFs decrypt when readable-by-design, and are
  *    never misparsed otherwise**: a `/Encrypt` entry in any trailer
  *    (or xref-stream dict) routes through [[PdfCrypt]] — when the
  *    EMPTY user password opens the file (standard handler RC4 V1-2,
  *    V4 /AESV2 or /V2 crypt filters, **AES-256 V5 R5/R6 — the
  *    current writer default**, or a V4/V5 `/StmF /Identity` file
  *    whose streams were plaintext all along) stream payloads decrypt
  *    in place and the normal walk extracts the real text
  *    (`ExtractPath.PdfDecrypted`); anything else (real passwords,
  *    out-of-subset handlers) yields `Seq.empty` and routes to the
  *    OCR seam labeled `ExtractPath.PdfEncrypted` — corpus audits
  *    (q344) count both buckets;
  *  - **per-page font resource scoping**: a stream claimed by a page
  *    decodes under that page's `/Resources` bindings (inline or
  *    indirect), so `/F1` meaning different fonts on different pages
  *    decodes correctly; unclaimed streams fall back to the
  *    document-global first-binding-wins map;
  *  - simple byte-encoded fonts (Standard/WinAnsi-like): string bytes
  *    map 1:1 to Latin-1 chars — and a simple font carrying an
  *    `/Encoding` `/Differences` remap (TeX Type1 subsets, i.e. older
  *    arXiv PDFs) decodes the remapped codes through an AGL
  *    glyph-name subset, with unknown names dropped (fall toward OCR)
  *    rather than emitted as mojibake;
  *  - composite **Type0/CID fonts with a `/ToUnicode` CMap** — the
  *    shape of modern subset-TrueType PDFs (the reference's actual
  *    corpus: `01-download-pdfs.py:105-112` downloads real arXiv
  *    PDFs): `beginbfchar`/`beginbfrange` sections are parsed from
  *    the (possibly Flate-compressed) CMap stream, show-string bytes
  *    are grouped into fixed-width codes (2-byte for Identity-H, per
  *    the CMap's codespacerange) and mapped to their UTF-16BE
  *    expansions. A CID with no CMap entry contributes nothing
  *    (glyph ids are not text); a Type0 font WITHOUT a ToUnicode
  *    CMap stays unmapped, so an all-composite document with no CMap
  *    yields no text and falls through to the OCR seam via
  *    [[AutoPartitioner]].
  *
  * Extraction walks every decodable stream and interprets the
  * text-showing operators of the content-stream language: `Tj`,
  * `TJ` (kerning numbers ignored), `'` and `"` (line-advancing
  * shows), with `(…)` literal strings (escapes, octal, nesting) and
  * `<…>` hex strings; `Tf` tracks the active font so each shown
  * string decodes under the font actually selecting its glyphs.
  * Each stream that shows text becomes one page-like element — the
  * granularity [[TextPartitioner]] produces from form-feed splits,
  * so downstream chunk/embed plumbing is identical across all seam
  * implementations.
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
      // encrypted files: decrypt in place when the EMPTY user
      // password opens them (readable-by-design documents, the
      // common web-corpus shape) and extract the plaintext copy
      // through the one normal walk; otherwise never touch the
      // ciphertext (Seq.empty → OCR-seam fallback, labeled
      // pdf_encrypted by AutoPartitioner)
      val plain =
        if (!PdfTextPartitioner.isEncrypted(content)) content
        else PdfCrypt.decryptStreams(content).getOrElse(return Seq.empty)
      extractPlain(plain)
    } catch { case scala.util.control.NonFatal(_) => Seq.empty }
  }

  /** The extraction walk over ALREADY-PLAINTEXT bytes — the decrypt
    * step skipped. [[AutoPartitioner]] decrypts once and routes the
    * same plaintext copy through text, image, and fallback legs
    * (running [[partition]] on a decrypted-but-still-/Encrypt-marked
    * body would transcrypt the plaintext into garbage). */
  private[pipeline] def partitionPlain(plain: Array[Byte]): Seq[String] =
    try extractPlain(plain)
    catch { case scala.util.control.NonFatal(_) => Seq.empty }

  private def extractPlain(plain: Array[Byte]): Seq[String] = {
    // per-page font scoping: a stream claimed by a page decodes
    // under THAT page's /Resources bindings; unclaimed streams fall
    // back to the document-global first-binding-wins map
    val objs = PdfTextPartitioner.objects(plain)
    val globalFonts = PdfTextPartitioner.fontMapFrom(objs)
    val pageFonts = PdfTextPartitioner.contentFontMapsFrom(objs)
    PdfTextPartitioner.contentStreamsWithNum(plain)
      .map { case (num, cs) =>
        PdfTextPartitioner.shownText(cs,
          num.flatMap(pageFonts.get).getOrElse(globalFonts))
      }
      .map(_.trim).filter(_.nonEmpty)
  }
}

object PdfTextPartitioner {

  /** `%PDF-` file magic (spec allows junk AFTER the header line, not
    * before it — renderers that tolerate leading junk are out of this
    * subset's scope). */
  def hasPdfMagic(b: Array[Byte]): Boolean =
    b != null && b.length >= 5 &&
      b(0) == '%' && b(1) == 'P' && b(2) == 'D' && b(3) == 'F' && b(4) == '-'

  /** A composite-font decoder parsed from a `/ToUnicode` CMap:
    * show-string bytes group into `codeBytes`-wide codes (2 for
    * Identity-H), each mapped to its Unicode expansion. */
  private[pipeline] final case class CMap(codeBytes: Int, map: Map[Int, String])

  /** One indirect object: its dictionary text and, when it carries a
    * decodable stream, the LAZILY decoded payload — [[fontMap]] reads
    * `data` only for the streams its ToUnicode references, so building
    * the object table does not re-inflate every content stream the
    * extraction pass decodes anyway. */
  private[pipeline] final case class PdfObj(
      dict: String, dataThunk: () => Option[Array[Byte]],
      span: Option[(Int, Int)] = None) {
    lazy val data: Option[Array[Byte]] = dataThunk()
  }

  /** All decodable stream payloads, as Latin-1 strings (byte ≡ char,
    * so offsets and literal-string bytes survive the round trip). */
  private[pipeline] def contentStreams(bytes: Array[Byte]): Seq[String] =
    contentStreamsWithNum(bytes).map(_._2)

  /** [[contentStreams]] plus each stream's OBJECT NUMBER (parsed from
    * the `N G obj` header ahead of the dictionary), in file order —
    * the key per-page font scoping joins on. None when the stream has
    * no parseable header. An object number carrying MORE than one
    * stream body is an incrementally-updated file (the update appends
    * a full replacement object); the LAST body — the visible
    * definition — is kept AT THE SUPERSEDED STREAM'S ORIGINAL
    * POSITION, so superseded page content is never extracted
    * alongside its replacement and a replaced page-1 does not move
    * behind page 2 in the output. */
  private[pipeline] def contentStreamsWithNum(
      bytes: Array[Byte]): Seq[(Option[Int], String)] = {
    val s = new String(bytes, StandardCharsets.ISO_8859_1)
    val out = scala.collection.mutable.ArrayBuffer.empty[(Option[Int], String)]
    val firstIdxForNum = scala.collection.mutable.Map.empty[Int, Int]
    var i = s.indexOf("stream")
    while (i >= 0) {
      // skip the "stream" inside "endstream"
      val isEndKw = i >= 3 && s.regionMatches(i - 3, "endstream", 0, 9)
      if (!isEndKw) {
        val objIdx = s.lastIndexOf("obj", i)
        val dict = if (objIdx >= 0) s.substring(objIdx, i) else ""
        val e = streamSpan(s, i, dict) match {
          case Some((ds, de, end)) =>
            decodeStream(dict, bytes, ds, de).foreach { d =>
              val num = objNumBefore(s, objIdx)
              val text = new String(d, StandardCharsets.ISO_8859_1)
              num.flatMap(firstIdxForNum.get) match {
                case Some(at) => out(at) = ((num, text))
                case None =>
                  num.foreach(firstIdxForNum(_) = out.length)
                  out += ((num, text))
              }
            }
            end
          case None => -1
        }
        i = if (e < 0) -1 else s.indexOf("stream", e)
      } else i = s.indexOf("stream", i + 6)
    }
    out.toSeq
  }

  /** The object number of an `N G obj` header whose `obj` keyword
    * starts at `objIdx`: scan back over the generation number to N. */
  private def objNumBefore(s: String, objIdx: Int): Option[Int] = {
    if (objIdx < 0) return None
    var k = objIdx - 1
    def skipWs(): Unit = { while (k >= 0 && s.charAt(k).isWhitespace) k -= 1 }
    def digits(): Option[String] = {
      val e = k
      while (k >= 0 && s.charAt(k).isDigit) k -= 1
      if (e == k) None else Some(s.substring(k + 1, e + 1))
    }
    skipWs()
    for {
      _ <- digits()                       // generation number
      _ = skipWs()
      num <- digits() if num.length <= 9
    } yield num.toInt
  }

  /** Direct `/Length N` in a stream dictionary (not the indirect
    * `/Length N 0 R` form, which this linear-scan subset can't chase
    * cheaply at this point). The `(?!\d)` anchor is load-bearing: on
    * `/Length 102 0 R` the engine would otherwise BACKTRACK the
    * capture to `10` so the not-indirect lookahead no longer sees
    * `N 0 R`, and the bogus 10-byte "length" truncates the stream —
    * real-world PDFs overwhelmingly use indirect lengths with
    * multi-digit object numbers. */
  private val directLength = """/Length\s+(\d{1,9})(?!\d)(?!\s*\d+\s+R)""".r

  /** (dataStart, dataEnd, indexAfterEndstream) for the `stream`
    * keyword at `i`, or None when the stream never terminates.
    * `dataEnd` honors the dictionary's direct `/Length` when it fits
    * before the `endstream` keyword — the EOL-trim heuristic
    * over-trims when the (compressed) payload itself ends in a CR/LF
    * byte (observed: a deflate stream ending 0x0D lost its last byte
    * and the whole stream failed to inflate). */
  /** Package-visible alias for [[PdfCrypt.decryptStreams]]'s in-place
    * stream transcryption (same span logic, one copy). */
  private[pipeline] def streamSpanFor(
      s: String, i: Int, dict: String): Option[(Int, Int, Int)] =
    streamSpan(s, i, dict)

  private def streamSpan(s: String, i: Int, dict: String): Option[(Int, Int, Int)] = {
    var ds = i + 6
    if (ds < s.length && s.charAt(ds) == '\r') ds += 1
    if (ds < s.length && s.charAt(ds) == '\n') ds += 1
    val e = s.indexOf("endstream", ds)
    if (e < 0) None
    else {
      val de = directLength.findFirstMatchIn(dict)
        .map(_.group(1).toInt).filter(l => ds + l <= e).map(ds + _)
        .getOrElse {
          var d = e
          if (d > ds && s.charAt(d - 1) == '\n') d -= 1
          if (d > ds && s.charAt(d - 1) == '\r') d -= 1
          d
        }
      Some((ds, de, e + 9))
    }
  }

  /** The `/Filter` entry as an ordered decoder list: a single name or
    * an array (applied first-to-last per spec). Abbreviated
    * inline-image names are accepted for free. Empty = raw stream. */
  private val filterEntry = """/Filter\s*(?:\[([^\]]*)\]|/([A-Za-z0-9]+))""".r
  private val nameTok = """/([A-Za-z0-9]+)""".r
  private[pipeline] def filterList(dict: String): Seq[String] =
    filterEntry.findFirstMatchIn(dict) match {
      case None => Seq.empty
      case Some(m) =>
        if (m.group(2) != null) Seq(m.group(2))
        else nameTok.findAllMatchIn(m.group(1)).map(_.group(1)).toSeq
    }

  /** Decode the stream payload at [ds, de) under the filters its
    * dictionary declares: raw, or any chain of the text-side filters
    * (ASCIIHex/ASCII85 transport coats, LZW, Flate, RunLength) with
    * optional PNG/TIFF predictors after the decompression stage. A
    * raster codec anywhere in the chain (DCT/JPX/CCITT/JBIG2) →
    * None: skipped here, routed by [[AutoPartitioner]]'s image leg. */
  /** One stream-decode cap for the whole library: a crafted tiny
    * payload must not be able to inflate to task-killing size —
    * "fewer streams, never task failures" is the contract on
    * untrusted corpora. No legitimate content stream, CMap, or
    * fixture image is within two orders of magnitude of it. */
  private[pipeline] val MaxDecodedStreamBytes: Int = 1 << 28

  /** The text-side filter chain (the only dispatch of filter names
    * to decoders — [[PdfImages]]' transport coats share it): raw, or
    * any chain of ASCIIHex/ASCII85/LZW/Flate/RunLength, each stage
    * capped at `maxOut` decoded bytes. A raster/unknown name → None.
    */
  private[pipeline] def applyTextFilters(
      data: Array[Byte], filters: Seq[String], dict: String,
      maxOut: Int = MaxDecodedStreamBytes): Option[Array[Byte]] = {
    var cur: Option[Array[Byte]] = Some(data)
    for (f <- filters if cur.isDefined) cur = (f match {
      case "FlateDecode" | "Fl" => cur.flatMap(inflate(_, maxOut))
      case "LZWDecode" | "LZW" =>
        val early = """/EarlyChange\s+(\d)""".r.findFirstMatchIn(dict)
          .map(_.group(1).toInt).getOrElse(1)
        cur.flatMap(lzwDecode(_, early, maxOut))
      case "ASCIIHexDecode" | "AHx" => cur.flatMap(asciiHexDecode)
      case "ASCII85Decode" | "A85" => cur.flatMap(ascii85Decode)
      case "RunLengthDecode" | "RL" => cur.flatMap(runLengthDecode)
      case _ => None // raster/unknown codecs: never text-misparsed
    }).filter(_.length <= maxOut)
    cur
  }

  private def decodeStream(
      dict: String, bytes: Array[Byte], ds: Int, de: Int): Option[Array[Byte]] = {
    if (de <= ds) return None
    val data = java.util.Arrays.copyOfRange(bytes, ds, de)
    val inflated = applyTextFilters(data, filterList(dict), dict)
    val hasParms =
      dict.contains("/DecodeParms") || dict.contains("/DecodeParams")
    if (!hasParms) inflated
    else {
      // inline predictor dict only; an indirect/array DecodeParms is
      // out of this subset's scope → skip the stream (old behavior)
      def intParm(key: String, dflt: Int): Int =
        s"""$key\\s+(\\d+)""".r.findFirstMatchIn(dict)
          .map(_.group(1).toInt).getOrElse(dflt)
      val predictor = intParm("/Predictor", 1)
      val columns = intParm("/Columns", 1)
      val colors = intParm("/Colors", 1)
      val bpc = intParm("/BitsPerComponent", 8)
      if (predictor <= 1) inflated
      else if (bpc != 8) None                   // sub-byte predictors: out of scope
      else inflated.flatMap(unpredict(_, predictor, columns, colors))
    }
  }

  /** Reverse a `/Predictor` transform on 8-bit-component rows:
    * TIFF predictor 2 (horizontal byte differencing) or PNG
    * predictors ≥ 10 (per-row filter byte: None/Sub/Up/Average/
    * Paeth, RFC 2083). Truncated final rows fail the whole stream —
    * a malformed predictor stream is skipped, not half-decoded. */
  private[pipeline] def unpredict(
      data: Array[Byte], predictor: Int, columns: Int, colors: Int): Option[Array[Byte]] = {
    val bpp = math.max(1, colors)               // bytes per pixel at bpc=8
    val rowLen = columns * colors
    if (rowLen <= 0) return None
    if (predictor == 2) {
      if (data.length % rowLen != 0) return None
      val out = data.clone()
      var r = 0
      while (r < out.length) {
        var k = bpp
        while (k < rowLen) {
          out(r + k) = ((out(r + k) + out(r + k - bpp)) & 0xff).toByte
          k += 1
        }
        r += rowLen
      }
      Some(out)
    } else if (predictor >= 10) {
      val stride = rowLen + 1                   // leading filter-type byte
      if (data.length % stride != 0) return None
      val rows = data.length / stride
      val out = new Array[Byte](rows * rowLen)
      val prev = new Array[Byte](rowLen)
      var r = 0
      while (r < rows) {
        val ft = data(r * stride) & 0xff
        val src = r * stride + 1
        val dst = r * rowLen
        var k = 0
        while (k < rowLen) {
          val raw = data(src + k) & 0xff
          val left = if (k >= bpp) out(dst + k - bpp) & 0xff else 0
          val up = prev(k) & 0xff
          val ul = if (k >= bpp) prev(k - bpp) & 0xff else 0
          val v = ft match {
            case 0 => raw
            case 1 => raw + left
            case 2 => raw + up
            case 3 => raw + ((left + up) >> 1)
            case 4 =>
              val p = left + up - ul
              val pa = math.abs(p - left); val pb = math.abs(p - up)
              val pc = math.abs(p - ul)
              raw + (if (pa <= pb && pa <= pc) left else if (pb <= pc) up else ul)
            case _ => return None               // unknown filter type
          }
          out(dst + k) = (v & 0xff).toByte
          k += 1
        }
        System.arraycopy(out, dst, prev, 0, rowLen)
        r += 1
      }
      Some(out)
    } else None
  }

  private[pipeline] def inflate(
      data: Array[Byte], maxOut: Int = MaxDecodedStreamBytes): Option[Array[Byte]] = {
    val inf = new Inflater()
    try {
      inf.setInput(data)
      val out = new ByteArrayOutputStream()
      val buf = new Array[Byte](8192)
      var ok = true
      while (ok && !inf.finished()) {
        val n = inf.inflate(buf)
        if (n > 0) {
          out.write(buf, 0, n)
          if (out.size() > maxOut) ok = false   // decompression bomb
        }
        else if (inf.needsInput() || inf.needsDictionary()) ok = false
      }
      if (ok) Some(out.toByteArray) else None
    } catch { case _: DataFormatException => None }
    finally inf.end()
  }

  /** PDF `/LZWDecode`: TIFF-style MSB-first variable-width codes,
    * 9→12 bits; 256 clears the table, 257 is EOD, entries grow from
    * 258. With `/EarlyChange 1` (the default) the code width bumps
    * one entry EARLY (at next-code 511/1023/2047); `/EarlyChange 0`
    * bumps at the power of two. Malformed code sequences → None
    * (skip-not-misparse, like corrupt Flate). Pinned in the spec
    * against the PDF 1.7 §7.4.4.2 example vector. */
  private[pipeline] def lzwDecode(
      data: Array[Byte], earlyChange: Int = 1,
      maxOut: Int = MaxDecodedStreamBytes): Option[Array[Byte]] = {
    val out = new ByteArrayOutputStream()
    val table = new scala.collection.mutable.ArrayBuffer[Array[Byte]](4096)
    def reset(): Unit = {
      table.clear()
      var i = 0
      while (i < 256) { table += Array(i.toByte); i += 1 }
      table += null; table += null                  // 256 clear, 257 EOD
    }
    reset()
    var width = 9
    var bitBuf = 0L; var bitCnt = 0; var pos = 0
    def next(): Int = {
      while (bitCnt < width && pos < data.length) {
        bitBuf = (bitBuf << 8) | (data(pos) & 0xffL); bitCnt += 8; pos += 1
      }
      if (bitCnt < width) -1
      else { bitCnt -= width; ((bitBuf >>> bitCnt) & ((1L << width) - 1)).toInt }
    }
    var prev: Array[Byte] = null
    var c = next()
    while (c >= 0 && c != 257) {
      if (c == 256) { reset(); width = 9; prev = null }
      else {
        val entry: Array[Byte] =
          if (c < table.length && table(c) != null) table(c)
          else if (c == table.length && prev != null) prev :+ prev(0)
          else return None                          // code ahead of the table
        out.write(entry, 0, entry.length)
        if (out.size() > maxOut) return None        // decompression bomb
        if (prev != null && table.length < 4096) table += (prev :+ entry(0))
        prev = entry
        if (width < 12 && table.length + earlyChange >= (1 << width)) width += 1
      }
      c = next()
    }
    Some(out.toByteArray)
  }

  /** `/ASCIIHexDecode`: hex pairs to `>`; whitespace skipped; a
    * trailing odd digit pads with 0 per spec; any other byte → None. */
  private[pipeline] def asciiHexDecode(data: Array[Byte]): Option[Array[Byte]] = {
    val out = new ByteArrayOutputStream()
    var hi = -1
    var i = 0
    while (i < data.length) {
      val c = (data(i) & 0xff).toChar
      val v =
        if (c >= '0' && c <= '9') c - '0'
        else if (c >= 'a' && c <= 'f') c - 'a' + 10
        else if (c >= 'A' && c <= 'F') c - 'A' + 10
        else if (c == '>') { if (hi >= 0) out.write(hi << 4); return Some(out.toByteArray) }
        else if (c.isWhitespace) -1
        else return None
      if (v >= 0) {
        if (hi < 0) hi = v else { out.write((hi << 4) | v); hi = -1 }
      }
      i += 1
    }
    if (hi >= 0) out.write(hi << 4)                 // EOD-less stream: pad
    Some(out.toByteArray)
  }

  /** `/RunLengthDecode`: length byte L — 0..127 copies the next L+1
    * bytes literally, 129..255 repeats the next byte 257−L times,
    * 128 is EOD. A run crossing the end of data → None. */
  private[pipeline] def runLengthDecode(data: Array[Byte]): Option[Array[Byte]] = {
    val out = new ByteArrayOutputStream()
    var i = 0
    while (i < data.length) {
      val l = data(i) & 0xff
      if (l == 128) return Some(out.toByteArray)
      else if (l < 128) {
        if (i + 1 + l + 1 > data.length) return None
        out.write(data, i + 1, l + 1)
        i += l + 2
      } else {
        if (i + 1 >= data.length) return None
        var k = 257 - l
        while (k > 0) { out.write(data(i + 1)); k -= 1 }
        i += 2
      }
    }
    Some(out.toByteArray)                         // EOD-less stream
  }

  /** `/ASCII85Decode`: 5 chars `!`..`u` → 4 bytes base 85; `z` (only
    * at a group boundary) → four zero bytes; `~>` terminates; a final
    * partial group of n chars yields n−1 bytes (pad with `u`).
    * Out-of-range bytes or an overflowing group → None. */
  private[pipeline] def ascii85Decode(data: Array[Byte]): Option[Array[Byte]] = {
    val out = new ByteArrayOutputStream()
    val grp = new Array[Int](5)
    var n = 0
    var i = 0
    var done = false
    while (i < data.length && !done) {
      val c = (data(i) & 0xff).toChar
      if (c == '~') done = true
      else if (c == 'z' && n == 0) { out.write(0); out.write(0); out.write(0); out.write(0) }
      else if (c >= '!' && c <= 'u') {
        grp(n) = c - '!'; n += 1
        if (n == 5) {
          var v = 0L; var k = 0
          while (k < 5) { v = v * 85 + grp(k); k += 1 }
          if (v > 0xffffffffL) return None
          out.write(((v >> 24) & 0xff).toInt); out.write(((v >> 16) & 0xff).toInt)
          out.write(((v >> 8) & 0xff).toInt); out.write((v & 0xff).toInt)
          n = 0
        }
      } else if (!c.isWhitespace) return None
      i += 1
    }
    if (n == 1) return None                         // 1 leftover char is invalid
    if (n > 1) {
      var v = 0L; var k = 0
      while (k < 5) { v = v * 85 + (if (k < n) grp(k) else 84); k += 1 }
      if (v > 0xffffffffL) return None
      val b = Array(((v >> 24) & 0xff).toByte, ((v >> 16) & 0xff).toByte,
        ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
      out.write(b, 0, n - 1)
    }
    Some(out.toByteArray)
  }

  /** Indirect-object table: object number → (dict, decoded stream).
    * Incremental-update files repeat numbers; the definition LATEST
    * in the byte stream wins — whether top-level or inside a later
    * `/ObjStm` — because incremental updates APPEND their replacement
    * objects after the original body (PDF 32000-1 §7.5.6), so the
    * visible definition is always the last one written. Matches
    * INSIDE a consumed object's span are skipped (the `minPos`
    * cursor): compressed payload bytes that happen to spell
    * `N M obj … endobj` must not fabricate a phantom object that
    * clobbers the real one under last-definition-wins — the same
    * skip-past-endstream discipline [[contentStreams]] applies. */
  private[pipeline] def objects(bytes: Array[Byte]): Map[Int, PdfObj] =
    objectsWithPos(bytes).map { case (num, (_, o)) => num -> o }

  /** [[objects]] plus each winning definition's byte position (for a
    * contained object: the position of its enclosing ObjStm) — the
    * order key that makes last-definition-wins hold across BOTH
    * containers, and that [[contentStreamsWithNum]] uses to drop
    * superseded stream bodies. */
  private[pipeline] def objectsWithPos(
      bytes: Array[Byte]): Map[Int, (Int, PdfObj)] = {
    val s = new String(bytes, StandardCharsets.ISO_8859_1)
    val objRe = """(?<!\d)(\d{1,9})\s+\d+\s+obj\b""".r
    val out = scala.collection.mutable.Map.empty[Int, (Int, PdfObj)]
    var minPos = 0
    for (m <- objRe.findAllMatchIn(s) if m.start >= minPos) {
      val num = m.group(1).toInt
      val start = m.end
      val endobj = s.indexOf("endobj", start)
      val streamKw = s.indexOf("stream", start)
      val hasStream = streamKw >= 0 && (endobj < 0 || streamKw < endobj) &&
        !(streamKw >= 3 && s.regionMatches(streamKw - 3, "endstream", 0, 9))
      if (hasStream) {
        val dict = s.substring(start, streamKw)
        streamSpan(s, streamKw, dict) match {
          case Some((ds, de, end)) =>
            out(num) =
              (m.start,
                PdfObj(dict, () => decodeStream(dict, bytes, ds, de), Some((ds, de))))
            minPos = end
          case None =>
            // an unterminated stream has no endstream anywhere after
            // it — everything to EOF is payload; stop matching object
            // headers inside it (they would be payload bytes)
            out(num) = (m.start, PdfObj(dict, () => None))
            minPos = s.length
        }
      } else if (endobj >= 0) {
        out(num) = (m.start, PdfObj(s.substring(start, endobj), () => None))
        minPos = endobj + 6
      }
    }
    val top = out.toMap
    // PDF 1.5+ object streams: expand objects compressed inside
    // /Type /ObjStm payloads, each stamped with its ObjStm's own byte
    // position, then resolve collisions by position — an appended
    // update wins whether the newer definition is top-level (the
    // common writer shape) or inside a later ObjStm.
    val merged = scala.collection.mutable.Map.empty[Int, (Int, PdfObj)]
    merged ++= expandObjStmWithPos(top)
    for ((num, e @ (pos, _)) <- top)
      if (!merged.get(num).exists(_._1 > pos)) merged(num) = e
    merged.toMap
  }

  /** Objects compressed inside `/Type /ObjStm` streams: the inflated
    * payload starts with `/N` (objnum, byte-offset) integer pairs;
    * bodies begin at `/First`. Contained objects carry no
    * `obj`/`endobj` wrappers and can hold NO streams (spec), so each
    * becomes a dict-only [[PdfObj]] — which is exactly what the font
    * walk needs: Type0 font dictionaries, page `/Resources`, and
    * `/ToUnicode N 0 R` references, whose CMap streams themselves
    * stay top-level and are found by the linear scan. Malformed
    * headers (offsets past the payload, short pair lists) skip the
    * affected entries, never the document. */
  private[pipeline] def expandObjStm(objs: Map[Int, PdfObj]): Map[Int, PdfObj] =
    expandObjStmWithPos(objs.map { case (k, o) => k -> ((0, o)) })
      .map { case (k, (_, o)) => k -> o }

  private[pipeline] def expandObjStmWithPos(
      objs: Map[Int, (Int, PdfObj)]): Map[Int, (Int, PdfObj)] = {
    def intKey(dict: String, key: String): Option[Int] =
      s"""$key\\s+(\\d{1,9})""".r.findFirstMatchIn(dict).map(_.group(1).toInt)
    val extra = scala.collection.mutable.Map.empty[Int, (Int, PdfObj)]
    for {
      (stmPos, o) <- objs.values if o.dict.contains("/ObjStm")
      data <- o.data
      n <- intKey(o.dict, "/N")
      first <- intKey(o.dict, "/First") if first <= data.length
    } {
      val s = new String(data, StandardCharsets.ISO_8859_1)
      val nums = """\d{1,9}""".r.findAllIn(s.substring(0, first))
        .map(_.toInt).toSeq
      val pairs = nums.grouped(2)
        .collect { case Seq(a, b) => (a, b) }.take(n).toSeq
      for (((num, off), idx) <- pairs.zipWithIndex) {
        val start = first.toLong + off
        val end =
          if (idx + 1 < pairs.length) first.toLong + pairs(idx + 1)._2
          else s.length.toLong
        if (start >= first && start <= end && end <= s.length &&
            !extra.get(num).exists(_._1 > stmPos))
          extra(num) =
            (stmPos, PdfObj(s.substring(start.toInt, end.toInt), () => None))
      }
    }
    extra.toMap
  }

  /** `/Encrypt`-bearing document detection — every trailer dict (and,
    * in xref-stream-era files, the `/Type /XRef` stream dict) names
    * the encryption dictionary when the file is encrypted. String and
    * stream bytes in such a file are CIPHERTEXT, so extraction must
    * not run (garbage in, garbage labeled pdf_text out); the document
    * routes to the OCR seam as its own `pdf_encrypted` audit bucket.
    * Windowed substring checks (1 KiB past the keyword) rather than a
    * full dict parse: trailers are flat and small; a compressed
    * payload spelling `trailer…/Encrypt` inside one window is
    * vanishingly unlikely and errs toward the OCR seam, never toward
    * misparsed ciphertext. */
  private[pipeline] def isEncrypted(bytes: Array[Byte]): Boolean = {
    val s = new String(bytes, StandardCharsets.ISO_8859_1)
    def windowed(kw: String): Boolean = {
      var i = s.indexOf(kw)
      while (i >= 0) {
        if (s.substring(i, math.min(s.length, i + 1024)).contains("/Encrypt"))
          return true
        i = s.indexOf(kw, i + kw.length)
      }
      false
    }
    windowed("trailer") || windowed("/XRef")
  }

  /** Does the document carry raster-image XObjects (`/Subtype /Image`
    * behind a raster codec)? Such a document with NO extractable text
    * is a scanned/image PDF: [[AutoPartitioner]] routes it to the
    * image/OCR leg under its own `pdf_image` label instead of the
    * generic fallback, so corpus audits separate "scanned, OCR-able"
    * from "nothing we recognize". */
  private[pipeline] def hasRasterImage(bytes: Array[Byte]): Boolean = {
    val s = new String(bytes, StandardCharsets.ISO_8859_1)
    """/Subtype\s*/Image""".r.findAllMatchIn(s).exists { m =>
      val w = s.substring(math.max(0, m.start - 512),
        math.min(s.length, m.start + 512))
      w.contains("/DCTDecode") || w.contains("/JPXDecode") ||
        w.contains("/CCITTFaxDecode") || w.contains("/JBIG2Decode")
    }
  }

  /** Resource-name → CMap decoder table for every font that carries a
    * parseable `/ToUnicode` CMap. Names are collected from all
    * `/Font << /Fn N 0 R … >>` resource dictionaries (inline or via
    * an indirect `/Font N 0 R` reference); a name bound to multiple
    * font objects across pages keeps its FIRST CMap-bearing binding —
    * per-page resource scoping is out of this linear-scan subset. */
  private val inlineFontDict = """(?s)/Font\s*<<(.*?)>>""".r
  private val indirectFontDict = """/Font\s+(\d+)\s+\d+\s+R""".r
  private val fontRef = """/([^\s/<>\[\]()%]+)\s+(\d+)\s+\d+\s+R""".r
  private val toUniRef = """/ToUnicode\s+(\d+)\s+\d+\s+R""".r

  /** Font name→object bindings declared by a dictionary: its inline
    * `/Font << … >>` entries plus an indirect `/Font N 0 R` chase. */
  private def fontBindings(
      objs: Map[Int, PdfObj], dict: String): Seq[(String, Int)] = {
    val inline = inlineFontDict.findAllMatchIn(dict).map(_.group(1))
    val indirect = indirectFontDict.findAllMatchIn(dict)
      .flatMap(m => objs.get(m.group(1).toInt).map(_.dict))
    (inline ++ indirect).flatMap(fd =>
      fontRef.findAllMatchIn(fd).map(r => r.group(1) -> r.group(2).toInt)).toSeq
  }

  /** Resolve bindings to decoders — first CMap-bearing binding wins a
    * name; composite fonts WITHOUT a parseable ToUnicode CMap get an
    * EMPTY decoder: their show-string bytes are glyph ids, not text,
    * so every code maps to nothing — this is what makes the
    * "an all-composite document with no CMap yields no text and
    * falls through to the OCR seam" contract actually hold (a raw
    * Latin-1 fallback would emit NUL-interleaved glyph-id garbage
    * labeled pdf_text and the document would never be OCR'd).
    * Second pass so a name bound to BOTH a CMap-less and a
    * CMap-bearing font object keeps the CMap-bearing binding. The
    * second pass also resolves SIMPLE fonts carrying an `/Encoding`
    * `/Differences` remap (TeX Type1 output): a 1-byte CMap applies
    * the remap, with codes naming glyphs outside the AGL subset
    * dropped — falling toward the OCR seam beats silent mojibake. */
  private def resolveBindings(
      objs: Map[Int, PdfObj], bindings: Seq[(String, Int)]): Map[String, CMap] = {
    val out = scala.collection.mutable.Map.empty[String, CMap]
    def isComposite(dict: String): Boolean =
      dict.contains("/Type0") || dict.contains("Identity-H")
    for ((name, fontNum) <- bindings if !out.contains(name)) {
      for {
        font <- objs.get(fontNum)
        uni <- toUniRef.findFirstMatchIn(font.dict)
        cmapObj <- objs.get(uni.group(1).toInt)
        data <- cmapObj.data
        cmap <- parseCMap(
          new String(data, StandardCharsets.ISO_8859_1),
          composite = isComposite(font.dict))
      } out(name) = cmap
    }
    for ((name, fontNum) <- bindings if !out.contains(name)) {
      objs.get(fontNum).foreach { font =>
        if (isComposite(font.dict)) out(name) = CMap(2, Map.empty)
        else {
          // simple font with a named base encoding (WinAnsi/MacRoman)
          // and/or a /Differences remap: decode through a 1-byte CMap
          // — the named base (Latin-1 identity by default) overridden
          // by the glyph-name remap (or NOTHING, for names outside
          // the AGL subset); emitting the raw byte for a remapped
          // code would be silent mojibake
          val baseEnc = baseEncodingName(objs, font.dict)
          val diff = differencesMap(objs, font.dict).getOrElse(Map.empty)
          if (baseEnc.isDefined || diff.nonEmpty)
            out(name) = CMap(1, encodingBase(baseEnc) ++ diff)
        }
      }
    }
    out.toMap
  }

  /** Adobe-Glyph-List subset: the glyph names TeX Type1 output and
    * common Latin subsets actually use. Single ASCII letters and
    * digits-as-words, punctuation, the f-ligatures, typographic
    * quotes/dashes, and the Latin-1 accented range — plus the AGL
    * algorithmic `uniXXXX` / `uXXXX[XX]` forms handled in
    * [[glyphToText]]. Names OUTSIDE this table decode to nothing
    * (fall toward the OCR seam): mojibake flowing into chunks and
    * embeddings undetected is worse than a no-text fallback. */
  private[pipeline] val GlyphNames: Map[String, String] = {
    val punct = Map(
      "space" -> " ", "exclam" -> "!", "quotedbl" -> "\"",
      "numbersign" -> "#", "dollar" -> "$", "percent" -> "%",
      "ampersand" -> "&", "quotesingle" -> "'", "parenleft" -> "(",
      "parenright" -> ")", "asterisk" -> "*", "plus" -> "+",
      "comma" -> ",", "hyphen" -> "-", "period" -> ".", "slash" -> "/",
      "colon" -> ":", "semicolon" -> ";", "less" -> "<", "equal" -> "=",
      "greater" -> ">", "question" -> "?", "at" -> "@",
      "bracketleft" -> "[", "backslash" -> "\\", "bracketright" -> "]",
      "asciicircum" -> "^", "underscore" -> "_", "grave" -> "`",
      "braceleft" -> "{", "bar" -> "|", "braceright" -> "}",
      "asciitilde" -> "~")
    val digits = Map(
      "zero" -> "0", "one" -> "1", "two" -> "2", "three" -> "3",
      "four" -> "4", "five" -> "5", "six" -> "6", "seven" -> "7",
      "eight" -> "8", "nine" -> "9")
    val typo = Map(
      "quoteleft" -> "‘", "quoteright" -> "’",
      "quotedblleft" -> "“", "quotedblright" -> "”",
      "quotesinglbase" -> "‚", "quotedblbase" -> "„",
      "endash" -> "–", "emdash" -> "—",
      "ellipsis" -> "…", "bullet" -> "•",
      "dagger" -> "†", "daggerdbl" -> "‡",
      "fi" -> "ﬁ", "fl" -> "ﬂ", "ff" -> "ﬀ",
      "ffi" -> "ﬃ", "ffl" -> "ﬄ",
      "minus" -> "−", "periodcentered" -> "·",
      "multiply" -> "×", "divide" -> "÷",
      "plusminus" -> "±", "degree" -> "°",
      "section" -> "§", "paragraph" -> "¶",
      "copyright" -> "©", "registered" -> "®",
      "trademark" -> "™", "sterling" -> "£",
      "yen" -> "¥", "cent" -> "¢", "Euro" -> "€",
      "exclamdown" -> "¡", "questiondown" -> "¿",
      "germandbls" -> "ß", "dotlessi" -> "ı",
      "ae" -> "æ", "AE" -> "Æ", "oe" -> "œ",
      "OE" -> "Œ", "oslash" -> "ø", "Oslash" -> "Ø",
      "aring" -> "å", "Aring" -> "Å",
      "eth" -> "ð", "Eth" -> "Ð",
      "thorn" -> "þ", "Thorn" -> "Þ")
    // Latin-1 accented block, named per AGL: <letter><accent-name>
    val accents = Seq(
      ("grave", "̀"), ("acute", "́"), ("circumflex", "̂"),
      ("tilde", "̃"), ("dieresis", "̈"), ("cedilla", "̧"))
    val accented = (for {
      base <- "aeiouyncAEIOUYNC"
      (acc, comb) <- accents
      composed = java.text.Normalizer.normalize(
        base.toString + comb, java.text.Normalizer.Form.NFC)
      if composed.length == 1                    // real precomposed char only
    } yield s"$base$acc" -> composed).toMap
    // explicit zip — the codepoint run has a gap at final-sigma ς
    val greekLower = Seq("alpha", "beta", "gamma", "delta", "epsilon",
      "zeta", "eta", "theta", "iota", "kappa", "lambda", "mu", "nu",
      "xi", "omicron", "pi", "rho", "sigma", "tau", "upsilon", "phi",
      "chi", "psi", "omega")
      .zip("αβγδεζηθικλμνξοπρστυφχψω".map(_.toString)).toMap
    val letters = (('a' to 'z') ++ ('A' to 'Z'))
      .map(c => c.toString -> c.toString).toMap
    punct ++ digits ++ typo ++ accented ++ greekLower ++ letters
  }

  /** Glyph name → text per the AGL algorithm subset: the
    * [[GlyphNames]] table, `uniXXXX[XXXX…]` (one or more UTF-16BE
    * 4-hex-digit units), and `uXXXX`/`uXXXXX`/`uXXXXXX` (a single
    * code point). None for anything else — unknown names (e.g. `gNN`
    * subset-private glyphs) contribute NO text. */
  private[pipeline] def glyphToText(name: String): Option[String] = {
    def hexVal(h: String): Option[Int] =
      if (h.nonEmpty && h.forall(c => c.isDigit || (c >= 'A' && c <= 'F')))
        Some(Integer.parseInt(h, 16))
      else None
    GlyphNames.get(name).orElse {
      if (name.startsWith("uni") && name.length >= 7 &&
          (name.length - 3) % 4 == 0)
        name.drop(3).grouped(4).toSeq
          .foldLeft(Option(new StringBuilder)) { (acc, g) =>
            // AGL excludes the surrogate block from uniXXXX — a lone
            // surrogate would be a malformed String that downstream
            // UTF-8 encoding turns into U+FFFD noise
            for (sb <- acc; v <- hexVal(g)
              if v < 0xD800 || v > 0xDFFF) yield sb.append(v.toChar)
          }.map(_.toString)
      else if (name.startsWith("u") && name.length >= 5 && name.length <= 7)
        hexVal(name.drop(1))
          .filter(cp => Character.isValidCodePoint(cp) &&
            (cp < 0xD800 || cp > 0xDFFF))
          .map(cp => new String(Character.toChars(cp)))
      else None
    }
  }

  /** A simple font's `/Encoding … /Differences [code /name …]` remap,
    * when present: inline dict or chased through an indirect
    * `/Encoding N 0 R`. Returns code → replacement text, where an
    * unknown glyph name maps to "" (drop the code — fall toward OCR,
    * never emit the raw byte as mojibake). */
  private val encodingObjRef = """/Encoding\s+(\d+)\s+\d+\s+R""".r
  private val inlineEncodingDict = """(?s)/Encoding\s*<<(.*?)>>""".r
  private val differencesArr = """(?s)/Differences\s*\[(.*?)\]""".r
  private val diffTok = """\d{1,9}|/[^\s/<>\[\]()%]+""".r
  private val namedEncoding =
    """/(?:Base)?Encoding\s*/(WinAnsiEncoding|MacRomanEncoding)""".r

  /** The named base encoding a simple font declares — directly
    * (`/Encoding /WinAnsiEncoding`), inside an inline `/Encoding <<
    * /BaseEncoding … >>` dict, or through an indirect encoding
    * object. None ⇒ the Latin-1 (StandardEncoding-compatible)
    * default. */
  private[pipeline] def baseEncodingName(
      objs: Map[Int, PdfObj], fontDict: String): Option[String] = {
    val indirect = encodingObjRef.findFirstMatchIn(fontDict)
      .flatMap(m => objs.get(m.group(1).toInt)).map(_.dict).getOrElse("")
    namedEncoding.findFirstMatchIn(fontDict + " " + indirect)
      .map(_.group(1))
  }

  /** Byte → text base table for a named simple-font encoding.
    * Latin-1 identity by default; `/WinAnsiEncoding` overrides the
    * 0x80-0x9F block with the CP1252 typographic set (the quotes/
    * dashes/ligatures block every Windows-authored PDF uses — under
    * raw Latin-1 those decode to INVISIBLE control chars, i.e. silent
    * text corruption); `/MacRomanEncoding` decodes the upper half
    * through the JDK's own x-MacRoman charset. Codes a named encoding
    * leaves undefined map to "" (drop toward OCR). */
  private[pipeline] def encodingBase(name: Option[String]): Map[Int, String] = {
    val latin1 = (0 to 0xff).map(c => c -> c.toChar.toString).toMap
    name match {
      case Some("WinAnsiEncoding") =>
        val cp1252 = "€ ‚ƒ„…†‡ˆ‰Š‹Œ Ž  ‘’“”•–—˜™š›œ žŸ"
        latin1 ++ (0x80 to 0x9f).map { c =>
          val ch = cp1252.charAt(c - 0x80)
          c -> (if (ch == ' ') "" else ch.toString)
        }
      case Some("MacRomanEncoding")
          if java.nio.charset.Charset.isSupported("x-MacRoman") =>
        val mac = java.nio.charset.Charset.forName("x-MacRoman")
        latin1 ++ (0x80 to 0xff).map { c =>
          c -> new String(Array(c.toByte), mac)
        }
      case _ => latin1
    }
  }
  private[pipeline] def differencesMap(
      objs: Map[Int, PdfObj], fontDict: String): Option[Map[Int, String]] = {
    val encDict = inlineEncodingDict.findFirstMatchIn(fontDict).map(_.group(1))
      .orElse(encodingObjRef.findFirstMatchIn(fontDict)
        .flatMap(m => objs.get(m.group(1).toInt)).map(_.dict))
    for (m <- differencesArr.findFirstMatchIn(encDict.getOrElse(""))) yield {
      val out = scala.collection.mutable.Map.empty[Int, String]
      var code = 0
      for (tok <- diffTok.findAllIn(m.group(1))) {
        if (tok.startsWith("/")) {
          if (code <= 0xff)
            out(code) = glyphToText(tok.drop(1)).getOrElse("")
          code += 1
        } else code = tok.toInt
      }
      out.toMap
    }
  }

  private[pipeline] def fontMap(bytes: Array[Byte]): Map[String, CMap] =
    fontMapFrom(objects(bytes))

  private[pipeline] def fontMapFrom(
      objs: Map[Int, PdfObj]): Map[String, CMap] = {
    if (objs.isEmpty) return Map.empty
    resolveBindings(objs,
      objs.values.toSeq.flatMap(o => fontBindings(objs, o.dict)))
  }

  /** PER-PAGE font scoping: content-object number → decoder table
    * resolved from THAT page's `/Resources` (inline, or chased
    * through an indirect `/Resources N 0 R`). A name like `/F1` can
    * legally bind to DIFFERENT fonts on different pages; the global
    * [[fontMap]] (first binding wins) would decode later pages under
    * the first page's CMap, so extraction looks a stream's own page
    * scope up first and falls back to the global map only for
    * streams no page claims. */
  private[pipeline] def contentFontMaps(
      bytes: Array[Byte]): Map[Int, Map[String, CMap]] =
    contentFontMapsFrom(objects(bytes))

  private[pipeline] def contentFontMapsFrom(
      objs: Map[Int, PdfObj]): Map[Int, Map[String, CMap]] = {
    if (objs.isEmpty) return Map.empty
    val contentsRef = """/Contents\s+(\d+)\s+\d+\s+R""".r
    val contentsArr = """(?s)/Contents\s*\[(.*?)\]""".r
    val objRefNum = """(\d+)\s+\d+\s+R""".r
    val resourcesRef = """/Resources\s+(\d+)\s+\d+\s+R""".r
    val out = scala.collection.mutable.Map.empty[Int, Map[String, CMap]]
    for (o <- objs.values if o.dict.contains("/Contents")) {
      val contentNums =
        contentsArr.findFirstMatchIn(o.dict)
          .map(m => objRefNum.findAllMatchIn(m.group(1)).map(_.group(1).toInt).toSeq)
          .getOrElse(
            contentsRef.findAllMatchIn(o.dict).map(_.group(1).toInt).toSeq)
      if (contentNums.nonEmpty) {
        val resDicts = o.dict +:
          resourcesRef.findAllMatchIn(o.dict)
            .flatMap(m => objs.get(m.group(1).toInt).map(_.dict)).toSeq
        val fonts = resolveBindings(objs,
          resDicts.flatMap(fontBindings(objs, _)))
        if (fonts.nonEmpty) contentNums.foreach(n => out(n) = fonts)
      }
    }
    out.toMap
  }

  private val hexTok = """<([0-9A-Fa-f]+)>""".r

  /** Parse a ToUnicode CMap: `begincodespacerange` fixes the code
    * width (default: 2 bytes for composite fonts, 1 for simple);
    * `beginbfchar` maps single codes, `beginbfrange` maps contiguous
    * runs — destination-start form increments the LAST UTF-16 unit
    * (ranges never cross the last-byte boundary in well-formed CMaps),
    * array form lists one destination per code. Destinations are
    * UTF-16BE hex. None when no mapping parses. */
  private[pipeline] def parseCMap(text: String, composite: Boolean): Option[CMap] = {
    def utf16(hex: String): String = {
      val h = if (hex.length % 2 == 1) hex + "0" else hex
      val b = new Array[Byte](h.length / 2)
      var k = 0
      while (k < b.length) {
        b(k) = Integer.parseInt(h.substring(2 * k, 2 * k + 2), 16).toByte
        k += 1
      }
      new String(b, StandardCharsets.UTF_16BE)
    }
    val codeBytes = """(?s)begincodespacerange(.*?)endcodespacerange""".r
      .findFirstMatchIn(text)
      .flatMap(m => hexTok.findFirstMatchIn(m.group(1)))
      .map(m => math.max(1, m.group(1).length / 2))
      .getOrElse(if (composite) 2 else 1)
    val map = scala.collection.mutable.Map.empty[Int, String]
    for (blk <- """(?s)beginbfchar(.*?)endbfchar""".r.findAllMatchIn(text)) {
      val toks = hexTok.findAllMatchIn(blk.group(1)).map(_.group(1)).toSeq
      toks.grouped(2).foreach {
        case Seq(src, dst) => map(Integer.parseInt(src, 16)) = utf16(dst)
        case _ => ()
      }
    }
    for (blk <- """(?s)beginbfrange(.*?)endbfrange""".r.findAllMatchIn(text)) {
      // scan hex tokens and bracket delimiters in order: either
      // <lo> <hi> <dstStart> or <lo> <hi> [ <d0> <d1> … ]
      val b = blk.group(1)
      val tok = """<[0-9A-Fa-f]+>|\[|\]""".r
      val toks = tok.findAllIn(b).toSeq
      var k = 0
      while (k + 3 <= toks.length) {
        if (toks(k).startsWith("<") && toks(k + 1).startsWith("<")) {
          val lo = Integer.parseInt(toks(k).drop(1).dropRight(1), 16)
          val hi = Integer.parseInt(toks(k + 1).drop(1).dropRight(1), 16)
          val n = math.min(hi - lo, 0xffff)     // cap: malformed ranges bounded
          if (toks(k + 2) == "[") {
            var j = k + 3; var c = lo
            while (j < toks.length && toks(j) != "]") {
              if (c <= hi) map(c) = utf16(toks(j).drop(1).dropRight(1))
              c += 1; j += 1
            }
            k = j + 1
          } else {
            val dst = utf16(toks(k + 2).drop(1).dropRight(1))
            var i = 0
            while (i <= n) {
              map(lo + i) =
                if (dst.isEmpty) ""
                else dst.dropRight(1) + (dst.last + i).toChar
              i += 1
            }
            k += 3
          }
        } else k = toks.length                  // malformed block: stop
      }
    }
    if (map.isEmpty) None else Some(CMap(codeBytes, map.toMap))
  }

  private def isDelim(c: Char): Boolean =
    c == '(' || c == ')' || c == '<' || c == '>' || c == '[' || c == ']' ||
      c == '{' || c == '}' || c == '/' || c == '%'

  private def isRegular(c: Char): Boolean =
    !c.isWhitespace && !isDelim(c) && c != 0

  private def isNumber(tok: String): Boolean =
    tok.nonEmpty && tok.forall(c => c.isDigit || c == '.' || c == '+' || c == '-')

  /** Text shown by one content stream: strings of `Tj`/`TJ`/`'`/`"`
    * in stream order; a VERTICAL positioning operator between two
    * shows becomes one newline — `Td`/`TD` break only when their ty
    * operand is nonzero and `Tm` only when its y-translate (f)
    * changes, so horizontal kerning moves within a line (the TeX
    * output shape) no longer split it; `T*`/`ET` and the
    * line-advancing shows always break. A TJ kerning number at or
    * below [[TjWordGap]] becomes ONE space (TeX encodes inter-word
    * spaces as positioning gaps, not space glyphs). `Tf` switches
    * the active font: strings decode through its CMap when it has
    * one (grouped fixed-width codes → Unicode), and byte ≡ Latin-1
    * char otherwise. */
  /** TJ kerning gap that reads as a WORD SPACE: TJ numbers are
    * thousandths of an em subtracted from the pen position, so a
    * strongly negative one is a rightward gap — TeX-produced PDFs
    * encode inter-word spaces this way instead of space glyphs
    * (inter-letter kerning is typically −10..−80; word gaps −200+).
    * Without this, TeX words silently merge: "the␣quick" extracts as
    * "thequick". */
  private val TjWordGap = -180.0

  private[pipeline] def shownText(
      cs: String, fonts: Map[String, CMap] = Map.empty): String = {
    val out = new StringBuilder
    // show operands in stream order: Right = a string, Left = a
    // numeric token (TJ kerning when a show consumes it)
    val operands = scala.collection.mutable.ArrayBuffer.empty[Either[Double, String]]
    val nums = scala.collection.mutable.ArrayBuffer.empty[String]
    var brokeLine = false
    var curFont: Option[CMap] = None
    var curTmY: Option[Double] = None
    var lastName = ""
    val n = cs.length
    var i = 0
    def decode(raw: String): String = curFont match {
      case Some(cm) =>
        val w = cm.codeBytes
        val sb = new StringBuilder
        var k = 0
        while (k + w <= raw.length) {
          var code = 0
          var j = 0
          while (j < w) { code = (code << 8) | (raw.charAt(k + j) & 0xff); j += 1 }
          cm.map.get(code).foreach(sb.append)
          k += w
        }
        sb.toString
      case _ => raw
    }
    def emit(withGaps: Boolean = false): Unit = {
      if (operands.nonEmpty) {
        val sb = new StringBuilder
        // decoded Right-operands, aligned by index — the gap rule
        // needs one glyph lookahead (an explicit space char next to
        // a kerning gap must not double up)
        val decoded = operands.map {
          case Right(s) => decode(s)
          case Left(_) => null
        }
        for (idx <- operands.indices) operands(idx) match {
          case Right(_) => sb.append(decoded(idx))
          case Left(k)
              if withGaps && k <= TjWordGap &&
                sb.nonEmpty && sb.last != ' ' &&
                !decoded.drop(idx + 1).find(_ != null)
                  .exists(_.startsWith(" ")) => sb.append(' ')
          case _ => ()
        }
        val text = sb.toString
        if (text.nonEmpty) {
          if (out.nonEmpty && brokeLine) out.append('\n')
          out.append(text)
          brokeLine = false
        }
      }
    }
    while (i < n) {
      val c = cs.charAt(i)
      if (c == '%') {
        while (i < n && cs.charAt(i) != '\n' && cs.charAt(i) != '\r') i += 1
      } else if (c == '(') {
        val (str, j) = literalString(cs, i); operands += Right(str); i = j
      } else if (c == '<') {
        if (i + 1 < n && cs.charAt(i + 1) == '<') i += 2
        else { val (str, j) = hexString(cs, i); operands += Right(str); i = j }
      } else if (c == '>' || c == '[' || c == ']' || c == '{' || c == '}') {
        i += 1
      } else if (c == '/') {
        i += 1
        val start = i
        while (i < n && isRegular(cs.charAt(i))) i += 1
        lastName = cs.substring(start, i)
      } else if (isRegular(c)) {
        val start = i
        while (i < n && isRegular(cs.charAt(i))) i += 1
        val tok = cs.substring(start, i)
        if (!isNumber(tok)) {
          tok match {
            // TJ honors kerning word-gaps; Tj/'/" show plain strings
            case "TJ" => emit(withGaps = true)
            case "Tj" => emit()
            case "'" | "\"" => brokeLine = true; emit(); curTmY = None
            case "Td" | "TD" =>
              // break only on a VERTICAL move: ty (the last numeric
              // operand) nonzero; `10 0 Td` is in-line kerning. A
              // vertical move also INVALIDATES the remembered Tm
              // y-translate — the baseline left it, so a later Tm
              // returning to that y is a REAL line change (two-column
              // layouts), not horizontal placement
              if (!nums.lastOption.flatMap(_.toDoubleOption).contains(0.0)) {
                brokeLine = true
                curTmY = None
              }
            case "Tm" =>
              // break only when the matrix's y-translate (f, the last
              // operand) CHANGES — same-y Tm is horizontal placement
              val y = nums.lastOption.flatMap(_.toDoubleOption)
              if (y != curTmY) brokeLine = true
              curTmY = y
            case "T*" | "ET" => brokeLine = true; curTmY = None
            case "Tf" => curFont = fonts.get(lastName)
            // inline image: raw pixel bytes follow ID and must never
            // reach the operand scanner (binary can spell "(…) Tj")
            case "BI" => i = skipInlineImage(cs, i)
            case _ => ()
          }
          operands.clear()
          nums.clear()
        } else {
          nums += tok
          tok.toDoubleOption.foreach(operands += Left(_))
        }
      } else i += 1
    }
    out.toString
  }

  /** Skip an inline image (`BI` dict `ID` binary `EI`): from just
    * after the `BI` token, advance past the image dictionary to the
    * `ID` token, then past the binary payload to a whitespace-
    * delimited `EI` (the payload is raw bytes — `EI` inside pixel
    * data without whitespace on both sides does not terminate).
    * Unterminated images consume the rest of the stream (skip, never
    * misparse). */
  private def skipInlineImage(cs: String, from: Int): Int = {
    val n = cs.length
    // find the ID token (preceded by whitespace or a delimiter, and
    // followed by one whitespace byte before the data)
    var i = from
    while (i + 1 < n &&
        !(cs.charAt(i) == 'I' && cs.charAt(i + 1) == 'D' &&
          (i == 0 || cs.charAt(i - 1).isWhitespace || isDelim(cs.charAt(i - 1))) &&
          (i + 2 >= n || !isRegular(cs.charAt(i + 2))))) i += 1
    if (i + 1 >= n) return n
    var j = i + 3                               // ID + the single data separator
    while (j + 1 < n &&
        !(cs.charAt(j) == 'E' && cs.charAt(j + 1) == 'I' &&
          cs.charAt(j - 1).isWhitespace &&
          (j + 2 >= n || !isRegular(cs.charAt(j + 2))))) j += 1
    if (j + 1 >= n) n else j + 2
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

/** Extraction-path labels reported by [[AutoPartitioner]]: which
  * branch produced a document's text — the per-document counter the
  * pipeline surfaces so a corpus run shows HOW its text was obtained
  * (real PDF text layer vs the OCR seam). */
object ExtractPath {
  /** PDF magic + the pure-JVM text layer yielded elements. */
  val PdfText = "pdf_text"
  /** PDF magic, no text layer, but raster-image XObjects (DCT/JPX/
    * CCITT/JBIG2) — a scanned/image PDF routed to the OCR leg,
    * counted apart from the generic fallback. */
  val PdfImage = "pdf_image"
  /** PDF magic + `/Encrypt`, and the EMPTY user password opened it
    * (standard handler: RC4 V1-2, V4 /AESV2 or /V2 crypt filters,
    * AES-256 V5 R5/R6, or a V4/V5 `/StmF /Identity` file whose
    * streams were plaintext all along): the real text layer was
    * extracted — counted apart from plain pdf_text so corpus health
    * shows how much of the corpus is "encrypted but readable by
    * design". */
  val PdfDecrypted = "pdf_decrypted"
  /** PDF magic + a `/Encrypt` entry the empty-password subset cannot
    * open (real passwords, out-of-subset handlers) — string/stream
    * bytes stay ciphertext, extraction never runs; routed to the base
    * partitioner and counted as its own corpus-health bucket. */
  val PdfEncrypted = "pdf_encrypted"
  /** PDF magic but no decodable text (CMap-less composite, unknown
    * filters, no recognizable images) — fell through to the OCR-seam
    * base partitioner. */
  val PdfFallback = "pdf_fallback"
  /** No PDF magic — base partitioner directly (raster/plain bytes). */
  val NonPdf = "non_pdf"
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

  /** Elements plus the [[ExtractPath]] label of the branch that
    * produced them — the auditable form [[OcrPipeline.extractTextAudited]]
    * surfaces as a column. */
  def partitionWithPath(
      content: Array[Byte],
      strategy: PartitionStrategy): (Seq[String], String) =
    if (PdfTextPartitioner.hasPdfMagic(content)) {
      if (PdfTextPartitioner.isEncrypted(content)) {
        // decrypt ONCE; every leg below consumes the same plaintext
        // copy. Empty password opens the file ⇒ readable by design:
        // text out ⇒ pdf_decrypted; no text ⇒ the same image-or-
        // fallback routing as unencrypted documents, over the
        // PLAINTEXT (an encrypted scan is a scan; an encrypted
        // unparseable doc falls back with recoverable bytes, not
        // ciphertext). Only a file the empty password does NOT open
        // stays ciphertext under pdf_encrypted.
        PdfCrypt.decryptStreams(content) match {
          case None =>
            (base.partition(content, strategy), ExtractPath.PdfEncrypted)
          case Some(dec) =>
            val els = pdf.partitionPlain(dec)
            if (els.nonEmpty) (els, ExtractPath.PdfDecrypted)
            else imageOrFallback(dec, strategy)
        }
      } else {
        val els = pdf.partition(content, strategy)
        if (els.nonEmpty) (els, ExtractPath.PdfText)
        else imageOrFallback(content, strategy)
      }
    } else (base.partition(content, strategy), ExtractPath.NonPdf)

  /** The no-text legs, over plaintext bytes. Image leg: raster-codec
    * XObjects announced in dicts (cheap byte scan), or images the
    * extraction walk actually finds — Flate-raster XObjects and
    * inline BI images carry no raster codec name, but an image-only
    * document holding them is still a scan, not "nothing we
    * recognize". Extraction runs ONCE (only on the already-expensive
    * no-text path) and its images feed the renditions directly. The
    * seam gets OCR-READY page images (JPEG pass-through, decoded
    * rasters as BMP) — the reference's hi_res shape; whole-content
    * bytes only when no image renders. */
  private def imageOrFallback(
      plain: Array[Byte],
      strategy: PartitionStrategy): (Seq[String], String) = {
    val imgs = PdfImages.extract(plain)
    if (PdfTextPartitioner.hasRasterImage(plain) || imgs.nonEmpty) {
      val renditions = PdfImages.ocrPayloads(imgs)
      val els =
        if (renditions.nonEmpty)
          renditions.flatMap(base.partition(_, strategy))
        else base.partition(plain, strategy)
      (els, ExtractPath.PdfImage)
    } else (base.partition(plain, strategy), ExtractPath.PdfFallback)
  }

  override def partition(
      content: Array[Byte],
      strategy: PartitionStrategy): Seq[String] =
    partitionWithPath(content, strategy)._1
}
