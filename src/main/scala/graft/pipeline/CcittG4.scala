package graft.pipeline

import scala.collection.mutable.ArrayBuffer

/** CCITT Group 4 (ITU-T T.6, "MMR") two-dimensional fax codec — the
  * compression real scanned PDFs overwhelmingly carry
  * (`/CCITTFaxDecode` with `/K -1`), so decoding it is what turns the
  * scanned-document leg from "payload passthrough" into actual
  * pixels a perceptual hash can see. Pure JVM, no AWT: a bit reader
  * over the payload, the public T.4 white/black run-length Huffman
  * tables, and the T.6 vertical/horizontal/pass coding modes over a
  * reference line of changing elements.
  *
  * Both directions are implemented — [[encode]] exists so fixtures
  * ([[PdfGen.ccittPdf]]) are produced by the same public-spec
  * arithmetic the decoder reverses, making encode→container→decode a
  * live round trip (the [[PdfCrypt]] fixture discipline). The encoder
  * uses the standard mode preference (pass when b2 < a1, vertical
  * within ±3, horizontal otherwise), so randomized round-trip specs
  * exercise every decoder mode, makeup-code runs past 64/2560, and
  * zero-length horizontal runs.
  *
  * Output convention: one byte per pixel, 255 = white, 0 = black
  * (luma, ready for [[PdfImages.lumaGrid]]). `/BlackIs1` only affects
  * the PACKED 1-bit representation PDF consumers see; T.6 runs are
  * explicitly white/black, so the luma bytes are parameter-free.
  *
  * Decode is strict where it must be (unknown code, overrun line,
  * truncated payload → None: skip-not-misparse, the
  * [[PdfTextPartitioner]] filter contract) and lenient where real
  * writers vary (missing EOFB at the end of the last row is
  * accepted).
  */
object CcittG4 {

  // ---- ITU-T T.4 §2 run-length code tables: (run, code-as-binary-string).
  // Transcribed from the public Recommendation tables; the encoder and
  // decoder share them, and CcittG4Spec pins prefix-freeness plus
  // known bit vectors (an all-white G4 row is V0^columns = "1"*columns).

  private val WhiteCodes: Seq[(Int, String)] = Seq(
    0 -> "00110101", 1 -> "000111", 2 -> "0111", 3 -> "1000",
    4 -> "1011", 5 -> "1100", 6 -> "1110", 7 -> "1111",
    8 -> "10011", 9 -> "10100", 10 -> "00111", 11 -> "01000",
    12 -> "001000", 13 -> "000011", 14 -> "110100", 15 -> "110101",
    16 -> "101010", 17 -> "101011", 18 -> "0100111", 19 -> "0001100",
    20 -> "0001000", 21 -> "0010111", 22 -> "0000011", 23 -> "0000100",
    24 -> "0101000", 25 -> "0101011", 26 -> "0010011", 27 -> "0100100",
    28 -> "0011000", 29 -> "00000010", 30 -> "00000011", 31 -> "00011010",
    32 -> "00011011", 33 -> "00010010", 34 -> "00010011", 35 -> "00010100",
    36 -> "00010101", 37 -> "00010110", 38 -> "00010111", 39 -> "00101000",
    40 -> "00101001", 41 -> "00101010", 42 -> "00101011", 43 -> "00101100",
    44 -> "00101101", 45 -> "00000100", 46 -> "00000101", 47 -> "00001010",
    48 -> "00001011", 49 -> "01010010", 50 -> "01010011", 51 -> "01010100",
    52 -> "01010101", 53 -> "00100100", 54 -> "00100101", 55 -> "01011000",
    56 -> "01011001", 57 -> "01011010", 58 -> "01011011", 59 -> "01001010",
    60 -> "01001011", 61 -> "00110010", 62 -> "00110011", 63 -> "00110100",
    // makeup codes
    64 -> "11011", 128 -> "10010", 192 -> "010111", 256 -> "0110111",
    320 -> "00110110", 384 -> "00110111", 448 -> "01100100",
    512 -> "01100101", 576 -> "01101000", 640 -> "01100111",
    704 -> "011001100", 768 -> "011001101", 832 -> "011010010",
    896 -> "011010011", 960 -> "011010100", 1024 -> "011010101",
    1088 -> "011010110", 1152 -> "011010111", 1216 -> "011011000",
    1280 -> "011011001", 1344 -> "011011010", 1408 -> "011011011",
    1472 -> "010011000", 1536 -> "010011001", 1600 -> "010011010",
    1664 -> "011000", 1728 -> "010011011")

  private val BlackCodes: Seq[(Int, String)] = Seq(
    0 -> "0000110111", 1 -> "010", 2 -> "11", 3 -> "10",
    4 -> "011", 5 -> "0011", 6 -> "0010", 7 -> "00011",
    8 -> "000101", 9 -> "000100", 10 -> "0000100", 11 -> "0000101",
    12 -> "0000111", 13 -> "00000100", 14 -> "00000111",
    15 -> "000011000", 16 -> "0000010111", 17 -> "0000011000",
    18 -> "0000001000", 19 -> "00001100111", 20 -> "00001101000",
    21 -> "00001101100", 22 -> "00000110111", 23 -> "00000101000",
    24 -> "00000010111", 25 -> "00000011000", 26 -> "000011001010",
    27 -> "000011001011", 28 -> "000011001100", 29 -> "000011001101",
    30 -> "000001101000", 31 -> "000001101001", 32 -> "000001101010",
    33 -> "000001101011", 34 -> "000011010010", 35 -> "000011010011",
    36 -> "000011010100", 37 -> "000011010101", 38 -> "000011010110",
    39 -> "000011010111", 40 -> "000001101100", 41 -> "000001101101",
    42 -> "000011011010", 43 -> "000011011011", 44 -> "000001010100",
    45 -> "000001010101", 46 -> "000001010110", 47 -> "000001010111",
    48 -> "000001100100", 49 -> "000001100101", 50 -> "000001010010",
    51 -> "000001010011", 52 -> "000000100100", 53 -> "000000110111",
    54 -> "000000111000", 55 -> "000000100111", 56 -> "000000101000",
    57 -> "000001011000", 58 -> "000001011001", 59 -> "000000101011",
    60 -> "000000101100", 61 -> "000001011010", 62 -> "000001100110",
    63 -> "000001100111",
    // makeup codes
    64 -> "0000001111", 128 -> "000011001000", 192 -> "000011001001",
    256 -> "000001011011", 320 -> "000000110011", 384 -> "000000110100",
    448 -> "000000110101", 512 -> "0000001101100", 576 -> "0000001101101",
    640 -> "0000001001010", 704 -> "0000001001011", 768 -> "0000001001100",
    832 -> "0000001001101", 896 -> "0000001110010", 960 -> "0000001110011",
    1024 -> "0000001110100", 1088 -> "0000001110101",
    1152 -> "0000001110110", 1216 -> "0000001110111",
    1280 -> "0000001010010", 1344 -> "0000001010011",
    1408 -> "0000001010100", 1472 -> "0000001010101",
    1536 -> "0000001011010", 1600 -> "0000001011011",
    1664 -> "0000001100100", 1728 -> "0000001100101")

  /** Extended makeup codes 1792-2560 (T.4 table 3: shared by both
    * colors). */
  private val ExtCodes: Seq[(Int, String)] = Seq(
    1792 -> "00000001000", 1856 -> "00000001100", 1920 -> "00000001101",
    1984 -> "000000010010", 2048 -> "000000010011", 2112 -> "000000010100",
    2176 -> "000000010101", 2240 -> "000000010110", 2304 -> "000000010111",
    2368 -> "000000011100", 2432 -> "000000011101", 2496 -> "000000011110",
    2560 -> "000000011111")

  private[pipeline] def runTable(black: Boolean): Seq[(Int, String)] =
    (if (black) BlackCodes else WhiteCodes) ++ ExtCodes

  // mode codes (T.6 table 1); EOL is T.4's 000000000001, EOFB = EOL EOL
  private val ModeV0 = "1"
  private val ModeVR = Array("", "011", "000011", "0000011")
  private val ModeVL = Array("", "010", "000010", "0000010")
  private val ModeH = "001"
  private val ModePass = "0001"
  private val Eol = "000000000001"

  private final class BitWriter {
    private val buf = new ArrayBuffer[Byte]()
    private var cur = 0
    private var nBits = 0
    def put(code: String): Unit = {
      var i = 0
      while (i < code.length) {
        cur = (cur << 1) | (if (code.charAt(i) == '1') 1 else 0)
        nBits += 1
        if (nBits == 8) { buf += cur.toByte; cur = 0; nBits = 0 }
        i += 1
      }
    }
    /** Zero-pad to the next byte boundary (`/EncodedByteAlign`). */
    def alignByte(): Unit = while (nBits != 0) put("0")
    def toBytes: Array[Byte] = {
      if (nBits > 0) (buf :+ (cur << (8 - nBits)).toByte).toArray
      else buf.toArray
    }
  }

  private final class BitReader(data: Array[Byte]) {
    private var pos = 0                       // bit cursor
    val size: Int = data.length * 8
    def remaining: Int = size - pos
    def peek(n: Int): Int = {                 // -1 when fewer than n bits left
      if (pos + n > size) return -1
      var v = 0
      var i = 0
      while (i < n) {
        val p = pos + i
        v = (v << 1) | ((data(p >> 3) >> (7 - (p & 7))) & 1)
        i += 1
      }
      v
    }
    def skip(n: Int): Unit = pos += n
    /** Advance to the next byte boundary (`/EncodedByteAlign`). */
    def alignByte(): Unit = if ((pos & 7) != 0) pos += 8 - (pos & 7)
  }

  /** (length, code-bits) → value decoder over a code list. */
  private final class Codebook(codes: Seq[(String, Int)]) {
    val maxLen: Int = codes.map(_._1.length).max
    private val m: Map[(Int, Int), Int] =
      codes.map { case (s, v) => (s.length, Integer.parseInt(s, 2)) -> v }.toMap
    /** Decode one code at the reader; None on no-match/EOF. */
    def read(br: BitReader): Option[Int] = {
      var len = 1
      while (len <= maxLen) {
        val bits = br.peek(len)
        if (bits < 0) return None
        m.get((len, bits)) match {
          case Some(v) => br.skip(len); return Some(v)
          case None => len += 1
        }
      }
      None
    }
  }

  // decoder codebooks: runs keyed by color; modes as small ints
  private val WhiteBook = new Codebook(runTable(black = false).map(_.swap))
  private val BlackBook = new Codebook(runTable(black = true).map(_.swap))
  private val MPass = 0; private val MHoriz = 1; private val MEol = 9
  private val ModeBook = new Codebook(Seq(
    ModePass -> MPass, ModeH -> MHoriz, ModeV0 -> 2,
    ModeVR(1) -> 3, ModeVR(2) -> 4, ModeVR(3) -> 5,
    ModeVL(1) -> 6, ModeVL(2) -> 7, ModeVL(3) -> 8,
    Eol -> MEol))

  // encoder maps: (black, run) -> code for runs < 64 and makeups
  private val EncWhite = runTable(black = false).toMap
  private val EncBlack = runTable(black = true).toMap

  /** Total run of one color: zero or more makeup codes then a
    * terminating code (< 64). None on malformed input or a run past
    * `maxRun` — which also bounds the loop (every makeup is ≥ 64, so
    * iterations ≤ maxRun/64 + 1; a 200k-wide all-white line is ~78
    * consecutive 2560-makeups and must decode). */
  private def readRun(br: BitReader, black: Boolean, maxRun: Int): Option[Int] = {
    val book = if (black) BlackBook else WhiteBook
    var total = 0
    var r = 64
    while (r >= 64) {
      book.read(br) match {
        case None => return None
        case Some(v) =>
          total += v
          if (total > maxRun) return None
          r = v
      }
    }
    Some(total)
  }

  private def writeRun(bw: BitWriter, run0: Int, black: Boolean): Unit = {
    val enc = if (black) EncBlack else EncWhite
    var run = run0
    while (run >= 2624) { bw.put(enc(2560)); run -= 2560 }
    if (run >= 64) {
      val makeup = (run / 64) * 64
      bw.put(enc(makeup))
      run -= makeup
    }
    bw.put(enc(run))
  }

  /** Changing elements of a byte-per-pixel line (positions where the
    * color differs from the previous pixel; first pixel "changes"
    * from white). */
  private def changesOf(line: Array[Byte], off: Int, columns: Int): Array[Int] = {
    val out = new ArrayBuffer[Int]()
    var prev = 255                            // imaginary white before pixel 0
    var x = 0
    while (x < columns) {
      val v = line(off + x) & 0xff
      if (v != prev) { out += x; prev = v }
      x += 1
    }
    out.toArray
  }

  /** b1 = first changing element of `ref` strictly right of `a0`
    * whose "transition parity" is opposite to the current color:
    * even indices flip white→black, odd black→white. `cursor` is a
    * monotone resume index (a0 never decreases within a line, so the
    * scan never restarts — without it a dense halftone line costs
    * O(changes²) per row). Returns (b1, b2, newCursor), b1/b2
    * clamped to `columns`. Transitions alternate strictly, so the
    * first index past a0 either has the wanted parity or its
    * successor does. */
  private def findB(ref: Array[Int], cursor: Int, a0: Int,
      colorBlack: Boolean, columns: Int): (Int, Int, Int) = {
    val wantParity = if (colorBlack) 1 else 0
    var c = cursor
    while (c < ref.length && ref(c) <= a0) c += 1
    var i = c
    if (i < ref.length && (i & 1) != wantParity) i += 1
    val b1 = if (i < ref.length) ref(i) else columns
    val b2 = if (i + 1 < ref.length) ref(i + 1) else columns
    (b1, math.min(b2, columns), c)
  }

  /** G4-encode a byte-per-pixel bitmap (0 = black, anything else
    * white), `rows`×`columns`, EOFB-terminated, zero-padded to a
    * byte. `byteAlign` (`/EncodedByteAlign`) pads each CODED line to
    * start on a byte boundary. */
  def encode(pixels: Array[Byte], columns: Int, rows: Int,
      byteAlign: Boolean = false): Array[Byte] = {
    require(columns > 0 && rows > 0 && pixels.length == columns * rows,
      s"need $columns x $rows pixels, got ${pixels.length}")
    val bw = new BitWriter
    var ref = Array.empty[Int]                // all-white imaginary first reference
    var row = 0
    while (row < rows) {
      if (byteAlign) bw.alignByte()
      val cur = changesOf(pixels, row * columns, columns)
      encode2DLine(bw, ref, cur, columns)
      ref = cur
      row += 1
    }
    bw.put(Eol); bw.put(Eol)                  // EOFB
    bw.toBytes
  }

  /** Decode a G4 payload to byte-per-pixel luma (255 white, 0 black).
    * None on any malformed code, line overrun, or truncation before
    * the final row (a missing EOFB after the last row is tolerated).
    * `byteAlign` honors `/EncodedByteAlign` — each coded line starts
    * on a byte boundary (previously only the G3 path supported it, so
    * a legal byte-aligned G4 stream fell to passthrough — r15
    * ADVICE).
    */
  def decode(data: Array[Byte], columns: Int, rows: Int,
      byteAlign: Boolean = false): Option[Array[Byte]] = {
    if (data == null || columns <= 0 || rows <= 0) return None
    if (columns.toLong * rows > (1L << 28)) return None  // 256M px guard
    val br = new BitReader(data)
    val out = new Array[Byte](columns * rows)
    java.util.Arrays.fill(out, 255.toByte)
    var ref = Array.empty[Int]
    var row = 0
    while (row < rows) {
      if (byteAlign) br.alignByte()
      decode2DLine(br, ref, columns, out, row * columns) match {
        case None => return None
        case Some(cur) => ref = cur
      }
      row += 1
    }
    Some(out)
  }

  /** One 2D-coded line against reference `ref`; fills `out` from
    * `off` (pre-filled white) and returns the line's changing
    * elements. None on a malformed code or an in-body EOL. */
  private def decode2DLine(
      br: BitReader, ref: Array[Int], columns: Int,
      out: Array[Byte], off: Int): Option[Array[Int]] = {
    val cur = new ArrayBuffer[Int]()
    var a0 = -1
    var black = false
    var bad = false
    var refCur = 0
    while (!bad && a0 < columns) {
      val (b1, b2, rc) = findB(ref, refCur, a0, black, columns)
      refCur = rc
      ModeBook.read(br) match {
        case None => bad = true
        case Some(MEol) =>
          // EOL/EOFB inside the line body: premature end
          bad = true
        case Some(MPass) =>
          if (black) java.util.Arrays.fill(
            out, off + math.max(a0, 0), off + b2, 0.toByte)
          a0 = b2
        case Some(MHoriz) =>
          val a0s = math.max(a0, 0)
          (readRun(br, black, columns), readRun(br, !black, columns)) match {
            case (Some(r1), Some(r2)) =>
              val a1 = a0s + r1
              val a2 = a1 + r2
              // zero-length FIRST runs are only well-formed at the
              // very start of a line (a0 = -1, a black first pixel
              // codes white-run 0 then the black run); mid-line they
              // would record duplicate/non-monotone changing elements
              // and break findB's strict-alternation parity on the
              // NEXT row — reject rather than misparse (r15 ADVICE).
              // A zero-length SECOND run is legal exactly when the
              // first run reaches the right edge (a1 == a2 == columns
              // — the encoder emits it for a line ending mid-pair);
              // both entries are then the filtered sentinel.
              if (a2 > columns || a1 > columns ||
                  (a0 >= 0 && (r1 == 0 || a2 <= a0)) ||
                  (r2 == 0 && a2 < columns)) bad = true
              else {
                if (black)
                  java.util.Arrays.fill(out, off + a0s, off + a1, 0.toByte)
                else
                  java.util.Arrays.fill(out, off + a1, off + a2, 0.toByte)
                cur += a1; cur += a2
                a0 = a2
              }
            case _ => bad = true
          }
        case Some(v) =>                       // vertical modes 2..8
          val d = v match {
            case 2 => 0
            case 3 => 1; case 4 => 2; case 5 => 3
            case 6 => -1; case 7 => -2; case 8 => -3
          }
          val a1 = b1 + d
          if (a1 < 0 || a1 > columns || a1 <= a0) bad = true
          else {
            if (black) java.util.Arrays.fill(
              out, off + math.max(a0, 0), off + a1, 0.toByte)
            cur += a1
            a0 = a1
            black = !black
          }
      }
    }
    if (bad) None
    // drop the sentinel "change at columns" entries: a change AT
    // columns is the line ending, not a reference transition
    else Some(cur.filter(_ < columns).toArray)
  }

  /** One 1D (modified-Huffman) line: alternating white/black runs
    * summing exactly to `columns`. */
  private def decode1DLine(
      br: BitReader, columns: Int, out: Array[Byte], off: Int): Option[Array[Int]] = {
    var pos = 0
    var black = false
    while (pos < columns) {
      readRun(br, black, columns - pos) match {
        case None => return None
        case Some(r) =>
          if (black && r > 0)
            java.util.Arrays.fill(out, off + pos, off + pos + r, 0.toByte)
          pos += r
          black = !black
      }
    }
    // the 2D reference for the NEXT line: derive transitions from the
    // painted pixels (zero-length runs make run boundaries and color
    // changes diverge — the pixels are the truth)
    Some(changesOf(out, off, columns))
  }

  /** Consume fill bits + one EOL (≥11 zeros then a 1); None when the
    * next bits are not an EOL. */
  private def readEolG3(br: BitReader): Boolean = {
    var zeros = 0
    var b = br.peek(1)
    while (b == 0) { br.skip(1); zeros += 1; b = br.peek(1) }
    if (b < 0 || zeros < 11) false
    else { br.skip(1); true }
  }

  /** CCITT Group 3 decode (`/K >= 0`): `k == 0` ⇒ pure 1D
    * modified-Huffman lines (the PDF-common shape has NO EOLs —
    * `/EndOfLine false` — and runs just concatenate); `k > 0` ⇒ each
    * line is EOL + a tag bit choosing 1D or 2D against the previous
    * line (the classic fax shape, which always carries EOLs).
    * `byteAlign` (`/EncodedByteAlign`) pads each line start to a
    * byte boundary. Output luma bytes, 255 white / 0 black —
    * [[decode]]'s convention. */
  def decodeG3(
      data: Array[Byte], columns: Int, rows: Int, k: Int,
      endOfLine: Boolean = false,
      byteAlign: Boolean = false): Option[Array[Byte]] = {
    if (data == null || columns <= 0 || rows <= 0 || k < 0) return None
    if (columns.toLong * rows > (1L << 28)) return None
    val br = new BitReader(data)
    val out = new Array[Byte](columns * rows)
    java.util.Arrays.fill(out, 255.toByte)
    var ref = Array.empty[Int]
    var row = 0
    while (row < rows) {
      if (byteAlign) br.alignByte()
      val twoDim =
        if (k == 0) {
          if (endOfLine && !readEolG3(br)) return None
          false
        } else {
          // K > 0: EOL then the 1-bit mode tag (1 = 1D, 0 = 2D)
          if (!readEolG3(br)) return None
          br.peek(1) match {
            case 1 => br.skip(1); false
            case 0 => br.skip(1); true
            case _ => return None
          }
        }
      val line =
        if (twoDim) decode2DLine(br, ref, columns, out, row * columns)
        else decode1DLine(br, columns, out, row * columns)
      line match {
        case None => return None
        case Some(cur) => ref = cur
      }
      row += 1
    }
    Some(out)
  }

  /** Group 3 encode: `k == 0` ⇒ 1D lines with no EOLs (the PDF
    * default `/EndOfLine false`); `k > 0` ⇒ EOL + tag per line, a 1D
    * line at least every `k` rows and 2D in between. */
  def encodeG3(pixels: Array[Byte], columns: Int, rows: Int, k: Int,
      byteAlign: Boolean = false): Array[Byte] = {
    require(columns > 0 && rows > 0 && pixels.length == columns * rows,
      s"need $columns x $rows pixels, got ${pixels.length}")
    require(k >= 0, s"G3 k must be >= 0, got $k")
    val bw = new BitWriter
    var ref = Array.empty[Int]
    var row = 0
    while (row < rows) {
      if (byteAlign) bw.alignByte()
      val cur = changesOf(pixels, row * columns, columns)
      val twoDim = k > 0 && row % k != 0
      if (k > 0) {
        bw.put(Eol)
        bw.put(if (twoDim) "0" else "1")
      }
      if (twoDim) encode2DLine(bw, ref, cur, columns)
      else {
        // 1D: alternating runs from the changing elements
        var pos = 0
        var black = false
        var ci = 0
        while (pos < columns) {
          val next = if (ci < cur.length) cur(ci) else columns
          writeRun(bw, next - pos, black)
          pos = next
          black = !black
          ci += 1
        }
      }
      ref = cur
      row += 1
    }
    bw.toBytes
  }

  private def encode2DLine(
      bw: BitWriter, ref: Array[Int], cur: Array[Int], columns: Int): Unit = {
    var a0 = -1
    var black = false
    var refCur = 0
    var j = 0
    while (a0 < columns) {
      val (b1, b2, rc) = findB(ref, refCur, a0, black, columns)
      refCur = rc
      while (j < cur.length && cur(j) <= a0) j += 1
      val a1 = if (j < cur.length) cur(j) else columns
      if (b2 < a1) {
        bw.put(ModePass)
        a0 = b2
      } else if (math.abs(a1 - b1) <= 3) {
        val d = a1 - b1
        bw.put(
          if (d == 0) ModeV0
          else if (d > 0) ModeVR(d)
          else ModeVL(-d))
        a0 = a1
        black = !black
      } else {
        val a2 = if (j + 1 < cur.length) cur(j + 1) else columns
        bw.put(ModeH)
        val a0s = math.max(a0, 0)
        writeRun(bw, a1 - a0s, black)
        writeRun(bw, a2 - a1, !black)
        a0 = a2
      }
    }
  }
}
