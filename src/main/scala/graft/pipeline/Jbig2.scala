package graft.pipeline

import scala.collection.mutable.ArrayBuffer

/** JBIG2 (ITU-T T.88) — the bilevel codec modern scanners embed in
  * PDFs (`/JBIG2Decode`), typically 2-5× smaller than CCITT G4.
  * Pure JVM, BOTH directions, covering the embedded-stream subset a
  * PDF image XObject actually carries:
  *
  *  - the **MQ arithmetic coder** (T.88 Annex E: the 47-state Qe
  *    table shared with JPEG 2000, byte-stuffing around 0xFF,
  *    conditional exchange, SETBITS flush);
  *  - **generic region** coding (§6.2), template 0 with nominal AT
  *    pixels, TPGDON off — the shape encoders emit for scanned
  *    masks;
  *  - the **embedded segment layer** (§7.2 headers as PDF carries
  *    them: page info + immediate generic region; unknown segment
  *    types are skipped by their declared length).
  *
  * Like [[PdfCrypt]] and [[CcittG4]], the ENCODER exists so fixtures
  * are produced by the same public-spec arithmetic the decoder
  * reverses — encode→container→decode is a live round trip and
  * randomized bitmaps exercise every MQ state transition. Honest
  * caveat (scoped like the Kafka item): the container has no
  * reference JBIG2 decoder or sample corpus, so CROSS-implementation
  * conformance (exact context bit order, table transcription) is
  * pinned only by the spec text itself; the segment layer, region
  * arithmetic, and PDF plumbing are fully exercised. MMR-mode
  * regions (T.6 coding) decode through [[CcittG4]]; files needing
  * `/JBIG2Globals`, refinement, or symbol dictionaries stay
  * payload-passthrough (None ⇒ the OCR seam), never misparsed.
  *
  * Bit convention: 1 = black (T.88 foreground), decode returns
  * byte-per-pixel luma (0 black, 255 white) — [[PdfImages.lumaGrid]]
  * ready, matching [[CcittG4.decode]].
  */
object Jbig2 {

  // ---- T.88 Table E.1: (Qe, NMPS, NLPS, SWITCH) per state.
  private val Qe = Array(0x5601, 0x3401, 0x1801, 0x0AC1, 0x0521, 0x0221,
    0x5601, 0x5401, 0x4801, 0x3801, 0x3001, 0x2401, 0x1C01, 0x1601,
    0x5601, 0x5401, 0x5101, 0x4801, 0x3801, 0x3401, 0x3001, 0x2801,
    0x2401, 0x2201, 0x1C01, 0x1801, 0x1601, 0x1401, 0x1201, 0x1101,
    0x0AC1, 0x09C1, 0x08A1, 0x0521, 0x0441, 0x02A1, 0x0221, 0x0141,
    0x0111, 0x0085, 0x0049, 0x0025, 0x0015, 0x0009, 0x0005, 0x0001,
    0x5601)
  private val Nmps = Array(1, 2, 3, 4, 5, 38, 7, 8, 9, 10, 11, 12, 13, 29,
    15, 16, 17, 18, 19, 20, 21, 22, 23, 24, 25, 26, 27, 28, 29, 30, 31,
    32, 33, 34, 35, 36, 37, 38, 39, 40, 41, 42, 43, 44, 45, 45, 46)
  private val Nlps = Array(1, 6, 9, 12, 29, 33, 6, 14, 14, 14, 17, 18, 20,
    21, 14, 14, 15, 16, 17, 18, 19, 19, 20, 21, 22, 23, 24, 25, 26, 27,
    28, 29, 30, 31, 32, 33, 34, 35, 36, 37, 38, 39, 40, 41, 42, 43, 46)
  private val Switch = Array(1, 0, 0, 0, 0, 0, 1, 0, 0, 0, 0, 0, 0, 0, 1,
    0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0,
    0, 0, 0, 0, 0, 0, 0, 0, 0, 0)

  /** MQ decoder over `data[start, end)` (T.88 Annex E software
    * conventions; reads past the end behave as 0xFF padding). */
  private final class MqDecoder(data: Array[Byte], start: Int, end: Int) {
    private var bp = start
    private var c = 0L
    private var a = 0L
    private var ct = 0
    private def b(i: Int): Int = if (i < end) data(i) & 0xff else 0xff

    private def byteIn(): Unit = {
      if (b(bp) == 0xff) {
        if (b(bp + 1) > 0x8f) { c += 0xff00; ct = 8 }
        else { bp += 1; c += b(bp).toLong << 9; ct = 7 }
      } else { bp += 1; c += b(bp).toLong << 8; ct = 8 }
    }

    // INITDEC
    c = b(bp).toLong << 16
    byteIn()
    c <<= 7; ct -= 7; a = 0x8000L

    /** Decode one decision under context slot `cx` of `ctx`. */
    def decode(ctx: Contexts, cx: Int): Int = {
      val i0 = ctx.i(cx) & 0xff
      val mps = ctx.mps(cx).toInt
      val qe = Qe(i0)
      a -= qe
      var d = 0
      if (((c >>> 16) & 0xffff) < qe) {
        // LPS path (with conditional exchange)
        if (a < qe) { d = mps; ctx.i(cx) = Nmps(i0).toByte }
        else {
          d = 1 - mps
          if (Switch(i0) == 1) ctx.mps(cx) = (1 - mps).toByte
          ctx.i(cx) = Nlps(i0).toByte
        }
        a = qe
        renorm()
      } else {
        c -= qe.toLong << 16
        if ((a & 0x8000L) == 0) {
          if (a < qe) {
            d = 1 - mps
            if (Switch(i0) == 1) ctx.mps(cx) = (1 - mps).toByte
            ctx.i(cx) = Nlps(i0).toByte
          } else { d = mps; ctx.i(cx) = Nmps(i0).toByte }
          renorm()
        } else d = mps
      }
      d
    }

    private def renorm(): Unit = {
      while ({
        if (ct == 0) byteIn()
        a <<= 1; c = (c << 1) & 0xffffffffL; ct -= 1
        (a & 0x8000L) == 0
      }) ()
    }
  }

  /** Per-region adaptive context table: two flat byte arrays, not
    * 2^16 heap objects — the table is reallocated per image, and on
    * small fixture images object-per-slot allocation dominated the
    * whole decode (the r15 ×10 probe caught it at ×4.8 wall). */
  private final class Contexts {
    val i = new Array[Byte](1 << 16)
    val mps = new Array[Byte](1 << 16)
    def reset(): Unit = {
      java.util.Arrays.fill(i, 0.toByte)
      java.util.Arrays.fill(mps, 0.toByte)
    }
  }

  /** Per-thread table reuse: a 128 KB fill beats a 128 KB allocation
    * per image under executor-thread churn (encode and decode never
    * overlap within one thread — each resets on entry). */
  private val ctxPool = new ThreadLocal[Contexts] {
    override def initialValue(): Contexts = new Contexts
  }
  private def pooledContexts(): Contexts = {
    val c = ctxPool.get()
    c.reset()
    c
  }

  /** MQ encoder (T.88 Annex E: CODEMPS/CODELPS, BYTEOUT with 0xFF
    * stuffing, SETBITS flush). */
  private final class MqEncoder {
    private val out = new ArrayBuffer[Byte]()
    private var a = 0x8000L
    private var c = 0L
    private var ct = 12
    private var bVal = -1                      // the byte "B" (not yet in out)
    private var firstByte = true

    def encode(ctx: Contexts, cx: Int, d: Int): Unit = {
      val i0 = ctx.i(cx) & 0xff
      val mps = ctx.mps(cx).toInt
      val qe = Qe(i0)
      if (d == mps) {                          // CODEMPS
        a -= qe
        if ((a & 0x8000L) == 0) {
          if (a < qe) a = qe else c += qe
          ctx.i(cx) = Nmps(i0).toByte
          renorm()
        } else c += qe
      } else {                                 // CODELPS
        a -= qe
        if (a < qe) c += qe else a = qe
        if (Switch(i0) == 1) ctx.mps(cx) = (1 - mps).toByte
        ctx.i(cx) = Nlps(i0).toByte
        renorm()
      }
    }

    private def renorm(): Unit = {
      while ({
        if (ct == 0) byteOut()
        a <<= 1; c = (c << 1) & 0xfffffffL
        // NOTE: C is 28 bits between BYTEOUTs; the carry bit lives at
        // bit 27 and is resolved in byteOut below
        ct -= 1
        (a & 0x8000L) == 0
      }) ()
    }

    private def push(v: Int): Unit = {
      if (!firstByte) out += bVal.toByte
      firstByte = false
      bVal = v & 0xff
    }

    private def byteOut(): Unit = {
      if (bVal == 0xff) { push((c >> 20).toInt); c &= 0xfffff; ct = 7 }
      else if (c < 0x8000000L) { push((c >> 19).toInt); c &= 0x7ffff; ct = 8 }
      else {
        bVal += 1
        if (bVal == 0xff) { c &= 0x7ffffffL; push((c >> 20).toInt); c &= 0xfffff; ct = 7 }
        else { push((c >> 19).toInt); c &= 0x7ffff; ct = 8 }
      }
    }

    def flush(): Array[Byte] = {
      // SETBITS (T.88 E.3.8): pick the in-interval value with the
      // most trailing zeros; when the masked value falls below C the
      // half-step above it is still inside [C, C+A)
      val tempC = (c + a - 1) & 0xffff0000L
      c = if (c < tempC) tempC else tempC + 0x8000L
      c <<= ct; byteOut()
      c <<= ct; byteOut()
      if (!firstByte) out += bVal.toByte
      out.toArray
    }
  }

  // ---- generic region, template 0, nominal AT pixels
  // (A1 = (+3,-1), A2 = (-3,-1), A3 = (+2,-2), A4 = (-2,-2)),
  // TPGDON off. Context = 16 pixels, packed row-by-row (y-2 group,
  // then y-1 group, then current-row group), matching the figure
  // order of T.88 §6.2.5.3.
  // Context pixels in the T.88 figure's raster order — each row
  // sorted by x with the nominal AT positions interleaved where they
  // sit: (y-2): A4(-2),-1,0,+1,A3(+2); (y-1): A2(-3),-2,-1,0,+1,+2,
  // A1(+3); (y): -4,-3,-2,-1. Interoperable decoders build the
  // 16-bit context in exactly this order; a permutation would still
  // self-round-trip but read REAL encoders' streams as garbage.
  private val T0dx = Array(-2 /* A4 */, -1, 0, 1, 2 /* A3 */,
    -3 /* A2 */, -2, -1, 0, 1, 2, 3 /* A1 */, -4, -3, -2, -1)
  private val T0dy = Array(-2, -2, -2, -2, -2,
    -1, -1, -1, -1, -1, -1, -1, 0, 0, 0, 0)

  private def ctxAt(px: Array[Byte], w: Int, h: Int, x: Int, y: Int): Int = {
    var cx = 0
    var k = 0
    while (k < T0dx.length) {
      val xx = x + T0dx(k); val yy = y + T0dy(k)
      val bit =
        if (xx < 0 || xx >= w || yy < 0) 0   // out-of-region pixels are 0
        else px(yy * w + xx) & 1
      cx = (cx << 1) | bit
      k += 1
    }
    cx
  }

  /** The TPGDON pseudo-pixel context for template 0 (T.88 §6.2.5.7):
    * one decision per row says "this row repeats the one above". */
  private val TpgdCtx0 = 0x9b25

  /** Arithmetic generic-region decode: `data` is the MQ-coded pixel
    * stream, output is one byte per pixel (1 = black). With
    * `tpgdon`, each row starts with an LTP-toggle decision under the
    * pseudo-pixel context; a typical row copies the row above and
    * codes no pixels. */
  private def decodeGeneric(
      data: Array[Byte], start: Int, end: Int, w: Int, h: Int,
      tpgdon: Boolean): Array[Byte] = {
    val mq = new MqDecoder(data, start, end)
    val cxs = pooledContexts()
    val px = new Array[Byte](w * h)
    var ltp = false
    var y = 0
    while (y < h) {
      if (tpgdon && mq.decode(cxs, TpgdCtx0) == 1) ltp = !ltp
      if (tpgdon && ltp) {
        if (y > 0) System.arraycopy(px, (y - 1) * w, px, y * w, w)
        // y == 0: the row above is all-0 background; the row stays 0
      } else {
        var x = 0
        while (x < w) {
          px(y * w + x) = mq.decode(cxs, ctxAt(px, w, h, x, y)).toByte
          x += 1
        }
      }
      y += 1
    }
    px
  }

  private def encodeGeneric(
      px: Array[Byte], w: Int, h: Int, tpgdon: Boolean): Array[Byte] = {
    val mq = new MqEncoder
    val cxs = pooledContexts()
    var ltp = false
    var y = 0
    while (y < h) {
      val typical = tpgdon && {
        var same = true
        var x = 0
        while (same && x < w) {
          val above = if (y == 0) 0 else px((y - 1) * w + x) & 1
          same = (px(y * w + x) & 1) == above
          x += 1
        }
        same
      }
      if (tpgdon) {
        mq.encode(cxs, TpgdCtx0, if (typical != ltp) 1 else 0)
        ltp = typical
      }
      if (!typical) {
        var x = 0
        while (x < w) {
          mq.encode(cxs, ctxAt(px, w, h, x, y), px(y * w + x) & 1)
          x += 1
        }
      }
      y += 1
    }
    mq.flush()
  }

  // ---- embedded segment layer (§7.2): the PDF-stream subset.

  private def be32(b: ArrayBuffer[Byte], v: Long): Unit = {
    b += ((v >> 24) & 0xff).toByte; b += ((v >> 16) & 0xff).toByte
    b += ((v >> 8) & 0xff).toByte; b += (v & 0xff).toByte
  }
  private def rdBe32(d: Array[Byte], i: Int): Long =
    ((d(i) & 0xffL) << 24) | ((d(i + 1) & 0xffL) << 16) |
      ((d(i + 2) & 0xffL) << 8) | (d(i + 3) & 0xffL)

  /** Encode a bitmap (byte-per-pixel, nonzero = black) as an
    * embedded JBIG2 stream: page info (type 48) + immediate lossless
    * generic region (type 39), template 0, nominal ATs, optional
    * typical-prediction (TPGDON — what real scanner encoders emit:
    * blank and repeated scanlines cost one decision each). */
  def encode(pixels: Array[Byte], w: Int, h: Int,
      tpgdon: Boolean = false, mmr: Boolean = false): Array[Byte] = {
    require(w > 0 && h > 0 && pixels.length == w * h,
      s"need $w x $h pixels, got ${pixels.length}")
    require(!(tpgdon && mmr), "TPGDON is an MQ-mode flag")
    val bits = pixels.map(b => (if (b != 0) 1 else 0).toByte)
    val regionData = {
      val b = new ArrayBuffer[Byte]()
      // region segment info (§7.4.1): w, h, x, y, combination op
      be32(b, w); be32(b, h); be32(b, 0); be32(b, 0); b += 0
      if (mmr) {
        b += 1                                // generic flags: MMR (T.6 coding)
        b ++= CcittG4.encode(
          bits.map(v => (if (v == 1) 0 else 255).toByte), w, h)
      } else {
        b += (if (tpgdon) 8 else 0).toByte    // generic flags: MQ, template 0
        // AT pixels, nominal (signed bytes)
        b += 3; b += -1; b += -3; b += -1; b += 2; b += -2; b += -2; b += -2
        b ++= encodeGeneric(bits, w, h, tpgdon)
      }
      b
    }
    val pageData = {
      val b = new ArrayBuffer[Byte]()
      be32(b, w); be32(b, h); be32(b, 0xffffffffL); be32(b, 0xffffffffL)
      b += 0                                  // page flags
      b += 0; b += 0                          // striping info
      b
    }
    def segment(num: Long, segType: Int, data: ArrayBuffer[Byte]): ArrayBuffer[Byte] = {
      val b = new ArrayBuffer[Byte]()
      be32(b, num)
      b += (segType & 0x3f).toByte            // flags: no deferred, 1-byte page assoc
      b += 0.toByte                           // referred-to count 0 (high 3 bits)
      b += 1.toByte                           // page association 1
      be32(b, data.length)
      b ++= data
      b
    }
    (segment(0, 48, pageData) ++ segment(1, 39, regionData)).toArray
  }

  /** Decode an embedded JBIG2 stream's FIRST generic region to
    * (width, height, byte-per-pixel 1=black) — MQ-coded (plain or
    * TPGDON) or MMR (T.6 via [[CcittG4]]). None on refinement/symbol
    * segments, non-nominal templates, unknown lengths, or any
    * malformed header — skip-not-misparse. */
  def decode(data: Array[Byte]): Option[(Int, Int, Array[Byte])] = {
    if (data == null || data.length < 11) return None
    var i = 0
    var guard = 0
    while (i + 11 <= data.length && guard < 64) {
      guard += 1
      // segment header
      val flags = data(i + 4) & 0xff
      val segType = flags & 0x3f
      val pageAssoc4 = (flags & 0x40) != 0
      val refFlags = data(i + 5) & 0xff
      val refCount = (refFlags >> 5) & 7
      if (refCount > 4) return None           // long form: out of subset
      val segNum = rdBe32(data, i)
      val refSize = if (segNum <= 256) 1 else if (segNum <= 65536) 2 else 4
      var j = i + 6 + refCount * refSize
      j += (if (pageAssoc4) 4 else 1)
      if (j + 4 > data.length) return None
      val dataLen = rdBe32(data, j)
      j += 4
      if (dataLen == 0xffffffffL || j + dataLen > data.length) return None
      if (segType == 36 || segType == 38 || segType == 39) {
        // region info (17) + generic flags (1); MQ regions carry 8
        // template-0 AT bytes after the flags, MMR regions none —
        // everything read must sit INSIDE the declared length
        if (dataLen < 18) return None
        val w = rdBe32(data, j).toInt
        val h = rdBe32(data, j + 4).toInt
        if (w <= 0 || h <= 0 || w.toLong * h > (1L << 26)) return None
        val gflags = data(j + 17) & 0xff
        val mmr = (gflags & 1) != 0
        val template = (gflags >> 1) & 3
        val tpgdon = (gflags & 8) != 0
        if (mmr) {
          // MMR generic region = CCITT T.6 over the region bitmap
          // (T.88 §6.2.6) — the G4 codec this library already has;
          // its luma output maps back to the 1=black convention
          return CcittG4.decode(data.slice(j + 18, (j + dataLen).toInt), w, h)
            .map(luma =>
              (w, h, luma.map(b => (if ((b & 0xff) == 0) 1 else 0).toByte)))
        }
        if (template != 0) return None
        if (dataLen < 26) return None
        // AT pixels: 8 bytes for template 0; require nominal
        val at = data.slice(j + 18, j + 26)
        if (at.length < 8 ||
            at(0) != 3 || at(1) != -1 || at(2) != -3 || at(3) != -1 ||
            at(4) != 2 || at(5) != -2 || at(6) != -2 || at(7) != -2)
          return None
        val px = decodeGeneric(data, j + 26, (j + dataLen).toInt, w, h, tpgdon)
        return Some((w, h, px))
      }
      i = (j + dataLen).toInt
    }
    None
  }

  /** [[decode]] to luma bytes (0 black, 255 white) — the
    * [[PdfImages]] convention. */
  def decodeLuma(data: Array[Byte]): Option[(Int, Int, Array[Byte])] =
    decode(data).map { case (w, h, px) =>
      (w, h, px.map(b => (if ((b & 1) == 1) 0 else 255).toByte))
    }
}
