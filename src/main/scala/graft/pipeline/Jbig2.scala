package graft.pipeline

import scala.collection.mutable.ArrayBuffer

/** JBIG2 (ITU-T T.88) — the bilevel codec modern scanners embed in
  * PDFs (`/JBIG2Decode`), typically 2-5× smaller than CCITT G4.
  * Pure JVM, BOTH directions, covering the embedded-stream subset a
  * PDF image XObject actually carries:
  *
  *  - the **MQ arithmetic coder** (T.88 Annex E: the 47-state Qe
  *    table shared with JPEG 2000, byte-stuffing around 0xFF,
  *    conditional exchange, flush with trailing-ones SETBITS);
  *  - **generic region** coding (§6.2), template 0 with nominal AT
  *    pixels, plain or TPGDON — the shape encoders emit for scanned
  *    masks;
  *  - the **integer arithmetic decoding procedures** (Annex A:
  *    IADH/IADW/IAEX/IADT/IAFS/IADS/IAIT PREV-tree coding, IAID
  *    symbol IDs) feeding **symbol dictionaries** (§6.5, arithmetic
  *    subset: height classes, one shared GB context table across
  *    symbols, export runs) and **text regions** (§6.4:
  *    strip-decoded (S,T) placements, BOTTOMLEFT/TOPLEFT corners,
  *    OR composition) — the layout real scanner encoders emit for
  *    TEXT pages, with `/JBIG2Globals` shared dictionaries walking
  *    first (r16);
  *  - the **embedded segment layer** (§7.2 headers as PDF carries
  *    them, referred-segment resolution; unknown segment types are
  *    skipped by their declared length).
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
  * refinement coding, huffman-coded dictionaries, or transposed/
  * non-OR text regions stay payload-passthrough (None ⇒ the OCR
  * seam), never misparsed.
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

  /** Second per-thread table for the INTEGER arithmetic decoding
    * procedures (T.88 Annex A) — symbol-dictionary and text-region
    * segments interleave IAx decisions with generic-region pixel
    * decisions on ONE arithmetic decoder but with DISJOINT context
    * sets, so the two tables must coexist within a segment. */
  private val iaCtxPool = new ThreadLocal[Contexts] {
    override def initialValue(): Contexts = new Contexts
  }
  private def pooledIaContexts(): Contexts = {
    val c = iaCtxPool.get()
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
      // SETBITS (T.88 E.3.8): pick an in-interval final C whose
      // trailing bits are all ONES (the OpenJPEG/mqc convention:
      // C |= 0xFFFF, step back half an interval if that overshoots
      // C+A). Trailing ones matter beyond spec conformance: the
      // DECODER pads past the end of the payload with 0xFF bytes, so
      // a flush that zeroes the tail can disagree with what the
      // decoder reads back for the final decisions — observed as
      // rare round-trip breaks under the r15-ADVICE flush-to-zeros
      // variant (5/500 q352 fixtures). C | 0xFFFF ∈ [C, C+0x10000);
      // if ≥ C+A, subtracting 0x8000 lands in [C+A−0x8000, C+A) ⊂
      // [C, C+A) since A ≥ 0x8000 — always valid, never past C+A.
      val tempC = c + a
      c |= 0xffffL
      if (c >= tempC) c -= 0x8000L
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

  /** Generic-region pixel decode on an EXISTING decoder + context
    * table — symbol dictionaries decode every symbol bitmap through
    * one shared decoder and one shared GB table (T.88 §6.5.8.1), so
    * the procedure cannot own either. */
  private def decodeGenericWith(
      mq: MqDecoder, cxs: Contexts, w: Int, h: Int,
      tpgdon: Boolean): Array[Byte] = {
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

  /** Arithmetic generic-region decode: `data` is the MQ-coded pixel
    * stream, output is one byte per pixel (1 = black). With
    * `tpgdon`, each row starts with an LTP-toggle decision under the
    * pseudo-pixel context; a typical row copies the row above and
    * codes no pixels. */
  private def decodeGeneric(
      data: Array[Byte], start: Int, end: Int, w: Int, h: Int,
      tpgdon: Boolean): Array[Byte] =
    decodeGenericWith(new MqDecoder(data, start, end), pooledContexts(),
      w, h, tpgdon)

  private def encodeGenericWith(
      mq: MqEncoder, cxs: Contexts, px: Array[Byte], w: Int, h: Int,
      tpgdon: Boolean): Unit = {
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
  }

  private def encodeGeneric(
      px: Array[Byte], w: Int, h: Int, tpgdon: Boolean): Array[Byte] = {
    val mq = new MqEncoder
    encodeGenericWith(mq, pooledContexts(), px, w, h, tpgdon)
    mq.flush()
  }

  // ---- integer arithmetic decoding procedures (T.88 Annex A): each
  // IAx procedure owns a 512-slot context region (PREV tree, 9 bits)
  // inside ONE shared table; IAID owns 2^(SYMCODELEN+1) slots. All
  // procedures of a segment share a single MQ coder with the
  // generic-region pixel contexts living in a SEPARATE table.

  private val IADH = 0
  private val IADW = 512
  private val IAEX = 1024
  private val IAAI = 1536
  private val IADT = 2048
  private val IAFS = 2560
  private val IADS = 3072
  private val IAIT = 3584
  private val IAID = 8192
  private val MaxSymCodeLen = 12              // IAID tree ≤ 8192 slots

  /** Sentinel for the A.2 OOB decision (S=1, V=0). */
  private val OOB = Int.MinValue

  /** Sentinel for an out-of-Int-range decoded value: the 32-bit tail
    * of A.2 can carry v ≥ 2^31, which `.toInt` would silently alias
    * into a small valid-looking delta that passes downstream range
    * checks (r16 ADVICE) — and `-(2^31)` would collide with [[OOB]].
    * Every call site treats [[BAD]] as a hard decode failure, never
    * as a legal OOB (end-of-class / end-of-strip). */
  private val BAD = Int.MinValue + 1

  /** A.2 IAx decode: value, [[OOB]], or [[BAD]]. */
  private def decodeInt(mq: MqDecoder, cx: Contexts, off: Int): Int = {
    var prev = 1
    def bit(): Int = {
      val b = mq.decode(cx, off + prev)
      prev =
        if (prev < 256) (prev << 1) | b
        else ((((prev << 1) | b) & 511) | 256)
      b
    }
    def bits(n: Int): Long = {
      var v = 0L
      var i = 0
      while (i < n) { v = (v << 1) | bit(); i += 1 }
      v
    }
    val s = bit()
    val v: Long =
      if (bit() == 0) bits(2)
      else if (bit() == 0) bits(4) + 4
      else if (bit() == 0) bits(6) + 20
      else if (bit() == 0) bits(8) + 84
      else if (bit() == 0) bits(12) + 340
      else bits(32) + 4436
    if (s == 1 && v == 0) OOB
    // magnitude ≥ 2^31 − 1 is BAD, not a value: v ≥ 2^31 would wrap
    // in .toInt, and −(2^31 − 1) IS the BAD sentinel — no real
    // segment carries deltas near 2^31 (downstream caps are ≤ 2^20),
    // so declining the boundary value too keeps the sentinel space
    // collision-free
    else if (v >= Int.MaxValue) BAD
    else if (s == 1) (-v).toInt
    else v.toInt
  }

  /** A.2 inverse for the fixture encoder. Takes Long so hostile
    * out-of-Int-range values (the 32-bit tail reaches 2^32 + 4435)
    * can be encoded to pin the decoder's [[BAD]] rejection. */
  private def encodeInt(mq: MqEncoder, cx: Contexts, off: Int, value: Long): Unit = {
    var prev = 1
    def bit(b: Int): Unit = {
      mq.encode(cx, off + prev, b)
      prev =
        if (prev < 256) (prev << 1) | b
        else ((((prev << 1) | b) & 511) | 256)
    }
    def bits(v: Long, n: Int): Unit = {
      var i = n - 1
      while (i >= 0) { bit(((v >> i) & 1).toInt); i -= 1 }
    }
    if (value == OOB.toLong) { bit(1); bit(0); bits(0, 2) }
    else {
      val s = if (value < 0) 1 else 0
      val v = math.abs(value)
      bit(s)
      if (v < 4) { bit(0); bits(v, 2) }
      else if (v < 20) { bit(1); bit(0); bits(v - 4, 4) }
      else if (v < 84) { bit(1); bit(1); bit(0); bits(v - 20, 6) }
      else if (v < 340) { bit(1); bit(1); bit(1); bit(0); bits(v - 84, 8) }
      else if (v < 4436) { bit(1); bit(1); bit(1); bit(1); bit(0); bits(v - 340, 12) }
      else { bit(1); bit(1); bit(1); bit(1); bit(1); bits(v - 4436, 32) }
    }
  }

  /** Test seam: round-trip `values` through the A.2 integer coder
    * (one shared context tree, the in-segment layout). Legal values
    * come back `Some(v)`; values the decoder must REJECT (≥ 2^31,
    * which `.toInt` would alias into small valid-looking deltas —
    * r16 ADVICE) come back `None`. */
  private[pipeline] def intCodingRoundTrip(values: Seq[Long]): Seq[Option[Int]] = {
    val payload = {
      val m = new MqEncoder
      val cx = pooledIaContexts()
      values.foreach(v => encodeInt(m, cx, IADH, v))
      m.flush()
    }
    val dec = new MqDecoder(payload, 0, payload.length)
    val cx = pooledIaContexts()               // fresh zeroed tree, like encode
    values.map { _ =>
      val d = decodeInt(dec, cx, IADH)
      if (d == OOB || d == BAD) None else Some(d)
    }
  }

  /** A.3 IAID decode: `len` fixed bits down the PREV tree. */
  private def decodeId(mq: MqDecoder, cx: Contexts, len: Int): Int = {
    var prev = 1
    var i = 0
    while (i < len) { prev = (prev << 1) | mq.decode(cx, IAID + prev); i += 1 }
    prev - (1 << len)
  }

  private def encodeId(mq: MqEncoder, cx: Contexts, len: Int, id: Int): Unit = {
    var prev = 1
    var i = len - 1
    while (i >= 0) {
      val b = (id >> i) & 1
      mq.encode(cx, IAID + prev, b)
      prev = (prev << 1) | b
      i -= 1
    }
  }

  /** One decoded symbol bitmap (byte-per-pixel, 1 = black). */
  private final case class Bitmap(w: Int, h: Int, px: Array[Byte])

  private def symCodeLenOf(numSyms: Int): Int = {
    var len = 0
    while ((1 << len) < numSyms) len += 1
    math.max(1, len)                          // 1-symbol dicts still code 1 bit
  }

  // ---- symbol dictionary (T.88 §6.5, arithmetic subset: SDHUFF=0,
  // SDREFAGG=0, template 0, nominal ATs). One MQ decoder for the
  // whole segment; symbol bitmaps share one GB context table, the
  // IAx procedures a second.

  /** Decode `numNew` new symbols + export flags over
    * `input ++ new`; returns the EXPORTED symbols in order. */
  private def decodeSymbolDict(
      data: Array[Byte], start: Int, end: Int,
      numNew: Int, numEx: Int,
      input: IndexedSeq[Bitmap]): Option[IndexedSeq[Bitmap]] = {
    if (numNew < 0 || numNew > 4096 || numEx < 0 || numEx > 8192) return None
    val mq = new MqDecoder(data, start, end)
    val gb = pooledContexts()
    val ia = pooledIaContexts()
    val newSyms = new ArrayBuffer[Bitmap](numNew)
    var hcHeight = 0
    var totalPx = 0L                          // dictionary-wide allocation cap
    var classes = 0                           // height-class iteration guard:
    // the MQ decoder pads past the payload with 0xFF forever, so a
    // truncated dictionary could otherwise spin on empty height
    // classes (dh = 0, immediate OOB width) without ever reaching
    // numNew (review finding) — every legal class carries ≥ 1 symbol
    while (newSyms.size < numNew) {
      classes += 1
      if (classes > numNew + 64) return None
      val dh = decodeInt(mq, ia, IADH)
      if (dh == OOB || dh == BAD) return None
      hcHeight += dh
      if (hcHeight <= 0 || hcHeight > 4096) return None
      var symWidth = 0
      var classDone = false
      while (!classDone) {
        val dw = decodeInt(mq, ia, IADW)
        if (dw == BAD) return None
        if (dw == OOB) classDone = true
        else {
          symWidth += dw
          totalPx += symWidth.toLong * hcHeight
          if (symWidth <= 0 || symWidth > 4096 ||
            totalPx > (1L << 26) ||
            newSyms.size >= numNew) return None
          newSyms += Bitmap(symWidth, hcHeight,
            decodeGenericWith(mq, gb, symWidth, hcHeight, tpgdon = false))
        }
      }
    }
    // export flags (§6.5.10): alternating EXRUNLENGTH runs starting
    // with flag 0 over input ++ new
    val all = input ++ newSyms
    val ex = new ArrayBuffer[Bitmap](numEx)
    var i = 0
    var curFlag = false
    var guard = 0
    while (i < all.size && guard < 4096) {
      guard += 1
      val run = decodeInt(mq, ia, IAEX)
      if (run == OOB || run < 0 || i + run > all.size) return None
      if (curFlag) ex ++= all.slice(i, i + run)
      i += run
      curFlag = !curFlag
    }
    if (ex.size != numEx) return None
    Some(ex.toIndexedSeq)
  }

  /** Encode `syms` as one height class per distinct height
    * (ascending), exporting all of them. */
  private def encodeSymbolDict(syms: Seq[Bitmap]): Array[Byte] = {
    val mq = new MqEncoder
    val gb = pooledContexts()
    val ia = pooledIaContexts()
    var prevH = 0
    for ((h, group) <- syms.groupBy(_.h).toSeq.sortBy(_._1)) {
      encodeInt(mq, ia, IADH, h - prevH)
      prevH = h
      var prevW = 0
      for (sym <- group) {
        encodeInt(mq, ia, IADW, sym.w - prevW)
        prevW = sym.w
        encodeGenericWith(mq, gb, sym.px, sym.w, sym.h, tpgdon = false)
      }
      encodeInt(mq, ia, IADW, OOB)
    }
    encodeInt(mq, ia, IAEX, 0)                // flag-0 run: export none…
    encodeInt(mq, ia, IAEX, syms.size)        // …then export all new
    mq.flush()
  }

  /** Height-class export order of [[encodeSymbolDict]] — the symbol
    * IDs a text region must use against that dictionary. Returns for
    * each input index its exported ID. */
  private def exportOrder(syms: Seq[Bitmap]): Array[Int] = {
    val order = syms.zipWithIndex.toSeq
      .groupBy(_._1.h).toSeq.sortBy(_._1)
      .flatMap(_._2.map(_._2))
    val ids = new Array[Int](syms.size)
    for ((origIdx, exId) <- order.zipWithIndex) ids(origIdx) = exId
    ids
  }

  // ---- text region (T.88 §6.4, arithmetic subset: SBHUFF=0,
  // SBREFINE=0, TRANSPOSED=0, SBCOMBOP=OR, REFCORNER ∈
  // {BOTTOMLEFT, TOPLEFT}).

  private def decodeTextRegion(
      data: Array[Byte], start: Int, end: Int, w: Int, h: Int,
      numInstances: Int, logStrips: Int, refCorner: Int, dsOffset: Int,
      syms: IndexedSeq[Bitmap]): Option[Array[Byte]] = {
    if (syms.isEmpty || numInstances < 0 || numInstances > (1 << 20)) return None
    val symCodeLen = symCodeLenOf(syms.size)
    if (symCodeLen > MaxSymCodeLen) return None
    val strips = 1 << logStrips
    val mq = new MqDecoder(data, start, end)
    val ia = pooledIaContexts()
    val px = new Array[Byte](w * h)
    val dt0 = decodeInt(mq, ia, IADT)
    if (dt0 == OOB || dt0 == BAD) return None
    var stript = -dt0 * strips
    var firsts = 0
    var inst = 0
    var guard = 0
    while (inst < numInstances && guard < (numInstances + 2) * 2) {
      guard += 1
      val dt = decodeInt(mq, ia, IADT)
      if (dt == OOB || dt == BAD) return None
      stript += dt * strips
      var curs = 0
      var firstSym = true
      var stripDone = false
      while (!stripDone && inst < numInstances) {
        if (firstSym) {
          val dfs = decodeInt(mq, ia, IAFS)
          if (dfs == OOB || dfs == BAD) return None
          firsts += dfs
          curs = firsts
          firstSym = false
        } else {
          val ids = decodeInt(mq, ia, IADS)
          if (ids == BAD) return None
          if (ids == OOB) stripDone = true
          else curs += ids + dsOffset
        }
        if (!stripDone) {
          val curt = if (strips == 1) 0 else decodeInt(mq, ia, IAIT)
          if (curt == OOB || curt == BAD) return None
          val ti = stript + curt
          val id = decodeId(mq, ia, symCodeLen)
          if (id < 0 || id >= syms.size) return None
          val sb = syms(id)
          // draw with OR, clipped to the region (§6.4.5 composition)
          val top = if (refCorner == 1) ti else ti - sb.h + 1
          var yy = 0
          while (yy < sb.h) {
            val py = top + yy
            if (py >= 0 && py < h) {
              var xx = 0
              while (xx < sb.w) {
                val pxx = curs + xx
                if (pxx >= 0 && pxx < w && (sb.px(yy * sb.w + xx) & 1) == 1)
                  px(py * w + pxx) = 1
                xx += 1
              }
            }
            yy += 1
          }
          curs += sb.w - 1
          inst += 1
        }
      }
    }
    Some(px)
  }

  /** Encode placements (top-left (x, y) regardless of `refCorner` —
    * the BOTTOMLEFT T coordinate is derived per symbol height), strip
    * height `1 << logStrips` with IAIT-coded in-strip T offsets. */
  private def encodeTextRegionData(
      syms: Seq[Bitmap], placements: Seq[(Int, Int, Int)],
      logStrips: Int, refCorner: Int): Array[Byte] = {
    val symCodeLen = symCodeLenOf(syms.size)
    require(symCodeLen <= MaxSymCodeLen, s"too many symbols: ${syms.size}")
    val strips = 1 << logStrips
    val mq = new MqEncoder
    val ia = pooledIaContexts()
    // (sym, s, T, stripT): T per the reference corner, strip = floor
    val coords = placements.map { case (sym, x, y) =>
      val t = if (refCorner == 1) y else y + syms(sym).h - 1
      require(t >= 0, s"negative T for placement ($sym, $x, $y)")
      (sym, x, t, (t / strips) * strips)
    }
    encodeInt(mq, ia, IADT, 0)                // STRIPT starts at 0
    var prevT = 0
    var firsts = 0
    for ((stripT, ps0) <- coords.groupBy(_._4).toSeq.sortBy(_._1)) {
      val ps = ps0.sortBy(_._2)
      encodeInt(mq, ia, IADT, (stripT - prevT) / strips)
      prevT = stripT
      var curs = 0
      var first = true
      for ((sym, s, t, _) <- ps) {
        if (first) {
          encodeInt(mq, ia, IAFS, s - firsts)
          firsts = s
          first = false
        } else encodeInt(mq, ia, IADS, s - curs)
        curs = s
        if (strips > 1) encodeInt(mq, ia, IAIT, t - stripT)
        encodeId(mq, ia, symCodeLen, sym)
        curs += syms(sym).w - 1
      }
      encodeInt(mq, ia, IADS, OOB)
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
    (segment(0, 48, pageData) ++ segment(1, 39, regionData)).toArray
  }

  /** One segment: header (§7.2, short form — ≤ 4 referred segments,
    * 1-byte referred numbers, 1-byte page association) + data. */
  private def segment(num: Long, segType: Int, data: ArrayBuffer[Byte],
      refs: Seq[Long] = Seq.empty): ArrayBuffer[Byte] = {
    require(refs.size <= 4 && refs.forall(_ < 256), "short-form header only")
    val b = new ArrayBuffer[Byte]()
    be32(b, num)
    b += (segType & 0x3f).toByte              // flags: no deferred, 1-byte page assoc
    b += ((refs.size & 7) << 5).toByte        // referred-to count (high 3 bits)
    refs.foreach(r => b += (r & 0xff).toByte) // 1-byte refs (num ≤ 256)
    b += 1.toByte                             // page association 1
    be32(b, data.length)
    b ++= data
    b
  }

  /** Encode a TEXT page the way real scanner encoders do (T.88 §6.4 +
    * §6.5): a symbol DICTIONARY holding the distinct glyph bitmaps
    * and a text REGION placing them by (symbol, x, y) with TOPLEFT
    * reference corners — the shape that compresses a text scan 2-5×
    * beyond even generic-region coding, and the one [[decode]] was
    * previously payload-passthrough for (r15 "What's missing" #2).
    *
    * `symbols`: (w, h, byte-per-pixel bitmap, nonzero = black);
    * `placements`: (symbol index, x, y) top-left positions.
    * With `separateGlobals` the dictionary segment is returned as a
    * SECOND stream — the PDF `/JBIG2Globals` layout, where shared
    * dictionaries live in their own object referenced from
    * `/DecodeParms`; otherwise everything is one embedded stream.
    * Returns (embedded stream, globals stream — empty when inline).
    */
  def encodeText(
      w: Int, h: Int,
      symbols: Seq[(Int, Int, Array[Byte])],
      placements: Seq[(Int, Int, Int)],
      separateGlobals: Boolean = false,
      logStrips: Int = 0,
      refCorner: Int = 1): (Array[Byte], Array[Byte]) = {
    require(w > 0 && h > 0 && symbols.nonEmpty, "need dimensions and symbols")
    require(logStrips >= 0 && logStrips <= 3, s"logStrips in [0,3]: $logStrips")
    require(refCorner == 0 || refCorner == 1, "BOTTOMLEFT(0) or TOPLEFT(1)")
    require(symbols.forall { case (sw, sh, px) =>
      sw > 0 && sh > 0 && px.length == sw * sh }, "malformed symbol bitmap")
    require(placements.forall(_._1 >= 0) &&
      placements.forall(_._1 < symbols.size), "placement symbol out of range")
    val bms = symbols.map { case (sw, sh, px) =>
      Bitmap(sw, sh, px.map(b => (if (b != 0) 1 else 0).toByte))
    }
    val ids = exportOrder(bms)                // dictionary export order
    val sorted = bms.zipWithIndex.sortBy(p => ids(p._2)).map(_._1)
    val remapped = placements.map { case (s, x, y) => (ids(s), x, y) }

    val dictData = {
      val b = new ArrayBuffer[Byte]()
      b += 0; b += 0                          // flags: SDHUFF=0, SDREFAGG=0, template 0
      // AT pixels, nominal (template 0)
      b += 3; b += -1; b += -3; b += -1; b += 2; b += -2; b += -2; b += -2
      be32(b, sorted.size)                    // SDNUMEXSYMS
      be32(b, sorted.size)                    // SDNUMNEWSYMS
      b ++= encodeSymbolDict(sorted)
      b
    }
    val textData = {
      val b = new ArrayBuffer[Byte]()
      be32(b, w); be32(b, h); be32(b, 0); be32(b, 0); b += 0  // region info
      // text flags: SBHUFF=0, SBREFINE=0, TRANSPOSED=0, SBCOMBOP=OR,
      // SBDEFPIXEL=0, SBDSOFFSET=0, SBRTEMPLATE=0
      val flags = ((logStrips & 3) << 2) | ((refCorner & 3) << 4)
      b += ((flags >> 8) & 0xff).toByte; b += (flags & 0xff).toByte
      be32(b, remapped.size)                  // SBNUMINSTANCES
      b ++= encodeTextRegionData(sorted, remapped, logStrips, refCorner)
      b
    }
    val pageData = {
      val b = new ArrayBuffer[Byte]()
      be32(b, w); be32(b, h); be32(b, 0xffffffffL); be32(b, 0xffffffffL)
      b += 0; b += 0; b += 0                  // page flags + striping
      b
    }
    val dictSeg = segment(0, 0, dictData)
    val rest = segment(1, 48, pageData) ++
      segment(2, 6, textData, refs = Seq(0L)) // immediate text region → dict 0
    if (separateGlobals) (rest.toArray, dictSeg.toArray)
    else ((dictSeg ++ rest).toArray, Array.empty[Byte])
  }

  /** Encode a MULTI-REGION page: page info with real dimensions plus
    * one immediate generic region per entry, each placed at its
    * region-info (x, y) — the layout real encoders emit when a page
    * splits into blocks. `regions`: (x, y, w, h, byte-per-pixel
    * bitmap, nonzero = black); the decoder OR-composites them onto
    * the page. */
  def encodeRegions(
      pageW: Int, pageH: Int,
      regions: Seq[(Int, Int, Int, Int, Array[Byte])]): Array[Byte] = {
    require(pageW > 0 && pageH > 0 && regions.nonEmpty, "need a page")
    val pageData = {
      val b = new ArrayBuffer[Byte]()
      be32(b, pageW); be32(b, pageH)
      be32(b, 0xffffffffL); be32(b, 0xffffffffL)
      b += 0; b += 0; b += 0                  // page flags + striping
      b
    }
    var segs = segment(0, 48, pageData)
    var num = 1L
    for ((x, y, w, h, px) <- regions) {
      require(w > 0 && h > 0 && px.length == w * h, s"region $num malformed")
      require(x >= 0 && y >= 0, s"region $num offset negative")
      val bits = px.map(b => (if (b != 0) 1 else 0).toByte)
      val b = new ArrayBuffer[Byte]()
      be32(b, w); be32(b, h); be32(b, x); be32(b, y); b += 0
      b += 0                                  // generic flags: MQ, template 0
      b += 3; b += -1; b += -3; b += -1; b += 2; b += -2; b += -2; b += -2
      b ++= encodeGeneric(bits, w, h, tpgdon = false)
      segs = segs ++ segment(num, 38, b)      // immediate generic region
      num += 1
    }
    segs.toArray
  }

  /** Decode an embedded JBIG2 stream to (width, height,
    * byte-per-pixel 1=black) — the PAGE when page info carries real
    * dimensions (all regions OR-composited at their offsets), else
    * the first decodable region:
    *
    *  - **generic regions** (36/38/39) — MQ-coded (plain or TPGDON)
    *    or MMR (T.6 via [[CcittG4]]);
    *  - **text regions** (4/6/7) with their referred **symbol
    *    dictionaries** (type 0, arithmetic subset), including
    *    dictionaries supplied via a `/JBIG2Globals` stream
    *    (`globals`) — the shape real scanner encoders (Acrobat,
    *    Xerox) emit for TEXT pages, previously payload-passthrough.
    *
    * None on refinement segments, huffman-coded dictionaries,
    * non-nominal templates, unknown lengths, or any malformed
    * header — skip-not-misparse. */
  def decode(data: Array[Byte]): Option[(Int, Int, Array[Byte])] =
    decode(data, Array.empty[Byte])

  def decode(data: Array[Byte],
      globals: Array[Byte]): Option[(Int, Int, Array[Byte])] = {
    if (data == null || data.length < 11) return None
    val dicts = scala.collection.mutable.Map.empty[Long, IndexedSeq[Bitmap]]
    if (globals != null && globals.length >= 11) walk(globals, dicts)
    walk(data, dicts)
  }

  /** One segment-stream pass: symbol dictionaries accumulate into
    * `dicts` (keyed by segment number — the `/JBIG2Globals` contract:
    * globals walk first, the embedded stream's regions refer back).
    * With PAGE INFO (type 48) carrying real dimensions, every region
    * OR-composites onto the page bitmap at its region-info (x, y)
    * offset — the multi-region layout real encoders emit (one text
    * region per text block, generic regions for halftones) — and the
    * composed page returns after the walk; without usable page dims
    * (absent, or the 0xFFFFFFFF striped-height form) the FIRST
    * decodable region returns alone, the pre-r16 behavior. */
  private def walk(
      data: Array[Byte],
      dicts: scala.collection.mutable.Map[Long, IndexedSeq[Bitmap]])
      : Option[(Int, Int, Array[Byte])] = {
    var page: Option[(Int, Int, Array[Byte])] = None
    var composed = false
    var poisoned = false                      // hostile offsets: decline the STREAM
    /** OR a decoded region into the page at (rx, ry), clipped; when
      * no page exists the region IS the result. None = keep walking.
      * A page WITH a region whose offset is out of sane range poisons
      * the whole stream (review finding: falling through to "return
      * this lone region" would silently discard the composed page). */
    def finish(rw: Int, rh: Int, rpx: Array[Byte],
        rx: Long, ry: Long): Option[(Int, Int, Array[Byte])] =
      page match {
        case Some((pw, ph, ppx)) =>
          if (rx > (1L << 20) || ry > (1L << 20)) { poisoned = true; None }
          else {
            var yy = 0
            while (yy < rh) {
              val py = ry.toInt + yy
              if (py < ph) {
                var xx = 0
                while (xx < rw) {
                  val pxx = rx.toInt + xx
                  if (pxx < pw && (rpx(yy * rw + xx) & 1) == 1)
                    ppx(py * pw + pxx) = 1
                  xx += 1
                }
              }
              yy += 1
            }
            composed = true
            None
          }
        case None => Some((rw, rh, rpx))
      }
    var i = 0
    var guard = 0
    // i strictly advances ≥ 11 bytes per segment, so the loop always
    // terminates; the guard is a hard backstop, and EXHAUSTING it
    // must decline rather than return a partially-composed page
    // (review finding: silent truncation is wrong pixels, not a skip)
    while (i + 11 <= data.length && guard < (1 << 16)) {
      guard += 1
      if (poisoned) return None
      // segment header
      val flags = data(i + 4) & 0xff
      val segType = flags & 0x3f
      val pageAssoc4 = (flags & 0x40) != 0
      val refFlags = data(i + 5) & 0xff
      val refCount = (refFlags >> 5) & 7
      if (refCount > 4) return None           // long form: out of subset
      val segNum = rdBe32(data, i)
      val refSize = if (segNum <= 256) 1 else if (segNum <= 65536) 2 else 4
      if (i + 6 + refCount * refSize > data.length) return None
      val refs = new Array[Long](refCount)
      var k = 0
      while (k < refCount) {
        val o = i + 6 + k * refSize
        refs(k) = refSize match {
          case 1 => data(o) & 0xffL
          case 2 => ((data(o) & 0xffL) << 8) | (data(o + 1) & 0xffL)
          case _ => rdBe32(data, o)
        }
        k += 1
      }
      var j = i + 6 + refCount * refSize
      j += (if (pageAssoc4) 4 else 1)
      if (j + 4 > data.length) return None
      val dataLen = rdBe32(data, j)
      j += 4
      if (dataLen == 0xffffffffL || j + dataLen > data.length) return None
      val segEnd = (j + dataLen).toInt

      if (segType == 0) {
        // symbol dictionary (§7.4.3): flags(2) + AT(8, template 0) +
        // SDNUMEXSYMS(4) + SDNUMNEWSYMS(4). Out-of-subset or failed
        // dictionaries are SKIPPED (not stored): a region referring
        // to them then fails cleanly instead of the whole stream
        // being rejected up front.
        if (dataLen >= 18) {
          val sdFlags = ((data(j) & 0xff) << 8) | (data(j + 1) & 0xff)
          val sdHuff = (sdFlags & 1) != 0
          val sdRefAgg = (sdFlags & 2) != 0
          val template = (sdFlags >> 10) & 3
          val at = data.slice(j + 2, j + 10)
          val nominal = at.length == 8 &&
            at(0) == 3 && at(1) == -1 && at(2) == -3 && at(3) == -1 &&
            at(4) == 2 && at(5) == -2 && at(6) == -2 && at(7) == -2
          if (!sdHuff && !sdRefAgg && template == 0 && nominal) {
            val numEx = rdBe32(data, j + 10)
            val numNew = rdBe32(data, j + 14)
            if (numEx <= 8192 && numNew <= 4096) {
              val input = refs.toSeq.flatMap(dicts.get).flatten.toIndexedSeq
              decodeSymbolDict(data, j + 18, segEnd,
                numNew.toInt, numEx.toInt, input)
                .foreach(ex => dicts(segNum) = ex)
            }
          }
        }
      } else if (segType == 4 || segType == 6 || segType == 7) {
        // text region (§7.4.4): region info(17) + flags(2) +
        // SBNUMINSTANCES(4); huffman/refinement/transposed/non-OR
        // composition are out of subset
        if (dataLen < 23) return None
        val w = rdBe32(data, j).toInt
        val h = rdBe32(data, j + 4).toInt
        if (w <= 0 || h <= 0 || w.toLong * h > (1L << 26)) return None
        val tf = ((data(j + 17) & 0xff) << 8) | (data(j + 18) & 0xff)
        val sbHuff = (tf & 1) != 0
        val sbRefine = (tf & 2) != 0
        val logStrips = (tf >> 2) & 3
        val refCorner = (tf >> 4) & 3
        val transposed = (tf & 0x40) != 0
        val combOp = (tf >> 7) & 3
        val defPixel = (tf >> 9) & 1
        var dsOffset = (tf >> 10) & 0x1f
        if (dsOffset > 15) dsOffset -= 32     // signed 5-bit
        if (sbHuff || sbRefine || transposed || combOp != 0 ||
          defPixel != 0) return None
        if (refCorner != 0 && refCorner != 1) return None  // BL/TL only
        val numInstances = rdBe32(data, j + 19)
        if (numInstances > (1L << 20)) return None
        val syms = refs.toSeq.flatMap(dicts.get).flatten.toIndexedSeq
        decodeTextRegion(data, j + 23, segEnd, w, h,
          numInstances.toInt, logStrips, refCorner, dsOffset, syms) match {
          case None => return None
          case Some(rpx) =>
            finish(w, h, rpx, rdBe32(data, j + 8), rdBe32(data, j + 12))
              .foreach(r => return Some(r))
        }
      } else if (segType == 48) {
        // page info (§7.4.8): width, height; the striped/unknown
        // height form (0xFFFFFFFF) keeps first-region mode
        if (dataLen >= 8) {
          val pw = rdBe32(data, j)
          val ph = rdBe32(data, j + 4)
          // Bound each dimension BEFORE multiplying: pw/ph are
          // untrusted unsigned 32-bit values, so pw * ph can wrap a
          // Long negative (~2^31.5 each) and sneak past a
          // product-only cap (r16 ADVICE)
          if (pw > 0 && ph > 0 && pw <= (1L << 20) && ph <= (1L << 20) &&
              pw * ph <= (1L << 26))
            page = Some((pw.toInt, ph.toInt,
              new Array[Byte]((pw * ph).toInt)))
        }
      } else if (segType == 36 || segType == 38 || segType == 39) {
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
          CcittG4.decode(data.slice(j + 18, segEnd), w, h) match {
            case None => return None
            case Some(luma) =>
              val rpx = luma.map(b => (if ((b & 0xff) == 0) 1 else 0).toByte)
              finish(w, h, rpx, rdBe32(data, j + 8), rdBe32(data, j + 12))
                .foreach(r => return Some(r))
          }
        } else {
          if (template != 0) return None
          if (dataLen < 26) return None
          // AT pixels: 8 bytes for template 0; require nominal
          val at = data.slice(j + 18, j + 26)
          if (at.length < 8 ||
              at(0) != 3 || at(1) != -1 || at(2) != -3 || at(3) != -1 ||
              at(4) != 2 || at(5) != -2 || at(6) != -2 || at(7) != -2)
            return None
          val px = decodeGeneric(data, j + 26, segEnd, w, h, tpgdon)
          finish(w, h, px, rdBe32(data, j + 8), rdBe32(data, j + 12))
            .foreach(r => return Some(r))
        }
      }
      i = segEnd
    }
    if (poisoned || guard >= (1 << 16)) None
    else if (composed) page
    else None
  }

  /** [[decode]] to luma bytes (0 black, 255 white) — the
    * [[PdfImages]] convention. */
  def decodeLuma(data: Array[Byte]): Option[(Int, Int, Array[Byte])] =
    decodeLuma(data, Array.empty[Byte])

  def decodeLuma(data: Array[Byte],
      globals: Array[Byte]): Option[(Int, Int, Array[Byte])] =
    decode(data, globals).map { case (w, h, px) =>
      (w, h, px.map(b => (if ((b & 1) == 1) 0 else 255).toByte))
    }
}
