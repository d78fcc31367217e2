package graft.pipeline

/** JPEG 2000 header metadata — the `/JPXDecode` leg's audit parser.
  * The codec itself stays payload-passthrough (no pure-JVM JPEG 2000
  * entropy decoder in this subset), but a JPX raster's dimensions,
  * component count, and bit depth live in PLAIN header structures
  * that a ~50-line parse recovers, so media audits and q344-style
  * routing see real metadata instead of trusting the PDF dict alone
  * (reference motivation: the OCR pipeline records per-image dims
  * before rasterizing, `02-parallel-ocr-with-ray.py` partition step).
  *
  * Two container shapes (ISO/IEC 15444-1 == ITU-T T.800):
  *  - **JP2 file format** (Annex I): signature box
  *    `0000000C 6A502020 0D0A870A`, then boxes; `jp2h` is a superbox
  *    whose first box `ihdr` carries HEIGHT(4) WIDTH(4) NC(2) BPC(1).
  *  - **raw codestream** (Annex A, what `/JPXDecode` may embed
  *    directly): SOC marker `FF4F` then SIZ `FF51` with Lsiz, Rsiz,
  *    Xsiz, Ysiz, XOsiz, YOsiz, tile fields, Csiz, and per-component
  *    Ssiz — width = Xsiz − XOsiz, height = Ysiz − YOsiz.
  *
  * Strict parse: any truncation, bad magic, or absurd dimension ⇒
  * None (skip-not-misparse, the [[PdfImages]] contract).
  */
object Jp2Header {

  /** Parsed metadata: sample bit depth is `bpc` (1-38 per spec; 255
    * in a JP2 ihdr means "components differ" — reported as-is from
    * the first component's Ssiz for codestreams). */
  final case class Meta(width: Int, height: Int, components: Int, bpc: Int)

  private val MaxDim = 1 << 20
  private def u16(d: Array[Byte], i: Int): Int =
    ((d(i) & 0xff) << 8) | (d(i + 1) & 0xff)
  private def u32(d: Array[Byte], i: Int): Long =
    ((d(i) & 0xffL) << 24) | ((d(i + 1) & 0xffL) << 16) |
      ((d(i + 2) & 0xffL) << 8) | (d(i + 3) & 0xffL)

  /** Metadata from a JPX payload — JP2 box stream or raw codestream. */
  def parse(data: Array[Byte]): Option[Meta] = {
    if (data == null || data.length < 12) None
    else if ((data(0) & 0xff) == 0xff && (data(1) & 0xff) == 0x4f)
      parseCodestream(data, 2)
    else if (u32(data, 0) == 12L && u32(data, 4) == 0x6a502020L &&
        u32(data, 8) == 0x0d0a870aL)
      parseBoxes(data, 12)
    else None
  }

  /** Walk top-level boxes to `jp2h`, then its first sub-box `ihdr`
    * (Annex I.5.3: ihdr is required to come first in jp2h). A
    * `jp2c` codestream box reached before any jp2h also carries the
    * answer in its SIZ marker. */
  private def parseBoxes(data: Array[Byte], start: Int): Option[Meta] = {
    var i = start
    var guard = 0
    while (i + 8 <= data.length && guard < 64) {
      guard += 1
      val len0 = u32(data, i)
      val boxType = u32(data, i + 4)
      var hdr = 8
      val len: Long =
        if (len0 == 1L) {                     // 64-bit XLBox
          if (i + 16 > data.length) return None
          hdr = 16
          (u32(data, i + 8) << 32) | u32(data, i + 12)
        } else if (len0 == 0L) (data.length - i).toLong  // "to end of file"
        else len0
      if (len < hdr || i + len > data.length) return None
      if (boxType == 0x6a703268L) {           // jp2h superbox
        val j = i + hdr
        // first sub-box must be ihdr (len 22: 8 hdr + 14 payload)
        if (j + 22 > data.length || u32(data, j + 4) != 0x69686472L) return None
        val h = u32(data, j + 8)
        val w = u32(data, j + 12)
        val nc = u16(data, j + 16)
        val bpc = (data(j + 18) & 0xff)
        return checked(w, h, nc, if (bpc == 255) 255 else (bpc & 0x7f) + 1)
      }
      if (boxType == 0x6a703263L)             // jp2c: embedded codestream
        return {
          val j = i + hdr
          if (j + 2 <= data.length && (data(j) & 0xff) == 0xff &&
              (data(j + 1) & 0xff) == 0x4f) parseCodestream(data, j + 2)
          else None
        }
      i += len.toInt
    }
    None
  }

  /** SIZ marker segment after SOC (T.800 A.5.1). */
  private def parseCodestream(data: Array[Byte], pos: Int): Option[Meta] = {
    // SOC may be followed by SIZ directly (required first marker)
    if (pos + 40 > data.length) return None
    if ((data(pos) & 0xff) != 0xff || (data(pos + 1) & 0xff) != 0x51) return None
    val p = pos + 2                           // Lsiz at p
    val xsiz = u32(data, p + 4)
    val ysiz = u32(data, p + 8)
    val xo = u32(data, p + 12)
    val yo = u32(data, p + 16)
    val csiz = u16(data, p + 36)
    if (p + 38 + 3 > data.length) return None
    val ssiz = data(p + 38) & 0xff            // first component
    checked(xsiz - xo, ysiz - yo, csiz, (ssiz & 0x7f) + 1)
  }

  private def checked(w: Long, h: Long, nc: Int, bpc: Int): Option[Meta] =
    if (w <= 0 || h <= 0 || w > MaxDim || h > MaxDim ||
        nc <= 0 || nc > 16384 || bpc <= 0) None
    else Some(Meta(w.toInt, h.toInt, nc, bpc))

  // ---- fixture-side builders (the PdfCrypt discipline: the spec and
  // PdfGen produce headers from the same public layout the parser
  // reads back; pixels stay opaque — there is no entropy coder here).

  /** Minimal JP2 box stream: signature + ftyp + jp2h(ihdr) + a stub
    * jp2c whose codestream is SOC+SIZ followed by `payload` bytes. */
  def buildJp2(w: Int, h: Int, nc: Int, bpc: Int,
      payload: Array[Byte] = Array.empty): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    def be32(v: Long): Unit = {
      bos.write(((v >> 24) & 0xff).toInt); bos.write(((v >> 16) & 0xff).toInt)
      bos.write(((v >> 8) & 0xff).toInt); bos.write((v & 0xff).toInt)
    }
    def box(tpe: Long, body: Array[Byte]): Unit = {
      be32(8L + body.length); be32(tpe); bos.write(body, 0, body.length)
    }
    be32(12L); be32(0x6a502020L); be32(0x0d0a870aL)       // signature
    box(0x66747970L,                                       // ftyp
      Array[Byte]('j', 'p', '2', ' ', 0, 0, 0, 0, 'j', 'p', '2', ' '))
    val ihdr = new java.io.ByteArrayOutputStream()
    def ihdr32(v: Long): Unit = {
      ihdr.write(((v >> 24) & 0xff).toInt); ihdr.write(((v >> 16) & 0xff).toInt)
      ihdr.write(((v >> 8) & 0xff).toInt); ihdr.write((v & 0xff).toInt)
    }
    ihdr32(h); ihdr32(w)
    ihdr.write((nc >> 8) & 0xff); ihdr.write(nc & 0xff)
    ihdr.write(if (bpc == 255) 255 else (bpc - 1) & 0x7f)
    ihdr.write(7); ihdr.write(0); ihdr.write(0)            // C, UnkC, IPR
    val ihdrBox = new java.io.ByteArrayOutputStream()
    val ib = ihdr.toByteArray
    ihdrBox.write(Array[Byte](0, 0, 0, (8 + ib.length).toByte), 0, 4)
    ihdrBox.write(Array[Byte]('i', 'h', 'd', 'r'), 0, 4)
    ihdrBox.write(ib, 0, ib.length)
    box(0x6a703268L, ihdrBox.toByteArray)                  // jp2h
    box(0x6a703263L, buildCodestream(w, h, nc, bpc, payload)) // jp2c
    bos.toByteArray
  }

  /** Raw codestream: SOC + SIZ (single tile == image) + payload. */
  def buildCodestream(w: Int, h: Int, nc: Int, bpc: Int,
      payload: Array[Byte] = Array.empty): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    def be16(v: Int): Unit = { bos.write((v >> 8) & 0xff); bos.write(v & 0xff) }
    def be32(v: Long): Unit = {
      bos.write(((v >> 24) & 0xff).toInt); bos.write(((v >> 16) & 0xff).toInt)
      bos.write(((v >> 8) & 0xff).toInt); bos.write((v & 0xff).toInt)
    }
    be16(0xff4f)                              // SOC
    be16(0xff51)                              // SIZ
    be16(38 + 3 * nc)                         // Lsiz
    be16(0)                                   // Rsiz
    be32(w); be32(h); be32(0); be32(0)        // Xsiz Ysiz XOsiz YOsiz
    be32(w); be32(h); be32(0); be32(0)        // tile = image
    be16(nc)
    var c = 0
    while (c < nc) {
      bos.write((bpc - 1) & 0x7f); bos.write(1); bos.write(1)  // Ssiz XRsiz YRsiz
      c += 1
    }
    bos.write(payload, 0, payload.length)
    bos.toByteArray
  }
}
