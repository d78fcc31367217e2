package graft.pipeline

import java.nio.charset.StandardCharsets

import org.scalatest.funsuite.AnyFunSuite

import graft.multimodal.ImageDedup
import graft.operators.Sampling

/** Embedded raster-image extraction: every fixture is generated
  * in-test (PdfGen.rasterPdf or a hand-assembled container), no
  * external binaries. Covers the four rasterPdf encode legs against
  * the pixel formula, a REAL ImageIO JPEG round-trip through the
  * /DCTDecode payload path, transport coats, incremental-update
  * shadowing, the unsupported-codec contract (None, never a fake
  * grid), and the PdfRasterCodec bridge into ImageDedup.
  */
class PdfImagesSpec extends AnyFunSuite {

  private def deflate(b: Array[Byte]): Array[Byte] = {
    val d = new java.util.zip.Deflater()
    d.setInput(b); d.finish()
    val out = new java.io.ByteArrayOutputStream()
    val buf = new Array[Byte](8192)
    while (!d.finished()) out.write(buf, 0, d.deflate(buf))
    d.end()
    out.toByteArray
  }

  /** Single-image PDF around an arbitrary image-XObject dict+payload
    * (object 20), the PdfGen.rasterPdf container shape. */
  private def imagePdf(dictExtra: String, payload: Array[Byte]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    def w(s: String): Unit = bos.write(s.getBytes(StandardCharsets.ISO_8859_1))
    w("%PDF-1.5\n")
    w("1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj\n")
    w("2 0 obj << /Type /Pages /Kids [10 0 R] /Count 1 >> endobj\n")
    w("10 0 obj << /Type /Page /Parent 2 0 R /Contents 100 0 R " +
      "/Resources << /XObject << /Im1 20 0 R >> >> >> endobj\n")
    w(s"20 0 obj << $dictExtra/Length ${payload.length} >>\nstream\n")
    bos.write(payload)
    w("\nendstream endobj\n")
    w("100 0 obj << /Length 35 >>\nstream\nq 400 0 0 400 100 300 cm /Im1 Do Q\nendstream endobj\n")
    w("%%EOF\n")
    bos.toByteArray
  }

  /** The rasterPdf pixel formula (salt 348), gray or RGB. */
  private def formulaPixels(docId: Long): Array[Byte] = {
    val rgb = math.floorMod(docId, 4L) == 3L
    val n = if (rgb) 768 else 256
    Array.tabulate(n) { q =>
      val x = if (rgb) docId * 768L + q else docId * 256L + q
      (Sampling.hashBitsScalar(x, 348L) % 256L).toByte
    }
  }

  test("rasterPdf legs 0-3: extraction recovers the formula pixels exactly") {
    for (id <- 0L to 7L) {
      val imgs = PdfImages.extract(PdfGen.rasterPdf(id))
      assert(imgs.size === 1, s"doc $id")
      val im = imgs.head
      assert(im.objNum === 20)
      assert((im.width, im.height, im.bitsPerComponent) === ((16, 16, 8)))
      assert(im.codec === "raw", s"doc $id")
      val rgb = math.floorMod(id, 4L) == 3L
      assert(im.colorSpace === (if (rgb) "DeviceRGB" else "DeviceGray"))
      assert(im.data.toSeq === formulaPixels(id).toSeq,
        s"doc $id (${if (rgb) "A85+Flate RGB" else s"variant ${id % 4}"})")
    }
  }

  test("luma grid matches the integer-numerator pooling formula") {
    // gray 16x16 -> 2x2 block means; verify one doc cell-by-cell
    val im = PdfImages.extract(PdfGen.rasterPdf(1L)).head
    val g = PdfImages.lumaGrid(im).get
    val px = formulaPixels(1L).map(_ & 0xff)
    for (cy <- 0 until 8; cx <- 0 until 8) {
      val s = px(2 * cy * 16 + 2 * cx) + px(2 * cy * 16 + 2 * cx + 1) +
        px((2 * cy + 1) * 16 + 2 * cx) + px((2 * cy + 1) * 16 + 2 * cx + 1)
      assert(g(cy * 8 + cx) === (s.toDouble / 4).toFloat)
    }
    // rgb: denom = pixels * comps = 12
    val imr = PdfImages.extract(PdfGen.rasterPdf(3L)).head
    val gr = PdfImages.lumaGrid(imr).get
    val pxr = formulaPixels(3L).map(_ & 0xff)
    val cell0 = (0 until 2).flatMap(dy => (0 until 2).flatMap(dx =>
      (0 until 3).map(c => pxr((dy * 16 + dx) * 3 + c)))).sum
    assert(gr(0) === (cell0.toDouble / 12).toFloat)
  }

  test("DCTDecode payload is the stored JPEG byte-for-byte, and decodes") {
    // a real ImageIO JPEG: 32x32 gradient
    graft.multimodal.Multimodal.ImageIoCodec.init
    val bi = new java.awt.image.BufferedImage(32, 32,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 32; x <- 0 until 32)
      bi.setRGB(x, y, (x * 8 << 16) | (y * 8 << 8) | ((x + y) * 4))
    val out = new java.io.ByteArrayOutputStream()
    val ios = new javax.imageio.stream.MemoryCacheImageOutputStream(out)
    try javax.imageio.ImageIO.write(bi, "jpg", ios) finally ios.close()
    val jpeg = out.toByteArray

    val doc = imagePdf("/Type /XObject /Subtype /Image /Width 32 /Height 32 " +
      "/ColorSpace /DeviceRGB /BitsPerComponent 8 /Filter /DCTDecode ", jpeg)
    val imgs = PdfImages.extract(doc)
    assert(imgs.size === 1)
    val im = imgs.head
    assert(im.codec === "dct")
    assert((im.width, im.height) === ((32, 32)))
    assert(im.data.toSeq === jpeg.toSeq)       // payload untouched
    val grid = PdfImages.lumaGrid(im)          // in-memory ImageIO decode
    assert(grid.isDefined && grid.get.length === 64)
    // the gradient brightens left-to-right => dHash rich in 1-bits
    assert(java.lang.Long.bitCount(ImageDedup.dHashOfGrid(grid.get)) > 20)
  }

  test("transport coat ahead of the raster codec is stripped (AHx+DCT)") {
    val jpeg = Array[Byte](0xff.toByte, 0xd8.toByte, 1, 2, 3, 4,
      0xff.toByte, 0xd9.toByte)
    val hex = (jpeg.map(b => f"${b & 0xff}%02X").mkString + ">")
      .getBytes(StandardCharsets.ISO_8859_1)
    val doc = imagePdf("/Type /XObject /Subtype /Image /Width 8 /Height 8 " +
      "/ColorSpace /DeviceRGB /BitsPerComponent 8 " +
      "/Filter [/ASCIIHexDecode /DCTDecode] ", hex)
    val imgs = PdfImages.extract(doc)
    assert(imgs.size === 1)
    assert(imgs.head.codec === "dct")
    assert(imgs.head.data.toSeq === jpeg.toSeq)
  }

  test("incremental update: the APPENDED image definition wins") {
    val base = PdfGen.rasterPdf(0L)
    val newRaw = Array.fill(256)(128.toByte)
    val upd = deflate(newRaw)
    val tail = (s"20 0 obj << /Type /XObject /Subtype /Image /Width 16 " +
      s"/Height 16 /ColorSpace /DeviceGray /BitsPerComponent 8 " +
      s"/Filter /FlateDecode /Length ${upd.length} >>\nstream\n")
      .getBytes(StandardCharsets.ISO_8859_1) ++ upd ++
      "\nendstream endobj\n%%EOF\n".getBytes(StandardCharsets.ISO_8859_1)
    val imgs = PdfImages.extract(base ++ tail)
    assert(imgs.size === 1)                    // one winning definition
    assert(imgs.head.data.toSeq === newRaw.toSeq)
  }

  test("unsupported codecs and sub-8-bit rasters decline luma, never fake it") {
    val ccitt = imagePdf("/Type /XObject /Subtype /Image /Width 64 /Height 64 " +
      "/ColorSpace /DeviceGray /BitsPerComponent 1 " +
      "/Filter /CCITTFaxDecode ", Array.tabulate(64)(_.toByte))
    val ci = PdfImages.extract(ccitt)
    assert(ci.size === 1 && ci.head.codec === "ccitt")
    assert(PdfImages.lumaGrid(ci.head).isEmpty)

    // 4-bit raw now EXPANDS to 8-bit (the r16 sub-8-bit decode): 0x55
    // nibbles are sample 5 → 5·255/15 = 85 gray everywhere
    val sub = imagePdf("/Type /XObject /Subtype /Image /Width 16 /Height 16 " +
      "/ColorSpace /DeviceGray /BitsPerComponent 4 " +
      "/Filter /FlateDecode ", deflate(Array.fill(128)(0x55.toByte)))
    val si = PdfImages.extract(sub)
    assert(si.size === 1 && si.head.codec === "raw")
    assert(si.head.bitsPerComponent === 8)
    assert(si.head.data.forall(_ == 85.toByte))
    assert(PdfImages.lumaGrid(si.head).isDefined)

    // …but a WRONG-LENGTH sub-8-bit payload still declines to opaque
    val bad = imagePdf("/Type /XObject /Subtype /Image /Width 16 /Height 16 " +
      "/ColorSpace /DeviceGray /BitsPerComponent 4 " +
      "/Filter /FlateDecode ", deflate(Array.fill(100)(0x55.toByte)))
    val bi = PdfImages.extract(bad)
    assert(bi.size === 1 && bi.head.codec === "opaque")
    assert(PdfImages.lumaGrid(bi.head).isEmpty)

    assert(PdfImages.extract("not a pdf at all".getBytes).isEmpty)
    assert(PdfImages.extract(Array.empty[Byte]).isEmpty)
    // truncated mid-stream: no endstream => no phantom image
    val trunc = PdfGen.rasterPdf(0L)
    assert(PdfImages.extract(trunc.take(trunc.length / 2))
      .forall(_.codec != "raw") || PdfImages.extract(trunc.take(trunc.length / 2)).isEmpty)
  }

  test("PdfRasterCodec bridges extract+lumaGrid into the MediaCodec surface") {
    val codec = PdfRasterCodec()
    val doc = PdfGen.rasterPdf(2L)
    val meta = codec.decodeMeta(doc)
    assert(meta.valid && meta.width === 16 && meta.height === 16)
    val im = PdfImages.extract(doc).head
    assert(codec.features(doc, 64).toSeq === PdfImages.lumaGrid(im).get.toSeq)
    assert(ImageDedup.dHash(codec, doc) ===
      ImageDedup.dHashOfGrid(PdfImages.lumaGrid(im).get))
    assert(codec.frameCount(doc) === 1)
    assert(codec.frameAt(doc, 0).toSeq === im.data.toSeq)
    assert(codec.frameAt(doc, 3).isEmpty)
    // no poolable image => invalid, zero features
    val none = "%PDF-1.5\njust a header".getBytes(StandardCharsets.ISO_8859_1)
    assert(!codec.decodeMeta(none).valid)
    assert(codec.features(none, 64).forall(_ == 0f))
    assert(codec.frameCount(none) === 0)
  }

  test("resize emits a GIMG gray thumbnail FakeCodec can read back") {
    val codec = PdfRasterCodec()
    val thumb = codec.resize(PdfGen.rasterPdf(3L), 4, 4)
    val fake = graft.multimodal.Multimodal.FakeCodec()
    val meta = fake.decodeMeta(thumb)
    assert(meta.valid && meta.width === 4 && meta.height === 4)
    assert(thumb.length === 12 + 16)
    assert(codec.resize(PdfGen.rasterPdf(3L), 0, 4).isEmpty)
  }

  test("rasterPdfTwin: every encoding leg's twin lands within Hamming 2") {
    val codec = PdfRasterCodec()
    for (id <- 0L to 7L) {
      val h1 = ImageDedup.dHash(codec, PdfGen.rasterPdf(id))
      val h2 = ImageDedup.dHash(codec, PdfGen.rasterPdfTwin(id))
      assert(java.lang.Long.bitCount(h1 ^ h2) <= 2, s"doc $id")
      // the twin is the SAME formula image except sample 0
      val a = PdfImages.extract(PdfGen.rasterPdf(id)).head.data
      val b = PdfImages.extract(PdfGen.rasterPdfTwin(id)).head.data
      assert(a.zip(b).count { case (x, y) => x != y } === 1, s"doc $id")
      assert((b(0) & 0xff) === ((a(0) & 0xff) + 1) % 256, s"doc $id")
    }
  }

  test("inline image: nested Flate decodes to the formula pixels, objNum -1") {
    for (id <- 0L to 3L) {
      val imgs = PdfImages.extract(PdfGen.inlineImagePdf(id))
      assert(imgs.size === 1, s"doc $id")
      val im = imgs.head
      assert(im.objNum === -1)
      assert((im.width, im.height, im.codec) === ((16, 16, "raw")))
      assert(im.colorSpace === "DeviceGray")
      val expected = Array.tabulate(256)(p =>
        (graft.operators.Sampling.hashBitsScalar(id * 256L + p, 351L) % 256L).toInt)
      assert(im.data.map(_ & 0xff).toSeq === expected.toSeq, s"doc $id")
    }
  }

  /** Single-page PDF around a raw (uncompressed) content stream. */
  private def contentPdf(cs: String): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    def w(s: String): Unit = bos.write(s.getBytes(StandardCharsets.ISO_8859_1))
    w("%PDF-1.5\n")
    w("1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj\n")
    w("2 0 obj << /Type /Pages /Kids [10 0 R] /Count 1 >> endobj\n")
    w("10 0 obj << /Type /Page /Parent 2 0 R /Contents 100 0 R >> endobj\n")
    w(s"100 0 obj << /Length ${cs.length} >>\nstream\n")
    w(cs)
    w("\nendstream endobj\n%%EOF\n")
    bos.toByteArray
  }

  test("inline image: unfiltered payload uses the exact derived length") {
    // 4x2 gray whose bytes spell things that would confuse an EI scan
    val px = " EI Q EI"                        // 8 bytes, all printable
    val cs = s"q BI /W 4 /H 2 /BPC 8 /CS /G ID $px EI Q"
    val imgs = PdfImages.extract(contentPdf(cs))
    assert(imgs.size === 1)
    assert(imgs.head.codec === "raw")
    assert(imgs.head.data.toSeq === px.getBytes(StandardCharsets.ISO_8859_1).toSeq)
  }

  test("inline image: a FALSE ' EI ' inside filtered data is rejected by decode") {
    // RunLength payload crafted to contain a whitespace-delimited EI:
    // a literal run keeps ' EI ' verbatim in the stream, so the EI
    // scan sees ws-E-I-ws — a perfect false terminator
    val head = " EI ".getBytes(StandardCharsets.ISO_8859_1)
    val px = head ++ Array.tabulate(28)(i => (i * 7 + 1).toByte)
    val rl = new java.io.ByteArrayOutputStream()
    rl.write(head.length - 1); head.foreach(b => rl.write(b & 0xff))
    val rest = px.drop(head.length)
    rl.write(rest.length - 1); rest.foreach(b => rl.write(b & 0xff))
    rl.write(128)                                              // EOD
    val data = new String(rl.toByteArray, StandardCharsets.ISO_8859_1)
    // sanity: the payload really does contain the trap
    assert(data.contains(" EI "))
    val cs = s"q BI /W 8 /H 4 /BPC 8 /CS /G /F /RL ID $data EI Q"
    val imgs = PdfImages.extract(contentPdf(cs))
    assert(imgs.size === 1)
    assert(imgs.head.codec === "raw")
    assert(imgs.head.data.take(4).toSeq === Seq(' '.toByte, 'E'.toByte, 'I'.toByte, ' '.toByte))
    assert(imgs.head.data.toSeq === px.toSeq)
  }

  test("inline images: several in one stream get -1, -2 in order") {
    val a = "ABCD"                             // 2x2 gray
    val b = "WXYZ"
    val cs = s"q BI /W 2 /H 2 /BPC 8 /CS /G ID $a EI " +
      s"BI /W 2 /H 2 /BPC 8 /CS /G ID $b EI Q"
    val imgs = PdfImages.extract(contentPdf(cs))
    assert(imgs.map(_.objNum) === Seq(-1, -2))
    assert(imgs.map(im => new String(im.data, StandardCharsets.ISO_8859_1)) ===
      Seq(a, b))
  }

  test("planted BI pattern inside image pixel bytes is NOT a phantom inline image") {
    // the BI scan is page-/Contents-scoped: a raw gray XObject whose
    // PIXELS spell a complete inline image must contribute exactly
    // one image (itself), not two
    val trap = "q BI /W 2 /H 2 /BPC 8 /CS /G ID ABCD EI Q"
    val pad = 256 - trap.length
    val px = (trap + "x" * pad).getBytes(StandardCharsets.ISO_8859_1)
    assert(px.length === 256)
    val doc = imagePdf("/Type /XObject /Subtype /Image /Width 16 /Height 16 " +
      "/ColorSpace /DeviceGray /BitsPerComponent 8 ", px)
    val imgs = PdfImages.extract(doc)
    assert(imgs.size === 1)
    assert(imgs.head.objNum === 20 && imgs.head.codec === "raw")
    assert(imgs.head.data.toSeq === px.toSeq)
  }

  test("a deflate bomb behind a transport coat fails the image, not the task") {
    // ~70 MB of zeros compress to ~70 KB; the 64 MB image-payload cap
    // rejects the inflate, the image is skipped, nothing throws
    val bomb = deflate(new Array[Byte](70 * 1024 * 1024))
    assert(bomb.length < 1024 * 1024)
    val doc = imagePdf("/Type /XObject /Subtype /Image /Width 64 /Height 64 " +
      "/ColorSpace /DeviceRGB /BitsPerComponent 8 " +
      "/Filter [/FlateDecode /DCTDecode] ", bomb)
    assert(PdfImages.extract(doc).isEmpty)
  }

  test("/Decode [1 0] inverts samples; exotic arrays decline (opaque)") {
    val px = formulaPixels(1L)
    def gray(extra: String) = imagePdf(
      "/Type /XObject /Subtype /Image /Width 16 /Height 16 " +
        s"/ColorSpace /DeviceGray /BitsPerComponent 8 $extra/Filter /FlateDecode ",
      deflate(px))
    val inv = PdfImages.extract(gray("/Decode [1 0] ")).head
    assert(inv.codec === "raw")
    assert(inv.data.map(b => 255 - (b & 0xff)).toSeq === px.map(_ & 0xff).toSeq)
    val ident = PdfImages.extract(gray("/Decode [0 1] ")).head
    assert(ident.codec === "raw" && ident.data.toSeq === px.toSeq)
    val weird = PdfImages.extract(gray("/Decode [0 0.5] ")).head
    assert(weird.codec === "opaque")
    assert(PdfImages.lumaGrid(weird).isEmpty)
    // inline /D abbreviation inverts too
    val cs = s"q BI /W 2 /H 2 /BPC 8 /CS /G /D [1 0] ID ABCD EI Q"
    val ii = PdfImages.extract(contentPdf(cs)).head
    assert(ii.data.map(b => (255 - (b & 0xff)).toChar).mkString === "ABCD")
    // inverted G4: white paper reads black
    val g4doc = PdfGen.ccittPdf(0L)
    val s2 = new String(g4doc, StandardCharsets.ISO_8859_1)
      .replace("/BlackIs1 false", "/Decode [1 0]")
    val g4inv = PdfImages.extract(s2.getBytes(StandardCharsets.ISO_8859_1)).head
    val g4raw = PdfImages.extract(g4doc).head
    assert(g4inv.data.map(b => 255 - (b & 0xff)).toSeq ===
      g4raw.data.map(_ & 0xff).toSeq)
  }

  test("/BlackIs1 true folds into the sample map (the self-canceling pair)") {
    val base = PdfGen.ccittPdf(1L)
    val s = new String(base, StandardCharsets.ISO_8859_1)
    val upright = PdfImages.extract(base).head
    // BlackIs1=true alone: black pixels are 1-samples, identity
    // /Decode maps them to white — the scan reads inverted
    val b1 = s.replace("/BlackIs1 false", "/BlackIs1 true")
    val inv = PdfImages.extract(b1.getBytes(StandardCharsets.ISO_8859_1)).head
    assert(inv.data.map(b => 255 - (b & 0xff)).toSeq ===
      upright.data.map(_ & 0xff).toSeq)
    // BlackIs1=true + /Decode [1 0]: the common pair cancels — upright
    val both = s.replace("/BlackIs1 false", "/BlackIs1 true")
      .replace("/Filter /CCITTFaxDecode", "/Decode [1 0] /Filter /CCITTFaxDecode")
    val canceled = PdfImages.extract(both.getBytes(StandardCharsets.ISO_8859_1)).head
    assert(canceled.data.toSeq === upright.data.toSeq)
  }

  test("exotic /D on a FILTERED inline image stays opaque, not dropped") {
    val px = "ABCD"
    val cs = s"q BI /W 2 /H 2 /BPC 8 /CS /G /D [0 0.5] /F /Fl ID " +
      new String(deflate(px.getBytes(StandardCharsets.ISO_8859_1)),
        StandardCharsets.ISO_8859_1) + " EI Q"
    val imgs = PdfImages.extract(contentPdf(cs))
    assert(imgs.size === 1)
    assert(imgs.head.codec === "opaque")
    assert(new String(imgs.head.data, StandardCharsets.ISO_8859_1) === px)
  }

  test("hasExtractableImage agrees with extract().nonEmpty on every fixture") {
    val docs = Seq(
      PdfGen.rasterPdf(0L), PdfGen.inlineImagePdf(1L), PdfGen.ccittPdf(2L),
      PdfGen.jbig2Pdf(3L), PdfGen.simple("just text"),
      "%PDF-1.5\nnothing".getBytes(StandardCharsets.ISO_8859_1),
      "not a pdf".getBytes(StandardCharsets.ISO_8859_1))
    for (d <- docs)
      assert(PdfImages.hasExtractableImage(d) === PdfImages.extract(d).nonEmpty)
  }

  test("ocrPayloads: decoded rasters become BMPs a real decoder reads back") {
    graft.multimodal.Multimodal.ImageIoCodec.init
    for (doc <- Seq(PdfGen.rasterPdf(0L), PdfGen.rasterPdf(3L),
        PdfGen.ccittPdf(1L), PdfGen.jbig2Pdf(2L))) {
      val rends = PdfImages.ocrPayloads(doc)
      assert(rends.size === 1)
      val im = PdfImages.extract(doc).head
      val iis = new javax.imageio.stream.MemoryCacheImageInputStream(
        new java.io.ByteArrayInputStream(rends.head))
      val bi = javax.imageio.ImageIO.read(iis)
      assert(bi != null, "ImageIO must read the BMP")
      assert((bi.getWidth, bi.getHeight) === ((im.width, im.height)))
      val comps = PdfImages.components(im.colorSpace)
      for (p <- Seq(0, 17, 255)) {
        val (x, y) = (p % 16, p / 16)
        val rgb = bi.getRGB(x, y)
        val expR = im.data(p * comps) & 0xff
        assert(((rgb >> 16) & 0xff) === expR, s"pixel $p of $doc")
      }
    }
    // junk DCT payloads pass through verbatim (tesseract-readable is
    // the CONTRACT; whether the jpeg decodes is the seam's business)
    val dct = PdfImages.ocrPayloads(PdfGen.dctImageOnly(5L))
    assert(dct.size === 1 && (dct.head(0) & 0xff) === 0xff)
    // text PDFs have no renditions
    assert(PdfImages.ocrPayloads(PdfGen.simple("hello")).isEmpty)
  }

  test("image-only PDFs route to the image leg whatever the carrier") {
    val auto = AutoPartitioner(TextPartitioner())
    for (doc <- Seq(PdfGen.rasterPdf(0L),      // Flate XObject, no raster codec name
        PdfGen.inlineImagePdf(1L),             // inline BI carrier only
        PdfGen.ccittPdf(2L),                   // announced raster codec
        PdfGen.dctImageOnly(3L)))              // classify-only DCT
      assert(auto.partitionWithPath(doc, PartitionStrategy.OcrOnly)._2 ===
        ExtractPath.PdfImage)
    // no text, no images -> still the generic fallback
    val bare = "%PDF-1.5\n1 0 obj << /Type /Catalog >> endobj\n%%EOF\n"
      .getBytes(StandardCharsets.ISO_8859_1)
    assert(auto.partitionWithPath(bare, PartitionStrategy.OcrOnly)._2 ===
      ExtractPath.PdfFallback)
  }

  test("multi-image documents: byte order preserved, frames walk them") {
    val pxA = Array.tabulate(256)(i => (i & 0xff).toByte)
    val pxB = Array.tabulate(256)(i => (255 - (i & 0xff)).toByte)
    val bos = new java.io.ByteArrayOutputStream()
    def w(s: String): Unit = bos.write(s.getBytes(StandardCharsets.ISO_8859_1))
    def img(num: Int, px: Array[Byte]): Unit = {
      val d = deflate(px)
      w(s"$num 0 obj << /Type /XObject /Subtype /Image /Width 16 /Height 16 " +
        s"/ColorSpace /DeviceGray /BitsPerComponent 8 /Filter /FlateDecode " +
        s"/Length ${d.length} >>\nstream\n")
      bos.write(d)
      w("\nendstream endobj\n")
    }
    w("%PDF-1.5\n")
    w("1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj\n")
    w("2 0 obj << /Type /Pages /Kids [10 0 R] /Count 1 >> endobj\n")
    w("10 0 obj << /Type /Page /Parent 2 0 R /Contents 100 0 R " +
      "/Resources << /XObject << /ImA 20 0 R /ImB 21 0 R >> >> >> endobj\n")
    img(20, pxA)
    img(21, pxB)
    w("100 0 obj << /Length 24 >>\nstream\nq /ImA Do Q q /ImB Do Q\nendstream endobj\n")
    w("%%EOF\n")
    val doc = bos.toByteArray

    val imgs = PdfImages.extract(doc)
    assert(imgs.map(_.objNum) === Seq(20, 21))
    assert(imgs(0).data.toSeq === pxA.toSeq && imgs(1).data.toSeq === pxB.toSeq)
    val codec = PdfRasterCodec()
    assert(codec.frameCount(doc) === 2)
    assert(codec.frameAt(doc, 1).toSeq === pxB.toSeq)
    assert(PdfImages.ocrPayloads(doc).size === 2)
    // features pool the FIRST image — a deterministic choice the
    // scaladoc documents, pinned here so it cannot drift silently
    assert(codec.features(doc, 64).toSeq ===
      PdfImages.lumaGrid(imgs(0)).get.toSeq)
  }

  test("encrypted scanned documents decrypt and route to the image leg") {
    val auto = AutoPartitioner(TextPartitioner())
    // empty password opens it; no text layer; images carry the content
    val doc = PdfGen.encryptedRaster(2L)
    assert(PdfTextPartitioner.isEncrypted(doc))
    assert(auto.partitionWithPath(doc, PartitionStrategy.OcrOnly)._2 ===
      ExtractPath.PdfImage)
    // and the decrypted pixels are the REAL formula image
    val dec = PdfCrypt.decryptStreams(doc).get
    val im = PdfImages.extract(dec).head
    assert(im.data.toSeq === formulaPixels(2L).toSeq)
    assert(PdfImages.ocrPayloads(dec).size === 1)
    // a real password stays ciphertext: no phantom images, own bucket
    val locked = PdfGen.encryptedRaster(2L, "owner-locked")
    assert(auto.partitionWithPath(locked, PartitionStrategy.OcrOnly)._2 ===
      ExtractPath.PdfEncrypted)
  }

  test("decryptable but unparseable: falls back with PLAINTEXT, not ciphertext") {
    // a CMap-less composite font decodes no text and carries no
    // image; the empty password OPENS the file, so the label is the
    // same generic fallback its unencrypted sibling gets — never
    // pdf_encrypted (that bucket means "could not open")
    val body = new java.io.ByteArrayOutputStream()
    def w(s: String): Unit = body.write(s.getBytes(StandardCharsets.ISO_8859_1))
    w("%PDF-1.5\n")
    w("3 0 obj << /Type /Page /Contents 4 0 R /Resources << /Font " +
      "<< /F1 5 0 R >> >> >> endobj\n")
    val cs = "BT /F1 12 Tf <00030007> Tj ET"
    w(s"4 0 obj << /Length ${cs.length} >>\nstream\n$cs\nendstream endobj\n")
    w("5 0 obj << /Type /Font /Subtype /Type0 /Encoding /Identity-H >> endobj\n")
    w("%%EOF\n")
    val doc = PdfGen.encryptedFrom(body.toByteArray, "cmapless", "")
    assert(PdfTextPartitioner.isEncrypted(doc))
    val auto = AutoPartitioner(TextPartitioner())
    assert(auto.partitionWithPath(doc, PartitionStrategy.OcrOnly)._2 ===
      ExtractPath.PdfFallback)
  }

  test("a near-identical raster lands within a small Hamming distance") {
    val id = 5L
    val px = formulaPixels(id)
    // perturb ONE pixel by +1: at most two grid cells' comparisons move
    val px2 = px.clone(); px2(0) = ((px2(0) + 1) & 0xff).toByte
    def gray(p: Array[Byte]) = imagePdf(
      "/Type /XObject /Subtype /Image /Width 16 /Height 16 " +
        "/ColorSpace /DeviceGray /BitsPerComponent 8 /Filter /FlateDecode ",
      deflate(p))
    val codec = PdfRasterCodec()
    val h1 = ImageDedup.dHash(codec, gray(px))
    val h2 = ImageDedup.dHash(codec, gray(px2))
    assert(java.lang.Long.bitCount(h1 ^ h2) <= 2)
  }

  test("subbitPdf: 1/4-bit gray and /Indexed rasters decode to formula pixels") {
    def hv(n: Long, salt: Long) = Sampling.hashBitsScalar(n, salt)
    for (id <- 0L to 7L) {
      val imgs = PdfImages.extract(PdfGen.subbitPdf(id))
      assert(imgs.size === 2, s"doc $id")    // XObject + inline carrier
      val xo = imgs.find(_.objNum == 20).get
      val inl = imgs.find(_.objNum == -1).get
      val expected: Seq[Int] = math.floorMod(id, 4L).toInt match {
        case 0 => (0 until 256).map(p => (hv(id * 256L + p, 353L) % 2L).toInt * 255)
        case 1 => (0 until 256).map(p => (hv(id * 256L + p, 353L) % 16L).toInt * 17)
        case 2 => (0 until 256).flatMap { p =>
          val idx = (hv(id * 256L + p, 353L) % 16L).toInt
          (0 until 3).map(c => (hv(id * 48L + idx * 3 + c, 354L) % 256L).toInt)
        }
        case _ => (0 until 256).map { p =>
          val idx = (hv(id * 256L + p, 353L) % 2L).toInt
          (hv(id * 2L + idx, 354L) % 256L).toInt
        }
      }
      assert(xo.codec === "raw", s"doc $id")
      assert(xo.bitsPerComponent === 8, s"doc $id")
      assert(xo.colorSpace ===
        (if (math.floorMod(id, 4L) == 2L) "DeviceRGB" else "DeviceGray"), s"doc $id")
      assert(xo.data.map(_ & 0xff).toSeq === expected, s"doc $id")
      assert(PdfImages.lumaGrid(xo).isDefined, s"doc $id")
      // the inline 1-bit raw carrier on the same page
      val expInl = (0 until 256).map(p => (hv(id * 256L + p, 355L) % 2L).toInt * 255)
      assert(inl.codec === "raw", s"doc $id inline")
      assert(inl.data.map(_ & 0xff).toSeq === expInl, s"doc $id inline")
    }
  }

  test("2-bit gray expands with the v*85 scale; /Indexed literal-string lookup") {
    // 2-bit: 16 wide -> 4 bytes/row; sample p % 4
    val vals = Array.tabulate(256)(p => p % 4)
    val packed = {
      val out = new Array[Byte](4 * 16)
      for (y <- 0 until 16; x <- 0 until 16) {
        val bit = x * 2
        out(y * 4 + (bit >> 3)) =
          (out(y * 4 + (bit >> 3)) | (vals(y * 16 + x) << (8 - 2 - (bit & 7)))).toByte
      }
      out
    }
    val doc = imagePdf("/Type /XObject /Subtype /Image /Width 16 /Height 16 " +
      "/ColorSpace /DeviceGray /BitsPerComponent 2 /Filter /FlateDecode ",
      deflate(packed))
    val im = PdfImages.extract(doc).head
    assert(im.codec === "raw")
    assert(im.data.map(_ & 0xff).toSeq === vals.map(_ * 85).toSeq)

    // literal-string palette: 8-bit indices, 2-entry gray palette with
    // escaped bytes \( and octal \101 = 'A' = 65
    val idxs = Array.tabulate(256)(p => (p % 2))
    val lit = imagePdf("/Type /XObject /Subtype /Image /Width 16 /Height 16 " +
      "/ColorSpace [/Indexed /DeviceGray 1 (\\(\\101)] " +
      "/BitsPerComponent 8 /Filter /FlateDecode ",
      deflate(idxs.map(_.toByte)))
    val li = PdfImages.extract(lit).head
    assert(li.codec === "raw")
    assert(li.colorSpace === "DeviceGray")
    assert(li.data.map(_ & 0xff).toSeq === idxs.map(i => if (i == 0) '('.toInt else 65).toSeq)
  }

  test("/Indexed guards: short lookup, exotic /Decode, bad hival stay opaque") {
    val idxs = Array.tabulate(256)(p => p % 4)
    def pdf(csDecl: String, decode: String = "") = imagePdf(
      "/Type /XObject /Subtype /Image /Width 16 /Height 16 " +
        s"/ColorSpace $csDecl $decode/BitsPerComponent 8 /Filter /FlateDecode ",
      deflate(idxs.map(_.toByte)))
    // lookup shorter than (hival+1)*comps
    val short = PdfImages.extract(pdf("[/Indexed /DeviceRGB 3 <001122334455>]")).head
    assert(short.codec === "opaque")
    // non-default /Decode on an indexed image
    val dec = PdfImages.extract(
      pdf("[/Indexed /DeviceGray 3 <00112233>]", "/Decode [3 0] ")).head
    assert(dec.codec === "opaque")
    // default /Decode [0 255] at bpc 8 is identity -> decodes
    val ok = PdfImages.extract(
      pdf("[/Indexed /DeviceGray 3 <00112233>]", "/Decode [0 255] ")).head
    assert(ok.codec === "raw")
    assert(ok.data.map(_ & 0xff).toSeq === idxs.map(i => i * 0x11).toSeq)
    // out-of-range indices clamp to hival (spec), never read past
    val over = PdfImages.extract(
      pdf("[/Indexed /DeviceGray 1 <00FF>]")).head
    assert(over.codec === "raw")
    assert(over.data.map(_ & 0xff).toSeq === idxs.map(i => if (i == 0) 0 else 255).toSeq)
  }

  test("iccPdf: /ICCBased colorspaces resolve to the /N alternate, both shapes") {
    for (id <- 0L to 3L) {
      val imgs = PdfImages.extract(PdfGen.iccPdf(id))
      assert(imgs.size === 1, s"doc $id")
      val im = imgs.head
      val rgb = id % 2 == 1
      assert(im.codec === "raw", s"doc $id")
      assert(im.colorSpace === (if (rgb) "DeviceRGB" else "DeviceGray"), s"doc $id")
      val comps = if (rgb) 3 else 1
      val expected = Array.tabulate(256 * comps) { q =>
        val n = if (rgb) id * 768L + q else id * 256L + q
        (Sampling.hashBitsScalar(n, 358L) % 256L).toInt
      }
      assert(im.data.map(_ & 0xff).toSeq === expected.toSeq, s"doc $id")
      assert(PdfImages.lumaGrid(im).isDefined, s"doc $id")
    }
    // an /N the subset cannot map (2-component) stays opaque
    val doc = new String(PdfGen.iccPdf(0L),
      java.nio.charset.StandardCharsets.ISO_8859_1).replace("/N 1 ", "/N 2 ")
    val im2 = PdfImages.extract(
      doc.getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)).head
    assert(im2.codec === "opaque")
  }

  test("16-bit samples downshift to the high byte") {
    val vals = Array.tabulate(256)(p => (p * 257) % 65536)  // hi byte = p % 256
    val packed = new Array[Byte](512)
    for (i <- 0 until 256) {
      packed(i * 2) = ((vals(i) >> 8) & 0xff).toByte
      packed(i * 2 + 1) = (vals(i) & 0xff).toByte
    }
    val doc = imagePdf("/Type /XObject /Subtype /Image /Width 16 /Height 16 " +
      "/ColorSpace /DeviceGray /BitsPerComponent 16 /Filter /FlateDecode ",
      deflate(packed))
    val im = PdfImages.extract(doc).head
    assert(im.codec === "raw")
    assert(im.bitsPerComponent === 8)
    assert(im.data.map(_ & 0xff).toSeq === (0 until 256).map(p => (vals(p) >> 8) & 0xff))
  }

  test("review pins: exotic /Decode on sub-8-bit keeps ORIGINAL bytes/depth") {
    // XObject: 1-bit gray with an exotic decode array -> opaque that
    // does not lie about its layout
    val packed = Array.tabulate(32)(i => (i * 37).toByte)
    val doc = imagePdf("/Type /XObject /Subtype /Image /Width 16 /Height 16 " +
      "/ColorSpace /DeviceGray /BitsPerComponent 1 /Decode [0 0.5] " +
      "/Filter /FlateDecode ", deflate(packed))
    val im = PdfImages.extract(doc).head
    assert(im.codec === "opaque")
    assert(im.bitsPerComponent === 1)
    assert(im.data.toSeq === packed.toSeq)

    // inline: same shape through the false-EI validator — the image
    // must be KEPT as opaque (packed length matches), not dropped
    val cs = "q 400 0 0 400 100 300 cm " +
      "BI /W 16 /H 16 /BPC 1 /CS /G /F /Fl /D [0 0.5] ID " +
      new String(deflate(packed), StandardCharsets.ISO_8859_1) + " EI Q"
    val bos = new java.io.ByteArrayOutputStream()
    def w(s: String): Unit = bos.write(s.getBytes(StandardCharsets.ISO_8859_1))
    w("%PDF-1.5\n")
    w("1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj\n")
    w("2 0 obj << /Type /Pages /Kids [10 0 R] /Count 1 >> endobj\n")
    w("10 0 obj << /Type /Page /Parent 2 0 R /Contents 100 0 R >> endobj\n")
    w(s"100 0 obj << /Length ${cs.length} >>\nstream\n")
    w(cs)
    w("\nendstream endobj\n%%EOF\n")
    val imgs = PdfImages.extract(bos.toByteArray)
    assert(imgs.size === 1)
    assert(imgs.head.codec === "opaque")
    assert(imgs.head.bitsPerComponent === 1)
    assert(imgs.head.data.toSeq === packed.toSeq)
  }

  test("review pins: literal-string palettes honor backslash-EOL continuation") {
    val idxs = Array.tabulate(256)(p => (p % 2))
    // palette (AB) split as (A\<LF>B): continuation contributes no byte
    val lit = imagePdf("/Type /XObject /Subtype /Image /Width 16 /Height 16 " +
      "/ColorSpace [/Indexed /DeviceGray 1 (\\101\\\nB)] " +
      "/BitsPerComponent 8 /Filter /FlateDecode ",
      deflate(idxs.map(_.toByte)))
    val li = PdfImages.extract(lit).head
    assert(li.codec === "raw")
    assert(li.data.map(_ & 0xff).toSeq ===
      idxs.map(i => if (i == 0) 65 else 'B'.toInt).toSeq)
  }
}
