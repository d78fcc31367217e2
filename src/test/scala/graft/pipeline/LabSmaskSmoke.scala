package graft.pipeline

import org.scalatest.funsuite.AnyFunSuite
import graft.multimodal.ImageDedup

/** The Lab-colorspace and /SMask legs (r17): happy-path parity with
  * the q356/q357 oracle formulas, plus the decline contract — an
  * exotic /Decode on Lab, an undecodable mask, and a mask on a
  * passthrough codec must never emit wrong pixels. */
class LabSmaskSmoke extends AnyFunSuite {
  private def hv(n: Long, s: Long) = graft.operators.Sampling.hashBitsScalar(n, s)
  private def bytes(s: String) = s.getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)
  private def text(b: Array[Byte]) = new String(b, java.nio.charset.StandardCharsets.ISO_8859_1)

  test("labPdf extraction matches the oracle formula end-to-end") {
    for (id <- 0L to 7L) {
      val imgs = PdfImages.extract(PdfGen.labPdf(id))
      assert(imgs.size == 1, s"id $id images ${imgs.size}")
      val im = imgs.head
      assert(im.colorSpace == "DeviceRGB" && im.codec == "raw" &&
        im.bitsPerComponent == 8, s"id $id got ${im.colorSpace}/${im.codec}")
      // oracle-side recomputation (mirrors the q356 SQL text)
      val (amin, amax, bmin, bmax) =
        if (id % 2 == 1) (-128.0, 127.0, -128.0, 127.0)
        else (-100.0, 100.0, -100.0, 100.0)
      def g(t: Double) = if (t >= 6.0/29.0) t*t*t else (108.0/841.0)*(t - 4.0/29.0)
      def byteOf(v: Double): Int = {
        val c = if (v < 0.0) 0.0 else if (v > 1.0) 1.0 else v
        math.floor(255.0 * c + 0.5).toInt
      }
      for (p <- 0 until 256) {
        val s0 = (hv(id*768 + p*3, 359L) % 256).toInt
        val s1 = (hv(id*768 + p*3 + 1, 359L) % 256).toInt
        val s2 = (hv(id*768 + p*3 + 2, 359L) % 256).toInt
        val fy = (s0 * 100.0 / 255.0 + 16.0) / 116.0
        val fx = fy + (amin + s1 * (amax - amin) / 255.0) / 500.0
        val fz = fy - (bmin + s2 * (bmax - bmin) / 255.0) / 200.0
        val x = 0.9505 * g(fx); val y = 1.0 * g(fy); val z = 1.089 * g(fz)
        val want = Seq(
          byteOf(3.2406*x - 1.5372*y - 0.4986*z),
          byteOf(-0.9689*x + 1.8758*y + 0.0415*z),
          byteOf(0.0557*x - 0.204*y + 1.057*z))
        val got = Seq(im.data(p*3) & 0xff, im.data(p*3+1) & 0xff, im.data(p*3+2) & 0xff)
        assert(got == want, s"id $id pixel $p")
      }
      assert(PdfImages.lumaGrid(im).isDefined)
    }
  }

  test("smaskPdf extraction composites and hides the mask object") {
    for (id <- 0L to 7L) {
      val imgs = PdfImages.extract(PdfGen.smaskPdf(id))
      assert(imgs.size == 1, s"id $id images ${imgs.size} (mask must not leak)")
      val im = imgs.head
      val rgb = id % 2 == 1
      val comps = if (rgb) 3 else 1
      assert(im.objNum == 20 && im.codec == "raw")
      assert(im.colorSpace == (if (rgb) "DeviceRGB" else "DeviceGray"))
      for (p <- 0 until 256; c <- 0 until comps) {
        val v = (hv(id*(256L*comps) + p*comps + c, 360L) % 256).toInt
        val mi = ((p/16)/2)*8 + (p%16)/2
        val m = (hv(id*64 + mi, 361L) % 256).toInt
        val want = (v*m + 255*(255 - m) + 127) / 255
        assert((im.data(p*comps + c) & 0xff) == want, s"id $id p $p c $c")
      }
    }
  }

  test("Lab decline paths: explicit /Decode, bad WhitePoint, bad Range") {
    val good = text(PdfGen.labPdf(0L))
    // an explicit /Decode remaps the Lab ranges — out of subset
    val withDecode = good.replace("/BitsPerComponent 8 ",
      "/BitsPerComponent 8 /Decode [0 100 -100 100 -100 100] ")
    val im1 = PdfImages.extract(bytes(withDecode)).head
    assert(im1.codec == "opaque" && im1.colorSpace != "DeviceRGB")
    // a non-positive WhitePoint component fails the parse
    val badWp = good.replace("[0.9505 1 1.089]", "[0 1 1.089]")
    assert(PdfImages.extract(bytes(badWp)).head.codec == "opaque")
    // an inverted Range (min > max) fails the parse
    val badRange = text(PdfGen.labPdf(1L))
      .replace("/Range [-128 127 -128 127]", "/Range [127 -128 -128 127]")
    assert(PdfImages.extract(bytes(badRange)).head.codec == "opaque")
  }

  test("SMask decline paths: missing, wrong-space, and sub-poolable masks") {
    val good = text(PdfGen.smaskPdf(0L))
    // mask object missing: visible pixels unknowable -> opaque
    val gone = good.replace("/SMask 21 0 R ", "/SMask 99 0 R ")
    val im1 = PdfImages.extract(bytes(gone))
    assert(im1.size == 2 && im1.forall(i => i.objNum != 99))
    assert(im1.find(_.objNum == 20).get.codec == "opaque")
    // an RGB mask is out of subset (soft masks are gray) -> opaque
    val rgbMask = good.replace(
      "/Width 8 /Height 8 /ColorSpace /DeviceGray",
      "/Width 8 /Height 8 /ColorSpace /DeviceRGB")
    val masked = PdfImages.extract(bytes(rgbMask)).find(_.objNum == 20).get
    assert(masked.codec == "opaque")
    // /SMask /None is not a reference: base passes through unmasked
    val none = good.replace("/SMask 21 0 R ", "/SMask /None ")
    val unmasked = PdfImages.extract(bytes(none)).find(_.objNum == 20).get
    assert(unmasked.codec == "raw")
    val plain = Array.tabulate(256)(p => (hv(0L * 256 + p, 360L) % 256).toInt)
    assert(unmasked.data.map(_ & 0xff).toSeq == plain.toSeq)
  }
}
