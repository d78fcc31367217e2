package graft.pipeline

import org.scalatest.funsuite.AnyFunSuite

/** The /Separation / /DeviceN tint-transform leg (r17): happy-path
  * parity with the q361 oracle formulas across all three function
  * types, plus the decline contract — type 4, multi-colorant
  * DeviceN, explicit /Decode, and output-arity mismatches must never
  * emit wrong pixels. */
class PdfFunctionSpec extends AnyFunSuite {
  private def hv(n: Long, s: Long) = graft.operators.Sampling.hashBitsScalar(n, s)
  private def bytes(s: String) = s.getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)
  private def text(b: Array[Byte]) = new String(b, java.nio.charset.StandardCharsets.ISO_8859_1)

  private def clamp01(v: Double) = if (v < 0.0) 0.0 else if (v > 1.0) 1.0 else v
  private def byteOf(v: Double): Int = math.floor(255.0 * clamp01(v) + 0.5).toInt

  test("sepPdf extraction matches the oracle formula for all three legs") {
    for (id <- 0L to 11L) {
      val imgs = PdfImages.extract(PdfGen.sepPdf(id))
      assert(imgs.size == 1, s"id $id images ${imgs.size}")
      val im = imgs.head
      val leg = (id % 3).toInt
      val comps = if (leg == 1) 1 else 3
      assert(im.codec == "raw" && im.bitsPerComponent == 8, s"id $id ${im.codec}")
      assert(im.colorSpace == (if (leg == 1) "DeviceGray" else "DeviceRGB"),
        s"id $id got ${im.colorSpace}")
      assert(im.data.length == 256 * comps)
      for (p <- 0 until 256) {
        val v = (hv(id * 256 + p, 368L) % 256).toInt
        val t = 0.0 + v * (1.0 - 0.0) / 255.0
        val want: Seq[Int] = leg match {
          case 0 =>
            (0 until 3).map { j =>
              val c0 = (hv(id * 8 + j, 369L) % 256) / 255.0
              val c1 = (hv(id * 8 + 4 + j, 369L) % 256) / 255.0
              byteOf(c0 + t * (c1 - c0))
            }
          case 1 =>
            val a0 = (hv(id * 8, 370L) % 256) / 255.0
            val a1 = (hv(id * 8 + 1, 370L) % 256) / 255.0
            val b0 = (hv(id * 8 + 2, 370L) % 256) / 255.0
            val b1 = (hv(id * 8 + 3, 370L) % 256) / 255.0
            val y =
              if (t >= 0.5) b0 + ((t - 0.5) * (1.0 - 0.0) / (1.0 - 0.5)) * (b1 - b0)
              else a0 + ((t - 0.0) * (1.0 - 0.0) / (0.5 - 0.0)) * (a1 - a0)
            Seq(byteOf(y))
          case _ =>
            val e = 0.0 + (t - 0.0) * (16.0 - 0.0) / (1.0 - 0.0)
            val k = math.min(e.toInt, 15)
            val frac = e - k
            (0 until 3).map { j =>
              val s0 = (hv(id * 64 + k * 3 + j, 371L) % 256).toDouble
              val s1 = (hv(id * 64 + (k + 1) * 3 + j, 371L) % 256).toDouble
              val r = s0 + frac * (s1 - s0)
              byteOf((r - 0.0) * (1.0 - 0.0) / (255.0 - 0.0))
            }
        }
        val got = (0 until comps).map(c => im.data(p * comps + c) & 0xff)
        assert(got == want, s"id $id pixel $p (leg $leg)")
      }
      assert(PdfImages.lumaGrid(im).isDefined)
    }
  }

  test("decline: malformed type 4, ink-arity mismatch, /Decode") {
    // a type-4 flag on a DICT-ONLY object (no program stream) is
    // malformed — type 4 itself is in subset since r17 (q367)
    val t4 = text(PdfGen.sepPdf(0L))
      .replace("/FunctionType 2", "/FunctionType 4")
    val im4 = PdfImages.extract(bytes(t4)).head
    assert(im4.codec == "opaque", "streamless type-4 must decline")
    // two-colorant DeviceN over a 1-in function: arity mismatch
    val multi = text(PdfGen.sepPdf(2L))
      .replace("[/DeviceN [/Ink0]", "[/DeviceN [/Ink0 /Ink1]")
    assert(PdfImages.extract(bytes(multi)).head.codec == "opaque")
    // an explicit /Decode remaps the tint domain — out of subset
    val withDecode = text(PdfGen.sepPdf(0L)).replace(
      "/BitsPerComponent 8 ", "/BitsPerComponent 8 /Decode [1 0] ")
    assert(PdfImages.extract(bytes(withDecode)).head.codec == "opaque")
    // function arity must equal the alternate's component count
    val wrongAlt = text(PdfGen.sepPdf(0L))
      .replace("/DeviceRGB 30 0 R", "/DeviceGray 30 0 R")
    assert(PdfImages.extract(bytes(wrongAlt)).head.codec == "opaque")
    // a dangling function reference declines
    val dangling = text(PdfGen.sepPdf(0L))
      .replace("/DeviceRGB 30 0 R", "/DeviceRGB 99 0 R")
    assert(PdfImages.extract(bytes(dangling)).head.codec == "opaque")
  }

  test("decline: malformed type-0 and type-3 parameter shapes") {
    // sub-byte BitsPerSample is out of subset
    val bps4 = text(PdfGen.sepPdf(2L))
      .replace("/BitsPerSample 8", "/BitsPerSample 4")
    assert(PdfImages.extract(bytes(bps4)).head.codec == "opaque")
    // type 0 without /Range fails the parse (Range is REQUIRED)
    val noRange = text(PdfGen.sepPdf(2L))
      .replace("/Range [0 1 0 1 0 1] ", "")
    assert(PdfImages.extract(bytes(noRange)).head.codec == "opaque")
    // a /Bounds value outside the domain fails the stitch parse
    val badBounds = text(PdfGen.sepPdf(1L))
      .replace("/Bounds [0.5]", "/Bounds [1.5]")
    assert(PdfImages.extract(bytes(badBounds)).head.codec == "opaque")
    // a /Bounds value ON a domain edge makes a zero-width subdomain
    // whose encode interpolation is 0/0 — must decline, not NaN→0
    val edgeBounds = text(PdfGen.sepPdf(1L))
      .replace("/Bounds [0.5]", "/Bounds [1]")
    assert(PdfImages.extract(bytes(edgeBounds)).head.codec == "opaque")
    // PDF reals may omit the integer part: "/Bounds [.5]" must parse
    // as 0.5 (identical pixels), not 5.0 (out-of-domain → decline)
    val dotBounds = text(PdfGen.sepPdf(1L))
      .replace("/Bounds [0.5]", "/Bounds [.5]")
    val dotIm = PdfImages.extract(bytes(dotBounds)).head
    val refIm = PdfImages.extract(PdfGen.sepPdf(1L)).head
    assert(dotIm.codec == "raw" && dotIm.data.toSeq == refIm.data.toSeq,
      "'.5' must read as 0.5")
    // a stitching function referring to ITSELF must not recurse
    val selfRef = text(PdfGen.sepPdf(1L))
      .replace("/Functions [31 0 R 32 0 R]", "/Functions [30 0 R 32 0 R]")
    assert(PdfImages.extract(bytes(selfRef)).head.codec == "opaque")
  }

  test("tintCalcPdf (type 4 + two-ink DeviceN) matches the oracle formula") {
    for (id <- 0L to 7L) {
      val imgs = PdfImages.extract(PdfGen.tintCalcPdf(id))
      assert(imgs.size == 1, s"id $id")
      val im = imgs.head
      val leg = (id % 2).toInt
      val comps = if (leg == 1) 1 else 3
      assert(im.codec == "raw", s"id $id ${im.codec}")
      assert(im.colorSpace == (if (leg == 1) "DeviceGray" else "DeviceRGB"))
      def c(off: Int) = (hv(id * 8 + off, 392L) % 256) / 255.0
      for (p <- 0 until 256) {
        val t0 = 0.0 + (hv(id * 256 + p, 390L) % 256) * (1.0 - 0.0) / 255.0
        val t1 = 0.0 + (hv(id * 256 + p, 391L) % 256) * (1.0 - 0.0) / 255.0
        val want: Seq[Int] =
          if (leg == 0) Seq(
            byteOf(t0 * c(0)), byteOf(t0 * c(1)), byteOf(1.0 - t0 * c(2)))
          else Seq(byteOf(1.0 - (t1 * c(5) + t0 * c(4))))
        val got = (0 until comps).map(q => im.data(p * comps + q) & 0xff)
        assert(got == want, s"id $id pixel $p leg $leg")
      }
    }
  }

  test("calculator operators evaluate per the PostScript semantics") {
    // drive programs through the Separation plumbing: a 1-in gray
    // calculator over the salt-390 tint pixels; the decoded byte at
    // every pixel must equal the reference evaluation of the program
    def decodeWith(prog: String): Option[PdfImage] = {
      val pdf = text(PdfGen.tintCalcPdf(0L))
        .replace("[/Separation /Spot0 /DeviceRGB 30 0 R]",
          "[/Separation /T /DeviceGray 40 0 R]") +
        s"\n40 0 obj << /FunctionType 4 /Domain [0 1] /Range [0 1] " +
        s"/Length ${prog.length} >>\nstream\n$prog\nendstream endobj\n"
      PdfImages.extract(bytes(pdf)).headOption.filter(_.codec == "raw")
    }
    def expectEq(prog: String, f: Double => Double): Unit = {
      val im = decodeWith(prog).getOrElse(fail(s"$prog did not decode"))
      for (p <- 0 until 256) {
        val t = 0.0 + (hv(0L * 256 + p, 390L) % 256) * (1.0 - 0.0) / 255.0
        assert((im.data(p) & 0xff) == byteOf(f(t)), s"$prog pixel $p")
      }
    }
    expectEq("{ }", x => x)
    expectEq("{ neg abs }", x => math.abs(-x))
    expectEq("{ dup mul }", x => x * x)
    expectEq("{ 2 div }", x => x / 2)
    expectEq("{ 1 exch sub }", x => 1.0 - x)
    expectEq("{ dup sqrt exch 3 mul add 4 div }",
      x => (math.sqrt(x) + 3 * x) / 4)
    expectEq("{ dup dup mul exch 1 index pop pop }", x => x * x)
    expectEq("{ 0.25 0.5 2 copy pop pop pop pop }", x => x)
    expectEq("{ dup 0.5 gt { 0.25 mul } { 0.75 mul } ifelse }",
      x => if (x > 0.5) x * 0.25 else x * 0.75)
    expectEq("{ dup 0.5 le { 1 add 2 div } if }",
      x => if (x <= 0.5) (x + 1) / 2 else x)
    expectEq("{ 0.25 0.5 3 2 roll pop pop }", _ => 0.25)
    expectEq("{ truncate }", x => x.toLong.toDouble)
    expectEq("{ 10 mul floor 10 div }", x => math.floor(10 * x) / 10)
  }

  test("calculator faults decline to opaque, never wrong pixels") {
    def withProg(prog: String): Seq[PdfImage] = {
      val pdf = text(PdfGen.tintCalcPdf(0L))
        .replace("[/Separation /Spot0 /DeviceRGB 30 0 R]",
          "[/Separation /T /DeviceGray 40 0 R]") +
        s"\n40 0 obj << /FunctionType 4 /Domain [0 1] /Range [0 1] " +
        s"/Length ${prog.length} >>\nstream\n$prog\nendstream endobj\n"
      PdfImages.extract(bytes(pdf))
    }
    // stack underflow
    assert(withProg("{ add }").head.codec == "opaque")
    // unknown operator
    assert(withProg("{ frobnicate }").head.codec == "opaque")
    // unbalanced braces
    assert(withProg("{ dup { mul }").head.codec == "opaque")
    // orphan procedure (no if/ifelse)
    assert(withProg("{ { dup } pop }").head.codec == "opaque")
    // leftover arity below /Range's demand is a fault; extra stack
    // depth is fine (outputs are the top values)
    assert(withProg("{ pop }").head.codec == "opaque")
    assert(withProg("{ dup }").head.codec == "raw")
  }

  test("type-0 /Encode override and 16-bit samples evaluate per spec") {
    // Size 2, BitsPerSample 16, Encode [1 0] (REVERSED): e runs from
    // 1 down to 0 as the tint rises, so the two samples swap roles.
    val hi = Array[Byte](0xff.toByte, 0xff.toByte, 0, 0) // s0=65535, s1=0
    val pdf = text(PdfGen.sepPdf(1L))
      .replace("[/Separation /All /DeviceGray 30 0 R]",
        "[/Separation /All /DeviceGray 40 0 R]") +
      "\n40 0 obj << /FunctionType 0 /Domain [0 1] /Range [0 1] " +
      "/Size [2] /BitsPerSample 16 /Encode [1 0] /Length 4 >>\nstream\n" +
      new String(hi.map(b => (b & 0xff).toChar)) + "\nendstream endobj\n"
    val im = PdfImages.extract(bytes(pdf)).head
    assert(im.codec == "raw" && im.colorSpace == "DeviceGray",
      s"got ${im.codec}/${im.colorSpace}")
    for (p <- 0 until 256) {
      val v = (hv(1L * 256 + p, 368L) % 256).toInt
      val t = 0.0 + v * (1.0 - 0.0) / 255.0
      val e = 1.0 + (t - 0.0) * (0.0 - 1.0) / (1.0 - 0.0) // Encode [1 0]
      val k = math.min(e.toInt, 0)
      val frac = e - k
      val r = 65535.0 + frac * (0.0 - 65535.0)
      val want = byteOf(0.0 + (r - 0.0) * (1.0 - 0.0) / 65535.0)
      assert((im.data(p) & 0xff) == want, s"pixel $p")
    }
  }
}
