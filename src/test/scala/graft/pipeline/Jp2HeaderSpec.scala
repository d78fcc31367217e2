package graft.pipeline

import org.scalatest.funsuite.AnyFunSuite

/** JP2/JPX header metadata parse (T.800): both container shapes
  * (JP2 box stream, raw codestream), built by the fixture-side
  * builders from the same public layout, plus the strict
  * malformed-input contract. The codec stays payload-passthrough —
  * only the header is read. */
class Jp2HeaderSpec extends AnyFunSuite {

  test("JP2 box stream: ihdr dims/components/bpc recovered") {
    val jp2 = Jp2Header.buildJp2(640, 480, 3, 8)
    assert(Jp2Header.parse(jp2) === Some(Jp2Header.Meta(640, 480, 3, 8)))
    val gray = Jp2Header.buildJp2(17, 1025, 1, 12)
    assert(Jp2Header.parse(gray) === Some(Jp2Header.Meta(17, 1025, 1, 12)))
  }

  test("raw codestream: SIZ marker dims recovered (origin offsets honored)") {
    val cs = Jp2Header.buildCodestream(320, 200, 4, 16,
      payload = Array[Byte](1, 2, 3))
    assert(Jp2Header.parse(cs) === Some(Jp2Header.Meta(320, 200, 4, 16)))
  }

  test("jp2c fallback: a JP2 without jp2h still yields SIZ metadata") {
    // hand-assemble: signature + jp2c only
    val inner = Jp2Header.buildCodestream(64, 32, 1, 8)
    val bos = new java.io.ByteArrayOutputStream()
    def be32(v: Long): Unit = {
      bos.write(((v >> 24) & 0xff).toInt); bos.write(((v >> 16) & 0xff).toInt)
      bos.write(((v >> 8) & 0xff).toInt); bos.write((v & 0xff).toInt)
    }
    be32(12L); be32(0x6a502020L); be32(0x0d0a870aL)
    be32(8L + inner.length); be32(0x6a703263L); bos.write(inner, 0, inner.length)
    assert(Jp2Header.parse(bos.toByteArray) ===
      Some(Jp2Header.Meta(64, 32, 1, 8)))
  }

  test("malformed input: None, never a misparse") {
    assert(Jp2Header.parse(null).isEmpty)
    assert(Jp2Header.parse(Array.empty[Byte]).isEmpty)
    assert(Jp2Header.parse("not a jp2 at all............".getBytes).isEmpty)
    // truncated box stream
    val jp2 = Jp2Header.buildJp2(640, 480, 3, 8)
    assert(Jp2Header.parse(jp2.take(20)).isEmpty)
    // absurd dimensions rejected
    val big = Jp2Header.buildCodestream(1 << 21, 4, 1, 8)
    assert(Jp2Header.parse(big).isEmpty)
    val rnd = new scala.util.Random(3800)
    for (_ <- 0 until 50)
      Jp2Header.parse(Array.fill(64)(rnd.nextInt(256).toByte)) // no throw
  }

  test("jpxPdf: extract surfaces header dims for the passthrough payload") {
    val imgs = PdfImages.extract(PdfGen.jpxPdf(5L))
    assert(imgs.size === 1)
    val im = imgs.head
    assert(im.codec === "jpx")
    // dims come from the JP2 header (the PDF dict deliberately lies
    // in this fixture — header wins for the audit surface)
    assert((im.width, im.height) === ((48, 24)))
    assert(im.colorSpace === "DeviceGray")
    assert(im.bitsPerComponent === 8)
  }

  test("XLBox (64-bit length) and length-to-EOF boxes still reach jp2h") {
    val jp2 = Jp2Header.buildJp2(100, 50, 3, 8)
    // rewrite the ftyp box (at offset 12) into XLBox form: len0 = 1,
    // type, then the 64-bit length — parser must skip it correctly
    val ftypLen = ((jp2(12) & 0xff) << 24) | ((jp2(13) & 0xff) << 16) |
      ((jp2(14) & 0xff) << 8) | (jp2(15) & 0xff)
    val body = jp2.slice(20, 12 + ftypLen)     // ftyp payload
    val out = new java.io.ByteArrayOutputStream()
    out.write(jp2, 0, 12)                      // signature box
    def be32(v: Long): Unit = {
      out.write(((v >> 24) & 0xff).toInt); out.write(((v >> 16) & 0xff).toInt)
      out.write(((v >> 8) & 0xff).toInt); out.write((v & 0xff).toInt)
    }
    be32(1L)                                   // len0 == 1 -> XLBox
    out.write("ftyp".getBytes, 0, 4)
    be32(0L); be32(16L + body.length)          // 64-bit XLBox length
    out.write(body, 0, body.length)
    out.write(jp2, 12 + ftypLen, jp2.length - 12 - ftypLen)
    assert(Jp2Header.parse(out.toByteArray) ===
      Some(Jp2Header.Meta(100, 50, 3, 8)))

    // a truncated XLBox header: None, not a misparse
    assert(Jp2Header.parse(out.toByteArray.take(12 + 10)).isEmpty)

    // bpc 255 ("components differ") passes through as-is
    val varied = Jp2Header.buildJp2(8, 8, 2, 255)
    assert(Jp2Header.parse(varied) === Some(Jp2Header.Meta(8, 8, 2, 255)))
  }
}
