package graft.pipeline

import org.scalatest.funsuite.AnyFunSuite

/** CCITT Group 4 codec: randomized encode→decode round trips chosen
  * to force every coding mode (vertical ±0..3, horizontal with
  * terminating, makeup, and extended-makeup runs, pass), structural
  * table checks (prefix-freeness — the property a transcription typo
  * almost always breaks), known bit vectors, and the
  * malformed-input contract (None, never a half-decoded raster or a
  * hang).
  */
class CcittG4Spec extends AnyFunSuite {

  private def bitmap(w: Int, h: Int)(f: (Int, Int) => Boolean): Array[Byte] =
    Array.tabulate(w * h)(p => if (f(p % w, p / w)) 0.toByte else 255.toByte)

  private def roundTrip(px: Array[Byte], w: Int, h: Int, clue: String): Unit = {
    val enc = CcittG4.encode(px, w, h)
    val dec = CcittG4.decode(enc, w, h)
    assert(dec.isDefined, clue)
    assert(dec.get.toSeq === px.toSeq, clue)
  }

  test("round trip: dense random bitmaps (vertical/horizontal mix)") {
    val rnd = new scala.util.Random(350)
    for (trial <- 0 until 20) {
      val w = Seq(8, 13, 16, 31, 64, 200)(trial % 6)
      val h = 1 + rnd.nextInt(12)
      roundTrip(bitmap(w, h)((_, _) => rnd.nextBoolean()), w, h, s"trial $trial ${w}x$h")
    }
  }

  test("round trip: sparse bitmaps (long white runs, makeup codes)") {
    val rnd = new scala.util.Random(351)
    for (trial <- 0 until 10) {
      val w = 400 + rnd.nextInt(300)
      val h = 1 + rnd.nextInt(6)
      roundTrip(bitmap(w, h)((_, _) => rnd.nextInt(40) == 0), w, h, s"sparse $trial")
      roundTrip(bitmap(w, h)((_, _) => rnd.nextInt(40) != 0), w, h, s"dense $trial")
    }
  }

  test("round trip: runs past 2560 take repeated extended makeups") {
    val w = 6000
    roundTrip(bitmap(w, 2)((_, _) => false), w, 2, "all white 6000")
    roundTrip(bitmap(w, 2)((_, _) => true), w, 2, "all black 6000")
    roundTrip(bitmap(w, 2)((x, _) => x >= 3000), w, 2, "half/half 6000")
  }

  test("round trip: a 200k-wide line needs ~78 chained 2560-makeups") {
    roundTrip(bitmap(200000, 1)((_, _) => false), 200000, 1, "white 200k")
    roundTrip(bitmap(200000, 1)((x, _) => x < 100000), 200000, 1, "half 200k")
  }

  test("dense fax-width checkerboard decodes fast (monotone ref cursor)") {
    // 1728 wide (the T.4 default) x 64 rows, worst-case change density;
    // the cursor fix keeps this linear in changes — without it each of
    // the ~1728 modes/line rescans ~1728 reference entries
    val px = bitmap(1728, 64)((x, y) => (x + y) % 2 == 0)
    val t0 = System.nanoTime()
    roundTrip(px, 1728, 64, "1728 checker")
    val ms = (System.nanoTime() - t0) / 1e6
    assert(ms < 5000, s"dense decode took ${ms}ms")
  }

  test("round trip: edge shapes (single column, single row, checker)") {
    roundTrip(bitmap(1, 8)((_, y) => y % 2 == 0), 1, 8, "1 wide")
    roundTrip(bitmap(64, 1)((x, _) => x % 2 == 0), 64, 1, "1 tall checker")
    roundTrip(bitmap(16, 16)((x, y) => (x + y) % 2 == 0), 16, 16, "checker")
    roundTrip(bitmap(16, 16)((x, _) => x == 0), 16, 16, "black first col")
    roundTrip(bitmap(16, 16)((x, _) => x == 15), 16, 16, "black last col")
  }

  test("known vector: an all-white image is V0 per pixel-column walk") {
    // every line: b1 = columns, a1 = columns, V0 ("1") once per line?
    // No: one V0 per LINE (a1 = b1 = columns ends the line in one code)
    val enc = CcittG4.encode(bitmap(16, 3)((_, _) => false), 16, 3)
    // 3 rows x V0(1 bit) + EOFB(24 bits) = 27 bits => 4 bytes:
    // 111 000000000001 000000000001 0...
    assert(enc.length === 4)
    assert((enc(0) & 0xff) === Integer.parseInt("11100000", 2))
    assert((enc(1) & 0xff) === Integer.parseInt("00000010", 2))
    assert((enc(2) & 0xff) === Integer.parseInt("00000000", 2))
    assert((enc(3) & 0xff) === Integer.parseInt("00100000", 2))
  }

  test("run tables are prefix-free within each color (incl. mode codes)") {
    def prefixFree(codes: Seq[String], clue: String): Unit =
      for (a <- codes; b <- codes if a != b)
        assert(!b.startsWith(a), s"$clue: $a prefixes $b")
    val modes = Seq("1", "011", "010", "001", "0001",
      "000011", "000010", "0000011", "0000010", "000000000001")
    prefixFree(modes, "modes")
    for (black <- Seq(false, true)) {
      val t = CcittG4.runTable(black)
      assert(t.map(_._1).distinct.size === t.size, "duplicate runs")
      assert(t.size === 64 + 27 + 13)  // terminating + makeup + extended
      prefixFree(t.map(_._2), s"black=$black")
    }
  }

  test("malformed input: None, not a crash or a stall") {
    assert(CcittG4.decode(null, 16, 16).isEmpty)
    assert(CcittG4.decode(Array.empty[Byte], 16, 16).isEmpty)
    assert(CcittG4.decode(Array.fill(64)(0x55.toByte), 16, 16).isEmpty
      || CcittG4.decode(Array.fill(64)(0x55.toByte), 16, 16).get.length == 256)
    // truncated valid payload: the missing rows fail the decode
    val full = CcittG4.encode(bitmap(64, 8)((x, y) => (x * y) % 3 == 0), 64, 8)
    assert(CcittG4.decode(full.take(2), 64, 8).isEmpty)
    // random garbage across seeds: never hangs, never throws
    val rnd = new scala.util.Random(352)
    for (_ <- 0 until 50) {
      val junk = Array.fill(40)(rnd.nextInt(256).toByte)
      CcittG4.decode(junk, 32, 32)  // must terminate; result may be anything
    }
    assert(CcittG4.decode(Array[Byte](1, 2, 3), 0, 4).isEmpty)
    assert(CcittG4.decode(Array[Byte](1, 2, 3), -4, 4).isEmpty)
  }

  private def roundTripG3(px: Array[Byte], w: Int, h: Int, k: Int,
      byteAlign: Boolean, clue: String): Unit = {
    val enc = CcittG4.encodeG3(px, w, h, k, byteAlign)
    val dec = CcittG4.decodeG3(enc, w, h, k, endOfLine = false,
      byteAlign = byteAlign)
    assert(dec.isDefined, clue)
    assert(dec.get.toSeq === px.toSeq, clue)
  }

  test("G3 round trips: 1D lines, mixed 2D, byte-aligned variants") {
    val rnd = new scala.util.Random(360)
    for (trial <- 0 until 12) {
      val w = Seq(8, 16, 33, 200)(trial % 4)
      val h = 2 + rnd.nextInt(10)
      val px = bitmap(w, h)((_, _) => rnd.nextInt(4) == 0)
      roundTripG3(px, w, h, 0, byteAlign = false, s"k0 $trial")
      roundTripG3(px, w, h, 0, byteAlign = true, s"k0 aligned $trial")
      roundTripG3(px, w, h, 4, byteAlign = false, s"k4 $trial")
      roundTripG3(px, w, h, 2, byteAlign = true, s"k2 aligned $trial")
    }
    // black-first lines exercise the zero-length leading white run
    roundTripG3(bitmap(16, 4)((x, _) => x < 4), 16, 4, 0, byteAlign = false, "black lead")
    roundTripG3(bitmap(16, 4)((_, _) => true), 16, 4, 4, byteAlign = false, "all black")
    roundTripG3(bitmap(16, 4)((_, _) => false), 16, 4, 0, byteAlign = false, "all white")
  }

  test("G3 malformed input: None, never a stall or a misparse") {
    assert(CcittG4.decodeG3(null, 16, 16, 0).isEmpty)
    assert(CcittG4.decodeG3(Array[Byte](1, 2), 16, 16, -1).isEmpty)
    // K>0 requires EOLs: a payload without them fails
    val noEol = CcittG4.encodeG3(bitmap(16, 4)((x, y) => (x + y) % 2 == 0), 16, 4, 0)
    assert(CcittG4.decodeG3(noEol, 16, 4, 4).isEmpty)
    val rnd = new scala.util.Random(361)
    for (_ <- 0 until 30)
      CcittG4.decodeG3(Array.fill(40)(rnd.nextInt(256).toByte), 32, 32, 0)
  }

  test("ccittPdf G3 legs: /K 0 and /K 4 extract the formula pixels too") {
    for (id <- Seq(1L, 3L, 5L, 7L)) {          // 1,5 ⇒ K0; 3,7 ⇒ K4
      val imgs = PdfImages.extract(PdfGen.ccittPdf(id))
      assert(imgs.size === 1, s"doc $id")
      assert(imgs.head.codec === "raw", s"doc $id")
      val expected = Array.tabulate(256) { p =>
        val black =
          graft.operators.Sampling.hashBitsScalar(id * 256L + p, 350L) % 2L == 1L
        if (black) 0 else 255
      }
      assert(imgs.head.data.map(_ & 0xff).toSeq === expected.toSeq, s"doc $id")
    }
  }

  test("ccittPdf: the G4 scan extracts as real gray pixels end-to-end") {
    for (id <- 0L to 3L) {
      val imgs = PdfImages.extract(PdfGen.ccittPdf(id))
      assert(imgs.size === 1, s"doc $id")
      val im = imgs.head
      assert(im.codec === "raw")
      assert((im.width, im.height, im.bitsPerComponent) === ((16, 16, 8)))
      assert(im.colorSpace === "DeviceGray")
      val expected = Array.tabulate(256) { p =>
        val black =
          graft.operators.Sampling.hashBitsScalar(id * 256L + p, 350L) % 2L == 1L
        if (black) 0 else 255
      }
      assert(im.data.map(_ & 0xff).toSeq === expected.toSeq, s"doc $id")
      assert(PdfImages.lumaGrid(im).isDefined)
    }
  }

  test("G3 (/K >= 0) stays payload passthrough — no misparse as G4") {
    val doc = PdfGen.ccittPdf(0L)
    val s = new String(doc, java.nio.charset.StandardCharsets.ISO_8859_1)
    val g3 = s.replace("/K -1", "/K 0")
    val imgs = PdfImages.extract(g3.getBytes(java.nio.charset.StandardCharsets.ISO_8859_1))
    assert(imgs.size === 1)
    assert(imgs.head.codec === "ccitt")
    assert(PdfImages.lumaGrid(imgs.head).isEmpty)
  }

  test("G4 /EncodedByteAlign: per-row byte alignment round-trips") {
    val rnd = new scala.util.Random(3616)
    for (trial <- 0 until 10) {
      val w = Seq(8, 13, 16, 31)(trial % 4)
      val h = 1 + rnd.nextInt(8)
      val px = bitmap(w, h)((_, _) => rnd.nextBoolean())
      val enc = CcittG4.encode(px, w, h, byteAlign = true)
      assert(CcittG4.decode(enc, w, h, byteAlign = true).isDefined, s"trial $trial")
      assert(CcittG4.decode(enc, w, h, byteAlign = true).get.toSeq === px.toSeq,
        s"trial $trial")
      // regression pin: the unaligned path is untouched
      val plain = CcittG4.encode(px, w, h)
      assert(CcittG4.decode(plain, w, h).get.toSeq === px.toSeq, s"trial $trial")
    }
  }

  test("ccittPdf byte-aligned G4 leg (docId % 4 == 2) extracts the formula pixels") {
    for (id <- Seq(2L, 6L)) {
      val imgs = PdfImages.extract(PdfGen.ccittPdf(id))
      assert(imgs.size === 1, s"doc $id")
      assert(imgs.head.codec === "raw", s"doc $id")
      val expected = Array.tabulate(256) { p =>
        val black =
          graft.operators.Sampling.hashBitsScalar(id * 256L + p, 350L) % 2L == 1L
        if (black) 0 else 255
      }
      assert(imgs.head.data.map(_ & 0xff).toSeq === expected.toSeq, s"doc $id")
    }
  }

  test("horizontal mode with a zero-length run mid-line: rejected, not misparsed") {
    // hand-assembled G4 single line, columns = 8:
    // H(001) white3(1000) black2(11)        -> a0 = 5
    // H(001) white0(00110101) black2(11)    -> zero-length run MID-line
    val bits = "001" + "1000" + "11" + "001" + "00110101" + "11"
    val padded = bits + "0" * ((8 - bits.length % 8) % 8)
    val data = padded.grouped(8).map(s => Integer.parseInt(s, 2).toByte).toArray
    assert(CcittG4.decode(data, 8, 1).isEmpty)
    // the LEGAL zero-length case — line starting black — still decodes:
    // H(001) white0(00110101) black3(10) white5(1100) -> a0 = 8 = columns
    val ok = "001" + "00110101" + "10" + "1100"
    val okPad = ok + "0" * ((8 - ok.length % 8) % 8)
    val okData = okPad.grouped(8).map(s => Integer.parseInt(s, 2).toByte).toArray
    val dec = CcittG4.decode(okData, 8, 1)
    assert(dec.isDefined)
    assert(dec.get.toSeq === Seq[Byte](0, 0, 0, -1, -1, -1, -1, -1))
  }

  test("q350 corpus sweep: 600 formula fixtures round-trip bit-exactly") {
    // all four fax legs (G4, G3-1D, byte-aligned G4, G3 mixed) at
    // beyond-driver scale — this sweep is what caught the r15-ADVICE
    // zero-run guard over-rejecting the legal r2 == 0 line-end shape
    for (id <- 0L until 600L) {
      val imgs = PdfImages.extract(PdfGen.ccittPdf(id))
      assert(imgs.size === 1, s"doc $id")
      assert(imgs.head.codec === "raw", s"doc $id")
      val expected = Array.tabulate(256) { p =>
        val black =
          graft.operators.Sampling.hashBitsScalar(id * 256L + p, 350L) % 2L == 1L
        if (black) 0 else 255
      }
      assert(imgs.head.data.map(_ & 0xff).toSeq === expected.toSeq, s"doc $id")
    }
  }
}
