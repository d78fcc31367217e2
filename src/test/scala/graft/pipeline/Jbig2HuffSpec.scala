package graft.pipeline

import org.scalatest.funsuite.AnyFunSuite

/** JBIG2 HUFFMAN mode (SDHUFF=1 / SBHUFF=1, T.88 Annex B standard
  * tables): randomized encode→decode round trips across glyph sets,
  * strip modes, corners, and both collective-bitmap shapes
  * (uncompressed + MMR), equivalence with the arithmetic-mode result
  * for the same page, and the decline contract for selector values
  * outside the standard-table subset.
  */
class Jbig2HuffSpec extends AnyFunSuite {

  private def glyphs(rnd: scala.util.Random, n: Int): Seq[(Int, Int, Array[Byte])] =
    (0 until n).map { _ =>
      val w = 2 + rnd.nextInt(6)
      val h = 2 + rnd.nextInt(6)
      // never all-zero: an all-white glyph would round-trip but makes
      // the expected-page assert below trivially weak
      val px = Array.tabulate(w * h)(_ => if (rnd.nextBoolean()) 1.toByte else 0.toByte)
      px(rnd.nextInt(px.length)) = 1
      (w, h, px)
    }

  private def expectedPage(
      w: Int, h: Int,
      syms: Seq[(Int, Int, Array[Byte])],
      placements: Seq[(Int, Int, Int)]): Array[Byte] = {
    val page = new Array[Byte](w * h)
    for ((si, x, y) <- placements) {
      val (sw, sh, px) = syms(si)
      for (yy <- 0 until sh; xx <- 0 until sw)
        if (y + yy < h && x + xx < w && px(yy * sw + xx) != 0)
          page((y + yy) * w + (x + xx)) = 1
    }
    page
  }

  test("huffman text pages round-trip across strips, corners, collective modes") {
    val rnd = new scala.util.Random(358)
    for (trial <- 0 until 24) {
      val w = 24 + rnd.nextInt(40)
      val h = 24 + rnd.nextInt(40)
      val syms = glyphs(rnd, 1 + rnd.nextInt(7))
      val placements = (0 until 1 + rnd.nextInt(12)).map { _ =>
        val si = rnd.nextInt(syms.size)
        (si, rnd.nextInt(w - 8), rnd.nextInt(h - 8))
      }
      val logStrips = rnd.nextInt(3)
      val refCorner = rnd.nextInt(2)
      val mmr = rnd.nextBoolean()
      val globalsSep = rnd.nextBoolean()
      val (stream, globals) = Jbig2.encodeTextHuff(w, h, syms, placements,
        separateGlobals = globalsSep, logStrips = logStrips,
        refCorner = refCorner, mmrCollective = mmr)
      val dec = Jbig2.decode(stream, globals)
      assert(dec.isDefined,
        s"trial $trial strips=$logStrips corner=$refCorner mmr=$mmr sep=$globalsSep")
      val (dw, dh, px) = dec.get
      assert((dw, dh) === ((w, h)), s"trial $trial")
      assert(px.toSeq === expectedPage(w, h, syms, placements).toSeq,
        s"trial $trial strips=$logStrips corner=$refCorner mmr=$mmr")
    }
  }

  test("huffman mode decodes the SAME page the arithmetic mode does") {
    val rnd = new scala.util.Random(359)
    for (_ <- 0 until 8) {
      val syms = glyphs(rnd, 4)
      val placements = (0 until 6).map(k => (k % 4, (k % 3) * 9, (k / 3) * 9))
      val (aStream, _) = Jbig2.encodeText(32, 32, syms, placements)
      val (hStream, _) = Jbig2.encodeTextHuff(32, 32, syms, placements)
      val a = Jbig2.decode(aStream)
      val hd = Jbig2.decode(hStream)
      assert(a.isDefined && hd.isDefined)
      assert(a.get._3.toSeq === hd.get._3.toSeq)
    }
  }

  test("out-of-subset selectors decline cleanly, never misparse") {
    val syms = Seq((4, 4, Array.fill(16)(1.toByte)))
    val placements = Seq((0, 2, 2), (0, 9, 9))
    val (stream, _) = Jbig2.encodeTextHuff(20, 20, syms, placements)

    // flip the DICTIONARY's selector bits to "custom table" (3):
    // dict segment data starts at offset 11 (header) — flags are its
    // first two bytes (big-endian); set SDHUFFDH = 3
    val badDict = stream.clone()
    badDict(12) = (badDict(12) | (3 << 2)).toByte
    assert(Jbig2.decode(badDict).isEmpty, "custom-DH dictionary must decline")

    // SDHUFFBMSIZE = 1 (custom) declines too
    val badBm = stream.clone()
    badBm(12) = (badBm(12) | (1 << 6)).toByte
    assert(Jbig2.decode(badBm).isEmpty)

    // truncations: bounded decline, no spin, no partial page
    for (cut <- 12 until stream.length by 7) {
      val t0 = System.nanoTime()
      Jbig2.decode(stream.take(cut))
      assert((System.nanoTime() - t0) / 1e9 < 5.0, s"cut $cut too slow")
    }
  }

  test("huffman dictionaries feed ARITHMETIC text regions via globals and back") {
    // mixed-mode stream: a huffman dict + huffman text region through
    // the PDF globals split exercises the dict hand-off across walks
    val rnd = new scala.util.Random(360)
    val syms = glyphs(rnd, 5)
    val placements = (0 until 8).map(k => (k % 5, (k % 4) * 7, (k / 4) * 7))
    val (stream, globals) = Jbig2.encodeTextHuff(30, 16, syms, placements,
      separateGlobals = true, mmrCollective = true)
    assert(globals.nonEmpty)
    val dec = Jbig2.decode(stream, globals)
    assert(dec.isDefined)
    assert(dec.get._3.toSeq ===
      expectedPage(30, 16, syms, placements).toSeq)
    // and the globals alone (no text region) decode nothing
    assert(Jbig2.decode(globals).isEmpty)
  }

  test("striped pages compose identically to their unstriped twin") {
    val rnd = new scala.util.Random(361)
    for (trial <- 0 until 12) {
      val w = 16 + rnd.nextInt(48)
      val h = 16 + rnd.nextInt(48)
      val px = Array.tabulate(w * h)(_ =>
        if (rnd.nextInt(4) == 0) 1.toByte else 0.toByte)
      val stripeH = 1 + rnd.nextInt(h + 4)    // incl. stripes > h and = 1
      val striped = Jbig2.decode(Jbig2.encodeStriped(px, w, h, stripeH))
      val plain = Jbig2.decode(Jbig2.encode(px, w, h))
      assert(striped.isDefined && plain.isDefined, s"trial $trial stripe=$stripeH")
      assert(striped.get._1 == w && striped.get._2 == h,
        s"trial $trial stripe=$stripeH dims ${striped.get._1}x${striped.get._2}")
      assert(striped.get._3.toSeq === plain.get._3.toSeq,
        s"trial $trial stripe=$stripeH")
    }
    // a trailing all-white stripe: regions end short, the
    // end-of-stripe row must still pin the full height
    val w = 20; val h = 24
    val px = new Array[Byte](w * h)
    px(5 * w + 3) = 1                        // content only in the first stripe
    val dec = Jbig2.decode(Jbig2.encodeStriped(px, w, h, 8))
    assert(dec.isDefined && dec.get._2 == h, s"got ${dec.map(_._2)}")
    assert(dec.get._3.toSeq === px.toSeq)

    // truncated striped streams decline or return a prefix-composed
    // page, never throw
    val full = Jbig2.encodeStriped(px, w, h, 8)
    for (cut <- 12 until full.length by 11) Jbig2.decode(full.take(cut))
  }
}
