package graft.pipeline

import org.scalatest.funsuite.AnyFunSuite

/** JBIG2 MQ-coder + generic-region codec: randomized encode→decode
  * round trips across densities and shapes (the MQ state machine
  * walks its 47 states only under varied symbol statistics), segment-
  * layer structure, the out-of-subset contract (None, never a
  * misparse), and the PDF end-to-end path.
  */
class Jbig2Spec extends AnyFunSuite {

  private def bitmap(w: Int, h: Int)(f: (Int, Int) => Boolean): Array[Byte] =
    Array.tabulate(w * h)(p => if (f(p % w, p / w)) 1.toByte else 0.toByte)

  private def roundTrip(px: Array[Byte], w: Int, h: Int, clue: String): Unit = {
    for ((tp, mmr) <- Seq((false, false), (true, false), (false, true))) {
      val enc = Jbig2.encode(px, w, h, tpgdon = tp, mmr = mmr)
      val dec = Jbig2.decode(enc)
      assert(dec.isDefined, s"$clue tpgdon=$tp mmr=$mmr")
      val (dw, dh, out) = dec.get
      assert((dw, dh) === ((w, h)), s"$clue tpgdon=$tp mmr=$mmr")
      assert(out.toSeq === px.toSeq, s"$clue tpgdon=$tp mmr=$mmr")
    }
    // GBTEMPLATE 1-3 (r17): the smaller contexts round-trip the same
    // pixels, plain and TPGDON
    for (template <- 1 to 3; tp <- Seq(false, true)) {
      val enc = Jbig2.encode(px, w, h, tpgdon = tp, template = template)
      val dec = Jbig2.decode(enc)
      assert(dec.isDefined, s"$clue template=$template tpgdon=$tp")
      assert(dec.get._3.toSeq === px.toSeq, s"$clue template=$template tpgdon=$tp")
    }
  }

  test("TPGDON: repeated scanlines cost a decision, not a row") {
    // horizontal banding: rows repeat in runs of 8
    val px = bitmap(256, 64)((x, y) => ((y / 8) + (x / 16)) % 2 == 0)
    val plain = Jbig2.encode(px, 256, 64, tpgdon = false).length
    val tp = Jbig2.encode(px, 256, 64, tpgdon = true).length
    assert(tp < plain, s"tpgdon $tp vs plain $plain")
    // an all-white page is almost free under typical prediction:
    // the 67 bytes of segment/region headers plus a few MQ bytes
    val blank = bitmap(512, 128)((_, _) => false)
    assert(Jbig2.encode(blank, 512, 128, tpgdon = true).length < 80)
  }

  test("round trip: random bitmaps across densities and sizes") {
    val rnd = new scala.util.Random(352)
    for (trial <- 0 until 24) {
      val w = Seq(8, 13, 16, 33, 64, 128)(trial % 6)
      val h = 1 + rnd.nextInt(24)
      val density = Seq(0.5, 0.05, 0.95, 0.002)(trial % 4)
      roundTrip(bitmap(w, h)((_, _) => rnd.nextDouble() < density),
        w, h, s"trial $trial ${w}x$h d=$density")
    }
  }

  test("round trip: pathological shapes (all-white, all-black, checker, edges)") {
    roundTrip(bitmap(64, 64)((_, _) => false), 64, 64, "white")
    roundTrip(bitmap(64, 64)((_, _) => true), 64, 64, "black")
    roundTrip(bitmap(63, 17)((x, y) => (x + y) % 2 == 0), 63, 17, "checker")
    roundTrip(bitmap(1, 64)((_, y) => y % 3 == 0), 1, 64, "1 wide")
    roundTrip(bitmap(256, 1)((x, _) => x % 5 < 2), 256, 1, "1 tall")
    roundTrip(bitmap(16, 16)((x, _) => x == 0), 16, 16, "left edge")
    roundTrip(bitmap(16, 16)((x, _) => x == 15), 16, 16, "right edge")
  }

  test("round trip: text-like structure (the statistics JBIG2 is built for)") {
    // glyph-ish blobs: dense clusters on a sparse page
    val rnd = new scala.util.Random(353)
    val w = 200; val h = 50
    val px = new Array[Byte](w * h)
    for (_ <- 0 until 40) {
      val cx = rnd.nextInt(w - 6); val cy = rnd.nextInt(h - 8)
      for (dy <- 0 until 8; dx <- 0 until 6)
        if (rnd.nextInt(3) > 0) px((cy + dy) * w + (cx + dx)) = 1
    }
    roundTrip(px, w, h, "glyph blobs")
    // and it should actually compress it
    assert(Jbig2.encode(px, w, h).length < w * h / 8)
  }

  test("segment layer: headers parse, unknown segment types are skipped") {
    val px = bitmap(16, 16)((x, y) => (x * y) % 3 == 0)
    val enc = Jbig2.encode(px, 16, 16)
    // page info (type 48) precedes the region and must be skipped
    assert((enc(4) & 0x3f) === 48)
    assert(Jbig2.decode(enc).isDefined)
    // truncated: the region data length overruns -> None
    assert(Jbig2.decode(enc.take(enc.length - 3)).isEmpty)
    assert(Jbig2.decode(enc.take(8)).isEmpty)
    assert(Jbig2.decode(Array.empty[Byte]).isEmpty)
    assert(Jbig2.decode(null).isEmpty)
  }

  test("out-of-subset streams decline: MMR, TPGDON, non-nominal ATs") {
    val px = bitmap(16, 16)((x, _) => x < 8)
    val enc = Jbig2.encode(px, 16, 16)
    // generic flags byte sits right after the 17-byte region info of
    // the SECOND segment; find it by re-parsing the layout we emit:
    // seg0 header(11) + page(19) + seg1 header(11) + region info(17)
    val gflagsAt = 11 + 19 + 11 + 17
    // flipping the coding-mode bit hands MQ bytes to the T.6 decoder
    // (MMR is a SUPPORTED mode now): corrupt codes must fail or
    // differ, never silently match
    val mmr = enc.clone(); mmr(gflagsAt) = (mmr(gflagsAt) | 1).toByte
    assert(Jbig2.decode(mmr).forall(_._3.toSeq != px.toSeq))
    // r17: GBTEMPLATE 1 is a SUPPORTED mode now — flipping the
    // template bit on a template-0 stream misreads the AT layout and
    // payload: must fail or differ, never silently match
    val tmpl = enc.clone(); tmpl(gflagsAt) = (tmpl(gflagsAt) | 2).toByte
    assert(Jbig2.decode(tmpl).forall(_._3.toSeq != px.toSeq))
    val at = enc.clone(); at(gflagsAt + 1) = 5
    assert(Jbig2.decode(at).isEmpty)
    // random garbage never throws or hangs
    val rnd = new scala.util.Random(354)
    for (_ <- 0 until 50)
      Jbig2.decode(Array.fill(64)(rnd.nextInt(256).toByte))
  }

  test("jbig2Pdf: the scan extracts as real gray pixels end-to-end") {
    for (id <- 0L to 3L) {
      val imgs = PdfImages.extract(PdfGen.jbig2Pdf(id))
      assert(imgs.size === 1, s"doc $id")
      val im = imgs.head
      assert(im.codec === "raw")
      assert((im.width, im.height, im.bitsPerComponent) === ((16, 16, 8)))
      val expected = Array.tabulate(256) { p =>
        val black =
          graft.operators.Sampling.hashBitsScalar(id * 256L + p, 352L) % 2L == 1L
        if (black) 0 else 255
      }
      assert(im.data.map(_ & 0xff).toSeq === expected.toSeq, s"doc $id")
      assert(PdfImages.lumaGrid(im).isDefined)
    }
    // routing: image-only JBIG2 scan goes to the image leg
    assert(AutoPartitioner(TextPartitioner())
      .partitionWithPath(PdfGen.jbig2Pdf(0L), PartitionStrategy.OcrOnly)._2 ===
      ExtractPath.PdfImage)
  }

  test("JBIG2 beats G4 on glyph-like content (the reason scanners use it)") {
    val rnd = new scala.util.Random(355)
    val w = 400; val h = 60
    val bits = new Array[Byte](w * h)
    for (_ <- 0 until 120) {
      val cx = rnd.nextInt(w - 6); val cy = rnd.nextInt(h - 8)
      for (dy <- 0 until 8; dx <- 0 until 6)
        if (rnd.nextInt(3) > 0) bits((cy + dy) * w + (cx + dx)) = 1
    }
    val jb = Jbig2.encode(bits, w, h).length
    val g4 = CcittG4.encode(bits.map(b => if (b != 0) 0.toByte else 255.toByte), w, h).length
    assert(jb < g4, s"jbig2 $jb vs g4 $g4")
  }

  test("q352 corpus sweep: 600 formula fixtures round-trip bit-exactly") {
    // the driver-gate corpus at beyond-driver scale: every coding mode
    // (plain MQ, TPGDON, MMR) across 600 ids — this sweep is what
    // caught the r15-ADVICE flush-to-zeros variant breaking 5/500
    // streams (the decoder pads past the payload with 0xFF, so the
    // encoder flush must leave trailing ONES)
    for (id <- 0L until 600L) {
      val imgs = PdfImages.extract(PdfGen.jbig2Pdf(id))
      assert(imgs.size === 1, s"doc $id")
      assert(imgs.head.codec === "raw", s"doc $id")
      val expected = Array.tabulate(256) { p =>
        val black =
          graft.operators.Sampling.hashBitsScalar(id * 256L + p, 352L) % 2L == 1L
        if (black) 0 else 255
      }
      assert(imgs.head.data.map(_ & 0xff).toSeq === expected.toSeq, s"doc $id")
    }
  }

  test("symbol/text round trip: random glyphs, multiple height classes") {
    val rnd = new scala.util.Random(356)
    for (trial <- 0 until 12) {
      val nSyms = 1 + rnd.nextInt(6)
      val syms = (0 until nSyms).map { _ =>
        val sw = 2 + rnd.nextInt(6)
        val sh = 2 + rnd.nextInt(6)
        (sw, sh, Array.tabulate(sw * sh)(_ =>
          if (rnd.nextBoolean()) 1.toByte else 0.toByte))
      }
      val W = 64; val H = 48
      // non-overlapping grid placements so expected pixels compose by OR
      val placements = (for (cy <- 0 until 4; cx <- 0 until 6
          if rnd.nextInt(3) > 0) yield
        (rnd.nextInt(nSyms), cx * 10, cy * 10)).toSeq
      val expected = new Array[Byte](W * H)
      for ((k, x, y) <- placements; (sw, sh, px) = syms(k);
           dy <- 0 until sh; dx <- 0 until sw)
        if (px(dy * sw + dx) == 1 && y + dy < H && x + dx < W)
          expected((y + dy) * W + (x + dx)) = 1
      for (sepGlobals <- Seq(false, true)) {
        val (stream, globals) =
          Jbig2.encodeText(W, H, syms, placements, separateGlobals = sepGlobals)
        val dec = Jbig2.decode(stream, globals)
        assert(dec.isDefined, s"trial $trial sep=$sepGlobals")
        val (dw, dh, px) = dec.get
        assert((dw, dh) === ((W, H)), s"trial $trial")
        assert(px.toSeq === expected.toSeq, s"trial $trial sep=$sepGlobals")
      }
    }
  }

  test("jbig2TextPdf corpus sweep: 400 symbol-coded fixtures, both layouts") {
    // odd ids route the dictionary through /JBIG2Globals, even ids
    // embed it — identical pixels either way, pinned to the formulas
    def hv(n: Long, salt: Long) = graft.operators.Sampling.hashBitsScalar(n, salt)
    for (id <- 0L until 400L) {
      val imgs = PdfImages.extract(PdfGen.jbig2TextPdf(id))
      assert(imgs.size === 1, s"doc $id")
      assert(imgs.head.codec === "raw", s"doc $id")
      val expected = Array.tabulate(256) { p =>
        val cell = (p / 16 / 4) * 4 + (p % 16) / 4
        val k = hv(id * 16L + cell, 357L) % 4L
        val sp = ((p / 16) % 4) * 4 + (p % 16) % 4
        if (hv(k * 16L + sp, 356L) % 2L == 1L) 0 else 255
      }
      assert(imgs.head.data.map(_ & 0xff).toSeq === expected.toSeq, s"doc $id")
    }
  }

  test("out-of-subset dictionaries skip cleanly; dangling refs decline") {
    val syms = Seq((4, 4, Array.fill(16)(1.toByte)))
    val (stream, globals) = Jbig2.encodeText(16, 16, syms, Seq((0, 0, 0)),
      separateGlobals = true)
    // text region without its dictionary: None, no crash
    assert(Jbig2.decode(stream).isEmpty)
    // corrupt the globals dictionary flags to SDHUFF=1: the dict is
    // skipped (out of subset), the region then declines
    val segDataOff = 11                      // header: 4 num + 1 flags + 1 ref + 1 page + 4 len
    val huff = globals.clone()
    huff(segDataOff + 1) = (huff(segDataOff + 1) | 1).toByte
    assert(Jbig2.decode(stream, huff).isEmpty)
    // intact globals still decode (guard the guard)
    assert(Jbig2.decode(stream, globals).isDefined)
  }

  test("multi-region page: regions OR-composite at their (x, y) offsets") {
    val rnd = new scala.util.Random(358)
    for (trial <- 0 until 6) {
      val (pw, ph) = (40, 30)
      val regions = (0 until 2 + rnd.nextInt(3)).map { _ =>
        val w = 4 + rnd.nextInt(10); val h = 4 + rnd.nextInt(8)
        val x = rnd.nextInt(pw - w); val y = rnd.nextInt(ph - h)
        (x, y, w, h, Array.tabulate(w * h)(_ =>
          if (rnd.nextBoolean()) 1.toByte else 0.toByte))
      }
      val expected = new Array[Byte](pw * ph)
      for ((x, y, w, h, px) <- regions; dy <- 0 until h; dx <- 0 until w)
        if (px(dy * w + dx) == 1) expected((y + dy) * pw + (x + dx)) = 1
      val dec = Jbig2.decode(Jbig2.encodeRegions(pw, ph, regions))
      assert(dec.isDefined, s"trial $trial")
      val (dw, dh, px) = dec.get
      assert((dw, dh) === ((pw, ph)), s"trial $trial")
      assert(px.toSeq === expected.toSeq, s"trial $trial")
    }
  }

  test("text regions: SBSTRIPS > 1 (IAIT) and BOTTOMLEFT corners round-trip") {
    val rnd = new scala.util.Random(359)
    for (logStrips <- Seq(1, 2); refCorner <- Seq(0, 1)) {
      val syms = (0 until 3).map { _ =>
        val sw = 3 + rnd.nextInt(4); val sh = 3 + rnd.nextInt(4)
        (sw, sh, Array.tabulate(sw * sh)(_ =>
          if (rnd.nextBoolean()) 1.toByte else 0.toByte))
      }
      val W = 60; val H = 40
      // top-left placements at arbitrary (not strip-aligned) rows
      val placements = (for (i <- 0 until 8) yield
        (rnd.nextInt(3), 2 + i * 7, 1 + rnd.nextInt(H - 10))).toSeq
      val expected = new Array[Byte](W * H)
      for ((k, x, y) <- placements; (sw, sh, px) = syms(k);
           dy <- 0 until sh; dx <- 0 until sw)
        if (px(dy * sw + dx) == 1 && y + dy < H && x + dx < W)
          expected((y + dy) * W + (x + dx)) = 1
      val (stream, _) = Jbig2.encodeText(W, H, syms, placements,
        logStrips = logStrips, refCorner = refCorner)
      val dec = Jbig2.decode(stream)
      assert(dec.isDefined, s"logStrips=$logStrips corner=$refCorner")
      assert(dec.get._3.toSeq === expected.toSeq,
        s"logStrips=$logStrips corner=$refCorner")
    }
  }

  test("review pins: 70-region pages compose fully; truncation never hangs") {
    // guard must not silently truncate a many-region page
    val rnd = new scala.util.Random(360)
    val regions = (0 until 70).map { k =>
      val px = Array.tabulate(9)(_ => if (rnd.nextBoolean()) 1.toByte else 0.toByte)
      ((k % 10) * 4, (k / 10) * 4, 3, 3, px)
    }
    val expected = new Array[Byte](40 * 28)
    for ((x, y, w, h, px) <- regions; dy <- 0 until h; dx <- 0 until w)
      if (px(dy * w + dx) == 1) expected((y + dy) * 40 + (x + dx)) = 1
    val dec = Jbig2.decode(Jbig2.encodeRegions(40, 28, regions))
    assert(dec.isDefined)
    assert(dec.get._3.toSeq === expected.toSeq)

    // truncated symbol dictionaries/regions: None (bounded), no spin
    val syms = (0 until 3).map(k =>
      (4, 4, Array.tabulate(16)(p => ((p + k) % 2).toByte)))
    val (stream, _) = Jbig2.encodeText(16, 16, syms,
      Seq((0, 0, 0), (1, 4, 4), (2, 8, 8)))
    for (cut <- 12 until stream.length by 3) {
      val t0 = System.nanoTime()
      Jbig2.decode(stream.take(cut))          // must return, rarely Some
      assert((System.nanoTime() - t0) / 1e9 < 5.0, s"cut $cut too slow")
    }
  }

  test("r16 ADVICE pins: page-dim overflow declines; huge A.2 values reject") {
    // page info with pw = ph = 0xFFFF0000: the Long product wraps
    // positive-small, so a product-only cap would pass and the page
    // allocation would throw — per-dimension bounds must decline it
    // (and the stream, holding a lone 1x1 region, then falls back to
    // first-region mode rather than crashing the task)
    def be32(b: scala.collection.mutable.ArrayBuffer[Byte], v: Long): Unit = {
      b += ((v >> 24) & 0xff).toByte; b += ((v >> 16) & 0xff).toByte
      b += ((v >> 8) & 0xff).toByte; b += (v & 0xff).toByte
    }
    val good = Jbig2.encode(Array[Byte](1), 1, 1)
    // patch the page-info segment's dims in place: encode() writes
    // page info as segment 0 (header 11 bytes, then w at +11, h at +15)
    val hostile = good.clone()
    val b = new scala.collection.mutable.ArrayBuffer[Byte]()
    be32(b, 0xFFFF0000L); be32(b, 0xFFFF0000L)
    for (k <- b.indices) hostile(11 + k) = b(k)
    val dec = Jbig2.decode(hostile)           // must not throw
    dec.foreach { case (w, h, px) =>
      assert(w == 1 && h == 1 && px.length == 1)
    }

    // A.2 integer coder: Int-range values round trip exactly; values
    // ≥ 2^31 (the 32-bit tail reaches 2^32 + 4435) are REJECTED, not
    // .toInt-aliased into small valid-looking deltas
    val legal = Seq(0L, 3L, 4L, 19L, 20L, 83L, 84L, 339L, 340L, 4435L,
      4436L, 100000L, Int.MaxValue.toLong - 1, -1L, -4436L,
      -(Int.MaxValue.toLong - 1))
    assert(Jbig2.intCodingRoundTrip(legal) === legal.map(v => Some(v.toInt)))
    // magnitude ≥ 2^31 − 1 must decline: ≥ 2^31 would .toInt-wrap,
    // and −(2^31 − 1) is the sentinel itself (−2^31 is OOB's wire
    // encoding, so the far-negative probe uses −(2^31 + 1))
    val hostileVals = Seq(Int.MaxValue.toLong, Int.MaxValue.toLong + 1,
      (1L << 32) - 1, (1L << 32) + 4435, -Int.MaxValue.toLong,
      -(Int.MaxValue.toLong + 2))
    assert(Jbig2.intCodingRoundTrip(hostileVals) === hostileVals.map(_ => None))
  }
}
