package graft.pipeline

import org.scalatest.funsuite.AnyFunSuite

/** JBIG2 refinement coding (SDREFAGG=1, §6.3 — BOTH refinement
  * templates since r17): refined dictionary chains round-trip
  * pixel-exactly across reference offsets, the globals split, and
  * GRTEMPLATE 0/1; multi-aggregate instances and non-nominal
  * refinement ATs stay skip-not-misparse. */
class Jbig2RefineSpec extends AnyFunSuite {

  private def glyph(rnd: scala.util.Random, w: Int, h: Int): (Int, Int, Array[Byte]) = {
    val px = Array.tabulate(w * h)(_ => if (rnd.nextBoolean()) 1.toByte else 0.toByte)
    px(rnd.nextInt(px.length)) = 1
    (w, h, px)
  }

  private def expected(
      w: Int, h: Int,
      all: Seq[(Int, Int, Array[Byte])],
      placements: Seq[(Int, Int, Int)]): Array[Byte] = {
    val page = new Array[Byte](w * h)
    for ((si, x, y) <- placements) {
      val (sw, sh, px) = all(si)
      for (yy <- 0 until sh; xx <- 0 until sw)
        if (y + yy < h && x + xx < w && px(yy * sw + xx) != 0)
          page((y + yy) * w + (x + xx)) = 1
    }
    page
  }

  test("refined dictionaries round-trip across offsets and globals split") {
    val rnd = new scala.util.Random(362)
    for (trial <- 0 until 16) {
      val w = 32 + rnd.nextInt(32)
      val h = 32 + rnd.nextInt(32)
      val base = (0 until 2 + rnd.nextInt(3)).map(_ =>
        glyph(rnd, 3 + rnd.nextInt(5), 3 + rnd.nextInt(5)))
      // refined targets: the base glyph with a few pixels flipped,
      // some at nonzero reference offsets, some with DIFFERENT dims
      val refined = (0 until 1 + rnd.nextInt(3)).map { _ =>
        val bi = rnd.nextInt(base.size)
        val (bw, bh, bpx) = base(bi)
        val (tw, th) =
          if (rnd.nextBoolean()) (bw, bh)
          else (1 + rnd.nextInt(7), 1 + rnd.nextInt(7))
        val t = Array.tabulate(tw * th) { p =>
          val v = if (p % bpx.length < bpx.length &&
            (p / tw) < bh && (p % tw) < bw) bpx((p / tw) * bw + (p % tw)) else 0
          (if (rnd.nextInt(5) == 0) 1 - v else v.toInt).toByte
        }
        (tw, th, t, bi, rnd.nextInt(3) - 1, rnd.nextInt(3) - 1)
      }
      val all = base ++ refined.map(r => (r._1, r._2, r._3))
      val placements = (0 until 4 + rnd.nextInt(8)).map { _ =>
        (rnd.nextInt(all.size), rnd.nextInt(w - 8), rnd.nextInt(h - 8))
      }
      val sep = rnd.nextBoolean()
      val rtemplate = rnd.nextInt(2)          // r17: template 0 decodes too
      val (stream, globals) = Jbig2.encodeTextRefined(
        w, h, base, refined, placements, separateGlobals = sep,
        rtemplate = rtemplate)
      val dec = Jbig2.decode(stream, globals)
      assert(dec.isDefined, s"trial $trial sep=$sep rt=$rtemplate")
      assert(dec.get._3.toSeq === expected(w, h, all, placements).toSeq,
        s"trial $trial sep=$sep rt=$rtemplate")
    }
  }

  test("instance-refined text regions round-trip (SBREFINE=1, §6.4.11)") {
    val rnd = new scala.util.Random(382)
    for (trial <- 0 until 12) {
      val w = 24 + rnd.nextInt(32)
      val h = 24 + rnd.nextInt(32)
      val syms = (0 until 1 + rnd.nextInt(5)).map(_ =>
        glyph(rnd, 2 + rnd.nextInt(5), 2 + rnd.nextInt(5)))
      val placements = (0 until 2 + rnd.nextInt(8)).map { _ =>
        (rnd.nextInt(syms.size), rnd.nextInt(w - 8), rnd.nextInt(h - 8))
      }
      // refine roughly half the instances: same-dims variant with a
      // few flips, varied reference offsets
      val variants = placements.map { case (si, _, _) =>
        if (rnd.nextBoolean()) None
        else {
          val (sw, sh, px) = syms(si)
          val v = px.map(b =>
            (if (rnd.nextInt(4) == 0) 1 - (b & 1) else b & 1).toByte)
          Some((v, rnd.nextInt(3) - 1, rnd.nextInt(3) - 1))
        }
      }
      val rtemplate = rnd.nextInt(2)
      val sep = rnd.nextBoolean()
      val (stream, globals) = Jbig2.encodeTextInstRefined(
        w, h, syms, placements, variants, rtemplate, sep)
      val dec = Jbig2.decode(stream, globals)
      assert(dec.isDefined, s"trial $trial rt=$rtemplate sep=$sep")
      // model: refined instances place their VARIANT bitmap
      val effective = placements.zip(variants).map { case ((si, x, y), v) =>
        val (sw, sh, px) = syms(si)
        (sw, sh, v.map(_._1).getOrElse(px), x, y)
      }
      val want = new Array[Byte](w * h)
      for ((sw, sh, px, x, y) <- effective; yy <- 0 until sh; xx <- 0 until sw)
        if (y + yy < h && x + xx < w && px(yy * sw + xx) != 0)
          want((y + yy) * w + (x + xx)) = 1
      assert(dec.get._3.toSeq === want.toSeq, s"trial $trial rt=$rtemplate")
    }
  }

  test("multi-aggregate dictionaries round-trip (REFAGGNINST > 1)") {
    val rnd = new scala.util.Random(383)
    for (trial <- 0 until 12) {
      val w = 28 + rnd.nextInt(24)
      val h = 28 + rnd.nextInt(24)
      val base = (0 until 2 + rnd.nextInt(3)).map(_ =>
        glyph(rnd, 2 + rnd.nextInt(4), 2 + rnd.nextInt(4)))
      // each aggregate: 2-3 refined instances of base glyphs placed
      // inside its own box
      val aggregates = (0 until 1 + rnd.nextInt(3)).map { _ =>
        val aw = 6 + rnd.nextInt(5)
        val ah = 6 + rnd.nextInt(5)
        val insts = (0 until 2 + rnd.nextInt(2)).map { _ =>
          val bi = rnd.nextInt(base.size)
          val (bw, bh, bpx) = base(bi)
          val v = bpx.map(b =>
            (if (rnd.nextInt(4) == 0) 1 - (b & 1) else b & 1).toByte)
          (bi, rnd.nextInt(math.max(1, aw - bw + 1)),
            rnd.nextInt(math.max(1, ah - bh + 1)), v)
        }
        (aw, ah, insts)
      }
      val placements = (0 until 2 + rnd.nextInt(6)).map { _ =>
        (rnd.nextInt(aggregates.size), rnd.nextInt(w - 12), rnd.nextInt(h - 12))
      }
      val rtemplate = rnd.nextInt(2)
      val sep = rnd.nextBoolean()
      val (stream, globals) = Jbig2.encodeTextAggregate(
        w, h, base, aggregates, placements, rtemplate, sep)
      val dec = Jbig2.decode(stream, globals)
      assert(dec.isDefined, s"trial $trial rt=$rtemplate sep=$sep")
      // model: aggregate bitmap = OR of its variant instances
      val aggBms = aggregates.map { case (aw, ah, insts) =>
        val bm = new Array[Byte](aw * ah)
        for ((bi, x, y, v) <- insts) {
          val (bw, bh, _) = base(bi)
          for (yy <- 0 until bh; xx <- 0 until bw)
            if (y + yy < ah && x + xx < aw && v(yy * bw + xx) != 0)
              bm((y + yy) * aw + (x + xx)) = 1
        }
        (aw, ah, bm)
      }
      val want = new Array[Byte](w * h)
      for ((ai, x, y) <- placements) {
        val (aw, ah, bm) = aggBms(ai)
        for (yy <- 0 until ah; xx <- 0 until aw)
          if (y + yy < h && x + xx < w && bm(yy * aw + xx) != 0)
            want((y + yy) * w + (x + xx)) = 1
      }
      assert(dec.get._3.toSeq === want.toSeq, s"trial $trial rt=$rtemplate")
    }
  }

  test("refinement region segments refine the page; TPGRON round-trips") {
    val rnd = new scala.util.Random(393)
    for (trial <- 0 until 16) {
      val w = 16 + rnd.nextInt(24)
      val h = 16 + rnd.nextInt(24)
      val base = Array.tabulate(w * h)(_ => rnd.nextInt(2).toByte)
      val bw = 4 + rnd.nextInt(math.max(1, w - 6))
      val bh = 4 + rnd.nextInt(math.max(1, h - 6))
      val x = rnd.nextInt(w - bw + 1)
      val y = rnd.nextInt(h - bh + 1)
      // sparse flips so TPGRON's typical rows actually occur
      val target = Array.tabulate(bw * bh) { q =>
        val v = base((y + q / bw) * w + (x + q % bw)) & 1
        (if (rnd.nextInt(6) == 0) 1 - v else v).toByte
      }
      val template = rnd.nextInt(2)
      val tpgron = rnd.nextBoolean()
      val stream = Jbig2.encodeWithRefinementRegion(
        base, w, h, x, y, bw, bh, target, template, tpgron)
      val dec = Jbig2.decode(stream)
      assert(dec.isDefined, s"trial $trial t=$template tp=$tpgron")
      val want = base.clone()
      for (q <- 0 until bw * bh)
        want((y + q / bw) * w + (x + q % bw)) = target(q)
      assert(dec.get._3.toSeq === want.toSeq,
        s"trial $trial t=$template tp=$tpgron box=($x,$y,$bw,$bh)")
    }
    // a refinement region with NO page beneath declines (never the
    // old silent skip)
    val lone = Jbig2.encodeWithRefinementRegion(
      Array.fill(64)(1.toByte), 8, 8, 0, 0, 4, 4,
      Array.fill(16)(0.toByte))
    // strip the page + base segments: keep only the type-40 segment
    val refStart = {
      // walk the two leading segments by their declared lengths
      def segLen(off: Int): Int = {
        val refC = (lone(off + 5) >> 5) & 7
        val hdr = 6 + refC + 1 + 4
        val dl = ((lone(off + hdr - 4) & 0xff) << 24) |
          ((lone(off + hdr - 3) & 0xff) << 16) |
          ((lone(off + hdr - 2) & 0xff) << 8) | (lone(off + hdr - 1) & 0xff)
        hdr + dl
      }
      segLen(0) + segLen(segLen(0))
    }
    assert(Jbig2.decode(lone.drop(refStart)).isEmpty,
      "page-less refinement region must decline")
  }

  test("decline pins: rtemplate 0 declines; r17 text modes decode") {
    val base = Seq((4, 4, Array.fill(16)(1.toByte)))
    val refined = Seq((4, 4, Array.tabulate(16)(p => (p % 2).toByte), 0, 0, 0))
    val placements = Seq((0, 2, 2), (1, 9, 9))
    val (stream, _) = Jbig2.encodeTextRefined(20, 20, base, refined, placements)
    val dec = Jbig2.decode(stream)
    assert(dec.isDefined)

    // dict B is segment 1; its header is 11 bytes after dict A's
    // segment (11 + dataA). Find it by scanning for the refagg flag
    // bytes (0x10, 0x02) right after an 11-byte header start — easier
    // and robust: flip bit 12 (SDRTEMPLATE) OFF in dict B's flags.
    // Dict B's flags are the unique 0x10 0x02 pair in the stream.
    val idx = (0 until stream.length - 1).find(i =>
      stream(i) == 0x10.toByte && stream(i + 1) == 0x02.toByte).get
    val rt0 = stream.clone()
    rt0(idx) = 0x00                           // SDRTEMPLATE=0: refinement ATs
    // r17: rtemplate 0 is in subset WITH its 4 nominal GR AT bytes —
    // this mutation flips the flag without adding them, so the bytes
    // read as ATs are really SDNUMEXSYMS: non-nominal ⇒ still declines
    assert(Jbig2.decode(rt0).isEmpty,
      "flag-flipped rtemplate-0 dictionary (no AT bytes) must decline")

    // transposed text region: set bit 6 of the text flags (the
    // 2-byte field right after the region-info 17 bytes of segment 3)
    def flipTextFlag(mask: Int): Array[Byte] = {
      // text segment data starts with region info: w=20 h=20 —
      // find be32(20),be32(20),be32(0),be32(0),0 then flags
      val sig = Array[Byte](0, 0, 0, 20, 0, 0, 0, 20, 0, 0, 0, 0, 0, 0, 0, 0, 0)
      val at = (0 until stream.length - sig.length).find(i =>
        sig.indices.forall(k => stream(i + k) == sig(k))).get
      val out = stream.clone()
      val fo = at + 17                        // 16-bit flags, big-endian
      val cur = ((out(fo) & 0xff) << 8) | (out(fo + 1) & 0xff)
      val nf = cur | mask
      out(fo) = ((nf >> 8) & 0xff).toByte
      out(fo + 1) = (nf & 0xff).toByte
      out
    }
    // r17: transposed / non-OR / defpixel are IN subset now — the
    // flipped streams must still DECODE (the wire deltas reinterpret
    // under the new mode, clipped — never a crash or a spin); their
    // semantics are pinned against the model in Jbig2TextModesSpec
    assert(Jbig2.decode(flipTextFlag(0x40)).isDefined, "TRANSPOSED decodes")
    assert(Jbig2.decode(flipTextFlag(1 << 7)).isDefined, "AND comb op decodes")
    assert(Jbig2.decode(flipTextFlag(1 << 9)).isDefined, "defpixel=1 decodes")

    // truncation never spins
    for (cut <- 12 until stream.length by 5) {
      val t0 = System.nanoTime()
      Jbig2.decode(stream.take(cut))
      assert((System.nanoTime() - t0) / 1e9 < 5.0, s"cut $cut")
    }
  }
}
