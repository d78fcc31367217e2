package graft.pipeline

import org.scalatest.funsuite.AnyFunSuite

/** JBIG2 refinement coding (SDREFAGG=1, §6.3 template 1): refined
  * dictionary chains round-trip pixel-exactly across reference
  * offsets and the globals split, and the decline pins — rtemplate 0,
  * multi-aggregate instances, transposed / non-OR text regions —
  * stay skip-not-misparse. */
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
      val (stream, globals) = Jbig2.encodeTextRefined(
        w, h, base, refined, placements, separateGlobals = sep)
      val dec = Jbig2.decode(stream, globals)
      assert(dec.isDefined, s"trial $trial sep=$sep")
      assert(dec.get._3.toSeq === expected(w, h, all, placements).toSeq,
        s"trial $trial sep=$sep")
    }
  }

  test("decline pins: rtemplate 0, transposed, non-OR, multi-aggregate") {
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
    assert(Jbig2.decode(rt0).isEmpty, "rtemplate-0 dictionary must decline")

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
    assert(Jbig2.decode(flipTextFlag(0x40)).isEmpty, "TRANSPOSED declines")
    assert(Jbig2.decode(flipTextFlag(1 << 7)).isEmpty, "non-OR comb op declines")
    assert(Jbig2.decode(flipTextFlag(1 << 9)).isEmpty, "defpixel=1 declines")

    // truncation never spins
    for (cut <- 12 until stream.length by 5) {
      val t0 = System.nanoTime()
      Jbig2.decode(stream.take(cut))
      assert((System.nanoTime() - t0) / 1e9 < 5.0, s"cut $cut")
    }
  }
}
