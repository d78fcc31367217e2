package graft.pipeline

import org.scalatest.funsuite.AnyFunSuite

/** Text-region placement modes (T.88 §6.4.5 — r17): TRANSPOSED
  * placement, all four REFCORNERs, the four SBCOMBOPs, and
  * SBDEFPIXEL, round-tripped against an independent imperative
  * reference model. The encoder takes TOP-LEFT placements whatever
  * the mode, so every mode must decode to the SAME page — the wire
  * encodings differ completely (corner-derived T, pre/post CURS
  * updates), which is exactly what the model pins. */
class Jbig2TextModesSpec extends AnyFunSuite {

  private def glyphs(rnd: scala.util.Random, n: Int): Seq[(Int, Int, Array[Byte])] =
    (0 until n).map { _ =>
      val w = 2 + rnd.nextInt(6)
      val h = 2 + rnd.nextInt(6)
      val px = Array.tabulate(w * h)(_ => if (rnd.nextBoolean()) 1.toByte else 0.toByte)
      px(rnd.nextInt(px.length)) = 1
      (w, h, px)
    }

  /** Independent model: fill with defPixel, apply each placement's
    * op over its clipped box. Every SBCOMBOP is per-pixel
    * order-insensitive (OR/AND accumulate, XOR/XNOR reduce to
    * def ^ Σs ^ count), so placement order doesn't matter here. */
  private def model(
      w: Int, h: Int,
      syms: Seq[(Int, Int, Array[Byte])],
      placements: Seq[(Int, Int, Int)],
      combOp: Int, defPixel: Int): Array[Byte] = {
    val page = Array.fill[Byte](w * h)(defPixel.toByte)
    for ((si, x, y) <- placements) {
      val (sw, sh, px) = syms(si)
      for (yy <- 0 until sh; xx <- 0 until sw)
        if (y + yy >= 0 && y + yy < h && x + xx >= 0 && x + xx < w) {
          val s = if (px(yy * sw + xx) != 0) 1 else 0
          val d = page((y + yy) * w + (x + xx)) & 1
          page((y + yy) * w + (x + xx)) = (combOp match {
            case 0 => d | s
            case 1 => d & s
            case 2 => d ^ s
            case _ => 1 - (d ^ s)
          }).toByte
        }
    }
    page
  }

  test("all transposed x corner modes decode to the same OR page") {
    val rnd = new scala.util.Random(377)
    for (trial <- 0 until 12) {
      val w = 24 + rnd.nextInt(40)
      val h = 24 + rnd.nextInt(40)
      val syms = glyphs(rnd, 1 + rnd.nextInt(6))
      val placements = (0 until 1 + rnd.nextInt(10)).map { _ =>
        (rnd.nextInt(syms.size), rnd.nextInt(w - 8), rnd.nextInt(h - 8))
      }
      val logStrips = rnd.nextInt(3)
      val want = model(w, h, syms, placements, combOp = 0, defPixel = 0)
      for (transposed <- Seq(false, true); corner <- 0 to 3) {
        val (stream, _) = Jbig2.encodeText(w, h, syms, placements,
          logStrips = logStrips, refCorner = corner, transposed = transposed)
        val dec = Jbig2.decode(stream)
        assert(dec.isDefined, s"trial $trial t=$transposed c=$corner")
        assert(dec.get._3.toSeq === want.toSeq,
          s"trial $trial t=$transposed c=$corner strips=$logStrips")
      }
    }
  }

  test("SBCOMBOP AND/XOR/XNOR and SBDEFPIXEL compose per the model") {
    val rnd = new scala.util.Random(378)
    for (trial <- 0 until 12) {
      val w = 24 + rnd.nextInt(32)
      val h = 24 + rnd.nextInt(32)
      val syms = glyphs(rnd, 1 + rnd.nextInt(5))
      // OVERLAPPING placements so the op algebra is actually observed
      val placements = (0 until 3 + rnd.nextInt(8)).map { _ =>
        (rnd.nextInt(syms.size), rnd.nextInt(w - 6), rnd.nextInt(h - 6))
      }
      for (combOp <- 1 to 3; defPixel <- 0 to 1) {
        val transposed = rnd.nextBoolean()
        val corner = rnd.nextInt(4)
        val (stream, _) = Jbig2.encodeText(w, h, syms, placements,
          refCorner = corner, transposed = transposed,
          combOp = combOp, defPixel = defPixel)
        val dec = Jbig2.decode(stream)
        assert(dec.isDefined, s"trial $trial op=$combOp def=$defPixel")
        val want = model(w, h, syms, placements, combOp, defPixel)
        assert(dec.get._3.toSeq === want.toSeq,
          s"trial $trial op=$combOp def=$defPixel t=$transposed c=$corner")
      }
    }
  }

  test("external region ops + page default pixel compose sequentially") {
    val rnd = new scala.util.Random(380)
    for (trial <- 0 until 10) {
      val w = 16 + rnd.nextInt(24)
      val h = 16 + rnd.nextInt(24)
      val nRegions = 2 + rnd.nextInt(3)
      val defPx = rnd.nextInt(2)
      val regions = (0 until nRegions).map { _ =>
        val rw = 4 + rnd.nextInt(w - 6)
        val rh = 4 + rnd.nextInt(h - 6)
        val x = rnd.nextInt(w - rw)
        val y = rnd.nextInt(h - rh)
        (x, y, rw, rh,
          Array.tabulate(rw * rh)(_ => rnd.nextInt(2).toByte))
      }
      val ops = (0 until nRegions).map(_ => rnd.nextInt(5))
      val stream = Jbig2.encodeRegions(w, h, regions, ops, defPx)
      val dec = Jbig2.decode(stream)
      assert(dec.isDefined, s"trial $trial")
      // sequential reference model
      val page = Array.fill[Byte](w * h)(defPx.toByte)
      for (((x, y, rw, rh, px), op) <- regions.zip(ops)) {
        for (yy <- 0 until rh; xx <- 0 until rw) {
          val d = page((y + yy) * w + (x + xx)) & 1
          val s = px(yy * rw + xx) & 1
          page((y + yy) * w + (x + xx)) = (op match {
            case 0 => d | s
            case 1 => d & s
            case 2 => d ^ s
            case 3 => 1 - (d ^ s)
            case _ => s
          }).toByte
        }
      }
      assert(dec.get._3.toSeq === page.toSeq,
        s"trial $trial ops=$ops def=$defPx")
    }
  }

  test("huffman text regions decode transposed/corner/op modes too") {
    val rnd = new scala.util.Random(379)
    for (trial <- 0 until 8) {
      val w = 24 + rnd.nextInt(32)
      val h = 24 + rnd.nextInt(32)
      val syms = glyphs(rnd, 1 + rnd.nextInt(5))
      val placements = (0 until 2 + rnd.nextInt(8)).map { _ =>
        (rnd.nextInt(syms.size), rnd.nextInt(w - 6), rnd.nextInt(h - 6))
      }
      // the huffman ENCODER still emits TL/BL only (its T tables are
      // non-negative); the DECODER's mode handling is shared with the
      // arithmetic path via placeSymbol, exercised there across all
      // corners — here both encoder corners x collective modes
      for (corner <- 0 to 1; mmr <- Seq(false, true)) {
        val (stream, g) = Jbig2.encodeTextHuff(w, h, syms, placements,
          refCorner = corner, mmrCollective = mmr)
        val dec = Jbig2.decode(stream, g)
        assert(dec.isDefined, s"trial $trial c=$corner mmr=$mmr")
        val want = model(w, h, syms, placements, combOp = 0, defPixel = 0)
        assert(dec.get._3.toSeq === want.toSeq, s"trial $trial c=$corner")
      }
    }
  }
}
