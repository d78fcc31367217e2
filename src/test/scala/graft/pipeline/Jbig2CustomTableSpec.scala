package graft.pipeline

import org.scalatest.funsuite.AnyFunSuite

/** CUSTOM Huffman tables (T.88 §7.4.13 type-53 segments, §B.2
  * assembly — r17): segment-level round trips across line shapes,
  * the Kraft-overflow decline, and end-to-end text pages whose SIX
  * selectable tables are all custom, decoding identically to their
  * standard-table twins. */
class Jbig2CustomTableSpec extends AnyFunSuite {

  test("table segments round-trip values across their whole domain") {
    // simple non-negative domain, no OOB
    val r1 = Jbig2.tableSegmentRoundTrip(0, 16, Seq((1, 4)), 2, 2, 0,
      Seq(0L, 1L, 7L, 15L, 16L, 100000L, -1L, -500L))
    assert(r1.contains(Seq(Some(0L), Some(1L), Some(7L), Some(15L),
      Some(16L), Some(100000L), Some(-1L), Some(-500L))))
    // negative HTLOW, several range lines, an OOB line (Kraft:
    // 2·2^-2 + 2·2^-3 + 2·2^-4 = 7/8)
    val r2 = Jbig2.tableSegmentRoundTrip(-8, 24,
      Seq((2, 3), (3, 4), (3, 3)), 4, 4, 2,
      Seq(-8L, -1L, 0L, 7L, 8L, 15L, 23L, 24L, 5000L, -9L, -77L, Long.MinValue))
    assert(r2.contains(Seq(Some(-8L), Some(-1L), Some(0L), Some(7L),
      Some(8L), Some(15L), Some(23L), Some(24L), Some(5000L), Some(-9L),
      Some(-77L), None)), s"got $r2")   // Long.MinValue = the OOB sentinel
  }

  test("a Kraft-overflowing table declines instead of aliasing codes") {
    // three preflen-1 lines cannot form a prefix code
    val bad = intercept[IllegalArgumentException] {
      Jbig2.encodeTableSegment(0, 12, Seq((1, 2), (1, 2), (1, 2)), 1, 1)
    }
    assert(bad.getMessage.contains("prefix code"))
    // hand-build the same hostile segment bytes: flags (HTPS=1,
    // HTRS=3), HTLOW=0, HTHIGH=12, then 3×(preflen=1, rangelen=2)
    // lines + lower/upper preflen 1 — the decoder must reject it
    val b = new scala.collection.mutable.ArrayBuffer[Byte]()
    b += ((0 << 0) | ((1 - 1) << 1) | ((3 - 1) << 4)).toByte
    b ++= Array[Byte](0, 0, 0, 0, 0, 0, 0, 12)
    // bit stream: (1,010)×3 then 1, 1 → 10101010 1011 + pad = aa b0
    b += 0xaa.toByte; b += 0xb0.toByte
    val stream = hostileTableStream(b.toArray)
    assert(Jbig2.decode(stream).isEmpty,
      "a dictionary whose custom table overflows Kraft must decline")
  }

  /** Wrap hostile table-segment DATA in a minimal stream: the table,
    * a dictionary selecting it (SDHUFFDH=3), and a text region that
    * needs the dictionary — decode must return None, not garbage. */
  private def hostileTableStream(tableData: Array[Byte]): Array[Byte] = {
    val (good, _) = Jbig2.encodeTextHuff(20, 20,
      Seq((4, 4, Array.fill(16)(1.toByte))), Seq((0, 2, 2)),
      customTables = true)
    // splice: replace segment 0's (the DH table's) data with ours.
    // Segment 0 layout: 4-byte num, 1-byte flags, 1-byte refcount,
    // 1-byte page assoc, 4-byte length, data.
    val origLen = ((good(7) & 0xff) << 24) | ((good(8) & 0xff) << 16) |
      ((good(9) & 0xff) << 8) | (good(10) & 0xff)
    val out = new scala.collection.mutable.ArrayBuffer[Byte]()
    out ++= good.take(7)
    out += ((tableData.length >> 24) & 0xff).toByte
    out += ((tableData.length >> 16) & 0xff).toByte
    out += ((tableData.length >> 8) & 0xff).toByte
    out += (tableData.length & 0xff).toByte
    out ++= tableData
    out ++= good.drop(11 + origLen)
    out.toArray
  }

  private def glyphs(rnd: scala.util.Random, n: Int): Seq[(Int, Int, Array[Byte])] =
    (0 until n).map { _ =>
      val w = 2 + rnd.nextInt(6)
      val h = 2 + rnd.nextInt(6)
      val px = Array.tabulate(w * h)(_ => if (rnd.nextBoolean()) 1.toByte else 0.toByte)
      px(rnd.nextInt(px.length)) = 1
      (w, h, px)
    }

  test("all-custom-table text pages decode identically to standard-table twins") {
    val rnd = new scala.util.Random(372)
    for (trial <- 0 until 16) {
      val w = 24 + rnd.nextInt(40)
      val h = 24 + rnd.nextInt(40)
      val syms = glyphs(rnd, 1 + rnd.nextInt(7))
      val placements = (0 until 1 + rnd.nextInt(12)).map { _ =>
        (rnd.nextInt(syms.size), rnd.nextInt(w - 8), rnd.nextInt(h - 8))
      }
      val mmr = rnd.nextBoolean()
      val globalsSep = rnd.nextBoolean()
      val (cs, cg) = Jbig2.encodeTextHuff(w, h, syms, placements,
        separateGlobals = globalsSep, mmrCollective = mmr,
        customTables = true)
      val (ss, sg) = Jbig2.encodeTextHuff(w, h, syms, placements,
        separateGlobals = globalsSep, mmrCollective = mmr)
      val cDec = Jbig2.decode(cs, cg)
      val sDec = Jbig2.decode(ss, sg)
      assert(cDec.isDefined && sDec.isDefined,
        s"trial $trial mmr=$mmr sep=$globalsSep")
      assert(cDec.get._3.toSeq === sDec.get._3.toSeq, s"trial $trial")
    }
  }

  test("jbig2CustomTablePdf extraction matches the pixel formula") {
    def hv(n: Long, s: Long) = graft.operators.Sampling.hashBitsScalar(n, s)
    for (id <- 0L to 7L) {
      val imgs = PdfImages.extract(PdfGen.jbig2CustomTablePdf(id))
      assert(imgs.size == 1, s"id $id")
      val im = imgs.head
      assert(im.codec == "raw" && im.colorSpace == "DeviceGray", s"id $id")
      for (p <- 0 until 256) {
        val cell = ((p / 16) / 4) * 4 + (p % 16) / 4
        val k = hv(id * 16 + cell, 373L) % 4
        val gp = k * 16 + ((p / 16) % 4) * 4 + (p % 16) % 4
        val want = if (hv(gp, 372L) % 2 == 1) 0 else 255
        assert((im.data(p) & 0xff) == want, s"id $id pixel $p")
      }
    }
  }
}
