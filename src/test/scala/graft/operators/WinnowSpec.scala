package graft.operators

import graft.SparkSpec
import org.scalacheck.{Gen, Prop, Test => SCTest}

class WinnowSpec extends SparkSpec {

  private val win = Winnow.Winnower(k = 8, w = 4)

  private def check(p: Prop): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(200), p)
    assert(res.passed, res.status.toString)
  }

  test("winnowing guarantee: any shared substring of length ≥ w+k−1 yields a shared fingerprint") {
    val text = (n: Int) => Gen.stringOfN(n, Gen.alphaLowerChar)
    check(Prop.forAll(text(80), text(80), text(win.w + win.k - 1),
        Gen.chooseNum(0, 60), Gen.chooseNum(0, 60)) { (a, b, shared, i, j) =>
      val docA = a.substring(0, i) + shared + a.substring(i)
      val docB = b.substring(0, j) + shared + b.substring(j)
      win.fingerprints(docA).toSet.intersect(win.fingerprints(docB).toSet).nonEmpty
    })
  }

  test("fingerprint density ~2/(w+1); determinism; short/empty docs") {
    // non-repeating text: repetition collapses DISTINCT fingerprints
    // (same passage → same fingerprints, by design)
    val rnd = new scala.util.Random(7)
    val text = Seq.fill(400)(rnd.alphanumeric.take(4).mkString).mkString(" ")
    val fps = win.fingerprints(text)
    val m = text.length - win.k + 1
    assert(fps.length <= m)
    assert(fps.length >= m / (2 * (win.w + 1)))       // density within 2× of 2/(w+1)
    assert(fps.toSeq === win.fingerprints(text).toSeq) // deterministic
    assert(fps.toSeq === fps.toSeq.sorted)             // sorted contract for the merge
    assert(win.fingerprints("").isEmpty)
    assert(win.fingerprints(null).isEmpty)
    assert(win.fingerprints("abc").length === 1)       // sub-k doc: whole-text hash
  }

  test("fingerprintSpans: values align with fingerprints; spans bound every occurrence") {
    val rnd = new scala.util.Random(11)
    val text = Seq.fill(200)(rnd.alphanumeric.take(5).mkString).mkString(" ")
    val spans = win.fingerprintSpans(text)
    assert(spans.map(_._1).toSeq === win.fingerprints(text).toSeq)
    // every span must contain at least one k-gram hashing to its value
    spans.foreach { case (fp, lo, hi) =>
      assert(lo >= 0 && hi <= text.length && hi - lo >= win.k, s"($fp,$lo,$hi)")
      val grams = (lo to hi - win.k).map(i => text.substring(i, i + win.k))
      assert(grams.exists(g => win.fingerprints(g).headOption.contains(fp) ||
        win.fingerprints(g).contains(fp)), s"no gram in [$lo,$hi) hashes to $fp")
    }
    // short/empty contracts mirror fingerprints
    assert(win.fingerprintSpans("").isEmpty)
    assert(win.fingerprintSpans(null).isEmpty)
    assert(win.fingerprintSpans("abc").toSeq === Seq((win.fingerprints("abc").head, 0, 3)))
  }

  test("winnowSpanPairs: localized spans contain the planted passage in both docs") {
    import spark.implicits._
    val passage = "call me ishmael some years ago never mind how long precisely"
    val prefixA = "completely unrelated preamble text goes right here first. "
    val suffixB = " and then entirely different material follows afterwards."
    val docs = Seq(
      (1L, prefixA + passage),
      (2L, passage + suffixB),
      (3L, "nothing in common with the others at all, plain filler words only."),
      (4L, "more disjoint content that shares no passage with anything above.")
    ).toDF("doc_id", "text")
    val rows = Winnow.winnowSpanPairs(spark, docs, "doc_id", "text", win,
        minContainment = 0.1)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getDouble(2), r.getLong(3), r.getLong(4), r.getLong(5),
          r.getLong(6), r.getLong(7))))
      .toMap
    assert(rows.keySet === Set((1L, 2L)))
    val (c, nShared, aStart, aEnd, bStart, bEnd) = rows((1L, 2L))
    assert(c >= 0.1 && nShared >= 1)
    // doc 1 holds the passage at [prefixA.length, end); the reported
    // A-span must sit inside the passage region (shared fingerprints
    // can only come from the copied chars), likewise B at the front
    assert(aStart >= prefixA.length && aEnd <= (prefixA + passage).length,
      s"a=[$aStart,$aEnd) vs passage=[${prefixA.length},${(prefixA + passage).length})")
    assert(bStart >= 0 && bEnd <= passage.length,
      s"b=[$bStart,$bEnd) vs passage=[0,${passage.length})")
    // and must actually cover a detectable chunk (≥ one gram window)
    assert(aEnd - aStart >= win.k && bEnd - bStart >= win.k)
    // the localized substring is IDENTICAL in both docs — the cut a
    // curation pipeline would make
    val aTxt = (prefixA + passage).substring(aStart.toInt, aEnd.toInt)
    val bTxt = (passage + suffixB).substring(bStart.toInt, bEnd.toInt)
    assert(aTxt === bTxt)
  }

  test("winnowPairs: copied passage detected across unrelated documents") {
    import spark.implicits._
    val passage = "call me ishmael some years ago never mind how long precisely " * 3
    val docs = Seq(
      (1L, "completely unrelated preamble text here. " + passage),
      (2L, passage + " and then entirely different material follows afterwards."),
      (3L, "nothing in common with the others at all, plain filler words only."),
      (4L, "more disjoint content that shares no passage with anything above.")
    ).toDF("doc_id", "text")
    val pairs = Winnow.winnowPairs(spark, docs, "doc_id", "text", win,
        minContainment = 0.3)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(pairs.keySet === Set((1L, 2L)))
    assert(pairs((1L, 2L)) >= 0.3)
  }
}
