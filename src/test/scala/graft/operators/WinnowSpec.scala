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
