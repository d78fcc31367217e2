package graft

import graft.operators.Dedup
import graft.pipeline.{CharWindowChunker, HashingEmbedder}
import org.scalacheck.{Gen, Prop, Test => SCTest}

/** Property-based invariants (SURVEY §5.3) — scalacheck run
  * programmatically under ScalaTest.
  */
class PropertiesSpec extends SparkSpec {

  private def check(p: Prop): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(200), p)
    assert(res.passed, res.status.toString)
  }

  private val textGen: Gen[String] =
    Gen.listOf(Gen.oneOf(Gen.alphaNumStr.map(_.take(8)), Gen.const(" "), Gen.const("\n")))
      .map(_.mkString(" "))

  test("chunker: reconstruction, width bound, min-length filter") {
    val c = CharWindowChunker(width = 50, minChars = 0)
    check(Prop.forAll(textGen) { t =>
      c.chunk(t).mkString == t                      // lossless at minChars=0
    })
    val cf = CharWindowChunker(width = 50, minChars = 10)
    check(Prop.forAll(textGen) { t =>
      val ch = cf.chunk(t)
      ch.forall(s => s.length <= 50 && s.length > 10) &&
        t.startsWith(ch.headOption.getOrElse(""))   // prefix preserved
    })
  }

  test("embedder: deterministic, unit-or-zero norm, dim stable") {
    val e = HashingEmbedder(dim = 32)
    check(Prop.forAll(textGen) { t =>
      val a = e.embedOne(t); val b = e.embedOne(t)
      val norm = math.sqrt(a.map(x => x.toDouble * x).sum)
      a.length == 32 && a.toSeq == b.toSeq &&
        (math.abs(norm - 1.0) < 1e-4 || norm == 0.0)
    })
  }

  test("minhash: est jaccard in [0,1]; self-similarity 1; symmetry") {
    val h = Dedup.MinHasher(numHashes = 32)
    check(Prop.forAll(textGen, textGen) { (a, b) =>
      val sa = h.signature(a); val sb = h.signature(b)
      val est = h.estJaccard(sa, sb)
      est >= 0.0 && est <= 1.0 &&
        h.estJaccard(sa, sa) == 1.0 &&
        est == h.estJaccard(sb, sa)
    })
  }

  test("simhash: permutation-heavy perturbation bounded; self distance 0") {
    val h = Dedup.SimHasher()
    check(Prop.forAll(textGen) { t =>
      h.hamming(h.simhash(t), h.simhash(t)) == 0
    })
  }
}
