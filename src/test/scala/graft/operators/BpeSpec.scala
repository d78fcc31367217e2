package graft.operators

import graft.SparkSpec

class BpeSpec extends SparkSpec {

  /** Single-threaded reference BPE trainer over a word-frequency
    * dict — the Sennrich algorithm as published, no Spark anywhere.
    */
  private def referenceBpe(
      freqs: Map[String, Long], numMerges: Int): Seq[(String, String, Long)] = {
    var dict = freqs.map { case (w, n) => (w.map(_.toString).toVector :+ "</w>", n) }
    val out = scala.collection.mutable.ArrayBuffer.empty[(String, String, Long)]
    var i = 0
    var stop = false
    while (i < numMerges && !stop) {
      val counts = scala.collection.mutable.HashMap.empty[(String, String), Long]
      dict.foreach { case (syms, n) =>
        syms.sliding(2).foreach {
          case Vector(a, b) => counts((a, b)) = counts.getOrElse((a, b), 0L) + n
          case _ =>
        }
      }
      if (counts.isEmpty) stop = true
      else {
        val ((a, b), c) = counts.minBy { case ((x, y), n) => (-n, x + " " + y) }
        if (c < 2) stop = true
        else {
          out += ((a, b, c))
          dict = dict.map { case (syms, n) =>
            (Bpe.applyMerge(syms.toArray, a, b).toVector, n)
          }
          i += 1
        }
      }
    }
    out.toSeq
  }

  private val fixture: Map[String, Long] =
    Map("low" -> 5L, "lower" -> 2L, "newest" -> 6L, "widest" -> 3L)

  private def fixtureDf = {
    import spark.implicits._
    // materialize the frequencies as a real multi-row corpus so the
    // trainer's word-frequency aggregation is exercised too
    fixture.flatMap { case (w, n) => Seq.fill(n.toInt)(w) }
      .grouped(3).map(_.mkString(" ")).toSeq.toDF("text")
  }

  test("distributed trainer matches the reference implementation merge-for-merge") {
    val got = Bpe.train(fixtureDf, "text", numMerges = 10)
    val want = referenceBpe(fixture, 10)
    assert(got.map(m => (m.left, m.right, m.pairCount)) === want)
    assert(got.map(_.rank) === got.indices)
    // the paper's canonical corpus learns ("e","s") then ("es","t")
    // first — 9 'est' words outweigh 7 'low' prefixes
    assert((got.head.left, got.head.right) === ("e", "s"))
    assert((got(1).left, got(1).right) === ("es", "t"))
  }

  test("training is partition-layout invariant") {
    val a = Bpe.train(fixtureDf, "text", numMerges = 6)
    val b = Bpe.train(fixtureDf.repartition(7), "text", numMerges = 6)
    assert(a === b)
  }

  test("early stop when no pair reaches minPairCount") {
    import spark.implicits._
    val tiny = Seq("ab", "cd").toDF("text") // every pair count = 1
    assert(Bpe.train(tiny, "text", numMerges = 5).isEmpty)
  }

  test("encode segments by rank order; subwords reassemble the word") {
    import spark.implicits._
    val merges = Bpe.train(fixtureDf, "text", numMerges = 8)
    val docs = Seq((1L, "lowest newest low"), (2L, "wider")).toDF("doc_id", "text")
    val rows = Bpe.encode(docs, "doc_id", "text", merges)
      .as[(Long, Array[String])].collect().toMap
    // round-trip: stripping </w> markers reassembles the exact text
    assert(rows(1L).mkString.replace("</w>", " ").trim === "lowest newest low")
    assert(rows(2L).mkString.replace("</w>", "") === "wider")
    // a fully-merged training word segments to few units; "newest"
    // (freq 6) must not stay character-soup
    val newest = {
      var syms = "newest".map(_.toString).toArray :+ "</w>"
      merges.foreach(m => syms = Bpe.applyMerge(syms, m.left, m.right))
      syms
    }
    assert(newest.length <= 3, newest.mkString("|"))
  }
}
