package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class BoilerplateSpec extends SparkSpec {

  test("ngrams: ordered word windows, short docs empty") {
    import spark.implicits._
    val df = Seq((1L, "a b c d"), (2L, "a b"), (3L, "  x  "), (4L, null: String))
      .toDF("id", "text")
      .select($"id", Boilerplate.ngrams($"text", 3).as("g"))
    val byId = df.collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    assert(byId(1L) === Seq("a b c", "b c d"))
    assert(byId(2L) === Seq.empty)     // shorter than n
    assert(byId(3L) === Seq.empty)
    assert(byId(4L) === Seq.empty)     // null text → no grams
  }

  test("stats: planted shared header flagged, unique bodies clean") {
    import spark.implicits._
    val header = "copyright acme corp all rights reserved"   // 6 tokens → 4 3-grams
    val docs = (1L to 4L).map(i =>
        (i, header + " " + (1 to 10).map(j => s"body${i}_$j").mkString(" ")))
      .toDF("doc_id", "text")

    val out = Boilerplate.stats(docs, "doc_id", "text", n = 3, minDf = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .sortBy(_._1)

    // each doc: 16 tokens → 14 3-grams; shared = header's 4 internal
    // 3-grams plus the 2 bridging grams are unique (they contain
    // body tokens) → n_boiler = 4 per doc
    assert(out.forall(_._2 === 14L))
    assert(out.forall(_._3 === 4L))
    assert(out.forall(t => math.abs(t._4 - 0.2857) < 1e-9))  // r4(4/14)
  }

  test("stats: doc shorter than n reports zeros, not a dropped row") {
    import spark.implicits._
    val docs = Seq((1L, "one two three four five six"), (2L, "tiny"))
      .toDF("doc_id", "text")
    val out = Boilerplate.stats(docs, "doc_id", "text", n = 5, minDf = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .sortBy(_._1)
    assert(out.length === 2)
    assert(out(1) === ((2L, 0L, 0L, 0.0)))
  }

  test("ngramDocFreq counts distinct documents, not occurrences") {
    import spark.implicits._
    // doc 1 repeats the same bigram three times; df must still be 2
    val docs = Seq((1L, "x y x y x y"), (2L, "x y z")).toDF("doc_id", "text")
    val df2 = Boilerplate.ngramDocFreq(docs, "text", 2)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(df2("x y") === 2L)
    assert(df2("y x") === 1L)
  }
}
