package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class KneserNeySpec extends SparkSpec {
  import spark.implicits._

  // corpus: bigrams (BOS,a)x3, (a,b)x2, (a,c)x1 — B = 3
  private def corpus() =
    Seq((1L, "a b"), (2L, "a b"), (3L, "a c")).toDF("doc_id", "text")

  test("bigram stream prepends one BOS bigram per non-empty document") {
    val bs = KneserNey.bigramStream(
      Seq((1L, "x y z"), (2L, ""), (3L, "q")).toDF("doc_id", "text"),
      "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    assert(bs.toSet === Set(
      (1L, KneserNey.Bos, "x"), (1L, "x", "y"), (1L, "y", "z"),
      (3L, KneserNey.Bos, "q")))
  }

  test("hand-computed interpolated-KN probabilities (d = 3/4)") {
    val model = KneserNey.fit(KneserNey.bigramStream(corpus(), "doc_id", "text"))
    val got = KneserNey.scorePairs(
      Seq(("a", "b"), ("a", "c"), ("a", "a"), (KneserNey.Bos, "a"))
        .toDF("v", "w"), model)
      .collect().map(r => (r.getAs[String]("v"), r.getAs[String]("w")) ->
        (r.getAs[Long]("num"), r.getAs[Long]("den"))).toMap
    // P(b|a) = (2 - 3/4 + (3/4)*2*(1/3)) / 3 = 7/12 = 21/36
    assert(got(("a", "b")) === (21L, 36L))
    // P(c|a) = (1 - 3/4 + 1/2) / 3 = 1/4 = 9/36
    assert(got(("a", "c")) === (9L, 36L))
    // unseen pair under seen context: pure continuation mass 6/36
    assert(got(("a", "a")) === (6L, 36L))
    // P(a|BOS) = (3 - 3/4 + (3/4)*1*(1/3)) / 3 = 5/6 = 30/36
    assert(got((KneserNey.Bos, "a")) === (30L, 36L))
  }

  test("KN normalization is an exact integer identity: sum(num) = den per context") {
    val model = KneserNey.fit(KneserNey.bigramStream(corpus(), "doc_id", "text"))
    val pairs = model.contexts.select($"v")
      .crossJoin(model.continuations.select($"w"))
    val sums = KneserNey.scorePairs(pairs, model)
      .groupBy($"v").agg(sum($"num").as("s"), first($"den").as("d"),
        countDistinct($"den").as("nd"))
      .collect()
    assert(sums.nonEmpty)
    sums.foreach { r =>
      assert(r.getAs[Long]("nd") === 1L, s"context ${r.get(0)}: den not constant")
      assert(r.getAs[Long]("s") === r.getAs[Long]("d"),
        s"context ${r.get(0)}: probability mass != 1")
    }
  }

  test("unseen context backs off to the continuation distribution") {
    val model = KneserNey.fit(KneserNey.bigramStream(corpus(), "doc_id", "text"))
    val got = KneserNey.scorePairs(
      Seq(("zzz", "b"), ("zzz", "qqq")).toDF("v", "w"), model)
      .collect().map(r => r.getAs[String]("w") ->
        (r.getAs[Long]("num"), r.getAs[Long]("den"))).toMap
    assert(got("b") === (2L, 6L))   // N1+(.,b)/B = 1/3
    assert(got("qqq") === (1L, 6L)) // floor 1/(2B)
  }

  test("scoreDocs matches a manual nll computation and skips empty docs") {
    val docs = corpus().union(Seq((4L, "")).toDF("doc_id", "text"))
    val got = KneserNey.scoreDocs(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(!got.contains(4L))
    assert(got(3L)._1 === 2L)
    val want3 = (-math.log(30.0 / 36.0) - math.log(9.0 / 36.0)) / 2.0
    assert(got(3L)._2 === math.floor(want3 * 10000 + 0.5) / 10000)
    val want1 = (-math.log(30.0 / 36.0) - math.log(21.0 / 36.0)) / 2.0
    assert(got(1L)._2 === math.floor(want1 * 10000 + 0.5) / 10000)
  }
}
