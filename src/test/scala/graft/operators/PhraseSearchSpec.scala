package graft.operators

import graft.SparkSpec

class PhraseSearchSpec extends SparkSpec {
  import spark.implicits._

  private def run(docs: Seq[(Long, String)], phrase: String*) =
    PhraseSearch.phraseMatches(docs.toDF("doc_id", "text"), "doc_id", "text", phrase)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

  test("adjacency matters: bag-of-words hits are not phrase hits") {
    val docs = Seq(
      1L -> "the quick brown fox",
      2L -> "brown the quick fox",    // both words, wrong order
      3L -> "the quick quick brown")  // gap breaks adjacency at first 'quick'
    assert(run(docs, "quick", "brown") === Set((1L, 1L, 2L), (3L, 1L, 3L)))
  }

  test("repeated words in the phrase count per INDEX, not per word") {
    val docs = Seq(
      1L -> "the cat the dog",
      2L -> "the the cat",   // 'the cat the' absent
      3L -> "a the cat the") // match at position 2
    assert(run(docs, "the", "cat", "the") === Set((1L, 1L, 1L), (3L, 1L, 2L)))
  }

  test("overlapping occurrences all count") {
    // 'a a a a' contains 'a a' at positions 1, 2, 3
    assert(run(Seq(1L -> "a a a a"), "a", "a") === Set((1L, 3L, 1L)))
  }

  test("single-word phrase degenerates to term lookup with counts") {
    assert(run(Seq(1L -> "x y x", 2L -> "y"), "x") === Set((1L, 2L, 1L)))
  }

  test("no match yields no row; empty phrase rejected") {
    assert(run(Seq(1L -> "alpha beta"), "gamma", "delta") === Set.empty)
    intercept[IllegalArgumentException] {
      PhraseSearch.phraseMatches(
        Seq((1L, "x")).toDF("doc_id", "text"), "doc_id", "text", Seq.empty)
    }
    intercept[IllegalArgumentException] {
      PhraseSearch.phraseMatches(
        Seq((1L, "x")).toDF("doc_id", "text"), "doc_id", "text", Seq("two words"))
    }
  }
}
