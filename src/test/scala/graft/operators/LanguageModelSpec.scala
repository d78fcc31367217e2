package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class LanguageModelSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (1L, "a a a b"),
    (2L, "a b c d"),
    (3L, "a a a a")
  ).toDF("doc_id", "text")

  test("unigramProbs: MLE counts and probabilities") {
    val p = LanguageModel.unigramProbs(docs, "text")
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    // 12 tokens: a×8, b×2, c×1, d×1
    assert(p("a") === (8L, 8.0 / 12))
    assert(p("b") === (2L, 2.0 / 12))
    assert(p("c")._1 === 1L && p("d")._1 === 1L)
  }

  test("add-k smoothing shifts mass to rare words") {
    val p0 = LanguageModel.unigramProbs(docs, "text", k = 0.0)
      .collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
    val p1 = LanguageModel.unigramProbs(docs, "text", k = 1.0)
      .collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
    assert(p1("a") < p0("a") && p1("c") > p0("c"))
    assert(math.abs(p1.values.sum - 1.0) < 1e-12)
  }

  test("scoreDocs: repetitive doc scores lower cross-entropy than diverse doc") {
    val probs = LanguageModel.unigramProbs(docs, "text")
    val s = LanguageModel.scoreDocs(docs, "doc_id", "text", probs)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(s(1L)._1 === 4L)
    // doc 3 is all "a" (the most common word) → lowest nll;
    // doc 2 touches the two singletons → highest
    assert(s(3L)._2 < s(1L)._2 && s(1L)._2 < s(2L)._2)
    // hand-check doc 3: every token has p = 8/12 → nll = ln(1.5)
    val expected = math.floor(math.log(12.0 / 8) * 10000 + 0.5) / 10000
    assert(s(3L)._2 === expected)
  }

  test("cross-corpus scoring with k>0 assigns unseen tokens the OOV floor") {
    val probs = LanguageModel.unigramProbs(docs, "text", k = 1.0)
    val other = Seq((9L, "zzz zzz"), (8L, "a a")).toDF("doc_id", "text")
    val s = LanguageModel.scoreDocs(other, "doc_id", "text", probs)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    // all-OOV doc scores the floor k/(N+k(V+1)) = 1/17 — HIGH nll, not null
    val floorNll = math.floor(math.log(17.0) * 10000 + 0.5) / 10000
    assert(s(9L) === floorNll)
    // common-word doc scores ln(17/9), far below the OOV doc
    val aNll = math.floor(math.log(17.0 / 9) * 10000 + 0.5) / 10000
    assert(s(8L) === aNll && s(8L) < s(9L))
  }

  test("cross-corpus scoring with k=0 drops unseen tokens from the average") {
    val probs = LanguageModel.unigramProbs(docs, "text")
    val other = Seq((9L, "a zzz")).toDF("doc_id", "text")
    val s = LanguageModel.scoreDocs(other, "doc_id", "text", probs)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    // n_tokens counts both, but the unseen "zzz" contributes no nll
    assert(s(9L)._1 === 2L)
    val expected = math.floor(math.log(12.0 / 8) * 10000 + 0.5) / 10000
    assert(s(9L)._2 === expected)
  }
}
