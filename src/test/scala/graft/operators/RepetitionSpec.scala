package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class RepetitionSpec extends SparkSpec {

  private def rep(text: String, n: Int): Double = {
    import spark.implicits._
    Seq(Tuple1(text)).toDF("text")
      .select(Boilerplate.repetitionRatio($"text", n).as("r"))
      .head.getDouble(0)
  }

  test("all-distinct n-grams score 0") {
    assert(rep("a b c d e", 2) === 0.0)
  }

  test("a fully looping document scores high") {
    // "a b a b a b a b" → 7 bigrams, 2 distinct → 1 - 2/7 ≈ 0.7143
    assert(rep("a b a b a b a b", 2) === 0.7143)
  }

  test("short documents (< n tokens) score 0, as do empty/null") {
    import spark.implicits._
    assert(rep("one", 2) === 0.0)
    assert(rep("", 2) === 0.0)
    val r = Seq(Tuple1(null: String)).toDF("text")
      .select(Boilerplate.repetitionRatio($"text", 2).as("r")).head.getDouble(0)
    assert(r === 0.0)
  }

  test("trigram repetition is blind to repeats shorter than n") {
    // every trigram crosses a loop boundary differently → lower than bigram score
    val t = "x y x y x y"
    assert(rep(t, 2) > rep(t, 3) - 1e-9)
  }
}
