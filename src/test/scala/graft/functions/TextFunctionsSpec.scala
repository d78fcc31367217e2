package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TextFunctionsSpec extends SparkSpec {

  private def one(text: String, c: org.apache.spark.sql.Column => org.apache.spark.sql.Column): Any = {
    import spark.implicits._
    Seq(text).toDF("text").select(c($"text").as("v")).collect()(0).get(0)
  }

  test("tokenCount: whitespace runs, blanks, empties") {
    assert(one("a b  c", TextFunctions.tokenCount) === 3)
    assert(one("  leading and trailing  ", TextFunctions.tokenCount) === 3)
    assert(one("", TextFunctions.tokenCount) === 0)
    assert(one("   ", TextFunctions.tokenCount) === 0)
    assert(one("one", TextFunctions.tokenCount) === 1)
  }

  test("distinctRatio and stopwordRatio") {
    assert(one("a a a b", TextFunctions.distinctRatio) === 0.5)
    assert(one("", TextFunctions.distinctRatio) === 0.0)
    assert(one("the cat sat", c => TextFunctions.stopwordRatio(c, Seq("the", "a"))) === 1.0 / 3)
    assert(one("", c => TextFunctions.stopwordRatio(c, Seq("the"))) === 0.0)
  }

  test("avgTokenLen") {
    assert(one("ab cdef", TextFunctions.avgTokenLen) === 3.0)
    assert(one("", TextFunctions.avgTokenLen) === 0.0)
  }

  test("qualityScore bounded in [0,1]") {
    import spark.implicits._
    val texts = Seq("", "short", "the the the the", ("varied words " * 60).trim)
    val vals = texts.toDF("text")
      .select(TextFunctions.qualityScore($"text").as("q"))
      .collect().map(_.getDouble(0))
    assert(vals.forall(v => v >= 0.0 && v <= 1.0), vals.toSeq)
  }

  test("fingerprint: normalization collapses case/whitespace variants") {
    val a = one("Hello   World", TextFunctions.fingerprint)
    val b = one("  hello world ", TextFunctions.fingerprint)
    val c = one("hello worlds", TextFunctions.fingerprint)
    assert(a === b)
    assert(a !== c)
  }

  test("langId: stopword-profile argmax, alphabetical tie-break") {
    assert(one("der hund und die katze ist da", TextFunctions.langId(_)) === "de")
    assert(one("the cat and the dog is here", TextFunctions.langId(_)) === "en")
    assert(one("el perro y la casa es grande que", TextFunctions.langId(_)) === "es")
    assert(one("le chat est pour la maison et", TextFunctions.langId(_)) === "fr")
    // no stopwords at all → all scores 0 → alphabetically first code
    assert(one("xyzzy quux", TextFunctions.langId(_)) === "de")
  }
}
