package graft.pipeline

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ChunkerSpec extends SparkSpec {

  test("char windows: widths, trailing-window filter, empty/null") {
    val c = CharWindowChunker(width = 10, minChars = 3)
    assert(c.chunk("a" * 25) === Seq("a" * 10, "a" * 10, "a" * 5))
    assert(c.chunk("a" * 13) === Seq("a" * 10, "a" * 3).filter(_.length > 3))
    assert(c.chunk("ab") === Seq.empty)       // below minChars
    assert(c.chunk("") === Seq.empty)
    assert(c.chunk(null) === Seq.empty)
    // exact multiple: no short trailing chunk
    assert(c.chunk("b" * 20) === Seq("b" * 10, "b" * 10))
  }

  test("reference 50-char filter semantics: strictly greater than") {
    val c = CharWindowChunker(width = 60, minChars = 50)
    assert(c.chunk("x" * 110).map(_.length) === Seq(60))   // trailing 50 dropped (not > 50)
    assert(c.chunk("x" * 111).map(_.length) === Seq(60, 51))
  }

  test("paragraph chunker: merges to target, drops short, trims") {
    val c = ParagraphChunker(targetChars = 30, minChars = 5)
    val text = "first para here\n\nsecond one\n\n\n  third  \n\nx"
    val out = c.chunk(text)
    assert(out.nonEmpty)
    assert(out.forall(_.length > 5))
    assert(out.mkString("\n").contains("first para here"))
    assert(!out.exists(_.contains("x\n")))    // the 1-char para never leads a chunk
    assert(c.chunk("") === Seq.empty)
    assert(c.chunk(null) === Seq.empty)
  }

  test("column chunker matches scala chunker element-for-element") {
    import spark.implicits._
    val texts = Seq(
      "w" * 499, "w" * 500, "", "short", ("ab " * 300).trim,
      (1 to 120).map(i => s"tok$i").mkString(" "),
      // newline-bearing: the column regex must be DOTALL or these diverge
      ("line one\nline two\n" * 30).trim,
      "a\n" * 260)
    val df = texts.toDF("text")
    val sparkSide = df
      .select(Chunker.filterShort(Chunker.charWindowChunks($"text", 200), 50).as("chunks"))
      .as[Seq[String]].collect()
    val scalaSide = texts.map(CharWindowChunker(200, 50).chunk)
    sparkSide.zip(scalaSide).foreach { case (a, b) => assert(a === b) }
  }
}
