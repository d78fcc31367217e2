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

  test("slidingWindowChunks: overlap, full coverage, reconstruction") {
    import spark.implicits._
    val text = ('a' to 'z').mkString * 20   // 520 chars
    val chunks = Seq(Tuple1(text)).toDF("text")
      .select(Chunker.slidingWindowChunks($"text", 200, 150).as("c"))
      .as[Seq[String]].head
    // starts at 0,150,300; last start k=ceil(320/150)=3 -> 4 windows
    assert(chunks.length === 4)
    assert(chunks.take(3).forall(_.length === 200))
    assert(chunks(3).length === 520 - 450)
    // consecutive windows share width-stride = 50 chars
    chunks.sliding(2).zipWithIndex.foreach { case (Seq(a, b), _) =>
      assert(a.takeRight(50) === b.take(50))
    }
    // stride-prefixes + final window reconstruct the document exactly
    val rebuilt = chunks.dropRight(1).map(_.take(150)).mkString + chunks.last
    assert(rebuilt === text)
  }

  test("slidingWindowChunks edges: short text one window, empty/null none") {
    import spark.implicits._
    val got = Seq(Tuple1("short"), Tuple1(""), Tuple1(null: String))
      .toDF("text")
      .select(Chunker.slidingWindowChunks($"text", 200, 150).as("c"))
      .as[Option[Seq[String]]].collect()
    assert(got(0) === Some(Seq("short")))
    assert(got(1) === Some(Seq.empty))
    assert(got(2) === Some(Seq.empty))
  }
}
