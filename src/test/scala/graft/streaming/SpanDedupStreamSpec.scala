package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.{OutputMode, Trigger}

class SpanDedupStreamSpec extends SparkSpec {
  import SpanDedupStream.{Doc, KeptSpan}

  /** Single-threaded replay of the q124 owner rule: first occurrence
    * over (doc_id, pos) order keeps the span.
    */
  private def expectedKept(docs: Seq[Doc], width: Int): Set[(Long, Int)] = {
    val seen = scala.collection.mutable.HashSet.empty[String]
    val out = scala.collection.mutable.Set.empty[(Long, Int)]
    docs.sortBy(_.doc_id).foreach { d =>
      graft.functions.TextFunctions.tokensScalar(d.text)
        .grouped(width).zipWithIndex.foreach { case (g, pos) =>
          if (seen.add(g.mkString(" "))) out += ((d.doc_id, pos))
        }
    }
    out.toSet
  }

  private def corpus: Seq[Doc] = {
    import graft.Tables
    Tables.documents(SparkSpec.session, "/root/testdata/sf0.001")
      .selectExpr("doc_id", "text")
      .collect().map(r => Doc(r.getLong(0), r.getString(1))).toSeq
      .sortBy(_.doc_id)
  }

  test("stream replay in doc order reproduces the batch q124 owner rule exactly") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val docs = corpus
    val mem = MemoryStream[Doc]
    val q = SpanDedupStream.keptSpans(mem.toDS(), width = 10, stateTtlMs = 0)
      .writeStream.format("memory").queryName("spandedup_out")
      .outputMode(OutputMode.Append).trigger(Trigger.ProcessingTime(0)).start()
    try {
      // three micro-batches: ownership must carry across batches via
      // state (a span kept in batch 1 must suppress batch 3 copies)
      docs.grouped(docs.length / 3 + 1).foreach { chunk =>
        mem.addData(chunk)
        q.processAllAvailable()
      }
      val got = spark.table("spandedup_out")
        .as[KeptSpan].collect().map(k => (k.doc_id, k.pos)).toSet
      val want = expectedKept(docs, 10)
      assert(got === want,
        s"got=${got.size} want=${want.size} onlyGot=${(got -- want).take(3)} " +
          s"onlyWant=${(want -- got).take(3)}")
      // the dup-saturated fixture must actually drop spans
      val total = docs.map(d =>
        (graft.functions.TextFunctions.tokensScalar(d.text).length + 9) / 10).sum
      assert(got.size < total, s"nothing deduped: $total spans, ${got.size} kept")
    } finally q.stop()
  }

  test("within-doc repeats drop; batch mode works; kept segs reassemble") {
    import spark.implicits._
    val docs = Seq(
      Doc(1L, ("alpha beta gamma delta epsilon zeta eta theta iota kappa " * 2).trim),
      Doc(2L, "alpha beta gamma delta epsilon zeta eta theta iota kappa entirely fresh words here now one two three four five")
    ).toDS()
    val kept = SpanDedupStream.keptSpans(docs, width = 10)
      .collect().sortBy(k => (k.doc_id, k.pos))
    // doc 1: span 0 kept, span 1 (identical 10 tokens) dropped
    assert(kept.count(_.doc_id == 1L) === 1)
    // doc 2: first span duplicates doc 1's → dropped; second is new
    val d2 = kept.filter(_.doc_id == 2L)
    assert(d2.map(_.pos).toSeq === Seq(1))
    assert(d2.head.seg === "entirely fresh words here now one two three four five")
  }
}
