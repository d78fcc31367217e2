package graft.streaming

import graft.SparkSpec
import graft.operators.TextSearch
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.{OutputMode, Trigger}

/** Stream ≡ batch parity for [[Bm25Stream]] against
  * `TextSearch.bm25TopK` (q52's batch operator): after any split of
  * the document stream, the LAST batch's complete top-k emission must
  * equal the batch scores over the same documents — rounded-before-
  * ordered scores make the comparison exact, the same argument the
  * batch operator makes for its DuckDB oracle.
  */
class Bm25StreamSpec extends SparkSpec {
  import Bm25Stream.{Doc, Hit}

  private val query = Seq("spark", "shuffle", "join")
  private val K = 5

  private def corpus(n: Int, seed: Int): Seq[(Long, String)] = {
    val rnd = new scala.util.Random(seed)
    val vocab = Vector("spark", "shuffle", "join", "scan", "agg", "the",
      "a", "data", "rows", "broadcast")
    (1 to n).map { i =>
      val words = Seq.fill(3 + rnd.nextInt(20))(vocab(rnd.nextInt(vocab.size)))
      (i.toLong, words.mkString(" "))
    }
  }

  private def batchTopK(docs: Seq[(Long, String)]): Seq[(Long, Double, Long)] = {
    import spark.implicits._
    TextSearch.bm25TopK(docs.toDF("doc_id", "text"), "doc_id", "text", query, K)
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2))).toSeq
  }

  private def drive(chunks: Seq[Seq[(Long, String)]],
      maxDocs: Int = 1 << 20): Seq[Hit] = {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val name = s"bm25_out_${System.nanoTime()}"
    val mem = MemoryStream[Doc]
    val q = Bm25Stream.topKAssignments(mem.toDS(), query, K, maxDocs = maxDocs)
      .writeStream.format("memory").queryName(name)
      .outputMode(OutputMode.Append).trigger(Trigger.ProcessingTime(0)).start()
    try {
      chunks.foreach { chunk =>
        mem.addData(chunk.map { case (id, t) => Doc(id, t) })
        q.processAllAvailable()
      }
      spark.table(name).as[Hit].collect().toSeq
    } finally q.stop()
  }

  private def lastBatch(rows: Seq[Hit]): Seq[(Long, Double, Long)] = {
    val t = rows.map(_.tick).max
    rows.filter(_.tick == t).sortBy(_.rank).map(h => (h.id, h.score, h.nHit))
  }

  test("single batch equals the batch operator") {
    val docs = corpus(40, seed = 7)
    assert(lastBatch(drive(Seq(docs))) === batchTopK(docs))
  }

  test("random splits converge to the batch top-k; every batch emits a full refresh") {
    val docs = corpus(60, seed = 11)
    val rnd = new scala.util.Random(3)
    var rest = docs
    val chunks = scala.collection.mutable.ArrayBuffer.empty[Seq[(Long, String)]]
    while (rest.nonEmpty) {
      val n = 1 + rnd.nextInt(7)
      chunks += rest.take(n); rest = rest.drop(n)
    }
    val rows = drive(chunks.toSeq)
    assert(lastBatch(rows) === batchTopK(docs))
    // each tick is a complete standing-query refresh: ranks 1..min(k, hits)
    rows.groupBy(_.tick).foreach { case (t, hs) =>
      assert(hs.map(_.rank).sorted === (1 to hs.size), s"tick $t not a full refresh")
    }
  }

  test("re-delivered document is an idempotent upsert; an UPDATED text re-scores") {
    val docs = corpus(30, seed = 23)
    val replay = drive(Seq(docs, docs.take(10)))
    assert(lastBatch(replay) === batchTopK(docs))
    // update: doc 1 becomes a pure query-term document and must win
    val updated = (1L, "spark shuffle join spark shuffle join")
    val rows = drive(Seq(docs, Seq(updated)))
    val expect = batchTopK(docs.filterNot(_._1 == 1L) :+ updated)
    assert(lastBatch(rows) === expect)
    assert(lastBatch(rows).head._1 === 1L)
  }

  test("cap evicts least-recently-touched docs; scores exact for the tracked corpus") {
    val old = corpus(20, seed = 31)
    val fresh = corpus(20, seed = 37).map { case (id, t) => (id + 100L, t) }
    val rows = drive(Seq(old, fresh), maxDocs = 20)
    assert(lastBatch(rows) === batchTopK(fresh),
      "after eviction the standing query must score exactly the surviving docs")
  }
}
