package graft.streaming

import graft.SparkSpec
import graft.operators.Linkage
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, Trigger}

class LinkageStreamSpec extends SparkSpec {
  import LinkageStream._
  import spark.implicits._

  // ONE field definition in both forms: Column predicates for the
  // batch operator, scalar twins for the stream — identical m/u so
  // the integer weights coincide by construction.
  private val batchFields = Seq(
    Linkage.Field("name", "name",
      (a, b) => levenshtein(a, b) <= 1, m = 0.9, u = 0.05),
    Linkage.Field("city", "city", (a, b) => a === b, m = 0.8, u = 0.2))
  private val streamFields = Seq(
    ScalarField("name", (a, b) => Linkage.levenshteinScalar(a, b) <= 1, 0.9, 0.05),
    ScalarField("city", (a, b) => a == b, 0.8, 0.2))

  private val people = Seq(
    (1L, 1L, "jon smith", "berlin"),
    (2L, 1L, "jon smyth", "berlin"),   // near-dup of 1
    (3L, 1L, "maria lopez", "munich"),
    (4L, 2L, "wei chen", "lyon"),
    (5L, 2L, "wei chen", "lyon"))      // dup of 4

  test("scalar levenshtein matches Spark's column function") {
    val pairs = Seq(("abc", "abc"), ("abc", "abd"), ("", "xyz"),
      ("kitten", "sitting"), ("jon smith", "jon smyth"))
    val fromSpark = pairs.toDF("a", "b")
      .select(levenshtein($"a", $"b")).collect().map(_.getInt(0)).toSeq
    assert(pairs.map(p => Linkage.levenshteinScalar(p._1, p._2)) === fromSpark)
  }

  test("stream replay emits the batch operator's scoring pairs exactly") {
    implicit val sqlCtx = spark.sqlContext
    val minScore = 0L
    val batch = Linkage.fsPairs(
        people.toDF("id", "blk", "name", "city"), "id", Seq("blk"), batchFields)
      .filter($"fs_score" >= minScore)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(4))).toSet

    val mem = MemoryStream[LinkRec]
    val seen = scala.collection.mutable.Set[(Long, Long, Long)]()
    val q = linkPairs(mem.toDS(), streamFields, minScore, stateTtlMs = 0L)
      .writeStream
      .foreachBatch { (b: org.apache.spark.sql.Dataset[LinkPair], _: Long) =>
        b.collect().foreach(p => seen += ((p.id_a, p.id_b, p.fs_score)))
        ()
      }
      .outputMode(OutputMode.Append).trigger(Trigger.ProcessingTime(0)).start()
    try {
      val recs = people.map(p => LinkRec(p._1, p._2, Array(p._3, p._4)))
      mem.addData(recs.take(3): _*)
      q.processAllAvailable()
      mem.addData(recs.drop(3): _*)     // cross-batch pair (4,5)
      q.processAllAvailable()
      assert(seen.toSet === batch)
    } finally q.stop()
  }

  test("FIFO cap bounds state: flood forgets oldest, still links recent") {
    implicit val sqlCtx = spark.sqlContext
    val f = Seq(ScalarField("x", (a, b) => a == b, 0.9, 0.1))
    val mem = MemoryStream[LinkRec]
    val seen = scala.collection.mutable.Set[(Long, Long)]()
    val q = linkPairs(mem.toDS(), f, minScore = 0L, maxPerBlock = 3, stateTtlMs = 0L)
      .writeStream
      .foreachBatch { (b: org.apache.spark.sql.Dataset[LinkPair], _: Long) =>
        b.collect().foreach(p => seen += ((p.id_a, p.id_b))); ()
      }
      .outputMode(OutputMode.Append).trigger(Trigger.ProcessingTime(0)).start()
    try {
      mem.addData((0L until 6L).map(i => LinkRec(i, 1L, Array("same"))): _*)
      q.processAllAvailable()
      mem.addData(LinkRec(100L, 1L, Array("same")))
      q.processAllAvailable()
      // 100 links only against the 3 retained members (ids 3,4,5)
      assert(seen.filter(_._2 == 100L) === Set((3L, 100L), (4L, 100L), (5L, 100L)))
      assert(!seen.contains((0L, 100L)))
    } finally q.stop()
  }
}
