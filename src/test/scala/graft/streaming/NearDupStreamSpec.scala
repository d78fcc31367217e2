package graft.streaming

import graft.SparkSpec
import graft.operators.Dedup.MinHasher
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.{OutputMode, Trigger}

class NearDupStreamSpec extends SparkSpec {
  import NearDupStream.Doc

  private val words = (1 to 60).map(i => s"w$i")
  private val base = words.mkString(" ")
  private val near = (words.dropRight(3) ++ Seq("x1", "x2", "x3")).mkString(" ")
  private val other = (1 to 60).map(i => s"z$i").mkString(" ")

  test("cross-batch near-dup detected via state; unrelated docs clean") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Doc]
    // stateTtlMs = 0: a TTL schedules timeout-only batches that spin
    // processAllAvailable under Trigger.ProcessingTime(0)
    val q = NearDupStream.nearDupPairs(mem.toDS(), threshold = 0.5, stateTtlMs = 0)
      .writeStream.format("memory").queryName("neardup_out")
      .outputMode(OutputMode.Append).trigger(Trigger.ProcessingTime(0)).start()
    try {
      mem.addData(Doc(1L, base), Doc(2L, other))
      q.processAllAvailable()
      assert(spark.table("neardup_out").count() === 0)   // nothing similar yet
      // doc 3 arrives LATER and must match doc 1 held in bucket state
      mem.addData(Doc(3L, near))
      q.processAllAvailable()
      val pairs = spark.table("neardup_out")
        .select($"id_a", $"id_b").distinct()
        .as[(Long, Long)].collect().toSet
      assert(pairs === Set((1L, 3L)))
    } finally q.stop()
  }

  test("batch mode: planted dups found, emissions bounded by the state cap") {
    import spark.implicits._
    val docs = Seq(Doc(1L, base), Doc(2L, near), Doc(3L, other), Doc(4L, base)).toDS()
    val pairs = NearDupStream.nearDupPairs(docs, threshold = 0.5)
      .toDF().dropDuplicates("id_a", "id_b")
      .as[(Long, Long, Double)].collect().map(p => (p._1, p._2)).toSet
    assert(pairs.contains((1L, 4L)) && pairs.contains((1L, 2L)))
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L))

    // boilerplate flood with a tiny cap: each arrival pairs with at
    // most cap retained members → unique pairs ≤ n·cap, not n²/2
    val flood = (1L to 200L).map(i => Doc(i, base)).toDS()
    val floodPairs = NearDupStream.nearDupPairs(flood, threshold = 0.5, maxPerBucket = 2)
      .toDF().dropDuplicates("id_a", "id_b").count()
    assert(floodPairs <= 200L * 2)
    assert(floodPairs >= 199L)   // every doc still linked to ≥1 predecessor
  }
}
