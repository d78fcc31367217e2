package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, Trigger}

/** Streaming HLL (streaming.HllStream): final emission equals the
  * batch sketch read-out exactly under any split, any order, AND
  * duplicated (at-least-once) delivery — the idempotent-monoid
  * parity, the strongest contract in the streaming family.
  */
class HllStreamSpec extends SparkSpec {
  import HllStream.{HllIn, HllOut}

  private def corpus(n: Int): Seq[HllIn] =
    (0L until n.toLong).map { i =>
      // repeated keys on purpose: distinct ≠ rows
      HllIn(g = if (i % 2 == 0) "x" else "y", key = (i * 37L) % 900L)
    }

  private def batchReadout(rows: Seq[HllIn]): Map[String, (Double, Long, Long)] = {
    import spark.implicits._
    import graft.functions.HyperLogLog
    rows.toDF("g", "key")
      .groupBy($"g").agg(HyperLogLog.sketch($"key").as("regs"))
      .select($"g", HyperLogLog.estimate($"regs").as("est"),
        HyperLogLog.sumRho($"regs").as("sr"), HyperLogLog.vZero($"regs").as("vz"))
      .as[(String, Double, Long, Long)].collect()
      .map(t => t._1 -> (t._2, t._3, t._4)).toMap
  }

  private def streamReadout(rows: Seq[HllIn], chunk: Int, tag: String): Map[String, (Double, Long, Long)] = {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[HllIn]
    val name = s"hll_out_$tag"
    val q = HllStream.distinctCounts(mem.toDS())
      .writeStream.format("memory").queryName(name)
      .outputMode(OutputMode.Append).trigger(Trigger.ProcessingTime(0)).start()
    try {
      rows.grouped(chunk).foreach { c => mem.addData(c); q.processAllAvailable() }
      spark.table(name).as[HllOut].collect()
        .groupBy(_.g).map { case (g, os) =>
          val last = os.maxBy(_.batchSeq)
          g -> (last.est, last.sumRho, last.vZero)
        }
    } finally q.stop()
  }

  test("final streamed registers equal the batch sketch (estimate + checksums)") {
    val rows = corpus(700)
    assert(streamReadout(rows, 173, "a") === batchReadout(rows))
  }

  test("idempotent monoid: shuffled AND duplicated delivery converge identically") {
    val rows = corpus(500)
    val r = new scala.util.Random(7)
    val dirty = r.shuffle(rows ++ rows.take(200))   // at-least-once replay
    assert(streamReadout(dirty, 97, "b") === batchReadout(rows))
  }
}
