package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, Trigger}

/** Streaming quantile sketch (streaming.QuantileStream): final
  * emission equals the batch QuantileSketch read-out bit-for-bit,
  * under ANY batch split and ANY arrival order — the monoid-state
  * parity, stronger than the ordered-recurrence contracts.
  */
class QuantileStreamSpec extends SparkSpec {
  import QuantileStream.{QIn, QOut}

  private val W = 50L
  private val pcts = Seq(50, 90, 99)

  private def corpus(n: Int): Seq[QIn] =
    (0L until n.toLong).map { i =>
      QIn(g = if (i % 3 == 0) "x" else "y",
        c = (i * 2654435761L) % 100000L)
    }

  private def batchReadout(rows: Seq[QIn]): Map[(String, Int), (Long, Long, Long)] = {
    import spark.implicits._
    val df = rows.toDF("g", "c")
    val state = graft.operators.QuantileSketch.sketch(df, Seq("g"), col("c"), W)
    graft.operators.QuantileSketch.quantiles(state, Seq("g"), pcts, W)
      .as[(String, Int, Long, Long, Long)].collect()
      .map(t => (t._1, t._2) -> (t._3, t._4, t._5)).toMap
  }

  private def streamReadout(rows: Seq[QIn], chunk: Int): Map[(String, Int), (Long, Long, Long)] = {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[QIn]
    val name = s"qs_out_$chunk"
    val q = QuantileStream.quantiles(mem.toDS(), W, pcts)
      .writeStream.format("memory").queryName(name)
      .outputMode(OutputMode.Append).trigger(Trigger.ProcessingTime(0)).start()
    try {
      rows.grouped(chunk).foreach { c => mem.addData(c); q.processAllAvailable() }
      val all = spark.table(name).as[QOut].collect()
      // last emission per (group, pct)
      all.groupBy(o => (o.g, o.pct)).map { case (k, os) =>
        val last = os.maxBy(_.batchSeq)
        k -> (last.n, last.targetRank, last.estCents)
      }
    } finally q.stop()
  }

  test("final streamed read-out equals batch sketch under uneven splits") {
    val rows = corpus(400)
    assert(streamReadout(rows, 137) === batchReadout(rows))
  }

  test("monoid state: shuffled arrival and different splits converge identically") {
    val rows = corpus(300)
    val shuffled = new scala.util.Random(11).shuffle(rows)
    val a = streamReadout(shuffled, 61)
    val b = streamReadout(rows, 299)
    assert(a === b)
    assert(a === batchReadout(rows))
  }
}
