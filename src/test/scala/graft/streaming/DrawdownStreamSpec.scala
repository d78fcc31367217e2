package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.{OutputMode, Trigger}

/** Streaming drawdown (streaming.DrawdownStream): bit-exact parity
  * with the scalar cum/peak fold under arbitrary ordered micro-batch
  * splits, and state carry across batches.
  */
class DrawdownStreamSpec extends SparkSpec {
  import DrawdownStream.{DdIn, DdOut}

  private def corpus(n: Int): Seq[DdIn] =
    (0L until n.toLong).map { i =>
      val v = ((i * 2654435761L) % 9000L) - 4000L // signed daily deltas
      DdIn(key = s"k${i % 5}", eventId = i, day = i, xq = v)
    }

  /** Scalar ground truth per key, in (day, eventId) order. */
  private def batchFold(rows: Seq[DdIn]): Map[(String, Long), (Long, Long, Long)] =
    rows.groupBy(_.key).flatMap { case (k, rs) =>
      var cum = 0L
      var peak = Long.MinValue
      rs.sortBy(r => (r.day, r.eventId)).zipWithIndex.map { case (r, i) =>
        cum += r.xq
        peak = math.max(peak, cum)
        (k, i + 1L) -> (cum, peak, peak - cum)
      }
    }

  test("ordered stream replay equals the batch fold bit-for-bit") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val rows = corpus(400)
    val mem = MemoryStream[DdIn]
    val q = DrawdownStream.drawdowns(mem.toDS())
      .writeStream.format("memory").queryName("dd_out")
      .outputMode(OutputMode.Append).trigger(Trigger.ProcessingTime(0)).start()
    try {
      rows.sortBy(r => (r.day, r.eventId)).grouped(93).foreach { chunk =>
        mem.addData(chunk)
        q.processAllAvailable()
      }
      val streamed = spark.table("dd_out").as[DdOut].collect()
        .map(o => (o.key, o.rn) -> (o.cum, o.peak, o.dd)).toMap
      assert(streamed.size == rows.size)
      val batch = batchFold(rows)
      assert(streamed == batch,
        s"first divergence: ${batch.keySet.find(k => batch(k) != streamed.get(k).orNull)}")
    } finally q.stop()
  }

  test("drawdown is non-negative and resets at new highs") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val rows = Seq(
      DdIn("a", 0L, 0L, 10L), DdIn("a", 1L, 1L, -4L),
      DdIn("a", 2L, 2L, 7L), DdIn("a", 3L, 3L, -20L), DdIn("a", 4L, 4L, 2L))
    val mem = MemoryStream[DdIn]
    val q = DrawdownStream.drawdowns(mem.toDS())
      .writeStream.format("memory").queryName("dd_out2")
      .outputMode(OutputMode.Append).trigger(Trigger.ProcessingTime(0)).start()
    try {
      mem.addData(rows); q.processAllAvailable()
      val out = spark.table("dd_out2").as[DdOut].collect()
        .sortBy(_.rn).map(o => (o.cum, o.peak, o.dd)).toSeq
      assert(out == Seq(
        (10L, 10L, 0L), (6L, 10L, 4L), (13L, 13L, 0L),
        (-7L, 13L, 20L), (-5L, 13L, 18L)), s"got $out")
    } finally q.stop()
  }
}
