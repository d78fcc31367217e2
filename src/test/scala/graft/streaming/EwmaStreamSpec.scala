package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.{OutputMode, Trigger}

/** Streaming EWMA (streaming.EwmaStream): bit-exact parity with the
  * batch operator under arbitrary ordered micro-batch splits, and
  * state carry across batches.
  */
class EwmaStreamSpec extends SparkSpec {
  import EwmaStream.{EwmaIn, EwmaOut}

  /** Deterministic multi-user event stream (values via a hash mix). */
  private def corpus(n: Int): Seq[EwmaIn] =
    (0L until n.toLong).map { i =>
      val v = ((i * 2654435761L) % 10000L) - 3000L // centi-units, some negative
      EwmaIn(userId = i % 7, eventId = i, ts = i, xq = v)
    }

  test("ordered stream replay equals batch Ewma bit-for-bit") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val rows = corpus(350)
    // batch ground truth — same quantized inputs through Ewma.ewma's
    // value path: value = xq/100 reproduces xq under floor(v*100+1/2)
    val batchDf = rows
      .map(r => (r.userId, r.eventId, new java.sql.Timestamp(r.ts), r.xq / 100.0))
      .toDF("user_id", "event_id", "ts", "value")
    val batch = graft.operators.Ewma
      .ewma(batchDf, "user_id", "ts", "event_id", "value")
      .as[(Long, Long, Long, Long, Long)].collect()
      .map(t => (t._1, t._2) -> (t._3, t._4, t._5)).toMap

    val mem = MemoryStream[EwmaIn]
    val q = EwmaStream.smoothed(mem.toDS())
      .writeStream.format("memory").queryName("ewma_out")
      .outputMode(OutputMode.Append).trigger(Trigger.ProcessingTime(0)).start()
    try {
      // uneven splits at event-time boundaries
      rows.sortBy(r => (r.ts, r.eventId)).grouped(117).foreach { chunk =>
        mem.addData(chunk)
        q.processAllAvailable()
      }
      val streamed = spark.table("ewma_out").as[EwmaOut].collect()
        .map(e => (e.userId, e.rn) -> (e.eventId, e.xq, e.ewma)).toMap
      assert(streamed.size == rows.size)
      assert(streamed == batch,
        s"first divergence: ${batch.keySet.find(k => batch(k) != streamed.get(k).orNull)}")
    } finally q.stop()
  }

  test("negative xq quantization round-trip matches the batch quantizer") {
    // xq/100.0 must floor back to xq for negative centi-values too:
    // floor(-23.45*100 + 0.5) = floor(-2344.5...) — guard the fixture
    val xs = Seq(-2345L, -1L, 0L, 99L, 10007L)
    xs.foreach { xq =>
      val back = math.floor(xq / 100.0 * 100 + 0.5).toLong
      assert(back == xq, s"fixture quantization not a round-trip at $xq")
    }
  }
}
