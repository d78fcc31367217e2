package graft.streaming

import java.sql.Date

import graft.SparkSpec
import graft.operators.{Cusum, LogReg}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.{OutputMode, Trigger}

/** Streaming CUSUM (streaming.CusumStream): bit-exact parity with
  * the batch operator when fed the batch-derived parameters, across
  * uneven micro-batch splits.
  */
class CusumStreamSpec extends SparkSpec {
  import CusumStream.{CusumIn, CusumOut}

  test("parameterized stream replay equals the in-sample batch detector") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val xs = (0 until 120).map(t => 100L + (t * 2654435761L) % 400L)
    // batch ground truth over a calendar series
    val batchDf = xs.zipWithIndex
      .map { case (x, t) => (new Date(86400000L * (20000 + t)), x) }
      .toDF("day", "xq")
    val batch = Cusum.detect(batchDf, "day", "xq")
      .select($"xq", $"su", $"sl", $"alarm")
      .as[(Long, Long, Long, Boolean)].collect().toSeq
    // the stream monitors against the SAME parameters the batch
    // derived in-sample
    val mu = LogReg.fdiv(xs.sum, xs.length.toLong)
    val mem = MemoryStream[CusumIn]
    val query = CusumStream.alarms(mem.toDS(), mu,
        LogReg.fdiv(mu, Cusum.SlackDen), LogReg.fdiv(mu, Cusum.ThreshDen))
      .writeStream.format("memory").queryName("cusum_out")
      .outputMode(OutputMode.Append).trigger(Trigger.ProcessingTime(0)).start()
    try {
      xs.zipWithIndex.map { case (x, t) => CusumIn(1L, t.toLong, x) }
        .grouped(37).foreach { chunk =>
          mem.addData(chunk)
          query.processAllAvailable()
        }
      val streamed = spark.table("cusum_out").as[CusumOut].collect()
        .sortBy(_.rn).map(o => (o.xq, o.su, o.sl, o.alarm)).toSeq
      assert(streamed == batch, "stream must replay the batch recurrence")
    } finally query.stop()
  }
}
