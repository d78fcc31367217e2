package graft.streaming

import java.sql.Date

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.{OutputMode, Trigger}

/** Streaming Holt level+trend (streaming.HoltStream): bit-exact
  * parity with the BATCH operator under arbitrary ordered
  * micro-batch splits, per-key isolation, and trend pickup on a
  * ramp.
  */
class HoltStreamSpec extends SparkSpec {
  import HoltStream.{HIn, HOut}

  private val AlphaDen = 4L
  private val BetaDen = 8L

  private def corpus(n: Int, key: String): Seq[HIn] =
    (0L until n.toLong).map { i =>
      HIn(key, eventId = i, day = i,
        xq = 50000L + 300L * i + ((i * 2654435761L) % 9000L))
    }

  private def drive(chunks: Seq[Seq[HIn]]): Seq[HOut] = {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val name = s"holt_out_${System.nanoTime()}"
    val mem = MemoryStream[HIn]
    val q = HoltStream.smooth(mem.toDS(), AlphaDen, BetaDen)
      .writeStream.format("memory").queryName(name)
      .outputMode(OutputMode.Append).trigger(Trigger.ProcessingTime(0)).start()
    try {
      chunks.foreach { c => mem.addData(c); q.processAllAvailable() }
      spark.table(name).as[HOut].collect().toSeq
    } finally q.stop()
  }

  test("ordered stream replay equals the batch operator bit-for-bit " +
    "across any split") {
    import spark.implicits._
    val rows = corpus(120, "a")
    val base = Date.valueOf("2024-01-01").toLocalDate
    val df = rows.map(r => (Date.valueOf(base.plusDays(r.day)), r.xq))
      .toDF("day", "xq")
    val batch = graft.operators.Holt.smooth(df, "day", "xq", AlphaDen, BetaDen)
      .select("xq", "level", "trend", "forecast")
      .as[(Long, Long, Long, Long)].collect().toSeq
    for (chunkSize <- Seq(7, 40, 120)) {
      val streamed = drive(rows.grouped(chunkSize).toSeq)
        .sortBy(_.day).map(o => (o.xq, o.level, o.trend, o.forecast))
      assert(streamed == batch, s"split $chunkSize diverged")
    }
  }

  test("keys are isolated and the trend locks onto a clean ramp") {
    val ramp = (0L until 50L).map(i =>
      HIn("r", eventId = i, day = i, xq = 1000L + 40L * i))
    val flat = (0L until 50L).map(i =>
      HIn("f", eventId = i, day = i, xq = 777L))
    val out = drive(Seq(ramp ++ flat))
    val r = out.filter(_.key == "r").sortBy(_.day)
    // on an exact ramp the trend converges NEAR the slope (fdiv
    // floors leave a small standing residual, so the equilibrium sits
    // just below 40) and the one-step forecast lands within one
    // residual quantum of the next observation
    assert(r.last.trend >= 36L && r.last.trend <= 40L,
      s"got ${r.last.trend}")
    assert(math.abs(r.last.forecast - (r.last.xq + 40L)) < 40L,
      s"forecast ${r.last.forecast} vs ${r.last.xq + 40L}")
    val f = out.filter(_.key == "f").sortBy(_.day)
    assert(f.last.level == 777L && f.last.trend == 0L)
  }
}
