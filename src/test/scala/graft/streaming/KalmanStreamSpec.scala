package graft.streaming

import java.sql.Date

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.{OutputMode, Trigger}

/** Streaming Kalman local-level (streaming.KalmanStream): bit-exact
  * parity with the BATCH operator under arbitrary ordered micro-batch
  * splits (the integer state admits zero drift), per-key isolation,
  * and the gain-annealing contract.
  */
class KalmanStreamSpec extends SparkSpec {
  import KalmanStream.{KIn, KOut}

  private def corpus(n: Int, key: String): Seq[KIn] =
    (0L until n.toLong).map { i =>
      KIn(key, eventId = i, day = i,
        xq = 50000L + ((i * 2654435761L) % 20000L))
    }

  private def drive(chunks: Seq[Seq[KIn]]): Seq[KOut] = {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val name = s"kal_out_${System.nanoTime()}"
    val mem = MemoryStream[KIn]
    val q = KalmanStream.levels(mem.toDS())
      .writeStream.format("memory").queryName(name)
      .outputMode(OutputMode.Append).trigger(Trigger.ProcessingTime(0)).start()
    try {
      chunks.foreach { c => mem.addData(c); q.processAllAvailable() }
      spark.table(name).as[KOut].collect().toSeq
    } finally q.stop()
  }

  test("ordered stream replay equals the batch operator bit-for-bit " +
    "across any split") {
    import spark.implicits._
    val rows = corpus(120, "a")
    // batch ground truth through the REAL batch operator: map day
    // ordinals onto real dates, then back
    val base = Date.valueOf("2024-01-01").toLocalDate
    val df = rows.map(r => (Date.valueOf(base.plusDays(r.day)), r.xq))
      .toDF("day", "xq")
    val batch = graft.operators.Kalman.localLevel(df, "day", "xq")
      .select("xq", "level", "resid", "k_micro")
      .as[(Long, Long, Long, Long)].collect().toSeq
    for (chunkSize <- Seq(7, 40, 120)) {
      val streamed = drive(rows.grouped(chunkSize).toSeq)
        .sortBy(_.day).map(o => (o.xq, o.level, o.resid, o.k_micro))
      assert(streamed == batch, s"split $chunkSize diverged")
    }
  }

  test("keys are isolated and the gain anneals monotonically to its " +
    "steady state") {
    val rows = corpus(60, "a") ++ corpus(60, "b").map(r =>
      r.copy(xq = r.xq + 1000000L))
    val out = drive(Seq(rows))
    val ka = out.filter(_.key == "a").sortBy(_.day).map(_.k_micro)
    assert(ka.head === 0L)                         // first obs: no correction
    ka.drop(1).sliding(2).foreach { w =>
      assert(w(1) <= w(0), s"gain rose: $ka")      // anneals downward
    }
    assert(ka.last > 0L && ka.last < ka(1), s"got $ka")
    // key b ran its own filter: same gain schedule, different levels
    val kb = out.filter(_.key == "b").sortBy(_.day).map(_.k_micro)
    assert(kb === ka, "gain schedule is data-independent per key")
  }
}
