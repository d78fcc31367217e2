package graft.streaming

import graft.SparkSpec
import graft.functions.HyperLogLog
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, Trigger}

/** Streaming distinct counting via the HLL register monoid — the
  * [[CmsStreamSpec]] discipline for the idempotent-max sketch:
  * per-batch registers max-merged into a running state in foreachBatch
  * equal the one-shot batch sketch over the full history. Idempotence
  * additionally makes the running count correct under REPLAYED batches
  * (at-least-once delivery), which the additive CMS is not — the
  * property a streaming unique-visitors counter actually relies on.
  */
class HllStreamSpec extends SparkSpec {

  test("foreachBatch max-merged registers equal the one-shot batch sketch") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Long]
    val running = new Array[Int](HyperLogLog.M)
    val q = mem.toDF().toDF("k")
      .writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        val sk = batch.agg(HyperLogLog.sketch(col("k"))).head.getSeq[Int](0)
        var i = 0
        while (i < running.length) {
          if (sk(i) > running(i)) running(i) = sk(i)   // idempotent max-merge
          i += 1
        }
        ()
      }
      .outputMode(OutputMode.Update).trigger(Trigger.ProcessingTime(0)).start()
    try {
      val batch1 = (0L until 400L) ++ (0L until 50L)      // in-batch dups
      val batch2 = (300L until 700L)                      // cross-batch overlap
      mem.addData(batch1: _*)
      q.processAllAvailable()
      mem.addData(batch2: _*)
      q.processAllAvailable()
      mem.addData(batch2: _*)                             // replayed delivery
      q.processAllAvailable()

      val oneShot = (batch1 ++ batch2).toDF("k")
        .agg(HyperLogLog.sketch(col("k"))).head.getSeq[Int](0)
      assert(running.toSeq === oneShot.toSeq)

      val est = running.toSeq.toDF("r")
        .agg(collect_list("r").as("regs"))
        .select(HyperLogLog.estimate(col("regs"))).head.getDouble(0)
      assert(math.abs(est - 700.0) / 700.0 < 0.10, s"estimate $est for n=700")
    } finally q.stop()
  }
}
