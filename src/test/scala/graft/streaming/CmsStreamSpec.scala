package graft.streaming

import graft.SparkSpec
import graft.functions.CountMinSketch
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, Trigger}

/** The CMS aggregator's monoid property is exactly what incremental
  * (streaming) maintenance needs: per-batch sketches merged into a
  * running sketch in foreachBatch equal the one-shot sketch over the
  * full history — no reprocessing, O(d·w) state regardless of stream
  * length. This is the streaming face of the partitioning-invariance
  * property CountMinSketchSpec pins for batch.
  */
class CmsStreamSpec extends SparkSpec {

  test("foreachBatch-merged sketch equals the one-shot batch sketch") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[String]
    val running = new Array[Long](CountMinSketch.Depth * CountMinSketch.Width)
    val q = mem.toDF().toDF("word")
      .writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        val sk = batch.agg(CountMinSketch.sketch(col("word"))).head.getSeq[Long](0)
        var i = 0
        while (i < running.length) { running(i) += sk(i); i += 1 }  // monoid merge
        ()
      }
      .outputMode(OutputMode.Update).trigger(Trigger.ProcessingTime(0)).start()
    try {
      val batch1 = Seq.fill(30)("alpha") ++ Seq.fill(10)("beta") ++ Seq("gamma")
      val batch2 = Seq.fill(5)("alpha") ++ Seq.fill(20)("delta")
      mem.addData(batch1: _*)
      q.processAllAvailable()
      mem.addData(batch2: _*)
      q.processAllAvailable()

      val oneShot = (batch1 ++ batch2).toDF("word")
        .agg(CountMinSketch.sketch(col("word"))).head.getSeq[Long](0).toArray
      assert(running.toSeq === oneShot.toSeq)
      assert(CountMinSketch.estimate(running, "alpha") >= 35L)
      assert(CountMinSketch.estimate(running, "delta") >= 20L)
    } finally q.stop()
  }
}
