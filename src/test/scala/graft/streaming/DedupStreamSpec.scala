package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.{OutputMode, Trigger}


case class Doc(ts: java.sql.Timestamp, text: String)

class DedupStreamSpec extends SparkSpec {
  private def ts(minute: Int) = new java.sql.Timestamp((1000L + minute) * 60000L)

  test("streaming dedup: within-watermark duplicates dropped across batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Doc]
    val q = IncrementalIndex.dedupStream(mem.toDF(), "ts", "text", watermark = "30 minutes")
      .select("text")
      .writeStream.format("memory").queryName("dedup_out")
      .outputMode(OutputMode.Append).trigger(Trigger.ProcessingTime(0)).start()
    try {
      mem.addData(Doc(ts(0), "alpha"), Doc(ts(1), "alpha"), Doc(ts(2), "beta"))
      q.processAllAvailable()
      mem.addData(Doc(ts(3), "alpha"), Doc(ts(4), "gamma"))   // alpha still in state
      q.processAllAvailable()
      val texts = spark.table("dedup_out").as[String].collect().sorted
      assert(texts.toSeq === Seq("alpha", "beta", "gamma"))
    } finally q.stop()
  }

  test("batch mode: plain exact dedup") {
    import spark.implicits._
    val df = Seq(Doc(ts(0), "x"), Doc(ts(1), "x"), Doc(ts(2), "y")).toDF()
    assert(IncrementalIndex.dedupStream(df, "ts", "text").count() === 2)
  }
}
