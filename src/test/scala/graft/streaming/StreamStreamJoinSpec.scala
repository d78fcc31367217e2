package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, Trigger}

/** Stream-stream interval join — the §2.10 shape where BOTH sides are
  * unbounded: each side buffers state bounded by its watermark plus
  * the join's time interval, so "impressions ⋈ clicks within 10
  * minutes" holds O(interval) state per key instead of the full
  * history. Late rows beyond the watermark drop out of both buffer
  * and output — the exactly-bounded-state contract a 100 TB/day
  * event joiner depends on.
  */
class StreamStreamJoinSpec extends SparkSpec {

  private def ts(minute: Int) = new java.sql.Timestamp((1000L + minute) * 60000L)

  test("interval join matches within the window, watermark bounds state") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val impressions = MemoryStream[(Long, java.sql.Timestamp)]
    val clicks = MemoryStream[(Long, java.sql.Timestamp)]
    val imp = impressions.toDS().toDF("ad_id", "imp_ts")
      .withWatermark("imp_ts", "1 minute")
    val clk = clicks.toDS().toDF("click_ad", "click_ts")
      .withWatermark("click_ts", "1 minute")

    val joined = imp.join(clk,
      expr("""ad_id = click_ad AND
              click_ts >= imp_ts AND
              click_ts <= imp_ts + INTERVAL 10 MINUTES"""))

    val q = joined.writeStream.format("memory").queryName("attrib")
      .outputMode(OutputMode.Append).trigger(Trigger.ProcessingTime(0)).start()
    try {
      // impression at t0; clicks at +5 (match) and +20 (outside interval)
      impressions.addData((7L, ts(0)))
      clicks.addData((7L, ts(5)), (7L, ts(20)))
      q.processAllAvailable()
      // advance both watermarks far past the interval so results finalize
      impressions.addData((99L, ts(60)))
      clicks.addData((99L, ts(61)))
      q.processAllAvailable()
      impressions.addData((98L, ts(90)))
      clicks.addData((98L, ts(91)))
      q.processAllAvailable()

      val rows = spark.table("attrib")
        .select($"ad_id", $"imp_ts", $"click_ts").collect()
      val forAd7 = rows.filter(_.getLong(0) == 7L)
      assert(forAd7.length === 1, rows.mkString(", "))     // only the +5 click
      assert(forAd7.head.getTimestamp(2) === ts(5))
    } finally q.stop()
  }
}
