package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.{OutputMode, Trigger}

/** Big-state streaming: the default HDFS-backed state store holds
  * every key's state on the JVM heap — sessionizing millions of
  * users OOMs executors. RocksDB spills state to local disk with an
  * in-heap cache, which is how a 100 TB-scale stateful stream
  * actually runs. Same query code, one provider conf — this spec
  * proves the stateful sessionizer produces IDENTICAL results under
  * RocksDB, so the scale deployment is a config change, not a
  * rewrite.
  */
class RocksDbStateSpec extends SparkSpec {

  import Sessionize._

  private def ts(minute: Int) = new java.sql.Timestamp((1000L + minute) * 60000L)

  test("sessionization state survives and emits identically on RocksDB") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    try {
      spark.conf.set(key,
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
      val mem = MemoryStream[Event]
      val sessions = sessionizeStream(spark, mem.toDS(), gapMs = 5 * 60000L,
        watermark = "1 minute")
      val q = sessions.writeStream.format("memory").queryName("rocks_sessions")
        .outputMode(OutputMode.Append).trigger(Trigger.ProcessingTime(0)).start()
      try {
        mem.addData(Event(1L, ts(0), 1.0), Event(1L, ts(2), 2.0))
        q.processAllAvailable()
        assert(spark.table("rocks_sessions").count() === 0)   // open session in state

        // advance the watermark past lastTs+gap → timeout fires from
        // state that lives in RocksDB, not the heap
        mem.addData(Event(2L, ts(60), 5.0))
        q.processAllAvailable()
        mem.addData(Event(2L, ts(61), 1.0))
        q.processAllAvailable()

        val rows = spark.table("rocks_sessions").as[Session].collect()
        assert(rows.exists(s => s.user_id == 1L && s.n_events == 2 && s.sum_value == 3.0),
          rows.mkString(", "))
      } finally q.stop()
    } finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None    => spark.conf.unset(key)
    }
  }
}
