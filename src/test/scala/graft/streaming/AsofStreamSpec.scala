package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.{OutputMode, Trigger}

class AsofStreamSpec extends SparkSpec {
  import AsofStream.AsofIn

  /** Deterministic interleaved updates + events over 5 keys. */
  private def corpus(n: Int): Seq[AsofIn] =
    (0L until n.toLong).map { i =>
      val key = i % 5
      if (i % 3 == 0) AsofIn(key, i, 0, -1L, (i * 7 % 100).toDouble) // update
      else AsofIn(key, i, 1, i, 0.0)                                // event
    }

  test("in-order stream replay equals the batch as-of join") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val rows = corpus(300)
    // batch ground truth via the native batch operator
    val left = rows.filter(_.side == 1).map(r => (r.id, r.key, r.ts))
      .toDF("id", "k", "t")
    val right = rows.filter(_.side == 0).map(r => (r.key, r.ts, r.value))
      .toDF("k", "rt", "v")
    val batch = graft.plans.AsofJoinNative
      .asofJoin(left, right, "k", "t", "rt", Seq("v"))
      .collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(3)) None else Some(r.getDouble(3))))
      .toMap

    val mem = MemoryStream[AsofIn]
    val q = AsofStream.enriched(mem.toDS(), maxVersions = 1000)
      .writeStream.format("memory").queryName("asof_out")
      .outputMode(OutputMode.Append).trigger(Trigger.ProcessingTime(0)).start()
    try {
      rows.sortBy(_.ts).grouped(100).foreach { chunk =>
        mem.addData(chunk)
        q.processAllAvailable()
      }
      val streamed = spark.table("asof_out")
        .as[AsofStream.Enriched].collect()
        .map(e => e.id -> e.asof).toMap
      assert(streamed == batch,
        s"diverged at ${batch.keySet.find(k => batch(k) != streamed.get(k).flatten)}")
    } finally q.stop()
  }

  test("version ring caps state and binds older events to None") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[AsofIn]
    val q = AsofStream.enriched(mem.toDS(), maxVersions = 2)
      .writeStream.format("memory").queryName("asof_cap_out")
      .outputMode(OutputMode.Append).trigger(Trigger.ProcessingTime(0)).start()
    try {
      // three updates; ring keeps the last two (ts 20, 30)
      mem.addData(Seq(AsofIn(1L, 10L, 0, -1L, 1.0), AsofIn(1L, 20L, 0, -1L, 2.0),
        AsofIn(1L, 30L, 0, -1L, 3.0)))
      q.processAllAvailable()
      // a late event at ts 15 precedes every RETAINED version → None
      // (the documented cap trade); ts 25 binds mid-ring; ts 45 newest
      mem.addData(Seq(AsofIn(1L, 15L, 1, 100L, 0.0),
        AsofIn(1L, 25L, 1, 101L, 0.0), AsofIn(1L, 45L, 1, 102L, 0.0)))
      q.processAllAvailable()
      val got = spark.table("asof_cap_out")
        .as[AsofStream.Enriched].collect().map(e => e.id -> e.asof).toMap
      assert(got(100L) == None && got(101L) == Some(2.0) && got(102L) == Some(3.0))
    } finally q.stop()
  }
}
