package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.{OutputMode, Trigger}

/** Stream ≡ batch parity for [[AttributionStream]] against the q212
  * per-user journey semantics: in-order splits of the event stream,
  * folded through a user-keyed upsert, converge to the batch
  * (first touch, last touch, touch count, converted) frame; the
  * first purchase freezes the journey.
  */
class AttributionStreamSpec extends SparkSpec {
  import AttributionStream.{Journey, Touch}

  private def upsert(rows: Seq[Journey]): Map[Long, Journey] =
    rows.foldLeft(Map.empty[Long, Journey]) { case (m, j) => m + (j.user_id -> j) }

  /** Batch twin: q212's per-user fold over the full event list. */
  private def batch(events: Seq[Touch]): Map[Long, Journey] =
    events.groupBy(_.user_id).map { case (u, es) =>
      val sorted = es.sortBy(t => (t.us, t.event_id))
      val cut = sorted.indexWhere(_.event_type == "purchase")
      val touches = if (cut >= 0) sorted.take(cut)
        else sorted.filter(_.event_type != "purchase")
      u -> Journey(u, cut >= 0, touches.size,
        touches.headOption.map(_.event_type).getOrElse(""),
        touches.lastOption.map(_.event_type).getOrElse(""))
    }

  private def drive(chunks: Seq[Seq[Touch]]): Seq[Journey] = {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val name = s"attr_out_${System.nanoTime()}"
    val mem = MemoryStream[Touch]
    val q = AttributionStream.journeys(mem.toDS())
      .writeStream.format("memory").queryName(name)
      .outputMode(OutputMode.Append).trigger(Trigger.ProcessingTime(0)).start()
    try {
      chunks.foreach { c => mem.addData(c); q.processAllAvailable() }
      spark.table(name).as[Journey].collect().toSeq
    } finally q.stop()
  }

  test("cross-batch freeze: the first purchase locks first/last/count") {
    val evs = Seq(
      Touch(1L, 10L, 1L, "view"), Touch(1L, 20L, 2L, "click"),
      Touch(1L, 30L, 3L, "purchase"),
      Touch(1L, 40L, 4L, "view"),          // post-conversion: ignored
      Touch(2L, 15L, 5L, "signup"))        // never converts
    val got = upsert(drive(evs.grouped(2).toSeq))
    assert(got === batch(evs))
    assert(got(1L) === Journey(1L, converted = true, 2L, "view", "click"))
    assert(got(2L) === Journey(2L, converted = false, 1L, "signup", "signup"))
  }

  test("random in-order journeys over random splits ≡ batch fold") {
    val rnd = new scala.util.Random(17)
    val types = Seq("view", "click", "signup", "error", "purchase")
    val evs = (1L to 200L).map { i =>
      Touch(rnd.nextInt(12).toLong, i * 10, i, types(rnd.nextInt(types.size)))
    }
    // in-order arrival: chunks respect global event-time order
    var rest = evs
    val chunks = scala.collection.mutable.ArrayBuffer.empty[Seq[Touch]]
    while (rest.nonEmpty) {
      val n = 1 + rnd.nextInt(20)
      chunks += rest.take(n); rest = rest.drop(n)
    }
    assert(upsert(drive(chunks.toSeq)) === batch(evs))
  }

  test("unchanged journeys emit nothing (post-freeze batches are silent)") {
    val evs1 = Seq(Touch(7L, 1L, 1L, "click"), Touch(7L, 2L, 2L, "purchase"))
    val evs2 = Seq(Touch(7L, 3L, 3L, "view")) // ignored post-freeze
    val all = drive(Seq(evs1, evs2))
    assert(all.size === 1) // only the first batch emitted for user 7
  }
}
