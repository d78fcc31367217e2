package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.{OutputMode, Trigger}

/** [[HeavyHitterStream]] guarantees: exact parity with the batch
  * groupBy-count in the under-capacity regime (any split of the
  * stream), and the SpaceSaving error bounds — est ≥ true ≥ est−err,
  * untracked true counts ≤ min tracked counter — once evicting.
  */
class HeavyHitterStreamSpec extends SparkSpec {
  import HeavyHitterStream.Hit

  /** Drives `chunks` through a fresh stream; returns the LAST batch's
    * snapshot (tick = max tick). */
  private def drive(chunks: Seq[Seq[String]], capacity: Int): Seq[Hit] = {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val name = s"hh_out_${System.nanoTime()}"
    val mem = MemoryStream[String]
    val q = HeavyHitterStream.summary(mem.toDS(), capacity)
      .writeStream.format("memory").queryName(name)
      .outputMode(OutputMode.Append).trigger(Trigger.ProcessingTime(0)).start()
    try {
      chunks.foreach { c => mem.addData(c); q.processAllAvailable() }
      val all = spark.table(name).as[Hit].collect().toSeq
      val last = all.map(_.tick).max
      all.filter(_.tick == last)
    } finally q.stop()
  }

  test("under capacity: snapshot IS the exact count map, any split, err 0") {
    val words = Seq.fill(7)("a") ++ Seq.fill(5)("b") ++ Seq.fill(3)("c") ++ Seq("d")
    val shuffled = new scala.util.Random(5).shuffle(words)
    for (chunkSize <- Seq(1, 4, 16)) {
      val snap = drive(shuffled.grouped(chunkSize).toSeq, capacity = 8)
      assert(snap.forall(_.err == 0L))
      assert(snap.map(h => h.item -> h.est).toMap ===
        Map("a" -> 7L, "b" -> 5L, "c" -> 3L, "d" -> 1L))
    }
  }

  test("over capacity: est >= true >= est - err, and the heavy item survives") {
    // one dominant item among a churning tail of singletons
    val rnd = new scala.util.Random(9)
    val words = rnd.shuffle(
      Seq.fill(60)("heavy") ++ (1 to 80).map(i => s"tail$i"))
    val truth = words.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val snap = drive(words.grouped(10).toSeq, capacity = 10)
    assert(snap.size == 10)
    snap.foreach { h =>
      val t = truth.getOrElse(h.item, 0L)
      assert(h.est >= t, s"${h.item}: est ${h.est} < true $t")
      assert(h.est - h.err <= t, s"${h.item}: est-err ${h.est - h.err} > true $t")
    }
    // the dominant item is tracked and its lower bound proves dominance
    val heavy = snap.find(_.item == "heavy").get
    assert(heavy.est - heavy.err >= 50L)
    // any untracked item's true count is bounded by the min counter
    val minCounter = snap.map(_.est).min
    truth.keys.filterNot(snap.map(_.item).toSet).foreach { k =>
      assert(truth(k) <= minCounter)
    }
  }

  test("snapshot emission: each batch re-emits the full summary under its tick") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[String]
    val q = HeavyHitterStream.summary(mem.toDS(), capacity = 4)
      .writeStream.format("memory").queryName("hh_snap")
      .outputMode(OutputMode.Append).trigger(Trigger.ProcessingTime(0)).start()
    try {
      mem.addData("x", "y"); q.processAllAvailable()
      mem.addData("x"); q.processAllAvailable()
      val all = spark.table("hh_snap").as[Hit].collect().toSeq
      assert(all.filter(_.tick == 1L).map(h => h.item -> h.est).toMap ===
        Map("x" -> 1L, "y" -> 1L))
      assert(all.filter(_.tick == 2L).map(h => h.item -> h.est).toMap ===
        Map("x" -> 2L, "y" -> 1L))
    } finally q.stop()
  }
}
