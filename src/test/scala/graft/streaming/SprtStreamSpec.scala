package graft.streaming

import graft.SparkSpec
import graft.operators.Sprt
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, Trigger}

/** Streaming SPRT (streaming.SprtStream): the walk's first-crossing
  * state must be bit-equal to the batch operator's decision row, with
  * crossings falling mid-batch and decisions frozen across batch
  * boundaries.
  */
class SprtStreamSpec extends SparkSpec {
  import SprtStream.{SprtIn, SprtOut}

  private def trials(arm: String, n: Int, succOf: Int => Boolean) =
    (1 to n).map(i => SprtIn(arm, i.toLong, succOf(i)))

  private def runStream(rows: Seq[SprtIn], chunk: Int): Seq[SprtOut] = {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[SprtIn]
    val query = SprtStream.decisions(mem.toDS())
      .writeStream.format("memory").queryName("sprt_out")
      .outputMode(OutputMode.Append).trigger(Trigger.ProcessingTime(0)).start()
    try {
      rows.grouped(chunk).foreach { c =>
        mem.addData(c)
        query.processAllAvailable()
      }
      spark.table("sprt_out").as[SprtOut].collect().toSeq
    } finally query.stop()
  }

  test("stream first-crossing state equals the batch decide() row") {
    import spark.implicits._
    // arm a: deterministic pseudo-random walk that crosses; arm b:
    // alternating (never crosses)
    val rows = trials("a", 60, i => (i * 2654435761L % 97) < 60) ++
      trials("b", 40, i => i % 2 == 0)
    val streamed = runStream(rows, chunk = 7)
    // batch ground truth over the same trials
    val batchDf = rows.toSeq
      .toDF("arm", "rn", "succ")
      .select(col("arm"), col("rn").as("us"), col("rn").as("eid"), col("succ"))
    val batch = Sprt.decide(batchDf, "arm", "us", "eid", col("succ"))
      .as[(String, String, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    for (arm <- Seq("a", "b")) {
      val perArm = streamed.filter(_.arm == arm).sortBy(_.rn)
      val (dec, n, llr) = batch(arm)
      if (dec == "continue") {
        val last = perArm.last
        assert(last.decision === "continue")
        assert((last.n, last.llrMicro) === ((n, llr)))
      } else {
        // first emitted row carrying the decision = the crossing state
        val cross = perArm.find(_.decision != "continue").get
        assert((cross.decision, cross.n, cross.llrMicro) === ((dec, n, llr)))
      }
    }
  }

  test("a decision freezes: trials after the crossing re-emit the frozen state") {
    val rows = trials("c", 30, _ => true)   // crosses at n = 15
    val streamed = runStream(rows, chunk = 4).sortBy(_.rn)
    val after = streamed.filter(_.rn > 15)
    assert(after.nonEmpty)
    assert(after.forall(o =>
      o.decision == "accept_h1" && o.n == 15L &&
        o.llrMicro == 15L * Sprt.LlrStepMicro))
  }

  test("parity holds across different micro-batch splits") {
    val rows = trials("d", 50, i => (i * 11 % 13) < 7)
    def fingerprint(chunk: Int) =
      runStream(rows, chunk).sortBy(_.rn).map(o => (o.n, o.llrMicro, o.decision))
    assert(fingerprint(50) === fingerprint(3))
  }
}
