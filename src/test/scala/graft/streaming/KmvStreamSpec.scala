package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.{OutputMode, Trigger}

import graft.operators.Sampling

/** Streaming KMV (streaming.KmvStream): final emission equals the
  * batch k-minimum-values read-out exactly under any split, any
  * order, AND duplicated (at-least-once) delivery — the
  * idempotent-monoid parity of HllStreamSpec, applied to the
  * order-statistic sketch.
  */
class KmvStreamSpec extends SparkSpec {
  import KmvStream.{KmvIn, KmvOut}

  private val K = 16

  private def corpus(n: Int): Seq[KmvIn] =
    (0L until n.toLong).map { i =>
      // repeated keys on purpose: distinct ≠ rows
      KmvIn(g = if (i % 2 == 0) "x" else "y", key = (i * 37L) % 900L)
    }

  /** Batch twin computed scalar-side: k smallest distinct hashes. */
  private def batchReadout(rows: Seq[KmvIn]): Map[String, (Long, Long, Long)] =
    rows.groupBy(_.g).map { case (g, rs) =>
      val mins = rs.map(r => Sampling.hashBitsScalar(r.key))
        .distinct.sorted.take(K)
      val kk = mins.length.toLong
      val hk = mins.last
      g -> (kk, hk, KmvStream.estimateScalar(kk, hk))
    }

  private def streamReadout(
      rows: Seq[KmvIn], chunk: Int, tag: String): Map[String, (Long, Long, Long)] = {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[KmvIn]
    val name = s"kmv_out_$tag"
    val q = KmvStream.distinctCounts(mem.toDS(), K)
      .writeStream.format("memory").queryName(name)
      .outputMode(OutputMode.Append).trigger(Trigger.ProcessingTime(0)).start()
    try {
      rows.grouped(chunk).foreach { c => mem.addData(c); q.processAllAvailable() }
      spark.table(name).as[KmvOut].collect()
        .groupBy(_.g).map { case (g, os) =>
          val last = os.maxBy(_.batchSeq)
          g -> (last.kk, last.hk, last.est)
        }
    } finally q.stop()
  }

  test("final streamed min-set equals the batch sketch (kk, hk, estimate)") {
    val rows = corpus(700)
    assert(streamReadout(rows, 173, "a") === batchReadout(rows))
  }

  test("idempotent monoid: shuffled AND duplicated delivery converge identically") {
    val rows = corpus(500)
    val r = new scala.util.Random(7)
    val dirty = r.shuffle(rows ++ rows.take(200))   // at-least-once replay
    assert(streamReadout(dirty, 97, "b") === batchReadout(rows))
  }

  test("estimate is within 2x of truth at k=16 over 450 distinct keys") {
    // k=16 carries ~27% relative std error (1/sqrt(k-2)); the 2x
    // band checks the estimator is wired right, not its variance
    val rows = corpus(900)                          // 450 distinct per group
    batchReadout(rows).foreach { case (_, (kk, _, est)) =>
      assert(kk == K)
      assert(est > 450 / 2 && est < 450 * 2, s"est $est")
    }
  }
}
