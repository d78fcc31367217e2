package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SprtSpec extends SparkSpec {
  import spark.implicits._

  // (arm, ts, id, success) rows
  private def df(rows: Seq[(String, Long, Long, Boolean)]) =
    rows.toDF("arm", "us", "eid", "ok")

  private def run(rows: Seq[(String, Long, Long, Boolean)]) =
    Sprt.decide(df(rows), "arm", "us", "eid", col("ok"))
      .as[(String, String, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap

  test("a pure-success arm accepts H1 at the first threshold crossing") {
    // llr after n successes = n·step; ln(19)/ln(11/9) = 14.67 ⇒ n=15
    val rows = (1L to 20L).map(i => ("a", i, i, true))
    val (dec, n, llr) = run(rows)("a")
    assert(dec === "accept_h1")
    assert(n === 15L)
    assert(llr === 15L * Sprt.LlrStepMicro)
  }

  test("a pure-failure arm accepts H0 symmetrically") {
    val rows = (1L to 20L).map(i => ("b", i, i, false))
    val (dec, n, llr) = run(rows)("b")
    assert(dec === "accept_h0")
    assert(n === 15L)
    assert(llr === -15L * Sprt.LlrStepMicro)
  }

  test("an alternating arm never crosses and reports its final state") {
    val rows = (1L to 30L).map(i => ("c", i, i, i % 2 == 0))
    val (dec, n, llr) = run(rows)("c")
    assert(dec === "continue")
    assert(n === 30L)
    assert(llr === 0L)   // 15 successes − 15 failures
  }

  test("arms are independent and the walk is layout invariant") {
    val rows = (1L to 20L).map(i => ("a", i, i, true)) ++
      (1L to 30L).map(i => ("c", i, i, i % 2 == 0))
    def via(parts: Int) =
      Sprt.decide(df(rows).repartition(parts), "arm", "us", "eid", col("ok"))
        .as[(String, String, Long, Long)].collect().toSeq.sorted
    assert(via(1) === via(11))
    assert(via(1).map(_._1) === Seq("a", "c"))
  }
}
