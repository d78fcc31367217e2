package graft.operators

import graft.SparkSpec

/** Rank-1 ALS (operators.Als): hand-computed first-round updates on a
  * tiny matrix, SSE monotonicity on a rank-1-structured matrix, and
  * layout invariance of the integer recurrence.
  */
class AlsSpec extends SparkSpec {

  test("hand-computed first round on a 2x2 matrix") {
    import spark.implicits._
    // cells: (c1,p1,6) (c1,p2,3) (c2,p1,4); v0 = 1000 everywhere
    // u1(c1) = (1e6*(6*1000+3*1000)) / (1e6+1e6) = 4500
    // u1(c2) = (1e6*4*1000) / 1e6 = 4000
    // v1(p1) = (1e6*(6*4500+4*4000)) / (4500^2+4000^2) = 43e9/36250000 = 1186
    // v1(p2) = (1e6*3*4500) / 4500^2 = 666  (13.5e9/20.25e6 = 666.66 -> 666)
    val cells = Seq((1L, 1L, 6L), (1L, 2L, 3L), (2L, 1L, 4L))
      .toDF("c", "p", "r")
    val out = Als.fitRank1(cells, "c", "p", "r", rounds = 1)
    assert(out.size === 1)
    val (round, su, sv, sse) = out.head
    assert(round === 1L)
    assert(su === 4500L + 4000L)
    assert(sv === 1186L + 666L)
    // sse: preds = (um*vm) DIV 1e6: c1p1=(4500*1186)/1e6=5, c1p2=(4500*666)/1e6=2,
    // c2p1=(4000*1186)/1e6=4 -> errors (1,1,0) -> sse=2
    assert(sse === 2L)
  }

  test("rank-1-structured matrix is recovered to quantization noise") {
    import spark.implicits._
    // r = a_c * b_p exactly (rank 1): ALS must fit it down to the
    // milli-quantization floor. SSE is NOT per-round monotone at that
    // floor (integer flooring loses ~1 count per cell per round, so
    // tiny SSEs oscillate) — the contract is recovery, not descent.
    val as = Map(1L -> 2L, 2L -> 5L, 3L -> 3L)
    val bs = Map(10L -> 4L, 11L -> 7L, 12L -> 2L)
    val cells = (for { (c, a) <- as.toSeq; (p, b) <- bs.toSeq }
      yield (c, p, a * b * 100L)).toDF("c", "p", "r")
    val out = Als.fitRank1(cells, "c", "p", "r", rounds = 3)
    val sig = (for { a <- as.values; b <- bs.values }
      yield { val r = a * b * 100L; r * r }).sum
    out.map(_._4).foreach { sse =>
      assert(sse < sig / 10000, s"SSE $sse not tiny vs signal $sig")
    }
  }

  test("layout invariance: repartitioned input yields identical rounds") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val cells = Seq.tabulate(60)(i =>
      (rnd.nextInt(8).toLong, (10 + rnd.nextInt(6)).toLong,
        (100 + rnd.nextInt(900)).toLong))
      .toDF("c", "p", "r")
      // duplicate keys collapse: fitRank1 expects one row per cell
      .groupBy("c", "p").agg(org.apache.spark.sql.functions.max("r").as("r"))
    val a = Als.fitRank1(cells, "c", "p", "r", rounds = 2)
    val b = Als.fitRank1(cells.repartition(7), "c", "p", "r", rounds = 2)
    assert(a === b)
  }
}
