package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Replayable fixed-resolution quantile sketch: read-out error bound
  * vs the exact order statistic, monoid mergeability (union-then-
  * sketch ≡ sketch-then-merge), and W = 1 degenerating to the exact
  * percentile.
  */
class QuantileSketchSpec extends SparkSpec {
  import spark.implicits._

  private val W = 50L
  private val pcts = Seq(10, 50, 90, 99)

  // deterministic skewed fixture: cents in [0, ~126k)
  private def cents(seed: Int, n: Int): Seq[Long] = {
    val r = new scala.util.Random(seed)
    Seq.fill(n)((math.pow(10, 1 + 4 * r.nextDouble()).toLong + r.nextInt(1000)))
  }

  private def toDf(xs: Seq[Long]) =
    xs.zipWithIndex.map { case (c, i) => (if (i % 2 == 0) "A" else "B", c) }
      .toDF("g", "c")

  test("estimate within [0, W) above the exact rank-⌈pct·n/100⌉ order statistic") {
    val xs = cents(7, 5000)
    val df = toDf(xs)
    val state = QuantileSketch.sketch(df, Seq("g"), col("c"), W)
    val got = QuantileSketch.quantiles(state, Seq("g"), pcts, W)
      .as[(String, Int, Long, Long, Long)].collect()
    assert(got.length === pcts.size * 2)
    val byGroup = df.as[(String, Long)].collect().groupBy(_._1)
      .map { case (g, rows) => g -> rows.map(_._2).sorted }
    got.foreach { case (g, pct, n, rank, est) =>
      val sorted = byGroup(g)
      assert(n === sorted.length.toLong)
      assert(rank === (pct.toLong * n + 99) / 100)
      val exact = sorted((rank - 1).toInt)     // 1-based type-1 order stat
      assert(est - exact >= 0 && est - exact < W,
        s"g=$g pct=$pct est=$est exact=$exact")
    }
  }

  test("merge is the monoid op: union-then-sketch ≡ sketch-then-merge") {
    val a = toDf(cents(1, 1200))
    val b = toDf(cents(2, 800))
    val direct = QuantileSketch.sketch(a.unionAll(b), Seq("g"), col("c"), W)
    val merged = QuantileSketch.merge(
      QuantileSketch.sketch(a, Seq("g"), col("c"), W),
      QuantileSketch.sketch(b, Seq("g"), col("c"), W), Seq("g"))
    val key = (df: org.apache.spark.sql.DataFrame) =>
      df.select($"g", $"bucket", $"cnt".cast("long"))
        .as[(String, Long, Long)].collect().toSet
    assert(key(direct) === key(merged))
    // and the read-outs agree exactly
    val q1 = QuantileSketch.quantiles(direct, Seq("g"), pcts, W).collect().toSeq
    val q2 = QuantileSketch.quantiles(merged, Seq("g"), pcts, W).collect().toSeq
    assert(q1 === q2)
  }

  test("W = 1 degenerates to the exact percentile") {
    val xs = cents(3, 999)
    val df = toDf(xs)
    val state = QuantileSketch.sketch(df, Seq("g"), col("c"), 1L)
    val got = QuantileSketch.quantiles(state, Seq("g"), pcts, 1L)
      .as[(String, Int, Long, Long, Long)].collect()
    val byGroup = df.as[(String, Long)].collect().groupBy(_._1)
      .map { case (g, rows) => g -> rows.map(_._2).sorted }
    got.foreach { case (g, _, _, rank, est) =>
      assert(est === byGroup(g)((rank - 1).toInt))
    }
  }
}
