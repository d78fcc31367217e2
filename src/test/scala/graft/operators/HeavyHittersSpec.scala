package graft.operators

import graft.SparkSpec
import graft.functions.CountMinSketch
import org.apache.spark.sql.functions._

class HeavyHittersSpec extends SparkSpec {
  import spark.implicits._

  // skewed corpus: 3 heavy keys + a long singleton tail
  private def corpus() = (
    Seq.fill(1000)("alpha") ++ Seq.fill(800)("beta") ++ Seq.fill(500)("gamma") ++
      (0 until 8000).map(i => s"tail_$i")
  ).toDF("item")

  test("equals the naive exact plan at several thresholds") {
    val df = corpus()
    for (t <- Seq(1L, 100L, 500L, 900L, 2000L)) {
      val got = HeavyHitters.frequentExact(df, "item", t)
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      val want = df.groupBy($"item").agg(count(lit(1)).as("n"))
        .filter($"n" >= t)
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(got === want, s"threshold $t")
    }
  }

  test("the prefilter actually prunes the tail when minSupport >> eps*N") {
    val df = corpus()
    val sk = df.agg(CountMinSketch.sketch($"item")).head.getSeq[Long](0).toArray
    val surviving = df.as[String].collect()
      .count(i => CountMinSketch.estimate(sk, i) >= 500L)
    // true heavy mass is 2300 rows of 10300; collisions admit some
    // tail, but the shuffle must shrink by at least half
    assert(surviving < 5150, s"prefilter kept $surviving of 10300 rows")
    assert(surviving >= 2300, "superset property: all heavy rows survive")
  }

  test("overestimate-only invariant holds for every item on a random corpus") {
    // the foundation of the superset proof: est(x) >= true(x), always
    val rnd = new scala.util.Random(148)
    val items = Seq.fill(20000)(s"k${rnd.nextInt(3000)}")
    val df = items.toDF("item")
    val sk = df.agg(CountMinSketch.sketch($"item")).head.getSeq[Long](0).toArray
    val truth = items.groupBy(identity).view.mapValues(_.size.toLong)
    truth.foreach { case (k, n) =>
      assert(CountMinSketch.estimate(sk, k) >= n,
        s"estimate underestimated $k: ${CountMinSketch.estimate(sk, k)} < $n")
    }
  }

  test("layout invariance") {
    def run(parts: Int) = HeavyHitters.frequentExact(
        corpus().repartition(parts), "item", 500L)
      .orderBy($"item").collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(run(2) === run(13))
  }
}
