package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

import scala.util.Random

class CountMinSketchSpec extends SparkSpec {
  import spark.implicits._

  // Zipf-ish corpus: word_i appears ~N/i times
  private lazy val corpus: Seq[String] = {
    val rnd = new Random(5)
    val words = (1 to 200).flatMap(i => Seq.fill(2000 / i)(s"w$i"))
    rnd.shuffle(words)
  }

  test("estimates never underestimate and respect the eps*N bound") {
    val df = corpus.toDF("word")
    val sk = df.agg(CountMinSketch.sketch($"word").as("sk"))
    val exact = corpus.groupBy(identity).map { case (w, ws) => w -> ws.size.toLong }
    val est = df.distinct()
      .crossJoin(sk)
      .select($"word", CountMinSketch.estimateCol($"sk", $"word").as("est"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val n = corpus.size
    val epsN = math.E / CountMinSketch.Width * n
    exact.foreach { case (w, c) =>
      assert(est(w) >= c, s"$w underestimated: ${est(w)} < $c")
      assert(est(w) <= c + math.max(epsN * 6, 8),
        s"$w error too large: ${est(w)} vs $c (epsN=$epsN)")
    }
  }

  test("sketch is partitioning-invariant (mergeable monoid)") {
    val a = corpus.toDF("word").repartition(1)
      .agg(CountMinSketch.sketch($"word")).head.getSeq[Long](0)
    val b = corpus.toDF("word").repartition(17)
      .agg(CountMinSketch.sketch($"word")).head.getSeq[Long](0)
    assert(a === b)
  }

  test("total mass per row equals N; unseen items bounded by collisions only") {
    val df = corpus.toDF("word")
    val sk = df.agg(CountMinSketch.sketch($"word")).head.getSeq[Long](0).toArray
    val n = corpus.size.toLong
    (0 until CountMinSketch.Depth).foreach { r =>
      val rowMass = (0 until CountMinSketch.Width)
        .map(i => sk(r * CountMinSketch.Width + i)).sum
      assert(rowMass === n)
    }
    // an item never inserted reads only collision mass
    val unseen = CountMinSketch.estimate(sk, "never-inserted-item")
    assert(unseen <= math.E / CountMinSketch.Width * n * 6 + 8)
  }
}
