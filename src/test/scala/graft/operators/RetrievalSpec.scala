package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Retrieval training-data ops (operators.Retrieval): hard-negative
  * label discipline and ranking, MMR seed/diversity behavior, and
  * integer determinism across layouts.
  */
class RetrievalSpec extends SparkSpec {

  private val dim = 8

  /** Two labeled clusters far apart + per-row jitter; label 1 sits at
    * the origin-side cluster. No RNG (SURVEY §7.4).
    */
  private def corpus(n: Int): DataFrame = {
    import spark.implicits._
    (0L until n.toLong).map { i =>
      val lab = (i % 2).toInt
      val v = Array.tabulate(dim) { j =>
        val base = if (j == 0) (if (lab == 0) 0.0f else 8.0f) else 0.0f
        base + (((i * 2654435761L + j * 40503L) % 1000L) / 10000.0f)
      }
      (i, v, lab)
    }.toDF("vec_id", "embedding", "label")
  }

  test("hard negatives always carry a different label, ranked by distance") {
    val out = Retrieval.hardNegatives(corpus(200), "vec_id", "embedding",
      "label", probeRate = 0.05, salt = 3L, k = 5)
    val rows = out.collect()
    assert(rows.nonEmpty)
    val probeLabels = corpus(200).select(col("vec_id"), col("label"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    rows.foreach { r =>
      val (qid, negId) = (r.getLong(0), r.getLong(1))
      assert(probeLabels(negId) != probeLabels(qid),
        s"negative $negId shares probe $qid's label")
    }
    // ranks are dense 1..5 per probe and distances non-decreasing
    rows.groupBy(_.getLong(0)).values.foreach { g =>
      val sorted = g.sortBy(_.getInt(2))
      assert(sorted.map(_.getInt(2)).toSeq == (1 to sorted.length))
      val dists = sorted.map(_.getLong(3))
      assert(dists.zip(dists.tail).forall { case (a, b) => a <= b })
    }
  }

  test("MMR seeds with the nearest row and spreads across clusters") {
    import spark.implicits._
    // geometry where diversity strictly beats relevance at λ=1/2:
    // query at x=0, a near-duplicate cluster at x=−1 (even ids), a
    // distinct cluster at x=8 (odd ids). After the x≈−1 seed, a
    // duplicate's score is ≈ −1·Q (minDd≈0) while a far row's is
    // ≈ (81−64)·Q > 0 — MMR must reach across; plain top-5 never does
    val df = {
      (0L until 100L).map { i =>
        val lab = (i % 2).toInt
        val v = Array.tabulate(dim) { j =>
          val base = if (j == 0) (if (lab == 0) -1.0f else 8.0f) else 0.0f
          base + (((i * 2654435761L + j * 40503L) % 1000L) / 10000.0f)
        }
        (i, v, lab)
      }.toDF("vec_id", "embedding", "label")
    }
    val q = new Array[Float](dim)
    val picks = Retrieval.mmrSelect(df, "vec_id", "embedding", q,
      poolSize = 60, k = 5).collect()
    assert(picks.length == 5)
    assert(picks.map(_.getInt(0)).toSeq == (1 to 5), "dense ranks")
    val labels = picks.map(r => r.getLong(1) % 2).toSet
    assert(labels.size == 2,
      s"MMR picks ${picks.map(_.getLong(1)).toSeq} never left the query's cluster")
    // the seed is the plain nearest neighbor with score = -dq
    val nearest = df
      .withColumn("dq", Retrieval.quantL2($"embedding", lit(q)))
      .orderBy($"dq", $"vec_id").select($"vec_id", $"dq").first()
    assert(picks.head.getLong(1) == nearest.getLong(0))
    assert(picks.head.getLong(2) == -nearest.getLong(1))
  }

  test("column and scalar quantL2 agree") {
    import spark.implicits._
    val df = corpus(50)
    val q = df.filter($"vec_id" === 1L).select($"embedding")
      .as[Array[Float]].first()
    val viaCol = df.withColumn("d", Retrieval.quantL2($"embedding", lit(q)))
      .select($"vec_id", $"d").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val viaScalar = df.as[(Long, Array[Float], Int)].collect()
      .map { case (id, v, _) => id -> Retrieval.quantL2(v, q) }.toMap
    assert(viaCol == viaScalar)
  }

  test("MMR selection is layout-independent") {
    import spark.implicits._
    val df = corpus(100)
    val q = df.filter($"vec_id" === 0L).select($"embedding")
      .as[Array[Float]].first()
    val a = Retrieval.mmrSelect(df.repartition(1), "vec_id", "embedding", q, 30, 4)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSeq
    val b = Retrieval.mmrSelect(df.repartition(7), "vec_id", "embedding", q, 30, 4)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSeq
    assert(a == b)
  }

  test("ndcgAtK matches hand-computed DCG on a planted line") {
    import spark.implicits._
    // 1D line: ids 1,2 label A at x=0,1; ids 3,4 label B at x=10,20.
    // probeRate > 1 makes every row a probe. Rankings (dist, id):
    //  q1: [2(A),3,4]   rel@1        → ndcg = 1
    //  q2: [1(A),3,4]   rel@1        → 1
    //  q3: [2,1,4(B)]   rel@3        → disc3/disc1 = 500000 ppm
    //  q4: [3(B),2,1]   rel@1        → 1
    val df = Seq(
      (1L, Array(0f, 0f), "A"), (2L, Array(1f, 0f), "A"),
      (3L, Array(10f, 0f), "B"), (4L, Array(20f, 0f), "B"))
      .toDF("vec_id", "embedding", "label")
    val got = Retrieval.ndcgAtK(df, "vec_id", "embedding", "label",
        probeRate = 1.1, salt = 9L, k = 10)
      .as[(Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> (r._2, r._5)).toMap
    assert(got === Map(
      1L -> ((1L, 1000000L)), 2L -> ((1L, 1000000L)),
      3L -> ((1L, 500000L)), 4L -> ((1L, 1000000L))))
    // discount table sanity: rank 1 → 10⁶, rank 3 → exactly half
    val disc = Retrieval.dcgDiscountsMicro(3)
    assert(disc(0) === 1000000L && disc(2) === 500000L)
  }
}
