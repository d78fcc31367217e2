package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.DataFrame

/** Depth-2 decision tree (operators.DecisionTree): planted-quadrant
  * recovery (both levels, deterministic tie-breaks), perfect routing
  * on separable data, and layout invariance of the fitted model.
  */
class DecisionTreeSpec extends SparkSpec {

  /** Quadrant labels on dims 0/1 (label = 2·[x0>0] + [x1>0]), small
    * deterministic jitter, two noise dims — separable by a depth-2
    * tree splitting dim 0 then dim 1.
    */
  private def planted(n: Int): DataFrame = {
    import spark.implicits._
    (0L until n.toLong).map { i =>
      val s0 = if ((i & 1) == 0) -0.5f else 0.5f
      val s1 = if ((i & 2) == 0) -0.5f else 0.5f
      val j = ((i * 2654435761L) % 100L) / 2000.0f
      val v = Array(s0 + j, s1 + j, j / 10.0f, -j / 10.0f)
      val label = (if (s0 > 0) 2 else 0) + (if (s1 > 0) 1 else 0)
      (i, v, label)
    }.toDF("vec_id", "embedding", "label")
  }

  test("recovers the planted quadrant tree with deterministic tie-breaks") {
    val m = DecisionTree.fit(planted(200), "vec_id", "embedding", "label")
    // every t in [-448, 448] separates the clusters; smallest wins
    assert(m.root == DecisionTree.Split(0, -448L), s"got ${m.root}")
    assert(m.subLeft.dim == 1 && m.subRight.dim == 1,
      s"second level must split the other planted dim; got $m")
  }

  test("routes perfectly on separable data; leaves carry majority labels") {
    import spark.implicits._
    val docs = planted(200)
    val m = DecisionTree.fit(docs, "vec_id", "embedding", "label")
    val out = DecisionTree.assign(docs, "vec_id", "embedding", "label", m)
      .select($"label", $"pred", $"leaf").as[(Long, Long, Long)].collect()
    assert(out.length == 200)
    assert(out.forall { case (y, p, _) => y == p },
      "separable quadrants must classify perfectly")
    assert(out.map(_._3).distinct.sorted.toSeq == Seq(0L, 1L, 2L, 3L))
  }

  test("fit is identical across partition layouts") {
    val docs = planted(120)
    val m1 = DecisionTree.fit(docs.repartition(1), "vec_id", "embedding", "label")
    val m7 = DecisionTree.fit(docs.repartition(7), "vec_id", "embedding", "label")
    assert(m1 == m7, "integer counts + one exact division → layout-free")
  }
}
