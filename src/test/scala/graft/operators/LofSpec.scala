package graft.operators

import graft.SparkSpec

/** Local Outlier Factor (operators.Lof): a planted sparse point
  * inside a dense same-label cluster must score the top LOF; inlier
  * cluster members sit near 1.0; duplicates NULL-propagate; blocks
  * never mix.
  */
class LofSpec extends SparkSpec {

  private def vec(x: Double, y: Double): Array[Float] =
    Array(x.toFloat, y.toFloat, 0f, 1f)

  test("planted outlier inside a dense cluster tops the LOF ranking") {
    import spark.implicits._
    val rnd = new scala.util.Random(3)
    // 20 points around (1, 1) with enough jitter that micro-snapped
    // cosine distances have thousands of quanta (an ultra-tight
    // cluster quantizes ratios coarsely); one at (1, -1) — same
    // label. Cosine distance separates the direction flip cleanly.
    val dense = Seq.tabulate(20)(i =>
      (i.toLong, vec(1.0 + rnd.nextDouble() * 0.1,
        1.0 + rnd.nextDouble() * 0.1), 0))
    val out = dense :+ (99L, vec(1.0, -1.0), 0)
    val df = out.toDF("vec_id", "embedding", "label")
    val got = Lof.lof(df, "vec_id", "embedding", "label", k = 3)
      .select("id", "lof_milli").as[(Long, Option[Long])]
      .collect().toMap
    val planted = got(99L).get
    got.filter(_._1 != 99L).foreach { case (id, l) =>
      assert(l.get < planted, s"inlier $id ($l) >= planted ($planted)")
    }
    // inliers hover near 1.0 (the LOF null value); with k = 3 on a
    // 20-point sample genuine density fluctuation spans ~0.7-1.6,
    // while the planted point sits orders of magnitude above
    assert(got.filter(_._1 != 99L).values.forall(l =>
      l.get > 500L && l.get < 2000L), s"got $got")
    assert(planted > 100L * 2000L, s"planted $planted not separated")
  }

  test("strict NULL propagation: a point with defined lrd whose kNN " +
    "set contains NULL-lrd duplicates gets NULL lof, not a diluted avg") {
    import spark.implicits._
    // k+1 = 4 exact duplicates (ids 0-3): each one's 3-NN are the
    // other three at distance 0 -> zero reachability sum -> NULL lrd.
    // One distinct point (id 9), same label: its 3-NN are duplicates
    // (tie-broken 0,1,2) at positive distance -> its lrd IS defined,
    // but every neighbor's lrd is NULL -> strict propagation must
    // yield NULL lof_milli (cntl < cnt2 guard), never an average
    // over an empty non-NULL subset.
    val df = (Seq.tabulate(4)(i => (i.toLong, vec(1, 1), 0)) :+
      (9L, vec(1, 2), 0)).toDF("vec_id", "embedding", "label")
    val got = Lof.lof(df, "vec_id", "embedding", "label", k = 3)
      .select("id", "lrd", "lof_milli")
      .as[(Long, Option[Long], Option[Long])]
      .collect().map(r => r._1 -> ((r._2, r._3))).toMap
    val (lrd9, lof9) = got(9L)
    assert(lrd9.isDefined, s"distinct point's lrd must be defined: $got")
    assert(lof9.isEmpty, s"NULL-lrd neighbor must NULL the lof: $got")
    // the duplicates themselves: NULL lrd and NULL lof
    (0L to 3L).foreach { id =>
      assert(got(id)._1.isEmpty && got(id)._2.isEmpty, s"dup $id: $got")
    }
  }

  test("labels block: a lone point in its own label emits no row; " +
    "exact duplicates NULL-propagate") {
    import spark.implicits._
    val df = (Seq.tabulate(6)(i => (i.toLong, vec(1, 1), 0)) :+
      (50L, vec(3, 4), 1)).toDF("vec_id", "embedding", "label")
    val got = Lof.lof(df, "vec_id", "embedding", "label", k = 3)
      .select("id", "lof_milli").as[(Long, Option[Long])]
      .collect().toMap
    assert(!got.contains(50L), "singleton block must emit nothing")
    // six identical points: zero reachability sums -> NULL lrd/LOF
    assert(got.keySet === (0L to 5L).toSet)
    assert(got.values.forall(_.isEmpty), s"got $got")
  }
}
