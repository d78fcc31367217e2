package graft.operators

import java.sql.Timestamp

import graft.SparkSpec
import org.apache.spark.sql.DataFrame

/** Hand-computed unit checks for the round-11b operators: RMST over
  * the KM step curve, average precision @ k, eigenvector centrality,
  * and per-node local clustering.
  */
class Round11bSpec extends SparkSpec {

  private def ts(day: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-${day + 1}%02d 12:00:00")

  /** The SurvivalSpec fixture: KM curve (0,750),(10,500),(23,500),
    * (30,500) surv_milli.
    */
  private def events: DataFrame = {
    import spark.implicits._
    Seq(
      (1L, ts(0)), (1L, ts(10)),
      (2L, ts(0)), (2L, ts(15)), (2L, ts(30)),
      (3L, ts(5)), (3L, ts(28)),
      (4L, ts(2))
    ).toDF("user_id", "ts")
  }

  test("rmst: exact step-curve integrals at each horizon") {
    import spark.implicits._
    val out = Survival.rmst(events, "user_id", "ts", Seq(7L, 14L, 30L, 60L))
      .as[(Long, Long)].collect().toMap
    // S = 750 on [0,10), 500 on [10,∞)
    assert(out == Map(
      7L -> (750L * 7),
      14L -> (750L * 10 + 500L * 4),
      30L -> (750L * 10 + 500L * 20),
      60L -> (750L * 10 + 500L * 50)), s"got $out")
  }

  test("rmst: layout invariance") {
    import spark.implicits._
    def run(df: DataFrame) =
      Survival.rmst(df, "user_id", "ts", Seq(14L, 60L))
        .as[(Long, Long)].collect().toSeq
    assert(run(events.repartition(1)) == run(events.repartition(7)))
  }

  /** 1-dim embeddings on a line; probeRate 1.0 makes every point a
    * probe, so the id-1 ranking is fully determined.
    */
  private def embs: DataFrame = {
    import spark.implicits._
    Seq(
      (1L, Array(0.0f), "A"),
      (2L, Array(1.0f), "A"),
      (3L, Array(2.0f), "B"),
      (4L, Array(3.0f), "A"),
      (5L, Array(4.0f), "B")
    ).toDF("vec_id", "embedding", "label")
  }

  test("averagePrecisionAtK: hand-computed AP for the line fixture") {
    import spark.implicits._
    val out = Retrieval
      .averagePrecisionAtK(embs, "vec_id", "embedding", "label", 1.0, 1L, 3)
      .as[(Long, Long, Long)].collect()
      .map { case (q, n, a) => q -> ((n, a)) }.toMap
    // query 1 (label A): ranking 2(A),3(B),4(A) → terms 1e6/1 + 2e6/3,
    // n_rel = 2 → AP = (1000000 + 666666) / 2
    assert(out(1L) == (2L, 833333L), s"got ${out(1L)}")
    // query 5 (label B): ranking 4(A),3(B),2(A) → term 1e6·1/2 at rank 2,
    // n_rel = 1 → AP = 500000
    assert(out(5L) == (1L, 500000L), s"got ${out(5L)}")
  }

  test("averagePrecisionAtK: layout invariance") {
    import spark.implicits._
    def run(df: DataFrame) = Retrieval
      .averagePrecisionAtK(df, "vec_id", "embedding", "label", 1.0, 1L, 3)
      .as[(Long, Long, Long)].collect().toSeq
    assert(run(embs.repartition(1)) == run(embs.repartition(5)))
  }

  /** Triangle 1-2-3 with pendant 4 on node 1 (non-bipartite, so the
    * power method does not oscillate).
    */
  private def triPendant: DataFrame = {
    import spark.implicits._
    Seq((1L, 2L), (1L, 3L), (2L, 3L), (1L, 4L)).toDF("a", "b")
  }

  /** Plain-Scala replay of the eigenvectorCentrality recurrence —
    * the same 2^-30 quantization and IEEE chain.
    */
  private def eigRef(
      adj: Map[Long, Seq[Long]], iters: Int): Map[Long, Double] = {
    val q = 1073741824L
    val n = adj.size
    var x = adj.keys.map(_ -> 1.0).toMap
    for (_ <- 1 to iters) {
      val c = adj.map { case (v, ns) =>
        v -> ns.map(u => math.floor(x(u) * q).toLong).sum
      }
      val s = c.values.map(BigInt(_)).sum
      x = c.map { case (v, cv) =>
        v -> cv.toDouble / s.toDouble * n.toDouble
      }
    }
    x
  }

  test("eigenvectorCentrality: matches the plain-Scala recurrence") {
    import spark.implicits._
    val out = GraphOps.eigenvectorCentrality(triPendant, "a", "b", 4)
      .as[(Long, Double)].collect().toMap
    val adj = Map(
      1L -> Seq(2L, 3L, 4L), 2L -> Seq(1L, 3L),
      3L -> Seq(1L, 2L), 4L -> Seq(1L))
    val ref = eigRef(adj, 4)
    assert(out.keySet == ref.keySet)
    for ((v, e) <- ref)
      assert(math.floor(out(v) * 1e6 + 0.5) == math.floor(e * 1e6 + 0.5),
        s"node $v: ${out(v)} vs $e")
    // center of the triangle+pendant dominates; mean is 1 by the L1 norm
    assert(out(1L) > out(2L) && out(2L) == out(3L) && out(3L) > out(4L))
    assert(math.abs(out.values.sum / 4.0 - 1.0) < 1e-6)
  }

  test("eigenvectorCentrality: layout invariance") {
    import spark.implicits._
    def run(df: DataFrame) =
      GraphOps.eigenvectorCentrality(df, "a", "b", 4)
        .as[(Long, Double)].collect().toSet
    assert(run(triPendant.repartition(1)) == run(triPendant.repartition(5)))
  }

  test("localClustering: triangle + pendant hand check") {
    import spark.implicits._
    val out = GraphOps.localClustering(triPendant, "a", "b")
      .as[(Long, Long, Long, Option[Long])].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(out(1L) == (3L, 1L, Some(333333L)), s"got ${out(1L)}")
    assert(out(2L) == (2L, 1L, Some(1000000L)))
    assert(out(3L) == (2L, 1L, Some(1000000L)))
    assert(out(4L) == (1L, 0L, None))
  }

  test("localClustering: edgeless pair and layout invariance") {
    import spark.implicits._
    val path = Seq((1L, 2L), (2L, 3L)).toDF("a", "b") // no triangle
    val out = GraphOps.localClustering(path, "a", "b")
      .as[(Long, Long, Long, Option[Long])].collect()
      .map(r => r._1 -> r._4).toMap
    assert(out(2L).contains(0L) && out(1L).isEmpty && out(3L).isEmpty)
    def run(df: DataFrame) = GraphOps.localClustering(df, "a", "b")
      .as[(Long, Long, Long, Option[Long])].collect().toSet
    assert(run(triPendant.repartition(1)) == run(triPendant.repartition(5)))
  }
}
