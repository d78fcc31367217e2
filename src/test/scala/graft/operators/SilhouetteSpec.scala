package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Simplified silhouette: planted-geometry sanity (tight separated
  * clusters ≈ 1, boundary point ≈ 0), the k = 1 convention, and
  * layout invariance of the quantized score.
  */
class SilhouetteSpec extends SparkSpec {
  import spark.implicits._

  private def vec(xs: Double*): Array[Float] = xs.map(_.toFloat).toArray

  test("tight separated clusters score near 1; a midpoint straggler near 0") {
    // cluster 0 near (0,0), cluster 1 near (10,0); point 99 sits at
    // (5, 0) — equidistant, labeled 0
    val df = Seq(
      (1L, vec(0.0, 0.1), 0), (2L, vec(0.1, 0.0), 0), (3L, vec(-0.1, 0.0), 0),
      (11L, vec(10.0, 0.1), 1), (12L, vec(10.1, 0.0), 1), (13L, vec(9.9, 0.0), 1),
      (99L, vec(5.0, 0.0), 0))
      .toDF("vec_id", "embedding", "label")
    val pp = Silhouette.perPoint(df, "vec_id", "embedding", "label")
      .as[(Long, Long, Long, Long, Long)].collect().map(r => r._1 -> r._5).toMap
    assert(pp(1L) > 900000L && pp(11L) > 900000L, pp.toString)
    // the straggler drags its own centroid toward itself, so its a
    // shrinks below b: small positive, far from the clean members
    assert(math.abs(pp(99L)) < 600000L, pp.toString)
    val byC = Silhouette.byCluster(df, "vec_id", "embedding", "label")
      .as[(Long, Long, Long)].collect()
    assert(byC.map(_._1).toSeq === Seq(0L, 1L))
    assert(byC.find(_._1 == 1L).get._3 > 900000L)
  }

  test("single cluster scores 0 by convention") {
    val df = Seq((1L, vec(0.0, 1.0), 7), (2L, vec(1.0, 0.0), 7))
      .toDF("vec_id", "embedding", "label")
    val got = Silhouette.byCluster(df, "vec_id", "embedding", "label")
      .as[(Long, Long, Long)].collect()
    assert(got.toSeq === Seq((7L, 2L, 0L)))
  }

  test("score is layout invariant (quantized order-free sums)") {
    val r = new scala.util.Random(5)
    val df = (0 until 200).map { i =>
      val c = i % 3
      (i.toLong, Array.fill(8)((c * 3 + r.nextGaussian() * 0.4).toFloat), c)
    }.toDF("vec_id", "embedding", "label")
    def run(d: org.apache.spark.sql.DataFrame) =
      Silhouette.byCluster(d, "vec_id", "embedding", "label")
        .as[(Long, Long, Long)].collect().toSeq
    assert(run(df.repartition(1)) === run(df.repartition(13)))
  }
}
