package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.DataFrame

/** Deterministic DBSCAN (operators.Dbscan): planted two-cluster
  * fixture exercising all three roles (core / border / noise), the
  * transitive border rule (a point whose only neighbor is a border
  * point is NOISE), and layout invariance.
  */
class DbscanSpec extends SparkSpec {

  /** Two 5-core fans in disjoint planes (angles 0°..40°, pairwise
    * cos ≥ cos 40° ≈ 0.766), a 75° probe p touching only the 30°/40°
    * cores (cos 35°/45° > 0.6 > cos 55°), and q, whose only neighbor
    * is p (cos = sin 75°/√2 ≈ 0.683).
    */
  private def fixture: DataFrame = {
    import spark.implicits._
    def fan(ids: Seq[Long], d0: Int, d1: Int): Seq[(Long, Array[Float])] =
      ids.zipWithIndex.map { case (id, k) =>
        val th = math.toRadians(10.0 * k)
        val v = new Array[Float](4)
        v(d0) = math.cos(th).toFloat
        v(d1) = math.sin(th).toFloat
        (id, v)
      }
    val p = {
      val th = math.toRadians(75.0)
      val v = new Array[Float](4)
      v(0) = math.cos(th).toFloat
      v(3) = math.sin(th).toFloat
      Seq((20L, v))
    }
    val q = {
      val v = new Array[Float](4)
      v(2) = (1.0 / math.sqrt(2)).toFloat
      v(3) = (1.0 / math.sqrt(2)).toFloat
      Seq((21L, v))
    }
    (fan(0L to 4L, 0, 3) ++ fan(10L to 14L, 1, 2) ++ p ++ q)
      .toDF("vec_id", "embedding")
  }

  test("roles and clusters: two components, one border, one noise") {
    import spark.implicits._
    val out = Dbscan.cluster(fixture, "vec_id", "embedding",
        eps = 0.6, minPts = 5)
      .as[(Long, String, Long)].collect().toSeq
    val expected =
      (0L to 4L).map(id => (id, "core", 0L)) ++
      (10L to 14L).map(id => (id, "core", 10L)) ++
      Seq((20L, "border", 0L), (21L, "noise", -1L))
    assert(out == expected, s"got $out")
  }

  test("ann band-join path ≡ exact grid path at the fixture eps") {
    // the 100× swap (VERDICT r8 #3): candidate pairs from
    // AnnSearch.bandJoin instead of the exact grid. At 15×2-bit
    // hyperplane bands a qualifying pair at cos 0.6 is missed with
    // prob (1 − p²)^15 ≈ 3e-5 (p = 1 − θ/π ≈ 0.70) — and the run is
    // seed-deterministic, so this is equality, not a recall bound.
    import spark.implicits._
    def run(ann: Option[(AnnSearch.LshScheme, Int)]) =
      Dbscan.cluster(fixture, "vec_id", "embedding",
          eps = 0.6, minPts = 5, ann = ann)
        .as[(Long, String, Long)].collect().toSeq
    val lsh = AnnSearch.HyperplaneLsh(dim = 4, nBits = 30, seed = 2)
    assert(run(Some((lsh, 15))) == run(None))
  }

  test("clustering is layout invariant") {
    import spark.implicits._
    def run(df: DataFrame) =
      Dbscan.cluster(df, "vec_id", "embedding", eps = 0.6, minPts = 5)
        .as[(Long, String, Long)].collect().toSeq
    assert(run(fixture.repartition(1)) == run(fixture.repartition(7)))
  }
}
