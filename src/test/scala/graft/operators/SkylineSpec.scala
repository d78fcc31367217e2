package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

import scala.util.Random

class SkylineSpec extends SparkSpec {
  import spark.implicits._

  private def naive(pts: Seq[(Long, Double, Double)]): Set[Long] =
    pts.filter { case (_, mn, mx) =>
      !pts.exists { case (_, qn, qx) =>
        qn <= mn && qx >= mx && (qn < mn || qx > mx)
      }
    }.map(_._1).toSet

  test("frontier2d equals the quadratic dominance test (randomized)") {
    val rnd = new Random(19)
    val pts = (1 to 400).map(i =>
      (i.toLong, rnd.nextInt(100).toDouble, rnd.nextInt(100).toDouble))
    val got = Skyline.frontier2d(pts.toDF("id", "mn", "mx"), "mn", "mx")
      .select($"id").as[Long].collect().toSet
    assert(got === naive(pts))
  }

  test("exact ties survive together; dominated duplicates die") {
    val pts = Seq(
      (1L, 1.0, 10.0), (2L, 1.0, 10.0),   // tie on the frontier — both live
      (3L, 1.0, 9.0),                      // same price, smaller → dominated
      (4L, 2.0, 10.0),                     // pricier, same size → dominated
      (5L, 2.0, 11.0),                     // pricier but bigger → frontier
      (6L, 0.5, 1.0))                      // cheapest → frontier
    val got = Skyline.frontier2d(pts.toDF("id", "mn", "mx"), "mn", "mx")
      .select($"id").as[Long].collect().toSet
    assert(got === Set(1L, 2L, 5L, 6L))
  }

  test("result is partitioning-invariant") {
    val rnd = new Random(23)
    val pts = (1 to 300).map(i =>
      (i.toLong, rnd.nextDouble() * 50, rnd.nextDouble() * 50))
    val df = pts.toDF("id", "mn", "mx")
    val a = Skyline.frontier2d(df.repartition(1), "mn", "mx")
      .select($"id").as[Long].collect().toSet
    val b = Skyline.frontier2d(df.repartition(13), "mn", "mx")
      .select($"id").as[Long].collect().toSet
    assert(a === b && a === naive(pts))
  }
}
