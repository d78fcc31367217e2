package graft.operators

import scala.util.Random

import graft.SparkSpec
import graft.pipeline.VectorSearch

class IvfSearchSpec extends SparkSpec {

  private def clustered(n: Int, dim: Int, seed: Int): Seq[(Long, Array[Float])] = {
    val r = new Random(seed)
    val centers = Array.fill(8)(Array.fill(dim)(r.nextGaussian()))
    (0 until n).map { i =>
      val c = centers(i % 8)
      (i.toLong, c.map(x => (x + 0.15 * r.nextGaussian()).toFloat))
    }
  }

  test("IVF: cells track clusters; high recall at small probe fraction") {
    import spark.implicits._
    val dim = 32
    val vecs = clustered(2000, dim, seed = 7)
    val df = vecs.toDF("vec_id", "embedding")
    val model = IvfSearch.train(spark, df, "embedding", k = 16, iterations = 10)
    assert(model.centroids.length === 16)
    val index = IvfSearch.buildIndex(spark, df, "vec_id", "embedding", model).persist()

    val queries = clustered(30, dim, seed = 7).map(_._2)
    var recallSum = 0.0; var candFrac = 0.0
    for (q <- queries) {
      val ann = IvfSearch.search(index, "vec_id", "embedding", q, 10, model, nProbe = 3)
        .select("vec_id").as[Long].collect().toSet
      val exact = VectorSearch.topK(df, "embedding", "vec_id", q.map(_.toDouble).toSeq, 10)
        .select("vec_id").as[Long].collect().toSet
      recallSum += ann.intersect(exact).size / 10.0
      val cells = model.rankedCells(q).take(3)
      candFrac += index.filter($"cell".isin(cells: _*)).count().toDouble / 2000
    }
    val recall = recallSum / queries.size
    val frac = candFrac / queries.size
    assert(recall >= 0.9, s"recall@10 = $recall")
    assert(frac < 0.4, s"probe fraction = $frac")
  }

  test("deterministic training: same inputs, identical model") {
    import spark.implicits._
    val df = clustered(500, 16, seed = 3).toDF("vec_id", "embedding")
    val a = IvfSearch.train(spark, df, "embedding", k = 8)
    val b = IvfSearch.train(spark, df, "embedding", k = 8)
    a.centroids.zip(b.centroids).foreach { case (x, y) => assert(x.toSeq === y.toSeq) }
  }
}
