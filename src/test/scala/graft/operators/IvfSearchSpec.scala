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

  test("persisted index: quantizer round-trips, cell probes prune at the source") {
    import org.apache.spark.sql.functions.{col, input_file_name}
    import spark.implicits._
    val dim = 16
    val df = clustered(800, dim, seed = 17).toDF("vec_id", "embedding")
    val path = java.nio.file.Files.createTempDirectory("graft-ivf-idx").toString + "/idx"

    val (index, model) = IvfSearch.persistedIndex(
      spark, df, "vec_id", "embedding", path, k = 8)
    // reload path: the quantizer comes back bit-identical
    val (_, model2) = IvfSearch.persistedIndex(
      spark, df, "vec_id", "embedding", path, k = 8)
    model.centroids.zip(model2.centroids).foreach { case (a, b) =>
      assert(a.toSeq === b.toSeq)
    }

    val q = clustered(1, dim, seed = 17).head._2
    val res = IvfSearch.search(index, "vec_id", "embedding", q, 5, model, nProbe = 2)
    val plan = res.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters:") && plan.contains("cell"),
      plan.take(800))
    val cells = model.rankedCells(q).take(2).toSet
    val files = index.filter(col("cell").isin(cells.toSeq: _*))
      .select(input_file_name()).distinct().as[String].collect()
    assert(files.nonEmpty)
    assert(files.forall(f => cells.exists(c => f.contains(s"cell=$c/"))),
      files.mkString("\n"))

    // identical results to the in-memory index
    val mem = IvfSearch.search(
      IvfSearch.buildIndex(spark, df, "vec_id", "embedding", model),
      "vec_id", "embedding", q, 5, model, nProbe = 2)
    assert(res.collect().toSeq === mem.collect().toSeq)
  }

  test("deterministic training: same inputs, identical model") {
    import spark.implicits._
    val df = clustered(500, 16, seed = 3).toDF("vec_id", "embedding")
    val a = IvfSearch.train(spark, df, "embedding", k = 8)
    val b = IvfSearch.train(spark, df, "embedding", k = 8)
    a.centroids.zip(b.centroids).foreach { case (x, y) => assert(x.toSeq === y.toSeq) }
  }
}
