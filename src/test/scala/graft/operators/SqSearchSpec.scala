package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Scalar quantization (operators.SqSearch): exact code arithmetic,
  * layout invariance, degenerate-range handling, self-match, recall
  * against exact search on clustered data, and the top-k plan shape.
  */
class SqSearchSpec extends SparkSpec {

  private val dim = 16

  /** Three well-separated anchors + deterministic jitter (no RNG). */
  private def planted(n: Int): DataFrame = {
    import spark.implicits._
    (0L until n.toLong).map { i =>
      val a = (i % 3).toInt
      val v = Array.tabulate(dim) { j =>
        val base = if (j == a) 10.0f else 0.0f
        base + (((i * 2654435761L + j * 40503L) % 1000L) / 10000.0f)
      }
      (i, v)
    }.toDF("id", "vec")
  }

  test("encodeOne maps range endpoints and midpoints exactly") {
    val m = SqSearch.SqModel(Array(0.0, -1.0), Array(1.0, 1.0))
    // v = mn → 0; v = mx → 254 (exact: (mx-mn)·254/(mx-mn))
    assert(m.encodeOne(Array(0.0f, -1.0f)).toSeq == Seq(0, 0))
    assert(m.encodeOne(Array(1.0f, 1.0f)).toSeq == Seq(254, 254))
    // midpoint: floor(0.5·254) = 127
    assert(m.encodeOne(Array(0.5f, 0.0f)).toSeq == Seq(127, 127))
    // out-of-range values clamp instead of wrapping
    assert(m.encodeOne(Array(2.0f, -3.0f)).toSeq == Seq(254, 0))
  }

  test("a degenerate dimension (mx = mn) codes to 0, not NaN") {
    val m = SqSearch.SqModel(Array(5.0), Array(5.0))
    assert(m.encodeOne(Array(5.0f)).toSeq == Seq(0))
  }

  test("training is identical across partition layouts") {
    val df = planted(300)
    val m1 = SqSearch.train(df.repartition(1), "vec")
    val m7 = SqSearch.train(df.repartition(7), "vec")
    assert(m1.mn.toSeq == m7.mn.toSeq && m1.mx.toSeq == m7.mx.toSeq,
      "min/max selections must commute across layouts")
  }

  test("the query's own row ranks first with distance zero") {
    import spark.implicits._
    val df = planted(120)
    val q = df.filter($"id" === 41L).select($"vec").as[Array[Float]].first()
    val top = SqSearch.searchRaw(df, "id", "vec", q, k = 5).collect()
    assert(top.head.getLong(0) == 41L && top.head.getLong(1) == 0L)
  }

  test("SQ8 top-k matches exact float L2 top-k on clustered data") {
    import spark.implicits._
    val df = planted(300)
    val q = df.filter($"id" === 0L).select($"vec").as[Array[Float]].first()
    val sq = SqSearch.searchRaw(df, "id", "vec", q, k = 10)
      .select($"id").as[Long].collect().toSet
    // exact float squared-L2 ground truth, same tie rule
    val exact = df.as[(Long, Array[Float])].collect()
      .map { case (id, v) =>
        (id, v.zip(q).map { case (a, b) => (a - b).toDouble * (a - b) }.sum)
      }
      .sortBy { case (id, d2) => (d2, id) }.take(10).map(_._1).toSet
    val recall = (sq & exact).size.toDouble / 10
    assert(recall >= 0.9, s"SQ8 recall@10 $recall below 0.9 on separable data")
  }

  test("search plans as TakeOrderedAndProject, never a global sort") {
    val df = planted(200)
    val model = SqSearch.train(df, "vec")
    val enc = SqSearch.encode(df, "id", "vec", model)
    val out = SqSearch.search(enc, "id", model.encodeOne(new Array[Float](dim)), 5)
    out.count()
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), plan.take(600))
    assert(!plan.contains("SortExec") || !plan.contains("Exchange rangepartitioning"),
      "top-k must not global-sort the corpus")
  }
}
