package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.DataFrame

/** Principal-component extraction (operators.Pca): layout invariance
  * (the quantized-integer contract), planted dominant-direction
  * recovery, projection exactness against a by-hand replay, and the
  * enforced headroom guards (dim and feature magnitude).
  */
class PcaSpec extends SparkSpec {

  /** Deterministic corpus with variance planted along axis `axis`:
    * x_axis spreads over ±0.9 while every other coordinate carries a
    * small multiplicative-hash jitter — no RNG (SURVEY §7.4).
    */
  private def planted(n: Int, dim: Int, axis: Int): DataFrame = {
    import spark.implicits._
    (0L until n.toLong).map { i =>
      val v = Array.tabulate(dim) { j =>
        val jitter = (((i * 2654435761L + j * 40503L) % 200L) - 100L) / 2000.0f
        if (j == axis) ((i % 19).toInt - 9) / 10.0f else jitter
      }
      (i, v)
    }.toDF("id", "vec")
  }

  test("fit is bit-identical across partition layouts") {
    val docs = planted(300, 8, axis = 2)
    val r1 = Pca.fit(docs.repartition(1), "vec", iterations = 5)
    val r7 = Pca.fit(docs.repartition(7), "vec", iterations = 5)
    assert(r1.mean.toSeq == r7.mean.toSeq)
    assert(r1.gram.map(_.toSeq).toSeq == r7.gram.map(_.toSeq).toSeq)
    assert(r1.vec.toSeq == r7.vec.toSeq,
      "integer Gram + fixed-point iteration must be layout-independent")
    assert(r1.lambda == r7.lambda && r1.evrMilli == r7.evrMilli)
  }

  test("recovers a planted dominant direction with high explained variance") {
    val docs = planted(400, 8, axis = 5)
    val r = Pca.fit(docs, "vec", iterations = 8)
    val maxAbs = r.vec.map(math.abs).max
    assert(math.abs(r.vec(5)) == maxAbs,
      s"dominant component should land on the planted axis; got ${r.vec.toSeq}")
    assert(math.abs(r.vec(5)) == Pca.VScale,
      "max-abs component normalizes to exactly ±VScale")
    assert(r.evrMilli > 700L,
      s"planted axis carries most variance; evrMilli=${r.evrMilli}")
  }

  test("projection matches a driver-side integer replay") {
    import spark.implicits._
    val docs = planted(50, 4, axis = 1)
    val r = Pca.fit(docs, "vec", iterations = 4)
    val got = Pca.project(docs, "id", "vec", r)
      .as[(Long, Long)].collect().toMap
    val raw = docs.as[(Long, Array[Float])].collect()
    raw.foreach { case (id, f) =>
      val want = f.indices.map { j =>
        val x = math.floor(f(j).toDouble * Pca.FeatScale.toDouble).toLong
        r.vec(j) * (x - r.mean(j))
      }.sum
      assert(got(id) == want, s"projection mismatch for id=$id")
    }
  }

  test("guards reject out-of-headroom dim and features, and empty input") {
    import spark.implicits._
    val wide = Seq((1L, Array.fill(65)(0.1f)), (2L, Array.fill(65)(0.2f)))
      .toDF("id", "vec")
    val eDim = intercept[IllegalArgumentException] {
      Pca.fit(wide, "vec", iterations = 2)
    }
    assert(eDim.getMessage.contains("dim"))

    val hot = Seq((1L, Array(0.5f, 3.0f)), (2L, Array(0.1f, 0.2f)))
      .toDF("id", "vec")
    val eMag = intercept[Exception] {
      Pca.fit(hot, "vec", iterations = 2)
    }
    def chain(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ chain(t.getCause)
    assert(chain(eMag).exists(_.contains("headroom")),
      s"expected the quantize headroom guard; got ${chain(eMag)}")

    val empty = spark.emptyDataset[(Long, Array[Float])].toDF("id", "vec")
    intercept[IllegalArgumentException] { Pca.fit(empty, "vec", iterations = 2) }
  }
}
