package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed k-means (operators.KMeans): layout invariance (the
  * quantized-integer contract), planted-cluster recovery, empty-cell /
  * duplicate-seed degeneracy, and the SemDeDup composition.
  */
class KMeansSpec extends SparkSpec {

  private val dim = 8

  /** Deterministic synthetic corpus: three well-separated anchors with
    * a small multiplicative-hash jitter per point — no RNG (SURVEY
    * §7.4: seeds break layout/engine determinism; arithmetic doesn't).
    */
  private def planted(n: Int): DataFrame = {
    import spark.implicits._
    (0L until n.toLong).map { i =>
      val a = (i % 3).toInt
      val v = Array.tabulate(dim) { j =>
        val base = if (j == a) 10.0f else 0.0f
        val jitter = (((i * 2654435761L + j * 40503L) % 1000L) / 10000.0f)
        base + jitter
      }
      (i, v, a)
    }.toDF("id", "vec", "anchor")
  }

  test("training is bit-identical across partition layouts") {
    val docs = planted(300)
    val m1 = KMeans.train(docs.repartition(1), "id", "vec", k = 3, iterations = 4, salt = 7L)
    val m7 = KMeans.train(docs.repartition(7), "id", "vec", k = 3, iterations = 4, salt = 7L)
    assert(m1.centroids.map(_.toSeq).toSeq == m7.centroids.map(_.toSeq).toSeq,
      "quantized-integer sums must make centroids exactly layout-independent")
    val a1 = KMeans.assignCells(docs.repartition(1), "id", "vec", m1)
      .select("id", "cell").collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val a7 = KMeans.assignCells(docs.repartition(7), "id", "vec", m7)
      .select("id", "cell").collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(a1 == a7)
  }

  test("planted clusters are recovered with full purity") {
    val docs = planted(300)
    val model = KMeans.train(docs, "id", "vec", k = 3, iterations = 5, salt = 7L)
    val assigned = KMeans.assignCells(docs, "id", "vec", model)
      .join(docs.select(col("id"), col("anchor")), "id")
    // every anchor group maps to exactly one cell, and cells are distinct
    val byAnchor = assigned.groupBy("anchor")
      .agg(countDistinct(col("cell")).as("ncells"), min(col("cell")).as("cell"))
      .collect()
    assert(byAnchor.forall(_.getLong(1) == 1L), s"anchor split across cells: ${byAnchor.mkString(",")}")
    assert(byAnchor.map(_.getInt(2)).distinct.length == 3, "two anchors collapsed into one cell")
  }

  test("duplicate seeds and empty cells degrade deterministically, never to NaN") {
    import spark.implicits._
    // two distinct vectors, each duplicated; k=4 seeds include duplicates
    val docs = Seq(
      (0L, Array.fill(dim)(1.0f)), (1L, Array.fill(dim)(1.0f)),
      (2L, Array.fill(dim)(-1.0f)), (3L, Array.fill(dim)(-1.0f)))
      .toDF("id", "vec")
    val model = KMeans.train(docs, "id", "vec", k = 4, iterations = 3, salt = 1L)
    assert(model.k == 4)
    assert(model.centroids.forall(_.forall(d => !d.isNaN && !d.isInfinite)))
    val cells = KMeans.assignCells(docs, "id", "vec", model)
      .select("cell").as[Int].collect().toSet
    assert(cells.size == 2, "the two distinct vectors must land in two distinct cells")
  }

  test("k larger than the table trains on what exists") {
    import spark.implicits._
    val docs = Seq((0L, Array.fill(dim)(1.0f)), (1L, Array.fill(dim)(2.0f)))
      .toDF("id", "vec")
    val model = KMeans.train(docs, "id", "vec", k = 16, iterations = 2, salt = 1L)
    assert(model.k == 2)
  }

  test("semanticDedup finds within-cell near-dups and only within-cell pairs") {
    import spark.implicits._
    val docs = planted(120)
    val pairs = KMeans.semanticDedup(docs, "id", "vec", k = 3, iterations = 4,
      threshold = 0.99, salt = 7L)
    assert(pairs.count() > 0, "planted near-identical points must pair")
    // jitter is tiny relative to the anchor direction: pairs must join
    // points of the SAME anchor only
    val anchors = docs.select(col("id"), col("anchor"))
    val crossAnchor = pairs
      .join(anchors.select(col("id").as("id_a"), col("anchor").as("an_a")), "id_a")
      .join(anchors.select(col("id").as("id_b"), col("anchor").as("an_b")), "id_b")
      .filter(col("an_a") =!= col("an_b"))
    assert(crossAnchor.count() == 0L)
  }

  test("trained centroids improve the quantized objective vs init") {
    val docs = planted(300)
    val init = KMeans.Model(KMeans.initByHash(docs, "id", "vec", 3, salt = 7L))
    val trained = KMeans.train(docs, "id", "vec", k = 3, iterations = 5, salt = 7L)
    def objective(m: KMeans.Model): Long = {
      import spark.implicits._
      docs.select(col("vec")).as[Array[Float]].collect()
        .map(v => m.quantDist(v, m.assign(v))).sum
    }
    assert(objective(trained) <= objective(init))
  }
}
