package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class StarComponentsSpec extends SparkSpec {
  import spark.implicits._

  private def run(n: Long, pairs: Seq[(Long, Long)], maxIter: Int = 25) = {
    val ids = (0L until n).toDF("doc_id")
    val df = pairs.toDF("id_a", "id_b")
    Dedup.connectedComponentsStar(ids, "doc_id", df, maxIter)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("matches label propagation on a random graph (both vs ground truth)") {
    val rnd = new scala.util.Random(51)
    val n = 200L
    val pairs = Seq.fill(150)((rnd.nextInt(200).toLong, rnd.nextInt(200).toLong))
      .filter(p => p._1 != p._2)
    val star = run(n, pairs)
    val ids = (0L until n).toDF("doc_id")
    val prop = Dedup.connectedComponents(ids, "doc_id", pairs.toDF("id_a", "id_b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(star === prop)
    // and against a driver-side union-find ground truth
    val parent = Array.tabulate(n.toInt)(identity)
    def find(x: Int): Int = { var r = x; while (parent(r) != r) r = parent(r); r }
    pairs.foreach { case (a, b) =>
      val (ra, rb) = (find(a.toInt), find(b.toInt))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val truth = (0 until n.toInt).map(i => i.toLong -> find(i).toLong).toMap
    assert(star === truth)
  }

  test("long path: converges in few alternating rounds where propagation needs diameter") {
    val n = 256L
    val chain = (0L until n - 1).map(i => (i, i + 1))
    // star: poly-log rounds — 12 is generous; label propagation at
    // maxIter=12 provably CANNOT finish a 255-diameter path
    val star = run(n, chain, maxIter = 12)
    assert(star.values.toSet === Set(0L), "one component rooted at 0")
    intercept[IllegalStateException] {
      Dedup.connectedComponents(
        (0L until n).toDF("doc_id"), "doc_id",
        chain.toDF("id_a", "id_b"), maxIter = 12)
    }
  }

  test("auto selection: a chain routes to star rounds, a clique stays correct") {
    // mean degree ≈ 2 ⇒ star path: completing a 255-diameter chain at
    // maxIter=12 is only possible through the star rounds (the
    // propagation path provably throws there — see the test above)
    val n = 256L
    val chain = (0L until n - 1).map(i => (i, i + 1))
    val auto = Dedup.connectedComponentsAuto(
        (0L until n).toDF("doc_id"), "doc_id", chain.toDF("id_a", "id_b"), maxIter = 12)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(auto.values.toSet === Set(0L))
    // two 6-cliques (mean degree 5 ⇒ propagation path) + a singleton
    val cliques = for {
      base <- Seq(0L, 6L); a <- 0L until 6L; b <- (a + 1) until 6L
    } yield (base + a, base + b)
    val got = Dedup.connectedComponentsAuto(
        (0L until 13L).toDF("doc_id"), "doc_id", cliques.toDF("id_a", "id_b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === (0L until 13L).map(i => i -> (if (i < 6) 0L else if (i < 12) 6L else i)).toMap)
  }

  test("singletons, empty edge list, duplicate and reversed pairs") {
    assert(run(4, Seq.empty) === Map(0L -> 0L, 1L -> 1L, 2L -> 2L, 3L -> 3L))
    val messy = Seq((1L, 2L), (2L, 1L), (1L, 2L), (3L, 3L))
    assert(run(5, messy.filter(p => p._1 != p._2)) ===
      Map(0L -> 0L, 1L -> 1L, 2L -> 1L, 3L -> 3L, 4L -> 4L))
  }
}
