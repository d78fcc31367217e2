package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class GraphOpsSpec extends SparkSpec {

  private def stats(edges: Seq[(Long, Long)]) = {
    import spark.implicits._
    val r = GraphOps.triangleStats(edges.toDF("u", "v"), "u", "v").head
    (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))
  }

  test("a 4-clique has 4 triangles and clustering 1") {
    val k4 = for { a <- 1L to 4L; b <- (a + 1) to 4L } yield (a, b)
    assert(stats(k4) === ((4L, 6L, 4L, 1.0)))
  }

  test("a path has none; closing it makes exactly one") {
    assert(stats(Seq((1L, 2L), (2L, 3L)))._3 === 0L)
    assert(stats(Seq((1L, 2L), (2L, 3L), (1L, 3L)))._3 === 1L)
  }

  test("orientation dedups reversed/duplicate edges and drops self-loops") {
    // same triangle given with mixed directions, a repeat, and a loop
    val messy = Seq((2L, 1L), (1L, 2L), (3L, 2L), (1L, 3L), (3L, 3L))
    val (n, e, t, _) = stats(messy)
    assert((n, e, t) === ((3L, 3L, 1L)))
  }

  test("empty graph reports zeros, not nulls") {
    assert(stats(Seq.empty) === ((0L, 0L, 0L, 0.0)))
  }
}
