package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class HybridSearchSpec extends SparkSpec {

  test("rrf: doc in both legs beats docs in one; missing leg contributes 0") {
    import spark.implicits._
    val kw = Seq((10L, 1), (20L, 2), (30L, 3)).toDF("id", "rank")
    val vec = Seq((20L, 1), (40L, 2)).toDF("id", "rank")
    val fused = HybridSearch.rrfFuse(Seq(kw, vec), k = 10)
      .collect().map(r => r.getLong(0) -> ((r.getDouble(1), r.getLong(2)))).toMap
    // doc 20: 1/62 + 1/61 ≈ 0.0325 — the only two-leg doc, top score
    assert(fused(20L)._2 === 2L)
    assert(fused(20L)._1 > fused(10L)._1)
    assert(fused(10L)._1 > fused(30L)._1)   // rank 1 beats rank 3 within a leg
    assert(fused(40L)._2 === 1L)
    // exact r4 values
    assert(fused(20L)._1 === math.floor((1.0 / 62 + 1.0 / 61) * 10000 + 0.5) / 10000)
  }

  test("ranked: scores to 1-based ranks, ties broken by id") {
    import spark.implicits._
    val leg = Seq((5L, 0.9), (3L, 0.9), (7L, 0.5)).toDF("doc", "s")
    val got = HybridSearch.ranked(leg, "doc", "s")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === Map(3L -> 1L, 5L -> 2L, 7L -> 3L))
  }
}
