package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.DataFrame

/** χ² feature selection (operators.ChiSquare): hand-computed 2×2
  * contingency scores, the ubiquitous/absent-word filter, and layout
  * invariance of the fixed-point scores.
  */
class ChiSquareSpec extends SparkSpec {

  /** N=4: class a docs {x y, x z}, class b docs {y z, z z}; "all"
    * appears in every doc (must be filtered as zero-information).
    */
  private def fixture: DataFrame = {
    import spark.implicits._
    Seq(
      (1L, "x x y all", "a"),
      (2L, "x z all", "a"),
      (3L, "y z all", "b"),
      (4L, "z z all", "b")
    ).toDF("id", "text", "label")
  }

  test("hand-computed chi2 on a 2-class corpus; ubiquitous word filtered") {
    import spark.implicits._
    val out = ChiSquare.topFeatures(fixture, "id", "text", "label", k = 3)
      .select($"c", $"w", $"a_docs", $"chi2_q", $"rnk")
      .as[(String, String, Long, Long, Long)].collect().toSeq
    // class a: x (A=2,B=0,C=0,D=2) → χ²=4 → 40000;
    //          z (A=1,B=2,C=1,D=0) → 16/12 → 13333; y → 0
    assert(out.filter(_._1 == "a") == Seq(
      ("a", "x", 2L, 40000L, 1L),
      ("a", "z", 1L, 13333L, 2L),
      ("a", "y", 1L, 0L, 3L)), s"got $out")
    // symmetric 2-class case: identical scores, mirrored counts
    assert(out.filter(_._2 == "x").map(r => (r._1, r._3, r._4)).toSet ==
      Set(("a", 2L, 40000L), ("b", 0L, 40000L)))
    assert(!out.exists(_._2 == "all"), "present-everywhere word must drop")
  }

  test("scores are identical across partition layouts") {
    import spark.implicits._
    def run(df: DataFrame) =
      ChiSquare.topFeatures(df, "id", "text", "label", k = 5)
        .as[(String, String, Long, Long, Long)].collect().toSeq
    assert(run(fixture.repartition(1)) == run(fixture.repartition(5)))
  }
}
