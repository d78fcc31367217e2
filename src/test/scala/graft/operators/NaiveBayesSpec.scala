package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.DataFrame

/** Multinomial Naive Bayes (operators.NaiveBayes): planted-class
  * recovery, layout invariance of the fixed-point scores, prior
  * dominance on empty evidence, and the no-token drop rule.
  */
class NaiveBayesSpec extends SparkSpec {

  /** Three classes with disjoint dominant words plus shared noise —
    * deterministic (no RNG), trivially separable.
    */
  private def planted(n: Int): DataFrame = {
    import spark.implicits._
    val marker = Array("alpha", "bravo", "charlie")
    (0L until n.toLong).map { i =>
      val c = (i % 3).toInt
      val text = (s"${marker(c)} ${marker(c)} shared" +
        (if (i % 2 == 0) " noise" else ""))
      (i, text, s"c$c")
    }.toDF("id", "text", "label")
  }

  test("recovers planted classes exactly") {
    import spark.implicits._
    val out = NaiveBayes.classify(planted(90), "id", "text", "label")
    val rows = out.select($"label", $"pred_label").as[(String, String)].collect()
    assert(rows.length == 90)
    assert(rows.forall { case (y, p) => y == p },
      "disjoint marker words must be perfectly recovered")
  }

  test("scores are bit-identical across partition layouts") {
    import spark.implicits._
    val docs = planted(60)
    def run(df: DataFrame) =
      NaiveBayes.classify(df, "id", "text", "label")
        .select($"id", $"pred_label", $"score")
        .as[(Long, String, Long)].collect().sortBy(_._1).toSeq
    assert(run(docs.repartition(1)) == run(docs.repartition(5)),
      "r4-rounded-then-summed scores must be layout-independent")
  }

  test("token-free rows drop; ties break by label order") {
    import spark.implicits._
    val docs = Seq(
      (1L, "x y", "a"),
      (2L, "x y", "b"),
      (3L, "", "a")
    ).toDF("id", "text", "label")
    val out = NaiveBayes.classify(docs, "id", "text", "label")
      .select($"id", $"pred_label").as[(Long, String)].collect().toMap
    assert(!out.contains(3L), "no tokens → no evidence → dropped")
    // identical likelihoods for both docs; both classes have equal
    // priors and identical conditionals, so the tie breaks to 'a'
    assert(out(1L) == "a" && out(2L) == "a")
  }
}
