package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

/** Two-sample rank tests (operators.RankTests): hand-computed KS
  * max-deviation (location and exact rational), Mann–Whitney doubled
  * rank-sum with tie correction, and layout invariance.
  */
class RankTestsSpec extends SparkSpec {

  /** A (even users) = [1,2,2,4]; B (odd users) = [2,3]. */
  private def fixture: DataFrame = {
    import spark.implicits._
    Seq((0L, 1.0), (2L, 2.0), (4L, 2.0), (6L, 4.0), (1L, 2.0), (3L, 3.0))
      .toDF("user_id", "value")
  }
  private val isA = col("user_id") % 2 === 0

  test("KS: exact max |F1-F2| cross-product and its location") {
    import spark.implicits._
    val out = RankTests.ks(fixture, "value", isA)
      .as[(Double, Long, Long, Long, Long, Long)].collect().toSeq
    // D = 2/8 first attained at v = 1.0
    assert(out == Seq((1.0, 4L, 2L, 2L, 8L, 250000L)), s"got $out")
  }

  test("MWU: doubled tie-averaged rank sum, tie term, z") {
    import spark.implicits._
    val out = RankTests.mannWhitneyU(fixture, "value", isA)
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    // ranks: 1; {2,3,4}→3 each; 5; 6 → R_A = 13, r2a = 26, u2 = 6;
    // ties: one triple → 24
    val z = (6.0 - 8.0) / 2.0 / math.sqrt(
      4.0 * 2.0 / 12.0 * ((6.0 + 1.0) - 24.0 / (6.0 * 5.0)))
    val zMicro = math.floor(z * 1000000 + 0.5).toLong
    assert(out == Seq((4L, 2L, 6L, 24L, zMicro)), s"got $out (want z=$zMicro)")
  }

  test("Spearman: monotone → 1, planted tie case → exactly 0") {
    import spark.implicits._
    val mono = Seq((1.0, 1.0), (2.0, 4.0), (3.0, 9.0)).toDF("x", "y")
    val r1 = RankTests.spearman(mono, "x", "y")
      .as[(Long, Long)].collect().toSeq
    assert(r1 == Seq((3L, 1000000L)), s"got $r1")
    // ranks x: (1.5, 1.5, 3) → r2 (3,3,6); y: (1,3,2) → r2 (2,6,4);
    // Pearson numerator 3·48 − 12·12 = 0
    val tied = Seq((1.0, 3.0), (1.0, 5.0), (2.0, 4.0)).toDF("x", "y")
    val r0 = RankTests.spearman(tied, "x", "y")
      .as[(Long, Long)].collect().toSeq
    assert(r0 == Seq((3L, 0L)), s"got $r0")
  }

  test("both tests are layout invariant") {
    import spark.implicits._
    def runKs(df: DataFrame) =
      RankTests.ks(df, "value", isA)
        .as[(Double, Long, Long, Long, Long, Long)].collect().toSeq
    def runMwu(df: DataFrame) =
      RankTests.mannWhitneyU(df, "value", isA)
        .as[(Long, Long, Long, Long, Long)].collect().toSeq
    assert(runKs(fixture.repartition(5)) == runKs(fixture.repartition(1)))
    assert(runMwu(fixture.repartition(5)) == runMwu(fixture.repartition(1)))
  }

  test("Cramér–von Mises: identical samples → 0, disjoint samples → large") {
    import spark.implicits._
    def t(rows: Seq[(Long, Boolean)]) =
      graft.operators.RankTests.cramerVonMises(
        rows.toDF("v", "a"), "v", org.apache.spark.sql.functions.col("a"))
        .head().getAs[Long]("t_micro")
    // same multiset in both cohorts: every D_v = 0
    val same = (1L to 40L).flatMap(v => Seq((v, true), (v, false)))
    assert(t(same) === 0L)
    // fully separated cohorts: T approaches its maximum (~n/(3N) form;
    // must dwarf the identical case by orders of magnitude)
    val apart = (1L to 40L).map((_, true)) ++ (41L to 80L).map((_, false))
    assert(t(apart) > 100000L)
    // layout invariance (snapped terms are order-free)
    val df = apart.toDF("v", "a")
    def run(p: Int) = graft.operators.RankTests.cramerVonMises(
      df.repartition(p), "v", org.apache.spark.sql.functions.col("a"))
      .head().getAs[Long]("t_micro")
    assert(run(1) === run(7))
  }

  test("Kruskal–Wallis: hand case with the documented term quantization") {
    import spark.implicits._
    // groups {1,2} vs {3,4}: doubled rank sums 6 and 14, snapped
    // terms floor(36/8)=4 and floor(196/8)=24 → S=28,
    // H = 12/(4·5)·28 − 3·5 = 1.8; no ties so corrected H equals H
    val df = Seq(("a", 1L), ("a", 2L), ("b", 3L), ("b", 4L)).toDF("g", "v")
    val r = graft.operators.RankTests.kruskalWallis(df, "v", "g").head()
    assert(r.getAs[Long]("n_total") === 4L)
    assert(r.getAs[Long]("n_groups") === 2L)
    assert(r.getAs[Long]("tie_sum") === 0L)
    assert(r.getAs[Long]("h_micro") === 1800000L)
    assert(r.getAs[Long]("h_corr_micro") === 1800000L)
  }

  test("Kruskal–Wallis separates shifted groups and is layout invariant") {
    import spark.implicits._
    val sep = ((1L to 30L).map(("a", _)) ++ (31L to 60L).map(("b", _)) ++
      (61L to 90L).map(("c", _))).toDF("g", "v")
    val mixed = (1L to 90L).map(v => (Seq("a", "b", "c")((v % 3).toInt), v))
      .toDF("g", "v")
    def h(df: org.apache.spark.sql.DataFrame) =
      graft.operators.RankTests.kruskalWallis(df, "v", "g")
        .head().getAs[Long]("h_corr_micro")
    assert(h(sep) > 50L * 1000000L, "fully separated groups: H near max")
    assert(h(mixed) < 2L * 1000000L, "interleaved groups: H near 0")
    assert(h(sep.repartition(7)) === h(sep.repartition(1)))
  }
}
