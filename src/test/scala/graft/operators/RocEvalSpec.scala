package graft.operators

import graft.SparkSpec

class RocEvalSpec extends SparkSpec {
  import spark.implicits._

  private def summarize(rows: Seq[(Long, Long)]) =
    RocEval.summary(rows.toDF("score", "y"), "score", "y").collect()(0)

  test("perfect separation scores AUC = 1, AP = 1") {
    // all positives strictly above all negatives
    val r = summarize(Seq((10L, 1L), (9L, 1L), (5L, 0L), (3L, 0L), (2L, 0L)))
    assert(r.getAs[Long]("p_total") === 2L)
    assert(r.getAs[Long]("n_total") === 3L)
    assert(r.getAs[Long]("auc_num") === 12L)   // 2 * P * N
    assert(r.getAs[Long]("auc_den") === 12L)
    assert(r.getAs[Long]("auc_milli") === 1000L)
    assert(r.getAs[Long]("gini_milli") === 1000L)
    assert(r.getAs[Long]("ap_milli") === 1000L)
  }

  test("inverted scorer scores AUC = 0, Gini = -1000") {
    val r = summarize(Seq((1L, 1L), (2L, 1L), (5L, 0L), (9L, 0L)))
    assert(r.getAs[Long]("auc_num") === 0L)
    assert(r.getAs[Long]("auc_milli") === 0L)
    assert(r.getAs[Long]("gini_milli") === -1000L)
  }

  test("all scores tied gives AUC = 1/2 exactly") {
    val r = summarize(Seq((7L, 1L), (7L, 1L), (7L, 0L), (7L, 0L), (7L, 0L)))
    // every pos-neg pair is a tie: auc_num = P*N, half of auc_den
    assert(r.getAs[Long]("auc_num") === 6L)
    assert(r.getAs[Long]("auc_den") === 12L)
    assert(r.getAs[Long]("auc_milli") === 500L)
    assert(r.getAs[Long]("gini_milli") === 0L)
  }

  test("hand-computed mixed case with a tie") {
    // levels: s=3 (1 pos), s=2 (1 pos, 1 neg), s=1 (1 neg)
    // pairs: (3,pos) beats both negs -> 4 halves; (2,pos) beats neg@1
    // (2 halves) and ties neg@2 (1 half) => auc_num = 7, den = 8
    val r = summarize(Seq((3L, 1L), (2L, 1L), (2L, 0L), (1L, 0L)))
    assert(r.getAs[Long]("auc_num") === 7L)
    assert(r.getAs[Long]("auc_den") === 8L)
    assert(r.getAs[Long]("auc_milli") === 875L)
    // AP: thresholds desc: t=3 (tp=1, fp=0, prec=1, pos_t=1),
    // t=2 (tpge=2, fpge=1, prec=2/3, pos_t=1)
    // ap = (1*1 + 1*floor(1e6*2/3)/1e6)/2 = (1000000 + 666666)/2e6
    assert(r.getAs[Long]("ap_milli") === 833L)
  }

  test("matches a brute-force pairwise AUC on a pseudo-random corpus") {
    // deterministic LCG scores; label correlated with score + noise
    var seed = 12345L
    def next(): Long = { seed = seed * 6364136223846793005L + 1442695040888963407L; seed }
    val rows = (0 until 500).map { _ =>
      val s = math.floorMod(next(), 50L)
      val y = if (math.floorMod(next(), 100L) < 30L + s) 1L else 0L
      (s, y)
    }
    val pos = rows.filter(_._2 == 1L).map(_._1)
    val neg = rows.filter(_._2 == 0L).map(_._1)
    val halves = (for (p <- pos; n <- neg)
      yield if (p > n) 2L else if (p == n) 1L else 0L).sum
    val r = summarize(rows)
    assert(r.getAs[Long]("auc_num") === halves)
    assert(r.getAs[Long]("auc_den") === 2L * pos.size * neg.size)
  }

  test("single-class input yields NULL ratios, not NaN casts") {
    val r = summarize(Seq((5L, 1L), (3L, 1L)))
    assert(r.getAs[Long]("n_total") === 0L)
    assert(r.getAs[Long]("auc_den") === 0L)
    assert(r.isNullAt(r.fieldIndex("auc_milli")))
    assert(r.isNullAt(r.fieldIndex("gini_milli")))
    // AP is defined with no negatives: precision 1 at every threshold
    assert(r.getAs[Long]("ap_milli") === 1000L)
  }

  private def delong(rows: Seq[(Long, Long)]) =
    RocEval.delong(rows.toDF("score", "y"), "score", "y").collect()(0)

  test("delong: perfect separation gives AUC 1 with zero variance") {
    val r = delong(Seq((10L, 1L), (9L, 1L), (5L, 0L), (3L, 0L), (2L, 0L)))
    assert(r.getAs[Long]("auc_milli") === 1000L)
    // every positive placement = 2N/2N = 1 and every negative's = 0:
    // both sample variances vanish
    assert(r.getAs[Long]("se_micro") === 0L)
    assert(r.getAs[Long]("lo_milli") === 1000L)
    assert(r.getAs[Long]("hi_milli") === 1000L)
  }

  test("delong matches a hand computation with a discordant pair") {
    // pos scores {3, 1}, neg scores {2, 0}: placements (1/2N units):
    //   pos@3 → 2·2 = 4, pos@1 → 2·1 = 2  → AUC = (4+2)/(2·2·2) = 3/4
    //   neg@2 → 2·1+0 = 2, neg@0 → 2·2+0 = 4
    val r = delong(Seq((3L, 1L), (1L, 1L), (2L, 0L), (0L, 0L)))
    assert(r.getAs[Long]("auc_milli") === 750L)
    // S10 = var{1, 1/2} = 1/8, S01 = var{1/2, 1} = 1/8 (n−1 form);
    // var = 1/8/2 + 1/8/2 = 1/8 → se = 0.3535533...
    val want = math.floor(math.sqrt(0.125) * 1000000 + 0.5).toLong
    assert(r.getAs[Long]("se_micro") === want)
  }

  test("delong: a single-positive holdout yields NULL se/bands, not Infinity") {
    // (p_total − 1) = 0 would otherwise divide to ±Infinity/NaN; the
    // nullIfZero guard (NULLIF in the q219 oracle) makes the variance
    // honestly undefined while the AUC itself stays defined
    val r = delong(Seq((9L, 1L), (5L, 0L), (3L, 0L)))
    assert(r.getAs[Long]("auc_milli") === 1000L)
    assert(r.isNullAt(r.fieldIndex("se_micro")))
    assert(r.isNullAt(r.fieldIndex("lo_milli")))
    assert(r.isNullAt(r.fieldIndex("hi_milli")))
  }

  test("delong AUC equals summary's AUC on a mixed corpus") {
    val rows = (1L to 200L).map(i =>
      ((i * 37 % 101), if ((i * 53 % 97) < 40 == (i * 37 % 101) > 50) 1L else 0L))
    val a = summarize(rows).getAs[Long]("auc_milli")
    val b = delong(rows).getAs[Long]("auc_milli")
    assert(a === b)
  }
}
