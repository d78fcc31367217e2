package graft.operators

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.rdd.RDD
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Distributed binary linear classifier — full-batch gradient descent
  * with a hard-sigmoid link, every arithmetic step in exact fixed-point
  * integers so the ENTIRE training recurrence is replayable in oracle
  * SQL (the [[KMeans]] q118 treatment applied to supervised training).
  * This is the quality-classifier primitive of an LLM training-data
  * pipeline: train a cheap linear model on a labeled slice, score the
  * full corpus, keep what clears the bar (GPT-3/CCNet-style quality
  * filtering — Brown et al. 2020 §A; Wenzek et al. 2020).
  *
  * Shape at scale: one `treeAggregate` per GD iteration moving a
  * (dim+1)-long gradient accumulator per partition — the corpus never
  * shuffles, the driver only ever sees dim-sized arrays (same monoid
  * discipline as [[KMeans.lloydStep]]). Scoring is a narrow map with
  * the weight vector on the closure.
  *
  * Determinism (cross-engine + cross-layout, SURVEY §7.4):
  *  - features are floor(v·2^10) BIGINTs (+ a constant-2^10 bias), so
  *    every dot product / gradient term is exact integer arithmetic
  *    and partial sums commute across any partition layout;
  *  - the link is the HARD sigmoid clamp(1/2 + z/4, 0, 1) — piecewise
  *    linear, so it stays inside integer arithmetic (a transcendental
  *    sigmoid could never hash-match across engines);
  *  - the only divisions are [[LogReg.fdiv]]: floor of an IEEE-754
  *    double quotient with both operands < 2^53. Exactly-rounded
  *    division is deterministic, so both engines floor the identical
  *    quotient — cross-engine agreement, which is the requirement,
  *    not mathematical floor on rationals;
  *  - class imbalance is handled by an INTEGER per-class error weight
  *    (positives count `posWeight`×), keeping the weighted gradient
  *    sum exact.
  *
  * Headroom: |err·x·wy| ≤ 2^10·2^12·2^4 = 2^26 per row, so the
  * gradient long survives ~2^37 rows per class-weighted sum; past
  * that, raise the accumulator to per-partition partials + a final
  * decimal(38) combine (the [[KMeans]] 2^38-rows-per-cell note, one
  * scale tier earlier).
  *
  * Reference seam: the reference stops at embedding inference
  * (`03-model-inference-on-chunks.py:131`); training ON those
  * embeddings is the LLM-data-pipeline extension (SURVEY §2.12).
  */
object LogReg {

  /** 2^10 — feature quantum (floor(v·2^10), and the bias feature). */
  val FeatScale = 1024L
  /** 2^16 — weight fixed-point quantum. */
  val WeightScale = 65536L

  /** Floor of the IEEE double quotient — mirrored verbatim by the
    * oracle's CAST(floor(CAST(a AS DOUBLE)/CAST(b AS DOUBLE)) AS
    * BIGINT). Requires |a|,|b| < 2^53 (all call sites are, see
    * headroom note above).
    */
  def fdiv(a: Long, b: Long): Long =
    math.floor(a.toDouble / b.toDouble).toLong

  final case class Model(w: Array[Long]) extends Serializable {
    def dim: Int = w.length - 1

    /** Fixed-point margin Σ w_j·x_j (scale WeightScale·FeatScale). */
    def margin(x: Array[Long]): Long = {
      var s = 0L
      var j = 0
      val n = math.min(w.length, x.length)
      while (j < n) { s += w(j) * x(j); j += 1 }
      s
    }

    /** Hard-sigmoid score in [0, FeatScale]:
      * clamp(FeatScale/2 + z/(4·WeightScale), 0, FeatScale).
      */
    def score(x: Array[Long]): Long = {
      val p = FeatScale / 2 + fdiv(margin(x), 4L * WeightScale)
      math.min(math.max(p, 0L), FeatScale)
    }
  }

  /** floor(v·2^10) features plus the trailing bias feature (=2^10). */
  def quantize(v: Array[Float]): Array[Long] = {
    val x = new Array[Long](v.length + 1)
    var j = 0
    while (j < v.length) {
      x(j) = math.floor(v(j).toDouble * FeatScale.toDouble).toLong
      j += 1
    }
    x(v.length) = FeatScale
    x
  }

  /** One full-batch GD step: with weights broadcast, each row adds
    * wy·(p−y·2^10)·x_j into a (dim+1)-long accumulator; the update is
    * w_j ← w_j − fdiv(fdiv(Σg_j, Σwy)·2^16, etaDen·2^20) — i.e. a
    * learning rate of 1/etaDen on the mean weighted gradient.
    */
  def gdStep(
      rows: RDD[(Array[Long], Long, Long)], // (x, y, wy)
      model: Model,
      etaDen: Long): Model = {
    val d = model.w.length
    val bc: Broadcast[Model] = rows.sparkContext.broadcast(model)
    val zero = (new Array[Long](d), 0L)
    val (grad, cnt) = rows.treeAggregate(zero)(
      seqOp = { case ((g, c), (x, y, wy)) =>
        val m = bc.value
        val err = (m.score(x) - FeatScale * y) * wy
        var j = 0
        val n = math.min(d, x.length)
        while (j < n) { g(j) += err * x(j); j += 1 }
        (g, c + wy)
      },
      combOp = { case ((g1, c1), (g2, c2)) =>
        var j = 0
        while (j < d) { g1(j) += g2(j); j += 1 }
        (g1, c1 + c2)
      })
    bc.destroy()
    if (cnt == 0L) model
    else Model(model.w.zip(grad).map { case (w, g) =>
      w - fdiv(fdiv(g, cnt) * WeightScale, etaDen * FeatScale * FeatScale)
    })
  }

  /** Full distributed training from zero weights. `labelCol` must be
    * 0/1; positives' errors count `posWeight`× (integer class
    * rebalancing). The quantized feature RDD is cached across
    * iterations; only (dim+1)-long arrays ever reach the driver.
    */
  def train(
      df: DataFrame,
      vecCol: String,
      labelCol: String,
      iterations: Int,
      etaDen: Long = 2L,
      posWeight: Long = 1L): Model = {
    require(iterations >= 0, "iterations must be >= 0")
    require(etaDen >= 1L, "etaDen must be >= 1")
    require(posWeight >= 1L, "posWeight must be >= 1")
    val spark = df.sparkSession
    import spark.implicits._
    val rows = df
      .select(col(vecCol), col(labelCol).cast("long"))
      .as[(Array[Float], Long)]
      .rdd
      .map { case (v, y) => (quantize(v), y, if (y == 1L) posWeight else 1L) }
    rows.persist(StorageLevel.MEMORY_AND_DISK)
    try {
      // fail loudly on an empty training split (degenerate
      // trainFraction / over-filtering) instead of silently fitting
      // the zero model — first() would throw an opaque
      // NoSuchElementException here anyway
      val dimRow = df.select(size(col(vecCol))).limit(1).collect()
      require(dimRow.nonEmpty,
        "training input is empty — check trainFraction / upstream filters")
      val dim = dimRow(0).getInt(0)
      var model = Model(new Array[Long](dim + 1))
      var i = 0
      while (i < iterations) { model = gdStep(rows, model, etaDen); i += 1 }
      model
    } finally rows.unpersist(blocking = false)
  }

  /** Scores every row — a narrow map (the model rides the closure, no
    * shuffle): (id, margin, score, pred, y) where pred = [margin ≥ 0].
    */
  def scoreAll(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      labelCol: String,
      model: Model): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(vecCol), col(labelCol).cast("long"))
      .as[(Long, Array[Float], Long)]
      .mapPartitions { it =>
        it.map { case (id, v, y) =>
          val x = quantize(v)
          val z = model.margin(x)
          (id, z, model.score(x), if (z >= 0L) 1L else 0L, y)
        }
      }
      .toDF(idCol, "margin", "score", "pred", "y")
  }

  /** Train on the hash-selected `trainFraction` split, evaluate on the
    * rest: one row (tp, fp, fn, tn, acc_milli). The holdout
    * calibration step of a quality-filter rollout.
    */
  def splitEval(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      labelCol: String,
      iterations: Int,
      etaDen: Long,
      posWeight: Long,
      trainFraction: Double,
      salt: Long): DataFrame = {
    val f = Sampling.hashFraction(col(idCol), salt)
    val model = train(df.filter(f < trainFraction), vecCol, labelCol,
      iterations, etaDen, posWeight)
    val scored = scoreAll(df.filter(f >= trainFraction), idCol, vecCol,
      labelCol, model)
    val tp = sum(when(col("pred") === 1 && col("y") === 1, 1L).otherwise(0L))
    val fp = sum(when(col("pred") === 1 && col("y") === 0, 1L).otherwise(0L))
    val fn = sum(when(col("pred") === 0 && col("y") === 1, 1L).otherwise(0L))
    val tn = sum(when(col("pred") === 0 && col("y") === 0, 1L).otherwise(0L))
    // empty holdout (trainFraction near 1.0 on a tiny table) → NULL
    // acc_milli explicitly, never 0/0 → NaN whose BIGINT cast is
    // engine-defined
    scored.agg(tp.as("tp"), fp.as("fp"), fn.as("fn"), tn.as("tn"))
      .withColumn("acc_milli",
        expr("CAST(CASE WHEN tp + fp + fn + tn = 0 THEN NULL " +
          "ELSE floor(CAST(1000 * (tp + tn) AS DOUBLE) / " +
          "CAST(tp + fp + fn + tn AS DOUBLE)) END AS BIGINT)"))
  }
}
