package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Retrieval training-data operators over an embedding column: hard-
  * negative mining (the DPR/ANCE contrastive-training step — Karpukhin
  * et al. 2020 §3.2; Xiong et al. 2021) and MMR result
  * diversification (Carbonell & Goldstein, SIGIR'98). Both ride the
  * engine's quantized-integer distance convention ([[KMeans]]
  * DistQuantum) so rankings, scores, and the greedy MMR recurrence
  * replay exactly in oracle SQL — no float comparison anywhere.
  */
object Retrieval {

  /** Exact quantized squared L2 Σ_j floor((a_j − b_j)²·quantum) as a
    * Catalyst column — the column form of [[KMeans.Model.quantDist]],
    * backed by the native fused-loop expression
    * [[graft.functions.QuantL2]] (bit-identical to the composed
    * zip_with+aggregate form, spec-pinned; no per-row intermediate
    * array). Registration is idempotent on the active session.
    */
  def quantL2(a: Column, b: Column, quantum: Double = KMeans.DistQuantum.toDouble): Column = {
    graft.functions.GraftFunctions.register(
      org.apache.spark.sql.SparkSession.active)
    graft.functions.GraftFunctions.quant_l2(a, b, lit(quantum))
  }

  /** The scalar twin of [[quantL2]] for driver-side bounded work. */
  def quantL2(a: Array[Float], b: Array[Float]): Long = {
    var s = 0L
    var j = 0
    val n = math.min(a.length, b.length)
    while (j < n) {
      val d = a(j).toDouble - b(j).toDouble
      s += math.floor(d * d * KMeans.DistQuantum.toDouble).toLong
      j += 1
    }
    s
  }

  /** Hard-negative mining: for each probe row, the `k` nearest corpus
    * rows whose label DIFFERS — the negatives that most confuse a
    * retriever, which is exactly what contrastive training wants.
    * Probes broadcast (hash-bounded), ranking is a per-probe window
    * (bounded by the probe count), distances quantized-exact.
    * Returns (query_id, neg_id, rank, dist).
    */
  def hardNegatives(
      embs: DataFrame,
      idCol: String,
      vecCol: String,
      labelCol: String,
      probeRate: Double,
      salt: Long,
      k: Int): DataFrame = {
    val probes = embs
      .filter(Sampling.hashFraction(col(idCol), salt) < probeRate)
      .select(col(idCol).as("query_id"), col(vecCol).as("qvec"),
        col(labelCol).as("qlabel"))
    val ranked = embs
      .join(broadcast(probes), col(labelCol) =!= col("qlabel"))
      .withColumn("dist", quantL2(col(vecCol), col("qvec")))
      .withColumn("rank", row_number().over(
        Window.partitionBy(col("query_id")).orderBy(col("dist"), col(idCol))))
    ranked.filter(col("rank") <= k)
      .select(col("query_id"), col(idCol).as("neg_id"), col("rank"), col("dist"))
  }

  /** One MMR greedy selection over a bounded candidate pool (driver-
    * side: the pool is top-`poolSize` rows, k·dim floats — the same
    * bounded-collect class as [[KMeans.initByHash]]'s seed rows).
    *
    * Seed = nearest to the query; each later step picks, among
    * unselected pool rows, the maximizer of
    * `min_{s∈selected} dist(d, s) − dist(d, q)` (ties → lowest id) —
    * the λ=1/2 MMR trade rewritten in distances, kept in exact
    * integers so the oracle's unrolled per-step CTEs pick identical
    * rows. The seed's score is defined as −dist(q, seed).
    * Returns (rank, vec_id, mmr_score).
    */
  def mmrSelect(
      embs: DataFrame,
      idCol: String,
      vecCol: String,
      query: Array[Float],
      poolSize: Int,
      k: Int,
      excludeId: Option[Long] = None): DataFrame = {
    val spark = embs.sparkSession
    import spark.implicits._
    val base = excludeId.map(x => embs.filter(col(idCol) =!= x)).getOrElse(embs)
    val pool = base
      .withColumn("dq", quantL2(col(vecCol), lit(query)))
      .orderBy(col("dq"), col(idCol))
      .limit(poolSize)
      .select(col(idCol).cast("long"), col(vecCol), col("dq"))
      .as[(Long, Array[Float], Long)]
      .collect()

    val selected = scala.collection.mutable.ArrayBuffer.empty[(Int, Long, Long)]
    val chosen = scala.collection.mutable.Set.empty[Long]
    // seed: min (dq, id)
    val seed = pool.minBy { case (id, _, dq) => (dq, id) }
    selected += ((1, seed._1, -seed._3))
    chosen += seed._1
    var r = 2
    while (r <= k && chosen.size < pool.length) {
      val best = pool.iterator
        .filterNot { case (id, _, _) => chosen.contains(id) }
        .map { case (id, v, dq) =>
          val minDd = pool.iterator
            .filter { case (sid, _, _) => chosen.contains(sid) }
            .map { case (_, sv, _) => quantL2(v, sv) }
            .min
          (id, minDd - dq)
        }
        // argmax score, ties lowest id — one pass, exact integers
        .reduceLeft { (a, b) =>
          if (b._2 > a._2 || (b._2 == a._2 && b._1 < a._1)) b else a
        }
      selected += ((r, best._1, best._2))
      chosen += best._1
      r += 1
    }
    spark.createDataFrame(selected.toSeq)
      .toDF("rank", "vec_id", "mmr_score")
      .select(col("rank").cast("int"), col("vec_id"), col("mmr_score"))
      .orderBy(col("rank"))
  }
}
