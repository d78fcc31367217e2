package graft.operators

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.rdd.RDD
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Distributed Lloyd's k-means over an embedding column — the corpus
  * clustering primitive behind semantic dedup (SemDeDup: Abbas et al.,
  * "SemDeDup: Data-efficient learning at web-scale through semantic
  * deduplication", 2023: cluster, then near-dup within cells) and the
  * data-adaptive coarse quantizer for [[IvfSearch]].
  *
  * Unlike a driver-side sample trainer, every Lloyd iteration here is a
  * full pass over the DISTRIBUTED table: assignment is a narrow map
  * with the (tiny) centroid matrix on the closure, and the centroid
  * update is a mergeable per-centroid (count, Σvec) aggregation — one
  * `treeAggregate` per iteration moving k·dim longs per partition,
  * never the data. The same monoid discipline as
  * [[graft.functions.CountMinSketch]]: partial states merge
  * associatively, so the plan is map-side-combined and shuffle-free
  * (the tree combine is on the k×dim accumulator, not rows).
  *
  * Determinism (the cross-engine + cross-layout contract, SURVEY §7.4):
  *  - component sums are quantized to floor(v·2^24) BIGINTs — integer
  *    addition commutes, so the centroid recurrence is bit-identical
  *    across partition layouts AND replayable in oracle SQL (the q99 /
  *    q117 quantization convention; 2^24 leaves headroom for 2^38 rows
  *    per cell before a long could saturate);
  *  - assignment distances are themselves quantized per term
  *    (floor((v−c)²·2^20)), summed exactly, and tie-broken by cell id
  *    through one exact integer ordinal (dist·k + cell) — no float
  *    comparison anywhere in the argmin;
  *  - init is the k vectors of smallest (portable-hash fraction, id) —
  *    [[Sampling.hashFraction]], the engine's portable xor-shift hash,
  *    so the oracle selects the identical seeds.
  *
  * Reference seam: the reference's pipeline stops at per-chunk
  * embeddings + brute-force cosine ranking
  * (`04-similarity-search.py:63-75`); clustering the embedding space is
  * the LLM-data-pipeline extension (SURVEY §2.12).
  */
object KMeans {

  /** 2^24 — component-sum quantum. */
  val SumQuantum = 16777216L
  /** 2^20 — distance-term quantum. */
  val DistQuantum = 1048576L

  final case class Model(centroids: Array[Array[Double]]) extends Serializable {
    def k: Int = centroids.length
    def dim: Int = if (centroids.isEmpty) 0 else centroids(0).length

    /** Quantized squared distance Σ_j floor((v_j − c_j)²·2^20): exact
      * integers, so comparisons are layout- and engine-independent.
      * Terms are bounded by (v−c)²·2^20 ≤ 4·2^20 per dimension for
      * unit-scale embeddings — a 64-dim sum stays below 2^28.
      */
    def quantDist(v: Array[Float], cell: Int): Long = {
      val c = centroids(cell)
      var s = 0L
      var j = 0
      val n = math.min(c.length, v.length)
      while (j < n) {
        val d = v(j).toDouble - c(j)
        s += math.floor((d * d) * DistQuantum.toDouble).toLong
        j += 1
      }
      s
    }

    /** Nearest cell under the exact ordinal dist·k + cell — the ordinal
      * both argmins (distance, then lowest cell id on ties) in one
      * integer min, mirrored verbatim by the oracle's
      * `min(dq·k + cell) % k`.
      */
    def assign(v: Array[Float]): Int = {
      var best = 0
      var bestOrd = Long.MaxValue
      var c = 0
      while (c < centroids.length) {
        val ord = quantDist(v, c) * centroids.length + c
        if (ord < bestOrd) { bestOrd = ord; best = c }
        c += 1
      }
      best
    }
  }

  /** Deterministic, oracle-replayable init: the k vectors of smallest
    * (hashFraction(id), id). A tiny bounded collect (k rows) — the
    * ordering is a TakeOrderedAndProject, not a global sort.
    * Duplicate vectors may seed two cells; the assignment tie-break
    * then drains one of them, which keeps its centroid (documented
    * empty-cell rule) — still fully deterministic.
    */
  def initByHash(
      embs: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      salt: Long): Array[Array[Double]] = {
    require(k >= 1, "k must be >= 1")
    val spark = embs.sparkSession
    import spark.implicits._
    val rows = embs
      .select(col(vecCol), Sampling.hashFraction(col(idCol), salt).as("f"), col(idCol).as("i"))
      .orderBy(col("f"), col("i"))
      .limit(k)
      .select(col(vecCol))
      .as[Array[Float]]
      .collect()
    require(rows.nonEmpty, "cannot train k-means on an empty table")
    rows.map(_.map(_.toDouble))
  }

  /** One Lloyd step over the full distributed data: broadcast-assign
    * (narrow), then treeAggregate the quantized (count, Σvec) per cell.
    * Empty cells keep their previous centroid. The new centroid
    * component is (Σq as double / n) / 2^24 — the exact expression the
    * oracle replays.
    */
  def lloydStep(vecs: RDD[Array[Float]], model: Model): Model = {
    val k = model.k
    val dim = model.dim
    val bc: Broadcast[Model] = vecs.sparkContext.broadcast(model)
    val zero = (new Array[Long](k), Array.fill(k)(new Array[Long](dim)))
    val (counts, sums) = vecs.treeAggregate(zero)(
      seqOp = { case ((cnt, sm), v) =>
        val c = bc.value.assign(v)
        cnt(c) += 1L
        val s = sm(c)
        var j = 0
        val n = math.min(dim, v.length)
        while (j < n) {
          s(j) += math.floor(v(j).toDouble * SumQuantum.toDouble).toLong
          j += 1
        }
        (cnt, sm)
      },
      combOp = { case ((c1, s1), (c2, s2)) =>
        var c = 0
        while (c < k) {
          c1(c) += c2(c)
          val a = s1(c); val b = s2(c)
          var j = 0
          while (j < dim) { a(j) += b(j); j += 1 }
          c += 1
        }
        (c1, s1)
      })
    bc.destroy()
    Model(model.centroids.indices.map { c =>
      if (counts(c) == 0L) model.centroids(c)
      else sums(c).map(s => (s.toDouble / counts(c)) / SumQuantum.toDouble)
    }.toArray)
  }

  /** Full distributed training: portable-hash init + `iterations` Lloyd
    * passes over the table. The vector RDD is cached across iterations
    * (each pass reads it once; nothing but the k·dim model ever reaches
    * the driver).
    */
  def train(
      embs: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      iterations: Int,
      salt: Long = 0L): Model = {
    require(iterations >= 0, "iterations must be >= 0")
    val spark = embs.sparkSession
    import spark.implicits._
    var model = Model(initByHash(embs, idCol, vecCol, k, salt))
    val vecs = embs.select(col(vecCol)).as[Array[Float]].rdd
    vecs.persist(StorageLevel.MEMORY_AND_DISK)
    try {
      var i = 0
      while (i < iterations) { model = lloydStep(vecs, model); i += 1 }
    } finally vecs.unpersist(blocking = false)
    model
  }

  /** Cell assignment as a DataFrame — a narrow map (the model rides the
    * closure), no shuffle. Extra carried columns are preserved so
    * downstream per-cell work (SemDeDup) needs no join back.
    */
  def assignCells(
      embs: DataFrame,
      idCol: String,
      vecCol: String,
      model: Model): DataFrame = {
    val spark = embs.sparkSession
    import spark.implicits._
    embs.select(col(idCol).cast("long"), col(vecCol))
      .as[(Long, Array[Float])]
      .mapPartitions { it => it.map { case (id, v) => (id, v, model.assign(v)) } }
      .toDF(idCol, vecCol, "cell")
  }

  /** SemDeDup-style semantic near-dup pairs: cluster the embedding
    * space, then run the EXACT grid cosine join WITHIN cells
    * ([[Dedup.cosineJoinGrid]] with the cell as the block column). The
    * Σ n_cell² work replaces the corpus-wide n² — clustering is the
    * recall-lossy-but-cheap blocking step SemDeDup trades on, and each
    * (cell, grid) task stays bounded regardless of cell skew.
    */
  def semanticDedup(
      embs: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      iterations: Int,
      threshold: Double,
      salt: Long = 0L): DataFrame = {
    val model = train(embs, idCol, vecCol, k, iterations, salt)
    val withCell = assignCells(embs, idCol, vecCol, model)
    Dedup.cosineJoinGrid(withCell, idCol, vecCol, threshold, Some("cell"))
  }
}
