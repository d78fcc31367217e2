package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Product quantization for vector search (Jégou, Douze, Schmid —
  * "Product Quantization for Nearest Neighbor Search", TPAMI 2011) —
  * the third leg of the ANN family: [[AnnSearch]] buckets by
  * hyperplane LSH (no training), [[IvfSearch]] prunes by a coarse
  * k-means quantizer (probe few cells), PQ COMPRESSES: each d-dim
  * vector is split into `m` contiguous sub-blocks, each block
  * k-means'd independently (k codes), and the corpus stores only the
  * m nearest-code ids per vector — 64 floats become 8 small ints.
  * At 100 TB this is what makes the index MEMORY-resident: IVF
  * prunes which rows to scan, PQ shrinks what a scanned row costs
  * (the classic IVF-PQ pairing; compose with [[IvfSearch]]'s cell
  * filter by encoding each cell's vectors).
  *
  * Search is ADC (asymmetric distance computation): the query stays
  * UN-quantized; one m×k lookup table dist[b][c] = ‖q_b −
  * centroid_{b,c}‖² is built per query on the driver (tiny), and
  * each row's approximate squared distance is Σ_b table[b,
  * codes[b]] — per row, m array lookups and adds, zero float math
  * on the corpus vectors, all Catalyst builtins (transform-with-
  * index + aggregate over a typedlit table), codegen'd, and the
  * top-k plans as TakeOrderedAndProject (no global sort).
  *
  * Training is deterministic-distributed, the [[IvfSearch.train]]
  * discipline per block: hash-ordered seed sample (only k seed
  * candidates reach the driver), then `iterations` full
  * [[KMeans.lloydStep]] passes over the sliced sub-vectors of the
  * WHOLE table — the parent vector RDD is cached once and every
  * block's slice is a narrow map over it.
  */
object PqSearch {

  /** codebooks(b)(c) = centroid c of block b (length subDim each). */
  final case class PqModel(subDim: Int, codebooks: Array[Array[Array[Double]]])
      extends Serializable {

    def numBlocks: Int = codebooks.length

    /** Nearest-code id per block — the stored representation. */
    def encodeOne(v: Array[Float]): Array[Int] = {
      val codes = new Array[Int](numBlocks)
      var b = 0
      while (b < numBlocks) {
        val book = codebooks(b)
        var best = 0; var bestD = Double.MaxValue
        var c = 0
        while (c < book.length) {
          val ctr = book(c)
          var d = 0.0; var i = 0
          while (i < subDim) {
            val x = ctr(i) - v(b * subDim + i); d += x * x; i += 1
          }
          if (d < bestD) { bestD = d; best = c }
          c += 1
        }
        codes(b) = best
        b += 1
      }
      codes
    }

    /** Per-query ADC table: table(b)(c) = ‖q_b − centroid_{b,c}‖². */
    def adcTable(q: Array[Float]): Seq[Seq[Double]] =
      codebooks.zipWithIndex.map { case (book, b) =>
        book.map { ctr =>
          var d = 0.0; var i = 0
          while (i < subDim) {
            val x = ctr(i) - q(b * subDim + i); d += x * x; i += 1
          }
          d
        }.toSeq
      }.toSeq
  }

  /** Deterministic distributed training: per block, seed from the
    * hash-ordered sample's sliced sub-vectors, then `iterations`
    * Lloyd passes over the full table's slices. Requires dim % m == 0.
    */
  def train(
      spark: SparkSession,
      embs: DataFrame,
      vecCol: String,
      m: Int = 8,
      k: Int = 16,
      iterations: Int = 5,
      sampleSize: Int = 2000,
      seed: Long = 42L): PqModel = {
    import spark.implicits._
    require(m > 0 && k > 1)
    // vector itself as the secondary sort key: a 32-bit hash tie at
    // the limit() cutoff would otherwise let the partition layout
    // pick the seed set
    val sample = embs.select(col(vecCol)).as[Array[Float]]
      .orderBy(hash(col(vecCol), lit(seed)), col(vecCol))
      .limit(sampleSize)
      .collect()
    require(sample.nonEmpty, "cannot train PQ on an empty table")
    val d = sample.head.length
    require(d % m == 0, s"dim $d not divisible by m=$m blocks")
    val subDim = d / m

    val vecs = embs.select(col(vecCol)).as[Array[Float]].rdd
    vecs.persist(StorageLevel.MEMORY_AND_DISK)
    try {
      val books = (0 until m).map { b =>
        val lo = b * subDim
        // distinct seed sub-vectors (duplicate-heavy corpora would
        // otherwise collapse the codebook)
        val seeds = sample.map(v => java.util.Arrays.copyOfRange(v, lo, lo + subDim))
          .distinctBy(_.toSeq).take(k)
        var model = KMeans.Model(seeds.map(_.map(_.toDouble)))
        val subs = vecs.map(v => java.util.Arrays.copyOfRange(v, lo, lo + subDim))
        var it = 0
        while (it < iterations) { model = KMeans.lloydStep(subs, model); it += 1 }
        model.centroids
      }.toArray
      PqModel(subDim, books)
    } finally vecs.unpersist(blocking = false)
  }

  /** The compressed index: (id, codes array<int>) — a narrow map, the
    * model rides the closure. The original vectors are NOT carried:
    * dropping them is the operator's point (re-join the raw table for
    * an exact rerank tier if needed).
    */
  def encode(
      spark: SparkSession,
      embs: DataFrame,
      idCol: String,
      vecCol: String,
      model: PqModel): DataFrame = {
    import spark.implicits._
    embs.select(col(idCol).cast("long"), col(vecCol))
      .as[(Long, Array[Float])]
      .mapPartitions(it => it.map { case (id, v) => (id, model.encodeOne(v)) })
      .toDF(idCol, "codes")
  }

  /** ADC top-k over the compressed index: approximate squared L2
    * ascending, ties by id. The per-query table is a broadcast-sized
    * literal; the per-row score is table lookups + adds inside
    * whole-stage codegen; top-k is TakeOrderedAndProject.
    */
  def search(
      encoded: DataFrame,
      idCol: String,
      query: Array[Float],
      k: Int,
      model: PqModel): DataFrame = {
    val tbl = typedlit(model.adcTable(query))
    val dist2 = aggregate(
      transform(col("codes"), (c, b) =>
        element_at(element_at(tbl, b + lit(1)), c + lit(1))),
      lit(0.0), (acc, x) => acc + x)
    encoded
      .withColumn("dist2", dist2)
      .orderBy(col("dist2").asc, col(idCol))
      .limit(k)
      .select(col(idCol), col("dist2"))
  }

  /** The classic IVF-PQ composition: (id, cell, codes) — IVF's coarse
    * quantizer decides WHICH rows a query scans (cell filter →
    * partition pruning when written `partitionBy("cell")`), the PQ
    * codes decide what each scanned row COSTS (m lookups instead of
    * d float ops). One narrow map; both models ride the closure.
    */
  def encodeWithCells(
      spark: SparkSession,
      embs: DataFrame,
      idCol: String,
      vecCol: String,
      pq: PqModel,
      ivf: IvfSearch.IvfModel): DataFrame = {
    import spark.implicits._
    embs.select(col(idCol).cast("long"), col(vecCol))
      .as[(Long, Array[Float])]
      .mapPartitions(it => it.map { case (id, v) =>
        (id, ivf.nearestCell(v), pq.encodeOne(v))
      })
      .toDF(idCol, "cell", "codes")
  }

  /** ADC top-k over the `nProbe` nearest IVF cells only — the query
    * touches ~nProbe/k of the corpus AND pays only table lookups per
    * touched row.
    */
  def searchIvfPq(
      encoded: DataFrame,
      idCol: String,
      query: Array[Float],
      k: Int,
      pq: PqModel,
      ivf: IvfSearch.IvfModel,
      nProbe: Int = 4): DataFrame = {
    val cells = ivf.rankedCells(query).take(math.max(1, nProbe))
    search(encoded.filter(col("cell").isin(cells: _*)), idCol, query, k, pq)
  }
}
