package graft.multimodal

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Perceptual image dedup: difference-hash (dHash) over the codec's
  * luma grid + pigeonhole-blocked Hamming join — the IMAGE leg of the
  * near-dup family (MinHash/SimHash cover text; multimodal corpora
  * need the same operation over pixels). dHash encodes horizontal
  * luminance GRADIENTS, so it is invariant to uniform brightness/
  * contrast shifts and to re-encoding (the classic near-dup
  * transforms), unlike a byte-level fingerprint.
  *
  * Composition: [[Multimodal.MediaCodec.features]] with dim = 8² IS
  * the row-major 8×8 luma grid under [[Multimodal.ImageIoCodec]]
  * (grid = ceil(√dim), no wraparound at a perfect square), so the
  * hash needs no new codec surface — FakeCodec rides the same path
  * for pipeline tests. L2 normalization inside features() is a
  * positive scalar and cannot flip a gradient comparison.
  *
  * Scale shape (the [[graft.operators.Dedup]] SimHash discipline):
  * hashing is a narrow mapPartitions (decode cost, no shuffle); the
  * Hamming-≤-t join splits the 56 hash bits into t+1 blocks — two
  * hashes within distance t MUST agree exactly on ≥ 1 block
  * (pigeonhole), so candidates come from t+1 equi-joins on (block,
  * value), Σ bucket² work, never n²; verification is one codegen
  * bit_count(xor). Ties to no window, no driver state.
  */
object ImageDedup {

  val Grid = 8
  /** 8 rows × 7 horizontal comparisons. */
  val HashBits: Int = Grid * (Grid - 1)

  /** 56-bit difference hash of one blob: bit (y,x) = [cell(y,x) <
    * cell(y,x+1)] over the codec's 8×8 luma grid.
    */
  def dHash(codec: Multimodal.MediaCodec, content: Array[Byte]): Long =
    dHashOfGrid(codec.features(content, Grid * Grid))

  /** [[dHash]] of an already-materialized 8×8 luma grid (row-major,
    * 64 floats) — the seam [[graft.pipeline.PdfImages]] feeds with
    * grids pooled from raster XObjects it has decoded itself, so one
    * extraction pass yields metadata AND the hash without a second
    * decode behind the codec interface. */
  def dHashOfGrid(f: Array[Float]): Long = {
    require(f.length >= Grid * Grid,
      s"dHashOfGrid needs a ${Grid}x$Grid grid, got ${f.length} cells")
    var h = 0L
    var bit = 0
    var y = 0
    while (y < Grid) {
      var x = 0
      while (x < Grid - 1) {
        if (f(y * Grid + x) < f(y * Grid + x + 1)) h |= (1L << bit)
        bit += 1
        x += 1
      }
      y += 1
    }
    h
  }

  /** (id, phash) per row — narrow decode pass, codec on the closure
    * (per-partition init, the [[Multimodal.extractFeatures]]
    * discipline).
    */
  def withPHash(
      df: DataFrame,
      idCol: String,
      contentCol: String,
      codec: Multimodal.MediaCodec): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(contentCol))
      .as[(Long, Array[Byte])]
      .mapPartitions(it => it.map { case (id, bytes) => (id, dHash(codec, bytes)) })
      .toDF(idCol, "phash")
  }

  /** Canonical (id_a < id_b) pairs with Hamming(phash_a, phash_b) ≤
    * `maxHamming`, exactly (pigeonhole blocking guarantees full
    * recall at the threshold). Input: (idCol, phash).
    *
    * Skew shape: the pigeonhole join runs over DISTINCT hash values —
    * a flood of identical images (or any mass of blank/near-blank
    * frames collapsing to few hashes) contributes ONE row per value
    * to the candidate join, not its member count, so Σ bucket² is
    * bounded by distinct-hash bucket sizes. Member pairs are then
    * expanded per qualifying hash pair (cross-hash) and per
    * identical-hash group (within, Hamming 0) — both expansions are
    * output-bound: they emit exactly the true pair set, whose size is
    * the answer, not an intermediate. The skinny distinct-hash frame
    * is persisted across its t+1 reuses so the decode lineage above
    * it runs once; the CALLER owns releasing that storage after
    * materializing the returned (lazy) frame — `spark.catalog
    * .clearCache()`, the repo-wide convention the suite and Bench
    * already follow between queries (same contract as
    * [[graft.operators.GraphOps.triangleStats]]'s caches).
    */
  def nearDupPairs(
      hashed: DataFrame,
      idCol: String,
      maxHamming: Int): DataFrame = {
    require(maxHamming >= 0 && maxHamming < HashBits,
      s"maxHamming must be in [0, $HashBits), got $maxHamming")
    val blocks = maxHamming + 1
    val base = HashBits / blocks
    // block i covers [i*base, (i+1)*base) bits; the last block absorbs
    // the remainder — any distribution works, equal-ish minimizes
    // bucket sizes
    val blockVal = (i: Int) => {
      val width = if (i == blocks - 1) HashBits - i * base else base
      val mask = (1L << width) - 1
      (shiftright(col("phash"), i * base).bitwiseAND(lit(mask))).as("bval")
    }
    val uh = hashed.select(col("phash")).distinct().persist()
    val exploded = (0 until blocks).map { i =>
      uh.select(col("phash"), lit(i).as("bidx"), blockVal(i))
    }.reduce(_ unionByName _)
    val hashPairs = exploded.select(col("phash").as("ha"), col("bidx"), col("bval"))
      .join(exploded.select(col("phash").as("hb"), col("bidx"), col("bval")),
        Seq("bidx", "bval"))
      .filter(col("ha") < col("hb"))
      .select(col("ha"), col("hb")).distinct()
      .withColumn("hamming", expr("bit_count(ha ^ hb)").cast("long"))
      .filter(col("hamming") <= maxHamming)
    val a = hashed.select(col(idCol).as("id_a"), col("phash").as("ha"))
    val b = hashed.select(col(idCol).as("id_b"), col("phash").as("hb"))
    val cross = hashPairs.join(a, "ha").join(b, "hb")
      .select(
        least(col("id_a"), col("id_b")).as("id_a"),
        greatest(col("id_a"), col("id_b")).as("id_b"),
        col("hamming"))
    val within = a.join(
        hashed.select(col(idCol).as("id_b"), col("phash").as("ha")), "ha")
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), lit(0L).as("hamming"))
    cross.unionByName(within)
  }
}
