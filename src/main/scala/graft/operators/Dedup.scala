package graft.operators

import scala.util.hashing.MurmurHash3

import graft.functions.TextFunctions
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deduplication operators for LLM training-data curation (project
  * north star, BASELINE.json): exact, fingerprint, MinHash+LSH,
  * SimHash, and n-gram/word-set Jaccard similarity join.
  *
  * Scale design (100 TB):
  *  - exact/fingerprint dedup is a hash groupBy — one shuffle keyed
  *    on the digest, map-side partial aggregation applies;
  *  - MinHash/SimHash candidate generation is the LSH band trick: a
  *    shuffle keyed on (band, bandHash) buckets, NEVER an all-pairs
  *    join; verification runs only on bucket-cohabiting candidates;
  *  - the brute-force similarity joins keep an explicit blocking key
  *    (lang/size, label) so the self-join is block-diagonal, not N².
  */
object Dedup {

  // ---------- exact ----------

  /** One row per distinct content hash: representative (min id), dup
    * count. `groupBy(md5)` — shuffle carries (digest, partial agg).
    */
  def exactGroups(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.groupBy(md5(col(textCol)).as("content_hash"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_copies"))

  /** Keep one representative (min id) per normalized-content
    * fingerprint. Single scan + one fp-keyed shuffle via a
    * partitioned window — a groupBy+semi-join formulation reads the
    * input twice and evaluates the md5/regexp projection on both
    * sides (measured 2× slower at sf0.1).
    */
  def fingerprintDedup(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    df.withColumn("fp", TextFunctions.fingerprint(col(textCol)))
      .withColumn("keep", min(col(idCol)).over(Window.partitionBy(col("fp"))))
      .filter(col(idCol) === col("keep"))
      .drop("fp", "keep")
  }

  // ---------- MinHash + LSH ----------

  /** Deterministic MinHash signatures over word k-shingles.
    * numHashes universal-hash permutations of a murmur base hash.
    */
  final case class MinHasher(numHashes: Int = 64, shingleSize: Int = 3, seed: Int = 42)
      extends Serializable {
    private val prime = 2305843009213693951L // 2^61 - 1
    private val rnd = new scala.util.Random(seed)
    private val as: Array[Long] = Array.fill(numHashes)(1 + math.abs(rnd.nextLong()) % (prime - 1))
    private val bs: Array[Long] = Array.fill(numHashes)(math.abs(rnd.nextLong()) % prime)

    def shingles(text: String): Set[Int] =
      if (text == null) Set.empty
      else {
        val toks = text.split("\\s+").filter(_.nonEmpty)
        if (toks.length < shingleSize) Set(MurmurHash3.arrayHash(toks, seed))
        else toks.sliding(shingleSize).map(s => MurmurHash3.arrayHash(s, seed)).toSet
      }

    /** (a*b) mod 2^61-1 without 128-bit overflow: fold the high word
      * using 2^64 ≡ 8 and the low word's top bits using 2^61 ≡ 1.
      * (A plain `(a*h + b) % prime` wraps at 2^64 first — the result
      * would not be the universal hash it claims to be.)
      */
    @inline private def mulmod61(a: Long, b: Long): Long = {
      val hi = Math.multiplyHigh(a, b)
      val lo = a * b
      var r = 8L * hi + (lo & prime) + (lo >>> 61)
      while (r >= prime) r -= prime
      r
    }

    def signature(text: String): Array[Long] = {
      val sh = shingles(text)
      val sig = Array.fill(numHashes)(Long.MaxValue)
      for (s <- sh) {
        val h = s.toLong & 0xffffffffL
        var i = 0
        while (i < numHashes) {
          var v = mulmod61(as(i), h) + bs(i)   // < 2p: one conditional subtract
          if (v >= prime) v -= prime
          if (v < sig(i)) sig(i) = v
          i += 1
        }
      }
      sig
    }

    def estJaccard(a: Array[Long], b: Array[Long]): Double = {
      var m = 0; var i = 0
      while (i < numHashes) { if (a(i) == b(i)) m += 1; i += 1 }
      m.toDouble / numHashes
    }
  }

  /** MinHash-LSH near-duplicate pairs.
    *
    * shingle → signature (mapPartitions, one pass) → explode to
    * (band, hash(bandSlice)) keys → shuffle on band key → pairs within
    * buckets → distinct → estimate Jaccard from signatures, keep
    * ≥ threshold. Candidate generation cost is Σ bucket² — bounded by
    * band tuning (bands × rowsPerBand = numHashes), not by N².
    */
  def minhashPairs(
      spark: SparkSession,
      df: DataFrame,
      idCol: String,
      textCol: String,
      hasher: MinHasher = MinHasher(),
      bands: Int = 16,
      threshold: Double = 0.7): DataFrame = {
    import spark.implicits._
    require(hasher.numHashes % bands == 0, "bands must divide numHashes")
    val rowsPerBand = hasher.numHashes / bands

    val sigs = df.select(col(idCol).cast("long"), col(textCol)).as[(Long, String)]
      .mapPartitions { it =>
        it.map { case (id, text) => (id, hasher.signature(text)) }
      }.toDF("id", "sig").persist()  // reused by band-keys and verify; lifetime = returned plan's

    val bandKeys = sigs.as[(Long, Array[Long])].flatMap { case (id, sig) =>
      sig.grouped(rowsPerBand).zipWithIndex.map { case (slice, b) =>
        (b, MurmurHash3.arrayHash(slice, 17), id)
      }
    }.toDF("band", "bucket", "id")

    val cands = bandKeys.as("l").join(bandKeys.as("r"),
        $"l.band" === $"r.band" && $"l.bucket" === $"r.bucket" && $"l.id" < $"r.id")
      .select($"l.id".as("id_a"), $"r.id".as("id_b"))
      .distinct()

    cands
      .join(sigs.select($"id".as("id_a"), $"sig".as("sig_a")), "id_a")
      .join(sigs.select($"id".as("id_b"), $"sig".as("sig_b")), "id_b")
      .select($"id_a", $"id_b", $"sig_a", $"sig_b")  // USING joins reorder — pin
      .as[(Long, Long, Array[Long], Array[Long])]
      .map { case (a, b, sa, sb) => (a, b, hasher.estJaccard(sa, sb)) }
      .toDF("id_a", "id_b", "est_jaccard")
      .filter($"est_jaccard" >= threshold)
      .select($"id_a", $"id_b", round($"est_jaccard", 4).as("est_jaccard"))
  }

  // ---------- SimHash ----------

  /** 64-bit SimHash over unigram+bigram token features. */
  final case class SimHasher(seed: Int = 42) extends Serializable {
    def simhash(text: String): Long = {
      if (text == null) return 0L
      val toks = text.split("\\s+").filter(_.nonEmpty)
      val acc = new Array[Int](64)
      def add(f: String): Unit = {
        val h1 = MurmurHash3.stringHash(f, seed).toLong & 0xffffffffL
        val h2 = MurmurHash3.stringHash(f, seed + 1).toLong & 0xffffffffL
        val h = (h1 << 32) | h2
        var i = 0
        while (i < 64) { if (((h >>> i) & 1L) == 1L) acc(i) += 1 else acc(i) -= 1; i += 1 }
      }
      var i = 0
      while (i < toks.length) {
        add(toks(i)); if (i + 1 < toks.length) add(toks(i) + " " + toks(i + 1)); i += 1
      }
      var out = 0L
      i = 0
      while (i < 64) { if (acc(i) > 0) out |= (1L << i); i += 1 }
      out
    }

    def hamming(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)
  }

  /** SimHash near-dup pairs with Hamming distance ≤ maxDistance.
    * Pigeonhole blocking: split 64 bits into (maxDistance+1) blocks —
    * any pair within distance shares ≥1 exact block, so candidates
    * come from equal-block buckets (a shuffle), never all pairs.
    */
  def simhashPairs(
      spark: SparkSession,
      df: DataFrame,
      idCol: String,
      textCol: String,
      hasher: SimHasher = SimHasher(),
      maxDistance: Int = 3): DataFrame = {
    import spark.implicits._
    val nBlocks = maxDistance + 1
    val blockBits = 64 / nBlocks

    val hashes = df.select(col(idCol).cast("long"), col(textCol)).as[(Long, String)]
      .mapPartitions(it => it.map { case (id, t) => (id, hasher.simhash(t)) })
      .toDF("id", "sh").persist()    // reused by block-keys and pairs; lifetime = returned plan's

    val blocks = hashes.as[(Long, Long)].flatMap { case (id, sh) =>
      (0 until nBlocks).map { b =>
        val mask = if (blockBits == 64) -1L else (1L << blockBits) - 1
        (b, (sh >>> (b * blockBits)) & mask, id, sh)
      }
    }.toDF("block", "key", "id", "sh")

    blocks.as("l").join(blocks.as("r"),
        $"l.block" === $"r.block" && $"l.key" === $"r.key" && $"l.id" < $"r.id")
      .select($"l.id".as("id_a"), $"r.id".as("id_b"), $"l.sh".as("sh_a"), $"r.sh".as("sh_b"))
      .distinct()
      .as[(Long, Long, Long, Long)]
      .map { case (a, b, sa, sb) => (a, b, hasher.hamming(sa, sb)) }
      .toDF("id_a", "id_b", "hamming")
      .filter($"hamming" <= maxDistance)
  }

  // ---------- similarity joins (word-set Jaccard, embedding cosine) ----------

  /** Word-set Jaccard similarity join — array_intersect/size are pure
    * Catalyst, SQL-mirrorable.
    *
    * Scale shape: the size band is folded INTO the equi-join key, not
    * left as a post-join filter. Each row gets `bucket = ⌊sz/band⌋`;
    * the left side also emits `bucket+1`, so every pair within the
    * band meets on an exact (block, bucket) key — the shuffle joins
    * bucket-cohabiting rows only, Σ bucket² instead of Σ block².
    * Pair uniqueness without distinct(): same-bucket matches require
    * id< ; cross-bucket matches are unique by construction.
    *
    * Cheap pruning before the O(|toks|) intersect: jaccard > t implies
    * min(|A|,|B|) > t·max(|A|,|B|) — proof: I > t(a+b−I) ⟹
    * I(1+t) > t(a+b) ⟹ min(1+t) > t(min+max) ⟹ min > t·max — so the
    * integer size-ratio test discards most candidates first.
    */
  def jaccardPairs(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      blockCol: String,
      sizeCol: String,
      sizeBand: Long,
      threshold: Double): DataFrame = {
    require(sizeBand > 0)
    graft.functions.SortedIntersectCount.register(docs.sparkSession)
    import graft.functions.SortedIntersectCount.sorted_intersect_count

    // tokens computed ONCE per row; sorted so the pairwise intersect
    // is an allocation-free merge-count, not a per-pair hash build
    val toks = docs.select(
      col(idCol).as("id"),
      sort_array(array_distinct(TextFunctions.tokens(col(textCol)))).as("toks"))
      .withColumn("nt", size(col("toks"))).persist()

    // semi-join reduction: candidate generation runs on SKINNY rows
    // (ids + ints) — token arrays never ride the bucket-join shuffle;
    // they are joined back only for pairs that survive the size-band
    // and size-ratio prunes
    val skinny = docs.select(col(idCol).as("id"), col(blockCol).as("blk"),
        col(sizeCol).as("sz"))
      .join(toks.select(col("id"), col("nt")), "id")
      .withColumn("bucket", floor(col("sz") / sizeBand))
    val l = skinny.withColumn("jb", explode(array(col("bucket"), col("bucket") + 1)))
      .select(col("id").as("id_l"), col("blk"), col("sz").as("sz_l"),
        col("nt").as("nt_l"), col("bucket").as("bucket_l"), col("jb"))
    val r = skinny.select(col("id").as("id_r"), col("blk").as("blk_r"),
      col("sz").as("sz_r"), col("nt").as("nt_r"), col("bucket").as("bucket_r"))

    val cands = l.join(r,
        col("blk") === col("blk_r") && col("jb") === col("bucket_r") &&
          (col("jb") =!= col("bucket_l") || col("id_l") < col("id_r")))
      .filter(abs(col("sz_l") - col("sz_r")) <= sizeBand)
      .filter(least(col("nt_l"), col("nt_r")) > lit(threshold) * greatest(col("nt_l"), col("nt_r")))
      .select(col("id_l"), col("id_r"), col("nt_l"), col("nt_r"))

    cands
      .join(toks.select(col("id").as("id_l"), col("toks").as("toks_l")), "id_l")
      .join(toks.select(col("id").as("id_r"), col("toks").as("toks_r")), "id_r")
      .withColumn("inter", sorted_intersect_count(col("toks_l"), col("toks_r")).cast("double"))
      .withColumn("jaccard", col("inter") / (col("nt_l") + col("nt_r") - col("inter")))
      .filter(col("jaccard") > threshold)
      .select(
        least(col("id_l"), col("id_r")).as("id_a"),
        greatest(col("id_l"), col("id_r")).as("id_b"),
        round(col("jaccard"), 4).as("jaccard"))
  }

  /** Embedding-cosine near-duplicate pairs under a blocking column.
    * Scoring uses the native codegen CosineSimilarity expression
    * (bit-identical to the composed form, ~several× faster in the
    * pairwise hot loop — this predicate runs once per candidate pair).
    */
  def cosinePairs(
      embs: DataFrame,
      idCol: String,
      vecCol: String,
      blockCol: String,
      threshold: Double): DataFrame = {
    graft.functions.GraftFunctions.register(embs.sparkSession)
    import graft.functions.GraftFunctions.cosine_sim
    val l = embs.select(col(idCol).as("id_a"), col(blockCol).as("blk"), col(vecCol).as("vec_a"))
    val r = embs.select(col(idCol).as("id_b"), col(blockCol).as("blk"), col(vecCol).as("vec_b"))
    l.join(r, l("blk") === r("blk") && col("id_a") < col("id_b"))
      .withColumn("cos", cosine_sim(col("vec_a"), col("vec_b")))
      .filter(col("cos") > threshold)
      .select(col("id_a"), col("id_b"), round(col("cos"), 6).as("cos"))
  }
}
