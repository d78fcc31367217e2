package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Winnowing document fingerprints (Schleimer, Wilkerson, Aiken —
  * "Winnowing: Local Algorithms for Document Fingerprinting",
  * SIGMOD'03, the MOSS algorithm): a polynomial ROLLING hash over
  * character k-grams, then each sliding window of `w` consecutive
  * hashes contributes its minimum (rightmost on ties). Guarantees:
  * any substring shared between two documents of length ≥ w + k − 1
  * produces at least one shared fingerprint (detection is local, not
  * probabilistic — unlike MinHash), while only ~2/(w+1) of all
  * k-gram hashes are kept.
  *
  * This is the "document fingerprinting (rolling hash)" member of
  * the text-analysis family: where the md5 fingerprint (q22) detects
  * whole-document duplication and MinHash (q28) set-level similarity,
  * winnowing detects COPIED PASSAGES — partial plagiarism /
  * boilerplate reuse — regardless of surrounding content.
  */
object Winnow {

  final case class Winnower(k: Int = 8, w: Int = 4) extends Serializable {
    require(k > 0 && w > 0)
    private val prime = 2305843009213693951L        // 2^61 − 1
    private val base = 1000003L

    @inline private def mulmod61(a: Long, b: Long): Long = {
      val hi = Math.multiplyHigh(a, b)
      val lo = a * b
      var r = 8L * hi + (lo & prime) + (lo >>> 61)
      while (r >= prime) r -= prime
      r
    }

    private val basePowK1: Long = {
      var p = 1L
      var i = 0
      while (i < k - 1) { p = mulmod61(p, base); i += 1 }
      p
    }

    /** Sorted distinct winnowed fingerprints of `text`. Texts shorter
      * than k yield a single whole-text hash (so short docs still
      * compare), empty/null texts none.
      */
    def fingerprints(text: String): Array[Long] = {
      if (text == null || text.isEmpty) return Array.empty
      val n = text.length
      def hashRange(from: Int, until: Int): Long = {
        var h = 0L
        var i = from
        while (i < until) { h = (mulmod61(h, base) + text.charAt(i)) % prime; i += 1 }
        h
      }
      if (n < k) return Array(hashRange(0, n))

      // rolling k-gram hashes: h_{i+1} = (h_i − c_i·B^{k−1})·B + c_{i+k}
      val m = n - k + 1
      val hs = new Array[Long](m)
      hs(0) = hashRange(0, k)
      var i = 1
      while (i < m) {
        val drop = mulmod61(text.charAt(i - 1).toLong, basePowK1)
        val stripped = (hs(i - 1) - drop + prime) % prime
        hs(i) = (mulmod61(stripped, base) + text.charAt(i + k - 1)) % prime
        i += 1
      }

      // winnow: rightmost minimum of every w-window (w is small — the
      // per-window scan beats a deque for cache behavior here)
      val out = scala.collection.mutable.TreeSet.empty[Long]
      var start = 0
      val last = m - w
      if (last < 0) { out += hs.min }
      else while (start <= last) {
        var best = start
        var j = start + 1
        while (j < start + w) { if (hs(j) <= hs(best)) best = j; j += 1 }
        out += hs(best)
        start += 1
      }
      out.toArray
    }
  }

  /** Passage-overlap pairs: documents sharing winnowed fingerprints,
    * scored by CONTAINMENT (|A∩B| / min(|A|,|B|) — the right measure
    * for "document B contains a passage of A" where set-Jaccard
    * dilutes with length). Candidates come from an inverted
    * fingerprint join (pairs must share ≥1 fingerprint — the
    * winnowing guarantee makes that exact for passages ≥ w+k−1
    * chars), capped per fingerprint by the shared star-linking
    * machinery; the sorted-merge intersect verifies exactly.
    * Oracle-checked (q120): the winnowed VALUE set is tie-rule-
    * insensitive, so DuckDB replays the mod-(2^61−1) polynomial
    * hashes in HUGEINT arithmetic and re-winnows with windowed
    * least(); the spec additionally pins the winnowing guarantee.
    */
  def winnowPairs(
      spark: SparkSession,
      df: DataFrame,
      idCol: String,
      textCol: String,
      win: Winnower = Winnower(),
      minContainment: Double = 0.5,
      bucketCap: Int = 10000): DataFrame = {
    import spark.implicits._
    graft.functions.SortedIntersectCount.register(spark)
    import graft.functions.SortedIntersectCount.sorted_intersect_count

    val fps = df.select(col(idCol).cast("long").as("id"), col(textCol).as("text"))
      .as[(Long, String)]
      .mapPartitions(it => it.map { case (id, t) => (id, win.fingerprints(t)) })
      .toDF("id", "fps")
      .withColumn("nf", size($"fps"))
      .filter($"nf" > 0)
      .persist()                    // inverted index + two verify joins

    val keys = fps.select($"id", explode($"fps").as("key"))
    Dedup.bucketCandidates(keys, "id", Seq("key"), bucketCap)
      .join(fps.select($"id".as("id_a"), $"fps".as("fps_a"), $"nf".as("nf_a")), "id_a")
      .join(fps.select($"id".as("id_b"), $"fps".as("fps_b"), $"nf".as("nf_b")), "id_b")
      .withColumn("inter", sorted_intersect_count($"fps_a", $"fps_b").cast("double"))
      .withColumn("containment", $"inter" / least($"nf_a", $"nf_b"))
      .filter($"containment" >= minContainment)
      // r4 floor convention, not round(): containment is a small-
      // denominator rational (e.g. 1/32), where Spark HALF_UP and
      // DuckDB half-even disagree on the .xxxx5 boundary
      .select($"id_a", $"id_b",
        graft.functions.TextFunctions.r4($"containment").as("containment"))
  }
}
