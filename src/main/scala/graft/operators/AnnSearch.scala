package graft.operators

import scala.util.Random

import graft.pipeline.VectorSearch
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Approximate nearest-neighbor search — the 100 TB path for the
  * reference's vector search (`ocr-tesseract-unstructured.py:167-171`).
  *
  * Brute force (VectorSearch.topK) scans every vector per query:
  * correct, O(N). This operator adds random-hyperplane LSH: each
  * vector gets a `nBits`-bit signature (sign of projections onto
  * seeded Gaussian planes); the index is materialized WITH the bucket
  * column, so at scale it is written partitioned/bucketed by `bucket`
  * and a query's `bucket IN (probes)` filter becomes partition
  * pruning — the scan touches ~nProbe/2^nBits of the data.
  *
  * Multiprobe: besides the query's own bucket, flip the bits whose
  * projection margin is smallest (the planes the query sits closest
  * to) — recall climbs toward brute force with nProbe, without
  * re-hashing the index.
  */
object AnnSearch {

  final case class HyperplaneLsh(dim: Int, nBits: Int = 10, seed: Int = 42)
      extends Serializable {
    require(nBits > 0 && nBits <= 30)
    private val planes: Array[Array[Double]] = {
      val r = new Random(seed)
      Array.fill(nBits)(Array.fill(dim)(r.nextGaussian()))
    }

    def projections(vec: Array[Float]): Array[Double] = {
      val out = new Array[Double](nBits)
      var b = 0
      while (b < nBits) {
        var s = 0.0; val p = planes(b); var i = 0
        val n = math.min(dim, vec.length)
        while (i < n) { s += p(i) * vec(i); i += 1 }
        out(b) = s; b += 1
      }
      out
    }

    def bucket(vec: Array[Float]): Int = {
      val pr = projections(vec)
      var out = 0; var b = 0
      while (b < nBits) { if (pr(b) >= 0) out |= (1 << b); b += 1 }
      out
    }

    /** Own bucket first, then single-bit flips ordered by |margin|. */
    def probeBuckets(vec: Array[Float], nProbe: Int): Seq[Int] = {
      val pr = projections(vec)
      val own = bucket(vec)
      val flips = pr.zipWithIndex.sortBy { case (m, _) => math.abs(m) }
        .iterator.map { case (_, b) => own ^ (1 << b) }
      (Iterator(own) ++ flips).take(math.max(1, nProbe)).toSeq
    }
  }

  /** Materialize the LSH index: input + `bucket` column. At scale,
    * write this `.partitionBy("bucket")` so probe filters prune
    * partitions at the source.
    */
  def buildIndex(
      spark: SparkSession,
      embs: DataFrame,
      idCol: String,
      vecCol: String,
      lsh: HyperplaneLsh): DataFrame = {
    import spark.implicits._
    embs.select(col(idCol).cast("long"), col(vecCol))
      .as[(Long, Array[Float])]
      .mapPartitions(it => it.map { case (id, v) => (id, v, lsh.bucket(v)) })
      .toDF(idCol, vecCol, "bucket")
  }

  /** Probe-filtered exact-rerank top-k. The bucket filter is a
    * pushable predicate (partition pruning on a bucket-partitioned
    * index); the exact cosine runs only on candidates.
    */
  def search(
      index: DataFrame,
      idCol: String,
      vecCol: String,
      query: Array[Float],
      k: Int,
      lsh: HyperplaneLsh,
      nProbe: Int = 8): DataFrame = {
    val probes = lsh.probeBuckets(query, nProbe)
    index
      .filter(col("bucket").isin(probes: _*))
      .withColumn("sim",
        VectorSearch.cosineSim(col(vecCol), VectorSearch.vecLit(query.map(_.toDouble).toSeq)))
      .orderBy(col("sim").desc, col(idCol))
      .limit(k)
      .select(col(idCol), col("sim"))
  }
}
