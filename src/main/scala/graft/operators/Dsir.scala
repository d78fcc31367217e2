package graft.operators

import graft.functions.TextFunctions
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data Selection via Importance Resampling (DSIR, Xie et al. 2023,
  * arXiv:2302.03169): select raw-corpus documents whose hashed-n-gram
  * distribution resembles a target domain, by (1) estimating target
  * and raw unigram-over-buckets distributions from hashed bigram
  * features, (2) scoring every document with the summed log importance
  * ratio of its bigrams, and (3) resampling top-k under Gumbel noise
  * (the Gumbel-top-k trick draws k items ∝ exp(score) without
  * replacement). This is the standard pre-training data-selection
  * operator between raw crawl and quality filtering: cheap (no model),
  * domain-targeted, and defensible at corpus scale.
  *
  * Reference seam: the reference pipeline stops at per-chunk embedding
  * inference (03-model-inference-on-chunks.py:131); distribution-level
  * corpus selection is the LLM-data-pipeline extension (SURVEY §2.12).
  *
  * Scale shape (the point of the hashed-feature formulation):
  *  - feature space is FIXED at [[Buckets]] buckets regardless of
  *    corpus size — the statistics table never grows with the data;
  *  - [[bucketCounts]] is ONE corpus scan with map-side partial
  *    aggregation into ≤ Buckets rows (target + raw counted in the
  *    same pass via a conditional count);
  *  - [[scoreDocs]] is a pure narrow projection: the quantized
  *    log-ratio table rides the plan as a 32 KB array literal
  *    (`element_at` per bigram inside whole-stage codegen) — no join,
  *    no shuffle, no UDF;
  *  - [[gumbelTopK]] is TakeOrderedAndProject (per-partition heaps +
  *    driver merge of k rows), never a global sort.
  *
  * Cross-engine determinism (SURVEY §7.4, the q118/q128 fixed-point
  * discipline):
  *  - the bucket hash is the first 8 hex chars of md5 (both engines
  *    compute identical md5 hex) taken mod Buckets — integer-exact;
  *  - smoothed probabilities enter as the rational
  *    p_t/p_r = (2·ct+1)(2·nr+B) / ((2·cr+1)(2·nt+B)) evaluated in
  *    DOUBLE arithmetic: each factor is an exact double (counts <
  *    2^52 — ~4.5e15 corpus bigrams, comfortably past 100 TB), and
  *    IEEE multiply/divide are correctly rounded, so with the same
  *    expression shape both engines hand ln the IDENTICAL double.
  *    (Integer products would overflow 2^63 near 1.5e9 bigrams under
  *    bucket skew — doubles have no such cliff);
  *  - log-ratios are quantized to integer micro-nats
  *    (floor(ln·1e6 + 0.5)) ONCE per bucket; per-document scores are
  *    then exact integer sums — order-independent under any partition
  *    layout, exactly replayable in SQL. The only cross-engine risk is
  *    a 1-ulp ln() disagreement landing within 1e-10 of a quantization
  *    boundary on one of the ≤ Buckets values — the accepted house
  *    risk class (q96/A-ES precedent), now bounded by table size, not
  *    corpus size;
  *  - Gumbel noise is derived from [[Sampling.hashFraction]] of the
  *    doc id — no RNG; same seed algebra as every sampler in the repo.
  */
object Dsir {

  /** Hashed feature-space size. 4096 buckets ⇒ a 32 KB LUT; raise to
    * 2^16 for finer-grained domains (still a 512 KB literal — plan-
    * sized, never corpus-sized).
    */
  val Buckets = 4096

  /** Integer quantum for log-ratios: micro-nats. */
  val Quantum = 1000000L

  /** Floor of [[Sampling.hashFraction]] used for Gumbel noise — the
    * shared [[Sampling.FracFloor]] (2^-33), keeping ln(u) finite when
    * the 32-bit hash lands on 0.
    */
  val UFloor: Double = Sampling.FracFloor

  /** Word bigrams of single-space tokens, joined with one space.
    * Single-space tokenization (not \s+) is the oracle-mirrorable
    * q14 convention — see [[TextFunctions.spaceTokens]].
    */
  def bigrams(text: Column): Column = {
    val t = TextFunctions.spaceTokens(text)
    val n = greatest(size(t) - 1, lit(0))
    zip_with(slice(t, lit(1), n), slice(t, lit(2), n),
      (a, b) => concat(a, lit(" "), b))
  }

  /** Bucket id in [0, Buckets) from the first 8 md5 hex chars — the
    * cross-engine string hash (DuckDB: ('0x' || substr(md5(s),1,8))
    * ::BIGINT % Buckets).
    */
  def bucketOf(ngram: Column): Column =
    conv(substring(md5(ngram), 1, 8), 16, 10).cast("long") % Buckets

  /** One-scan per-bucket statistics: raw count `cr` over all rows and
    * target count `ct` over rows satisfying `targetPred`. ≤ Buckets
    * output rows; the shuffle moves only map-side partials.
    */
  def bucketCounts(df: DataFrame, textCol: String, targetPred: Column): DataFrame =
    df.select(explode(bigrams(col(textCol))).as("ng"), targetPred.as("is_t"))
      .groupBy(bucketOf(col("ng")).as("bucket"))
      .agg(
        count(lit(1)).as("cr"),
        sum(when(col("is_t"), 1L).otherwise(0L)).as("ct"))

  /** Driver-side LUT build: quantized log importance ratio per bucket.
    * The collect is bounded by construction (≤ Buckets rows — the
    * fixed feature space IS the algorithm's scale story, same class
    * as the k-sized KMeans seed collect).
    */
  def quantizedLogRatios(counts: DataFrame): Array[Long] = {
    val rows = counts.select("bucket", "cr", "ct").collect()
    val cr = new Array[Long](Buckets)
    val ct = new Array[Long](Buckets)
    rows.foreach { r =>
      val b = r.getLong(0).toInt
      cr(b) = r.getLong(1)
      ct(b) = r.getLong(2)
    }
    val nr = cr.sum
    val nt = ct.sum
    val B = Buckets.toDouble
    // double factors/products: overflow-free to 2^52 bigrams; the
    // oracle evaluates the identical expression shape (qlrCteSql)
    Array.tabulate(Buckets) { b =>
      val num = (2.0 * ct(b) + 1.0) * (2.0 * nr + B)
      val den = (2.0 * cr(b) + 1.0) * (2.0 * nt + B)
      math.floor(math.log(num / den) * Quantum + 0.5).toLong
    }
  }

  /** Per-document importance score: exact integer sum of the quantized
    * bucket log-ratios of its bigrams (multiplicity counts, as in the
    * paper's product of per-feature ratios). Adds `n_bigrams` and
    * `qlogw` (0 for documents with < 2 tokens). Narrow projection —
    * the LUT is an array literal in the plan.
    */
  def scoreDocs(df: DataFrame, textCol: String, qlr: Array[Long]): DataFrame = {
    require(qlr.length == Buckets, s"LUT must have $Buckets entries")
    val lut = typedlit(qlr.toSeq)
    val ngs = bigrams(col(textCol))
    df.withColumn("n_bigrams", size(ngs).cast("long"))
      .withColumn("qlogw",
        aggregate(
          transform(ngs, ng => element_at(lut, (bucketOf(ng) + 1).cast("int"))),
          lit(0L), (acc, x) => acc + x))
  }

  /** Gumbel-top-k resampling: priority = qlogw + quantized Gumbel
    * noise −ln(−ln(u)) with u = hashFraction(id, salt) — draws k docs
    * ∝ exp(qlogw/Quantum · Quantum)… i.e. the Gumbel-max trick on the
    * integer score scale, reproducible from ids alone. Ties broken by
    * id (integer priorities make exact ties possible, unlike raw
    * doubles).
    */
  def gumbelTopK(scored: DataFrame, id: Column, k: Int, salt: Long): DataFrame = {
    val u = greatest(Sampling.hashFraction(id, salt), lit(UFloor))
    val pri = (col("qlogw") +
      floor(-log(-log(u)) * Quantum + 0.5).cast("long")).as("pri")
    scored.withColumn("pri", pri)
      .orderBy(col("pri").desc, id.asc)
      .limit(k)
  }

  // ------------------------------------------------------------------
  // Oracle SQL mirrors (one source of truth for the DuckDB replay)

  /** DuckDB expression for [[bucketOf]]. */
  def bucketSql(ngExpr: String): String =
    s"(('0x' || substr(md5($ngExpr), 1, 8))::BIGINT % $Buckets)"

  /** DuckDB CTE text producing (doc_id, bucket) rows named `buck`,
    * from table `documents` with the given target predicate mirrored
    * downstream. Single-space split + non-empty filter (q14 pattern),
    * 1-indexed list bigrams.
    */
  def buckCteSql: String =
    s"""toks AS MATERIALIZED (
       |  SELECT doc_id, lang,
       |    list_filter(string_split(text, ' '), x -> length(x) > 0) AS t
       |  FROM documents),
       |grams AS MATERIALIZED (
       |  SELECT doc_id, lang,
       |    unnest(list_transform(range(1, greatest(len(t), 1)),
       |                          i -> t[i] || ' ' || t[i + 1])) AS ng
       |  FROM toks),
       |buck AS MATERIALIZED (
       |  SELECT doc_id, lang, ${bucketSql("ng")} AS b FROM grams)""".stripMargin

  /** DuckDB CTE text for the quantized log-ratio table `qlr(b, w)`
    * given a target predicate over `buck` rows.
    */
  def qlrCteSql(targetPredSql: String): String =
    s"""tc AS (SELECT b, count(*) AS ct FROM buck WHERE $targetPredSql GROUP BY b),
       |rc AS (SELECT b, count(*) AS cr FROM buck GROUP BY b),
       |tot AS (SELECT (SELECT count(*) FROM buck) AS nr,
       |               (SELECT count(*) FROM buck WHERE $targetPredSql) AS nt),
       |qlr AS (
       |  SELECT r.b,
       |    CAST(floor(ln(
       |      ((2.0 * coalesce(t.ct, 0) + 1.0) * (2.0 * tot.nr + $Buckets.0))
       |      / ((2.0 * r.cr + 1.0) * (2.0 * tot.nt + $Buckets.0)))
       |      * $Quantum + 0.5) AS BIGINT) AS w
       |  FROM rc r LEFT JOIN tc t USING (b), tot)""".stripMargin

  /** DuckDB expression for the quantized Gumbel noise on an id. */
  def gumbelSql(idExpr: String, salt: Long): String =
    s"CAST(floor(-ln(-ln(greatest(${Sampling.hashFractionSql(idExpr, salt)}, " +
      s"$UFloor))) * $Quantum + 0.5) AS BIGINT)"
}
