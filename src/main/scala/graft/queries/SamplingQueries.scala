package graft.queries

import graft.{QueryDef, Tables}
import graft.operators.{Dsir, Sampling}
import org.apache.spark.sql.functions._

/** Deterministic sampling / splitting queries (operators/Sampling).
  * All three are oracle-checked end to end: the DuckDB SQL reruns the
  * identical hash arithmetic, so the oracle verifies not just the
  * aggregate shape but that BOTH engines select the exact same rows —
  * the property that makes the sample auditable and reproducible.
  */
object SamplingQueries {

  private val fracSql = Sampling.hashFractionSql("doc_id")
  private val fracSqlS1 = Sampling.hashFractionSql("doc_id", salt = 1L)

  def defs: Seq[QueryDef] = Seq(
    // ----- q84: stratified Bernoulli sample at per-language rates.
    // Pure pushable filter — zero shuffle before the final tiny agg.
    QueryDef(
      "q84_stratified_sample",
      (s, d) => {
        import s.implicits._
        val rates = Map("en" -> 0.5, "zh" -> 0.3)
        val picked = Sampling.stratifiedSample(
          Tables.documents(s, d), $"lang", $"doc_id", rates, defaultRate = 0.1)
        picked.groupBy($"lang")
          .agg(count(lit(1)).as("n_sampled"),
            sum($"n_chars").as("sum_chars"))
          .orderBy($"lang")
      },
      Some(s"""SELECT lang, COUNT(*) AS n_sampled,
             |  CAST(SUM(n_chars) AS BIGINT) AS sum_chars
             |FROM documents
             |WHERE $fracSql <
             |  CASE lang WHEN 'en' THEN 0.5 WHEN 'zh' THEN 0.3 ELSE 0.1 END
             |GROUP BY lang
             |ORDER BY lang""".stripMargin)),

    // ----- q85: train/val/test split assignment (0.8/0.1/0.1) under a
    // different salt (a split must be independent of any sampling done
    // with the base hash). Projection-only; the oracle proves row-level
    // agreement on every document's split.
    QueryDef(
      "q85_split_assign",
      (s, d) => {
        import s.implicits._
        Sampling.assignSplits(
          Tables.documents(s, d), $"doc_id",
          Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1), salt = 1L)
          .groupBy($"split", $"lang")
          .agg(count(lit(1)).as("n"), sum($"n_chars").as("sum_chars"))
          .orderBy($"split", $"lang")
      },
      Some(s"""SELECT
             |  CASE WHEN $fracSqlS1 < 0.8 THEN 'train'
             |       WHEN $fracSqlS1 < 0.9 THEN 'val'
             |       ELSE 'test' END AS split,
             |  lang, COUNT(*) AS n,
             |  CAST(SUM(n_chars) AS BIGINT) AS sum_chars
             |FROM documents
             |GROUP BY 1, 2
             |ORDER BY split, lang""".stripMargin)),

    // ----- q86: exact k-per-source uniform sample (hash-ranked, no
    // replacement). Row-level oracle: both engines must pick the SAME
    // five documents per source.
    QueryDef(
      "q86_group_sample",
      (s, d) => {
        import s.implicits._
        Sampling.groupSample(
          Tables.documents(s, d), Seq($"source"), $"doc_id", k = 5)
          .select($"source", $"doc_id", $"lang")
          .orderBy($"source", $"doc_id")
      },
      Some(s"""SELECT source, doc_id, lang FROM (
             |  SELECT source, doc_id, lang,
             |    ROW_NUMBER() OVER (PARTITION BY source
             |      ORDER BY $fracSql ASC, doc_id ASC) AS rk
             |  FROM documents)
             |WHERE rk <= 5
             |ORDER BY source, doc_id""".stripMargin)),

    // ----- q100: weighted sampling without replacement (A-ES
    // priorities on the portable hash) — longer documents
    // proportionally likelier; top-k by r7-rounded priority so libm
    // ulp drift in ln() can't flip the boundary rank between engines.
    QueryDef(
      "q100_weighted_sample",
      (s, d) => {
        import s.implicits._
        Sampling.weightedSample(
          Tables.documents(s, d).filter($"n_chars" > 0),
          $"doc_id", $"n_chars".cast("double"), k = 25)
          .select($"doc_id", $"lang", $"n_chars")
          .orderBy($"doc_id")
      },
      Some({
        val pri = Sampling.prioritySql("doc_id", "CAST(n_chars AS DOUBLE)")
        s"""SELECT doc_id, lang, n_chars FROM (
           |  SELECT doc_id, lang, n_chars FROM documents
           |  WHERE n_chars > 0
           |  ORDER BY $pri DESC, doc_id ASC LIMIT 25)
           |ORDER BY doc_id""".stripMargin
      })),

    // ----- q134: approximate quantiles by deterministic sampling —
    // the scan-only alternative to a corpus-wide sort: Bernoulli-
    // sample on the portable hash (pushable filter), then EXACT
    // rank-selection quantiles over the sample (rank = floor(q·(n−1)),
    // ties by doc_id). Error is the classic O(1/√(pn)) sampling bound;
    // determinism makes it auditable — both engines select the same
    // sample AND the same order statistics. The Spark side ranks with
    // GlobalOrder.zipRank (two-pass range scan), never a single-
    // partition window.
    QueryDef(
      "q134_sampled_quantiles",
      (s, d) => {
        import s.implicits._
        val sample = Tables.documents(s, d)
          .filter(Sampling.hashFraction($"doc_id", 134L) < 0.1)
          .select($"n_chars", $"doc_id")
        val (ranked, n) = graft.operators.GlobalOrder.zipRankWithCount(
          sample.sort($"n_chars", $"doc_id"), "r")
        val targets = Seq(100, 250, 500, 750, 900, 990).toDF("q_milli")
          .withColumn("rank", expr(
            s"CAST(floor(CAST(q_milli * ${n - 1} AS DOUBLE) / 1000.0) AS BIGINT)"))
        ranked.join(broadcast(targets), ranked("r") === targets("rank") + 1)
          .select($"q_milli", $"rank", $"n_chars".as("value"))
          .orderBy($"q_milli")
      },
      Some({
        val frac134 = Sampling.hashFractionSql("doc_id", 134L)
        s"""WITH sample AS MATERIALIZED (
           |  SELECT doc_id, n_chars FROM documents WHERE $frac134 < 0.1),
           |rk AS MATERIALIZED (
           |  SELECT n_chars,
           |    row_number() OVER (ORDER BY n_chars, doc_id) - 1 AS r
           |  FROM sample),
           |n AS MATERIALIZED (SELECT count(*) AS n FROM sample),
           |t(q_milli) AS (VALUES (100), (250), (500), (750), (900), (990)),
           |tgt AS MATERIALIZED (
           |  SELECT t.q_milli,
           |    CAST(floor(CAST(t.q_milli * (n.n - 1) AS DOUBLE) / 1000.0) AS BIGINT)
           |      AS rank
           |  FROM t, n)
           |SELECT g.q_milli, g.rank, rk.n_chars AS value
           |FROM tgt g JOIN rk ON rk.r = g.rank
           |ORDER BY g.q_milli""".stripMargin
      })),

    // ----- q139: DSIR importance resampling (operators/Dsir) — select
    // the k raw documents whose hashed-bigram distribution best
    // matches the English target slice, via quantized log importance
    // ratios + Gumbel top-k. The oracle replays the WHOLE pipeline:
    // bigram bucketing (md5 hash), the smoothed integer-rational
    // ratio table, the exact integer score sums, and the Gumbel
    // priorities — both engines select the identical k documents.
    QueryDef(
      "q139_dsir_resample",
      (s, d) => {
        import s.implicits._
        val docs = Tables.documents(s, d)
        val qlr = Dsir.quantizedLogRatios(
          Dsir.bucketCounts(docs, "text", $"lang" === "en"))
        val scored = Dsir.scoreDocs(docs, "text", qlr)
          .select($"doc_id", $"lang", $"n_bigrams", $"qlogw")
        Dsir.gumbelTopK(scored, $"doc_id", k = 100, salt = 139L)
          .orderBy($"pri".desc, $"doc_id")
      },
      Some(
        s"""WITH ${Dsir.buckCteSql},
           |${Dsir.qlrCteSql("lang = 'en'")},
           |score AS MATERIALIZED (
           |  SELECT d.doc_id, d.lang,
           |    CAST(coalesce(s.nb, 0) AS BIGINT) AS n_bigrams,
           |    CAST(coalesce(s.w, 0) AS BIGINT) AS qlogw
           |  FROM documents d LEFT JOIN (
           |    SELECT bk.doc_id, count(*) AS nb, SUM(q.w) AS w
           |    FROM buck bk JOIN qlr q ON bk.b = q.b
           |    GROUP BY bk.doc_id) s USING (doc_id))
           |SELECT doc_id, lang, n_bigrams, qlogw,
           |  qlogw + ${Dsir.gumbelSql("doc_id", 139L)} AS pri
           |FROM score
           |ORDER BY pri DESC, doc_id
           |LIMIT 100""".stripMargin)),

    // ----- q185: subsampling uncertainty for the mean — B = 20
    // deterministic half-subsamples via the portable hash (salted
    // per-replicate id streams), exact cents sums per replicate,
    // each replicate mean snapped to integer cents BEFORE the
    // between-replicate moments (so the spread statistic is exact
    // BIGINT algebra + one sqrt). The hash-replicate trick gives
    // bootstrap-style error bars with zero RNG — every replicate is
    // replayable, which a seeded resampler could never be.
    QueryDef(
      "q185_subsample_ci",
      (s, d) => {
        import s.implicits._
        val B = 20
        val rows = Tables.lineitem(s, d).select(
          ($"l_orderkey" * 8 + $"l_linenumber").as("rk"),
          floor($"l_extendedprice" * 100 + lit(0.5)).cast("long").as("cents"))
        val means = rows
          .select($"rk", $"cents",
            explode(sequence(lit(0), lit(B - 1))).as("b0"))
          .withColumn("b", $"b0".cast("long")).drop("b0")
          .filter(Sampling.hashFraction($"rk" + $"b" * lit(1000003L), 185L)
            < 0.5)
          .groupBy($"b")
          .agg(count(lit(1)).as("n_b"),
            sum($"cents".cast("decimal(38,0)")).as("sc"))
          .select($"b", $"n_b",
            floor($"sc".cast("double") / $"n_b".cast("double") + lit(0.5))
              .cast("long").as("mean_q"))
        val g = means.agg(count(lit(1)).as("k"),
          sum($"mean_q").as("sm"), sum($"mean_q" * $"mean_q").as("sm2"))
        means.crossJoin(broadcast(g))
          .select($"b", $"n_b", $"mean_q",
            floor(sqrt(($"k".cast("double") * $"sm2".cast("double")
              - $"sm".cast("double") * $"sm".cast("double"))
              / ($"k".cast("double") * ($"k".cast("double") - lit(1.0))))
              + lit(0.5)).cast("long").as("sd_q"))
          .orderBy($"b")
      },
      Some(s"""WITH rows_ AS (
             |  SELECT l_orderkey * 8 + l_linenumber AS rk,
             |    CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS cents
             |  FROM lineitem),
             |sub AS (
             |  SELECT CAST(bb.range AS BIGINT) AS b,
             |    CAST(COUNT(*) AS BIGINT) AS n_b, SUM(r.cents) AS sc
             |  FROM rows_ r CROSS JOIN range(0, 20) bb
             |  WHERE ${Sampling.hashFractionSql("r.rk + bb.range * 1000003", 185L)}
             |    < 0.5
             |  GROUP BY 1),
             |means AS (
             |  SELECT b, n_b,
             |    CAST(floor(CAST(sc AS DOUBLE) / CAST(n_b AS DOUBLE) + 0.5)
             |      AS BIGINT) AS mean_q
             |  FROM sub),
             |g AS (
             |  SELECT CAST(COUNT(*) AS BIGINT) AS k,
             |    CAST(SUM(mean_q) AS BIGINT) AS sm,
             |    CAST(SUM(mean_q * mean_q) AS BIGINT) AS sm2
             |  FROM means)
             |SELECT m.b, m.n_b, m.mean_q,
             |  CAST(floor(sqrt(
             |    (CAST(g.k AS DOUBLE) * CAST(g.sm2 AS DOUBLE)
             |     - CAST(g.sm AS DOUBLE) * CAST(g.sm AS DOUBLE))
             |    / (CAST(g.k AS DOUBLE) * (CAST(g.k AS DOUBLE) - 1.0)))
             |    + 0.5) AS BIGINT) AS sd_q
             |FROM means m, g ORDER BY m.b""".stripMargin)),

    // ----- q225: Neyman optimal allocation (Neyman 1934) — how many
    // samples each nation stratum gets when drawing a 10,000-row
    // stratified sample of customers proportional to N_h·S_h (the
    // variance-minimizing design a curation team uses to budget
    // annotation). Per-stratum moments are exact cent integers; each
    // stratum's weight N_h·S_h is ONE fixed double chain (one
    // exactly-rounded sqrt) floor-snapped to 2^-20 units, so the
    // cross-strata normalizer is an exact BIGINT sum and every
    // allocation is one exact integer division.
    QueryDef(
      "q225_neyman_allocation",
      (s, d) => {
        import s.implicits._
        val q = Tables.customer(s, d).select($"c_nationkey",
          floor($"c_acctbal" * 100 + lit(0.5)).cast("long").as("x"))
        val per = q.groupBy($"c_nationkey").agg(
          count(lit(1)).as("nh"), sum($"x").as("sx"),
          sum($"x" * $"x").as("sxx"))
        val nd = $"nh".cast("double")
        val sd = sqrt((nd * $"sxx".cast("double")
          - $"sx".cast("double") * $"sx") / (nd * (nd - 1.0)))
        val wq = per.select($"c_nationkey", $"nh",
          floor(nd * sd * 1048576).cast("long").as("wq"))
        val tot = wq.agg(sum($"wq").as("wt"))
        wq.crossJoin(tot)
          .select($"c_nationkey", $"nh".as("pop"),
            expr("10000 * wq DIV wt").as("alloc_n"))
          .orderBy($"c_nationkey")
      },
      Some("""WITH q AS (
             |  SELECT c_nationkey,
             |    CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT) AS x
             |  FROM customer),
             |per AS (
             |  SELECT c_nationkey, CAST(COUNT(*) AS BIGINT) AS nh,
             |    CAST(SUM(x) AS BIGINT) AS sx,
             |    CAST(SUM(x * x) AS BIGINT) AS sxx
             |  FROM q GROUP BY 1),
             |wq AS (
             |  SELECT c_nationkey, nh,
             |    CAST(floor(CAST(nh AS DOUBLE) * sqrt(
             |      (CAST(nh AS DOUBLE) * CAST(sxx AS DOUBLE)
             |       - CAST(sx AS DOUBLE) * sx)
             |      / (CAST(nh AS DOUBLE) * (CAST(nh AS DOUBLE) - 1.0)))
             |      * 1048576) AS BIGINT) AS wq
             |  FROM per),
             |tot AS (SELECT CAST(SUM(wq) AS BIGINT) AS wt FROM wq)
             |SELECT c_nationkey, nh AS pop,
             |  CAST(10000 * wq // wt AS BIGINT) AS alloc_n
             |FROM wq CROSS JOIN tot
             |ORDER BY c_nationkey""".stripMargin)),

    // ----- q332: probability-proportional-to-size sampling with a
    // Horvitz–Thompson total estimate — the UNEQUAL-probability
    // member next to q84 stratified / q100 weighted: inclusion
    // πᵢ = 0.3·n_charsᵢ/max(n_chars) (size-biased, deterministic
    // portable-hash draw), estimating the corpus WORD total from the
    // sample via Σ yᵢ/πᵢ. Each HT term is snapped to an integer per
    // doc (order-free sum — the q165 discipline); the true total and
    // the error ratio are exact. The designed-in property: y (words)
    // correlates with size (chars), so PPS beats uniform at equal n.
    QueryDef(
      "q332_pps_sample",
      (s, d) => {
        import s.implicits._
        val docs = Tables.documents(s, d).select($"doc_id", $"n_chars",
          size(expr("filter(split(text, ' '), x -> x != '')")).cast("long")
            .as("w"))
          .transform(graft.operators.Iterate.truncate) // max + truth + sample legs read it
        val mx = docs.agg(max($"n_chars").as("mx"),
          count(lit(1)).as("n_docs"), sum($"w").as("true_words"))
        def db(c: org.apache.spark.sql.Column) = c.cast("double")
        val joined = docs.crossJoin(mx)
        val pi = lit(0.3) * db($"n_chars") / db($"mx")
        val sampled = joined
          .filter(graft.operators.Sampling.hashFraction($"doc_id", 332L) < pi)
          .select(floor(db($"w") / pi + lit(0.5)).cast("long").as("term"))
        val est = sampled.agg(count(lit(1)).as("n_sampled"),
          sum($"term").as("ht_estimate"))
        mx.select($"n_docs", $"true_words").crossJoin(est)
          .select($"n_docs", $"n_sampled", $"true_words", $"ht_estimate",
            expr("abs(ht_estimate - true_words) * 1000000 DIV true_words")
              .as("err_ppm"))
      },
      Some(s"""WITH docs AS (
             |  SELECT doc_id, n_chars,
             |    CAST(len(list_filter(string_split(text, ' '),
             |      x -> x <> '')) AS BIGINT) AS w
             |  FROM documents),
             |mx AS (SELECT CAST(MAX(n_chars) AS BIGINT) AS mx,
             |    CAST(COUNT(*) AS BIGINT) AS n_docs,
             |    CAST(SUM(w) AS BIGINT) AS true_words
             |  FROM docs),
             |sampled AS (
             |  SELECT CAST(floor(CAST(d.w AS DOUBLE)
             |      / (0.3 * CAST(d.n_chars AS DOUBLE) / CAST(m.mx AS DOUBLE))
             |      + 0.5) AS BIGINT) AS term
             |  FROM docs d CROSS JOIN mx m
             |  WHERE ${graft.operators.Sampling.hashFractionSql(
                  "d.doc_id", 332L)}
             |    < 0.3 * CAST(d.n_chars AS DOUBLE) / CAST(m.mx AS DOUBLE)),
             |est AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_sampled,
             |    CAST(SUM(term) AS BIGINT) AS ht_estimate
             |  FROM sampled)
             |SELECT m.n_docs, e.n_sampled, m.true_words, e.ht_estimate,
             |  abs(e.ht_estimate - m.true_words) * 1000000 // m.true_words
             |    AS err_ppm
             |FROM mx m CROSS JOIN est e""".stripMargin)))
}
