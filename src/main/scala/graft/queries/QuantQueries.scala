package graft.queries

import graft.{QueryDef, Tables}
import graft.operators.{Sampling, SqSearch}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Scalar-quantized vector search + retrieval evaluation (SURVEY
  * §2.12). Every arithmetic step is either exact integer math or an
  * IEEE-identical double expression, so — uniquely in the ANN family —
  * the SEARCH RESULTS themselves are DuckDB-oracle-checked, not just
  * spec-bounded: q130 hash-matches the top-k list, q131 hash-matches
  * recall@10 / reciprocal-rank metrics of the quantized search against
  * exact ground truth.
  */
object QuantQueries {

  private val QueryId = 7L   // q130's probe row
  private val K = 20
  private val QSalt = 131L   // q131 query-set salt
  private val QRate = 0.02   // ≈10 probe queries at 500 rows
  private val DistQuantum = 1048576L // 2^20 — exact-ground-truth quantum (= KMeans.DistQuantum)

  /** Shared oracle CTEs: per-dim components, range stats, and the SQ8
    * codes — the textual mirror of [[SqSearch.train]]/`encodeOne`.
    * MATERIALIZED so DuckDB evaluates each once (the chain is
    * multiply-referenced).
    */
  private val codeCtes: String =
    s"""WITH dims AS MATERIALIZED (
       |  SELECT vec_id, unnest(embedding) AS v,
       |    unnest(list_transform(range(0, len(embedding)), p -> p)) AS pos
       |  FROM embeddings),
       |stats AS MATERIALIZED (
       |  SELECT pos, CAST(min(v) AS DOUBLE) AS mn, CAST(max(v) AS DOUBLE) AS mx
       |  FROM dims GROUP BY pos),
       |codes AS MATERIALIZED (
       |  SELECT d.vec_id, d.pos,
       |    CASE WHEN s.mx = s.mn THEN 0
       |         ELSE LEAST(GREATEST(CAST(floor(
       |           (CAST(d.v AS DOUBLE) - s.mn) * ${SqSearch.Levels}.0 / (s.mx - s.mn))
       |           AS BIGINT), 0), ${SqSearch.Levels})
       |    END AS code
       |  FROM dims d JOIN stats s ON d.pos = s.pos)""".stripMargin

  def defs: Seq[QueryDef] = Seq(

    // ----- q130: SQ8 top-k search — per-dim linear int8 codes under
    // corpus range stats, symmetric integer-L2 ranking. The oracle
    // re-derives the identical codes and re-ranks; the top-20 list
    // hash-matches end to end.
    QueryDef(
      "q130_sq_search",
      (s, d) => {
        import s.implicits._
        val embs = Tables.embeddings(s, d)
        val query = embs.filter($"vec_id" === QueryId)
          .select($"embedding").as[Array[Float]].first()
        SqSearch.searchRaw(embs, "vec_id", "embedding", query, K)
      },
      Some(
        s"""$codeCtes,
           |q AS MATERIALIZED (SELECT pos, code FROM codes WHERE vec_id = $QueryId)
           |SELECT c.vec_id,
           |  CAST(SUM((c.code - q.code) * (c.code - q.code)) AS BIGINT) AS qdist
           |FROM codes c JOIN q ON c.pos = q.pos
           |GROUP BY c.vec_id
           |ORDER BY qdist, c.vec_id
           |LIMIT $K""".stripMargin)),

    // ----- q131: retrieval-eval harness — recall@10 and reciprocal
    // rank of the SQ8 ranking against exact (quantized-integer L2)
    // ground truth, per hash-sampled probe query. The eval loop every
    // ANN deployment needs before trading recall for scan cost; both
    // rankings and both metrics replay exactly in SQL.
    QueryDef(
      "q131_retrieval_eval",
      (s, d) => {
        import s.implicits._
        val embs = Tables.embeddings(s, d)
        val model = SqSearch.train(embs, "embedding")
        val corpus = SqSearch.encode(embs, "vec_id", "embedding", model)
          .join(embs.select($"vec_id", $"embedding"), "vec_id")
        val qs = corpus
          .filter(Sampling.hashFraction($"vec_id", QSalt) < QRate)
          .select($"vec_id".as("qid"), $"embedding".as("qvec"),
            $"codes".as("qcodes"))
        // probe set is hash-bounded (~QRate·n queries) and broadcast;
        // the nested-loop pair build is the eval harness's point — a
        // sampled diagnostic, not a corpus-scale operator
        val edist = graft.operators.Retrieval.quantL2(
          $"embedding", $"qvec", DistQuantum.toDouble)
        val sdist = aggregate(
          zip_with($"codes", $"qcodes", (a, b) => (a - b) * (a - b)),
          lit(0L), (acc, x) => acc + x.cast("long"))
        val pairs = corpus.join(broadcast(qs), $"vec_id" =!= $"qid")
          .withColumn("edist", edist)
          .withColumn("sdist", sdist)
        val er = row_number().over(
          Window.partitionBy($"qid").orderBy($"edist", $"vec_id"))
        val sr = row_number().over(
          Window.partitionBy($"qid").orderBy($"sdist", $"vec_id"))
        pairs
          .withColumn("er", er)
          .withColumn("sr", sr)
          .groupBy($"qid".as("query_id"))
          .agg(
            sum(when($"er" <= 10 && $"sr" <= 10, 1L).otherwise(0L))
              .as("recall10"),
            max(when($"er" === 1, lit(1.0) / $"sr")).as("rr"))
          .orderBy($"query_id")
      },
      Some {
        val frac = Sampling.hashFractionSql("vec_id", QSalt)
        s"""$codeCtes,
           |qs AS MATERIALIZED (
           |  SELECT vec_id AS qid FROM embeddings WHERE $frac < $QRate),
           |exact AS MATERIALIZED (
           |  SELECT q.qid, d.vec_id,
           |    SUM(CAST(floor((CAST(d.v AS DOUBLE) - CAST(e.v AS DOUBLE))
           |      * (CAST(d.v AS DOUBLE) - CAST(e.v AS DOUBLE))
           |      * $DistQuantum.0) AS BIGINT)) AS dist
           |  FROM qs q
           |  JOIN dims e ON e.vec_id = q.qid
           |  JOIN dims d ON d.pos = e.pos AND d.vec_id <> q.qid
           |  GROUP BY q.qid, d.vec_id),
           |sq AS MATERIALIZED (
           |  SELECT q.qid, c.vec_id,
           |    SUM((c.code - qc.code) * (c.code - qc.code)) AS dist
           |  FROM qs q
           |  JOIN codes qc ON qc.vec_id = q.qid
           |  JOIN codes c ON c.pos = qc.pos AND c.vec_id <> q.qid
           |  GROUP BY q.qid, c.vec_id),
           |er AS MATERIALIZED (
           |  SELECT qid, vec_id,
           |    row_number() OVER (PARTITION BY qid ORDER BY dist, vec_id) AS r
           |  FROM exact),
           |sr AS MATERIALIZED (
           |  SELECT qid, vec_id,
           |    row_number() OVER (PARTITION BY qid ORDER BY dist, vec_id) AS r
           |  FROM sq)
           |SELECT e.qid AS query_id,
           |  CAST(SUM(CASE WHEN e.r <= 10 AND s.r <= 10 THEN 1 ELSE 0 END) AS BIGINT)
           |    AS recall10,
           |  MAX(CASE WHEN e.r = 1 THEN CAST(1 AS DOUBLE) / s.r END) AS rr
           |FROM er e JOIN sr s ON e.qid = s.qid AND e.vec_id = s.vec_id
           |GROUP BY e.qid
           |ORDER BY query_id""".stripMargin
      }),

    // ----- q167: two-proportion z-test per event type — the A/B-test
    // read-out over a deterministic user split (user_id parity; the
    // repo's portable-hash splits q85 would work identically). Counts
    // are exact BIGINTs; the z statistic is one fixed left-associated
    // IEEE double chain ending in ONE sqrt (exactly rounded by
    // IEEE-754, unlike libm ln/exp), so micro-scaled z values match
    // with no tolerance at all.
    QueryDef(
      "q167_ab_ztest",
      (s, d) => {
        import s.implicits._
        val ev = Tables.events(s, d)
          .select($"event_type", (col("user_id") % 2 === 0).as("is_a"))
        val byCohort = ev.groupBy($"event_type")
          .agg(sum(when($"is_a", 1L).otherwise(0L)).as("x1"),
            sum(when(!$"is_a", 1L).otherwise(0L)).as("x2"))
        val totals = ev.agg(
          sum(when($"is_a", 1L).otherwise(0L)).as("n1"),
          sum(when(!$"is_a", 1L).otherwise(0L)).as("n2"))
        val p1 = $"x1".cast("double") / $"n1".cast("double")
        val p2 = $"x2".cast("double") / $"n2".cast("double")
        val p = ($"x1" + $"x2").cast("double") / ($"n1" + $"n2").cast("double")
        val se = sqrt(p * (lit(1.0) - p) *
          (lit(1.0) / $"n1".cast("double") + lit(1.0) / $"n2".cast("double")))
        byCohort.crossJoin(broadcast(totals))
          .select($"event_type", $"x1", $"n1", $"x2", $"n2",
            floor((p1 - p2) / se * 1000000 + lit(0.5)).cast("long")
              .as("z_micro"))
          .orderBy($"event_type")
      },
      Some("""WITH ev AS (
             |  SELECT event_type, (user_id % 2 = 0) AS is_a FROM events),
             |bc AS (
             |  SELECT event_type,
             |    CAST(SUM(CASE WHEN is_a THEN 1 ELSE 0 END) AS BIGINT) AS x1,
             |    CAST(SUM(CASE WHEN NOT is_a THEN 1 ELSE 0 END) AS BIGINT) AS x2
             |  FROM ev GROUP BY 1),
             |tot AS (
             |  SELECT CAST(SUM(CASE WHEN is_a THEN 1 ELSE 0 END) AS BIGINT) AS n1,
             |    CAST(SUM(CASE WHEN NOT is_a THEN 1 ELSE 0 END) AS BIGINT) AS n2
             |  FROM ev)
             |SELECT event_type, x1, n1, x2, n2,
             |  CAST(floor(
             |    (CAST(x1 AS DOUBLE) / CAST(n1 AS DOUBLE)
             |     - CAST(x2 AS DOUBLE) / CAST(n2 AS DOUBLE))
             |    / sqrt(CAST(x1 + x2 AS DOUBLE) / CAST(n1 + n2 AS DOUBLE)
             |           * (1.0 - CAST(x1 + x2 AS DOUBLE) / CAST(n1 + n2 AS DOUBLE))
             |           * (1.0 / CAST(n1 AS DOUBLE) + 1.0 / CAST(n2 AS DOUBLE)))
             |    * 1000000 + 0.5) AS BIGINT) AS z_micro
             |FROM bc CROSS JOIN tot
             |ORDER BY event_type""".stripMargin)),

    // ----- q170: Pearson correlation matrix over the lineitem money
    // columns — raw moments as EXACT sums (cent-quantized BIGINT
    // products summed in decimal(38,0)/HUGEINT, order-independent),
    // then r from one fixed IEEE double chain with two exact sqrts,
    // micro-snapped. The 6 pair arms are GENERATED from one column
    // list for both engines (no transcription drift).
    QueryDef(
      "q170_correlation",
      (s, d) => {
        import s.implicits._
        val q = Tables.lineitem(s, d).select(CorrCols.zipWithIndex.map {
          case (c, i) =>
            floor(col(c) * 100 + lit(0.5)).cast("long").as(s"x$i")
        }: _*)
        val aggs =
          CorrCols.indices.map(i =>
            sum(col(s"x$i").cast("decimal(38,0)")).as(s"s$i")) ++
          (for { i <- CorrCols.indices; j <- CorrCols.indices if i <= j }
            yield sum((col(s"x$i") * col(s"x$j")).cast("decimal(38,0)"))
              .as(s"s$i$j")) :+
          count(lit(1)).as("n")
        // ONE aggregation pass; the 15 exact moments (bounded-collect
        // class) finish on the driver with the SAME IEEE ops the
        // in-plan expressions would run (BigDecimal→double is the
        // correctly-rounded CAST; math.sqrt/floor are the SQL fns) —
        // the naive per-arm select re-scans lineitem six times.
        val row = q.agg(aggs.head, aggs.tail: _*).head()
        val n = row.getAs[Long]("n")
        val nd = n.toDouble
        def sd(nm: String): Double =
          row.getAs[java.math.BigDecimal](nm).doubleValue
        val arms = for { i <- CorrCols.indices; j <- CorrCols.indices if i < j }
          yield {
            val num = nd * sd(s"s$i$j") - sd(s"s$i") * sd(s"s$j")
            val den = math.sqrt(nd * sd(s"s$i$i") - sd(s"s$i") * sd(s"s$i")) *
              math.sqrt(nd * sd(s"s$j$j") - sd(s"s$j") * sd(s"s$j"))
            (CorrCols(i), CorrCols(j), n,
              math.floor(num / den * 1000000 + 0.5).toLong)
          }
        arms.toSeq.toDF("col_a", "col_b", "n", "r_micro")
          .orderBy(col("col_a"), col("col_b"))
      },
      Some(corrOracle)),

    // ----- q171: two-sample Kolmogorov–Smirnov over purchase values
    // (parity cohorts) — D kept as the exact integer cross-product
    // |cum1·n2 − cum2·n1| over the merged support, so the max AND its
    // location match with zero tolerance (operators.RankTests; cums
    // via the two-pass GlobalOrder.runningSum, never a global
    // window).
    QueryDef(
      "q171_ks_test",
      (s, d) => graft.operators.RankTests.ks(
        Tables.events(s, d).filter(col("event_type") === "purchase"),
        "value", col("user_id") % 2 === 0),
      Some("""WITH v AS (
             |  SELECT value AS v,
             |    CAST(SUM(CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS c1,
             |    CAST(SUM(CASE WHEN user_id % 2 = 0 THEN 0 ELSE 1 END) AS BIGINT) AS c2
             |  FROM events WHERE event_type = 'purchase' GROUP BY 1),
             |c AS (
             |  SELECT v, c1, c2,
             |    CAST(SUM(c1) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED
             |      PRECEDING AND CURRENT ROW) AS BIGINT) AS cum1,
             |    CAST(SUM(c2) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED
             |      PRECEDING AND CURRENT ROW) AS BIGINT) AS cum2
             |  FROM v),
             |t AS (SELECT CAST(SUM(c1) AS BIGINT) AS n1,
             |        CAST(SUM(c2) AS BIGINT) AS n2 FROM v)
             |SELECT c.v AS v_at, t.n1, t.n2,
             |  abs(c.cum1 * t.n2 - c.cum2 * t.n1) AS d_num,
             |  t.n1 * t.n2 AS d_den,
             |  CAST(floor(CAST(abs(c.cum1 * t.n2 - c.cum2 * t.n1) AS DOUBLE)
             |    / CAST(t.n1 * t.n2 AS DOUBLE) * 1000000 + 0.5) AS BIGINT)
             |    AS ks_micro
             |FROM c, t
             |ORDER BY d_num DESC, v_at LIMIT 1""".stripMargin)),

    // ----- q172: Mann–Whitney U (tie-corrected) on the same cohort
    // split — doubled tie-averaged ranks keep the rank sum exact
    // BIGINT (2·rank = 2·cumBefore + cnt + 1), tie correction
    // Σ(t³−t) exact; one sqrt for the z normalization.
    QueryDef(
      "q172_mann_whitney",
      (s, d) => graft.operators.RankTests.mannWhitneyU(
        Tables.events(s, d).filter(col("event_type") === "purchase"),
        "value", col("user_id") % 2 === 0),
      Some("""WITH v AS (
             |  SELECT value AS v,
             |    CAST(SUM(CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS c1,
             |    CAST(SUM(CASE WHEN user_id % 2 = 0 THEN 0 ELSE 1 END) AS BIGINT) AS c2
             |  FROM events WHERE event_type = 'purchase' GROUP BY 1),
             |c AS (
             |  SELECT v, c1, c2,
             |    CAST(SUM(c1) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED
             |      PRECEDING AND CURRENT ROW) AS BIGINT) AS cum1,
             |    CAST(SUM(c2) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED
             |      PRECEDING AND CURRENT ROW) AS BIGINT) AS cum2
             |  FROM v),
             |g AS (
             |  SELECT CAST(SUM(c1) AS BIGINT) AS n1,
             |    CAST(SUM(c2) AS BIGINT) AS n2,
             |    CAST(SUM(c1 * (2 * (cum1 + cum2 - c1 - c2) + c1 + c2 + 1))
             |      AS BIGINT) AS r2a,
             |    CAST(SUM((c1 + c2) * (c1 + c2) * (c1 + c2) - (c1 + c2))
             |      AS BIGINT) AS tie_sum
             |  FROM c)
             |SELECT n1, n2, r2a - n1 * (n1 + 1) AS u2, tie_sum,
             |  CAST(floor(
             |    (CAST(r2a - n1 * (n1 + 1) AS DOUBLE)
             |     - CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE))
             |    / 2.0
             |    / sqrt(CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE) / 12.0
             |           * ((CAST(n1 + n2 AS DOUBLE) + 1.0)
             |              - CAST(tie_sum AS DOUBLE)
             |                / (CAST(n1 + n2 AS DOUBLE)
             |                   * (CAST(n1 + n2 AS DOUBLE) - 1.0))))
             |    * 1000000 + 0.5) AS BIGINT) AS z_micro
             |FROM g""".stripMargin)),

    // ----- q173: Spearman rank correlation (tie-averaged) between
    // quantity and extended price — Pearson over DOUBLED average
    // ranks, so every moment is an exact BIGINT/decimal sum and only
    // the final q170 double chain (two exact sqrts) touches floats.
    QueryDef(
      "q173_spearman",
      (s, d) => graft.operators.RankTests.spearman(
        Tables.lineitem(s, d), "l_quantity", "l_extendedprice"),
      Some("""WITH rows_ AS (
             |  SELECT l_quantity AS x, l_extendedprice AS y FROM lineitem),
             |cx AS (SELECT x AS v, CAST(count(*) AS BIGINT) AS cnt
             |       FROM rows_ GROUP BY 1),
             |rx AS (SELECT v, 2 * CAST(SUM(cnt) OVER (ORDER BY v ROWS BETWEEN
             |    UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) - cnt + 1 AS r2x
             |  FROM cx),
             |cy AS (SELECT y AS v, CAST(count(*) AS BIGINT) AS cnt
             |       FROM rows_ GROUP BY 1),
             |ry AS (SELECT v, 2 * CAST(SUM(cnt) OVER (ORDER BY v ROWS BETWEEN
             |    UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) - cnt + 1 AS r2y
             |  FROM cy),
             |j AS (
             |  SELECT rx.r2x, ry.r2y
             |  FROM rows_ JOIN rx ON rows_.x = rx.v JOIN ry ON rows_.y = ry.v),
             |m AS (
             |  SELECT CAST(COUNT(*) AS BIGINT) AS n,
             |    SUM(r2x) AS sx, SUM(r2y) AS sy, SUM(r2x * r2x) AS sxx,
             |    SUM(r2y * r2y) AS syy, SUM(r2x * r2y) AS sxy
             |  FROM j)
             |SELECT n,
             |  CAST(floor(
             |    (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
             |     - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
             |    / (sqrt(CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
             |            - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
             |       * sqrt(CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
             |              - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)))
             |    * 1000000 + 0.5) AS BIGINT) AS rho_micro
             |FROM m""".stripMargin)),

    // ----- q177: Benford first-digit goodness-of-fit over invoice
    // amounts — the fraud/data-quality audit classic. The leading
    // digit comes from the exact integer-cents DECIMAL STRING (both
    // engines print a BIGINT identically — no per-row libm, no float
    // formatting); expected counts are n·log10(1+1/d) snapped to
    // micro PER DIGIT, and each χ² term is r4-snapped BEFORE the
    // total sums (the q164 pre-round discipline), so all 9 rows and
    // the riding total are exact BIGINTs.
    QueryDef(
      "q177_benford",
      (s, d) => {
        import s.implicits._
        val digits = Tables.lineitem(s, d)
          .select(floor(col("l_extendedprice") * 100 + lit(0.5)).cast("long")
            .as("c"))
          .select(substring(col("c").cast("string"), 1, 1).cast("long")
            .as("digit"))
          .groupBy($"digit").agg(count(lit(1)).as("observed"))
        val nn = digits.agg(sum($"observed").as("n"))
        val expect = s.range(1, 10).toDF("digit")
          .select($"digit",
            floor(log(lit(1.0) + lit(1.0) / $"digit".cast("double"))
              / log(lit(10.0)) * 1000000 + lit(0.5)).cast("long")
              .as("p_micro"))
        val terms = expect.join(digits, Seq("digit"), "left")
          .na.fill(0L, Seq("observed"))
          .crossJoin(broadcast(nn))
          .select($"digit", $"observed",
            ($"n" * $"p_micro").as("expected_micro"),
            floor(
              ($"observed" * 1000000L - $"n" * $"p_micro").cast("double")
                * ($"observed" * 1000000L - $"n" * $"p_micro").cast("double")
                / ($"n" * $"p_micro").cast("double") / 1000000.0
                * 10000 + lit(0.5)).cast("long").as("term_q"))
        val tot = terms.agg(sum($"term_q").as("chi2_q"))
        terms.crossJoin(broadcast(tot)).orderBy($"digit")
      },
      Some("""WITH digits AS (
             |  SELECT CAST(substring(CAST(CAST(floor(l_extendedprice * 100 + 0.5)
             |      AS BIGINT) AS VARCHAR), 1, 1) AS BIGINT) AS digit
             |  FROM lineitem),
             |obs AS (
             |  SELECT digit, CAST(count(*) AS BIGINT) AS observed
             |  FROM digits GROUP BY 1),
             |nn AS (SELECT CAST(SUM(observed) AS BIGINT) AS n FROM obs),
             |expect AS (
             |  SELECT CAST(r.range AS BIGINT) AS digit,
             |    CAST(floor(ln(1.0 + 1.0 / CAST(r.range AS DOUBLE)) / ln(10.0)
             |      * 1000000 + 0.5) AS BIGINT) AS p_micro
             |  FROM range(1, 10) r),
             |terms AS (
             |  SELECT e.digit, COALESCE(o.observed, 0) AS observed,
             |    CAST(nn.n * e.p_micro AS BIGINT) AS expected_micro,
             |    CAST(floor(
             |      CAST(COALESCE(o.observed, 0) * 1000000 - nn.n * e.p_micro
             |        AS DOUBLE)
             |      * CAST(COALESCE(o.observed, 0) * 1000000 - nn.n * e.p_micro
             |        AS DOUBLE)
             |      / CAST(nn.n * e.p_micro AS DOUBLE) / 1000000.0
             |      * 10000 + 0.5) AS BIGINT) AS term_q
             |  FROM expect e LEFT JOIN obs o ON e.digit = o.digit
             |  CROSS JOIN nn)
             |SELECT t.digit, t.observed, t.expected_micro, t.term_q, s.chi2_q
             |FROM terms t
             |CROSS JOIN (SELECT CAST(SUM(term_q) AS BIGINT) AS chi2_q
             |            FROM terms) s
             |ORDER BY t.digit""".stripMargin)),

    // ----- q178: Holt double exponential smoothing over the daily
    // revenue series (operators.Holt) — level + trend carried in
    // integer fixed point, so the 2,399-step trajectory replays as a
    // RECURSIVE CTE (the q168 pattern with a two-component carry);
    // every level, trend, and one-step forecast hash-matches.
    QueryDef(
      "q178_holt_smoothing",
      (s, d) => {
        import s.implicits._
        val daily = Tables.orders(s, d)
          .select(to_date($"o_orderdate").as("day"),
            floor($"o_totalprice" * 100 + lit(0.5)).cast("long").as("cents"))
          .groupBy($"day").agg(sum($"cents").as("xq"))
        graft.operators.Holt.smooth(daily, "day", "xq",
          HoltAlphaDen, HoltBetaDen)
      },
      Some(s"""WITH RECURSIVE ser AS (
             |  SELECT CAST(o_orderdate AS DATE) AS day,
             |    CAST(SUM(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
             |      AS BIGINT) AS xq
             |  FROM orders GROUP BY 1),
             |rn AS MATERIALIZED (
             |  SELECT day, xq,
             |    CAST(row_number() OVER (ORDER BY day) AS BIGINT) AS rn
             |  FROM ser),
             |h AS (
             |  SELECT day, xq, rn, xq AS l, CAST(0 AS BIGINT) AS b
             |  FROM rn WHERE rn = 1
             |  UNION ALL
             |  SELECT r.day, r.xq, r.rn,
             |    h.l + h.b + ${QueryFixtures.fdivSql("r.xq - h.l - h.b",
                    HoltAlphaDen.toString)} AS l,
             |    h.b + ${QueryFixtures.fdivSql(
                    QueryFixtures.fdivSql("r.xq - h.l - h.b",
                      HoltAlphaDen.toString), HoltBetaDen.toString)} AS b
             |  FROM h JOIN rn r ON r.rn = h.rn + 1)
             |SELECT day, xq, l AS level, b AS trend, l + b AS forecast
             |FROM h ORDER BY day""".stripMargin)),

    // ----- q179: additive seasonal decomposition of the same daily
    // series (operators.Seasonal) — centered 7-day MA trend,
    // per-ISO-weekday seasonal means, residuals, all integer fixed
    // point (fdiv floors identically), edge rows NULL on both sides.
    QueryDef(
      "q179_seasonal_decompose",
      (s, d) => {
        import s.implicits._
        val daily = Tables.orders(s, d)
          .select(to_date($"o_orderdate").as("day"),
            floor($"o_totalprice" * 100 + lit(0.5)).cast("long").as("cents"))
          .groupBy($"day").agg(sum($"cents").as("xq"))
        graft.operators.Seasonal.decompose(daily, "day", "xq")
      },
      Some(s"""WITH ser AS (
             |  SELECT CAST(o_orderdate AS DATE) AS day,
             |    CAST(SUM(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
             |      AS BIGINT) AS xq
             |  FROM orders GROUP BY 1),
             |rn AS (
             |  SELECT day, xq, CAST(isodow(day) AS BIGINT) AS weekday,
             |    CAST(row_number() OVER (ORDER BY day) AS BIGINT) AS rn
             |  FROM ser),
             |ws AS (
             |  SELECT day, xq, weekday,
             |    CAST(SUM(xq) OVER (ORDER BY rn ROWS BETWEEN 3 PRECEDING
             |      AND 3 FOLLOWING) AS BIGINT) AS s7,
             |    CAST(COUNT(*) OVER (ORDER BY rn ROWS BETWEEN 3 PRECEDING
             |      AND 3 FOLLOWING) AS BIGINT) AS c7
             |  FROM rn),
             |tr AS (
             |  SELECT day, xq, weekday,
             |    CASE WHEN c7 = 7
             |      THEN ${QueryFixtures.fdivSql("s7", "7")} END AS trend_q
             |  FROM ws),
             |sw AS (
             |  SELECT weekday,
             |    ${QueryFixtures.fdivSql("SUM(xq - trend_q)", "COUNT(*)")}
             |      AS seasonal_q
             |  FROM tr WHERE trend_q IS NOT NULL GROUP BY 1)
             |SELECT t.day, t.xq, t.weekday, t.trend_q, s.seasonal_q,
             |  t.xq - t.trend_q - s.seasonal_q AS resid_q
             |FROM tr t LEFT JOIN sw s USING (weekday)
             |ORDER BY t.day""".stripMargin)),

    // ----- q181: two-sided CUSUM changepoint detection over the
    // daily revenue series (operators.Cusum) — the SPC drift alarm:
    // μ/slack/threshold are exact fdiv scalars of the in-sample
    // mean; the max(0,·) recurrence replays as a recursive CTE
    // (GREATEST ≡ math.max on BIGINTs).
    QueryDef(
      "q181_cusum",
      (s, d) => {
        import s.implicits._
        val daily = Tables.orders(s, d)
          .select(to_date($"o_orderdate").as("day"),
            floor($"o_totalprice" * 100 + lit(0.5)).cast("long").as("cents"))
          .groupBy($"day").agg(sum($"cents").as("xq"))
        graft.operators.Cusum.detect(daily, "day", "xq")
      },
      Some(s"""WITH RECURSIVE ser AS (
             |  SELECT CAST(o_orderdate AS DATE) AS day,
             |    CAST(SUM(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
             |      AS BIGINT) AS xq
             |  FROM orders GROUP BY 1),
             |rn AS MATERIALIZED (
             |  SELECT day, xq,
             |    CAST(row_number() OVER (ORDER BY day) AS BIGINT) AS rn
             |  FROM ser),
             |pars AS (
             |  SELECT mu, ${QueryFixtures.fdivSql("mu",
                    graft.operators.Cusum.SlackDen.toString)} AS k,
             |    ${QueryFixtures.fdivSql("mu",
                    graft.operators.Cusum.ThreshDen.toString)} AS h
             |  FROM (SELECT ${QueryFixtures.fdivSql("SUM(xq)", "COUNT(*)")}
             |        AS mu FROM ser)),
             |c AS (
             |  SELECT r.day, r.xq, r.rn,
             |    GREATEST(0, r.xq - p.mu - p.k) AS su,
             |    GREATEST(0, p.mu - r.xq - p.k) AS sl
             |  FROM rn r, pars p WHERE r.rn = 1
             |  UNION ALL
             |  SELECT r.day, r.xq, r.rn,
             |    GREATEST(0, c.su + r.xq - p.mu - p.k),
             |    GREATEST(0, c.sl + p.mu - r.xq - p.k)
             |  FROM c JOIN rn r ON r.rn = c.rn + 1, pars p)
             |SELECT c.day, c.xq, c.su, c.sl,
             |  (c.su > p.h OR c.sl > p.h) AS alarm
             |FROM c, pars p ORDER BY c.day""".stripMargin)),

    // ----- q196: Hodges–Lehmann robust location of purchase values —
    // the median of Walsh averages (x_i + x_j)/2 over i ≤ j pairs on
    // a hash-capped 1000-row sample: the rank-based location
    // estimator paired with q195's slope. Walsh averages of integer
    // cents are EXACT doubles (halves are dyadic); the median is the
    // q195 exact rank selection.
    QueryDef(
      "q196_hodges_lehmann",
      (s, d) => {
        import s.implicits._
        val base = Tables.events(s, d)
          .filter($"event_type" === "purchase")
          .select($"event_id".as("rk"),
            floor($"value" * 100 + lit(0.5)).cast("long").as("x"))
        val sample = base
          .withColumn("hf", Sampling.hashFraction($"rk", 196L))
          .orderBy($"hf", $"rk").limit(1000)
          .select($"rk", $"x")
          .transform(graft.operators.Iterate.truncate)
        val a = sample.select($"rk".as("ra"), $"x".as("xa"))
        val b = sample.select($"rk".as("rb"), $"x".as("xb"))
        val walsh = a.join(broadcast(b), $"ra" <= $"rb")
          .select($"ra", $"rb",
            (($"xa" + $"xb").cast("double") / 2.0).as("w"))
        val m = walsh.count()
        val medRank = graft.operators.LogReg.fdiv(m + 1L, 2L)
        graft.operators.GlobalOrder
          .zipRank(walsh.sort($"w", $"ra", $"rb"), "i")
          .filter($"i" === medRank)
          .select(lit(m).as("n_pairs"),
            floor($"w" * 1000 + lit(0.5)).cast("long").as("hl_milli"))
      },
      Some(s"""WITH base AS (
             |  SELECT event_id AS rk,
             |    CAST(floor(value * 100 + 0.5) AS BIGINT) AS x
             |  FROM events WHERE event_type = 'purchase'),
             |sample AS MATERIALIZED (
             |  SELECT rk, x FROM (
             |    SELECT rk, x, ${Sampling.hashFractionSql("rk", 196L)} AS hf
             |    FROM base)
             |  ORDER BY hf, rk LIMIT 1000),
             |walsh AS MATERIALIZED (
             |  SELECT a.rk AS ra, b.rk AS rb,
             |    CAST(a.x + b.x AS DOUBLE) / 2.0 AS w
             |  FROM sample a JOIN sample b ON a.rk <= b.rk),
             |mm AS (SELECT CAST(COUNT(*) AS BIGINT) AS m FROM walsh),
             |rk AS (
             |  SELECT w,
             |    CAST(row_number() OVER (ORDER BY w, ra, rb) AS BIGINT) AS i
             |  FROM walsh)
             |SELECT mm.m AS n_pairs,
             |  CAST(floor(rk.w * 1000 + 0.5) AS BIGINT) AS hl_milli
             |FROM rk, mm
             |WHERE rk.i = CAST(floor(CAST(mm.m + 1 AS DOUBLE) / 2.0) AS BIGINT)""".stripMargin)),

    // ----- q195: Theil–Sen robust slope (price per unit quantity) —
    // the median of pairwise slopes, outlier-robust where OLS is
    // not, on the q189 hash-capped 1000-row sample (pair count
    // bounded by design). Each slope is ONE exact-input IEEE
    // division; the median is an exact rank selection over the
    // (slope, ra, rb)-ordered pair frame via the two-pass zipRank —
    // no global window, no driver materialization.
    QueryDef(
      "q195_theil_sen",
      (s, d) => {
        import s.implicits._
        val base = Tables.lineitem(s, d).select(
          ($"l_orderkey" * 8 + $"l_linenumber").as("rk"),
          floor($"l_quantity" * 100 + lit(0.5)).cast("long").as("x"),
          floor($"l_extendedprice" * 100 + lit(0.5)).cast("long").as("y"))
        val sample = base
          .withColumn("hf", Sampling.hashFraction($"rk", 195L))
          .orderBy($"hf", $"rk").limit(1000)
          .select($"rk", $"x", $"y")
          .transform(graft.operators.Iterate.truncate)
        val a = sample.select($"rk".as("ra"), $"x".as("xa"), $"y".as("ya"))
        val b = sample.select($"rk".as("rb"), $"x".as("xb"), $"y".as("yb"))
        val slopes = a.join(broadcast(b), $"ra" < $"rb" && $"xa" =!= $"xb")
          .select($"ra", $"rb",
            (($"yb" - $"ya").cast("double") / ($"xb" - $"xa").cast("double"))
              .as("slope"))
        val m = slopes.count()
        val medRank = graft.operators.LogReg.fdiv(m + 1L, 2L)
        graft.operators.GlobalOrder
          .zipRank(slopes.sort($"slope", $"ra", $"rb"), "i")
          .filter($"i" === medRank)
          .select(lit(m).as("n_pairs"),
            floor($"slope" * 1000000 + lit(0.5)).cast("long")
              .as("slope_micro"))
      },
      Some(s"""WITH base AS (
             |  SELECT l_orderkey * 8 + l_linenumber AS rk,
             |    CAST(floor(l_quantity * 100 + 0.5) AS BIGINT) AS x,
             |    CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS y
             |  FROM lineitem),
             |sample AS MATERIALIZED (
             |  SELECT rk, x, y FROM (
             |    SELECT rk, x, y, ${Sampling.hashFractionSql("rk", 195L)} AS hf
             |    FROM base)
             |  ORDER BY hf, rk LIMIT 1000),
             |slopes AS MATERIALIZED (
             |  SELECT a.rk AS ra, b.rk AS rb,
             |    CAST(b.y - a.y AS DOUBLE) / CAST(b.x - a.x AS DOUBLE) AS slope
             |  FROM sample a JOIN sample b ON a.rk < b.rk AND a.x <> b.x),
             |mm AS (SELECT CAST(COUNT(*) AS BIGINT) AS m FROM slopes),
             |rk AS (
             |  SELECT slope,
             |    CAST(row_number() OVER (ORDER BY slope, ra, rb) AS BIGINT) AS i
             |  FROM slopes)
             |SELECT mm.m AS n_pairs,
             |  CAST(floor(rk.slope * 1000000 + 0.5) AS BIGINT) AS slope_micro
             |FROM rk, mm
             |WHERE rk.i = CAST(floor(CAST(mm.m + 1 AS DOUBLE) / 2.0) AS BIGINT)""".stripMargin)),

    // ----- q194: multiple linear regression by normal equations —
    // price ~ quantity + discount with intercept, solved in CLOSED
    // FORM (Cramer's rule on the 3×3 moment matrix; no iteration):
    // one exact 10-moment pass, then determinants whose formula
    // shape is generated ONCE (det3/det3Sql) for both engines, so
    // coefficients and R² match micro-for-micro. The q102 per-group
    // simple regression's multivariate big sibling.
    QueryDef(
      "q194_multiple_regression",
      (s, d) => {
        import s.implicits._
        val q = Tables.lineitem(s, d).select(
          floor($"l_quantity" * 100 + lit(0.5)).cast("long").as("x1"),
          floor($"l_discount" * 100 + lit(0.5)).cast("long").as("x2"),
          floor($"l_extendedprice" * 100 + lit(0.5)).cast("long").as("y"))
        val names = Seq("s1", "s2", "sy", "s11", "s12", "s22", "s1y", "s2y", "syy")
        val exprs = Seq(
          sum($"x1".cast("decimal(38,0)")), sum($"x2".cast("decimal(38,0)")),
          sum($"y".cast("decimal(38,0)")),
          sum(($"x1" * $"x1").cast("decimal(38,0)")),
          sum(($"x1" * $"x2").cast("decimal(38,0)")),
          sum(($"x2" * $"x2").cast("decimal(38,0)")),
          sum(($"x1" * $"y").cast("decimal(38,0)")),
          sum(($"x2" * $"y").cast("decimal(38,0)")),
          sum(($"y" * $"y").cast("decimal(38,0)")))
        val row = q.agg(count(lit(1)).as("n"),
          exprs.zip(names).map { case (e, nm) => e.as(nm) }: _*).head()
        val nd = row.getAs[Long]("n").toDouble
        def v(nm: String) = row.getAs[java.math.BigDecimal](nm).doubleValue
        val mM = Seq(
          Seq(nd, v("s1"), v("s2")),
          Seq(v("s1"), v("s11"), v("s12")),
          Seq(v("s2"), v("s12"), v("s22")))
        val b = Seq(v("sy"), v("s1y"), v("s2y"))
        def replaced(c: Int) = mM.zipWithIndex.map { case (r, i) =>
          r.updated(c, b(i))
        }
        val dm = det3(mM)
        val beta = (0 to 2).map(c => det3(replaced(c)) / dm)
        val sse = v("syy") - (beta(0) * v("sy") + beta(1) * v("s1y")
          + beta(2) * v("s2y"))
        val sst = v("syy") - v("sy") * v("sy") / nd
        val r2 = 1.0 - sse / sst
        Seq((row.getAs[Long]("n"),
          math.floor(beta(0) * 1000000 + 0.5).toLong,
          math.floor(beta(1) * 1000000 + 0.5).toLong,
          math.floor(beta(2) * 1000000 + 0.5).toLong,
          math.floor(r2 * 1000000 + 0.5).toLong))
          .toDF("n", "b0_micro", "b1_micro", "b2_micro", "r2_micro")
      },
      Some(mlrOracle)),

    // ----- q193: McNemar's paired test — did per-user purchase
    // behavior CHANGE between the first and second half of the
    // observation window? The paired-design member the two-sample
    // family lacks: the 2×2 (H1, H2) table over the SAME users,
    // (the "high-value purchase" event, rare enough that discordant
    // users exist) — χ² = (b−c)²/(b+c) on the discordant cells:
    // exact integers,
    // one final micro-snapped division. The midpoint is the exact
    // fdiv of the epoch-micro span, derived identically both sides.
    QueryDef(
      "q193_mcnemar",
      (s, d) => {
        import s.implicits._
        val ev = Tables.events(s, d)
          .select($"user_id", unix_micros($"ts").as("us"),
            ($"event_type" === "purchase" && $"value" > 300).as("p"))
          .transform(graft.operators.Iterate.truncate)
        val mm = ev.agg(min($"us").as("mn"), max($"us").as("mx")).head()
        val mid = graft.operators.LogReg.fdiv(mm.getLong(0) + mm.getLong(1), 2L)
        val perUser = ev.groupBy($"user_id").agg(
          max(when($"p" && $"us" < mid, 1L).otherwise(0L)).as("h1"),
          max(when($"p" && $"us" >= mid, 1L).otherwise(0L)).as("h2"))
        val cells = perUser.agg(
          count(lit(1)).as("n_users"),
          sum(when($"h1" === 1L && $"h2" === 1L, 1L).otherwise(0L)).as("n11"),
          sum(when($"h1" === 1L && $"h2" === 0L, 1L).otherwise(0L)).as("n10"),
          sum(when($"h1" === 0L && $"h2" === 1L, 1L).otherwise(0L)).as("n01"),
          sum(when($"h1" === 0L && $"h2" === 0L, 1L).otherwise(0L)).as("n00"))
        // degenerate-corpus guard (seen at sf0.001: zero discordant
        // pairs make the denominator 0) — NULL chi2, mirrored
        cells.select($"n_users", $"n11", $"n10", $"n01", $"n00",
          when($"n10" + $"n01" === 0L, lit(null).cast("long"))
            .otherwise(floor(($"n10" - $"n01").cast("double")
              * ($"n10" - $"n01").cast("double")
              / ($"n10" + $"n01").cast("double") * 1000000 + lit(0.5))
              .cast("long")).as("chi2_micro"))
      },
      Some("""WITH ev AS (
             |  SELECT user_id, epoch_us(ts) AS us,
             |    (event_type = 'purchase' AND value > 300) AS p
             |  FROM events),
             |mm AS (
             |  SELECT CAST(floor(CAST(MIN(us) + MAX(us) AS DOUBLE) / 2.0)
             |    AS BIGINT) AS mid
             |  FROM ev),
             |pu AS (
             |  SELECT e.user_id,
             |    MAX(CASE WHEN e.p AND e.us < m.mid THEN 1 ELSE 0 END) AS h1,
             |    MAX(CASE WHEN e.p AND e.us >= m.mid THEN 1 ELSE 0 END) AS h2
             |  FROM ev e CROSS JOIN mm m
             |  GROUP BY 1),
             |cells AS (
             |  SELECT CAST(COUNT(*) AS BIGINT) AS n_users,
             |    CAST(SUM(CASE WHEN h1 = 1 AND h2 = 1 THEN 1 ELSE 0 END)
             |      AS BIGINT) AS n11,
             |    CAST(SUM(CASE WHEN h1 = 1 AND h2 = 0 THEN 1 ELSE 0 END)
             |      AS BIGINT) AS n10,
             |    CAST(SUM(CASE WHEN h1 = 0 AND h2 = 1 THEN 1 ELSE 0 END)
             |      AS BIGINT) AS n01,
             |    CAST(SUM(CASE WHEN h1 = 0 AND h2 = 0 THEN 1 ELSE 0 END)
             |      AS BIGINT) AS n00
             |  FROM pu)
             |SELECT n_users, n11, n10, n01, n00,
             |  CASE WHEN n10 + n01 = 0 THEN NULL
             |    ELSE CAST(floor(
             |      CAST(n10 - n01 AS DOUBLE) * CAST(n10 - n01 AS DOUBLE)
             |      / CAST(n10 + n01 AS DOUBLE) * 1000000 + 0.5) AS BIGINT)
             |  END AS chi2_micro
             |FROM cells""".stripMargin)),

    // ----- q192: Cramér's V for returnflag × linestatus — the
    // categorical-association effect size: exact integer contingency
    // cells, expected counts as exact fdiv micro-units, each χ² term
    // r4-snapped BEFORE the exact total (the q177 discipline), and
    // V = √(χ²/(N·(min(r,c)−1))) with the dimension term derived
    // from the data in both engines.
    QueryDef(
      "q192_cramers_v",
      (s, d) => {
        import s.implicits._
        val cells = Tables.lineitem(s, d)
          .groupBy($"l_returnflag", $"l_linestatus")
          .agg(count(lit(1)).as("o"))
          .transform(graft.operators.Iterate.truncate) // margins + terms read it
        val rowT = cells.groupBy($"l_returnflag").agg(sum($"o").as("rt"))
        val colT = cells.groupBy($"l_linestatus").agg(sum($"o").as("ct"))
        val nn = cells.agg(sum($"o").as("n"),
          count_distinct($"l_returnflag").as("nr"),
          count_distinct($"l_linestatus").as("nc"))
        def d2(c: org.apache.spark.sql.Column) = c.cast("double")
        val terms = cells.join(rowT, "l_returnflag").join(colT, "l_linestatus")
          .crossJoin(broadcast(nn))
          .select($"l_returnflag", $"l_linestatus", $"o",
            floor(d2($"rt" * $"ct") * 1000000.0 / d2($"n")).cast("long")
              .as("expected_micro"),
            $"n", $"nr", $"nc")
          .withColumn("term_q",
            floor((d2($"o" * 1000000L - $"expected_micro")
              * d2($"o" * 1000000L - $"expected_micro"))
              / d2($"expected_micro") / 1000000.0 * 10000 + lit(0.5))
              .cast("long"))
        val tot = terms.agg(sum($"term_q").as("chi2_q"))
        terms.crossJoin(broadcast(tot))
          .select($"l_returnflag", $"l_linestatus", $"o", $"expected_micro",
            $"term_q", $"chi2_q",
            floor(sqrt(d2($"chi2_q") / 10000.0 / d2($"n")
              / d2(least($"nr", $"nc") - 1L)) * 1000000 + lit(0.5))
              .cast("long").as("v_micro"))
          .orderBy($"l_returnflag", $"l_linestatus")
      },
      Some("""WITH cells AS (
             |  SELECT l_returnflag, l_linestatus,
             |    CAST(count(*) AS BIGINT) AS o
             |  FROM lineitem GROUP BY 1, 2),
             |rt AS (SELECT l_returnflag, CAST(SUM(o) AS BIGINT) AS rt
             |       FROM cells GROUP BY 1),
             |ct AS (SELECT l_linestatus, CAST(SUM(o) AS BIGINT) AS ct
             |       FROM cells GROUP BY 1),
             |nn AS (SELECT CAST(SUM(o) AS BIGINT) AS n,
             |    CAST(COUNT(DISTINCT l_returnflag) AS BIGINT) AS nr,
             |    CAST(COUNT(DISTINCT l_linestatus) AS BIGINT) AS nc
             |  FROM cells),
             |terms AS (
             |  SELECT c.l_returnflag, c.l_linestatus, c.o,
             |    CAST(floor(CAST(r.rt * ct.ct AS DOUBLE) * 1000000.0
             |      / CAST(nn.n AS DOUBLE)) AS BIGINT) AS expected_micro,
             |    nn.n, nn.nr, nn.nc
             |  FROM cells c
             |  JOIN rt r ON c.l_returnflag = r.l_returnflag
             |  JOIN ct ON c.l_linestatus = ct.l_linestatus
             |  CROSS JOIN nn),
             |tq AS (
             |  SELECT l_returnflag, l_linestatus, o, expected_micro, n, nr, nc,
             |    CAST(floor(
             |      CAST(o * 1000000 - expected_micro AS DOUBLE)
             |      * CAST(o * 1000000 - expected_micro AS DOUBLE)
             |      / CAST(expected_micro AS DOUBLE) / 1000000.0
             |      * 10000 + 0.5) AS BIGINT) AS term_q
             |  FROM terms),
             |tot AS (SELECT CAST(SUM(term_q) AS BIGINT) AS chi2_q FROM tq)
             |SELECT t.l_returnflag, t.l_linestatus, t.o, t.expected_micro,
             |  t.term_q, s.chi2_q,
             |  CAST(floor(sqrt(CAST(s.chi2_q AS DOUBLE) / 10000.0
             |    / CAST(t.n AS DOUBLE)
             |    / CAST(LEAST(t.nr, t.nc) - 1 AS DOUBLE)) * 1000000 + 0.5)
             |    AS BIGINT) AS v_micro
             |FROM tq t, tot s
             |ORDER BY t.l_returnflag, t.l_linestatus""".stripMargin)),

    // ----- q191: Wald–Wolfowitz runs test on the daily revenue
    // sequence — is the above/below-median pattern serially random?
    // The median is the exact lower-median by rank selection
    // (zipRank, no global window), the runs count comes from an
    // rn/rn+1 self-join sign comparison (the q168 pairing trick),
    // and E[R]/Var[R] are exact-rational chains ending in one sqrt.
    QueryDef(
      "q191_runs_test",
      (s, d) => {
        import s.implicits._
        val daily = Tables.orders(s, d)
          .select(to_date($"o_orderdate").as("day"),
            floor($"o_totalprice" * 100 + lit(0.5)).cast("long").as("cents"))
          .groupBy($"day").agg(sum($"cents").as("xq"))
          .transform(graft.operators.Iterate.truncate) // median leg + runs leg share it
        val n = daily.count()
        val med = graft.operators.GlobalOrder
          .zipRank(daily.sort($"xq".asc, $"day".asc), "vr")
          .filter($"vr" === graft.operators.LogReg.fdiv(n + 1L, 2L))
          .select($"xq").head.getLong(0)
        val byDay = graft.operators.GlobalOrder
          .zipRank(daily.sort($"day"), "rn")
          .select($"rn", ($"xq" > med).as("hi"))
          .transform(graft.operators.Iterate.truncate)
        val counts = byDay.agg(
          sum(when($"hi", 1L).otherwise(0L)).as("n1"),
          sum(when(!$"hi", 1L).otherwise(0L)).as("n2"))
        val changes = byDay.select($"rn", $"hi")
          .join(byDay.select(($"rn" - 1L).as("rn"), $"hi".as("hi_prev")), "rn")
          .agg(sum(when($"hi" =!= $"hi_prev", 1L).otherwise(0L)).as("ch"))
        def d2(c: org.apache.spark.sql.Column) = c.cast("double")
        counts.crossJoin(changes)
          .select(lit(n).as("n"), $"n1", $"n2", lit(med).as("median_cents"),
            ($"ch" + 1L).as("runs"),
            floor((d2($"ch" + 1L)
              - (lit(2.0) * d2($"n1") * d2($"n2") / lit(n.toDouble) + lit(1.0)))
              / sqrt(lit(2.0) * d2($"n1") * d2($"n2")
                * (lit(2.0) * d2($"n1") * d2($"n2") - lit(n.toDouble))
                / (lit(n.toDouble) * lit(n.toDouble) * (lit(n.toDouble) - 1.0)))
              * 1000000 + lit(0.5)).cast("long").as("z_micro"))
      },
      Some("""WITH ser AS (
             |  SELECT CAST(o_orderdate AS DATE) AS day,
             |    CAST(SUM(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
             |      AS BIGINT) AS xq
             |  FROM orders GROUP BY 1),
             |nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM ser),
             |med AS (
             |  SELECT xq AS m FROM (
             |    SELECT xq, row_number() OVER (ORDER BY xq, day) AS vr FROM ser),
             |    nn
             |  WHERE vr = CAST(floor(CAST(nn.n + 1 AS DOUBLE) / 2.0) AS BIGINT)),
             |byday AS MATERIALIZED (
             |  SELECT CAST(row_number() OVER (ORDER BY day) AS BIGINT) AS rn,
             |    (xq > (SELECT m FROM med)) AS hi
             |  FROM ser),
             |cnt AS (
             |  SELECT CAST(SUM(CASE WHEN hi THEN 1 ELSE 0 END) AS BIGINT) AS n1,
             |    CAST(SUM(CASE WHEN NOT hi THEN 1 ELSE 0 END) AS BIGINT) AS n2
             |  FROM byday),
             |ch AS (
             |  SELECT CAST(SUM(CASE WHEN a.hi <> b.hi THEN 1 ELSE 0 END)
             |    AS BIGINT) AS ch
             |  FROM byday a JOIN byday b ON a.rn = b.rn + 1)
             |SELECT nn.n, cnt.n1, cnt.n2, (SELECT m FROM med) AS median_cents,
             |  ch.ch + 1 AS runs,
             |  CAST(floor(
             |    (CAST(ch.ch + 1 AS DOUBLE)
             |     - (2.0 * CAST(cnt.n1 AS DOUBLE) * CAST(cnt.n2 AS DOUBLE)
             |        / CAST(nn.n AS DOUBLE) + 1.0))
             |    / sqrt(2.0 * CAST(cnt.n1 AS DOUBLE) * CAST(cnt.n2 AS DOUBLE)
             |        * (2.0 * CAST(cnt.n1 AS DOUBLE) * CAST(cnt.n2 AS DOUBLE)
             |           - CAST(nn.n AS DOUBLE))
             |        / (CAST(nn.n AS DOUBLE) * CAST(nn.n AS DOUBLE)
             |           * (CAST(nn.n AS DOUBLE) - 1.0)))
             |    * 1000000 + 0.5) AS BIGINT) AS z_micro
             |FROM nn, med, cnt, ch""".stripMargin)),

    // ----- q190: partial correlations among (quantity, price,
    // discount) — "is the qty↔price link real or discount-driven":
    // ONE 9-moment pass (the q170 single-scan discipline), pairwise
    // r finished driver-side with the identical IEEE ops, then
    // r_xy·z = (r_xy − r_xz·r_yz)/√((1−r_xz²)(1−r_yz²)) per
    // controlled pair, micro-snapped; the oracle mirrors the exact
    // same chains.
    QueryDef(
      "q190_partial_correlation",
      (s, d) => {
        import s.implicits._
        val cols = Seq("l_quantity", "l_extendedprice", "l_discount")
        val q = Tables.lineitem(s, d).select(cols.zipWithIndex.map {
          case (c, i) => floor(col(c) * 100 + lit(0.5)).cast("long").as(s"x$i")
        }: _*)
        val aggs = cols.indices.map(i =>
          sum(col(s"x$i").cast("decimal(38,0)")).as(s"s$i")) ++
          (for { i <- cols.indices; j <- cols.indices if i <= j }
            yield sum((col(s"x$i") * col(s"x$j")).cast("decimal(38,0)"))
              .as(s"s$i$j")) :+ count(lit(1)).as("n")
        val row = q.agg(aggs.head, aggs.tail: _*).head()
        val nd = row.getAs[Long]("n").toDouble
        def sd(nm: String) = row.getAs[java.math.BigDecimal](nm).doubleValue
        def r(i: Int, j: Int): Double = {
          val (a, b) = (math.min(i, j), math.max(i, j))
          (nd * sd(s"s$a$b") - sd(s"s$a") * sd(s"s$b")) /
            (math.sqrt(nd * sd(s"s$a$a") - sd(s"s$a") * sd(s"s$a")) *
              math.sqrt(nd * sd(s"s$b$b") - sd(s"s$b") * sd(s"s$b")))
        }
        val arms = for { i <- cols.indices; j <- cols.indices if i < j }
          yield {
            val z = (cols.indices.toSet - i - j).head
            val pr = (r(i, j) - r(i, z) * r(j, z)) /
              math.sqrt((1.0 - r(i, z) * r(i, z)) * (1.0 - r(j, z) * r(j, z)))
            (cols(i), cols(j), cols(z),
              math.floor(r(i, j) * 1000000 + 0.5).toLong,
              math.floor(pr * 1000000 + 0.5).toLong)
          }
        arms.toSeq.toDF("col_a", "col_b", "controlling", "r_micro", "pr_micro")
          .orderBy($"col_a", $"col_b")
      },
      Some(partialCorrOracle)),

    // ----- q189: Kendall's τ-b between quantity and price on a
    // hash-capped sample — the O(n²) concordance statistic made
    // scale-safe: the 2000-row sample is selected by portable-hash
    // order (deterministic at ANY scale factor, so the pair count is
    // bounded by design, not by luck). Concordant/discordant/tie
    // counts are exact BIGINTs from one a<b pair join; τ-b finishes
    // with two exact sqrts, micro-snapped.
    QueryDef(
      "q189_kendall_tau",
      (s, d) => {
        import s.implicits._
        val base = Tables.lineitem(s, d).select(
          ($"l_orderkey" * 8 + $"l_linenumber").as("rk"),
          floor($"l_quantity" * 100 + lit(0.5)).cast("long").as("x"),
          floor($"l_extendedprice" * 100 + lit(0.5)).cast("long").as("y"))
        val sample = base
          .withColumn("hf", Sampling.hashFraction($"rk", 189L))
          .orderBy($"hf", $"rk").limit(2000)
          .select($"rk", $"x", $"y")
          .transform(graft.operators.Iterate.truncate)
        val a = sample.select($"rk".as("ra"), $"x".as("xa"), $"y".as("ya"))
        val b = sample.select($"rk".as("rb"), $"x".as("xb"), $"y".as("yb"))
        val pairs = a.join(broadcast(b), $"ra" < $"rb")
        val agg = pairs.agg(
          sum(when(($"xa" - $"xb") * ($"ya" - $"yb") > 0, 1L).otherwise(0L))
            .as("c"),
          sum(when(($"xa" - $"xb") * ($"ya" - $"yb") < 0, 1L).otherwise(0L))
            .as("dd"),
          sum(when($"xa" === $"xb" && $"ya" =!= $"yb", 1L).otherwise(0L))
            .as("tx"),
          sum(when($"ya" === $"yb" && $"xa" =!= $"xb", 1L).otherwise(0L))
            .as("ty"),
          sum(when($"xa" === $"xb" && $"ya" === $"yb", 1L).otherwise(0L))
            .as("txy"),
          count(lit(1)).as("n0"))
        def d2(c: org.apache.spark.sql.Column) = c.cast("double")
        agg.select($"n0", $"c", $"dd", $"tx", $"ty", $"txy",
          floor((d2($"c") - d2($"dd"))
            / (sqrt(d2($"n0") - (d2($"tx") + d2($"txy")))
              * sqrt(d2($"n0") - (d2($"ty") + d2($"txy"))))
            * 1000000 + lit(0.5)).cast("long").as("taub_micro"))
      },
      Some(s"""WITH base AS (
             |  SELECT l_orderkey * 8 + l_linenumber AS rk,
             |    CAST(floor(l_quantity * 100 + 0.5) AS BIGINT) AS x,
             |    CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS y
             |  FROM lineitem),
             |sample AS MATERIALIZED (
             |  SELECT rk, x, y FROM (
             |    SELECT rk, x, y, ${Sampling.hashFractionSql("rk", 189L)} AS hf
             |    FROM base)
             |  ORDER BY hf, rk LIMIT 2000),
             |agg AS (
             |  SELECT
             |    CAST(SUM(CASE WHEN (a.x - b.x) * (a.y - b.y) > 0
             |      THEN 1 ELSE 0 END) AS BIGINT) AS c,
             |    CAST(SUM(CASE WHEN (a.x - b.x) * (a.y - b.y) < 0
             |      THEN 1 ELSE 0 END) AS BIGINT) AS dd,
             |    CAST(SUM(CASE WHEN a.x = b.x AND a.y <> b.y
             |      THEN 1 ELSE 0 END) AS BIGINT) AS tx,
             |    CAST(SUM(CASE WHEN a.y = b.y AND a.x <> b.x
             |      THEN 1 ELSE 0 END) AS BIGINT) AS ty,
             |    CAST(SUM(CASE WHEN a.x = b.x AND a.y = b.y
             |      THEN 1 ELSE 0 END) AS BIGINT) AS txy,
             |    CAST(COUNT(*) AS BIGINT) AS n0
             |  FROM sample a JOIN sample b ON a.rk < b.rk)
             |SELECT n0, c, dd, tx, ty, txy,
             |  CAST(floor(
             |    (CAST(c AS DOUBLE) - CAST(dd AS DOUBLE))
             |    / (sqrt(CAST(n0 AS DOUBLE)
             |        - (CAST(tx AS DOUBLE) + CAST(txy AS DOUBLE)))
             |       * sqrt(CAST(n0 AS DOUBLE)
             |          - (CAST(ty AS DOUBLE) + CAST(txy AS DOUBLE))))
             |    * 1000000 + 0.5) AS BIGINT) AS taub_micro
             |FROM agg""".stripMargin)),

    // ----- q188: Gini coefficient + Lorenz deciles of customer
    // revenue concentration — the inequality read-out behind any
    // "how concentrated is our data/revenue" dashboard. With ranks
    // from the two-pass zipRank and exact cents totals, the Gini
    // rank-sum identity G = (2·Σ i·x_(i) − (n+1)·Σx)/(n·Σx) is an
    // exact rational (one final division, micro-snapped); Lorenz
    // rows report each decile's exact cumulative revenue share.
    QueryDef(
      "q188_gini_lorenz",
      (s, d) => {
        import s.implicits._
        val rev = Tables.orders(s, d)
          .select($"o_custkey",
            floor($"o_totalprice" * 100 + lit(0.5)).cast("long").as("cents"))
          .groupBy($"o_custkey").agg(sum($"cents").as("rev"))
        val ranked = graft.operators.GlobalOrder
          .zipRank(rev.sort($"rev".asc, $"o_custkey".asc), "i")
          .transform(graft.operators.Iterate.truncate) // totals + decile rows read it
        val tot = ranked.agg(count(lit(1)).as("n"),
          sum($"rev".cast("decimal(38,0)")).as("sx"),
          sum(($"i" * $"rev").cast("decimal(38,0)")).as("six"))
        val cum = graft.operators.GlobalOrder.runningSum(
          ranked.withColumn("revd", $"rev".cast("decimal(38,0)")),
          Seq($"i".asc), "revd", "cumd")
        val deciles = cum.crossJoin(broadcast(tot))
          .filter($"i" % floor($"n".cast("double") / 10 + lit(0.5)).cast("long")
            === 0 || $"i" === $"n")
          .select(expr("i * 10 DIV n").as("decile"), $"i".as("n_below"),
            // BIGINT, not DECIMAL: total cents at sf0.1 is ~3.75e12
            // ≪ 2^63, and the driver hash is dtype-sensitive —
            // decimal128 parquet vs DuckDB DECIMAL hash-mismatch even
            // on equal values. No declared output may be DecimalType
            // (suite-pinned in PropertiesSpec).
            $"cumd".cast("long").as("cum_rev"),
            floor($"cumd".cast("double") / $"sx".cast("double") * 1000000
              + lit(0.5)).cast("long").as("share_micro"),
            floor((lit(2.0) * $"six".cast("double")
              - ($"n".cast("double") + 1.0) * $"sx".cast("double"))
              / ($"n".cast("double") * $"sx".cast("double")) * 1000000
              + lit(0.5)).cast("long").as("gini_micro"))
          .orderBy($"n_below")
        deciles
      },
      Some("""WITH rev AS (
             |  SELECT o_custkey,
             |    CAST(SUM(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
             |      AS BIGINT) AS rev
             |  FROM orders GROUP BY 1),
             |rk AS MATERIALIZED (
             |  SELECT rev,
             |    CAST(row_number() OVER (ORDER BY rev, o_custkey) AS BIGINT) AS i
             |  FROM rev),
             |tot AS (
             |  SELECT CAST(COUNT(*) AS BIGINT) AS n, SUM(rev) AS sx,
             |    SUM(i * rev) AS six
             |  FROM rk),
             |cum AS (
             |  SELECT i, rev,
             |    SUM(rev) OVER (ORDER BY i ROWS BETWEEN UNBOUNDED PRECEDING
             |      AND CURRENT ROW) AS cumd
             |  FROM rk)
             |SELECT CAST(c.i * 10 // t.n AS BIGINT) AS decile,
             |  c.i AS n_below,
             |  CAST(c.cumd AS BIGINT) AS cum_rev,
             |  CAST(floor(CAST(c.cumd AS DOUBLE) / CAST(t.sx AS DOUBLE)
             |    * 1000000 + 0.5) AS BIGINT) AS share_micro,
             |  CAST(floor(
             |    (2.0 * CAST(t.six AS DOUBLE)
             |     - (CAST(t.n AS DOUBLE) + 1.0) * CAST(t.sx AS DOUBLE))
             |    / (CAST(t.n AS DOUBLE) * CAST(t.sx AS DOUBLE)) * 1000000
             |    + 0.5) AS BIGINT) AS gini_micro
             |FROM cum c, tot t
             |WHERE c.i % CAST(floor(CAST(t.n AS DOUBLE) / 10 + 0.5) AS BIGINT) = 0
             |   OR c.i = t.n
             |ORDER BY n_below""".stripMargin)),

    // ----- q204: deterministic Poisson-bootstrap confidence interval
    // for the per-flag mean — the UNCERTAINTY member of the statistics
    // family (q187 tests a difference; this one puts an interval on a
    // mean with NO distributional assumption). Poisson(1) bootstrap
    // (Chamandy et al.'s "Estimating Uncertainty for Massive Data
    // Streams" shape): replicate b reweights each row by a truncated
    // Poisson draw w ∈ {0..4} read off the three-surface hash of
    // (rowkey·B + b) against CDF thresholds computed ONCE in Scala
    // and inlined into both engines (shortest round-trip literals →
    // identical doubles) — one scan fanned ×B, no resampling shuffle,
    // fully replayable. CI = 2nd/31st order statistics of the 32
    // replicate means (a ~94% central interval), ranks over B-row
    // per-flag partitions.
    {
      val B = 32
      val Salt = 204L
      // truncated-Poisson(1) CDF: F(k) = e⁻¹·Σ_{j≤k} 1/j!
      val pcdf: Array[Double] = {
        val f = math.exp(-1.0)
        Array(f, 2.0 * f, 2.5 * f, f * (1.0 + 1.0 + 0.5 + 1.0 / 6.0))
      }
      QueryDef(
        "q204_bootstrap_ci",
        (s, d) => {
          import s.implicits._
          val li = Tables.lineitem(s, d).select(
            $"l_returnflag".as("flag"),
            ($"l_orderkey" * 16 + $"l_linenumber").cast("long").as("k"),
            floor($"l_extendedprice" * 100 + lit(0.5)).cast("long").as("c"))
          val reps = li
            .withColumn("b", explode(array((0 until B).map(lit): _*)))
            .withColumn("u", Sampling.hashFraction($"k" * B + $"b", Salt))
            .withColumn("w",
              when($"u" < pcdf(0), 0L).when($"u" < pcdf(1), 1L)
                .when($"u" < pcdf(2), 2L).when($"u" < pcdf(3), 3L)
                .otherwise(4L))
          val means = reps.groupBy($"flag", $"b")
            .agg(sum($"w" * $"c").as("swc"), sum($"w").as("sw"))
            .select($"flag", $"b",
              floor($"swc".cast("double") / $"sw".cast("double") * 100 + lit(0.5))
                .cast("long").as("rep_c2"))
          val ranked = means.withColumn("rn", row_number().over(
            Window.partitionBy($"flag").orderBy($"rep_c2", $"b")))
          val ci = ranked.groupBy($"flag").agg(
            min(when($"rn" === 2, $"rep_c2")).as("ci_lo_c2"),
            max(when($"rn" === B - 1, $"rep_c2")).as("ci_hi_c2"))
          val base = li.groupBy($"flag")
            .agg(count(lit(1)).as("n"), sum($"c").as("sc"))
            .select($"flag", $"n",
              floor($"sc".cast("double") / $"n".cast("double") * 100 + lit(0.5))
                .cast("long").as("mean_c2"))
          base.join(ci, "flag")
            .select($"flag", $"n", $"mean_c2", $"ci_lo_c2", $"ci_hi_c2")
            .orderBy($"flag")
        },
        Some {
          val u = Sampling.hashFractionSql("(k * 32 + b)", Salt)
          val (f0, f1, f2, f3) =
            (pcdf(0).toString, pcdf(1).toString, pcdf(2).toString, pcdf(3).toString)
          s"""WITH li AS (
             |  SELECT l_returnflag AS flag,
             |    CAST(l_orderkey * 16 + l_linenumber AS BIGINT) AS k,
             |    CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS c
             |  FROM lineitem),
             |reps AS (
             |  SELECT flag, c, bb.b,
             |    CASE WHEN $u < $f0 THEN 0
             |         WHEN $u < $f1 THEN 1
             |         WHEN $u < $f2 THEN 2
             |         WHEN $u < $f3 THEN 3
             |         ELSE 4 END AS w
             |  FROM li CROSS JOIN (SELECT unnest(range(0, $B)) AS b) bb),
             |means AS (
             |  SELECT flag, b,
             |    CAST(floor(CAST(SUM(w * c) AS DOUBLE)
             |      / CAST(SUM(w) AS DOUBLE) * 100 + 0.5) AS BIGINT) AS rep_c2
             |  FROM reps GROUP BY 1, 2),
             |ranked AS (
             |  SELECT flag, rep_c2,
             |    row_number() OVER (PARTITION BY flag ORDER BY rep_c2, b) AS rn
             |  FROM means),
             |ci AS (
             |  SELECT flag,
             |    MIN(CASE WHEN rn = 2 THEN rep_c2 END) AS ci_lo_c2,
             |    MAX(CASE WHEN rn = ${B - 1} THEN rep_c2 END) AS ci_hi_c2
             |  FROM ranked GROUP BY 1),
             |base AS (
             |  SELECT flag, CAST(count(*) AS BIGINT) AS n,
             |    CAST(floor(CAST(SUM(c) AS DOUBLE) / count(*) * 100 + 0.5)
             |      AS BIGINT) AS mean_c2
             |  FROM li GROUP BY 1)
             |SELECT base.flag, base.n, base.mean_c2, ci.ci_lo_c2, ci.ci_hi_c2
             |FROM base JOIN ci USING (flag)
             |ORDER BY flag""".stripMargin
        })
    },

    // ----- q187: Welch two-sample t-test on purchase values (parity
    // cohorts) — the mean-difference companion to q167 (proportions)
    // and q172 (ranks): exact centi-quantized moments in ONE
    // conditional-sum pass, then the t statistic and the
    // Welch–Satterthwaite df as fixed double chains (sqrt exact),
    // micro/milli-snapped.
    QueryDef(
      "q187_welch_ttest",
      (s, d) => {
        import s.implicits._
        val ev = Tables.events(s, d)
          .filter($"event_type" === "purchase")
          .select((col("user_id") % 2 === 0).as("a"),
            floor($"value" * 100 + lit(0.5)).cast("long").as("xq"))
        val m = ev.agg(
          sum(when($"a", 1L).otherwise(0L)).as("n1"),
          sum(when(!$"a", 1L).otherwise(0L)).as("n2"),
          sum(when($"a", $"xq").otherwise(0L).cast("decimal(38,0)")).as("s1"),
          sum(when(!$"a", $"xq").otherwise(0L).cast("decimal(38,0)")).as("s2"),
          sum(when($"a", $"xq" * $"xq").otherwise(0L).cast("decimal(38,0)"))
            .as("q1"),
          sum(when(!$"a", $"xq" * $"xq").otherwise(0L).cast("decimal(38,0)"))
            .as("q2"))
        def d2(c: org.apache.spark.sql.Column) = c.cast("double")
        val (n1, n2) = (d2($"n1"), d2($"n2"))
        val v1 = (n1 * d2($"q1") - d2($"s1") * d2($"s1")) / (n1 * (n1 - 1.0))
        val v2 = (n2 * d2($"q2") - d2($"s2") * d2($"s2")) / (n2 * (n2 - 1.0))
        val se2 = v1 / n1 + v2 / n2
        val t = (d2($"s1") / n1 - d2($"s2") / n2) / sqrt(se2)
        val df = se2 * se2 /
          (v1 / n1 * (v1 / n1) / (n1 - 1.0) + v2 / n2 * (v2 / n2) / (n2 - 1.0))
        m.select($"n1", $"n2",
          floor(t * 1000000 + lit(0.5)).cast("long").as("t_micro"),
          floor(df * 1000 + lit(0.5)).cast("long").as("df_milli"))
      },
      Some("""WITH ev AS (
             |  SELECT (user_id % 2 = 0) AS a,
             |    CAST(floor(value * 100 + 0.5) AS BIGINT) AS xq
             |  FROM events WHERE event_type = 'purchase'),
             |m AS (
             |  SELECT
             |    CAST(SUM(CASE WHEN a THEN 1 ELSE 0 END) AS BIGINT) AS n1,
             |    CAST(SUM(CASE WHEN NOT a THEN 1 ELSE 0 END) AS BIGINT) AS n2,
             |    SUM(CASE WHEN a THEN xq ELSE 0 END) AS s1,
             |    SUM(CASE WHEN NOT a THEN xq ELSE 0 END) AS s2,
             |    SUM(CASE WHEN a THEN xq * xq ELSE 0 END) AS q1,
             |    SUM(CASE WHEN NOT a THEN xq * xq ELSE 0 END) AS q2
             |  FROM ev)
             |SELECT n1, n2,
             |  CAST(floor(
             |    (CAST(s1 AS DOUBLE) / CAST(n1 AS DOUBLE)
             |     - CAST(s2 AS DOUBLE) / CAST(n2 AS DOUBLE))
             |    / sqrt(
             |      (CAST(n1 AS DOUBLE) * CAST(q1 AS DOUBLE)
             |       - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE))
             |      / (CAST(n1 AS DOUBLE) * (CAST(n1 AS DOUBLE) - 1.0))
             |      / CAST(n1 AS DOUBLE)
             |      + (CAST(n2 AS DOUBLE) * CAST(q2 AS DOUBLE)
             |         - CAST(s2 AS DOUBLE) * CAST(s2 AS DOUBLE))
             |        / (CAST(n2 AS DOUBLE) * (CAST(n2 AS DOUBLE) - 1.0))
             |        / CAST(n2 AS DOUBLE))
             |    * 1000000 + 0.5) AS BIGINT) AS t_micro,
             |  CAST(floor(
             |    ((CAST(n1 AS DOUBLE) * CAST(q1 AS DOUBLE)
             |      - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE))
             |     / (CAST(n1 AS DOUBLE) * (CAST(n1 AS DOUBLE) - 1.0))
             |     / CAST(n1 AS DOUBLE)
             |     + (CAST(n2 AS DOUBLE) * CAST(q2 AS DOUBLE)
             |        - CAST(s2 AS DOUBLE) * CAST(s2 AS DOUBLE))
             |       / (CAST(n2 AS DOUBLE) * (CAST(n2 AS DOUBLE) - 1.0))
             |       / CAST(n2 AS DOUBLE))
             |    * ((CAST(n1 AS DOUBLE) * CAST(q1 AS DOUBLE)
             |        - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE))
             |       / (CAST(n1 AS DOUBLE) * (CAST(n1 AS DOUBLE) - 1.0))
             |       / CAST(n1 AS DOUBLE)
             |       + (CAST(n2 AS DOUBLE) * CAST(q2 AS DOUBLE)
             |          - CAST(s2 AS DOUBLE) * CAST(s2 AS DOUBLE))
             |         / (CAST(n2 AS DOUBLE) * (CAST(n2 AS DOUBLE) - 1.0))
             |         / CAST(n2 AS DOUBLE))
             |    / ((CAST(n1 AS DOUBLE) * CAST(q1 AS DOUBLE)
             |        - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE))
             |       / (CAST(n1 AS DOUBLE) * (CAST(n1 AS DOUBLE) - 1.0))
             |       / CAST(n1 AS DOUBLE)
             |       * ((CAST(n1 AS DOUBLE) * CAST(q1 AS DOUBLE)
             |           - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE))
             |          / (CAST(n1 AS DOUBLE) * (CAST(n1 AS DOUBLE) - 1.0))
             |          / CAST(n1 AS DOUBLE))
             |       / (CAST(n1 AS DOUBLE) - 1.0)
             |       + (CAST(n2 AS DOUBLE) * CAST(q2 AS DOUBLE)
             |          - CAST(s2 AS DOUBLE) * CAST(s2 AS DOUBLE))
             |         / (CAST(n2 AS DOUBLE) * (CAST(n2 AS DOUBLE) - 1.0))
             |         / CAST(n2 AS DOUBLE)
             |         * ((CAST(n2 AS DOUBLE) * CAST(q2 AS DOUBLE)
             |             - CAST(s2 AS DOUBLE) * CAST(s2 AS DOUBLE))
             |            / (CAST(n2 AS DOUBLE) * (CAST(n2 AS DOUBLE) - 1.0))
             |            / CAST(n2 AS DOUBLE))
             |         / (CAST(n2 AS DOUBLE) - 1.0))
             |    * 1000 + 0.5) AS BIGINT) AS df_milli
             |FROM m""".stripMargin)),

    // ----- q186: one-way variance decomposition (η²) of order value
    // by customer nation — the ANOVA-style "how much does the group
    // explain" effect size. Group moments are exact decimal sums;
    // every per-group S²/n term is snapped to a mega-cents² BIGINT
    // BEFORE the cross-group total (the q164 pre-round discipline —
    // a float Σ over groups would be order-sensitive), so the rows
    // and the riding η² hash-match.
    QueryDef(
      "q186_variance_decomposition",
      (s, d) => {
        import s.implicits._
        val j = Tables.orders(s, d)
          .join(Tables.customer(s, d),
            $"o_custkey" === $"c_custkey")
          .select($"c_nationkey".cast("long").as("g"),
            floor($"o_totalprice" * 100 + lit(0.5)).cast("long").as("cents"))
        val grp = j.groupBy($"g").agg(
          count(lit(1)).as("n_g"),
          sum($"cents".cast("decimal(38,0)")).as("sg"),
          sum(($"cents" * $"cents").cast("decimal(38,0)")).as("s2g"))
        def d2(c: org.apache.spark.sql.Column) = c.cast("double")
        val withTq = grp.select($"g", $"n_g",
          floor(d2($"sg") / d2($"n_g") + lit(0.5)).cast("long").as("mean_q"),
          floor(d2($"sg") * d2($"sg") / d2($"n_g") / 1000000.0 + lit(0.5))
            .cast("long").as("tq"),
          $"sg", $"s2g")
        val tot = withTq.agg(sum($"n_g").as("nn"), sum($"sg").as("ss"),
          sum($"s2g").as("ss2"), sum($"tq").as("btq"))
        withTq.crossJoin(broadcast(tot))
          .select($"g", $"n_g", $"mean_q",
            floor((($"btq" - floor(d2($"ss") * d2($"ss") / d2($"nn")
                / 1000000.0 + lit(0.5))).cast("double"))
              / ((floor(d2($"ss2") / 1000000.0 + lit(0.5))
                - floor(d2($"ss") * d2($"ss") / d2($"nn") / 1000000.0
                  + lit(0.5))).cast("double"))
              * 1000000 + lit(0.5)).cast("long").as("eta2_micro"))
          .orderBy($"g")
      },
      Some("""WITH j AS (
             |  SELECT CAST(c.c_nationkey AS BIGINT) AS g,
             |    CAST(floor(o.o_totalprice * 100 + 0.5) AS BIGINT) AS cents
             |  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey),
             |grp AS (
             |  SELECT g, CAST(COUNT(*) AS BIGINT) AS n_g,
             |    SUM(cents) AS sg, SUM(cents * cents) AS s2g
             |  FROM j GROUP BY 1),
             |wt AS (
             |  SELECT g, n_g,
             |    CAST(floor(CAST(sg AS DOUBLE) / CAST(n_g AS DOUBLE) + 0.5)
             |      AS BIGINT) AS mean_q,
             |    CAST(floor(CAST(sg AS DOUBLE) * CAST(sg AS DOUBLE)
             |      / CAST(n_g AS DOUBLE) / 1000000.0 + 0.5) AS BIGINT) AS tq,
             |    sg, s2g
             |  FROM grp),
             |tot AS (
             |  SELECT CAST(SUM(n_g) AS BIGINT) AS nn, SUM(sg) AS ss,
             |    SUM(s2g) AS ss2, CAST(SUM(tq) AS BIGINT) AS btq
             |  FROM wt)
             |SELECT w.g, w.n_g, w.mean_q,
             |  CAST(floor(
             |    CAST(t.btq - CAST(floor(CAST(t.ss AS DOUBLE) * CAST(t.ss AS DOUBLE)
             |      / CAST(t.nn AS DOUBLE) / 1000000.0 + 0.5) AS BIGINT) AS DOUBLE)
             |    / CAST(CAST(floor(CAST(t.ss2 AS DOUBLE) / 1000000.0 + 0.5) AS BIGINT)
             |      - CAST(floor(CAST(t.ss AS DOUBLE) * CAST(t.ss AS DOUBLE)
             |        / CAST(t.nn AS DOUBLE) / 1000000.0 + 0.5) AS BIGINT) AS DOUBLE)
             |    * 1000000 + 0.5) AS BIGINT) AS eta2_micro
             |FROM wt w, tot t ORDER BY w.g""".stripMargin)),

    // ----- q182: lagged cross-correlation between daily revenue and
    // daily order count — "does volume lead revenue" in one frame:
    // per lag 0..7, exact decimal moments over the rn/rn+lag join
    // (ranks by the two-pass GlobalOrder.zipRank, no global window),
    // finished by the q170 double chain.
    QueryDef(
      "q182_cross_correlation",
      (s, d) => {
        import s.implicits._
        val daily = Tables.orders(s, d)
          .select(to_date($"o_orderdate").as("day"),
            floor($"o_totalprice" * 100 + lit(0.5)).cast("long").as("cents"))
          .groupBy($"day")
          .agg(sum($"cents").as("xq"), count(lit(1)).as("cnt"))
        val ranked = graft.operators.GlobalOrder
          .zipRank(daily.sort($"day"), "rn")
          .transform(graft.operators.Iterate.truncate) // both sides of the lag join read it
        val lags = s.range(0, 8).toDF("lag")
        val m = ranked.select($"rn", $"xq").crossJoin(broadcast(lags))
          .withColumn("rn2", $"rn" + $"lag")
          .join(ranked.select($"rn".as("rn2"), $"cnt"), "rn2")
          .groupBy($"lag").agg(
            count(lit(1)).as("n_pairs"),
            sum($"xq".cast("decimal(38,0)")).as("sx"),
            sum($"cnt".cast("decimal(38,0)")).as("sy"),
            sum(($"xq" * $"xq").cast("decimal(38,0)")).as("sxx"),
            sum(($"cnt" * $"cnt").cast("decimal(38,0)")).as("syy"),
            sum(($"xq" * $"cnt").cast("decimal(38,0)")).as("sxy"))
        val nd = $"n_pairs".cast("double")
        def sd(c: String) = col(c).cast("double")
        m.select($"lag", $"n_pairs",
          floor((nd * sd("sxy") - sd("sx") * sd("sy"))
            / (sqrt(nd * sd("sxx") - sd("sx") * sd("sx"))
              * sqrt(nd * sd("syy") - sd("sy") * sd("sy")))
            * 1000000 + lit(0.5)).cast("long").as("r_micro"))
          .orderBy($"lag")
      },
      Some("""WITH ser AS (
             |  SELECT CAST(o_orderdate AS DATE) AS day,
             |    CAST(SUM(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
             |      AS BIGINT) AS xq,
             |    CAST(COUNT(*) AS BIGINT) AS cnt
             |  FROM orders GROUP BY 1),
             |rn AS MATERIALIZED (
             |  SELECT xq, cnt,
             |    CAST(row_number() OVER (ORDER BY day) AS BIGINT) AS rn
             |  FROM ser),
             |lags AS (SELECT CAST(l.range AS BIGINT) AS lag FROM range(0, 8) l),
             |m AS (
             |  SELECT g.lag, CAST(COUNT(*) AS BIGINT) AS n_pairs,
             |    SUM(a.xq) AS sx, SUM(b.cnt) AS sy,
             |    SUM(a.xq * a.xq) AS sxx, SUM(b.cnt * b.cnt) AS syy,
             |    SUM(a.xq * b.cnt) AS sxy
             |  FROM rn a CROSS JOIN lags g JOIN rn b ON b.rn = a.rn + g.lag
             |  GROUP BY g.lag)
             |SELECT lag, n_pairs,
             |  CAST(floor(
             |    (CAST(n_pairs AS DOUBLE) * CAST(sxy AS DOUBLE)
             |     - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
             |    / (sqrt(CAST(n_pairs AS DOUBLE) * CAST(sxx AS DOUBLE)
             |            - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
             |       * sqrt(CAST(n_pairs AS DOUBLE) * CAST(syy AS DOUBLE)
             |              - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)))
             |    * 1000000 + 0.5) AS BIGINT) AS r_micro
             |FROM m ORDER BY lag""".stripMargin)),

    // ----- q214: delete-one-group jackknife (Quenouille/Tukey; the
    // grouped form survey-statistics uses) for the revenue-per-
    // customer RATIO — the resampling-uncertainty member next to
    // q204's bootstrap: leave each nation out, re-form the ratio,
    // and read bias and standard error off the pseudo-value spread.
    // All cross-group algebra is exact integers — per-nation cent
    // sums, floor-quantized leave-one-out thetas (cents/customer),
    // centered deviations as g·θ_i − Σθ (×g to stay integral), and
    // an exact Σdev² (headroom: |dev| < 3·10⁹ ⇒ dev² < 2^63; fixture
    // max is ~2·10⁷) — so only the final scalar divisions/sqrt are
    // IEEE doubles, identical text both engines. One orders⋈customer
    // join keyed by custkey, then nation-sized (25-row) frames.
    QueryDef(
      "q214_jackknife",
      (s, d) => {
        import s.implicits._
        val oc = Tables.orders(s, d).select($"o_custkey", $"o_totalprice")
          .join(Tables.customer(s, d)
            .select($"c_custkey", $"c_nationkey"),
            $"o_custkey" === $"c_custkey")
          .select($"c_nationkey".as("nk"),
            floor($"o_totalprice" * 100 + lit(0.5)).cast("long").as("cents"))
        val pern = oc.groupBy($"nk").agg(sum($"cents").as("cents"))
        val cust = Tables.customer(s, d)
          .groupBy($"c_nationkey".as("nk")).agg(count(lit(1)).as("nc"))
        val per = cust.join(pern, Seq("nk"), "left")
          .select($"nk", coalesce($"cents", lit(0L)).as("cents"), $"nc")
        val tot = per.agg(sum($"cents").as("t"), sum($"nc").as("c"),
          count(lit(1)).as("g"))
        val th = per.crossJoin(tot).select($"t", $"c", $"g",
          floor(($"t" - $"cents").cast("double") / ($"c" - $"nc"))
            .cast("long").as("tq"))
        val sS = th.groupBy($"t", $"c", $"g").agg(sum($"tq").as("sq"))
        val out = th.join(sS, Seq("t", "c", "g"))
          .withColumn("dev", $"g" * $"tq" - $"sq")
          .groupBy($"t", $"c", $"g", $"sq")
          .agg(sum($"dev" * $"dev").as("s2"))
        out.select(
          $"g".as("n_groups"),
          floor($"t".cast("double") / $"c" * 1000 + lit(0.5)).cast("long")
            .as("theta_hat_milli"),
          floor(($"g" - 1).cast("double")
            * ($"sq".cast("double") / $"g" - $"t".cast("double") / $"c")
            * 1000 + lit(0.5)).cast("long").as("jack_bias_milli"),
          floor(sqrt((($"g" - 1) * $"s2").cast("double")
            / ($"g" * $"g" * $"g").cast("double")) * 1000 + lit(0.5))
            .cast("long").as("jack_se_milli"))
      },
      Some("""WITH oc AS (
             |  SELECT c_nationkey AS nk,
             |    CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents
             |  FROM orders JOIN customer ON o_custkey = c_custkey),
             |pern AS (SELECT nk, CAST(SUM(cents) AS BIGINT) AS cents
             |         FROM oc GROUP BY 1),
             |cust AS (SELECT c_nationkey AS nk, CAST(count(*) AS BIGINT) AS nc
             |         FROM customer GROUP BY 1),
             |per AS (
             |  SELECT cust.nk, coalesce(pern.cents, 0) AS cents, cust.nc
             |  FROM cust LEFT JOIN pern ON cust.nk = pern.nk),
             |tot AS (SELECT CAST(SUM(cents) AS BIGINT) AS t,
             |          CAST(SUM(nc) AS BIGINT) AS c,
             |          CAST(count(*) AS BIGINT) AS g FROM per),
             |th AS (
             |  SELECT t, c, g,
             |    CAST(floor(CAST(t - cents AS DOUBLE) / (c - nc)) AS BIGINT)
             |      AS tq
             |  FROM per CROSS JOIN tot),
             |ss AS (SELECT t, c, g, CAST(SUM(tq) AS BIGINT) AS sq
             |       FROM th GROUP BY 1, 2, 3),
             |m AS (
             |  SELECT th.t, th.c, th.g, ss.sq,
             |    CAST(SUM((th.g * th.tq - ss.sq) * (th.g * th.tq - ss.sq))
             |      AS BIGINT) AS s2
             |  FROM th JOIN ss ON th.t = ss.t AND th.c = ss.c AND th.g = ss.g
             |  GROUP BY 1, 2, 3, 4)
             |SELECT g AS n_groups,
             |  CAST(floor(CAST(t AS DOUBLE) / c * 1000 + 0.5) AS BIGINT)
             |    AS theta_hat_milli,
             |  CAST(floor(CAST(g - 1 AS DOUBLE)
             |    * (CAST(sq AS DOUBLE) / g - CAST(t AS DOUBLE) / c)
             |    * 1000 + 0.5) AS BIGINT) AS jack_bias_milli,
             |  CAST(floor(sqrt(CAST((g - 1) * s2 AS DOUBLE)
             |    / CAST(g * g * g AS DOUBLE)) * 1000 + 0.5) AS BIGINT)
             |    AS jack_se_milli
             |FROM m""".stripMargin)),

    // ----- q215: ridge regression (Tikhonov/Hoerl-Kennard) in CLOSED
    // FORM — q194's normal equations with λ added to the feature
    // diagonal (the intercept unpenalized, the standard convention):
    // one exact 10-moment pass, Cramer's rule via the SAME det3 /
    // det3Sql generated formula shape, λ = 10⁹ as a literal in both
    // engines. The regularized member of the regression family —
    // shows shrinkage against q194's OLS coefficients on identical
    // moments.
    QueryDef(
      "q215_ridge_regression",
      (s, d) => {
        import s.implicits._
        val q = Tables.lineitem(s, d).select(
          floor($"l_quantity" * 100 + lit(0.5)).cast("long").as("x1"),
          floor($"l_discount" * 100 + lit(0.5)).cast("long").as("x2"),
          floor($"l_extendedprice" * 100 + lit(0.5)).cast("long").as("y"))
        val names = Seq("s1", "s2", "sy", "s11", "s12", "s22", "s1y", "s2y", "syy")
        val exprs = Seq(
          sum($"x1".cast("decimal(38,0)")), sum($"x2".cast("decimal(38,0)")),
          sum($"y".cast("decimal(38,0)")),
          sum(($"x1" * $"x1").cast("decimal(38,0)")),
          sum(($"x1" * $"x2").cast("decimal(38,0)")),
          sum(($"x2" * $"x2").cast("decimal(38,0)")),
          sum(($"x1" * $"y").cast("decimal(38,0)")),
          sum(($"x2" * $"y").cast("decimal(38,0)")),
          sum(($"y" * $"y").cast("decimal(38,0)")))
        val row = q.agg(count(lit(1)).as("n"),
          exprs.zip(names).map { case (e, nm) => e.as(nm) }: _*).head()
        val nd = row.getAs[Long]("n").toDouble
        def v(nm: String) = row.getAs[java.math.BigDecimal](nm).doubleValue
        val lam = RidgeLambda.toDouble
        val mM = Seq(
          Seq(nd, v("s1"), v("s2")),
          Seq(v("s1"), v("s11") + lam, v("s12")),
          Seq(v("s2"), v("s12"), v("s22") + lam))
        val b = Seq(v("sy"), v("s1y"), v("s2y"))
        def replaced(c: Int) = mM.zipWithIndex.map { case (r, i) =>
          r.updated(c, b(i))
        }
        val dm = det3(mM)
        val beta = (0 to 2).map(c => det3(replaced(c)) / dm)
        Seq((row.getAs[Long]("n"),
          math.floor(beta(0) * 1000000 + 0.5).toLong,
          math.floor(beta(1) * 1000000 + 0.5).toLong,
          math.floor(beta(2) * 1000000 + 0.5).toLong))
          .toDF("n", "b0_micro", "b1_micro", "b2_micro")
      },
      Some(ridgeOracle)),

    // ----- q220: Kruskal–Wallis H — "do the five event types draw
    // their values from one distribution?", the k-group member the
    // rank-test family lacked (q172's Mann–Whitney handles exactly
    // two cohorts). Doubled midranks and per-group rank sums are
    // exact integers; each group's R2²/(4n) term is floor-snapped to
    // BIGINT before the cross-group sum (order-free), and the H
    // assembly plus tie correction is one mirrored double chain.
    QueryDef(
      "q220_kruskal_wallis",
      (s, d) => {
        import s.implicits._
        val q = Tables.events(s, d).select($"event_type",
          floor($"value" * 100 + lit(0.5)).cast("long").as("v"))
        graft.operators.RankTests.kruskalWallis(q, "v", "event_type")
      },
      Some("""WITH q AS (
             |  SELECT event_type AS grp,
             |    CAST(floor(value * 100 + 0.5) AS BIGINT) AS v
             |  FROM events),
             |byv AS (SELECT v, CAST(count(*) AS BIGINT) AS cv
             |        FROM q GROUP BY 1),
             |pref AS MATERIALIZED (
             |  SELECT v,
             |    CAST(2 * (SUM(cv) OVER (ORDER BY v
             |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - cv)
             |      + cv + 1 AS BIGINT) AS r2,
             |    CAST(cv * cv * cv - cv AS BIGINT) AS tie_term
             |  FROM byv),
             |gv AS (SELECT grp, v, CAST(count(*) AS BIGINT) AS cgv
             |       FROM q GROUP BY 1, 2),
             |perg AS (
             |  SELECT grp, CAST(SUM(cgv) AS BIGINT) AS ng,
             |    CAST(SUM(cgv * p.r2) AS BIGINT) AS r2g
             |  FROM gv JOIN pref p USING (v) GROUP BY 1),
             |terms AS (
             |  SELECT ng,
             |    CAST(floor(CAST(r2g AS DOUBLE) * r2g / (4.0 * ng)) AS BIGINT)
             |      AS term
             |  FROM perg),
             |ties AS (SELECT CAST(SUM(tie_term) AS BIGINT) AS tie_sum
             |         FROM pref),
             |agg AS (SELECT CAST(SUM(ng) AS BIGINT) AS n,
             |    CAST(count(*) AS BIGINT) AS k,
             |    CAST(SUM(term) AS BIGINT) AS s
             |  FROM terms)
             |SELECT n AS n_total, k AS n_groups, tie_sum,
             |  CAST(floor((12.0 / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) + 1.0))
             |      * CAST(s AS DOUBLE) - 3.0 * (CAST(n AS DOUBLE) + 1.0))
             |    * 1000000 + 0.5) AS BIGINT) AS h_micro,
             |  CAST(floor((12.0 / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) + 1.0))
             |      * CAST(s AS DOUBLE) - 3.0 * (CAST(n AS DOUBLE) + 1.0))
             |    / (1.0 - CAST(tie_sum AS DOUBLE)
             |       / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE) * CAST(n AS DOUBLE)
             |          - CAST(n AS DOUBLE)))
             |    * 1000000 + 0.5) AS BIGINT) AS h_corr_micro
             |FROM agg CROSS JOIN ties""".stripMargin)),

    // ----- q221: Cochran–Armitage trend test — "does the return rate
    // TREND with quantity?" (binary outcome × ordinal exposure, the
    // dose-response member next to q166's unordered χ²). One
    // corpus aggregation of five exact integer moments (scores are
    // the small quantity integers, so every product stays in BIGINT);
    // the z² assembly is one mirrored double chain over those exact
    // scalars.
    QueryDef(
      "q221_cochran_armitage",
      (s, d) => {
        import s.implicits._
        val q = Tables.lineitem(s, d).select(
          floor($"l_quantity" + lit(0.5)).cast("long").as("sc"),
          when($"l_returnflag" === "R", 1L).otherwise(0L).as("y"))
        val m = q.agg(count(lit(1)).as("n"), sum($"y").as("r"),
          sum($"sc").as("ssn"), sum($"sc" * $"y").as("ssr"),
          sum($"sc" * $"sc").as("ss2n"))
        val nd = $"n".cast("double")
        val rd = $"r".cast("double")
        val dI = $"n" * $"ssr" - $"r" * $"ssn"
        m.select($"n", $"r",
          floor(dI.cast("double") * dI * $"n"
            / (rd * (nd - rd))
            / (nd * $"ss2n" - $"ssn".cast("double") * $"ssn")
            * 1000000 + lit(0.5)).cast("long").as("z2_micro"))
      },
      Some("""WITH q AS (
             |  SELECT CAST(floor(l_quantity + 0.5) AS BIGINT) AS sc,
             |    CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS y
             |  FROM lineitem),
             |m AS (
             |  SELECT CAST(COUNT(*) AS BIGINT) AS n,
             |    CAST(SUM(y) AS BIGINT) AS r,
             |    CAST(SUM(sc) AS BIGINT) AS ssn,
             |    CAST(SUM(sc * y) AS BIGINT) AS ssr,
             |    CAST(SUM(sc * sc) AS BIGINT) AS ss2n
             |  FROM q)
             |SELECT n, r,
             |  CAST(floor(CAST(n * ssr - r * ssn AS DOUBLE)
             |    * (n * ssr - r * ssn) * n
             |    / (CAST(r AS DOUBLE) * (CAST(n AS DOUBLE) - CAST(r AS DOUBLE)))
             |    / (CAST(n AS DOUBLE) * ss2n - CAST(ssn AS DOUBLE) * ssn)
             |    * 1000000 + 0.5) AS BIGINT) AS z2_micro
             |FROM m""".stripMargin)),

    // ----- q222: two-sample Cramér–von Mises (parity cohorts over
    // purchase values — q171's data) — the whole-CDF-gap companion to
    // KS's max-gap: per-value terms are the SAME exact integer
    // cross-products, floor-snapped before the support sum, so only
    // the final /N² is a live double.
    QueryDef(
      "q222_cramer_von_mises",
      (s, d) => graft.operators.RankTests.cramerVonMises(
        Tables.events(s, d).filter(col("event_type") === "purchase"),
        "value", col("user_id") % 2 === 0),
      Some("""WITH v AS (
             |  SELECT value AS v,
             |    CAST(SUM(CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END)
             |      AS BIGINT) AS c1,
             |    CAST(SUM(CASE WHEN user_id % 2 = 0 THEN 0 ELSE 1 END)
             |      AS BIGINT) AS c2
             |  FROM events WHERE event_type = 'purchase' GROUP BY 1),
             |c AS (
             |  SELECT v, c1, c2,
             |    CAST(SUM(c1) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED
             |      PRECEDING AND CURRENT ROW) AS BIGINT) AS cum1,
             |    CAST(SUM(c2) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED
             |      PRECEDING AND CURRENT ROW) AS BIGINT) AS cum2
             |  FROM v),
             |t AS (SELECT CAST(SUM(c1) AS BIGINT) AS n1,
             |        CAST(SUM(c2) AS BIGINT) AS n2 FROM v),
             |terms AS (
             |  SELECT t.n1, t.n2,
             |    CAST(floor(CAST(cum1 * t.n2 - cum2 * t.n1 AS DOUBLE)
             |      * (cum1 * t.n2 - cum2 * t.n1) * (c1 + c2)
             |      / t.n1 / t.n2) AS BIGINT) AS term
             |  FROM c CROSS JOIN t),
             |agg AS (SELECT n1, n2, CAST(SUM(term) AS BIGINT) AS s
             |        FROM terms GROUP BY 1, 2)
             |SELECT n1, n2,
             |  CAST(floor(CAST(s AS DOUBLE)
             |    / ((CAST(n1 + n2 AS DOUBLE)) * (CAST(n1 + n2 AS DOUBLE)))
             |    * 1000000 + 0.5) AS BIGINT) AS t_micro
             |FROM agg""".stripMargin)),

    // ----- q223: Theil-T and mean-log-deviation inequality indices
    // over per-part revenue — the decomposable-entropy companions to
    // q196's Gini. ONE r4-snapped ln per part (the q96/q165 libm
    // discipline: snap each log immediately, then pure BIGINT sums);
    // weighted (Theil-T) and unweighted (MLD) sums of the same
    // snapped logs, two mirrored final divisions.
    QueryDef(
      "q223_theil_index",
      (s, d) => {
        import s.implicits._
        val x = Tables.lineitem(s, d)
          .groupBy($"l_partkey")
          .agg(sum(floor($"l_extendedprice" * 100 + lit(0.5)).cast("long"))
            .as("x"))
          .filter($"x" > 0)
        val tot = x.agg(sum($"x").as("xt"), count(lit(1)).as("n"))
        val terms = x.crossJoin(tot).select($"xt", $"n",
          floor(log($"x".cast("double") * $"n" / $"xt") * 10000 + lit(0.5))
            .cast("long").as("lnq"),
          $"x")
        val agg = terms.groupBy($"xt", $"n").agg(
          sum($"x" * $"lnq").as("sw"), sum($"lnq").as("su"))
        agg.select($"n".as("n_parts"),
          floor($"sw".cast("double") / $"xt" / 10000 * 1000000 + lit(0.5))
            .cast("long").as("theil_micro"),
          floor(-$"su".cast("double") / $"n" / 10000 * 1000000 + lit(0.5))
            .cast("long").as("mld_micro"))
      },
      Some("""WITH x AS (
             |  SELECT l_partkey,
             |    CAST(SUM(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT))
             |      AS BIGINT) AS x
             |  FROM lineitem GROUP BY 1 HAVING SUM(CAST(floor(l_extendedprice
             |    * 100 + 0.5) AS BIGINT)) > 0),
             |tot AS (SELECT CAST(SUM(x) AS BIGINT) AS xt,
             |          CAST(COUNT(*) AS BIGINT) AS n FROM x),
             |terms AS (
             |  SELECT t.xt, t.n, x.x,
             |    CAST(floor(ln(CAST(x.x AS DOUBLE) * t.n / t.xt) * 10000 + 0.5)
             |      AS BIGINT) AS lnq
             |  FROM x CROSS JOIN tot t),
             |agg AS (
             |  SELECT xt, n, CAST(SUM(x * lnq) AS BIGINT) AS sw,
             |    CAST(SUM(lnq) AS BIGINT) AS su
             |  FROM terms GROUP BY 1, 2)
             |SELECT n AS n_parts,
             |  CAST(floor(CAST(sw AS DOUBLE) / xt / 10000 * 1000000 + 0.5)
             |    AS BIGINT) AS theil_micro,
             |  CAST(floor(-CAST(su AS DOUBLE) / n / 10000 * 1000000 + 0.5)
             |    AS BIGINT) AS mld_micro
             |FROM agg""".stripMargin)),

    // ----- q226: G-test (log-likelihood ratio independence) on the
    // event_type × high-value 2×5 table — χ²'s (q166) information-
    // theoretic sibling, additive across partitions of the table
    // where Pearson's χ² is not. One r4-snapped ln per non-empty cell
    // (the argument O·N/(row·col) is a single mirrored double chain),
    // then exact BIGINT weighted sums; empty cells contribute 0 by
    // the standard convention.
    QueryDef(
      "q226_g_test",
      (s, d) => {
        import s.implicits._
        val cells = Tables.events(s, d)
          .groupBy($"event_type", ($"value" >= 100).cast("long").as("hi"))
          .agg(count(lit(1)).as("o"))
        val rows_ = cells.groupBy($"event_type").agg(sum($"o").as("rowt"))
        val cols_ = cells.groupBy($"hi").agg(sum($"o").as("colt"))
        val nn = cells.agg(sum($"o").as("n"))
        val terms = cells.join(rows_, "event_type").join(cols_, "hi")
          .crossJoin(nn)
          .select($"n",
            ($"o" * floor(log($"o".cast("double") * $"n"
              / ($"rowt".cast("double") * $"colt")) * 10000 + lit(0.5))
              .cast("long")).as("t"))
        terms.groupBy($"n").agg(sum($"t").as("s"))
          .select($"n",
            floor(lit(2.0) * $"s".cast("double") / 10000 * 1000000
              + lit(0.5)).cast("long").as("g_micro"),
            lit(4L).as("df"))
      },
      Some("""WITH cells AS (
             |  SELECT event_type, CASE WHEN value >= 100 THEN 1 ELSE 0 END
             |      AS hi,
             |    CAST(count(*) AS BIGINT) AS o
             |  FROM events GROUP BY 1, 2),
             |r AS (SELECT event_type, CAST(SUM(o) AS BIGINT) AS rowt
             |      FROM cells GROUP BY 1),
             |c AS (SELECT hi, CAST(SUM(o) AS BIGINT) AS colt
             |      FROM cells GROUP BY 1),
             |nn AS (SELECT CAST(SUM(o) AS BIGINT) AS n FROM cells),
             |terms AS (
             |  SELECT nn.n,
             |    o * CAST(floor(ln(CAST(o AS DOUBLE) * nn.n
             |      / (CAST(rowt AS DOUBLE) * colt)) * 10000 + 0.5) AS BIGINT)
             |      AS t
             |  FROM cells JOIN r USING (event_type) JOIN c USING (hi)
             |  CROSS JOIN nn),
             |agg AS (SELECT n, CAST(SUM(t) AS BIGINT) AS s
             |        FROM terms GROUP BY 1)
             |SELECT n,
             |  CAST(floor(2.0 * CAST(s AS DOUBLE) / 10000 * 1000000 + 0.5)
             |    AS BIGINT) AS g_micro,
             |  CAST(4 AS BIGINT) AS df
             |FROM agg""".stripMargin)),

    // ----- q227: Mann–Kendall trend test on daily order revenue —
    // the nonparametric "is revenue trending" answer (q195's
    // Theil–Sen gives the slope; MK gives the significance). S is an
    // exact integer sign-pair sum over the DAY-level series (the
    // frame is calendar-bounded — it grows with the time span, not
    // the corpus, so the day×day pair join is a constant-size
    // computation at any corpus scale); the tie-corrected variance is
    // exact integer algebra (×18), and only the final continuity-
    // corrected z is a mirrored double chain.
    QueryDef(
      "q227_mann_kendall",
      (s, d) => {
        import s.implicits._
        val ser = Tables.orders(s, d)
          .groupBy($"o_orderdate".cast("date").as("day"))
          .agg(sum(floor($"o_totalprice" * 100 + lit(0.5)).cast("long"))
            .as("xq"))
          .transform(graft.operators.Iterate.truncate)   // three consumers: pairs×2 sides, ties
        val sPairs = ser.as("a").join(ser.as("b"), $"a.day" < $"b.day")
          .agg(coalesce(sum(
            when($"b.xq" > $"a.xq", 1L)
              .when($"b.xq" < $"a.xq", -1L).otherwise(0L)), lit(0L)).as("s"),
            count(lit(1)).as("n_pairs"))
        val nDays = ser.agg(count(lit(1)).as("n"))
        val ties = ser.groupBy($"xq").agg(count(lit(1)).as("t"))
          .agg(coalesce(sum($"t" * ($"t" - 1) * (lit(2L) * $"t" + 5)),
            lit(0L)).as("tie18"))
        val m = nDays.crossJoin(sPairs).crossJoin(ties)
          .withColumn("var18",
            $"n" * ($"n" - 1) * (lit(2L) * $"n" + 5) - $"tie18")
        val sd = sqrt($"var18".cast("double") / 18.0)
        m.select($"n", $"n_pairs", $"s", $"var18",
          floor(when($"s" > 0, ($"s" - 1).cast("double") / sd)
            .when($"s" < 0, ($"s" + 1).cast("double") / sd)
            .otherwise(lit(0.0)) * 1000000 + lit(0.5))
            .cast("long").as("z_micro"))
      },
      Some("""WITH ser AS MATERIALIZED (
             |  SELECT CAST(o_orderdate AS DATE) AS day,
             |    CAST(SUM(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
             |      AS BIGINT) AS xq
             |  FROM orders GROUP BY 1),
             |sp AS (
             |  SELECT CAST(COALESCE(SUM(CASE WHEN b.xq > a.xq THEN 1
             |      WHEN b.xq < a.xq THEN -1 ELSE 0 END), 0) AS BIGINT) AS s,
             |    CAST(COUNT(*) AS BIGINT) AS n_pairs
             |  FROM ser a JOIN ser b ON a.day < b.day),
             |nd AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM ser),
             |ties AS (
             |  SELECT CAST(COALESCE(SUM(t * (t - 1) * (2 * t + 5)), 0)
             |    AS BIGINT) AS tie18
             |  FROM (SELECT CAST(count(*) AS BIGINT) AS t
             |        FROM ser GROUP BY xq) g),
             |m AS (
             |  SELECT n, n_pairs, s,
             |    n * (n - 1) * (2 * n + 5) - tie18 AS var18
             |  FROM nd CROSS JOIN sp CROSS JOIN ties)
             |SELECT n, n_pairs, s, var18,
             |  CAST(floor((CASE
             |      WHEN s > 0 THEN CAST(s - 1 AS DOUBLE)
             |        / sqrt(CAST(var18 AS DOUBLE) / 18.0)
             |      WHEN s < 0 THEN CAST(s + 1 AS DOUBLE)
             |        / sqrt(CAST(var18 AS DOUBLE) / 18.0)
             |      ELSE 0.0 END) * 1000000 + 0.5) AS BIGINT) AS z_micro
             |FROM m""".stripMargin)),

    // ----- q235: Theil–Sen robust slope (Sen 1968) of daily revenue,
    // per YEAR — the robust companion to q227's Mann–Kendall direction
    // test (MK says "is there a monotone trend", Sen says "how steep,
    // unmoved by outlier days"). Pairwise day-slopes are snapped to
    // micro-dollars/day through one fixed double division, and the
    // median is the exact interpolated percentile INSIDE each year
    // partition — the O(n²) pair frame is capped at (days-per-year)²
    // per group (the suite's hash-capped-estimator discipline), so the
    // plan is partition-parallel and survives any corpus scale: more
    // data adds revenue per day, never more pairs.
    QueryDef(
      "q235_theil_sen",
      (s, d) => {
        import s.implicits._
        val daily = Tables.orders(s, d)
          .select(to_date($"o_orderdate").as("day"),
            floor($"o_totalprice" * 1000 + lit(0.5)).cast("long").as("vm"))
          .groupBy($"day").agg(sum($"vm").as("rev"))
          .select(year($"day").cast("long").as("yr"),
            datediff($"day", lit("1995-01-01").cast("date")).cast("long").as("di"),
            $"rev")
          .transform(graft.operators.Iterate.truncate)   // feeds the self-join twice + n_days
        val pairs = daily.as("a").join(daily.as("b"),
            $"a.yr" === $"b.yr" && $"a.di" < $"b.di")
          .select($"a.yr".as("yr"),
            floor(($"b.rev" - $"a.rev").cast("double")
              / ($"b.di" - $"a.di") * 1000.0 + lit(0.5))
              .cast("long").as("sl"))
        val med = pairs.groupBy($"yr")
          .agg(count(lit(1)).as("n_pairs"),
            percentile($"sl", lit(0.5)).as("med"))
        val nd = daily.groupBy($"yr").agg(count(lit(1)).as("n_days"))
        med.join(nd, "yr")
          .select($"yr", $"n_days", $"n_pairs",
            floor($"med" + lit(0.5)).cast("long").as("sen_slope_micro"))
          .orderBy($"yr")
      },
      Some("""WITH daily AS MATERIALIZED (
             |  SELECT CAST(year(day) AS BIGINT) AS yr,
             |    datediff('day', DATE '1995-01-01', day) AS di, rev
             |  FROM (
             |    SELECT CAST(o_orderdate AS DATE) AS day,
             |      CAST(SUM(CAST(floor(o_totalprice * 1000 + 0.5) AS BIGINT))
             |        AS BIGINT) AS rev
             |    FROM orders GROUP BY 1)),
             |pairs AS (
             |  SELECT a.yr,
             |    CAST(floor(CAST(b.rev - a.rev AS DOUBLE) / (b.di - a.di)
             |      * 1000.0 + 0.5) AS BIGINT) AS sl
             |  FROM daily a JOIN daily b ON a.yr = b.yr AND a.di < b.di),
             |med AS (
             |  SELECT yr, CAST(count(*) AS BIGINT) AS n_pairs,
             |    quantile_cont(sl, 0.5) AS med
             |  FROM pairs GROUP BY 1),
             |nd AS (SELECT yr, CAST(count(*) AS BIGINT) AS n_days
             |       FROM daily GROUP BY 1)
             |SELECT m.yr, n.n_days, m.n_pairs,
             |  CAST(floor(m.med + 0.5) AS BIGINT) AS sen_slope_micro
             |FROM med m JOIN nd n ON m.yr = n.yr
             |ORDER BY m.yr""".stripMargin)),

    // ----- q245: autocorrelation function + Ljung–Box Q of daily
    // revenue, lags 1..14 — the serial-dependence member the
    // time-series family lacks (Holt/EWMA smooth, Mann–Kendall tests
    // monotone trend; ACF answers "how long does a shock persist" and
    // LB "is there ANY autocorrelation"). Estimator: products of
    // snapped-mean-centered integer dollars (c_t = rev_t − ⌊r̄⌉, so
    // every covariance term is an exact BIGINT — headroom Σ|c·c| ≤
    // 4·10¹⁰·n), ρ_L micro-snapped from γ_L/γ_0, each lag's LB term
    // nano-snapped BEFORE the cumulative integer sum (no cross-lag
    // float accumulation). Day gaps pair naturally: the lag join is
    // on exact day index, so missing days contribute no pairs on
    // either engine.
    QueryDef(
      "q245_acf_ljung_box",
      (s, d) => {
        import s.implicits._
        val daily = Tables.orders(s, d)
          .select(to_date($"o_orderdate").as("day"),
            floor($"o_totalprice").cast("long").as("vd"))
          .groupBy($"day").agg(sum($"vd").as("rev"))
          .select(datediff($"day", lit("1995-01-01").cast("date"))
            .cast("long").as("di"), $"rev")
          .transform(graft.operators.Iterate.truncate)
        val ms = daily.agg(count(lit(1)).as("n"), sum($"rev").as("srev"))
          .select($"n",
            floor($"srev".cast("double") / $"n" + lit(0.5)).cast("long")
              .as("rbar"))
        val cent = daily.crossJoin(ms)
          .select($"di", ($"rev" - $"rbar").as("c"), $"n")
          .transform(graft.operators.Iterate.truncate)
        val g0 = cent.agg(sum($"c" * $"c").as("g0"), max($"n").as("n"))
        val lags = s.range(1, 15).toDF("lag")
        val gl = cent.as("a")
          .crossJoin(broadcast(lags))      // fan out each row × 14 lags
          .join(cent.as("b"), $"b.di" === $"a.di" + $"lag")
          .groupBy($"lag")
          .agg(sum($"a.c" * $"b.c").as("gl"), count(lit(1)).as("n_pairs"))
        val terms = gl.crossJoin(g0)
          .select($"lag", $"n_pairs",
            floor($"gl".cast("double") / $"g0" * 1000000.0 + lit(0.5))
              .cast("long").as("rho_micro"),
            floor(($"gl".cast("double") / $"g0") * ($"gl".cast("double") / $"g0")
              / ($"n" - $"lag") * 1.0e9 + lit(0.5)).cast("long").as("tnano"),
            $"n")
          .transform(graft.operators.Iterate.truncate)
        val cum = terms.as("a")
          .join(terms.as("b").select($"lag".as("blag"), $"tnano".as("btn")),
            $"blag" <= $"a.lag")
          .groupBy($"a.lag".as("lag"))
          .agg(sum($"btn").as("st"))
        terms.select($"lag", $"n_pairs", $"rho_micro", $"n")
          .join(cum, "lag")
          .select($"lag", $"n_pairs", $"rho_micro",
            floor($"n".cast("double") * ($"n" + 2) * $"st".cast("double")
              / 1000.0 + lit(0.5)).cast("long").as("lb_q_micro"))
          .orderBy($"lag")
      },
      Some("""WITH daily AS MATERIALIZED (
             |  SELECT datediff('day', DATE '1995-01-01', day) AS di, rev
             |  FROM (
             |    SELECT CAST(o_orderdate AS DATE) AS day,
             |      CAST(SUM(CAST(floor(o_totalprice) AS BIGINT)) AS BIGINT) AS rev
             |    FROM orders GROUP BY 1)),
             |ms AS (
             |  SELECT CAST(count(*) AS BIGINT) AS n,
             |    CAST(floor(CAST(SUM(rev) AS DOUBLE) / count(*) + 0.5) AS BIGINT)
             |      AS rbar
             |  FROM daily),
             |cent AS MATERIALIZED (
             |  SELECT d.di, d.rev - m.rbar AS c, m.n
             |  FROM daily d CROSS JOIN ms m),
             |g0 AS (SELECT CAST(SUM(c * c) AS BIGINT) AS g0, MAX(n) AS n
             |       FROM cent),
             |lags AS (SELECT CAST(unnest(range(1, 15)) AS BIGINT) AS lag),
             |gl AS (
             |  SELECT l.lag, CAST(SUM(a.c * b.c) AS BIGINT) AS gl,
             |    CAST(count(*) AS BIGINT) AS n_pairs
             |  FROM cent a CROSS JOIN lags l
             |  JOIN cent b ON b.di = a.di + l.lag
             |  GROUP BY 1),
             |terms AS MATERIALIZED (
             |  SELECT g.lag, g.n_pairs,
             |    CAST(floor(CAST(g.gl AS DOUBLE) / z.g0 * 1000000.0 + 0.5)
             |      AS BIGINT) AS rho_micro,
             |    CAST(floor((CAST(g.gl AS DOUBLE) / z.g0)
             |      * (CAST(g.gl AS DOUBLE) / z.g0)
             |      / (z.n - g.lag) * 1.0e9 + 0.5) AS BIGINT) AS tnano,
             |    z.n
             |  FROM gl g CROSS JOIN g0 z),
             |cum AS (
             |  SELECT a.lag, CAST(SUM(b.tnano) AS BIGINT) AS st
             |  FROM terms a JOIN terms b ON b.lag <= a.lag
             |  GROUP BY 1)
             |SELECT t.lag, t.n_pairs, t.rho_micro,
             |  CAST(floor(CAST(t.n AS DOUBLE) * (t.n + 2) * CAST(c.st AS DOUBLE)
             |    / 1000.0 + 0.5) AS BIGINT) AS lb_q_micro
             |FROM terms t JOIN cum c ON t.lag = c.lag
             |ORDER BY t.lag""".stripMargin)),

    // ----- q246: generalized ESD outlier rounds (Rosner 1983) on
    // daily revenue — the FORMAL outlier test next to the q199
    // winsorized robust stats (those CLIP extremes; this one NAMES
    // them with a test statistic): 3 unrolled remove-the-extreme
    // rounds. The argmax each round is selected by the EXACT integer
    // ordinal |n·x − Σx| (ties by day) — never by a float distance —
    // and only the reported G statistic touches doubles, one snapped
    // assembly per round. Each round's moments are exact BIGINT sums
    // over the surviving set.
    QueryDef(
      "q246_esd_outliers",
      (s, d) => {
        import s.implicits._
        var surv = Tables.orders(s, d)
          .select(to_date($"o_orderdate").as("day"),
            floor($"o_totalprice").cast("long").as("vd"))
          .groupBy($"day").agg(sum($"vd").as("rev"))
          .select(datediff($"day", lit("1995-01-01").cast("date"))
            .cast("long").as("di"), $"rev")
          .transform(graft.operators.Iterate.truncate)
        val out = (1 to 3).map { r =>
          val m = surv.agg(count(lit(1)).as("n"), sum($"rev").as("sx"),
            sum($"rev" * $"rev").as("sxx"))
          val pick = surv.crossJoin(m)
            .orderBy(abs($"n" * $"rev" - $"sx").desc, $"di")
            .limit(1)
            .select(lit(r.toLong).as("round"), $"di", $"rev", $"n",
              floor(abs(($"n" * $"rev" - $"sx").cast("double")) / $"n"
                / sqrt(($"sxx".cast("double")
                  - $"sx".cast("double") * $"sx" / $"n") / ($"n" - 1))
                * 1000000.0 + lit(0.5)).cast("long").as("g_micro"))
            .transform(graft.operators.Iterate.truncate)
          surv = surv.join(pick.select($"di"), Seq("di"), "left_anti")
            .transform(graft.operators.Iterate.truncate)
          pick
        }.reduce(_ unionAll _)
        out.orderBy($"round")
      },
      Some {
        def round(i: Int): String =
          s"""m$i AS (
             |  SELECT CAST(count(*) AS BIGINT) AS n, CAST(SUM(rev) AS BIGINT) AS sx,
             |    CAST(SUM(rev * rev) AS BIGINT) AS sxx
             |  FROM s${i - 1}),
             |pick$i AS MATERIALIZED (
             |  SELECT CAST($i AS BIGINT) AS round, s.di, s.rev, m.n,
             |    CAST(floor(ABS(CAST(m.n * s.rev - m.sx AS DOUBLE)) / m.n
             |      / sqrt((CAST(m.sxx AS DOUBLE)
             |        - CAST(m.sx AS DOUBLE) * m.sx / m.n) / (m.n - 1))
             |      * 1000000.0 + 0.5) AS BIGINT) AS g_micro
             |  FROM s${i - 1} s CROSS JOIN m$i m
             |  ORDER BY ABS(m.n * s.rev - m.sx) DESC, s.di LIMIT 1),
             |s$i AS MATERIALIZED (
             |  SELECT di, rev FROM s${i - 1}
             |  WHERE di NOT IN (SELECT di FROM pick$i))""".stripMargin
        s"""WITH s0 AS MATERIALIZED (
           |  SELECT datediff('day', DATE '1995-01-01', day) AS di, rev
           |  FROM (
           |    SELECT CAST(o_orderdate AS DATE) AS day,
           |      CAST(SUM(CAST(floor(o_totalprice) AS BIGINT)) AS BIGINT) AS rev
           |    FROM orders GROUP BY 1)),
           |${(1 to 3).map(round).mkString(",\n")}
           |SELECT round, di, rev, n, g_micro FROM (
           |  SELECT * FROM pick1 UNION ALL SELECT * FROM pick2
           |  UNION ALL SELECT * FROM pick3)
           |ORDER BY round""".stripMargin
      }),

    // ----- q248: Bradley–Terry strength ranking from pairwise
    // preferences (Hunter 2004 MM iterations) — the preference-
    // learning member (the estimator behind LLM eval leaderboards and
    // RLHF reward comparisons, exercised here on co-purchase data):
    // within each order carrying two top-12 parts, the one with the
    // larger line quantity "wins" (ties skipped); 3 MM rounds
    // π_i ← W_i / Σ_j n_ij/(π_i+π_j), every cross-opponent term
    // nano-snapped BEFORE the per-part sum (an 11-term float sum in
    // engine order is the order-sensitivity class this suite bans),
    // strengths re-normalized to Σπ = 12 each round, all states
    // micro-snapped. Oracle unrolls all three rounds.
    QueryDef(
      "q248_bradley_terry",
      (s, d) => {
        import s.implicits._
        val op = Tables.lineitem(s, d)
          .groupBy($"l_orderkey", $"l_partkey")
          .agg(floor(sum($"l_quantity")).cast("long").as("q"))
        val top12 = op.groupBy($"l_partkey")
          .agg(count(lit(1)).as("n_ord"))
          .orderBy($"n_ord".desc, $"l_partkey").limit(12)
          .select($"l_partkey".as("part"))
        val opt = op.join(broadcast(top12), $"l_partkey" === $"part")
          .select($"l_orderkey", $"part", $"q")
          .transform(graft.operators.Iterate.truncate)
        val wins = opt.as("a").join(opt.as("b"),
            $"a.l_orderkey" === $"b.l_orderkey" && $"a.part" =!= $"b.part"
              && $"a.q" > $"b.q")
          .groupBy($"a.part".as("wi"), $"b.part".as("lo"))
          .agg(count(lit(1)).as("w"))
          .transform(graft.operators.Iterate.truncate)
        // symmetric comparison counts n_ij and per-part total wins
        val nij = wins.select($"wi".as("i"), $"lo".as("j"), $"w")
          .unionAll(wins.select($"lo".as("i"), $"wi".as("j"), $"w"))
          .groupBy($"i", $"j").agg(sum($"w").as("nij"))
          .transform(graft.operators.Iterate.truncate)
        val tw = top12.select($"part".as("i"))
          .join(wins.groupBy($"wi".as("i")).agg(sum($"w").as("wi_tot")),
            Seq("i"), "left")
          .select($"i", coalesce($"wi_tot", lit(0L)).as("wins"))
          .transform(graft.operators.Iterate.truncate)
        var pi = tw.select($"i", lit(1000000L).as("pim")).transform(graft.operators.Iterate.truncate)
        for (_ <- 1 to 3) {
          val terms = nij
            .join(pi.select($"i", $"pim".as("pii")), Seq("i"))
            .join(pi.select($"i".as("j"), $"pim".as("pij")), Seq("j"))
            .groupBy($"i")
            .agg(sum(floor($"nij".cast("double") * 1000000.0
              / ($"pii" + $"pij") * 1.0e9 + lit(0.5)).cast("long")).as("st"))
          val raw = tw.join(terms, Seq("i"), "left")
            .select($"i",
              when($"st".isNull || $"st" === 0L, lit(0L))
                .otherwise(floor($"wins".cast("double") * 1.0e15
                  / $"st" + lit(0.5)).cast("long")).as("praw"))
          val tot = raw.agg(sum($"praw").as("sp"))
          // degenerate corpus guard (seen at sf0.1: the top-12 parts
          // never share an order with distinct quantities, so there
          // are no comparisons at all): with Σpraw = 0 the
          // renormalization divides by zero — fall back to the
          // uniform strength vector, mirrored in the oracle
          pi = raw.crossJoin(tot)
            .select($"i", when($"sp" === 0L, lit(1000000L))
              .otherwise(floor($"praw".cast("double") * 12000000.0 / $"sp"
                + lit(0.5)).cast("long")).as("pim"))
            .transform(graft.operators.Iterate.truncate)
        }
        tw.join(pi, "i")
          .select($"i".as("part"), $"wins", $"pim".as("pi_micro"))
          .orderBy($"pi_micro".desc, $"part")
      },
      Some {
        def round(t: Int): String =
          s"""term$t AS (
             |  SELECT n.i,
             |    CAST(SUM(CAST(floor(CAST(n.nij AS DOUBLE) * 1000000.0
             |      / (pa.pim + pb.pim) * 1.0e9 + 0.5) AS BIGINT)) AS BIGINT)
             |      AS st
             |  FROM nij n
             |  JOIN p${t - 1} pa ON pa.i = n.i
             |  JOIN p${t - 1} pb ON pb.i = n.j
             |  GROUP BY 1),
             |raw$t AS MATERIALIZED (
             |  SELECT w.i,
             |    CASE WHEN s.st IS NULL OR s.st = 0 THEN 0
             |      ELSE CAST(floor(CAST(w.wins AS DOUBLE) * 1.0e15 / s.st + 0.5)
             |        AS BIGINT) END AS praw
             |  FROM tw w LEFT JOIN term$t s ON s.i = w.i),
             |p$t AS MATERIALIZED (
             |  SELECT r.i,
             |    CASE WHEN z.sp = 0 THEN 1000000
             |      ELSE CAST(floor(CAST(r.praw AS DOUBLE) * 12000000.0 / z.sp
             |        + 0.5) AS BIGINT) END AS pim
             |  FROM raw$t r CROSS JOIN
             |    (SELECT CAST(SUM(praw) AS BIGINT) AS sp FROM raw$t) z)""".stripMargin
        s"""WITH op AS (
           |  SELECT l_orderkey, l_partkey,
           |    CAST(floor(SUM(l_quantity)) AS BIGINT) AS q
           |  FROM lineitem GROUP BY 1, 2),
           |top12 AS (
           |  SELECT l_partkey AS part FROM (
           |    SELECT l_partkey, count(*) AS n_ord FROM op GROUP BY 1)
           |  ORDER BY n_ord DESC, l_partkey LIMIT 12),
           |opt AS MATERIALIZED (
           |  SELECT o.l_orderkey, o.l_partkey AS part, o.q
           |  FROM op o JOIN top12 t ON o.l_partkey = t.part),
           |wins AS MATERIALIZED (
           |  SELECT a.part AS wi, b.part AS lo, CAST(count(*) AS BIGINT) AS w
           |  FROM opt a JOIN opt b ON a.l_orderkey = b.l_orderkey
           |   AND a.part <> b.part AND a.q > b.q
           |  GROUP BY 1, 2),
           |nij AS MATERIALIZED (
           |  SELECT i, j, CAST(SUM(w) AS BIGINT) AS nij FROM (
           |    SELECT wi AS i, lo AS j, w FROM wins
           |    UNION ALL SELECT lo, wi, w FROM wins)
           |  GROUP BY 1, 2),
           |tw AS MATERIALIZED (
           |  SELECT t.part AS i, CAST(COALESCE(g.wt, 0) AS BIGINT) AS wins
           |  FROM top12 t LEFT JOIN (
           |    SELECT wi, SUM(w) AS wt FROM wins GROUP BY 1) g
           |    ON g.wi = t.part),
           |p0 AS (SELECT i, 1000000::BIGINT AS pim FROM tw),
           |${(1 to 3).map(round).mkString(",\n")}
           |SELECT w.i AS part, w.wins, p.pim AS pi_micro
           |FROM tw w JOIN p3 p ON w.i = p.i
           |ORDER BY pi_micro DESC, part""".stripMargin
      }),

    // ----- q259: Fisher's exact test — the EXACT small-table
    // independence test the asymptotic members (q-χ², q226 G-test)
    // approximate: is a negative account balance associated with
    // nation 7? The hypergeometric tail is computed with NO gamma
    // function on either engine: ln k! is the exact BIGINT prefix sum
    // of per-integer micro-snapped ln values (GlobalOrder.runningSum
    // on the Spark side — no unpartitioned window — vs a DuckDB
    // running-sum window), each support-point probability gets ONE
    // snapped exp, and the one-sided upper tail is an exact integer
    // sum of nano-snapped terms. The 2×2 margins are driver-bounded
    // scalars (four longs — model state, the q133/q256 convention);
    // the ln-factorial table and term grid stay distributed.
    QueryDef(
      "q259_fisher_exact",
      (s, d) => {
        import s.implicits._
        val flags = Tables.customer(s, d)
          .select(($"c_nationkey" === 7).as("ga"), ($"c_acctbal" < 0).as("sc"))
        val Array(cRow) = flags.agg(count(lit(1)).as("n"),
          sum(when($"ga", 1L).otherwise(0L)).as("r1"),
          sum(when($"sc", 1L).otherwise(0L)).as("c1"),
          sum(when($"ga" && $"sc", 1L).otherwise(0L)).as("a")).collect()
        val (n, r1, c1, aObs) =
          (cRow.getLong(0), cRow.getLong(1), cRow.getLong(2), cRow.getLong(3))
        val kmin = math.max(0L, r1 + c1 - n)
        val kmax = math.min(r1, c1)
        val lnm = s.range(1, n + 1).toDF("i")
          .select($"i", floor(log($"i".cast("double")) * 1000000.0 + lit(0.5))
            .cast("long").as("lnm"))
        val lfPos = graft.operators.GlobalOrder.runningSum(
            lnm.select($"i", $"lnm".cast("decimal(38,0)").as("v")),
            Seq($"i"), "v", "cum")
          .select($"i", $"cum".cast("long").as("lf"))
        val lf = lfPos.unionAll(Seq((0L, 0L)).toDF("i", "lf"))
          .transform(graft.operators.Iterate.truncate)
        // every 1-row const frame MUST carry a broadcast hint: these
        // are filters over an RDD-backed frame (no stats), so the
        // planner would otherwise pick CartesianProduct — whose
        // PARTITION COUNTS MULTIPLY across the five chained
        // crossJoins (observed: a 287k-task stage that OOM'd the
        // DAG scheduler at sf0.1)
        def lfAt(idx: Long, name: String) =
          broadcast(lf.filter($"i" === idx).select($"lf".as(name)))
        val consts = lfAt(r1, "lfr1").crossJoin(lfAt(n - r1, "lfnr1"))
          .crossJoin(lfAt(n, "lfn")).crossJoin(lfAt(c1, "lfc1"))
          .crossJoin(lfAt(n - c1, "lfnc1"))
        val terms = s.range(kmin, kmax + 1).toDF("k")
          .join(lf.select($"i".as("k"), $"lf".as("lfk")), "k")
          .join(lf.select(($"i" * -1 + r1).as("k"), $"lf".as("lfr1k")), "k")
          .join(lf.select(($"i" * -1 + c1).as("k"), $"lf".as("lfc1k")), "k")
          .join(lf.select(($"i" + r1 + c1 - n).as("k"), $"lf".as("lfrest")), "k")
          .crossJoin(broadcast(consts))
          .select($"k",
            ($"lfr1" - $"lfk" - $"lfr1k"
              + $"lfnr1" - $"lfc1k" - $"lfrest"
              - ($"lfn" - $"lfc1" - $"lfnc1")).as("lnterm"))
          .select($"k",
            floor(exp($"lnterm".cast("double") / 1000000.0) * 1.0e9
              + lit(0.5)).cast("long").as("tn"))
        terms.agg(
            sum($"tn").as("total_nano"),
            sum(when($"k" >= aObs, $"tn").otherwise(0L)).as("p_upper_nano"))
          .select(lit(n).as("n"), lit(r1).as("r1"), lit(c1).as("c1"),
            lit(aObs).as("a_obs"), $"p_upper_nano", $"total_nano")
      },
      Some("""WITH flags AS (
             |  SELECT c_nationkey = 7 AS ga, c_acctbal < 0 AS sc FROM customer),
             |c AS MATERIALIZED (
             |  SELECT CAST(count(*) AS BIGINT) AS n,
             |    CAST(SUM(CASE WHEN ga THEN 1 ELSE 0 END) AS BIGINT) AS r1,
             |    CAST(SUM(CASE WHEN sc THEN 1 ELSE 0 END) AS BIGINT) AS c1,
             |    CAST(SUM(CASE WHEN ga AND sc THEN 1 ELSE 0 END) AS BIGINT) AS a
             |  FROM flags),
             |lnm AS (
             |  SELECT i, CAST(floor(ln(CAST(i AS DOUBLE)) * 1000000.0 + 0.5)
             |    AS BIGINT) AS lnm
             |  FROM (SELECT unnest(range(1, (SELECT n FROM c) + 1)) AS i)),
             |lf AS MATERIALIZED (
             |  SELECT 0::BIGINT AS i, 0::BIGINT AS lf
             |  UNION ALL
             |  SELECT i, CAST(SUM(lnm) OVER (ORDER BY i
             |    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS lf
             |  FROM lnm),
             |ks AS (
             |  SELECT unnest(range(GREATEST(0, (SELECT r1 + c1 - n FROM c)),
             |    LEAST((SELECT r1 FROM c), (SELECT c1 FROM c)) + 1)) AS k),
             |terms AS MATERIALIZED (
             |  SELECT ks.k,
             |    CAST(floor(exp(CAST(
             |      lr1.lf - lk.lf - lr1k.lf
             |      + lnr1.lf - lc1k.lf - lrest.lf
             |      - (ln_.lf - lc1.lf - lnc1.lf)
             |      AS DOUBLE) / 1000000.0) * 1.0e9 + 0.5) AS BIGINT) AS tn
             |  FROM ks CROSS JOIN c
             |  JOIN lf lk ON lk.i = ks.k
             |  JOIN lf lr1k ON lr1k.i = c.r1 - ks.k
             |  JOIN lf lc1k ON lc1k.i = c.c1 - ks.k
             |  JOIN lf lrest ON lrest.i = c.n - c.r1 - c.c1 + ks.k
             |  JOIN lf lr1 ON lr1.i = c.r1
             |  JOIN lf lnr1 ON lnr1.i = c.n - c.r1
             |  JOIN lf ln_ ON ln_.i = c.n
             |  JOIN lf lc1 ON lc1.i = c.c1
             |  JOIN lf lnc1 ON lnc1.i = c.n - c.c1)
             |SELECT c.n, c.r1, c.c1, c.a AS a_obs,
             |  (SELECT CAST(SUM(CASE WHEN t.k >= c.a THEN t.tn ELSE 0 END)
             |     AS BIGINT) FROM terms t) AS p_upper_nano,
             |  (SELECT CAST(SUM(tn) AS BIGINT) FROM terms) AS total_nano
             |FROM c""".stripMargin)),

    // ----- q261: periodogram of the daily error-count series — the
    // FREQUENCY-domain companion to q245's ACF (ACF says "how long do
    // shocks persist"; the periodogram says "at which period do they
    // repeat"). DFT over the q251 fixed 30-day grid at k = 1..14:
    // per-(k,t) cos/sin values are milli-snapped immediately (the one
    // libm touch — π inlined as the same shortest-round-trip literal
    // in both engines), the series is exactly centered by scaling
    // (c_t = 30·n_t − T), and A_k/B_k/power are pure BIGINT sums and
    // products (|A| ≤ 30·|c|·10³ keeps power < 2^62).
    QueryDef(
      "q261_periodogram",
      (s, d) => {
        import s.implicits._
        val D = 30
        val Pi = math.Pi
        val ev = Tables.events(s, d).filter($"event_type" === "error")
          .select(to_date($"ts").as("day"))
        val base = ev.agg(min($"day").as("d0"))
        val counts = ev.crossJoin(base)
          .select(datediff($"day", $"d0").cast("long").as("di"))
          .filter($"di" < D)
          .groupBy($"di").agg(count(lit(1)).as("n"))
        val grid = s.range(0, D).toDF("di")
          .join(counts, Seq("di"), "left")
          .select($"di", coalesce($"n", lit(0L)).as("n"))
        val tot = grid.agg(sum($"n").as("tt"))
        val cent = grid.crossJoin(tot)
          .select($"di", ($"n" * D - $"tt").as("c"))
        val ks = s.range(1, 15).toDF("k")
        val terms = cent.crossJoin(broadcast(ks))
          .select($"k", $"di", $"c",
            floor(cos(lit(2.0) * Pi * $"k" * $"di" / D) * 1000.0 + lit(0.5))
              .cast("long").as("cq"),
            floor(sin(lit(2.0) * Pi * $"k" * $"di" / D) * 1000.0 + lit(0.5))
              .cast("long").as("sq"))
        val spec = terms.groupBy($"k")
          .agg(sum($"c" * $"cq").as("a_sum"), sum($"c" * $"sq").as("b_sum"))
          .select($"k", $"a_sum", $"b_sum",
            ($"a_sum" * $"a_sum" + $"b_sum" * $"b_sum").as("power"))
        val ptot = spec.agg(sum($"power").as("pt"))
        spec.crossJoin(ptot)
          .select($"k", $"a_sum", $"b_sum", $"power",
            floor($"power".cast("double") * 1000.0 / $"pt" + lit(0.5))
              .cast("long").as("share_milli"))
          .orderBy($"k")
      },
      Some {
        val D = 30
        val Pi = math.Pi
        s"""WITH ev AS (SELECT CAST(ts AS DATE) AS day FROM events
           |            WHERE event_type = 'error'),
           |base AS (SELECT MIN(day) AS d0 FROM ev),
           |counts AS (
           |  SELECT datediff('day', b.d0, e.day) AS di,
           |    CAST(count(*) AS BIGINT) AS n
           |  FROM ev e CROSS JOIN base b
           |  WHERE datediff('day', b.d0, e.day) < $D
           |  GROUP BY 1),
           |grid AS (
           |  SELECT g.di, CAST(COALESCE(c.n, 0) AS BIGINT) AS n
           |  FROM (SELECT CAST(unnest(range(0, $D)) AS BIGINT) AS di) g
           |  LEFT JOIN counts c ON g.di = c.di),
           |tot AS (SELECT CAST(SUM(n) AS BIGINT) AS tt FROM grid),
           |cent AS (SELECT g.di, g.n * $D - t.tt AS c
           |         FROM grid g CROSS JOIN tot t),
           |ks AS (SELECT CAST(unnest(range(1, 15)) AS BIGINT) AS k),
           |terms AS (
           |  SELECT k.k, c.di, c.c,
           |    CAST(floor(cos(2.0 * $Pi * k.k * c.di / $D) * 1000.0 + 0.5)
           |      AS BIGINT) AS cq,
           |    CAST(floor(sin(2.0 * $Pi * k.k * c.di / $D) * 1000.0 + 0.5)
           |      AS BIGINT) AS sq
           |  FROM cent c CROSS JOIN ks k),
           |spec AS MATERIALIZED (
           |  SELECT k, CAST(SUM(c * cq) AS BIGINT) AS a_sum,
           |    CAST(SUM(c * sq) AS BIGINT) AS b_sum,
           |    CAST(SUM(c * cq) AS BIGINT) * CAST(SUM(c * cq) AS BIGINT)
           |      + CAST(SUM(c * sq) AS BIGINT) * CAST(SUM(c * sq) AS BIGINT)
           |      AS power
           |  FROM terms GROUP BY 1),
           |pt AS (SELECT CAST(SUM(power) AS BIGINT) AS pt FROM spec)
           |SELECT s.k, s.a_sum, s.b_sum, s.power,
           |  CAST(floor(CAST(s.power AS DOUBLE) * 1000.0 / p.pt + 0.5)
           |    AS BIGINT) AS share_milli
           |FROM spec s CROSS JOIN pt p
           |ORDER BY s.k""".stripMargin
      }),

    // ----- q262: single-changepoint detection by binary segmentation
    // on daily revenue — the LOCATED level-shift (CUSUM raises an
    // alarm; this names the day): maximize the between-segment
    // F-like gain (n·S_t − t·S_n)²/(t·(n−t)) over every prefix/suffix
    // split of the day-ordered series. Prefix sums are the two-pass
    // GlobalOrder machinery (rank + running sum, no unpartitioned
    // window on the Spark side); the gain is micro-snapped per
    // candidate and the argmax ties on the day index, so both engines
    // pick the identical split.
    QueryDef(
      "q262_changepoint",
      (s, d) => {
        import s.implicits._
        val daily = Tables.orders(s, d)
          .select(to_date($"o_orderdate").as("day"),
            floor($"o_totalprice").cast("long").as("vd"))
          .groupBy($"day").agg(sum($"vd").as("rev"))
          .select(datediff($"day", lit("1995-01-01").cast("date"))
            .cast("long").as("di"), $"rev")
        val ranked = graft.operators.GlobalOrder.zipRank(
          daily.sort($"di"), "r")
        val cum = graft.operators.GlobalOrder.runningSum(
            ranked.select($"di", $"r", $"rev".cast("decimal(38,0)").as("v")),
            Seq($"di"), "v", "cum")
          .select($"di", $"r".as("t"), $"cum".cast("long").as("st"))
          .transform(graft.operators.Iterate.truncate)
        val nf = cum.agg(max($"t").as("n"), max($"st").as("sn"))
        cum.crossJoin(nf)
          .filter($"t" < $"n")
          .select($"di", $"t", $"n", $"st", $"sn",
            floor(($"n" * $"st" - $"t" * $"sn").cast("double")
              * ($"n" * $"st" - $"t" * $"sn")
              / ($"t".cast("double") * ($"n" - $"t")) / 1000000.0 + lit(0.5))
              .cast("long").as("gain"))
          .orderBy($"gain".desc, $"di")
          .limit(1)
          .select($"di".as("split_after_di"), $"t".as("n_left"),
            ($"n" - $"t").as("n_right"),
            floor($"st".cast("double") * 1000.0 / $"t" + lit(0.5))
              .cast("long").as("mean_left_milli"),
            floor(($"sn" - $"st").cast("double") * 1000.0 / ($"n" - $"t")
              + lit(0.5)).cast("long").as("mean_right_milli"),
            $"gain")
      },
      Some("""WITH daily AS (
             |  SELECT datediff('day', DATE '1995-01-01', day) AS di, rev
             |  FROM (
             |    SELECT CAST(o_orderdate AS DATE) AS day,
             |      CAST(SUM(CAST(floor(o_totalprice) AS BIGINT)) AS BIGINT) AS rev
             |    FROM orders GROUP BY 1)),
             |cum AS MATERIALIZED (
             |  SELECT di,
             |    CAST(row_number() OVER (ORDER BY di) AS BIGINT) AS t,
             |    CAST(SUM(rev) OVER (ORDER BY di
             |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS st
             |  FROM daily),
             |nf AS (SELECT MAX(t) AS n, MAX(st) AS sn FROM cum)
             |SELECT di AS split_after_di, t AS n_left, n - t AS n_right,
             |  CAST(floor(CAST(st AS DOUBLE) * 1000.0 / t + 0.5) AS BIGINT)
             |    AS mean_left_milli,
             |  CAST(floor(CAST(sn - st AS DOUBLE) * 1000.0 / (n - t) + 0.5)
             |    AS BIGINT) AS mean_right_milli,
             |  CAST(floor(CAST(n * st - t * sn AS DOUBLE) * (n * st - t * sn)
             |    / (CAST(t AS DOUBLE) * (n - t)) / 1000000.0 + 0.5) AS BIGINT)
             |    AS gain
             |FROM cum CROSS JOIN nf
             |WHERE t < n
             |ORDER BY gain DESC, di LIMIT 1""".stripMargin)),

    // ----- q263: Wilcoxon signed-rank test on the q240 pre/post user
    // panel — the nonparametric PAIRED companion to CUPED/DiD (those
    // estimate the effect; this tests it without normality): exact
    // milli differences per user, DOUBLED average ranks of |d| so tied
    // ranks stay integers (the rank2 = 2·cum_less + t + 1 identity
    // over the distinct-|d| frame, ranked by GlobalOrder.runningSum),
    // W⁺ kept in rank2 units, and the tie-corrected normal
    // approximation assembled once, micro-snapped.
    QueryDef(
      "q263_wilcoxon_signed_rank",
      (s, d) => {
        import s.implicits._
        val split = lit("2024-01-16").cast("timestamp")
        val per = Tables.events(s, d)
          .select($"user_id", ($"ts" < split).as("pre"),
            floor($"value" * 1000 + lit(0.5)).cast("long").as("vm"))
          .groupBy($"user_id")
          .agg(sum(when($"pre", $"vm").otherwise(0L)).as("x"),
            sum(when(!$"pre", $"vm").otherwise(0L)).as("y"))
        val diffs = per.select(($"y" - $"x").as("dd"))
          .filter($"dd" =!= 0L)
          .select($"dd", abs($"dd").as("ad"))
          .transform(graft.operators.Iterate.truncate)
        val byVal = diffs.groupBy($"ad").agg(count(lit(1)).as("t"),
          sum(when($"dd" > 0, 1L).otherwise(0L)).as("tp"))
        val cum = graft.operators.GlobalOrder.runningSum(
            byVal.sort($"ad").select($"ad", $"t", $"tp",
              $"t".cast("decimal(38,0)").as("v")),
            Seq($"ad"), "v", "cum")
          .select($"ad", $"t", $"tp",
            ($"cum".cast("long") - $"t").as("cum_less"))
        val agg = cum.select($"t", $"tp", $"cum_less",
            (lit(2L) * $"cum_less" + $"t" + 1).as("rank2"))
          .agg(sum($"t").as("n"),
            sum($"tp" * $"rank2").as("w2p"),
            sum($"t" * $"t" * $"t" - $"t").as("tie3"))
        agg.select($"n", $"w2p",
          floor((($"w2p".cast("double") / 2.0
              - $"n".cast("double") * ($"n" + 1) / 4.0)
            / sqrt($"n".cast("double") * ($"n" + 1) * ($"n" * 2 + 1) / 24.0
              - $"tie3".cast("double") / 48.0))
            * 1000000.0 + lit(0.5)).cast("long").as("z_micro"))
      },
      Some("""WITH per AS (
             |  SELECT user_id,
             |    CAST(SUM(CASE WHEN ts < TIMESTAMP '2024-01-16'
             |      THEN CAST(floor(value * 1000 + 0.5) AS BIGINT)
             |      ELSE 0 END) AS BIGINT) AS x,
             |    CAST(SUM(CASE WHEN ts < TIMESTAMP '2024-01-16'
             |      THEN 0
             |      ELSE CAST(floor(value * 1000 + 0.5) AS BIGINT) END)
             |      AS BIGINT) AS y
             |  FROM events GROUP BY 1),
             |diffs AS (
             |  SELECT y - x AS dd, ABS(y - x) AS ad FROM per WHERE y - x <> 0),
             |byval AS (
             |  SELECT ad, CAST(count(*) AS BIGINT) AS t,
             |    CAST(SUM(CASE WHEN dd > 0 THEN 1 ELSE 0 END) AS BIGINT) AS tp
             |  FROM diffs GROUP BY 1),
             |cum AS (
             |  SELECT ad, t, tp,
             |    CAST(SUM(t) OVER (ORDER BY ad ROWS UNBOUNDED PRECEDING)
             |      AS BIGINT) - t AS cum_less
             |  FROM byval),
             |agg AS (
             |  SELECT CAST(SUM(t) AS BIGINT) AS n,
             |    CAST(SUM(tp * (2 * cum_less + t + 1)) AS BIGINT) AS w2p,
             |    CAST(SUM(t * t * t - t) AS BIGINT) AS tie3
             |  FROM cum)
             |SELECT n, w2p,
             |  CAST(floor(((CAST(w2p AS DOUBLE) / 2.0
             |      - CAST(n AS DOUBLE) * (n + 1) / 4.0)
             |    / sqrt(CAST(n AS DOUBLE) * (n + 1) * (2 * n + 1) / 24.0
             |      - CAST(tie3 AS DOUBLE) / 48.0))
             |    * 1000000.0 + 0.5) AS BIGINT) AS z_micro
             |FROM agg""".stripMargin)),

    // ----- q268: Cohen's kappa between two rule-based document
    // raters (char-length gate vs token-count gate) — the
    // inter-annotator-agreement diagnostic a labeling pipeline runs
    // before trusting silver labels: observed agreement corrected by
    // chance agreement. Confusion cells are exact BIGINT counts from
    // ONE scan; kappa = (po − pe)/(1 − pe) is one IEEE chain over
    // count ratios (doubles from the start — no >2^63 products at
    // any scale), micro-snapped.
    QueryDef(
      "q268_cohens_kappa",
      (s, d) => {
        import s.implicits._
        val flags = Tables.documents(s, d).select(
          (length(trim($"text")) > 300).as("ra"),
          (size(graft.functions.TextFunctions.tokens($"text")) > 60).as("rb"))
        val cts = flags.agg(
          sum(when($"ra" && $"rb", 1L).otherwise(0L)).as("n11"),
          sum(when($"ra" && !$"rb", 1L).otherwise(0L)).as("n10"),
          sum(when(!$"ra" && $"rb", 1L).otherwise(0L)).as("n01"),
          sum(when(!$"ra" && !$"rb", 1L).otherwise(0L)).as("n00"))
        def dv(c: org.apache.spark.sql.Column) = c.cast("double")
        cts.select($"n11", $"n10", $"n01", $"n00",
          floor(((dv($"n11" + $"n00") / dv($"n11" + $"n10" + $"n01" + $"n00")
              - (dv($"n11" + $"n10") * dv($"n11" + $"n01")
                 + dv($"n01" + $"n00") * dv($"n10" + $"n00"))
                / (dv($"n11" + $"n10" + $"n01" + $"n00")
                   * dv($"n11" + $"n10" + $"n01" + $"n00")))
            / (lit(1.0)
              - (dv($"n11" + $"n10") * dv($"n11" + $"n01")
                 + dv($"n01" + $"n00") * dv($"n10" + $"n00"))
                / (dv($"n11" + $"n10" + $"n01" + $"n00")
                   * dv($"n11" + $"n10" + $"n01" + $"n00"))))
            * 1000000 + lit(0.5)).cast("long").as("kappa_micro"))
      },
      Some("""WITH fl AS (
             |  SELECT length(trim(text)) > 300 AS ra,
             |    len(list_filter(string_split_regex(trim(text), '\s+'),
             |                    x -> length(x) > 0)) > 60 AS rb
             |  FROM documents),
             |ct AS (
             |  SELECT
             |    CAST(SUM(CASE WHEN ra AND rb THEN 1 ELSE 0 END) AS BIGINT)
             |      AS n11,
             |    CAST(SUM(CASE WHEN ra AND NOT rb THEN 1 ELSE 0 END) AS BIGINT)
             |      AS n10,
             |    CAST(SUM(CASE WHEN NOT ra AND rb THEN 1 ELSE 0 END) AS BIGINT)
             |      AS n01,
             |    CAST(SUM(CASE WHEN NOT ra AND NOT rb THEN 1 ELSE 0 END)
             |      AS BIGINT) AS n00
             |  FROM fl)
             |SELECT n11, n10, n01, n00,
             |  CAST(floor(((CAST(n11 + n00 AS DOUBLE)
             |      / CAST(n11 + n10 + n01 + n00 AS DOUBLE)
             |      - (CAST(n11 + n10 AS DOUBLE) * CAST(n11 + n01 AS DOUBLE)
             |         + CAST(n01 + n00 AS DOUBLE) * CAST(n10 + n00 AS DOUBLE))
             |        / (CAST(n11 + n10 + n01 + n00 AS DOUBLE)
             |           * CAST(n11 + n10 + n01 + n00 AS DOUBLE)))
             |    / (1.0
             |      - (CAST(n11 + n10 AS DOUBLE) * CAST(n11 + n01 AS DOUBLE)
             |         + CAST(n01 + n00 AS DOUBLE) * CAST(n10 + n00 AS DOUBLE))
             |        / (CAST(n11 + n10 + n01 + n00 AS DOUBLE)
             |           * CAST(n11 + n10 + n01 + n00 AS DOUBLE))))
             |    * 1000000 + 0.5) AS BIGINT) AS kappa_micro
             |FROM ct""".stripMargin)),

    // ----- q269: Friedman test across order priorities blocked by
    // month — the nonparametric repeated-measures companion to q220
    // Kruskal–Wallis (that one pools independent groups; this ranks
    // WITHIN each month block, so a month-level revenue shift can't
    // masquerade as a priority effect). Cell values are exact cent
    // sums; ranks are a BLOCK-partitioned window (never global; cent
    // sums make ties vanishingly rare and any tie ranks identically
    // in both engines); χ²_F = 12/(n·k·(k+1))·ΣR_j² − 3·n·(k+1) is
    // exact-integer until one final double chain, micro-snapped and
    // cross-joined onto the per-treatment rank sums (q177 shape).
    QueryDef(
      "q269_friedman_test",
      (s, d) => {
        import s.implicits._
        val bt = Tables.orders(s, d)
          .select(trunc($"o_orderdate", "month").as("blk"), $"o_orderpriority",
            floor($"o_totalprice" * 100 + lit(0.5)).cast("long").as("cents"))
          .groupBy($"blk", $"o_orderpriority")
          .agg(sum($"cents").as("v"))
        val full = bt.groupBy($"blk").agg(count(lit(1)).as("kk"))
          .filter($"kk" === 5).select($"blk")
        val ranked = bt.join(full, "blk")
          .withColumn("rk", rank().over(
            org.apache.spark.sql.expressions.Window
              .partitionBy($"blk").orderBy($"v")))
        val rj = ranked.groupBy($"o_orderpriority")
          .agg(sum($"rk".cast("long")).as("rj"), count(lit(1)).as("n_blocks"))
        val chi = rj.agg(max($"n_blocks").as("n"),
            sum($"rj" * $"rj").as("sr2"))
          .select(floor((lit(12.0) * $"sr2".cast("double")
              / ($"n".cast("double") * 5.0 * 6.0)
              - lit(3.0) * $"n".cast("double") * 6.0) * 1000000 + lit(0.5))
            .cast("long").as("chi2_micro"))
        rj.crossJoin(chi)
          .select($"o_orderpriority", $"n_blocks", $"rj", $"chi2_micro")
          .orderBy($"o_orderpriority")
      },
      Some("""WITH bt AS (
             |  SELECT date_trunc('month', CAST(o_orderdate AS DATE)) AS blk,
             |    o_orderpriority,
             |    CAST(SUM(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
             |      AS BIGINT) AS v
             |  FROM orders GROUP BY 1, 2),
             |full_b AS (
             |  SELECT blk FROM bt GROUP BY blk HAVING COUNT(*) = 5),
             |rk AS (
             |  SELECT b.o_orderpriority,
             |    CAST(rank() OVER (PARTITION BY b.blk ORDER BY b.v)
             |      AS BIGINT) AS rk
             |  FROM bt b JOIN full_b f ON b.blk = f.blk),
             |rj AS (
             |  SELECT o_orderpriority, CAST(SUM(rk) AS BIGINT) AS rj,
             |    CAST(COUNT(*) AS BIGINT) AS n_blocks
             |  FROM rk GROUP BY 1),
             |chi AS (
             |  SELECT CAST(floor((12.0 * CAST(SUM(rj * rj) AS DOUBLE)
             |      / (CAST(MAX(n_blocks) AS DOUBLE) * 5.0 * 6.0)
             |      - 3.0 * CAST(MAX(n_blocks) AS DOUBLE) * 6.0)
             |      * 1000000 + 0.5) AS BIGINT) AS chi2_micro
             |  FROM rj)
             |SELECT r.o_orderpriority, r.n_blocks, r.rj, c.chi2_micro
             |FROM rj r CROSS JOIN chi c
             |ORDER BY r.o_orderpriority""".stripMargin)),

    // ----- q273: Brown–Forsythe test (median-centered Levene) for
    // equal variances of extended price across return flags — the
    // variance-homogeneity gate q187 Welch / q220 Kruskal–Wallis
    // assume away: one-way ANOVA F on the absolute deviations from
    // each group's exact interpolated MEDIAN (median-centering is
    // what makes it robust to the heavy price tail). Deviations are
    // exact integer cents (half-cent medians doubled away, floor-
    // halved back); the sum-of-squares pieces are 1e6-quantized
    // BIGINTs BEFORE the cross-group sums so every Σ is exact and
    // order-free; the F ratio is one final IEEE chain, micro-snapped
    // and cross-joined onto the per-group rows (q177 shape).
    QueryDef(
      "q273_brown_forsythe",
      (s, d) => {
        import s.implicits._
        val li = Tables.lineitem(s, d)
          .select($"l_returnflag",
            floor($"l_extendedprice" * 100 + lit(0.5)).cast("long").as("cents"))
        val med = li.groupBy($"l_returnflag")
          .agg((percentile($"cents", lit(0.5)) * 2).cast("long").as("med2"))
        val z = li.join(broadcast(med), "l_returnflag")
          .select($"l_returnflag", $"med2",
            shiftright(abs($"cents" * 2 - $"med2"), 1).as("z"))
        val grp = z.groupBy($"l_returnflag")
          .agg(count(lit(1)).as("n_g"), max($"med2").as("med2"),
            sum($"z".cast("decimal(38,0)")).as("sg"),
            sum(($"z" * $"z").cast("decimal(38,0)")).as("szz"))
        val gq = grp
          .withColumn("t_cq",
            floor($"sg".cast("double") * $"sg".cast("double")
                / $"n_g".cast("double") / 1000000.0 + lit(0.5)).cast("long"))
          .withColumn("szz_cq",
            floor($"szz".cast("double") / 1000000.0 + lit(0.5)).cast("long"))
        val tot = gq.agg(
            sum($"n_g").as("nn"), sum($"sg").as("ss"),
            sum($"t_cq").as("sum_t_cq"), sum($"szz_cq").as("sum_szz_cq"))
          .select($"nn", $"sum_t_cq", $"sum_szz_cq",
            floor($"ss".cast("double") * $"ss".cast("double")
                / $"nn".cast("double") / 1000000.0 + lit(0.5)).cast("long")
              .as("g_cq"))
          .select(floor(
              (($"sum_t_cq" - $"g_cq").cast("double") / 2.0)
              / (($"sum_szz_cq" - $"sum_t_cq").cast("double")
                 / ($"nn".cast("double") - 3.0))
              * 1000000 + lit(0.5)).cast("long").as("f_micro"))
        gq.select($"l_returnflag", $"n_g", $"med2").crossJoin(tot)
          .orderBy($"l_returnflag")
      },
      Some("""WITH ce AS (
             |  SELECT l_returnflag,
             |    CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS cents
             |  FROM lineitem),
             |md AS (
             |  SELECT l_returnflag,
             |    CAST(quantile_cont(cents, 0.5) * 2 AS BIGINT) AS med2
             |  FROM ce GROUP BY 1),
             |z AS (
             |  SELECT c.l_returnflag, m.med2,
             |    abs(c.cents * 2 - m.med2) // 2 AS z
             |  FROM ce c JOIN md m USING (l_returnflag)),
             |g AS (
             |  SELECT l_returnflag, CAST(COUNT(*) AS BIGINT) AS n_g,
             |    MAX(med2) AS med2,
             |    CAST(SUM(z) AS HUGEINT) AS sg,
             |    CAST(SUM(CAST(z AS HUGEINT) * z) AS HUGEINT) AS szz
             |  FROM z GROUP BY 1),
             |gq AS (
             |  SELECT l_returnflag, n_g, med2, sg,
             |    CAST(floor(CAST(sg AS DOUBLE) * CAST(sg AS DOUBLE)
             |      / CAST(n_g AS DOUBLE) / 1000000.0 + 0.5) AS BIGINT) AS t_cq,
             |    CAST(floor(CAST(szz AS DOUBLE) / 1000000.0 + 0.5) AS BIGINT)
             |      AS szz_cq
             |  FROM g),
             |tot AS (
             |  SELECT CAST(SUM(n_g) AS BIGINT) AS nn,
             |    CAST(SUM(sg) AS HUGEINT) AS ss,
             |    CAST(SUM(t_cq) AS BIGINT) AS sum_t_cq,
             |    CAST(SUM(szz_cq) AS BIGINT) AS sum_szz_cq
             |  FROM gq),
             |t2 AS (
             |  SELECT nn, sum_t_cq, sum_szz_cq,
             |    CAST(floor(CAST(ss AS DOUBLE) * CAST(ss AS DOUBLE)
             |      / CAST(nn AS DOUBLE) / 1000000.0 + 0.5) AS BIGINT) AS g_cq
             |  FROM tot),
             |f AS (
             |  SELECT CAST(floor(
             |      (CAST(sum_t_cq - g_cq AS DOUBLE) / 2.0)
             |      / (CAST(sum_szz_cq - sum_t_cq AS DOUBLE)
             |         / (CAST(nn AS DOUBLE) - 3.0))
             |      * 1000000 + 0.5) AS BIGINT) AS f_micro
             |  FROM t2)
             |SELECT g2.l_returnflag, g2.n_g, g2.med2, f.f_micro
             |FROM gq g2 CROSS JOIN f
             |ORDER BY g2.l_returnflag""".stripMargin)),

    // ----- q275: Anderson–Darling statistic of account balances
    // against the (Laplace-smoothed) uniform CDF on their own range —
    // the tail-weighted EDF companion to q171 KS / q222 CvM: AD's
    // 1/(F(1−F)) weight makes it the sensitive test for tail
    // departures, exactly where balances deviate from uniform.
    // F(v) = (v−min+1)/(max−min+2) in cents (the add-one smoothing
    // keeps both logs finite at the extremes). Tie-safe closed form
    // over the DISTINCT-value frame: a tie block of size t starting
    // after c smaller values contributes (2tc+t²)·lnF +
    // (2t(n−c)−t²)·ln(1−F); each ln is r4-snapped immediately and
    // the per-value term fdiv'd by n (exact, order-free BIGINT sum —
    // the q96/q164 libm discipline). Ranks come from
    // GlobalOrder.runningSum, never a global window.
    QueryDef(
      "q275_anderson_darling",
      (s, d) => {
        import s.implicits._
        val v = Tables.customer(s, d)
          .select(floor($"c_acctbal" * 100 + lit(0.5)).cast("long").as("v"))
        val byV = v.groupBy($"v").agg(count(lit(1)).as("t"))
        val mm = v.agg(min($"v").as("mn"), max($"v").as("mx"),
          count(lit(1)).as("n"))
        val cum = graft.operators.GlobalOrder.runningSum(
            byV.withColumn("td", $"t".cast("decimal(38,0)")),
            Seq($"v".asc), "td", "cumd")
          .select($"v", $"t", ($"cumd".cast("long") - $"t").as("c"))
        val terms = cum.crossJoin(mm)
          .withColumn("ff", ($"v" - $"mn" + 1).cast("double")
            / ($"mx" - $"mn" + 2).cast("double"))
          .withColumn("lnf_q",
            floor(log($"ff") * 10000 + lit(0.5)).cast("long"))
          .withColumn("ln1f_q",
            floor(log(lit(1.0) - $"ff") * 10000 + lit(0.5)).cast("long"))
          .withColumn("term_q",
            floor(((lit(2L) * $"t" * $"c" + $"t" * $"t") * $"lnf_q"
              + (lit(2L) * $"t" * ($"n" - $"c") - $"t" * $"t") * $"ln1f_q")
              .cast("double") / $"n".cast("double")).cast("long"))
        terms.agg(max($"n").as("n"), count(lit(1)).as("n_distinct"),
            sum($"term_q").as("sq"))
          .select($"n", $"n_distinct",
            floor((-$"n".cast("double") - $"sq".cast("double") / 10000.0)
              * 1000 + lit(0.5)).cast("long").as("a2_milli"))
      },
      Some("""WITH vv AS (
             |  SELECT CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT) AS v
             |  FROM customer),
             |mm AS (
             |  SELECT MIN(v) AS mn, MAX(v) AS mx,
             |    CAST(COUNT(*) AS BIGINT) AS n
             |  FROM vv),
             |byv AS (
             |  SELECT v, CAST(COUNT(*) AS BIGINT) AS t FROM vv GROUP BY 1),
             |cum AS (
             |  SELECT v, t,
             |    CAST(SUM(t) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING)
             |      AS BIGINT) - t AS c
             |  FROM byv),
             |terms AS (
             |  SELECT m.n,
             |    CAST(floor(((2 * u.t * u.c + u.t * u.t)
             |        * CAST(floor(ln(CAST(u.v - m.mn + 1 AS DOUBLE)
             |            / CAST(m.mx - m.mn + 2 AS DOUBLE)) * 10000 + 0.5)
             |          AS BIGINT)
             |      + (2 * u.t * (m.n - u.c) - u.t * u.t)
             |        * CAST(floor(ln(1.0 - CAST(u.v - m.mn + 1 AS DOUBLE)
             |            / CAST(m.mx - m.mn + 2 AS DOUBLE)) * 10000 + 0.5)
             |          AS BIGINT))
             |      / CAST(m.n AS DOUBLE)) AS BIGINT) AS term_q
             |  FROM cum u CROSS JOIN mm m)
             |SELECT MAX(n) AS n, CAST(COUNT(*) AS BIGINT) AS n_distinct,
             |  CAST(floor((-CAST(MAX(n) AS DOUBLE)
             |    - CAST(SUM(term_q) AS DOUBLE) / 10000.0) * 1000 + 0.5)
             |    AS BIGINT) AS a2_milli
             |FROM terms""".stripMargin)),

    // ----- q278: Holt–Winters additive seasonal smoothing of the
    // daily revenue series (operators.Holt.holtWinters) — the third
    // rung of the forecasting ladder (q168 EWMA level, q178 Holt
    // level+trend, this one level+trend+7-slot seasonality). The
    // rotating seasonal queue rides the recursive CTE as seven
    // columns (each step shifts s2..s7 left and appends the updated
    // head); warm-up = first 7 observations (l₀ = fdiv mean, sᵢ =
    // xᵢ − l₀). Every state is exact fdiv integer algebra, so level,
    // trend, the seasonal USED at each step, and the one-step fitted
    // value all hash-match the replay.
    QueryDef(
      "q278_holt_winters",
      (s, d) => {
        import s.implicits._
        val daily = Tables.orders(s, d)
          .select(to_date($"o_orderdate").as("day"),
            floor($"o_totalprice" * 100 + lit(0.5)).cast("long").as("cents"))
          .groupBy($"day").agg(sum($"cents").as("xq"))
        graft.operators.Holt.holtWinters(daily, "day", "xq",
          HoltAlphaDen, HoltBetaDen, HwGammaDen)
      },
      Some {
        def f(a: String, b: Long) = QueryFixtures.fdivSql(a, b.toString)
        val dStr = s"r.xq - h.l - h.b - h.s1"
        val lNew = s"h.l + h.b + ${f(dStr, HoltAlphaDen)}"
        s"""WITH RECURSIVE ser AS (
           |  SELECT CAST(o_orderdate AS DATE) AS day,
           |    CAST(SUM(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
           |      AS BIGINT) AS xq
           |  FROM orders GROUP BY 1),
           |rn AS MATERIALIZED (
           |  SELECT day, xq,
           |    CAST(row_number() OVER (ORDER BY day) AS BIGINT) AS rn
           |  FROM ser),
           |w AS (SELECT rn, xq FROM rn WHERE rn <= 7),
           |l0 AS (SELECT ${f("CAST(SUM(xq) AS BIGINT)", 7L)} AS l FROM w),
           |init AS (
           |  SELECT CAST(7 AS BIGINT) AS rn, CAST(NULL AS DATE) AS day,
           |    CAST(NULL AS BIGINT) AS xq, l0.l AS l, CAST(0 AS BIGINT) AS b,
           |${(1 to 7).map(i =>
              s"    MAX(CASE WHEN w.rn = $i THEN w.xq END) - l0.l AS s$i")
             .mkString(",\n")},
           |    CAST(NULL AS BIGINT) AS s_used, CAST(NULL AS BIGINT) AS fitted
           |  FROM w CROSS JOIN l0 GROUP BY l0.l),
           |h AS (
           |  SELECT * FROM init
           |  UNION ALL
           |  SELECT r.rn, r.day, r.xq,
           |    $lNew AS l,
           |    h.b + ${f(f(dStr, HoltAlphaDen), HoltBetaDen)} AS b,
           |    h.s2 AS s1, h.s3 AS s2, h.s4 AS s3, h.s5 AS s4, h.s6 AS s5,
           |    h.s7 AS s6,
           |    h.s1 + ${f(s"r.xq - ($lNew) - h.s1", HwGammaDen)} AS s7,
           |    h.s1 AS s_used,
           |    h.l + h.b + h.s1 AS fitted
           |  FROM h JOIN rn r ON r.rn = h.rn + 1)
           |SELECT day, xq, l AS level, b AS trend, s_used, fitted
           |FROM h WHERE rn > 7 ORDER BY day""".stripMargin
      }),

    // ----- q280: Kendall's coefficient of concordance W over the
    // q269 blocked-rank frame (months ranking the five order
    // priorities) — the EFFECT SIZE the Friedman χ² lacks: W ∈ [0,1]
    // says how strongly the months AGREE on a priority ordering.
    // Doubled rank-sum deviations (2R_j − n(k+1)) keep S exact
    // integers through the square; W = 3·S4/(n²·k(k²−1)) is one
    // double chain micro-snapped. No tie correction — cent-sum cell
    // values make rank ties vanishingly rare (the q269 argument).
    QueryDef(
      "q280_kendalls_w",
      (s, d) => {
        import s.implicits._
        val bt = Tables.orders(s, d)
          .select(trunc($"o_orderdate", "month").as("blk"), $"o_orderpriority",
            floor($"o_totalprice" * 100 + lit(0.5)).cast("long").as("cents"))
          .groupBy($"blk", $"o_orderpriority")
          .agg(sum($"cents").as("v"))
        val full = bt.groupBy($"blk").agg(count(lit(1)).as("kk"))
          .filter($"kk" === 5).select($"blk")
        val ranked = bt.join(full, "blk")
          .withColumn("rk", rank().over(
            org.apache.spark.sql.expressions.Window
              .partitionBy($"blk").orderBy($"v")))
        val rj = ranked.groupBy($"o_orderpriority")
          .agg(sum($"rk".cast("long")).as("rj"), count(lit(1)).as("n_blocks"))
        rj.agg(max($"n_blocks").as("n"),
            sum(($"rj" * 2 - $"n_blocks" * 6) * ($"rj" * 2 - $"n_blocks" * 6))
              .as("s4"))
          .select($"n".as("n_blocks"), $"s4",
            floor(lit(3.0) * $"s4".cast("double")
                / ($"n".cast("double") * $"n".cast("double") * 5.0 * 24.0)
                * 1000000 + lit(0.5))
              .cast("long").as("w_micro"))
      },
      Some("""WITH bt AS (
             |  SELECT date_trunc('month', CAST(o_orderdate AS DATE)) AS blk,
             |    o_orderpriority,
             |    CAST(SUM(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
             |      AS BIGINT) AS v
             |  FROM orders GROUP BY 1, 2),
             |full_b AS (
             |  SELECT blk FROM bt GROUP BY blk HAVING COUNT(*) = 5),
             |rk AS (
             |  SELECT b.o_orderpriority,
             |    CAST(rank() OVER (PARTITION BY b.blk ORDER BY b.v)
             |      AS BIGINT) AS rk
             |  FROM bt b JOIN full_b f ON b.blk = f.blk),
             |rj AS (
             |  SELECT o_orderpriority, CAST(SUM(rk) AS BIGINT) AS rj,
             |    CAST(COUNT(*) AS BIGINT) AS n_blocks
             |  FROM rk GROUP BY 1)
             |SELECT CAST(MAX(n_blocks) AS BIGINT) AS n_blocks,
             |  CAST(SUM((rj * 2 - n_blocks * 6) * (rj * 2 - n_blocks * 6))
             |    AS BIGINT) AS s4,
             |  CAST(floor(3.0 * CAST(SUM((rj * 2 - n_blocks * 6)
             |      * (rj * 2 - n_blocks * 6)) AS DOUBLE)
             |    / (CAST(MAX(n_blocks) AS DOUBLE) * CAST(MAX(n_blocks) AS DOUBLE)
             |       * 5.0 * 24.0)
             |    * 1000000 + 0.5) AS BIGINT) AS w_micro
             |FROM rj""".stripMargin)),

    // ----- q283: Page's trend test on the same blocked-rank frame —
    // the ORDERED-alternative member (Friedman asks "any difference
    // across priorities?"; Page asks "do revenues trend
    // MONOTONICALLY with urgency?"): L = Σ_j j·R_j with j the
    // urgency ordinal parsed from the priority label, E[L] =
    // n·k(k+1)²/4, Var[L] = n·k²(k+1)(k²−1)/144. L and 4(L−E) are
    // exact integers; z is one double chain, micro-snapped.
    QueryDef(
      "q283_page_trend",
      (s, d) => {
        import s.implicits._
        val bt = Tables.orders(s, d)
          .select(trunc($"o_orderdate", "month").as("blk"), $"o_orderpriority",
            floor($"o_totalprice" * 100 + lit(0.5)).cast("long").as("cents"))
          .groupBy($"blk", $"o_orderpriority")
          .agg(sum($"cents").as("v"))
        val full = bt.groupBy($"blk").agg(count(lit(1)).as("kk"))
          .filter($"kk" === 5).select($"blk")
        val ranked = bt.join(full, "blk")
          .withColumn("rk", rank().over(
            org.apache.spark.sql.expressions.Window
              .partitionBy($"blk").orderBy($"v")))
          .withColumn("j", substring($"o_orderpriority", 1, 1).cast("long"))
        val rj = ranked.groupBy($"j")
          .agg(sum($"rk".cast("long")).as("rj"), count(lit(1)).as("n_blocks"))
        rj.agg(max($"n_blocks").as("n"), sum($"j" * $"rj").as("l_stat"))
          .select($"n".as("n_blocks"), $"l_stat",
            // E = n·5·36/4 = 45n; Var = n·25·6·24/144 = 25n
            floor(($"l_stat".cast("double") - lit(45.0) * $"n".cast("double"))
                / sqrt(lit(25.0) * $"n".cast("double"))
                * 1000000 + lit(0.5))
              .cast("long").as("z_micro"))
      },
      Some("""WITH bt AS (
             |  SELECT date_trunc('month', CAST(o_orderdate AS DATE)) AS blk,
             |    o_orderpriority,
             |    CAST(SUM(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
             |      AS BIGINT) AS v
             |  FROM orders GROUP BY 1, 2),
             |full_b AS (
             |  SELECT blk FROM bt GROUP BY blk HAVING COUNT(*) = 5),
             |rk AS (
             |  SELECT CAST(substr(b.o_orderpriority, 1, 1) AS BIGINT) AS j,
             |    CAST(rank() OVER (PARTITION BY b.blk ORDER BY b.v)
             |      AS BIGINT) AS rk
             |  FROM bt b JOIN full_b f ON b.blk = f.blk),
             |rj AS (
             |  SELECT j, CAST(SUM(rk) AS BIGINT) AS rj,
             |    CAST(COUNT(*) AS BIGINT) AS n_blocks
             |  FROM rk GROUP BY 1)
             |SELECT CAST(MAX(n_blocks) AS BIGINT) AS n_blocks,
             |  CAST(SUM(j * rj) AS BIGINT) AS l_stat,
             |  CAST(floor((CAST(SUM(j * rj) AS DOUBLE)
             |      - 45.0 * CAST(MAX(n_blocks) AS DOUBLE))
             |    / sqrt(25.0 * CAST(MAX(n_blocks) AS DOUBLE))
             |    * 1000000 + 0.5) AS BIGINT) AS z_micro
             |FROM rj""".stripMargin)),

    // ----- q284: Cliff's delta on the q172 Mann–Whitney cohorts —
    // the EFFECT SIZE the U test lacks (q276's Cox-next-to-logrank
    // move applied to the rank family): δ = (#(x>y) − #(x<y))/(n₁n₀)
    // ∈ [−1,1], computed EXACTLY from per-distinct-value cumulative
    // counts (Σ c₁·cumlt₀ dominance algebra — never a pair join),
    // with cums from GlobalOrder.runningSum. Integer all the way to
    // one final division, micro-snapped.
    QueryDef(
      "q284_cliffs_delta",
      (s, d) => {
        import s.implicits._
        val v = Tables.events(s, d)
          .filter($"event_type" === "purchase")
          .select(floor($"value" * 1000 + lit(0.5)).cast("long").as("vm"),
            ($"user_id" % 2 === 0).as("g1"))
        val byVal = v.groupBy($"vm").agg(
          sum(when($"g1", 1L).otherwise(0L)).as("c1"),
          sum(when(!$"g1", 1L).otherwise(0L)).as("c0"))
        val cum = graft.operators.GlobalOrder.runningSum(
            byVal.withColumn("c0d", $"c0".cast("decimal(38,0)")),
            Seq($"vm".asc), "c0d", "cum0d")
          .select($"vm", $"c1", $"c0", ($"cum0d".cast("long") - $"c0").as("lt0"),
            $"cum0d".cast("long").as("le0"))
        val tot = cum.agg(sum($"c1").as("n1"), sum($"c0").as("n0"))
        cum.crossJoin(tot)
          .select($"c1", $"c0", $"lt0", ($"n0" - $"le0").as("gt0"),
            $"n1", $"n0")
          .agg(max($"n1").as("n1"), max($"n0").as("n0"),
            sum($"c1" * $"lt0").as("n_gt"),
            sum($"c1" * $"gt0").as("n_lt"),
            sum($"c1" * $"c0").as("n_tie"))
          .select($"n1", $"n0", $"n_gt", $"n_lt", $"n_tie",
            floor(($"n_gt" - $"n_lt").cast("double")
                / ($"n1".cast("double") * $"n0".cast("double"))
                * 1000000 + lit(0.5))
              .cast("long").as("delta_micro"))
      },
      Some("""WITH v AS (
             |  SELECT CAST(floor(value * 1000 + 0.5) AS BIGINT) AS vm,
             |    user_id % 2 = 0 AS g1
             |  FROM events WHERE event_type = 'purchase'),
             |byval AS (
             |  SELECT vm,
             |    CAST(SUM(CASE WHEN g1 THEN 1 ELSE 0 END) AS BIGINT) AS c1,
             |    CAST(SUM(CASE WHEN g1 THEN 0 ELSE 1 END) AS BIGINT) AS c0
             |  FROM v GROUP BY 1),
             |cum AS (
             |  SELECT vm, c1, c0,
             |    CAST(SUM(c0) OVER (ORDER BY vm ROWS UNBOUNDED PRECEDING)
             |      AS BIGINT) - c0 AS lt0,
             |    CAST(SUM(c0) OVER (ORDER BY vm ROWS UNBOUNDED PRECEDING)
             |      AS BIGINT) AS le0
             |  FROM byval),
             |tot AS (
             |  SELECT CAST(SUM(c1) AS BIGINT) AS n1,
             |    CAST(SUM(c0) AS BIGINT) AS n0
             |  FROM cum)
             |SELECT MAX(t.n1) AS n1, MAX(t.n0) AS n0,
             |  CAST(SUM(c.c1 * c.lt0) AS BIGINT) AS n_gt,
             |  CAST(SUM(c.c1 * (t.n0 - c.le0)) AS BIGINT) AS n_lt,
             |  CAST(SUM(c.c1 * c.c0) AS BIGINT) AS n_tie,
             |  CAST(floor(CAST(SUM(c.c1 * c.lt0) - SUM(c.c1 * (t.n0 - c.le0))
             |      AS DOUBLE)
             |    / (CAST(MAX(t.n1) AS DOUBLE) * CAST(MAX(t.n0) AS DOUBLE))
             |    * 1000000 + 0.5) AS BIGINT) AS delta_micro
             |FROM cum c CROSS JOIN tot t""".stripMargin)),

    // ----- q285: seasonal/trend strength of the q179 decomposition
    // (Hyndman's STL strength diagnostics): F_s = max(0, 1 −
    // V(R)/V(S+R)) and F_t = max(0, 1 − V(R)/V(T+R)) — "is the
    // weekly pattern real, is the trend real?", the one-number
    // answers q179's row-level output doesn't give. S+R and T+R are
    // exact integer identities of the decomposition (x − T, x − S);
    // variances come from exact BIGINT moments via one double chain
    // each (every operand < 2^63 so the double images are
    // engine-identical), micro-snapped.
    QueryDef(
      "q285_seasonal_strength",
      (s, d) => {
        import s.implicits._
        val daily = Tables.orders(s, d)
          .select(to_date($"o_orderdate").as("day"),
            floor($"o_totalprice" * 100 + lit(0.5)).cast("long").as("cents"))
          .groupBy($"day").agg(sum($"cents").as("xq"))
        // components floor-quantized to DOLLARS before squaring: cent
        // squares summed over the series overflow BIGINT at sf0.1
        // (observed 1.06e20 > 2^63 in the oracle); dollar squares
        // stay exact in both engines
        val dec = graft.operators.Seasonal.decompose(daily, "day", "xq")
          .filter($"trend_q".isNotNull && $"resid_q".isNotNull)
          .select(
            floor(($"xq" - $"trend_q").cast("double") / 100.0)
              .cast("long").as("sr"),                  // S + R, dollars
            floor(($"xq" - $"seasonal_q").cast("double") / 100.0)
              .cast("long").as("tr"),                  // T + R, dollars
            floor($"resid_q".cast("double") / 100.0)
              .cast("long").as("r"))
        def vchain(sx: org.apache.spark.sql.Column,
            sxx: org.apache.spark.sql.Column, n: org.apache.spark.sql.Column) =
          sxx.cast("double") - (sx.cast("double") * sx.cast("double")
            / n.cast("double"))
        dec.agg(count(lit(1)).as("n"),
            sum($"r".cast("decimal(38,0)")).as("sr1"),
            sum(($"r" * $"r").cast("decimal(38,0)")).as("sr2"),
            sum($"sr".cast("decimal(38,0)")).as("ss1"),
            sum(($"sr" * $"sr").cast("decimal(38,0)")).as("ss2"),
            sum($"tr".cast("decimal(38,0)")).as("st1"),
            sum(($"tr" * $"tr").cast("decimal(38,0)")).as("st2"))
          .select($"n",
            floor(greatest(lit(0.0),
                lit(1.0) - vchain($"sr1", $"sr2", $"n")
                  / vchain($"ss1", $"ss2", $"n"))
              * 1000000 + lit(0.5)).cast("long").as("fs_micro"),
            floor(greatest(lit(0.0),
                lit(1.0) - vchain($"sr1", $"sr2", $"n")
                  / vchain($"st1", $"st2", $"n"))
              * 1000000 + lit(0.5)).cast("long").as("ft_micro"))
      },
      Some {
        def v(s1: String, s2: String) =
          s"(CAST($s2 AS DOUBLE) - CAST($s1 AS DOUBLE) * CAST($s1 AS DOUBLE)" +
            " / CAST(n AS DOUBLE))"
        s"""WITH ser AS (
           |  SELECT CAST(o_orderdate AS DATE) AS day,
           |    CAST(SUM(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
           |      AS BIGINT) AS xq
           |  FROM orders GROUP BY 1),
           |rn AS (
           |  SELECT day, xq, CAST(isodow(day) AS BIGINT) AS weekday,
           |    CAST(row_number() OVER (ORDER BY day) AS BIGINT) AS rn
           |  FROM ser),
           |ws AS (
           |  SELECT day, xq, weekday,
           |    CAST(SUM(xq) OVER (ORDER BY rn ROWS BETWEEN 3 PRECEDING
           |      AND 3 FOLLOWING) AS BIGINT) AS s7,
           |    CAST(COUNT(*) OVER (ORDER BY rn ROWS BETWEEN 3 PRECEDING
           |      AND 3 FOLLOWING) AS BIGINT) AS c7
           |  FROM rn),
           |tr AS (
           |  SELECT day, xq, weekday,
           |    CASE WHEN c7 = 7
           |      THEN ${QueryFixtures.fdivSql("s7", "7")} END AS trend_q
           |  FROM ws),
           |sw AS (
           |  SELECT weekday,
           |    ${QueryFixtures.fdivSql("SUM(xq - trend_q)", "COUNT(*)")}
           |      AS seasonal_q
           |  FROM tr WHERE trend_q IS NOT NULL GROUP BY 1),
           |dec AS (
           |  SELECT ${QueryFixtures.fdivSql("t.xq - t.trend_q", "100")} AS sr,
           |    ${QueryFixtures.fdivSql("t.xq - s.seasonal_q", "100")} AS tr2,
           |    ${QueryFixtures.fdivSql(
                  "t.xq - t.trend_q - s.seasonal_q", "100")} AS r
           |  FROM tr t LEFT JOIN sw s USING (weekday)
           |  WHERE t.trend_q IS NOT NULL
           |    AND t.xq - t.trend_q - s.seasonal_q IS NOT NULL),
           |m AS (
           |  SELECT CAST(COUNT(*) AS BIGINT) AS n,
           |    CAST(SUM(r) AS BIGINT) AS sr1,
           |    CAST(SUM(CAST(r AS HUGEINT) * r) AS BIGINT) AS sr2,
           |    CAST(SUM(sr) AS BIGINT) AS ss1,
           |    CAST(SUM(CAST(sr AS HUGEINT) * sr) AS BIGINT) AS ss2,
           |    CAST(SUM(tr2) AS BIGINT) AS st1,
           |    CAST(SUM(CAST(tr2 AS HUGEINT) * tr2) AS BIGINT) AS st2
           |  FROM dec)
           |SELECT n,
           |  CAST(floor(GREATEST(0.0, 1.0 - ${v("sr1", "sr2")}
           |      / ${v("ss1", "ss2")}) * 1000000 + 0.5) AS BIGINT)
           |    AS fs_micro,
           |  CAST(floor(GREATEST(0.0, 1.0 - ${v("sr1", "sr2")}
           |      / ${v("st1", "st2")}) * 1000000 + 0.5) AS BIGINT)
           |    AS ft_micro
           |FROM m""".stripMargin
      }),

    // ----- q296: per-day event-type MIX-ENTROPY trajectory + drift
    // vs the calendar mean — the distribution-shift monitor at daily
    // granularity (q137's PSI compares two fixed windows; q281's JSD
    // two corpora; this asks "which DAYS had an unusual event mix").
    // Per-(day,type) entropy terms are nano-snapped (the q281
    // per-term convention — one ln per term, exact integer sums
    // after), the calendar mean is fdiv.
    QueryDef(
      "q296_entropy_drift",
      (s, d) => {
        import s.implicits._
        val ev = Tables.events(s, d)
          .select(to_date($"ts").as("day"), $"event_type")
        val cnt = ev.groupBy($"day", $"event_type")
          .agg(count(lit(1)).as("c"))
        val tot = cnt.groupBy($"day")
          .agg(sum($"c").as("n"), count(lit(1)).as("k_types"))
        val p = $"c".cast("double") / $"n".cast("double")
        val daily = cnt.join(tot, "day")
          .withColumn("t_nano",
            floor(-p * log(p) * 1e9 + lit(0.5)).cast("long"))
          .groupBy($"day")
          .agg(max($"n").as("n_events"), max($"k_types").as("k_types"),
            sum($"t_nano").as("h_nano"))
        val glob = daily.agg(sum($"h_nano").as("sh"),
          count(lit(1)).as("nd"))
        daily.crossJoin(glob)
          .select($"day", $"n_events", $"k_types", $"h_nano",
            ($"h_nano" -
              expr("CAST(floor(CAST(sh AS DOUBLE) / nd) AS BIGINT)"))
              .as("dev_nano"))
          .orderBy($"day")
      },
      Some("""WITH cnt AS (
             |  SELECT CAST(ts AS DATE) AS day, event_type,
             |    CAST(count(*) AS BIGINT) AS c
             |  FROM events GROUP BY 1, 2),
             |tot AS (
             |  SELECT day, CAST(SUM(c) AS BIGINT) AS n,
             |    CAST(count(*) AS BIGINT) AS k_types
             |  FROM cnt GROUP BY 1),
             |daily AS (
             |  SELECT c.day, MAX(t.n) AS n_events,
             |    MAX(t.k_types) AS k_types,
             |    CAST(SUM(CAST(floor(
             |      -(CAST(c.c AS DOUBLE) / t.n)
             |        * ln(CAST(c.c AS DOUBLE) / t.n) * 1e9 + 0.5)
             |      AS BIGINT)) AS BIGINT) AS h_nano
             |  FROM cnt c JOIN tot t ON c.day = t.day
             |  GROUP BY c.day),
             |gl AS (SELECT CAST(SUM(h_nano) AS BIGINT) AS sh,
             |         CAST(count(*) AS BIGINT) AS nd FROM daily)
             |SELECT d.day, d.n_events, d.k_types, d.h_nano,
             |  d.h_nano - CAST(floor(CAST(g.sh AS DOUBLE) / g.nd)
             |    AS BIGINT) AS dev_nano
             |FROM daily d CROSS JOIN gl g
             |ORDER BY d.day""".stripMargin)),

    // ----- q298: Poisson overdispersion of daily event counts per
    // type — the count-data diagnostic q241's Poisson GLM assumes
    // away: dispersion D = s²/x̄ over the FULL calendar (absent days
    // count 0 — handled arithmetically: zero days add nothing to Σc
    // or Σc², only the global day count n enters), D = 1 under
    // Poisson. Exact rational D via cross-multiplied integers,
    // round-half-up milli; the z-score (D−1)·√((n−1)/2) is one
    // double chain micro-snapped.
    QueryDef(
      "q298_overdispersion",
      (s, d) => {
        import s.implicits._
        val ev = Tables.events(s, d)
          .select(to_date($"ts").as("day"), $"event_type")
        val nd = ev.select($"day").distinct().agg(count(lit(1)).as("n"))
        val per = ev.groupBy($"event_type", $"day")
          .agg(count(lit(1)).as("c"))
          .groupBy($"event_type")
          .agg(sum($"c").as("sc"), sum($"c" * $"c").as("sc2"))
        per.crossJoin(nd)
          .withColumn("num", $"n" * $"sc2" - $"sc" * $"sc")
          .withColumn("den", ($"n" - 1) * $"sc")
          .select($"event_type", $"n".as("n_days"), $"sc".as("sum_c"),
            expr("(2000 * num + den) DIV (2 * den)").as("d_milli"),
            floor((($"num".cast("double") / $"den".cast("double")) - 1.0)
                * sqrt(($"n" - 1).cast("double") / 2.0) * 1e6 + lit(0.5))
              .cast("long").as("z_micro"))
          .orderBy($"event_type")
      },
      Some("""WITH ev AS (
             |  SELECT CAST(ts AS DATE) AS day, event_type FROM events),
             |nd AS (SELECT CAST(count(DISTINCT day) AS BIGINT) AS n FROM ev),
             |per AS (
             |  SELECT event_type, CAST(SUM(c) AS BIGINT) AS sc,
             |    CAST(SUM(c * c) AS BIGINT) AS sc2
             |  FROM (SELECT event_type, day, CAST(count(*) AS BIGINT) AS c
             |        FROM ev GROUP BY 1, 2)
             |  GROUP BY event_type),
             |m AS (
             |  SELECT event_type, nd.n, sc,
             |    nd.n * sc2 - sc * sc AS num, (nd.n - 1) * sc AS den
             |  FROM per CROSS JOIN nd)
             |SELECT event_type, n AS n_days, sc AS sum_c,
             |  CAST((2000 * num + den) // (2 * den) AS BIGINT) AS d_milli,
             |  CAST(floor((CAST(num AS DOUBLE) / CAST(den AS DOUBLE) - 1.0)
             |    * sqrt(CAST(n - 1 AS DOUBLE) / 2.0) * 1e6 + 0.5)
             |    AS BIGINT) AS z_micro
             |FROM m ORDER BY event_type""".stripMargin)),

    // ----- q299: triangular-kernel density smoothing of the invoice
    // price histogram ($100 bins) — the shape view q105's quantiles
    // summarize away (modes, shoulders, gaps). Pure integer
    // convolution: each bin scatters w = 4−|k| for offsets |k| ≤ 3
    // (an explode, NOT a self-join — the 100 TB scatter shape), so
    // smoothed_x16 = Σ w·c is exact; output restricted to occupied
    // bins on both sides.
    QueryDef(
      "q299_kde_smoothing",
      (s, d) => {
        import s.implicits._
        val cnt = Tables.lineitem(s, d)
          .select(expr("CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)" +
            " DIV 10000").as("bin"))
          .groupBy($"bin").agg(count(lit(1)).as("c"))
        val scattered = cnt.select(
            explode(array((-3 to 3).map(k =>
              struct((col("bin") + k).as("tb"),
                (col("c") * (4 - math.abs(k))).as("wc"))): _*)).as("s"))
          .select($"s.tb".as("bin"), $"s.wc")
          .groupBy($"bin").agg(sum($"wc").as("smoothed_x16"))
        cnt.join(scattered, "bin")
          .select($"bin", $"c", $"smoothed_x16")
          .orderBy($"bin")
      },
      Some("""WITH cnt AS (
             |  SELECT CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)
             |    // 10000 AS bin, CAST(count(*) AS BIGINT) AS c
             |  FROM lineitem GROUP BY 1),
             |sc AS (
             |  SELECT cnt.bin + o.k AS bin,
             |    CAST(SUM(cnt.c * (4 - abs(o.k))) AS BIGINT)
             |      AS smoothed_x16
             |  FROM cnt CROSS JOIN (VALUES (-3), (-2), (-1), (0), (1),
             |    (2), (3)) AS o(k)
             |  GROUP BY 1)
             |SELECT cnt.bin, cnt.c, sc.smoothed_x16
             |FROM cnt JOIN sc ON cnt.bin = sc.bin
             |ORDER BY cnt.bin""".stripMargin)),

    // ----- q305: local-level Kalman filter over daily revenue
    // (operators.Kalman) — the state-space member of the SPC family:
    // q181's CUSUM alarms on drift with a FIXED reference, q178's
    // Holt smooths with fixed gains; the Kalman gain anneals from 1
    // toward its steady state as the variance recursion converges.
    // Fully integer state (micro gain, exact round-half-up integer
    // divisions; the one signed rounding is a floor-double mirrored
    // verbatim), so the whole trajectory replays as a recursive CTE
    // (the q181 pattern).
    QueryDef(
      "q305_kalman_level",
      (s, d) => {
        import s.implicits._
        val daily = Tables.orders(s, d)
          .select(to_date($"o_orderdate").as("day"),
            floor($"o_totalprice" * 100 + lit(0.5)).cast("long").as("cents"))
          .groupBy($"day").agg(sum($"cents").as("xq"))
        graft.operators.Kalman.localLevel(daily, "day", "xq")
      },
      Some {
        val r = graft.operators.Kalman.R
        val q = graft.operators.Kalman.Q
        val p0 = graft.operators.Kalman.P0
        s"""WITH RECURSIVE ser AS (
           |  SELECT CAST(o_orderdate AS DATE) AS day,
           |    CAST(SUM(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
           |      AS BIGINT) AS xq
           |  FROM orders GROUP BY 1),
           |rn AS MATERIALIZED (
           |  SELECT day, xq,
           |    CAST(row_number() OVER (ORDER BY day) AS BIGINT) AS rn
           |  FROM ser),
           |st AS (
           |  SELECT day, xq, rn, xq AS l, CAST($p0 AS BIGINT) AS p,
           |    CAST(0 AS BIGINT) AS k
           |  FROM rn WHERE rn = 1
           |  UNION ALL
           |  SELECT r.day, r.xq, r.rn,
           |    st.l + CAST(floor(CAST(
           |        ((2 * (st.p + $q) * 1000000 + (st.p + $q + $r))
           |          // (2 * (st.p + $q + $r))) * (r.xq - st.l)
           |      AS DOUBLE) / 1000000.0 + 0.5) AS BIGINT),
           |    (2 * (1000000 - ((2 * (st.p + $q) * 1000000 + (st.p + $q + $r))
           |        // (2 * (st.p + $q + $r)))) * (st.p + $q) + 1000000)
           |      // (2 * 1000000),
           |    (2 * (st.p + $q) * 1000000 + (st.p + $q + $r))
           |      // (2 * (st.p + $q + $r))
           |  FROM st JOIN rn r ON r.rn = st.rn + 1)
           |SELECT day, xq, l AS level, xq - l AS resid, k AS k_micro
           |FROM st ORDER BY day""".stripMargin
      }),

    // ----- q307: Benjamini–Hochberg FDR control over the per-nation
    // negative-balance association tests — the MULTIPLE-TESTING
    // member the experimentation family needed: 25 simultaneous 2×2
    // χ² tests (nation k vs rest × acctbal < 0), ordered by evidence,
    // rejected up to the largest rank whose statistic clears the BH
    // boundary at FDR α = 0.05. No CDF on either engine: the
    // boundary is pre-inverted once (χ²(1) upper-tail thresholds for
    // k·α/m, embedded as identical integer-micro constants in both
    // the Spark literals and the oracle VALUES), so the procedure is
    // exact integer comparisons over micro-snapped statistics.
    QueryDef(
      "q307_bh_fdr",
      (s, d) => {
        import s.implicits._
        val fl = Tables.customer(s, d).select(
          $"c_nationkey".cast("long").as("nat"), ($"c_acctbal" < 0).as("neg"))
        val tot = fl.agg(count(lit(1)).as("n"),
          sum(when($"neg", 1L).otherwise(0L)).as("c1"))
        val per = fl.groupBy($"nat").agg(count(lit(1)).as("r1"),
          sum(when($"neg", 1L).otherwise(0L)).as("a"))
        val withChi = per.crossJoin(tot)
          .withColumn("b", $"r1" - $"a")
          .withColumn("cc", $"c1" - $"a")
          .withColumn("dd", $"n" - $"r1" - $"c1" + $"a")
          .withColumn("tt", $"a".cast("double") * $"dd".cast("double")
            - $"b".cast("double") * $"cc".cast("double"))
          .withColumn("den", $"r1".cast("double")
            * ($"n" - $"r1").cast("double") * $"c1".cast("double")
            * ($"n" - $"c1").cast("double"))
          .withColumn("chi2_micro",
            when($"den" === 0.0, lit(null).cast("long"))
              .otherwise(floor($"n".cast("double") * $"tt" * $"tt" / $"den"
                * 1000000 + lit(0.5)).cast("long")))
          .select($"nat", $"chi2_micro")
        val ranked = graft.operators.GlobalOrder.zipRank(
          withChi.orderBy($"chi2_micro".desc, $"nat"), "bh_rank")
        val thr = BhThresholds.toDF("bh_rank", "thr_micro")
        val flagged = ranked.join(broadcast(thr), "bh_rank")
        val ks = flagged.agg(
          max(when($"chi2_micro" >= $"thr_micro", $"bh_rank")).as("kstar"))
        flagged.crossJoin(ks)
          .select($"nat".as("nation"), $"chi2_micro", $"bh_rank",
            ($"bh_rank" <= coalesce($"kstar", lit(0L))).as("reject"))
          .orderBy($"bh_rank")
      },
      Some {
        val vals = BhThresholds
          .map { case (k, t) => s"($k, $t)" }.mkString(", ")
        s"""WITH fl AS (
           |  SELECT CAST(c_nationkey AS BIGINT) AS nat,
           |    c_acctbal < 0 AS neg
           |  FROM customer),
           |tot AS (SELECT CAST(count(*) AS BIGINT) AS n,
           |    CAST(SUM(CASE WHEN neg THEN 1 ELSE 0 END) AS BIGINT) AS c1
           |  FROM fl),
           |per AS (SELECT nat, CAST(count(*) AS BIGINT) AS r1,
           |    CAST(SUM(CASE WHEN neg THEN 1 ELSE 0 END) AS BIGINT) AS a
           |  FROM fl GROUP BY 1),
           |chi AS (
           |  SELECT nat,
           |    CASE WHEN CAST(r1 AS DOUBLE) * CAST(n - r1 AS DOUBLE)
           |        * CAST(c1 AS DOUBLE) * CAST(n - c1 AS DOUBLE) = 0
           |      THEN NULL
           |      ELSE CAST(floor(CAST(n AS DOUBLE)
           |        * (CAST(a AS DOUBLE) * CAST(n - r1 - c1 + a AS DOUBLE)
           |          - CAST(r1 - a AS DOUBLE) * CAST(c1 - a AS DOUBLE))
           |        * (CAST(a AS DOUBLE) * CAST(n - r1 - c1 + a AS DOUBLE)
           |          - CAST(r1 - a AS DOUBLE) * CAST(c1 - a AS DOUBLE))
           |        / (CAST(r1 AS DOUBLE) * CAST(n - r1 AS DOUBLE)
           |          * CAST(c1 AS DOUBLE) * CAST(n - c1 AS DOUBLE))
           |        * 1000000 + 0.5) AS BIGINT) END AS chi2_micro
           |  FROM per CROSS JOIN tot),
           |rk AS (
           |  SELECT nat, chi2_micro,
           |    CAST(ROW_NUMBER() OVER (ORDER BY chi2_micro DESC, nat)
           |      AS BIGINT) AS bh_rank
           |  FROM chi),
           |th (bh_rank, thr) AS (VALUES $vals),
           |ks AS (
           |  SELECT MAX(CASE WHEN rk.chi2_micro >= th.thr
           |    THEN rk.bh_rank END) AS kstar
           |  FROM rk JOIN th ON rk.bh_rank = th.bh_rank)
           |SELECT rk.nat AS nation, rk.chi2_micro, rk.bh_rank,
           |  rk.bh_rank <= COALESCE(ks.kstar, 0) AS reject
           |FROM rk CROSS JOIN ks ORDER BY bh_rank""".stripMargin
      }),

    // ----- q302: covariate-balance audit (standardized mean
    // differences) between purchasers and non-purchasers — the
    // PRE-ANALYSIS gate the experimentation family (q233 CUPED, q240
    // DiD) assumes: |SMD| ≳ 0.1 says the groups differ on a
    // covariate before any effect is read. Per-user covariates are
    // exact integers; each SMD is ONE fixed double chain over the
    // exact group moments (products like n·Σx² exceed int64, so both
    // engines compute the identical all-double chain — parity by
    // operation shape, the q170 convention), micro-snapped.
    QueryDef(
      "q302_covariate_balance",
      (s, d) => {
        import s.implicits._
        val perUser = Tables.events(s, d)
          .groupBy($"user_id")
          .agg(
            max(when($"event_type" === "purchase", 1L).otherwise(0L)).as("t"),
            count(lit(1)).as("n_ev"),
            count_distinct(to_date($"ts")).as("n_days"),
            sum(floor($"value" * 100 + lit(0.5)).cast("long")).as("vq"))
        val covs = Seq("n_ev", "n_days", "vq")
        val aggs = covs.flatMap { cv =>
          Seq(sum(when($"t" === 1, col(cv)).otherwise(0L)).as(s"st_$cv"),
            sum(when($"t" === 0, col(cv)).otherwise(0L)).as(s"sc_$cv"),
            sum(when($"t" === 1, col(cv) * col(cv)).otherwise(0L))
              .as(s"stt_$cv"),
            sum(when($"t" === 0, col(cv) * col(cv)).otherwise(0L))
              .as(s"scc_$cv"))
        } ++ Seq(sum($"t").as("nt"),
          sum(when($"t" === 0, 1L).otherwise(0L)).as("nc"))
        val one = perUser.agg(aggs.head, aggs.tail: _*)
        covs.map { cv =>
          val smd = expr(
            s"""CASE WHEN nt > 1 AND nc > 1 THEN
               |  CAST(floor(
               |    (CAST(st_$cv AS DOUBLE) / nt - CAST(sc_$cv AS DOUBLE) / nc)
               |    / sqrt(((CAST(nt AS DOUBLE) * CAST(stt_$cv AS DOUBLE)
               |        - CAST(st_$cv AS DOUBLE) * CAST(st_$cv AS DOUBLE))
               |        / (CAST(nt AS DOUBLE) * (CAST(nt AS DOUBLE) - 1))
               |      + (CAST(nc AS DOUBLE) * CAST(scc_$cv AS DOUBLE)
               |        - CAST(sc_$cv AS DOUBLE) * CAST(sc_$cv AS DOUBLE))
               |        / (CAST(nc AS DOUBLE) * (CAST(nc AS DOUBLE) - 1)))
               |      / 2)
               |    * 1000000 + 0.5) AS BIGINT)
               |ELSE NULL END""".stripMargin)
          one.select(lit(cv).as("covariate"), $"nt", $"nc",
            smd.as("smd_micro"))
        }.reduce(_ unionAll _).orderBy($"covariate")
      },
      Some {
        def smdSql(cv: String): String =
          s"""CASE WHEN nt > 1 AND nc > 1 THEN
             |  CAST(floor(
             |    (CAST(st_$cv AS DOUBLE) / nt - CAST(sc_$cv AS DOUBLE) / nc)
             |    / sqrt(((CAST(nt AS DOUBLE) * CAST(stt_$cv AS DOUBLE)
             |        - CAST(st_$cv AS DOUBLE) * CAST(st_$cv AS DOUBLE))
             |        / (CAST(nt AS DOUBLE) * (CAST(nt AS DOUBLE) - 1))
             |      + (CAST(nc AS DOUBLE) * CAST(scc_$cv AS DOUBLE)
             |        - CAST(sc_$cv AS DOUBLE) * CAST(sc_$cv AS DOUBLE))
             |        / (CAST(nc AS DOUBLE) * (CAST(nc AS DOUBLE) - 1)))
             |      / 2)
             |    * 1000000 + 0.5) AS BIGINT)
             |ELSE NULL END""".stripMargin
        val arms = Seq("n_ev", "n_days", "vq").map(cv =>
          s"""SELECT '$cv' AS covariate, nt, nc,
             |  ${smdSql(cv)} AS smd_micro
             |FROM m""".stripMargin)
        s"""WITH pu AS (
           |  SELECT user_id,
           |    MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
           |      AS t,
           |    CAST(count(*) AS BIGINT) AS n_ev,
           |    CAST(count(DISTINCT CAST(ts AS DATE)) AS BIGINT) AS n_days,
           |    CAST(SUM(CAST(floor(value * 100 + 0.5) AS BIGINT))
           |      AS BIGINT) AS vq
           |  FROM events GROUP BY 1),
           |m AS (
           |  SELECT CAST(SUM(t) AS BIGINT) AS nt,
           |    CAST(SUM(CASE WHEN t = 0 THEN 1 ELSE 0 END) AS BIGINT)
           |      AS nc,
           |    ${Seq("n_ev", "n_days", "vq").flatMap(cv => Seq(
              s"CAST(SUM(CASE WHEN t = 1 THEN $cv ELSE 0 END) AS BIGINT) AS st_$cv",
              s"CAST(SUM(CASE WHEN t = 0 THEN $cv ELSE 0 END) AS BIGINT) AS sc_$cv",
              s"CAST(SUM(CASE WHEN t = 1 THEN $cv * $cv ELSE 0 END) AS BIGINT) AS stt_$cv",
              s"CAST(SUM(CASE WHEN t = 0 THEN $cv * $cv ELSE 0 END) AS BIGINT) AS scc_$cv"))
             .mkString(",\n    ")}
           |  FROM pu)
           |SELECT * FROM (
           |${arms.mkString("\nUNION ALL\n")})
           |ORDER BY covariate""".stripMargin
      }),

    // ----- q303: Simpson's-paradox detector — does the
    // discount↔quantity association FLIP sign inside any returnflag
    // stratum vs the pooled data? The aggregation-trap audit every
    // dashboard rollup needs (the pooled slope is a q194-style OLS
    // numerator; strata are the natural segmentation). ENTIRELY
    // exact: slope signs come from the integer numerator
    // n·Σxy − Σx·Σy lifted to decimal(38,0)/HUGEINT (it exceeds
    // int64 at scale), never from a double.
    QueryDef(
      "q303_simpson_detector",
      (s, d) => {
        import s.implicits._
        val rows = Tables.lineitem(s, d).select(
          $"l_returnflag".as("grp"),
          floor($"l_discount" * 100 + lit(0.5)).cast("long").as("x"),
          floor($"l_quantity" * 100 + lit(0.5)).cast("long").as("y"))
        def signed(df: org.apache.spark.sql.DataFrame) = df
          .withColumn("num",
            $"n".cast("decimal(38,0)") * $"sxy".cast("decimal(38,0)")
              - $"sx".cast("decimal(38,0)") * $"sy".cast("decimal(38,0)"))
          .withColumn("sgn",
            when($"num" > 0, 1L).when($"num" < 0, -1L).otherwise(0L))
        val per = signed(rows.groupBy($"grp").agg(count(lit(1)).as("n"),
          sum($"x").as("sx"), sum($"y").as("sy"),
          sum($"x" * $"y").as("sxy")))
        val all = signed(rows.groupBy().agg(count(lit(1)).as("n"),
          sum($"x").as("sx"), sum($"y").as("sy"),
          sum($"x" * $"y").as("sxy")))
          .select($"n".as("n_all"), $"sgn".as("sign_all"))
        per.crossJoin(all)
          .select($"grp", $"n", $"sgn".as("sign_grp"), $"sign_all",
            ($"sgn" * $"sign_all" === -1).as("reversal"))
          .unionAll(all.select(lit("ALL").as("grp"), $"n_all".as("n"),
            $"sign_all".as("sign_grp"), $"sign_all",
            lit(false).as("reversal")))
          .orderBy($"grp")
      },
      Some("""WITH rows_ AS (
             |  SELECT l_returnflag AS grp,
             |    CAST(floor(l_discount * 100 + 0.5) AS BIGINT) AS x,
             |    CAST(floor(l_quantity * 100 + 0.5) AS BIGINT) AS y
             |  FROM lineitem),
             |per AS (
             |  SELECT grp, CAST(count(*) AS BIGINT) AS n,
             |    CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
             |    CAST(SUM(x * y) AS BIGINT) AS sxy
             |  FROM rows_ GROUP BY 1),
             |psg AS (
             |  SELECT grp, n,
             |    CASE WHEN CAST(n AS HUGEINT) * sxy
             |        - CAST(sx AS HUGEINT) * sy > 0 THEN 1
             |      WHEN CAST(n AS HUGEINT) * sxy
             |        - CAST(sx AS HUGEINT) * sy < 0 THEN -1
             |      ELSE 0 END AS sign_grp
             |  FROM per),
             |al AS (
             |  SELECT CAST(count(*) AS BIGINT) AS n,
             |    CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
             |    CAST(SUM(x * y) AS BIGINT) AS sxy
             |  FROM rows_),
             |asg AS (
             |  SELECT n,
             |    CASE WHEN CAST(n AS HUGEINT) * sxy
             |        - CAST(sx AS HUGEINT) * sy > 0 THEN 1
             |      WHEN CAST(n AS HUGEINT) * sxy
             |        - CAST(sx AS HUGEINT) * sy < 0 THEN -1
             |      ELSE 0 END AS sign_all
             |  FROM al)
             |SELECT * FROM (
             |  SELECT p.grp, p.n, CAST(p.sign_grp AS BIGINT) AS sign_grp,
             |    CAST(a.sign_all AS BIGINT) AS sign_all,
             |    p.sign_grp * a.sign_all = -1 AS reversal
             |  FROM psg p CROSS JOIN asg a
             |  UNION ALL
             |  SELECT 'ALL', a.n, CAST(a.sign_all AS BIGINT),
             |    CAST(a.sign_all AS BIGINT), FALSE
             |  FROM asg a)
             |ORDER BY grp""".stripMargin)),

    // ----- q315: ordinal association — Goodman–Kruskal gamma and
    // BOTH Somers' D asymmetries between quantity (integral units)
    // and discount (percent steps), the heavy-tie regime where
    // q189's τ-b under-reads. Same hash-capped portable-order
    // sample discipline (pair count bounded at ANY scale by design);
    // concordant/discordant/tie counts are exact BIGINTs from one
    // a<b broadcast pair join; the three ratios are sign-safe
    // single-division double chains, micro-snapped, NULL on empty
    // denominators.
    QueryDef(
      "q315_ordinal_association",
      (s, d) => {
        import s.implicits._
        val base = Tables.lineitem(s, d).select(
          ($"l_orderkey" * 8 + $"l_linenumber").as("rk"),
          floor($"l_quantity" + lit(0.5)).cast("long").as("x"),
          floor($"l_discount" * 100 + lit(0.5)).cast("long").as("y"))
        val sample = base
          .withColumn("hf", Sampling.hashFraction($"rk", 315L))
          .orderBy($"hf", $"rk").limit(2000)
          .select($"rk", $"x", $"y")
          .transform(graft.operators.Iterate.truncate)
        val a = sample.select($"rk".as("ra"), $"x".as("xa"), $"y".as("ya"))
        val b = sample.select($"rk".as("rb"), $"x".as("xb"), $"y".as("yb"))
        val agg = a.join(broadcast(b), $"ra" < $"rb").agg(
          sum(when(($"xa" - $"xb") * ($"ya" - $"yb") > 0, 1L).otherwise(0L))
            .as("c"),
          sum(when(($"xa" - $"xb") * ($"ya" - $"yb") < 0, 1L).otherwise(0L))
            .as("dd"),
          sum(when($"xa" === $"xb" && $"ya" =!= $"yb", 1L).otherwise(0L))
            .as("tx"),
          sum(when($"ya" === $"yb" && $"xa" =!= $"xb", 1L).otherwise(0L))
            .as("ty"),
          count(lit(1)).as("n0"))
        def d2(c: org.apache.spark.sql.Column) = c.cast("double")
        def ratio(den: org.apache.spark.sql.Column, nm: String) =
          when(den === 0L, lit(null).cast("long"))
            .otherwise(floor((d2($"c") - d2($"dd")) / d2(den)
              * 1000000 + lit(0.5)).cast("long")).as(nm)
        agg.select($"n0", $"c", $"dd", $"tx", $"ty",
          ratio($"c" + $"dd", "gamma_micro"),
          ratio($"c" + $"dd" + $"ty", "somers_yx_micro"),
          ratio($"c" + $"dd" + $"tx", "somers_xy_micro"))
      },
      Some(s"""WITH base AS (
             |  SELECT l_orderkey * 8 + l_linenumber AS rk,
             |    CAST(floor(l_quantity + 0.5) AS BIGINT) AS x,
             |    CAST(floor(l_discount * 100 + 0.5) AS BIGINT) AS y
             |  FROM lineitem),
             |sample AS MATERIALIZED (
             |  SELECT rk, x, y FROM (
             |    SELECT rk, x, y, ${Sampling.hashFractionSql("rk", 315L)} AS hf
             |    FROM base)
             |  ORDER BY hf, rk LIMIT 2000),
             |agg AS (
             |  SELECT
             |    CAST(SUM(CASE WHEN (a.x - b.x) * (a.y - b.y) > 0
             |      THEN 1 ELSE 0 END) AS BIGINT) AS c,
             |    CAST(SUM(CASE WHEN (a.x - b.x) * (a.y - b.y) < 0
             |      THEN 1 ELSE 0 END) AS BIGINT) AS dd,
             |    CAST(SUM(CASE WHEN a.x = b.x AND a.y <> b.y
             |      THEN 1 ELSE 0 END) AS BIGINT) AS tx,
             |    CAST(SUM(CASE WHEN a.y = b.y AND a.x <> b.x
             |      THEN 1 ELSE 0 END) AS BIGINT) AS ty,
             |    CAST(COUNT(*) AS BIGINT) AS n0
             |  FROM sample a JOIN sample b ON a.rk < b.rk)
             |SELECT n0, c, dd, tx, ty,
             |  CASE WHEN c + dd = 0 THEN NULL
             |    ELSE CAST(floor((CAST(c AS DOUBLE) - CAST(dd AS DOUBLE))
             |      / CAST(c + dd AS DOUBLE) * 1000000 + 0.5) AS BIGINT)
             |    END AS gamma_micro,
             |  CASE WHEN c + dd + ty = 0 THEN NULL
             |    ELSE CAST(floor((CAST(c AS DOUBLE) - CAST(dd AS DOUBLE))
             |      / CAST(c + dd + ty AS DOUBLE) * 1000000 + 0.5) AS BIGINT)
             |    END AS somers_yx_micro,
             |  CASE WHEN c + dd + tx = 0 THEN NULL
             |    ELSE CAST(floor((CAST(c AS DOUBLE) - CAST(dd AS DOUBLE))
             |      / CAST(c + dd + tx AS DOUBLE) * 1000000 + 0.5) AS BIGINT)
             |    END AS somers_xy_micro
             |FROM agg""".stripMargin)),

    // ----- q321: Mantel–Haenszel stratified 2×2 analysis — the
    // CONFOUNDER-ADJUSTED association member next to q307's marginal
    // χ² tests and q303's Simpson detector (which flags the reversal
    // this estimator corrects): exposure = BUILDING segment,
    // outcome = negative balance, strata = region. The MH common
    // odds ratio Σ(aᵢdᵢ/nᵢ)/Σ(bᵢcᵢ/nᵢ) and the CMH statistic
    // (Σaᵢ−ΣEᵢ)²/ΣVᵢ use per-stratum micro-snapped rationals (the
    // q165 per-factor snap discipline: strata-count-bounded, so the
    // integer sums are order-free), one double chain each at the
    // end. Counts exact; degenerate denominators NULL.
    QueryDef(
      "q321_mantel_haenszel",
      (s, d) => {
        import s.implicits._
        val fl = Tables.customer(s, d)
          .join(broadcast(Tables.nation(s, d)),
            $"c_nationkey" === $"n_nationkey")
          .join(broadcast(Tables.region(s, d)),
            $"n_regionkey" === $"r_regionkey")
          .select($"r_name",
            ($"c_mktsegment" === "BUILDING").as("exp"),
            ($"c_acctbal" < 0).as("out"))
        val strat = fl.groupBy($"r_name").agg(
          sum(when($"exp" && $"out", 1L).otherwise(0L)).as("a"),
          sum(when($"exp" && !$"out", 1L).otherwise(0L)).as("b"),
          sum(when(!$"exp" && $"out", 1L).otherwise(0L)).as("c"),
          sum(when(!$"exp" && !$"out", 1L).otherwise(0L)).as("d"))
        def db(c: org.apache.spark.sql.Column) = c.cast("double")
        val n = $"a" + $"b" + $"c" + $"d"
        val (r1, r0) = ($"a" + $"b", $"c" + $"d")
        val (c1, c0) = ($"a" + $"c", $"b" + $"d")
        val per = strat.select($"a",
          floor(db($"a") * db($"d") / db(n) * 1000000 + lit(0.5))
            .cast("long").as("rnum"),
          floor(db($"b") * db($"c") / db(n) * 1000000 + lit(0.5))
            .cast("long").as("rden"),
          floor(db(r1) * db(c1) / db(n) * 1000000 + lit(0.5))
            .cast("long").as("e"),
          floor(db(r1) * db(r0) * db(c1) * db(c0)
            / (db(n) * db(n) * (db(n) - lit(1.0))) * 1000000 + lit(0.5))
            .cast("long").as("v"))
        val agg = per.agg(count(lit(1)).as("n_strata"),
          sum($"a" * 1000000L).as("sa"),
          sum($"rnum").as("sr"), sum($"rden").as("ss"),
          sum($"e").as("se"), sum($"v").as("sv"))
        agg.select($"n_strata",
          ($"sa" - $"se").as("excess_micro"),
          when($"ss" === 0L, lit(null).cast("long"))
            .otherwise(floor(db($"sr") / db($"ss") * 1000000 + lit(0.5))
              .cast("long")).as("mh_or_micro"),
          when($"sv" === 0L, lit(null).cast("long"))
            .otherwise(floor(db($"sa" - $"se") * db($"sa" - $"se")
                / (lit(1000000.0) * db($"sv")) * 1000000 + lit(0.5))
              .cast("long")).as("cmh_chi2_micro"))
      },
      Some("""WITH fl AS (
             |  SELECT r.r_name,
             |    c.c_mktsegment = 'BUILDING' AS exp,
             |    c.c_acctbal < 0 AS outc
             |  FROM customer c
             |  JOIN nation n ON c.c_nationkey = n.n_nationkey
             |  JOIN region r ON n.n_regionkey = r.r_regionkey),
             |strat AS (
             |  SELECT r_name,
             |    CAST(SUM(CASE WHEN exp AND outc THEN 1 ELSE 0 END)
             |      AS BIGINT) AS a,
             |    CAST(SUM(CASE WHEN exp AND NOT outc THEN 1 ELSE 0 END)
             |      AS BIGINT) AS b,
             |    CAST(SUM(CASE WHEN NOT exp AND outc THEN 1 ELSE 0 END)
             |      AS BIGINT) AS c,
             |    CAST(SUM(CASE WHEN NOT exp AND NOT outc THEN 1 ELSE 0 END)
             |      AS BIGINT) AS d
             |  FROM fl GROUP BY 1),
             |per AS (
             |  SELECT a,
             |    CAST(floor(CAST(a AS DOUBLE) * CAST(d AS DOUBLE)
             |      / CAST(a + b + c + d AS DOUBLE) * 1000000 + 0.5)
             |      AS BIGINT) AS rnum,
             |    CAST(floor(CAST(b AS DOUBLE) * CAST(c AS DOUBLE)
             |      / CAST(a + b + c + d AS DOUBLE) * 1000000 + 0.5)
             |      AS BIGINT) AS rden,
             |    CAST(floor(CAST(a + b AS DOUBLE) * CAST(a + c AS DOUBLE)
             |      / CAST(a + b + c + d AS DOUBLE) * 1000000 + 0.5)
             |      AS BIGINT) AS e,
             |    CAST(floor(CAST(a + b AS DOUBLE) * CAST(c + d AS DOUBLE)
             |      * CAST(a + c AS DOUBLE) * CAST(b + d AS DOUBLE)
             |      / (CAST(a + b + c + d AS DOUBLE)
             |         * CAST(a + b + c + d AS DOUBLE)
             |         * (CAST(a + b + c + d AS DOUBLE) - 1.0))
             |      * 1000000 + 0.5) AS BIGINT) AS v
             |  FROM strat),
             |agg AS (
             |  SELECT CAST(COUNT(*) AS BIGINT) AS n_strata,
             |    CAST(SUM(a * 1000000) AS BIGINT) AS sa,
             |    CAST(SUM(rnum) AS BIGINT) AS sr,
             |    CAST(SUM(rden) AS BIGINT) AS ss,
             |    CAST(SUM(e) AS BIGINT) AS se,
             |    CAST(SUM(v) AS BIGINT) AS sv
             |  FROM per)
             |SELECT n_strata,
             |  sa - se AS excess_micro,
             |  CASE WHEN ss = 0 THEN NULL
             |    ELSE CAST(floor(CAST(sr AS DOUBLE) / CAST(ss AS DOUBLE)
             |      * 1000000 + 0.5) AS BIGINT) END AS mh_or_micro,
             |  CASE WHEN sv = 0 THEN NULL
             |    ELSE CAST(floor(CAST(sa - se AS DOUBLE)
             |      * CAST(sa - se AS DOUBLE)
             |      / (1000000.0 * CAST(sv AS DOUBLE))
             |      * 1000000 + 0.5) AS BIGINT) END AS cmh_chi2_micro
             |FROM agg""".stripMargin)),

    // ----- q323: prospective power analysis — the two-proportion
    // sample-size calculation an experimentation program runs BEFORE
    // q167's z-test reads anything: n per arm =
    // (z_{α/2}+z_β)²·(p₁q₁+p₂q₂)/(p₁−p₂)² at α=0.05, power=0.8,
    // with the observed BUILDING-vs-rest negative-balance rates as
    // the planning effect. The two normal quantiles are INLINED
    // literal constants (identical text both engines — the q201
    // libm-snap discipline); rates and the chain are ONE double
    // sequence over exact counts, NULL when the observed effect is
    // zero.
    QueryDef(
      "q323_power_sample_size",
      (s, d) => {
        import s.implicits._
        val fl = Tables.customer(s, d).select(
          ($"c_mktsegment" === "BUILDING").as("exp"),
          ($"c_acctbal" < 0).as("out"))
        val agg = fl.agg(
          sum(when($"exp", 1L).otherwise(0L)).as("n1"),
          sum(when($"exp" && $"out", 1L).otherwise(0L)).as("k1"),
          sum(when(!$"exp", 1L).otherwise(0L)).as("n2"),
          sum(when(!$"exp" && $"out", 1L).otherwise(0L)).as("k2"))
        def db(c: org.apache.spark.sql.Column) = c.cast("double")
        val p1 = db($"k1") / db($"n1")
        val p2 = db($"k2") / db($"n2")
        val zsum = lit(1.959963984540054) + lit(0.8416212335729143)
        val nreq = zsum * zsum *
          (p1 * (lit(1.0) - p1) + p2 * (lit(1.0) - p2)) /
          ((p1 - p2) * (p1 - p2))
        agg.select($"n1", $"k1", $"n2", $"k2",
          floor(p1 * 1000000 + lit(0.5)).cast("long").as("p1_micro"),
          floor(p2 * 1000000 + lit(0.5)).cast("long").as("p2_micro"),
          when(p1 === p2, lit(null).cast("long"))
            .otherwise(ceil(nreq).cast("long")).as("n_per_arm"))
      },
      Some("""WITH fl AS (
             |  SELECT c_mktsegment = 'BUILDING' AS exp,
             |    c_acctbal < 0 AS outc
             |  FROM customer),
             |agg AS (
             |  SELECT
             |    CAST(SUM(CASE WHEN exp THEN 1 ELSE 0 END) AS BIGINT) AS n1,
             |    CAST(SUM(CASE WHEN exp AND outc THEN 1 ELSE 0 END)
             |      AS BIGINT) AS k1,
             |    CAST(SUM(CASE WHEN NOT exp THEN 1 ELSE 0 END)
             |      AS BIGINT) AS n2,
             |    CAST(SUM(CASE WHEN NOT exp AND outc THEN 1 ELSE 0 END)
             |      AS BIGINT) AS k2
             |  FROM fl)
             |SELECT n1, k1, n2, k2,
             |  CAST(floor(CAST(k1 AS DOUBLE) / CAST(n1 AS DOUBLE)
             |    * 1000000 + 0.5) AS BIGINT) AS p1_micro,
             |  CAST(floor(CAST(k2 AS DOUBLE) / CAST(n2 AS DOUBLE)
             |    * 1000000 + 0.5) AS BIGINT) AS p2_micro,
             |  CASE WHEN CAST(k1 AS DOUBLE) / CAST(n1 AS DOUBLE)
             |      = CAST(k2 AS DOUBLE) / CAST(n2 AS DOUBLE) THEN NULL
             |    ELSE CAST(ceil(
             |      (1.959963984540054 + 0.8416212335729143)
             |      * (1.959963984540054 + 0.8416212335729143)
             |      * (CAST(k1 AS DOUBLE) / CAST(n1 AS DOUBLE)
             |          * (1.0 - CAST(k1 AS DOUBLE) / CAST(n1 AS DOUBLE))
             |        + CAST(k2 AS DOUBLE) / CAST(n2 AS DOUBLE)
             |          * (1.0 - CAST(k2 AS DOUBLE) / CAST(n2 AS DOUBLE)))
             |      / ((CAST(k1 AS DOUBLE) / CAST(n1 AS DOUBLE)
             |          - CAST(k2 AS DOUBLE) / CAST(n2 AS DOUBLE))
             |        * (CAST(k1 AS DOUBLE) / CAST(n1 AS DOUBLE)
             |          - CAST(k2 AS DOUBLE) / CAST(n2 AS DOUBLE))))
             |      AS BIGINT) END AS n_per_arm
             |FROM agg""".stripMargin)),

    // ----- q327: price elasticity of demand — the log-log OLS
    // member of the econometrics family (q102 grouped OLS, q194
    // multiple regression are linear-scale): elasticity = slope of
    // ln(quantity) on ln(unit price) across lineitems, the constant-
    // elasticity model's one parameter. Unit price is exact cents
    // per unit (an integer ppm-style division); both logs r4-snapped
    // per row (the q322 libm discipline), moments EXACT BIGINT sums,
    // slope/intercept ONE double chain each, NULL on a degenerate
    // spread.
    QueryDef(
      "q327_price_elasticity",
      (s, d) => {
        import s.implicits._
        val rows = Tables.lineitem(s, d).select(
          floor($"l_quantity" + lit(0.5)).cast("long").as("q"),
          floor($"l_extendedprice" * 100 + lit(0.5)).cast("long").as("cents"))
          .filter($"q" >= 1)
          .select($"q", expr("cents DIV q").as("unit_cents"))
          .filter($"unit_cents" >= 1)
          .select(
            floor(log($"unit_cents".cast("double")) * 10000 + lit(0.5))
              .cast("long").as("lx"),
            floor(log($"q".cast("double")) * 10000 + lit(0.5))
              .cast("long").as("ly"))
        val mo = rows.agg(count(lit(1)).as("n"),
          sum($"lx").as("sx"), sum($"ly").as("sy"),
          sum($"lx" * $"lx").as("sxx"), sum($"lx" * $"ly").as("sxy"))
        def db(c: org.apache.spark.sql.Column) = c.cast("double")
        val den = db($"n") * db($"sxx") - db($"sx") * db($"sx")
        val b1 = (db($"n") * db($"sxy") - db($"sx") * db($"sy")) / den
        val bad = $"n" < 2 || den === 0.0
        mo.select($"n",
          when(bad, lit(null).cast("long"))
            .otherwise(floor(b1 * 1000000 + lit(0.5)).cast("long"))
            .as("elasticity_micro"),
          when(bad, lit(null).cast("long"))
            .otherwise(floor((db($"sy") / db($"n") - b1 * (db($"sx") / db($"n")))
              * 100.0 + lit(0.5)).cast("long"))
            .as("intercept_micro"))
      },
      Some("""WITH rows0 AS (
             |  SELECT CAST(floor(l_quantity + 0.5) AS BIGINT) AS q,
             |    CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS cents
             |  FROM lineitem),
             |rows1 AS (
             |  SELECT q, cents // q AS unit_cents FROM rows0 WHERE q >= 1),
             |pts AS (
             |  SELECT
             |    CAST(floor(ln(CAST(unit_cents AS DOUBLE)) * 10000 + 0.5)
             |      AS BIGINT) AS lx,
             |    CAST(floor(ln(CAST(q AS DOUBLE)) * 10000 + 0.5)
             |      AS BIGINT) AS ly
             |  FROM rows1 WHERE unit_cents >= 1),
             |mo AS (
             |  SELECT CAST(COUNT(*) AS BIGINT) AS n,
             |    CAST(SUM(lx) AS BIGINT) AS sx,
             |    CAST(SUM(ly) AS BIGINT) AS sy,
             |    CAST(SUM(lx * lx) AS BIGINT) AS sxx,
             |    CAST(SUM(lx * ly) AS BIGINT) AS sxy
             |  FROM pts),
             |ch AS (
             |  SELECT n,
             |    CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
             |      - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) AS den,
             |    (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
             |      - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
             |      / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
             |        - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) AS b1,
             |    CAST(sx AS DOUBLE) AS sxd, CAST(sy AS DOUBLE) AS syd,
             |    CAST(n AS DOUBLE) AS nd
             |  FROM mo)
             |SELECT n,
             |  CASE WHEN n < 2 OR den = 0.0 THEN NULL
             |    ELSE CAST(floor(b1 * 1000000 + 0.5) AS BIGINT)
             |    END AS elasticity_micro,
             |  CASE WHEN n < 2 OR den = 0.0 THEN NULL
             |    ELSE CAST(floor((syd / nd - b1 * (sxd / nd)) * 100.0 + 0.5)
             |      AS BIGINT) END AS intercept_micro
             |FROM ch""".stripMargin)),

    // ----- q329: Bartlett's test of variance homogeneity across
    // region account-balance distributions — the PARAMETRIC
    // (normality-assuming, variance-ratio-sensitive) counterpart of
    // q273's robust Brown–Forsythe. Balances at DOLLAR grain keep
    // ni·Σx² below the exact HUGEINT→DOUBLE window (headroom ~sf10,
    // the q267 discipline). Per-group: exact moments, ln s²
    // micro-snapped, (nᵢ−1)·s² round-snapped, 1/(nᵢ−1) an exact
    // nano integer division — all group-count-bounded order-free
    // integer sums (the q165 per-factor discipline); the statistic
    // and its C correction are ONE double chain each.
    QueryDef(
      "q329_bartlett",
      (s, d) => {
        import s.implicits._
        val rows = Tables.customer(s, d)
          .join(broadcast(Tables.nation(s, d)),
            $"c_nationkey" === $"n_nationkey")
          .join(broadcast(Tables.region(s, d)),
            $"n_regionkey" === $"r_regionkey")
          .select($"r_name",
            floor($"c_acctbal" + lit(0.5)).cast("long").as("x"))
        val grp = rows.groupBy($"r_name").agg(
          count(lit(1)).as("ni"),
          sum($"x".cast("decimal(38,0)")).as("si"),
          sum($"x".cast("decimal(38,0)") * $"x").as("ssi"))
        def db(c: org.apache.spark.sql.Column) = c.cast("double")
        val varnum = $"ni".cast("decimal(38,0)") * $"ssi" - $"si" * $"si"
        val per = grp
          .select($"ni", varnum.as("vn"))
          .filter($"ni" >= 2 && $"vn" > 0)
          .select($"ni",
            floor(log(db($"vn") / (db($"ni") * (db($"ni") - lit(1.0))))
              * 1000000 + lit(0.5)).cast("long").as("lnsi2"),
            floor(db($"vn") / db($"ni") + lit(0.5)).cast("long").as("wp"),
            expr("1000000000 DIV (ni - 1)").as("inv_nano"))
        val agg = per.agg(count(lit(1)).as("k"),
          sum($"ni").as("ntot"), sum($"wp").as("sw"),
          sum(($"ni" - 1L) * $"lnsi2").as("sl"),
          sum($"inv_nano").as("sinv"))
        val withLn = agg.select($"k", $"ntot", $"sl", $"sinv",
          floor(log(db($"sw") / (db($"ntot") - db($"k")))
            * 1000000 + lit(0.5)).cast("long").as("lnsp"))
        val cChain = lit(1.0) +
          (db($"sinv") / lit(1.0e9) - lit(1.0) / (db($"ntot") - db($"k"))) /
          (lit(3.0) * (db($"k") - lit(1.0)))
        withLn.select($"k".as("k_groups"), $"ntot".as("n_total"),
          when($"k" < 2, lit(null).cast("long"))
            .otherwise(floor(cChain * 1000000 + lit(0.5)).cast("long"))
            .as("c_micro"),
          when($"k" < 2, lit(null).cast("long"))
            .otherwise(floor(
              db(($"ntot" - $"k") * $"lnsp" - $"sl") / cChain + lit(0.5))
              .cast("long"))
            .as("bartlett_micro"))
      },
      Some("""WITH rows0 AS (
             |  SELECT r.r_name,
             |    CAST(floor(c.c_acctbal + 0.5) AS BIGINT) AS x
             |  FROM customer c
             |  JOIN nation n ON c.c_nationkey = n.n_nationkey
             |  JOIN region r ON n.n_regionkey = r.r_regionkey),
             |grp AS (
             |  SELECT r_name, CAST(COUNT(*) AS BIGINT) AS ni,
             |    SUM(CAST(x AS HUGEINT)) AS si,
             |    SUM(CAST(x AS HUGEINT) * x) AS ssi
             |  FROM rows0 GROUP BY 1),
             |per AS (
             |  SELECT ni,
             |    CAST(floor(ln(CAST(vn AS DOUBLE)
             |      / (CAST(ni AS DOUBLE) * (CAST(ni AS DOUBLE) - 1.0)))
             |      * 1000000 + 0.5) AS BIGINT) AS lnsi2,
             |    CAST(floor(CAST(vn AS DOUBLE) / CAST(ni AS DOUBLE) + 0.5)
             |      AS BIGINT) AS wp,
             |    1000000000 // (ni - 1) AS inv_nano
             |  FROM (SELECT ni, CAST(ni AS HUGEINT) * ssi - si * si AS vn
             |        FROM grp)
             |  WHERE ni >= 2 AND vn > 0),
             |agg AS (
             |  SELECT CAST(COUNT(*) AS BIGINT) AS k,
             |    CAST(SUM(ni) AS BIGINT) AS ntot,
             |    CAST(SUM(wp) AS BIGINT) AS sw,
             |    CAST(SUM((ni - 1) * lnsi2) AS BIGINT) AS sl,
             |    CAST(SUM(inv_nano) AS BIGINT) AS sinv
             |  FROM per),
             |wl AS (
             |  SELECT k, ntot, sl, sinv,
             |    CAST(floor(ln(CAST(sw AS DOUBLE)
             |      / (CAST(ntot AS DOUBLE) - CAST(k AS DOUBLE)))
             |      * 1000000 + 0.5) AS BIGINT) AS lnsp
             |  FROM agg)
             |SELECT k AS k_groups, ntot AS n_total,
             |  CASE WHEN k < 2 THEN NULL
             |    ELSE CAST(floor((1.0
             |      + (CAST(sinv AS DOUBLE) / 1.0e9
             |        - 1.0 / (CAST(ntot AS DOUBLE) - CAST(k AS DOUBLE)))
             |      / (3.0 * (CAST(k AS DOUBLE) - 1.0)))
             |      * 1000000 + 0.5) AS BIGINT) END AS c_micro,
             |  CASE WHEN k < 2 THEN NULL
             |    ELSE CAST(floor(CAST((ntot - k) * lnsp - sl AS DOUBLE)
             |      / (1.0
             |        + (CAST(sinv AS DOUBLE) / 1.0e9
             |          - 1.0 / (CAST(ntot AS DOUBLE) - CAST(k AS DOUBLE)))
             |        / (3.0 * (CAST(k AS DOUBLE) - 1.0)))
             |      + 0.5) AS BIGINT) END AS bartlett_micro
             |FROM wl""".stripMargin)),

    // ----- q334: one-step forecast backtest of the q178 Holt
    // smoother — the EVALUATION member the forecasting ladder (q168
    // EWMA, q178 Holt, q278 Holt–Winters) needs before anyone trusts
    // a forecast: each day's pre-update forecast scored against the
    // NEXT observation, with MAE, MAPE, and the skill score vs the
    // naive carry-forward (x̂ = xₜ). The trajectory replays through
    // the q178 recursive CTE; errors are exact BIGINT cents, MAPE
    // terms per-point micro-snapped (order-free sum), MAE/MAPE exact
    // integer divisions, skill ONE double chain. The next-value
    // shift is a zipRank self-join (no global window).
    QueryDef(
      "q334_forecast_backtest",
      (s, d) => {
        import s.implicits._
        val daily = Tables.orders(s, d)
          .select(to_date($"o_orderdate").as("day"),
            floor($"o_totalprice" * 100 + lit(0.5)).cast("long").as("cents"))
          .groupBy($"day").agg(sum($"cents").as("xq"))
        val sm = graft.operators.Holt.smooth(daily, "day", "xq",
          HoltAlphaDen, HoltBetaDen).select($"day", $"xq", $"forecast")
        val rk = graft.operators.GlobalOrder.zipRank(sm.sort($"day"), "rk")
          .transform(graft.operators.Iterate.truncate) // both sides of the shift join read it
        val nxt = rk.select($"rk".as("r2"), $"xq".as("x_next"))
        val errs = rk.join(nxt, $"r2" === $"rk" + 1L)
          .select(
            abs($"forecast" - $"x_next").as("e_holt"),
            abs($"xq" - $"x_next").as("e_naive"),
            when($"x_next" === 0L, 0L)
              .otherwise(floor(abs($"forecast" - $"x_next").cast("double")
                / $"x_next".cast("double") * 1000000 + lit(0.5))
                .cast("long")).as("ape"))
        val agg = errs.agg(count(lit(1)).as("n"),
          sum($"e_holt").as("se_holt"),
          sum($"e_naive").as("se_naive"),
          sum($"ape").as("s_ape"))
        agg.select($"n",
          expr("se_holt DIV n").as("mae_holt_cents"),
          expr("se_naive DIV n").as("mae_naive_cents"),
          expr("s_ape DIV n").as("mape_ppm"),
          when($"se_naive" === 0L, lit(null).cast("long"))
            .otherwise(floor((lit(1.0)
                - $"se_holt".cast("double") / $"se_naive".cast("double"))
              * 1000000 + lit(0.5)).cast("long")).as("skill_micro"))
      },
      Some(s"""WITH RECURSIVE ser AS (
             |  SELECT CAST(o_orderdate AS DATE) AS day,
             |    CAST(SUM(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
             |      AS BIGINT) AS xq
             |  FROM orders GROUP BY 1),
             |rn AS MATERIALIZED (
             |  SELECT day, xq,
             |    CAST(row_number() OVER (ORDER BY day) AS BIGINT) AS rn
             |  FROM ser),
             |h AS (
             |  SELECT day, xq, rn, xq AS l, CAST(0 AS BIGINT) AS b
             |  FROM rn WHERE rn = 1
             |  UNION ALL
             |  SELECT r.day, r.xq, r.rn,
             |    h.l + h.b + ${QueryFixtures.fdivSql("r.xq - h.l - h.b",
                    HoltAlphaDen.toString)} AS l,
             |    h.b + ${QueryFixtures.fdivSql(
                    QueryFixtures.fdivSql("r.xq - h.l - h.b",
                      HoltAlphaDen.toString), HoltBetaDen.toString)} AS b
             |  FROM h JOIN rn r ON r.rn = h.rn + 1),
             |f AS (SELECT rn, xq, l + b AS forecast FROM h),
             |errs AS (
             |  SELECT abs(f.forecast - r.xq) AS e_holt,
             |    abs(f.xq - r.xq) AS e_naive,
             |    CASE WHEN r.xq = 0 THEN 0
             |      ELSE CAST(floor(CAST(abs(f.forecast - r.xq) AS DOUBLE)
             |        / CAST(r.xq AS DOUBLE) * 1000000 + 0.5) AS BIGINT)
             |      END AS ape
             |  FROM f JOIN rn r ON r.rn = f.rn + 1),
             |agg AS (
             |  SELECT CAST(COUNT(*) AS BIGINT) AS n,
             |    CAST(SUM(e_holt) AS BIGINT) AS se_holt,
             |    CAST(SUM(e_naive) AS BIGINT) AS se_naive,
             |    CAST(SUM(ape) AS BIGINT) AS s_ape
             |  FROM errs)
             |SELECT n,
             |  se_holt // n AS mae_holt_cents,
             |  se_naive // n AS mae_naive_cents,
             |  s_ape // n AS mape_ppm,
             |  CASE WHEN se_naive = 0 THEN NULL
             |    ELSE CAST(floor((1.0 - CAST(se_holt AS DOUBLE)
             |      / CAST(se_naive AS DOUBLE)) * 1000000 + 0.5) AS BIGINT)
             |    END AS skill_micro
             |FROM agg""".stripMargin)),

    // ----- q337: Tukey HSD post-hoc pairwise comparisons across
    // region balance means — the MULTIPLE-COMPARISON follow-up the
    // ANOVA family (q186 decomposition, q220 Kruskal–Wallis, q329
    // Bartlett) needs after a significant omnibus: all 10 region
    // pairs against the studentized-range threshold
    // q·√(MSW/2·(1/nᵢ+1/nⱼ)) at α=0.05, k=5, df≈∞ (q = 3.858 —
    // an INLINED literal, the q323 quantile discipline). Moments
    // exact; MSW from the q329 per-group snapped (nᵢ−1)s²; both the
    // mean difference and the threshold are milli-snapped integers,
    // so the significance flag is an EXACT integer comparison.
    QueryDef(
      "q337_tukey_hsd",
      (s, d) => {
        import s.implicits._
        val rows = Tables.customer(s, d)
          .join(broadcast(Tables.nation(s, d)),
            $"c_nationkey" === $"n_nationkey")
          .join(broadcast(Tables.region(s, d)),
            $"n_regionkey" === $"r_regionkey")
          .select($"r_name",
            floor($"c_acctbal" + lit(0.5)).cast("long").as("x"))
        def db(c: org.apache.spark.sql.Column) = c.cast("double")
        val grp = rows.groupBy($"r_name").agg(
            count(lit(1)).as("ni"),
            sum($"x".cast("decimal(38,0)")).as("si"),
            sum($"x".cast("decimal(38,0)") * $"x").as("ssi"))
          .filter($"ni" >= 2)
          .select($"r_name", $"ni", $"si",
            floor(db($"ni".cast("decimal(38,0)") * $"ssi" - $"si" * $"si")
              / db($"ni") + lit(0.5)).cast("long").as("wp"))
          .transform(graft.operators.Iterate.truncate) // pooled-MSW + pair legs read it
        val msw = grp.agg(count(lit(1)).as("k"), sum($"ni").as("ntot"),
          sum($"wp").as("sw"))
        val a = grp.select($"r_name".as("ra"), $"ni".as("na"), $"si".as("sa"))
        val b = grp.select($"r_name".as("rb"), $"ni".as("nb"), $"si".as("sb"))
        val pairs = a.join(broadcast(b), $"ra" < $"rb").crossJoin(msw)
        val mswD = db($"sw") / (db($"ntot") - db($"k"))
        pairs.select($"ra", $"rb", $"na", $"nb",
            floor((db($"sa") / db($"na") - db($"sb") / db($"nb"))
              * 1000 + lit(0.5)).cast("long").as("diff_milli"),
            floor(lit(3.858)
              * sqrt(mswD / lit(2.0) * (lit(1.0) / db($"na")
                + lit(1.0) / db($"nb")))
              * 1000 + lit(0.5)).cast("long").as("hsd_milli"))
          .withColumn("significant", abs($"diff_milli") > $"hsd_milli")
          .orderBy($"ra", $"rb")
      },
      Some("""WITH rows0 AS (
             |  SELECT r.r_name,
             |    CAST(floor(c.c_acctbal + 0.5) AS BIGINT) AS x
             |  FROM customer c
             |  JOIN nation n ON c.c_nationkey = n.n_nationkey
             |  JOIN region r ON n.n_regionkey = r.r_regionkey),
             |grp AS (
             |  SELECT r_name, ni, si,
             |    CAST(floor(CAST(vn AS DOUBLE) / CAST(ni AS DOUBLE) + 0.5)
             |      AS BIGINT) AS wp
             |  FROM (
             |    SELECT r_name, CAST(COUNT(*) AS BIGINT) AS ni,
             |      SUM(CAST(x AS HUGEINT)) AS si,
             |      CAST(COUNT(*) AS HUGEINT) * SUM(CAST(x AS HUGEINT) * x)
             |        - SUM(CAST(x AS HUGEINT)) * SUM(CAST(x AS HUGEINT))
             |        AS vn
             |    FROM rows0 GROUP BY 1)
             |  WHERE ni >= 2),
             |msw AS (
             |  SELECT CAST(COUNT(*) AS BIGINT) AS k,
             |    CAST(SUM(ni) AS BIGINT) AS ntot,
             |    CAST(SUM(wp) AS BIGINT) AS sw
             |  FROM grp)
             |SELECT a.r_name AS ra, b.r_name AS rb, a.ni AS na, b.ni AS nb,
             |  CAST(floor((CAST(a.si AS DOUBLE) / CAST(a.ni AS DOUBLE)
             |    - CAST(b.si AS DOUBLE) / CAST(b.ni AS DOUBLE))
             |    * 1000 + 0.5) AS BIGINT) AS diff_milli,
             |  CAST(floor(3.858
             |    * sqrt(CAST(m.sw AS DOUBLE)
             |      / (CAST(m.ntot AS DOUBLE) - CAST(m.k AS DOUBLE))
             |      / 2.0 * (1.0 / CAST(a.ni AS DOUBLE)
             |        + 1.0 / CAST(b.ni AS DOUBLE)))
             |    * 1000 + 0.5) AS BIGINT) AS hsd_milli,
             |  abs(CAST(floor((CAST(a.si AS DOUBLE) / CAST(a.ni AS DOUBLE)
             |    - CAST(b.si AS DOUBLE) / CAST(b.ni AS DOUBLE))
             |    * 1000 + 0.5) AS BIGINT))
             |  > CAST(floor(3.858
             |    * sqrt(CAST(m.sw AS DOUBLE)
             |      / (CAST(m.ntot AS DOUBLE) - CAST(m.k AS DOUBLE))
             |      / 2.0 * (1.0 / CAST(a.ni AS DOUBLE)
             |        + 1.0 / CAST(b.ni AS DOUBLE)))
             |    * 1000 + 0.5) AS BIGINT) AS significant
             |FROM grp a JOIN grp b ON a.r_name < b.r_name
             |CROSS JOIN msw m
             |ORDER BY ra, rb""".stripMargin)),

    // ----- q338: negative-binomial fit of per-user event counts by
    // method of moments — the MODEL the q298 overdispersion test
    // motivates (Poisson rejected ⇒ fit the NB): r̂ = m²/(s²−m),
    // p̂ = r̂/(r̂+m) from exact count moments, NULL when the data is
    // not overdispersed (s² ≤ m — NB degenerate). One double chain
    // per parameter over exact BIGINT/HUGEINT sums.
    QueryDef(
      "q338_negbin_fit",
      (s, d) => {
        import s.implicits._
        val per = Tables.events(s, d).groupBy($"user_id")
          .agg(count(lit(1)).as("c"))
        val mo = per.agg(count(lit(1)).as("n"),
          sum($"c").as("sc"),
          sum(($"c".cast("decimal(38,0)") * $"c")).as("scc"))
        def db(c: org.apache.spark.sql.Column) = c.cast("double")
        val nd = db($"n")
        val mean = db($"sc") / nd
        val vr = (nd * db($"scc") - db($"sc") * db($"sc")) /
          (nd * (nd - lit(1.0)))
        val r = mean * mean / (vr - mean)
        mo.select($"n".as("n_users"),
          floor(mean * 1000000 + lit(0.5)).cast("long").as("mean_micro"),
          floor(vr * 1000000 + lit(0.5)).cast("long").as("var_micro"),
          when($"n" < 2 || vr <= mean, lit(null).cast("long"))
            .otherwise(floor(r * 1000000 + lit(0.5)).cast("long"))
            .as("r_micro"),
          when($"n" < 2 || vr <= mean, lit(null).cast("long"))
            .otherwise(floor(r / (r + mean) * 1000000 + lit(0.5))
              .cast("long")).as("p_micro"))
      },
      Some("""WITH per AS (
             |  SELECT user_id, CAST(COUNT(*) AS BIGINT) AS c
             |  FROM events GROUP BY 1),
             |mo AS (
             |  SELECT CAST(COUNT(*) AS BIGINT) AS n,
             |    CAST(SUM(c) AS BIGINT) AS sc,
             |    SUM(CAST(c AS HUGEINT) * c) AS scc
             |  FROM per),
             |ch AS (
             |  SELECT n,
             |    CAST(sc AS DOUBLE) / CAST(n AS DOUBLE) AS mean,
             |    (CAST(n AS DOUBLE) * CAST(scc AS DOUBLE)
             |      - CAST(sc AS DOUBLE) * CAST(sc AS DOUBLE))
             |      / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0)) AS vr
             |  FROM mo)
             |SELECT n AS n_users,
             |  CAST(floor(mean * 1000000 + 0.5) AS BIGINT) AS mean_micro,
             |  CAST(floor(vr * 1000000 + 0.5) AS BIGINT) AS var_micro,
             |  CASE WHEN n < 2 OR vr <= mean THEN NULL
             |    ELSE CAST(floor(mean * mean / (vr - mean) * 1000000 + 0.5)
             |      AS BIGINT) END AS r_micro,
             |  CASE WHEN n < 2 OR vr <= mean THEN NULL
             |    ELSE CAST(floor(mean * mean / (vr - mean)
             |      / (mean * mean / (vr - mean) + mean) * 1000000 + 0.5)
             |      AS BIGINT) END AS p_micro
             |FROM ch""".stripMargin)))

  /** χ²(1) upper-tail thresholds for the q307 BH boundary k·α/m
    * (α = 0.05, m = 25 nations), pre-inverted ONCE offline (bisection
    * on erfc — no CDF in either engine) and micro-snapped: the same
    * integer constants feed the Spark literals and the oracle VALUES,
    * so the whole procedure is integer comparisons. */
  private val BhThresholds: Seq[(Long, Long)] = Seq(
    9.54953570608324, 8.283814996393136, 7.550302542198004,
    7.03347426598639, 6.634896601021216, 6.310869124353191,
    6.038143368843919, 5.802874106871402, 5.596149122148924,
    5.411894431054341, 5.245785015911242, 5.094632426314959,
    4.956018841846307, 4.8280674209723635, 4.7092922468851,
    4.598496911079504, 4.494703969646141, 4.397104643181777,
    4.305022168834332, 4.217884587921398, 4.135204197418151,
    4.056561799055887, 3.9815944622625086, 3.9099859007707423,
    3.8414588206941254)
    .zipWithIndex.map { case (v, i) =>
      ((i + 1).toLong, math.floor(v * 1e6 + 0.5).toLong) }

  /** q177/q178/q278 shared constants. */
  private val HoltAlphaDen = 4L
  private val HoltBetaDen = 8L

  /** q278 seasonal gain 1/4. */
  private val HwGammaDen = 4L

  /** 3×3 determinant — ONE formula shape for both engines: this
    * numeric form and [[det3Sql]] must mirror each other operation
    * for operation (q194's cross-engine contract).
    */
  private def det3(m: Seq[Seq[Double]]): Double =
    m(0)(0) * (m(1)(1) * m(2)(2) - m(1)(2) * m(2)(1)) -
      m(0)(1) * (m(1)(0) * m(2)(2) - m(1)(2) * m(2)(0)) +
      m(0)(2) * (m(1)(0) * m(2)(1) - m(1)(1) * m(2)(0))

  /** SQL text of [[det3]] over element expressions. */
  private def det3Sql(m: Seq[Seq[String]]): String =
    s"(${m(0)(0)} * (${m(1)(1)} * ${m(2)(2)} - ${m(1)(2)} * ${m(2)(1)})" +
      s" - ${m(0)(1)} * (${m(1)(0)} * ${m(2)(2)} - ${m(1)(2)} * ${m(2)(0)})" +
      s" + ${m(0)(2)} * (${m(1)(0)} * ${m(2)(1)} - ${m(1)(1)} * ${m(2)(0)}))"

  /** Column list shared by q170's Spark arms and oracle arms. */
  private val CorrCols =
    Seq("l_discount", "l_extendedprice", "l_quantity", "l_tax")

  /** The q194 oracle — determinant texts generated by [[det3Sql]]
    * over the same matrix layout the Scala side feeds [[det3]].
    */
  private def mlrOracle: String = {
    def c(nm: String) = s"CAST($nm AS DOUBLE)"
    val mM = Seq(
      Seq(c("n"), c("s1"), c("s2")),
      Seq(c("s1"), c("s11"), c("s12")),
      Seq(c("s2"), c("s12"), c("s22")))
    val b = Seq(c("sy"), c("s1y"), c("s2y"))
    def replaced(col: Int) = mM.zipWithIndex.map { case (r, i) =>
      r.updated(col, b(i))
    }
    val dm = det3Sql(mM)
    val betas = (0 to 2).map(col => s"(${det3Sql(replaced(col))} / $dm)")
    s"""WITH q AS (
       |  SELECT CAST(floor(l_quantity * 100 + 0.5) AS BIGINT) AS x1,
       |    CAST(floor(l_discount * 100 + 0.5) AS BIGINT) AS x2,
       |    CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS y
       |  FROM lineitem),
       |m AS (
       |  SELECT CAST(COUNT(*) AS BIGINT) AS n,
       |    SUM(x1) AS s1, SUM(x2) AS s2, SUM(y) AS sy,
       |    SUM(x1 * x1) AS s11, SUM(x1 * x2) AS s12, SUM(x2 * x2) AS s22,
       |    SUM(x1 * y) AS s1y, SUM(x2 * y) AS s2y, SUM(y * y) AS syy
       |  FROM q)
       |SELECT n,
       |  CAST(floor(${betas(0)} * 1000000 + 0.5) AS BIGINT) AS b0_micro,
       |  CAST(floor(${betas(1)} * 1000000 + 0.5) AS BIGINT) AS b1_micro,
       |  CAST(floor(${betas(2)} * 1000000 + 0.5) AS BIGINT) AS b2_micro,
       |  CAST(floor((1.0 - (${c("syy")}
       |      - (${betas(0)} * ${c("sy")} + ${betas(1)} * ${c("s1y")}
       |         + ${betas(2)} * ${c("s2y")}))
       |    / (${c("syy")} - ${c("sy")} * ${c("sy")} / ${c("n")}))
       |    * 1000000 + 0.5) AS BIGINT) AS r2_micro
       |FROM m""".stripMargin
  }

  /** q215's penalty — a LITERAL in both engines (≈0.2% of s11 at
    * sf0.01, so the shrinkage is visible in the micro-snapped betas
    * without drowning the fit).
    */
  private val RidgeLambda = 1000000000L

  /** The q215 oracle — q194's generated determinant texts with
    * [[RidgeLambda]] on the feature diagonal (intercept unpenalized).
    */
  private def ridgeOracle: String = {
    def c(nm: String) = s"CAST($nm AS DOUBLE)"
    def cl(nm: String) = s"(CAST($nm AS DOUBLE) + $RidgeLambda.0)"
    val mM = Seq(
      Seq(c("n"), c("s1"), c("s2")),
      Seq(c("s1"), cl("s11"), c("s12")),
      Seq(c("s2"), c("s12"), cl("s22")))
    val b = Seq(c("sy"), c("s1y"), c("s2y"))
    def replaced(col: Int) = mM.zipWithIndex.map { case (r, i) =>
      r.updated(col, b(i))
    }
    val dm = det3Sql(mM)
    val betas = (0 to 2).map(col => s"(${det3Sql(replaced(col))} / $dm)")
    s"""WITH q AS (
       |  SELECT CAST(floor(l_quantity * 100 + 0.5) AS BIGINT) AS x1,
       |    CAST(floor(l_discount * 100 + 0.5) AS BIGINT) AS x2,
       |    CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS y
       |  FROM lineitem),
       |m AS (
       |  SELECT CAST(COUNT(*) AS BIGINT) AS n,
       |    SUM(x1) AS s1, SUM(x2) AS s2, SUM(y) AS sy,
       |    SUM(x1 * x1) AS s11, SUM(x1 * x2) AS s12, SUM(x2 * x2) AS s22,
       |    SUM(x1 * y) AS s1y, SUM(x2 * y) AS s2y, SUM(y * y) AS syy
       |  FROM q)
       |SELECT n,
       |  CAST(floor(${betas(0)} * 1000000 + 0.5) AS BIGINT) AS b0_micro,
       |  CAST(floor(${betas(1)} * 1000000 + 0.5) AS BIGINT) AS b1_micro,
       |  CAST(floor(${betas(2)} * 1000000 + 0.5) AS BIGINT) AS b2_micro
       |FROM m""".stripMargin
  }

  /** The q190 oracle — the same generated-arm discipline as q170,
    * with the partial-correlation chain mirrored textually.
    */
  private def partialCorrOracle: String = {
    val cols = Seq("l_quantity", "l_extendedprice", "l_discount")
    val quants = cols.zipWithIndex.map { case (c, i) =>
      s"CAST(floor($c * 100 + 0.5) AS BIGINT) AS x$i"
    }.mkString(",\n    ")
    val sums = cols.indices.map(i => s"SUM(x$i) AS s$i") ++
      (for { i <- cols.indices; j <- cols.indices if i <= j }
        yield s"SUM(x$i * x$j) AS s$i$j")
    def rSql(i: Int, j: Int): String = {
      val (a, b) = (math.min(i, j), math.max(i, j))
      s"""((CAST(n AS DOUBLE) * CAST(s$a$b AS DOUBLE)
         |     - CAST(s$a AS DOUBLE) * CAST(s$b AS DOUBLE))
         |    / (sqrt(CAST(n AS DOUBLE) * CAST(s$a$a AS DOUBLE)
         |            - CAST(s$a AS DOUBLE) * CAST(s$a AS DOUBLE))
         |       * sqrt(CAST(n AS DOUBLE) * CAST(s$b$b AS DOUBLE)
         |              - CAST(s$b AS DOUBLE) * CAST(s$b AS DOUBLE))))""".stripMargin
    }
    val arms = for { i <- cols.indices; j <- cols.indices if i < j }
      yield {
        val z = (cols.indices.toSet - i - j).head
        s"""SELECT '${cols(i)}' AS col_a, '${cols(j)}' AS col_b,
           |  '${cols(z)}' AS controlling,
           |  CAST(floor(${rSql(i, j)} * 1000000 + 0.5) AS BIGINT) AS r_micro,
           |  CAST(floor(
           |    (${rSql(i, j)} - ${rSql(i, z)} * ${rSql(j, z)})
           |    / sqrt((1.0 - ${rSql(i, z)} * ${rSql(i, z)})
           |           * (1.0 - ${rSql(j, z)} * ${rSql(j, z)}))
           |    * 1000000 + 0.5) AS BIGINT) AS pr_micro
           |FROM m""".stripMargin
      }
    s"""WITH q AS (
       |  SELECT ${quants}
       |  FROM lineitem),
       |m AS (
       |  SELECT CAST(COUNT(*) AS BIGINT) AS n,
       |    ${sums.mkString(",\n    ")}
       |  FROM q)
       |SELECT * FROM (
       |${arms.mkString("\nUNION ALL\n")})
       |ORDER BY col_a, col_b""".stripMargin
  }

  /** The q170 oracle, generated from [[CorrCols]]. */
  private def corrOracle: String = {
    val quants = CorrCols.zipWithIndex.map { case (c, i) =>
      s"CAST(floor($c * 100 + 0.5) AS BIGINT) AS x$i"
    }.mkString(",\n    ")
    val sums = CorrCols.indices.map(i => s"SUM(x$i) AS s$i") ++
      (for { i <- CorrCols.indices; j <- CorrCols.indices if i <= j }
        yield s"SUM(x$i * x$j) AS s$i$j")
    val arms = for { i <- CorrCols.indices; j <- CorrCols.indices if i < j }
      yield
        s"""SELECT '${CorrCols(i)}' AS col_a, '${CorrCols(j)}' AS col_b, n,
           |  CAST(floor(
           |    (CAST(n AS DOUBLE) * CAST(s$i$j AS DOUBLE)
           |     - CAST(s$i AS DOUBLE) * CAST(s$j AS DOUBLE))
           |    / (sqrt(CAST(n AS DOUBLE) * CAST(s$i$i AS DOUBLE)
           |            - CAST(s$i AS DOUBLE) * CAST(s$i AS DOUBLE))
           |       * sqrt(CAST(n AS DOUBLE) * CAST(s$j$j AS DOUBLE)
           |              - CAST(s$j AS DOUBLE) * CAST(s$j AS DOUBLE)))
           |    * 1000000 + 0.5) AS BIGINT) AS r_micro
           |FROM m""".stripMargin
    s"""WITH q AS (
       |  SELECT ${quants}
       |  FROM lineitem),
       |m AS (
       |  SELECT CAST(COUNT(*) AS BIGINT) AS n,
       |    ${sums.mkString(",\n    ")}
       |  FROM q)
       |SELECT * FROM (
       |${arms.mkString("\nUNION ALL\n")})
       |ORDER BY col_a, col_b""".stripMargin
  }
}
