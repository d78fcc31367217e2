package graft.queries

import graft.{QueryDef, Tables}
import graft.operators.{LogReg, Sampling}
import org.apache.spark.sql.functions._

/** Supervised quality-classifier queries (SURVEY §2.12): the
  * distributed fixed-point GD trainer (operators.LogReg) declared as
  * oracle-checked queries. Like q118's Lloyd replay, the oracle
  * REPLAYS the full training recurrence in SQL — zero-init weights,
  * every iteration's hard-sigmoid errors, weighted gradient sums and
  * fixed-point update unrolled as CTE chains — so the learned weights,
  * margins, and predictions are checked value-for-value across
  * engines. Possible only because every trainer step is exact integer
  * arithmetic plus IEEE-identical floor-divisions (LogReg scaladoc).
  *
  * Task: one-vs-rest on `embeddings.label` (positives = label 0, ~10%
  * of rows, integer-rebalanced ×9) — the embedding-space stand-in for
  * a fastText/CCNet-style corpus quality filter.
  */
object ClassifierQueries {

  private val Dim = 64          // fixture embedding dim (FIXTURES.md §B)
  private val Iters = 8
  private val PosWeight = 9L    // ≈ neg/pos ratio of the 10-class fixture
  private val EtaDen = 2L       // learning rate 1/2
  private val Salt = 129L       // q129 split salt
  private val CalSalt = 136L    // q136 conformal-split salt
  private val TrainFrac = 0.8

  private val Sx = LogReg.FeatScale      // 1024
  private val Qw = LogReg.WeightScale    // 65536
  private val ClampDen = 4L * Qw         // 262144
  private val StepDen = EtaDen * Sx * Sx // 2097152

  /** floor of the IEEE double quotient — textual mirror of
    * [[LogReg.fdiv]].
    */
  private def fdiv(a: String, b: String): String =
    s"CAST(floor(CAST($a AS DOUBLE) / CAST($b AS DOUBLE)) AS BIGINT)"

  /** The hard-sigmoid score from a margin expression (scale Sx). */
  private def scoreExpr(z: String): String =
    s"LEAST(GREATEST(${Sx / 2} + ${fdiv(z, ClampDen.toString)}, 0), $Sx)"

  /** CTE chain replaying LogReg.train: lab (labels + class weights),
    * feats (quantized components + bias), tr (training rows), cnt
    * (weighted row count), w0..wN (the GD recurrence: zI margins over
    * training rows, eI weighted hard-sigmoid errors, gI gradient sums,
    * wI+1 the fixed-point update). `trainPred` None → train on all
    * rows.
    */
  private def gdCtes(iters: Int, trainPred: Option[String]): String = {
    val trJoin = trainPred
      .map(p => s"(SELECT vec_id FROM embeddings WHERE $p)")
      .getOrElse("(SELECT vec_id FROM embeddings)")
    val header =
      s"""WITH lab AS MATERIALIZED (
         |  SELECT vec_id,
         |    CASE WHEN label = 0 THEN 1 ELSE 0 END AS y,
         |    CASE WHEN label = 0 THEN $PosWeight ELSE 1 END AS wy
         |  FROM embeddings),
         |feats AS MATERIALIZED (
         |  SELECT vec_id, pos, CAST(floor(CAST(v AS DOUBLE) * $Sx) AS BIGINT) AS x
         |  FROM (
         |    SELECT vec_id, unnest(embedding) AS v,
         |      unnest(list_transform(range(0, len(embedding)), p -> p)) AS pos
         |    FROM embeddings)
         |  UNION ALL
         |  SELECT vec_id, $Dim AS pos, $Sx AS x FROM embeddings),
         |tr AS MATERIALIZED $trJoin,
         |cnt AS MATERIALIZED (
         |  SELECT CAST(SUM(l.wy) AS BIGINT) AS c
         |  FROM lab l JOIN tr t ON l.vec_id = t.vec_id),
         |w0 AS MATERIALIZED (
         |  SELECT CAST(unnest(range(0, ${Dim + 1})) AS INT) AS pos,
         |    CAST(0 AS BIGINT) AS w)""".stripMargin
    val steps = (0 until iters).map { i =>
      s"""z$i AS MATERIALIZED (
         |  SELECT f.vec_id, SUM(f.x * w.w) AS z
         |  FROM feats f JOIN w$i w ON f.pos = w.pos
         |  JOIN tr t ON f.vec_id = t.vec_id
         |  GROUP BY f.vec_id),
         |e$i AS MATERIALIZED (
         |  SELECT z.vec_id, (${scoreExpr("z.z")} - $Sx * l.y) * l.wy AS err
         |  FROM z$i z JOIN lab l ON z.vec_id = l.vec_id),
         |g$i AS MATERIALIZED (
         |  SELECT f.pos, SUM(e.err * f.x) AS g
         |  FROM e$i e JOIN feats f ON e.vec_id = f.vec_id
         |  GROUP BY f.pos),
         |w${i + 1} AS MATERIALIZED (
         |  SELECT w.pos,
         |    w.w - ${fdiv(s"${fdiv("COALESCE(g.g, 0)", "c.c")} * $Qw",
                          StepDen.toString)} AS w
         |  FROM w$i w LEFT JOIN g$i g ON w.pos = g.pos CROSS JOIN cnt c)""".stripMargin
    }
    (header +: steps).mkString(",\n")
  }

  /** Final margins of `who` (a CTE of vec_ids) against the trained
    * weights w`iters`, as CTE `name`.
    */
  private def finalMargins(iters: Int, who: String, name: String = "zf"): String =
    s"""$name AS MATERIALIZED (
       |  SELECT f.vec_id, SUM(f.x * w.w) AS z
       |  FROM feats f JOIN w$iters w ON f.pos = w.pos
       |  JOIN $who t ON f.vec_id = t.vec_id
       |  GROUP BY f.vec_id)""".stripMargin

  private def withY(embs: org.apache.spark.sql.DataFrame) =
    embs.withColumn("y", when(col("label") === 0, 1).otherwise(0))

  def defs: Seq[QueryDef] = Seq(

    // ----- q128: corpus quality scoring — train the fixed-point GD
    // classifier on the full table, score every row. The oracle
    // replays all 8 GD iterations and hash-matches margins, scores,
    // and predictions value-for-value.
    QueryDef(
      "q128_quality_classifier",
      (s, d) => {
        import s.implicits._
        val embs = withY(Tables.embeddings(s, d))
        val model = LogReg.train(embs, "embedding", "y", Iters, EtaDen, PosWeight)
        LogReg.scoreAll(embs, "vec_id", "embedding", "y", model)
          .orderBy($"vec_id")
      },
      Some(
        s"""${gdCtes(Iters, None)},
           |${finalMargins(Iters, "tr")}
           |SELECT l.vec_id, CAST(z.z AS BIGINT) AS margin,
           |  CAST(${scoreExpr("z.z")} AS BIGINT) AS score,
           |  CAST(CASE WHEN z.z >= 0 THEN 1 ELSE 0 END AS BIGINT) AS pred,
           |  CAST(l.y AS BIGINT) AS y
           |FROM zf z JOIN lab l ON z.vec_id = l.vec_id
           |ORDER BY l.vec_id""".stripMargin)),

    // ----- q129: holdout calibration — train on the hash-selected 80%
    // split, confusion matrix + milli-accuracy on the held-out 20%.
    // The oracle re-trains on the identical split (portable hash) and
    // re-scores the identical holdout.
    QueryDef(
      "q129_classifier_eval",
      (s, d) => {
        val embs = withY(Tables.embeddings(s, d))
        LogReg.splitEval(embs, "vec_id", "embedding", "y",
          Iters, EtaDen, PosWeight, TrainFrac, Salt)
      },
      Some {
        val frac = Sampling.hashFractionSql("vec_id", Salt)
        s"""${gdCtes(Iters, Some(s"$frac < $TrainFrac"))},
           |te AS (SELECT vec_id FROM embeddings WHERE $frac >= $TrainFrac),
           |${finalMargins(Iters, "te")},
           |scored AS (
           |  SELECT CASE WHEN z.z >= 0 THEN 1 ELSE 0 END AS pred, l.y
           |  FROM zf z JOIN lab l ON z.vec_id = l.vec_id),
           |cm AS (
           |  SELECT
           |    CAST(SUM(CASE WHEN pred = 1 AND y = 1 THEN 1 ELSE 0 END) AS BIGINT) AS tp,
           |    CAST(SUM(CASE WHEN pred = 1 AND y = 0 THEN 1 ELSE 0 END) AS BIGINT) AS fp,
           |    CAST(SUM(CASE WHEN pred = 0 AND y = 1 THEN 1 ELSE 0 END) AS BIGINT) AS fn,
           |    CAST(SUM(CASE WHEN pred = 0 AND y = 0 THEN 1 ELSE 0 END) AS BIGINT) AS tn
           |  FROM scored)
           |SELECT tp, fp, fn, tn,
           |  ${fdiv("1000 * (tp + tn)", "tp + fp + fn + tn")} AS acc_milli
           |FROM cm""".stripMargin
      }),

    // ----- q135: the learned filter COMPOSED into curation — train
    // the classifier, keep only predicted-positive rows, and profile
    // the surviving corpus per language (the GPT-3 §A move: a learned
    // quality model gates what enters the training set). The oracle
    // replays training AND the gated per-language rollup.
    QueryDef(
      "q135_learned_quality_filter",
      (s, d) => {
        import s.implicits._
        val embs = withY(Tables.embeddings(s, d))
        val model = LogReg.train(embs, "embedding", "y", Iters, EtaDen, PosWeight)
        val kept = LogReg.scoreAll(embs, "vec_id", "embedding", "y", model)
          .filter($"pred" === 1)
        val docs = Tables.documents(s, d)
        docs.join(kept, docs("doc_id") === kept("vec_id"))
          .groupBy($"lang")
          .agg(count(lit(1)).as("kept"),
            sum($"n_chars").as("kept_chars"),
            sum($"margin").as("margin_sum"))
          .orderBy($"lang")
      },
      Some(
        s"""${gdCtes(Iters, None)},
           |${finalMargins(Iters, "tr")}
           |SELECT d.lang, COUNT(*) AS kept,
           |  CAST(SUM(d.n_chars) AS BIGINT) AS kept_chars,
           |  CAST(SUM(z.z) AS BIGINT) AS margin_sum
           |FROM zf z JOIN documents d ON d.doc_id = z.vec_id
           |WHERE z.z >= 0
           |GROUP BY d.lang
           |ORDER BY d.lang""".stripMargin)),

    // ----- q208: calibration / reliability table — margins of the
    // trained classifier binned at fixed width, observed positive
    // rate per bin: the "is the score monotone in the truth"
    // diagnostic behind every reliability diagram, done WITHOUT a
    // sigmoid (binning the margin avoids libm entirely — the score
    // is monotone in z, so bin-wise observed rates carry the same
    // information). Margins replay through the q128 GD chain; the
    // bin index uses the shared floored-quotient fdiv (negative
    // margins floor identically in both engines).
    {
      val BinW = 500000L   // ~±5 bins over the fixture's margin range
      QueryDef(
        "q208_calibration_bins",
        (s, d) => {
          import s.implicits._
          val embs = withY(Tables.embeddings(s, d))
          val model = LogReg.train(embs, "embedding", "y", Iters, EtaDen, PosWeight)
          LogReg.scoreAll(embs, "vec_id", "embedding", "y", model)
            .select($"y", $"margin",
              floor($"margin".cast("double") / BinW).cast("long").as("bin"))
            .groupBy($"bin")
            .agg(count(lit(1)).as("n"),
              sum($"y").as("n_pos"),
              sum($"margin").as("z_sum"))
            .withColumn("pos_rate_milli", expr("n_pos * 1000 DIV n"))
            .orderBy($"bin")
        },
        Some {
          s"""${gdCtes(Iters, None)},
             |${finalMargins(Iters, "tr")},
             |binned AS (
             |  SELECT ${fdiv("z.z", BinW.toString)} AS bin, l.y, z.z
             |  FROM zf z JOIN lab l ON z.vec_id = l.vec_id)
             |SELECT bin, CAST(count(*) AS BIGINT) AS n,
             |  CAST(SUM(y) AS BIGINT) AS n_pos,
             |  CAST(SUM(z) AS BIGINT) AS z_sum,
             |  CAST(SUM(y) * 1000 // count(*) AS BIGINT) AS pos_rate_milli
             |FROM binned GROUP BY 1
             |ORDER BY bin""".stripMargin
        })
    },

    // ----- q314: Hosmer–Lemeshow goodness-of-fit over the q128
    // classifier's hard-sigmoid scores — the CHI-SQUARE calibration
    // test next to q208's reliability table (bin-wise rates, no
    // statistic) and q242's Brier (squared error, no grouping):
    // score-decile groups via the exact-NTILE GlobalOrder.ntileRank
    // (score, vec_id tie-break), per-group (O−E)²/(E(1−E/n)) with
    // E = Σscore/1024 (the hard-sigmoid probability), each term ONE
    // fixed double chain micro-snapped, the total an exact integer
    // sum of snapped terms. Degenerate groups (E=0 or E=n) NULL out.
    {
      val HlG = 10
      QueryDef(
        "q314_hosmer_lemeshow",
        (s, d) => {
          import s.implicits._
          val embs = withY(Tables.embeddings(s, d))
          val model = LogReg.train(embs, "embedding", "y",
            Iters, EtaDen, PosWeight)
          val scored = LogReg
            .scoreAll(embs, "vec_id", "embedding", "y", model)
            .select($"vec_id", $"y", $"score")
          val binned = graft.operators.GlobalOrder.ntileRank(
            scored, Seq($"score".asc, $"vec_id".asc), HlG, "g")
          val grp = binned.groupBy($"g").agg(
            count(lit(1)).as("n"),
            sum($"y").as("o1"),
            sum($"score").as("se"))
          def db(c: org.apache.spark.sql.Column) = c.cast("double")
          val e1 = db($"se") / lit(1024.0)
          val term = (db($"o1") - e1) * (db($"o1") - e1) /
            (e1 * (lit(1.0) - e1 / db($"n")))
          val per = grp.select($"g", $"n", $"o1", $"se",
            when($"se" === 0L || $"se" === $"n" * 1024L,
              lit(null).cast("long"))
              .otherwise(floor(term * 1000000 + lit(0.5)).cast("long"))
              .as("term_micro"))
          val tot = per.agg(sum($"term_micro").as("hl_total_micro"))
          per.crossJoin(tot).orderBy($"g")
        },
        Some {
          s"""${gdCtes(Iters, None)},
             |${finalMargins(Iters, "tr")},
             |sc AS (
             |  SELECT z.vec_id, l.y, ${scoreExpr("z.z")} AS score
             |  FROM zf z JOIN lab l ON z.vec_id = l.vec_id),
             |bn AS (
             |  SELECT y, score,
             |    CAST(NTILE($HlG) OVER (ORDER BY score, vec_id) AS BIGINT) AS g
             |  FROM sc),
             |grp AS (
             |  SELECT g, CAST(COUNT(*) AS BIGINT) AS n,
             |    CAST(SUM(y) AS BIGINT) AS o1,
             |    CAST(SUM(score) AS BIGINT) AS se
             |  FROM bn GROUP BY 1),
             |per AS (
             |  SELECT g, n, o1, se,
             |    CASE WHEN se = 0 OR se = n * 1024 THEN NULL
             |      ELSE CAST(floor(
             |        (CAST(o1 AS DOUBLE) - CAST(se AS DOUBLE) / 1024.0)
             |        * (CAST(o1 AS DOUBLE) - CAST(se AS DOUBLE) / 1024.0)
             |        / (CAST(se AS DOUBLE) / 1024.0
             |          * (1.0 - CAST(se AS DOUBLE) / 1024.0
             |            / CAST(n AS DOUBLE)))
             |        * 1000000 + 0.5) AS BIGINT) END AS term_micro
             |  FROM grp),
             |tot AS (
             |  SELECT CAST(SUM(term_micro) AS BIGINT) AS hl_total_micro
             |  FROM per)
             |SELECT per.g, per.n, per.o1, per.se, per.term_micro,
             |  tot.hl_total_micro
             |FROM per CROSS JOIN tot ORDER BY per.g""".stripMargin
        })
    },

    // ----- q136: split-conformal threshold calibration (Vovk et al.;
    // Papadopoulos ICP) — train on 60%, set the decision threshold at
    // the exact 0.9-quantile of CALIBRATION-split negative scores
    // (rank selection, ties by id), report the held-out confusion at
    // that threshold. Distribution-free FPR control ≤ α + 1/m for a
    // quality filter — the calibration step a filter rollout runs
    // before gating a corpus. Training, quantile, and test rollup all
    // replay exactly.
    QueryDef(
      "q136_conformal_threshold",
      (s, d) => {
        import s.implicits._
        val f = Sampling.hashFraction($"vec_id", CalSalt)
        val embs = withY(Tables.embeddings(s, d))
        val model = LogReg.train(embs.filter(f < 0.6), "embedding", "y",
          Iters, EtaDen, PosWeight)
        val calib = LogReg.scoreAll(
          embs.filter(f >= 0.6 && f < 0.8), "vec_id", "embedding", "y", model)
        val negs = calib.filter($"y" === 0).select($"score", $"vec_id")
        // exact 0.9-quantile by rank selection over the (unboundedly
        // growing) calibration split — two-pass zipRank, no single-
        // partition window
        val (ranked, m) = graft.operators.GlobalOrder.zipRankWithCount(
          negs.sort($"score", $"vec_id"), "r")
        val tau = ranked
          .filter($"r" === LogReg.fdiv(9L * (m - 1), 10L) + 1L)
          .select($"score").first().getLong(0)
        LogReg.scoreAll(embs.filter(f >= 0.8), "vec_id", "embedding", "y", model)
          .withColumn("cpred", ($"score" > tau).cast("long"))
          .agg(
            sum(when($"cpred" === 1 && $"y" === 1, 1L).otherwise(0L)).as("tp"),
            sum(when($"cpred" === 1 && $"y" === 0, 1L).otherwise(0L)).as("fp"),
            sum(when($"cpred" === 0 && $"y" === 1, 1L).otherwise(0L)).as("fn"),
            sum(when($"cpred" === 0 && $"y" === 0, 1L).otherwise(0L)).as("tn"))
          .withColumn("threshold", lit(tau))
          .withColumn("fpr_milli",
            expr("CAST(floor(CAST(1000 * fp AS DOUBLE) / CAST(fp + tn AS DOUBLE)) AS BIGINT)"))
      },
      Some {
        val frac = Sampling.hashFractionSql("vec_id", CalSalt)
        s"""${gdCtes(Iters, Some(s"$frac < 0.6"))},
           |ca AS (SELECT vec_id FROM embeddings WHERE $frac >= 0.6 AND $frac < 0.8),
           |te AS (SELECT vec_id FROM embeddings WHERE $frac >= 0.8),
           |${finalMargins(Iters, "ca", "zc")},
           |negs AS MATERIALIZED (
           |  SELECT ${scoreExpr("z.z")} AS score, z.vec_id
           |  FROM zc z JOIN lab l ON z.vec_id = l.vec_id WHERE l.y = 0),
           |rk AS MATERIALIZED (
           |  SELECT score, row_number() OVER (ORDER BY score, vec_id) - 1 AS r
           |  FROM negs),
           |m AS (SELECT count(*) AS m FROM negs),
           |tau AS MATERIALIZED (
           |  SELECT rk.score AS tau FROM rk, m
           |  WHERE rk.r = ${fdiv("9 * (m.m - 1)", "10")}),
           |${finalMargins(Iters, "te", "zt")},
           |scored AS (
           |  SELECT CASE WHEN ${scoreExpr("z.z")} > t.tau THEN 1 ELSE 0 END AS cpred,
           |    l.y, t.tau
           |  FROM zt z JOIN lab l ON z.vec_id = l.vec_id CROSS JOIN tau t),
           |cm AS (
           |  SELECT
           |    CAST(SUM(CASE WHEN cpred = 1 AND y = 1 THEN 1 ELSE 0 END) AS BIGINT) AS tp,
           |    CAST(SUM(CASE WHEN cpred = 1 AND y = 0 THEN 1 ELSE 0 END) AS BIGINT) AS fp,
           |    CAST(SUM(CASE WHEN cpred = 0 AND y = 1 THEN 1 ELSE 0 END) AS BIGINT) AS fn,
           |    CAST(SUM(CASE WHEN cpred = 0 AND y = 0 THEN 1 ELSE 0 END) AS BIGINT) AS tn,
           |    CAST(MAX(tau) AS BIGINT) AS threshold
           |  FROM scored)
           |SELECT tp, fp, fn, tn, threshold,
           |  ${fdiv("1000 * fp", "fp + tn")} AS fpr_milli
           |FROM cm""".stripMargin
      }),

    // ----- q137: score-drift monitoring — population stability index
    // of the classifier's score distribution between two source
    // slices (sources 0-9 vs 10-19), over 8 fixed score bins with
    // Laplace smoothing. PSI is THE deployed-model drift alarm
    // (≥0.2 = investigate); per-bin contributions are r4-rounded (the
    // q96/q100 libm-ulp discipline) so the one transcendental (ln)
    // can't flip a hash.
    QueryDef(
      "q137_score_drift_psi",
      (s, d) => {
        import s.implicits._
        val embs = withY(Tables.embeddings(s, d))
        val model = LogReg.train(embs, "embedding", "y", Iters, EtaDen, PosWeight)
        val scored = LogReg.scoreAll(embs, "vec_id", "embedding", "y", model)
        val docSlices = Tables.documents(s, d)
          .select($"doc_id", expr("CAST(substr(source, 4) AS INT) < 10").as("slice_a"))
        val binned = scored
          .join(docSlices, scored("vec_id") === docSlices("doc_id"))
          .withColumn("bin", least(floor($"score" / 128.0).cast("long"), lit(7L)))
        val counts = binned.groupBy($"bin").agg(
          sum(when($"slice_a", 1L).otherwise(0L)).as("cnt_a"),
          sum(when(!$"slice_a", 1L).otherwise(0L)).as("cnt_b"))
        val totals = binned.agg(
          sum(when($"slice_a", 1L).otherwise(0L)).as("na"),
          sum(when(!$"slice_a", 1L).otherwise(0L)).as("nb"))
        // all 8 bins must appear (smoothing needs empty bins too)
        val pa = ($"cnt_a" + 1.0) / ($"na" + 8.0)
        val pb = ($"cnt_b" + 1.0) / ($"nb" + 8.0)
        s.range(0, 8).toDF("bin")
          .join(counts, Seq("bin"), "left")
          .na.fill(0L, Seq("cnt_a", "cnt_b"))
          .crossJoin(broadcast(totals))
          .select($"bin", $"cnt_a", $"cnt_b",
            graft.functions.TextFunctions.r4((pa - pb) * log(pa / pb))
              .as("psi_term"))
          .orderBy($"bin")
      },
      Some(
        s"""${gdCtes(Iters, None)},
           |${finalMargins(Iters, "tr")},
           |sl AS MATERIALIZED (
           |  SELECT z.vec_id, ${scoreExpr("z.z")} AS score,
           |    CAST(substr(d.source, 4) AS INT) < 10 AS slice_a
           |  FROM zf z JOIN documents d ON d.doc_id = z.vec_id),
           |binned AS MATERIALIZED (
           |  SELECT LEAST(CAST(floor(score / 128.0) AS BIGINT), 7) AS bin, slice_a
           |  FROM sl),
           |counts AS MATERIALIZED (
           |  SELECT bin,
           |    SUM(CASE WHEN slice_a THEN 1 ELSE 0 END) AS cnt_a,
           |    SUM(CASE WHEN slice_a THEN 0 ELSE 1 END) AS cnt_b
           |  FROM binned GROUP BY bin),
           |tot AS MATERIALIZED (
           |  SELECT SUM(CASE WHEN slice_a THEN 1 ELSE 0 END) AS na,
           |    SUM(CASE WHEN slice_a THEN 0 ELSE 1 END) AS nb
           |  FROM binned),
           |bins AS (SELECT CAST(unnest(range(0, 8)) AS BIGINT) AS bin)
           |SELECT b.bin,
           |  CAST(COALESCE(c.cnt_a, 0) AS BIGINT) AS cnt_a,
           |  CAST(COALESCE(c.cnt_b, 0) AS BIGINT) AS cnt_b,
           |  floor((((COALESCE(c.cnt_a, 0) + 1.0) / (t.na + 8.0)
           |          - (COALESCE(c.cnt_b, 0) + 1.0) / (t.nb + 8.0))
           |    * ln(((COALESCE(c.cnt_a, 0) + 1.0) / (t.na + 8.0))
           |         / ((COALESCE(c.cnt_b, 0) + 1.0) / (t.nb + 8.0))))
           |    * 10000.0 + 0.5) / 10000.0 AS psi_term
           |FROM bins b LEFT JOIN counts c ON b.bin = c.bin CROSS JOIN tot t
           |ORDER BY b.bin""".stripMargin)),

    // ----- q161: threshold-free holdout evaluation — train on the
    // q129 split (same salt, same 80%), then exact ROC-AUC (the
    // Mann–Whitney identity with the ½-per-tied-pair correction kept
    // integer by counting halves) and average precision over the
    // ≤1025-row score-LEVEL frame (operators.RocEval — corpus-size-
    // independent after one aggregation). The oracle replays
    // training, holdout scoring, and both level self-joins.
    QueryDef(
      "q161_roc_auc",
      (s, d) => {
        import s.implicits._
        val f = Sampling.hashFraction($"vec_id", Salt)
        val embs = withY(Tables.embeddings(s, d))
        val model = LogReg.train(embs.filter(f < TrainFrac), "embedding", "y",
          Iters, EtaDen, PosWeight)
        val scored = LogReg.scoreAll(
          embs.filter(f >= TrainFrac), "vec_id", "embedding", "y", model)
        graft.operators.RocEval.summary(scored, "score", "y")
      },
      Some {
        val frac = Sampling.hashFractionSql("vec_id", Salt)
        val apQ = graft.operators.RocEval.ApQuantum
        s"""${gdCtes(Iters, Some(s"$frac < $TrainFrac"))},
           |te AS (SELECT vec_id FROM embeddings WHERE $frac >= $TrainFrac),
           |${finalMargins(Iters, "te")},
           |lv AS MATERIALIZED (
           |  SELECT ${scoreExpr("z.z")} AS s,
           |    CAST(SUM(l.y) AS BIGINT) AS pos,
           |    CAST(SUM(1 - l.y) AS BIGINT) AS neg
           |  FROM zf z JOIN lab l ON z.vec_id = l.vec_id
           |  GROUP BY 1),
           |tot AS (
           |  SELECT CAST(SUM(pos) AS BIGINT) AS p_total,
           |    CAST(SUM(neg) AS BIGINT) AS n_total,
           |    CAST(COUNT(*) AS BIGINT) AS n_levels
           |  FROM lv),
           |aucn AS (
           |  SELECT CAST(COALESCE(SUM(a.pos * b.neg *
           |      (CASE WHEN a.s > b.s THEN 2 ELSE 1 END)), 0) AS BIGINT) AS auc_num
           |  FROM lv a JOIN lv b ON a.s >= b.s),
           |apt AS (
           |  SELECT t.s AS st, t.pos AS pos_t,
           |    CAST(SUM(l.pos) AS BIGINT) AS tpge,
           |    CAST(SUM(l.neg) AS BIGINT) AS fpge
           |  FROM (SELECT s, pos FROM lv WHERE pos > 0) t
           |  JOIN lv l ON l.s >= t.s
           |  GROUP BY t.s, t.pos),
           |apn AS (
           |  SELECT CAST(COALESCE(SUM(
           |      ${fdiv(s"$apQ * pos_t * tpge", "tpge + fpge")}), 0) AS BIGINT) AS ap_num
           |  FROM apt)
           |SELECT tot.p_total, tot.n_total, tot.n_levels,
           |  aucn.auc_num,
           |  CAST(2 * tot.p_total * tot.n_total AS BIGINT) AS auc_den,
           |  ${fdiv("1000 * aucn.auc_num",
                     "NULLIF(2 * tot.p_total * tot.n_total, 0)")} AS auc_milli,
           |  ${fdiv("1000 * (aucn.auc_num - tot.p_total * tot.n_total)",
                     "NULLIF(tot.p_total * tot.n_total, 0)")} AS gini_milli,
           |  ${fdiv("apn.ap_num", "NULLIF(1000 * tot.p_total, 0)")} AS ap_milli
           |FROM tot CROSS JOIN aucn CROSS JOIN apn""".stripMargin
      }),

    // ----- q219: DeLong standard error + Wald band for the q161
    // holdout AUC — "is the AUC gap real" needs a variance, and
    // DeLong's placement-value estimator is the standard one. Exact
    // integer placements at score-level granularity (≤1025 levels ⇒
    // the level×level cross join is corpus-size-independent), exact
    // BIGINT moment sums, then one fixed double assembly for the
    // variance and the 1.96·se band, mirrored textually.
    QueryDef(
      "q219_delong_auc",
      (s, d) => {
        import s.implicits._
        val f = Sampling.hashFraction($"vec_id", Salt)
        val embs = withY(Tables.embeddings(s, d))
        val model = LogReg.train(embs.filter(f < TrainFrac), "embedding", "y",
          Iters, EtaDen, PosWeight)
        val scored = LogReg.scoreAll(
          embs.filter(f >= TrainFrac), "vec_id", "embedding", "y", model)
        graft.operators.RocEval.delong(scored, "score", "y")
      },
      Some {
        val frac = Sampling.hashFractionSql("vec_id", Salt)
        s"""${gdCtes(Iters, Some(s"$frac < $TrainFrac"))},
           |te AS (SELECT vec_id FROM embeddings WHERE $frac >= $TrainFrac),
           |${finalMargins(Iters, "te")},
           |lv AS MATERIALIZED (
           |  SELECT ${scoreExpr("z.z")} AS s,
           |    CAST(SUM(l.y) AS BIGINT) AS pos,
           |    CAST(SUM(1 - l.y) AS BIGINT) AS neg
           |  FROM zf z JOIN lab l ON z.vec_id = l.vec_id
           |  GROUP BY 1),
           |tot AS (
           |  SELECT CAST(SUM(pos) AS BIGINT) AS p_total,
           |    CAST(SUM(neg) AS BIGINT) AS n_total
           |  FROM lv),
           |pl AS MATERIALIZED (
           |  SELECT a.s, a.pos AS pa, a.neg AS na,
           |    CAST(SUM(CASE WHEN b.s < a.s THEN b.neg ELSE 0 END) * 2
           |      + a.neg AS BIGINT) AS x10,
           |    CAST(SUM(CASE WHEN b.s > a.s THEN b.pos ELSE 0 END) * 2
           |      + a.pos AS BIGINT) AS x01
           |  FROM lv a CROSS JOIN lv b
           |  GROUP BY a.s, a.pos, a.neg),
           |sums AS (
           |  SELECT CAST(SUM(pa * x10) AS BIGINT) AS swx10,
           |    CAST(SUM(pa * x10 * x10) AS BIGINT) AS sq10,
           |    CAST(SUM(na * x01) AS BIGINT) AS swx01,
           |    CAST(SUM(na * x01 * x01) AS BIGINT) AS sq01
           |  FROM pl),
           |m AS (SELECT * FROM tot CROSS JOIN sums),
           |fin AS (
           |  SELECT p_total, n_total,
           |    CAST(swx10 AS DOUBLE) / (2.0 * n_total * p_total) AS aucd,
           |    sqrt(
           |      (CAST(sq10 AS DOUBLE)
           |         - CAST(swx10 AS DOUBLE) * swx10 / p_total)
           |        / NULLIF(p_total - 1, 0) / (2.0 * n_total) / (2.0 * n_total)
           |        / p_total
           |      + (CAST(sq01 AS DOUBLE)
           |         - CAST(swx01 AS DOUBLE) * swx01 / n_total)
           |        / NULLIF(n_total - 1, 0) / (2.0 * p_total) / (2.0 * p_total)
           |        / n_total) AS sed,
           |    swx10
           |  FROM m)
           |SELECT p_total, n_total,
           |  ${fdiv("1000 * swx10", "NULLIF(2 * p_total * n_total, 0)")}
           |    AS auc_milli,
           |  CAST(floor(sed * 1000000 + 0.5) AS BIGINT) AS se_micro,
           |  CAST(floor((aucd - 1.96 * sed) * 1000 + 0.5) AS BIGINT)
           |    AS lo_milli,
           |  CAST(floor((aucd + 1.96 * sed) * 1000 + 0.5) AS BIGINT)
           |    AS hi_milli
           |FROM fin""".stripMargin
      }),

    // ----- q164: multinomial Naive Bayes (operators.NaiveBayes) —
    // the closed-form generative counterpart to the q128 GD trainer:
    // one aggregation pass IS the training. Self-train on
    // documents.lang, Laplace add-one, and scores kept EXACT by
    // rounding each ln to r4 fixed point BEFORE summing (one libm
    // call per model cell; from there pure BIGINT algebra), so the
    // oracle reproduces every posterior and the argmax with no
    // tolerance.
    QueryDef(
      "q164_naive_bayes",
      (s, d) => {
        import s.implicits._
        graft.operators.NaiveBayes
          .classify(graft.Par.spread(Tables.documents(s, d)),
            "doc_id", "text", "lang")
          .orderBy($"doc_id")
      },
      Some("""WITH toks AS MATERIALIZED (
             |  SELECT doc_id, lang AS c, w FROM (
             |    SELECT doc_id, lang, unnest(string_split(text, ' ')) AS w
             |    FROM documents)
             |  WHERE length(w) > 0),
             |wc AS (
             |  SELECT c, w, CAST(count(*) AS BIGINT) AS cnt
             |  FROM toks GROUP BY 1, 2),
             |tot AS (SELECT c, CAST(SUM(cnt) AS BIGINT) AS tot FROM wc GROUP BY 1),
             |vocab AS (SELECT DISTINCT w FROM wc),
             |vv AS (SELECT CAST(COUNT(*) AS BIGINT) AS v FROM vocab),
             |pri AS (
             |  SELECT lang AS c, CAST(COUNT(*) AS BIGINT) AS nc
             |  FROM documents GROUP BY 1),
             |nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM documents),
             |grid AS MATERIALIZED (
             |  SELECT t.c, vb.w,
             |    CAST(floor(ln(CAST(COALESCE(wc.cnt, 0) + 1 AS DOUBLE)
             |                  / CAST(t.tot + vv.v AS DOUBLE)) * 10000 + 0.5)
             |      AS BIGINT) AS lnq
             |  FROM tot t CROSS JOIN vocab vb CROSS JOIN vv
             |  LEFT JOIN wc ON wc.c = t.c AND wc.w = vb.w),
             |pq AS (
             |  SELECT c, CAST(floor(ln(CAST(nc AS DOUBLE) / CAST(n AS DOUBLE))
             |    * 10000 + 0.5) AS BIGINT) AS lnp
             |  FROM pri CROSS JOIN nn),
             |dt AS (
             |  SELECT doc_id, w, CAST(count(*) AS BIGINT) AS cdw
             |  FROM toks GROUP BY 1, 2),
             |scored AS (
             |  SELECT dt.doc_id, g.c,
             |    CAST(SUM(dt.cdw * g.lnq) AS BIGINT) + MIN(p.lnp) AS score
             |  FROM dt JOIN grid g USING (w) JOIN pq p ON p.c = g.c
             |  GROUP BY dt.doc_id, g.c),
             |pred AS (
             |  SELECT doc_id, c AS pred_lang, score,
             |    row_number() OVER (
             |      PARTITION BY doc_id ORDER BY score DESC, c) AS rn
             |  FROM scored)
             |SELECT d.doc_id, d.lang, p.pred_lang, p.score
             |FROM pred p JOIN documents d USING (doc_id)
             |WHERE p.rn = 1 ORDER BY d.doc_id""".stripMargin)),

    // ----- q166: χ² feature selection (operators.ChiSquare) — the
    // supervised vocabulary ranking ahead of a q164/q128-style
    // filter. All contingency cells are exact BIGINTs; the χ² value
    // is ONE fixed left-associated IEEE double chain (each op exactly
    // rounded, no libm at all), r4-snapped — so the oracle reproduces
    // every score and the per-class top-10 with no tolerance.
    QueryDef(
      "q166_chi2_features",
      (s, d) => {
        graft.operators.ChiSquare
          .topFeatures(graft.Par.spread(Tables.documents(s, d)),
            "doc_id", "text", "lang", k = 10)
      },
      Some("""WITH pres AS MATERIALIZED (
             |  SELECT DISTINCT doc_id, lang AS c, w FROM (
             |    SELECT doc_id, lang, unnest(string_split(text, ' ')) AS w
             |    FROM documents)
             |  WHERE length(w) > 0),
             |a AS (
             |  SELECT c, w, CAST(COUNT(*) AS BIGINT) AS a_docs
             |  FROM pres GROUP BY 1, 2),
             |nw AS (SELECT w, CAST(SUM(a_docs) AS BIGINT) AS nw FROM a GROUP BY 1),
             |nc AS (
             |  SELECT lang AS c, CAST(COUNT(*) AS BIGINT) AS nc
             |  FROM documents GROUP BY 1),
             |nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM documents),
             |grid AS (
             |  SELECT nc.c, nw.w, COALESCE(a.a_docs, 0) AS a_docs,
             |    nw.nw, nc.nc, nn.n
             |  FROM nc CROSS JOIN nw CROSS JOIN nn
             |  LEFT JOIN a ON a.c = nc.c AND a.w = nw.w
             |  WHERE nw.nw > 0 AND nw.nw < nn.n),
             |scored AS (
             |  SELECT c, w, a_docs,
             |    CAST(floor(
             |      CAST(n AS DOUBLE)
             |      * CAST(a_docs * (n - nc - (nw - a_docs))
             |             - (nw - a_docs) * (nc - a_docs) AS DOUBLE)
             |      * CAST(a_docs * (n - nc - (nw - a_docs))
             |             - (nw - a_docs) * (nc - a_docs) AS DOUBLE)
             |      / CAST(nw AS DOUBLE) / CAST(n - nw AS DOUBLE)
             |      / CAST(nc AS DOUBLE) / CAST(n - nc AS DOUBLE)
             |      * 10000 + 0.5) AS BIGINT) AS chi2_q
             |  FROM grid),
             |rk AS (
             |  SELECT c, w, a_docs, chi2_q,
             |    CAST(row_number() OVER (
             |      PARTITION BY c ORDER BY chi2_q DESC, w) AS BIGINT) AS rnk
             |  FROM scored)
             |SELECT c, w, a_docs, chi2_q, rnk FROM rk
             |WHERE rnk <= 10 ORDER BY c, rnk""".stripMargin)),

    // ----- q169: depth-2 decision tree (operators.DecisionTree) —
    // split selection by EXACT Gini on integer counts (maximizing
    // S_L/n_L + S_R/n_R through its single-division IEEE double
    // image, (dim, threshold) tie-break), so the oracle re-derives
    // the ENTIRE tree — root argmax, per-branch second-level argmax,
    // leaf majority labels — and every row's routing hash-matches.
    // The model parameters ride every row (j/t columns), so the
    // learned structure itself is value-checked, not just the
    // predictions.
    QueryDef(
      "q169_decision_tree",
      (s, d) => {
        val embs = Tables.embeddings(s, d)
        val m = graft.operators.DecisionTree.fit(embs, "vec_id", "embedding", "label")
        graft.operators.DecisionTree.assign(embs, "vec_id", "embedding", "label", m)
      },
      Some("""WITH quant AS MATERIALIZED (
             |  SELECT vec_id, CAST(label AS BIGINT) AS label, pos,
             |    CAST(floor(CAST(v AS DOUBLE) * 1024) AS BIGINT) AS xq
             |  FROM (SELECT vec_id, label, unnest(embedding) AS v,
             |    unnest(list_transform(range(0, len(embedding)), x -> x)) AS pos
             |    FROM embeddings)),
             |th AS (SELECT CAST(-448 + 64 * k AS BIGINT) AS t FROM range(0, 15) r(k)),
             |cand AS (
             |  SELECT q.pos, th.t, (q.xq <= th.t) AS side, q.label,
             |    CAST(count(*) AS BIGINT) AS cnt
             |  FROM quant q CROSS JOIN th GROUP BY 1, 2, 3, 4),
             |ss AS (
             |  SELECT pos, t, side, CAST(SUM(cnt) AS BIGINT) AS n,
             |    CAST(SUM(cnt * cnt) AS BIGINT) AS s
             |  FROM cand GROUP BY 1, 2, 3),
             |pc AS (
             |  SELECT l.pos, l.t, l.n AS nl, l.s AS sl, r.n AS nr, r.s AS sr
             |  FROM ss l JOIN ss r
             |    ON l.pos = r.pos AND l.t = r.t AND l.side AND NOT r.side),
             |root AS (
             |  SELECT pos AS j0, t AS t0 FROM pc
             |  ORDER BY CAST(sl * nr + sr * nl AS DOUBLE)
             |    / CAST(nl * nr AS DOUBLE) DESC, pos, t LIMIT 1),
             |br AS MATERIALIZED (
             |  SELECT q.vec_id, (q.xq <= r.t0) AS branch
             |  FROM quant q, root r WHERE q.pos = r.j0),
             |cand2 AS (
             |  SELECT b.branch, q.pos, th.t, (q.xq <= th.t) AS side, q.label,
             |    CAST(count(*) AS BIGINT) AS cnt
             |  FROM quant q JOIN br b USING (vec_id) CROSS JOIN th
             |  GROUP BY 1, 2, 3, 4, 5),
             |ss2 AS (
             |  SELECT branch, pos, t, side, CAST(SUM(cnt) AS BIGINT) AS n,
             |    CAST(SUM(cnt * cnt) AS BIGINT) AS s
             |  FROM cand2 GROUP BY 1, 2, 3, 4),
             |pc2 AS (
             |  SELECT l.branch, l.pos, l.t, l.n AS nl, l.s AS sl,
             |    r.n AS nr, r.s AS sr
             |  FROM ss2 l JOIN ss2 r ON l.branch = r.branch AND l.pos = r.pos
             |    AND l.t = r.t AND l.side AND NOT r.side),
             |sub AS (
             |  SELECT branch, pos AS js, t AS tsub FROM (
             |    SELECT branch, pos, t,
             |      row_number() OVER (PARTITION BY branch ORDER BY
             |        CAST(sl * nr + sr * nl AS DOUBLE)
             |          / CAST(nl * nr AS DOUBLE) DESC, pos, t) AS rn
             |    FROM pc2) WHERE rn = 1),
             |routed AS MATERIALIZED (
             |  SELECT b.vec_id, lb.label,
             |    CAST(CASE WHEN b.branch THEN 0 ELSE 2 END +
             |         CASE WHEN q.xq <= s.tsub THEN 0 ELSE 1 END AS BIGINT) AS leaf,
             |    s.js AS j_sub, s.tsub AS t_sub
             |  FROM br b
             |  JOIN sub s ON s.branch = b.branch
             |  JOIN quant q ON q.vec_id = b.vec_id AND q.pos = s.js
             |  JOIN (SELECT vec_id, CAST(label AS BIGINT) AS label
             |        FROM embeddings) lb ON lb.vec_id = b.vec_id),
             |lpc AS (
             |  SELECT leaf, label, CAST(count(*) AS BIGINT) AS cnt
             |  FROM routed GROUP BY 1, 2),
             |lp AS (
             |  SELECT leaf, label AS pred FROM (
             |    SELECT leaf, label, row_number() OVER (
             |      PARTITION BY leaf ORDER BY cnt DESC, label) AS rn
             |    FROM lpc) WHERE rn = 1)
             |SELECT r.vec_id, r.label, r.leaf, p.pred,
             |  rt.j0 AS j_root, rt.t0 AS t_root, r.j_sub, r.t_sub
             |FROM routed r JOIN lp p USING (leaf) CROSS JOIN root rt
             |ORDER BY r.vec_id""".stripMargin)),

    // ----- q175: discrete AdaBoost, 3 rounds of decision stumps
    // (operators.AdaBoost) — the boosting member. Every weight is an
    // exact integer (the unnormalized update's total is EXACTLY
    // 2·err·(W−err), so renormalization reduces to one truncating
    // integer division per row, Spark DIV ≡ DuckDB //); the only
    // libm call is one ln per round for the r4-snapped vote weight.
    // The oracle unrolls all three rounds — weighted stump argmin
    // (err, dim, threshold, polarity tie-break), weight recurrence,
    // vote weights — and every row's exact BIGINT margin and sign
    // hash-match.
    QueryDef(
      "q175_adaboost",
      (s, d) => {
        val embs = Tables.embeddings(s, d)
        val m = graft.operators.AdaBoost.fit(embs, "vec_id", "embedding",
          "label", iterations = AdaRounds)
        graft.operators.AdaBoost.score(embs, "vec_id", "embedding", "label", m)
      },
      Some(adaboostOracle)),

    // ----- q217: isotonic calibration (Zadrozny & Elkan 2002) of the
    // q208 reliability table — the monotone score→probability map a
    // quality classifier ships with. operators.Isotonic computes the
    // fit via the minimax identity (max_{j≤i} min_{k≥i} of the 2^-20
    // quantized range rates) instead of a PAV sweep, so the whole fit
    // is joins + min/max over exact integers and the oracle replays
    // it range-for-range; bin count is a design constant (~10), so
    // the bins³ membership joins are O(1) in the corpus.
    {
      val BinW = 500000L   // q208's bin width — same reliability table
      QueryDef(
        "q217_isotonic_calibration",
        (s, d) => {
          import s.implicits._
          val embs = withY(Tables.embeddings(s, d))
          val model = LogReg.train(embs, "embedding", "y", Iters, EtaDen, PosWeight)
          val bins = LogReg.scoreAll(embs, "vec_id", "embedding", "y", model)
            .select($"y",
              floor($"margin".cast("double") / BinW).cast("long").as("bin"))
            .groupBy($"bin")
            .agg(count(lit(1)).as("n"), sum($"y").as("n_pos"))
          graft.operators.Isotonic.fit(bins, "bin", "n", "n_pos")
            .select($"bin", $"n", $"n_pos",
              expr("n_pos * 1000 DIV n").as("raw_milli"),
              expr(s"fitted_q * 1000 DIV ${graft.operators.Isotonic.RateQ}")
                .as("iso_milli"))
            .orderBy($"bin")
        },
        Some {
          val q = graft.operators.Isotonic.RateQ
          s"""${gdCtes(Iters, None)},
             |${finalMargins(Iters, "tr")},
             |bins AS MATERIALIZED (
             |  SELECT ${fdiv("z.z", BinW.toString)} AS bin,
             |    CAST(count(*) AS BIGINT) AS n,
             |    CAST(SUM(l.y) AS BIGINT) AS n_pos
             |  FROM zf z JOIN lab l ON z.vec_id = l.vec_id
             |  GROUP BY 1),
             |rg AS (SELECT j.bin AS jx, k.bin AS kx
             |       FROM bins j JOIN bins k ON j.bin <= k.bin),
             |rs AS MATERIALIZED (
             |  SELECT rg.jx, rg.kx,
             |    CAST(SUM(b.n_pos) * $q // SUM(b.n) AS BIGINT) AS avg_q
             |  FROM rg JOIN bins b ON b.bin BETWEEN rg.jx AND rg.kx
             |  GROUP BY 1, 2),
             |mji AS (
             |  SELECT b.bin AS i, rs.jx, MIN(rs.avg_q) AS m
             |  FROM rs JOIN bins b ON rs.jx <= b.bin AND rs.kx >= b.bin
             |  GROUP BY 1, 2),
             |fit AS (SELECT i AS bin, CAST(MAX(m) AS BIGINT) AS fitted_q
             |        FROM mji GROUP BY 1)
             |SELECT b.bin, b.n, b.n_pos,
             |  CAST(b.n_pos * 1000 // b.n AS BIGINT) AS raw_milli,
             |  CAST(f.fitted_q * 1000 // $q AS BIGINT) AS iso_milli
             |FROM bins b JOIN fit f ON b.bin = f.bin
             |ORDER BY b.bin""".stripMargin
        })
    },

    // ----- q242: Brier score + Murphy decomposition — the PROPER-
    // SCORING eval member next to q161 (ranking), q208 (reliability
    // table), q217 (calibration fit): overall Brier is EXACT integer
    // algebra (score is a 0..1024 fixed-point probability, so
    // Σ(s−1024·y)² is a BIGINT), and the binned reliability/resolution
    // components snap each bin's term to micro BIGINT before the
    // cross-bin sum (8 doubles summed in engine order would be the
    // order-sensitivity bug this suite bans).
    QueryDef(
      "q242_brier_decomposition",
      (s, d) => {
        import s.implicits._
        val embs = withY(Tables.embeddings(s, d))
        val model = LogReg.train(embs, "embedding", "y", Iters, EtaDen, PosWeight)
        val scored = LogReg.scoreAll(embs, "vec_id", "embedding", "y", model)
          .withColumn("bin", least(floor($"score" / 128.0).cast("long"), lit(7L)))
          .transform(graft.operators.Iterate.truncate)
        val bins = scored.groupBy($"bin")
          .agg(count(lit(1)).as("nk"), sum($"score").as("ssk"),
            sum($"y").as("syk"))
        val tot = scored.agg(count(lit(1)).as("n"), sum($"y").as("sy"),
          sum(($"score" - lit(1024L) * $"y") * ($"score" - lit(1024L) * $"y"))
            .as("sq"))
        val terms = bins.crossJoin(tot)
          .select(
            floor($"nk".cast("double")
              * ($"ssk".cast("double") / (lit(1024.0) * $"nk")
                - $"syk".cast("double") / $"nk")
              * ($"ssk".cast("double") / (lit(1024.0) * $"nk")
                - $"syk".cast("double") / $"nk")
              * 1000000.0 + lit(0.5)).cast("long").as("relk"),
            floor($"nk".cast("double")
              * ($"syk".cast("double") / $"nk" - $"sy".cast("double") / $"n")
              * ($"syk".cast("double") / $"nk" - $"sy".cast("double") / $"n")
              * 1000000.0 + lit(0.5)).cast("long").as("resk"))
          .agg(sum($"relk").as("srel"), sum($"resk").as("sres"))
        terms.crossJoin(tot).select($"n",
          floor($"sq".cast("double") / 1048576.0 / $"n" * 1000000.0
            + lit(0.5)).cast("long").as("brier_micro"),
          floor($"srel".cast("double") / $"n" + lit(0.5)).cast("long")
            .as("rel_micro"),
          floor($"sres".cast("double") / $"n" + lit(0.5)).cast("long")
            .as("res_micro"),
          floor($"sy".cast("double") * ($"n" - $"sy") / $"n" / $"n"
            * 1000000.0 + lit(0.5)).cast("long").as("unc_micro"))
      },
      Some(
        s"""${gdCtes(Iters, None)},
           |${finalMargins(Iters, "tr")},
           |sc AS MATERIALIZED (
           |  SELECT z.vec_id, ${scoreExpr("z.z")} AS score, l.y
           |  FROM zf z JOIN lab l ON z.vec_id = l.vec_id),
           |binned AS MATERIALIZED (
           |  SELECT LEAST(CAST(floor(score / 128.0) AS BIGINT), 7) AS bin,
           |    score, y
           |  FROM sc),
           |bins AS (
           |  SELECT bin, CAST(count(*) AS BIGINT) AS nk,
           |    CAST(SUM(score) AS BIGINT) AS ssk,
           |    CAST(SUM(y) AS BIGINT) AS syk
           |  FROM binned GROUP BY 1),
           |tot AS (
           |  SELECT CAST(count(*) AS BIGINT) AS n, CAST(SUM(y) AS BIGINT) AS sy,
           |    CAST(SUM((score - 1024 * y) * (score - 1024 * y)) AS BIGINT) AS sq
           |  FROM binned),
           |terms AS (
           |  SELECT
           |    CAST(SUM(CAST(floor(CAST(nk AS DOUBLE)
           |      * (CAST(ssk AS DOUBLE) / (1024.0 * nk)
           |        - CAST(syk AS DOUBLE) / nk)
           |      * (CAST(ssk AS DOUBLE) / (1024.0 * nk)
           |        - CAST(syk AS DOUBLE) / nk)
           |      * 1000000.0 + 0.5) AS BIGINT)) AS BIGINT) AS srel,
           |    CAST(SUM(CAST(floor(CAST(nk AS DOUBLE)
           |      * (CAST(syk AS DOUBLE) / nk - CAST(sy AS DOUBLE) / n)
           |      * (CAST(syk AS DOUBLE) / nk - CAST(sy AS DOUBLE) / n)
           |      * 1000000.0 + 0.5) AS BIGINT)) AS BIGINT) AS sres
           |  FROM bins CROSS JOIN tot)
           |SELECT n,
           |  CAST(floor(CAST(sq AS DOUBLE) / 1048576.0 / n * 1000000.0 + 0.5)
           |    AS BIGINT) AS brier_micro,
           |  CAST(floor(CAST(srel AS DOUBLE) / n + 0.5) AS BIGINT) AS rel_micro,
           |  CAST(floor(CAST(sres AS DOUBLE) / n + 0.5) AS BIGINT) AS res_micro,
           |  CAST(floor(CAST(sy AS DOUBLE) * (n - sy) / n / n * 1000000.0 + 0.5)
           |    AS BIGINT) AS unc_micro
           |FROM terms CROSS JOIN tot""".stripMargin)),

    // ----- q243: decile lift / gains table — the deployment-facing
    // view of the q128 classifier ("score the corpus, work the top
    // decile first"): exact ntile deciles over (score desc, vec_id)
    // via GlobalOrder.ntileRank (two-pass tile assignment, NOT an
    // unpartitioned ntile window — the q91 discipline), per-decile
    // positive rate, lift vs the base rate, and cumulative capture,
    // every ratio one fixed snapped division over exact counts.
    QueryDef(
      "q243_decile_lift",
      (s, d) => {
        import s.implicits._
        val embs = withY(Tables.embeddings(s, d))
        val model = LogReg.train(embs, "embedding", "y", Iters, EtaDen, PosWeight)
        val scored = LogReg.scoreAll(embs, "vec_id", "embedding", "y", model)
        val ranked = graft.operators.GlobalOrder.ntileRank(
          scored.select($"vec_id", $"score", $"y"),
          Seq($"score".desc, $"vec_id"), 10, "decile")
        val dec = ranked.groupBy($"decile")
          .agg(count(lit(1)).as("n"), sum($"y").as("pos"))
          .transform(graft.operators.Iterate.truncate)
        val tot = dec.agg(sum($"n").as("sn"), sum($"pos").as("spos"))
        val cum = dec.as("a").join(dec.as("b"), $"b.decile" <= $"a.decile")
          .groupBy($"a.decile".as("decile"))
          .agg(sum($"b.pos").as("cpos"))
        dec.join(cum, "decile").crossJoin(tot)
          .select($"decile", $"n", $"pos",
            floor($"pos".cast("double") / $"n" * 1000.0 + lit(0.5))
              .cast("long").as("rate_milli"),
            floor(($"pos".cast("double") / $"n")
              / ($"spos".cast("double") / $"sn") * 1000.0 + lit(0.5))
              .cast("long").as("lift_milli"),
            floor($"cpos".cast("double") / $"spos" * 1000.0 + lit(0.5))
              .cast("long").as("capture_milli"))
          .orderBy($"decile")
      },
      Some(
        s"""${gdCtes(Iters, None)},
           |${finalMargins(Iters, "tr")},
           |sc AS MATERIALIZED (
           |  SELECT z.vec_id, ${scoreExpr("z.z")} AS score, l.y
           |  FROM zf z JOIN lab l ON z.vec_id = l.vec_id),
           |ranked AS MATERIALIZED (
           |  SELECT vec_id, y,
           |    CAST(ntile(10) OVER (ORDER BY score DESC, vec_id) AS BIGINT)
           |      AS decile
           |  FROM sc),
           |dec AS MATERIALIZED (
           |  SELECT decile, CAST(count(*) AS BIGINT) AS n,
           |    CAST(SUM(y) AS BIGINT) AS pos
           |  FROM ranked GROUP BY 1),
           |tot AS (SELECT CAST(SUM(n) AS BIGINT) AS sn,
           |    CAST(SUM(pos) AS BIGINT) AS spos FROM dec),
           |cum AS (
           |  SELECT a.decile, CAST(SUM(b.pos) AS BIGINT) AS cpos
           |  FROM dec a JOIN dec b ON b.decile <= a.decile
           |  GROUP BY 1)
           |SELECT d.decile, d.n, d.pos,
           |  CAST(floor(CAST(d.pos AS DOUBLE) / d.n * 1000.0 + 0.5) AS BIGINT)
           |    AS rate_milli,
           |  CAST(floor((CAST(d.pos AS DOUBLE) / d.n)
           |    / (CAST(t.spos AS DOUBLE) / t.sn) * 1000.0 + 0.5) AS BIGINT)
           |    AS lift_milli,
           |  CAST(floor(CAST(c.cpos AS DOUBLE) / t.spos * 1000.0 + 0.5)
           |    AS BIGINT) AS capture_milli
           |FROM dec d JOIN cum c ON d.decile = c.decile CROSS JOIN tot t
           |ORDER BY d.decile""".stripMargin)),

    // ----- q241: Poisson GLM by gradient ascent — the COUNTS member
    // of the GLM family (q128's logistic handles binary labels; event
    // counts need log-link Poisson): per-user purchase counts
    // regressed on the centered view count, λ = exp(b0 + b1·zc).
    // 4 fixed full-batch iterations, the whole recurrence oracle-
    // replayed: init b0 at the closed-form intercept MLE ln(ȳ) (one
    // snapped ln), each row's rate λ micro-snapped through ONE exp
    // (the q96/q236 libm discipline), exact BIGINT score sums
    // Σ(y−λ) and Σ(y−λ)·zc, micro-snapped parameter updates. Scale
    // shape: each iteration is one conditional aggregate over the
    // per-user frame — the corpus never shuffles after the first
    // groupBy; parameter state is a 1-row frame (never collected).
    QueryDef(
      "q241_poisson_glm",
      (s, d) => {
        import s.implicits._
        val users = Tables.events(s, d)
          .groupBy($"user_id")
          .agg(sum(when($"event_type" === "purchase", 1L).otherwise(0L)).as("y"),
            sum(when($"event_type" === "view", 1L).otherwise(0L)).as("z"))
          .transform(graft.operators.Iterate.truncate)
        val zb = users.agg(count(lit(1)).as("n"), sum($"y").as("sy"),
            sum($"z").as("sz"))
          .select($"n", $"sy",
            floor($"sz".cast("double") * 1000.0 / $"n" + lit(0.5))
              .cast("long").as("zbarm"))
        val u2 = users.crossJoin(zb)
          .select($"user_id", $"y", ($"z" * lit(1000L) - $"zbarm").as("zcm"),
            $"n", $"sy")
          .transform(graft.operators.Iterate.truncate)
        var par = zb.select(
          floor(log($"sy".cast("double") / $"n") * 1000000.0 + lit(0.5))
            .cast("long").as("b0m"),
          lit(0L).as("b1m")).transform(graft.operators.Iterate.truncate)
        for (_ <- 1 to 4) {
          val lam = floor(exp($"b0m".cast("double") / 1000000.0
            + $"b1m".cast("double") / 1000000.0 * ($"zcm".cast("double") / 1000.0))
            * 1000000.0 + lit(0.5)).cast("long")
          val g = u2.crossJoin(par)
            .select($"y", $"zcm", $"n", $"b0m", $"b1m", lam.as("lam"))
            .groupBy($"b0m", $"b1m")
            .agg(max($"n").as("n"),
              sum($"y" * lit(1000000L) - $"lam").as("g0"),
              sum(($"y" * lit(1000000L) - $"lam") * $"zcm").as("g1"))
          par = g.select(
            ($"b0m" + floor(lit(0.5) * $"g0".cast("double") / $"n" + lit(0.5))
              .cast("long")).as("b0m"),
            ($"b1m" + floor(lit(0.002) * $"g1".cast("double")
              / (lit(1000.0) * $"n") + lit(0.5)).cast("long")).as("b1m"))
            .transform(graft.operators.Iterate.truncate)
        }
        par.crossJoin(zb.select($"n".as("n_users"), $"sy"))
          .select($"n_users", $"sy", $"b0m".as("b0_micro"),
            $"b1m".as("b1_micro"),
            floor(exp($"b0m".cast("double") / 1000000.0) * 1000000.0
              + lit(0.5)).cast("long").as("base_rate_micro"))
      },
      Some {
        def iter(t: Int): String =
          s"""g$t AS (
             |  SELECT p.b0m, p.b1m, MAX(u.n) AS n,
             |    CAST(SUM(u.y * 1000000 -
             |      CAST(floor(exp(p.b0m / 1000000.0
             |        + p.b1m / 1000000.0 * (u.zcm / 1000.0))
             |        * 1000000.0 + 0.5) AS BIGINT)) AS BIGINT) AS g0,
             |    CAST(SUM((u.y * 1000000 -
             |      CAST(floor(exp(p.b0m / 1000000.0
             |        + p.b1m / 1000000.0 * (u.zcm / 1000.0))
             |        * 1000000.0 + 0.5) AS BIGINT)) * u.zcm) AS BIGINT) AS g1
             |  FROM u2 u CROSS JOIN par${t - 1} p
             |  GROUP BY p.b0m, p.b1m),
             |par$t AS MATERIALIZED (
             |  SELECT
             |    b0m + CAST(floor(0.5 * CAST(g0 AS DOUBLE) / n + 0.5) AS BIGINT)
             |      AS b0m,
             |    b1m + CAST(floor(0.002 * CAST(g1 AS DOUBLE) / (1000.0 * n)
             |      + 0.5) AS BIGINT) AS b1m
             |  FROM g$t)""".stripMargin
        s"""WITH users AS MATERIALIZED (
           |  SELECT user_id,
           |    CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
           |      AS BIGINT) AS y,
           |    CAST(SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
           |      AS BIGINT) AS z
           |  FROM events GROUP BY 1),
           |zb AS (
           |  SELECT CAST(count(*) AS BIGINT) AS n, CAST(SUM(y) AS BIGINT) AS sy,
           |    CAST(floor(CAST(SUM(z) AS DOUBLE) * 1000.0 / count(*) + 0.5)
           |      AS BIGINT) AS zbarm
           |  FROM users),
           |u2 AS MATERIALIZED (
           |  SELECT u.user_id, u.y, u.z * 1000 - b.zbarm AS zcm, b.n, b.sy
           |  FROM users u CROSS JOIN zb b),
           |par0 AS MATERIALIZED (
           |  SELECT CAST(floor(ln(CAST(sy AS DOUBLE) / n) * 1000000.0 + 0.5)
           |    AS BIGINT) AS b0m, 0::BIGINT AS b1m
           |  FROM zb),
           |${(1 to 4).map(iter).mkString(",\n")}
           |SELECT b.n AS n_users, b.sy, p.b0m AS b0_micro, p.b1m AS b1_micro,
           |  CAST(floor(exp(p.b0m / 1000000.0) * 1000000.0 + 0.5) AS BIGINT)
           |    AS base_rate_micro
           |FROM par4 p CROSS JOIN zb b""".stripMargin
      }),

    // ----- q274: L2 gradient boosting over regression stumps
    // (operators.GradientBoost) — predict line price from quantized
    // quantity/discount/tax, 4 shrinkage-halved rounds. The
    // REGRESSION member of the supervised family; like q175 AdaBoost
    // the ENTIRE training recurrence is exact integer algebra
    // (residual cents, fdiv leaf means, 1e6-quantized split gains
    // snapped BEFORE the argmax), so the oracle replays all 4 rounds
    // — decile grids, candidate scans, argmax tie-breaks, residual
    // updates, training-curve SSE — as unrolled CTEs, value for
    // value. No libm anywhere.
    QueryDef(
      "q274_gbm_stumps",
      (s, d) => {
        import s.implicits._
        val rows = Tables.lineitem(s, d).select(
          floor($"l_quantity" * 100 + lit(0.5)).cast("long").as("x0"),
          floor($"l_discount" * 100 + lit(0.5)).cast("long").as("x1"),
          floor($"l_tax" * 100 + lit(0.5)).cast("long").as("x2"),
          floor($"l_extendedprice" * 100 + lit(0.5)).cast("long").as("yc"))
        val fit = graft.operators.GradientBoost.fit(
          rows, Seq("x0", "x1", "x2"), "yc", GbmRounds)
        fit.map { case (r, sse) =>
          (r.round.toLong, r.dim.toLong, r.thr, r.nL,
            r.gammaL, r.gammaR, r.gainCq, sse)
        }.toDF("round", "dim", "thr", "n_l", "gamma_l", "gamma_r",
            "gain_cq", "sse_cq")
          .orderBy($"round")
      },
      Some(gbmOracle)),

    // ----- q293: linear QUANTILE regression (pinball subgradient GD,
    // τ = 0.9) — the conditional-p90 "premium price curve" per unit
    // quantity, next to q194's conditional-mean OLS and q195's
    // Theil–Sen median slope. With the rational τ the subgradient is
    // integer sign algebra (−9 under / +1 over), so every gradient
    // sum is an exact BIGINT and the 4-round training curve replays
    // in unrolled CTEs (the q128/q274 discipline); the only divisions
    // are fdiv, mirrored verbatim.
    QueryDef(
      "q293_quantile_regression",
      (s, d) => {
        import s.implicits._
        val rows = Tables.lineitem(s, d).select(
          floor($"l_quantity" * 100 + lit(0.5)).cast("long").as("x"),
          floor($"l_extendedprice" * 100 + lit(0.5)).cast("long").as("y"))
        graft.operators.QuantileReg.fit(rows, "x", "y",
            posW = 9L, negW = 1L, iterations = QrRounds)
          .toDF("round", "w0", "w1", "loss_x10")
          .orderBy($"round")
      },
      Some(qrOracle)),

    // ----- q304: 5-fold cross-validated OLS (price ~ quantity) on
    // the PORTABLE Weyl hash split (the q84/q85 sampling convention:
    // fold assignment is a pure function of the stable row id, so
    // any engine reproduces the identical folds) — the model-eval
    // member the supervised family lacked: out-of-fold R² instead of
    // training-set fit. Train-fold moments are TOTAL − fold (exact
    // integer subtraction — no second scan); slope/intercept are one
    // fixed all-double chain over the exact moments, milli-snapped;
    // test residuals are exact integers against the SNAPPED
    // parameters; SSE/SST accumulate in decimal(38,0)/HUGEINT.
    QueryDef(
      "q304_kfold_cv",
      (s, d) => {
        import s.implicits._
        val rows = Tables.lineitem(s, d).select(
            ($"l_orderkey" * 10 + $"l_linenumber").as("rid"),
            floor($"l_quantity" * 100 + lit(0.5)).cast("long").as("x"),
            floor($"l_extendedprice" * 100 + lit(0.5)).cast("long").as("y"))
          .withColumn("fold",
            graft.operators.Sampling.hashBits($"rid", 304L) % 5)
        val per = rows.groupBy($"fold").agg(
          count(lit(1)).as("n"), sum($"x").as("sx"), sum($"y").as("sy"),
          sum($"x" * $"x").as("sxx"), sum($"x" * $"y").as("sxy"))
        val tot = rows.agg(count(lit(1)).as("tn"), sum($"x").as("tsx"),
          sum($"y").as("tsy"), sum($"x" * $"x").as("tsxx"),
          sum($"x" * $"y").as("tsxy"))
        val params = per.crossJoin(tot)
          .select($"fold", $"n".as("n_test"), $"sy",
            ($"tn" - $"n").as("n_train"),
            ($"tsx" - $"sx").as("rx"), ($"tsy" - $"sy").as("ry"),
            ($"tsxx" - $"sxx").as("rxx"), ($"tsxy" - $"sxy").as("rxy"))
          .withColumn("slope_milli", floor(
            ($"n_train".cast("double") * $"rxy".cast("double")
              - $"rx".cast("double") * $"ry".cast("double"))
            / ($"n_train".cast("double") * $"rxx".cast("double")
              - $"rx".cast("double") * $"rx".cast("double"))
            * 1000 + lit(0.5)).cast("long"))
          .withColumn("inter_milli", floor(
            (lit(1000L) * $"ry" - $"slope_milli" * $"rx").cast("double")
              / $"n_train".cast("double") + lit(0.5)).cast("long"))
          .withColumn("ybar", floor(
            $"sy".cast("double") / $"n_test".cast("double") + lit(0.5))
            .cast("long"))
        val evald = rows.join(params, "fold")
          .withColumn("pred", floor(
            ($"inter_milli" + $"slope_milli" * $"x").cast("double")
              / 1000.0 + lit(0.5)).cast("long"))
          .withColumn("e", $"y" - $"pred")
          .withColumn("dd", $"y" - $"ybar")
          .groupBy($"fold")
          .agg(max($"n_train").as("n_train"), max($"n_test").as("n_test"),
            max($"slope_milli").as("slope_milli"),
            max($"inter_milli").as("inter_milli"),
            sum(($"e" * $"e").cast("decimal(38,0)")).as("sse"),
            sum(($"dd" * $"dd").cast("decimal(38,0)")).as("sst"))
        evald.select($"fold".cast("long").as("fold"), $"n_train", $"n_test",
            $"slope_milli", $"inter_milli",
            floor((lit(1.0) - $"sse".cast("double") / $"sst".cast("double"))
              * 1e6 + lit(0.5)).cast("long").as("r2_micro"))
          .orderBy($"fold")
      },
      Some {
        val h = graft.operators.Sampling.hashBitsSql(
          "(l_orderkey * 10 + l_linenumber)", 304L)
        s"""WITH rws AS MATERIALIZED (
           |  SELECT ($h) % 5 AS fold,
           |    CAST(floor(l_quantity * 100 + 0.5) AS BIGINT) AS x,
           |    CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS y
           |  FROM lineitem),
           |per AS (
           |  SELECT fold, CAST(count(*) AS BIGINT) AS n,
           |    CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
           |    CAST(SUM(x * x) AS BIGINT) AS sxx,
           |    CAST(SUM(x * y) AS BIGINT) AS sxy
           |  FROM rws GROUP BY 1),
           |tot AS (
           |  SELECT CAST(count(*) AS BIGINT) AS tn,
           |    CAST(SUM(x) AS BIGINT) AS tsx, CAST(SUM(y) AS BIGINT) AS tsy,
           |    CAST(SUM(x * x) AS BIGINT) AS tsxx,
           |    CAST(SUM(x * y) AS BIGINT) AS tsxy
           |  FROM rws),
           |params AS (
           |  SELECT fold, n AS n_test, sy, tn - n AS n_train,
           |    tsx - sx AS rx, tsy - sy AS ry,
           |    tsxx - sxx AS rxx, tsxy - sxy AS rxy
           |  FROM per CROSS JOIN tot),
           |p2 AS (
           |  SELECT fold, n_test, sy, n_train, rx, ry, rxx, rxy,
           |    CAST(floor(
           |      (CAST(n_train AS DOUBLE) * CAST(rxy AS DOUBLE)
           |        - CAST(rx AS DOUBLE) * CAST(ry AS DOUBLE))
           |      / (CAST(n_train AS DOUBLE) * CAST(rxx AS DOUBLE)
           |        - CAST(rx AS DOUBLE) * CAST(rx AS DOUBLE))
           |      * 1000 + 0.5) AS BIGINT) AS slope_milli
           |  FROM params),
           |p3 AS (
           |  SELECT *,
           |    CAST(floor(CAST(1000 * ry - slope_milli * rx AS DOUBLE)
           |      / CAST(n_train AS DOUBLE) + 0.5) AS BIGINT) AS inter_milli,
           |    CAST(floor(CAST(sy AS DOUBLE) / CAST(n_test AS DOUBLE) + 0.5)
           |      AS BIGINT) AS ybar
           |  FROM p2),
           |ev AS (
           |  SELECT r.fold, MAX(p.n_train) AS n_train,
           |    MAX(p.n_test) AS n_test,
           |    MAX(p.slope_milli) AS slope_milli,
           |    MAX(p.inter_milli) AS inter_milli,
           |    SUM(CAST(e * e AS HUGEINT)) AS sse,
           |    SUM(CAST(dd * dd AS HUGEINT)) AS sst
           |  FROM (
           |    SELECT r.fold,
           |      r.y - CAST(floor(
           |        CAST(p.inter_milli + p.slope_milli * r.x AS DOUBLE)
           |          / 1000.0 + 0.5) AS BIGINT) AS e,
           |      r.y - p.ybar AS dd, r.y
           |    FROM rws r JOIN p3 p USING (fold)) r
           |  JOIN p3 p USING (fold)
           |  GROUP BY r.fold)
           |SELECT fold, n_train, n_test, slope_milli, inter_milli,
           |  CAST(floor((1.0 - CAST(sse AS DOUBLE) / CAST(sst AS DOUBLE))
           |    * 1e6 + 0.5) AS BIGINT) AS r2_micro
           |FROM ev ORDER BY fold""".stripMargin
      }))

  private val QrRounds = 4

  /** The q293 oracle: [[QrRounds]] unrolled pinball-GD rounds — per
    * round one grad CTE at the previous weights and one update CTE,
    * with the identical fdiv (floor of a double quotient) steps. */
  private def qrOracle: String = {
    def round(t: Int): String =
      s"""g$t AS MATERIALIZED (
         |  SELECT CAST(SUM(u) AS BIGINT) AS g0,
         |    CAST(SUM(u * x) AS BIGINT) AS g1,
         |    CAST(SUM(loss) AS BIGINT) AS lx,
         |    CAST(COUNT(*) AS BIGINT) AS n
         |  FROM (
         |    SELECT x,
         |      CASE WHEN r > 0 THEN -9 WHEN r < 0 THEN 1 ELSE 0 END AS u,
         |      CASE WHEN r > 0 THEN 9 * r ELSE -r END AS loss
         |    FROM (
         |      SELECT s.x, s.y - (w.w0 +
         |          CAST(floor(CAST(s.x * w.w1 AS DOUBLE) / 1000)
         |            AS BIGINT)) AS r
         |      FROM qst s CROSS JOIN qw${t - 1} w))),
         |qw$t AS (
         |  SELECT w.w0 - CAST(floor(CAST(g.g0 * 500 AS DOUBLE) / g.n)
         |      AS BIGINT) AS w0,
         |    w.w1 - CAST(floor(CAST(g.g1 * 20 AS DOUBLE) / g.n)
         |      AS BIGINT) AS w1
         |  FROM qw${t - 1} w CROSS JOIN g$t g)""".stripMargin
    val finals = (1 to QrRounds).map(t =>
      s"""SELECT CAST($t AS BIGINT) AS round, w.w0, w.w1,
         |  g.lx AS loss_x10
         |FROM qw$t w CROSS JOIN g$t g""".stripMargin)
      .mkString("\nUNION ALL\n")
    s"""WITH qst AS MATERIALIZED (
       |  SELECT CAST(floor(l_quantity * 100 + 0.5) AS BIGINT) AS x,
       |    CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS y
       |  FROM lineitem),
       |qw0 AS (SELECT CAST(0 AS BIGINT) AS w0, CAST(0 AS BIGINT) AS w1),
       |${(1 to QrRounds).map(round).mkString(",\n")}
       |SELECT * FROM (
       |$finals)
       |ORDER BY round""".stripMargin
  }

  private val GbmRounds = 4

  /** The q274 oracle: [[GbmRounds]] unrolled L2-boosting rounds —
    * decile threshold grid, per-candidate residual sums, snapped-gain
    * argmax (ORDER BY gain DESC, dim, thr ≡ the Scala minBy
    * tie-break), fdiv leaf means, exact residual update, HUGEINT SSE.
    */
  private def gbmOracle: String = {
    def f(a: String, b: String) = QueryFixtures.fdivSql(a, b)
    val pcts = (1 to 9).map(i => (i / 10.0).toString).mkString("[", ",", "]")
    def xOf(alias: String, dimRef: String) =
      s"(CASE $dimRef WHEN 0 THEN $alias.x0 WHEN 1 THEN $alias.x1 ELSE $alias.x2 END)"
    val header =
      s"""WITH st0 AS MATERIALIZED (
         |  SELECT CAST(floor(l_quantity * 100 + 0.5) AS BIGINT) AS x0,
         |    CAST(floor(l_discount * 100 + 0.5) AS BIGINT) AS x1,
         |    CAST(floor(l_tax * 100 + 0.5) AS BIGINT) AS x2,
         |    CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS r
         |  FROM lineitem),
         |grid AS MATERIALIZED (
         |  SELECT DISTINCT dim, thr FROM (
         |    SELECT 0 AS dim, CAST(floor(q) AS BIGINT) AS thr
         |    FROM (SELECT unnest(quantile_cont(x0, $pcts)) AS q FROM st0)
         |    UNION ALL
         |    SELECT 1, CAST(floor(q) AS BIGINT)
         |    FROM (SELECT unnest(quantile_cont(x1, $pcts)) AS q FROM st0)
         |    UNION ALL
         |    SELECT 2, CAST(floor(q) AS BIGINT)
         |    FROM (SELECT unnest(quantile_cont(x2, $pcts)) AS q FROM st0)))""".stripMargin
    val rounds = (1 to GbmRounds).map { k =>
      val p = k - 1
      s"""tot$k AS (
         |  SELECT CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(r) AS BIGINT) AS s
         |  FROM st$p),
         |cand$k AS (
         |  SELECT g.dim, g.thr,
         |    CAST(SUM(CASE WHEN ${xOf("s", "g.dim")} <= g.thr
         |      THEN 1 ELSE 0 END) AS BIGINT) AS nl,
         |    CAST(SUM(CASE WHEN ${xOf("s", "g.dim")} <= g.thr
         |      THEN s.r ELSE 0 END) AS BIGINT) AS sl
         |  FROM st$p s CROSS JOIN grid g GROUP BY 1, 2),
         |best$k AS MATERIALIZED (
         |  SELECT $k::BIGINT AS round, CAST(dim AS BIGINT) AS dim, thr,
         |    nl AS n_l,
         |    ${f(f("sl", "nl"), "2")} AS gamma_l,
         |    ${f(f("t.s - sl", "t.n - nl"), "2")} AS gamma_r,
         |    CAST(floor((CAST(sl AS DOUBLE) * sl / nl
         |      + CAST(t.s - sl AS DOUBLE) * (t.s - sl) / (t.n - nl))
         |      / 1000000.0 + 0.5) AS BIGINT) AS gain_cq
         |  FROM cand$k c CROSS JOIN tot$k t
         |  WHERE nl > 0 AND t.n - nl > 0
         |  ORDER BY gain_cq DESC, dim, thr LIMIT 1),
         |st$k AS MATERIALIZED (
         |  SELECT s.x0, s.x1, s.x2,
         |    s.r - CASE WHEN ${xOf("s", "b.dim")} <= b.thr
         |      THEN b.gamma_l ELSE b.gamma_r END AS r
         |  FROM st$p s CROSS JOIN best$k b),
         |sse$k AS (
         |  SELECT CAST(SUM(CAST(r AS HUGEINT) * r) // 1000000 AS BIGINT)
         |    AS sse_cq
         |  FROM st$k)""".stripMargin
    }
    val arms = (1 to GbmRounds).map(k =>
      s"""SELECT b.round, b.dim, b.thr, b.n_l, b.gamma_l, b.gamma_r,
         |  b.gain_cq, e.sse_cq
         |FROM best$k b CROSS JOIN sse$k e""".stripMargin)
    (Seq(header) ++ rounds).mkString(",\n") +
      s"\nSELECT * FROM (\n${arms.mkString("\nUNION ALL\n")})\nORDER BY round"
  }

  private val AdaRounds = 3

  /** The q175 oracle: [[AdaRounds]] unrolled boosting rounds. */
  private def adaboostOracle: String = {
    val ws = graft.operators.AdaBoost.WScale
    val header =
      s"""WITH quant AS MATERIALIZED (
         |  SELECT vec_id, CASE WHEN label = 0 THEN 1 ELSE -1 END AS y, pos,
         |    CAST(floor(CAST(v AS DOUBLE) * 1024) AS BIGINT) AS xq
         |  FROM (SELECT vec_id, label, unnest(embedding) AS v,
         |    unnest(list_transform(range(0, len(embedding)), x -> x)) AS pos
         |    FROM embeddings)),
         |th AS (SELECT CAST(-448 + 64 * k AS BIGINT) AS t FROM range(0, 15) r(k)),
         |nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM embeddings),
         |w0 AS (SELECT vec_id, CAST($ws AS BIGINT) AS w FROM embeddings)""".stripMargin
    val rounds = (0 until AdaRounds).map { r =>
      s"""wt$r AS (SELECT CAST(SUM(w) AS BIGINT) AS wt FROM w$r),
         |er$r AS (
         |  SELECT q.pos, th.t,
         |    CAST(SUM(CASE WHEN (CASE WHEN q.xq <= th.t THEN 1 ELSE -1 END) <> q.y
         |      THEN w.w ELSE 0 END) AS BIGINT) AS errp
         |  FROM quant q JOIN w$r w USING (vec_id) CROSS JOIN th
         |  GROUP BY 1, 2),
         |best$r AS (
         |  SELECT pos, t, p, err, wt FROM (
         |    SELECT pos, t, 0 AS p, errp AS err, wt.wt FROM er$r, wt$r wt
         |    UNION ALL
         |    SELECT pos, t, 1 AS p, wt.wt - errp AS err, wt.wt
         |    FROM er$r, wt$r wt)
         |  ORDER BY err, pos, t, p LIMIT 1),
         |al$r AS (
         |  SELECT CAST(floor(ln(CAST(wt - err AS DOUBLE) / CAST(err AS DOUBLE))
         |    * 5000 + 0.5) AS BIGINT) AS a
         |  FROM best$r),
         |w${r + 1} AS MATERIALIZED (
         |  SELECT w.vec_id,
         |    CASE WHEN (CASE WHEN q.xq <= b.t THEN 1 ELSE -1 END)
         |              * (CASE WHEN b.p = 0 THEN 1 ELSE -1 END) <> q.y
         |      THEN (w.w * $ws * n.n) // (2 * b.err)
         |      ELSE (w.w * $ws * n.n) // (2 * (b.wt - b.err)) END AS w
         |  FROM w$r w
         |  JOIN best$r b ON TRUE
         |  JOIN quant q ON q.vec_id = w.vec_id AND q.pos = b.pos
         |  CROSS JOIN nn n)""".stripMargin
    }
    val marginTerms = (0 until AdaRounds).map { r =>
      s"""(CASE WHEN q$r.xq <= b$r.t THEN 1 ELSE -1 END)
         |     * (CASE WHEN b$r.p = 0 THEN 1 ELSE -1 END) * a$r.a""".stripMargin
    }.mkString("\n    + ")
    val roundJoins = (0 until AdaRounds).map { r =>
      s"""JOIN best$r b$r ON TRUE
         |JOIN quant q$r ON q$r.vec_id = lb.vec_id AND q$r.pos = b$r.pos
         |CROSS JOIN al$r a$r""".stripMargin
    }.mkString("\n")
    val tail =
      s"""mar AS (
         |  SELECT lb.vec_id, lb.y,
         |    CAST($marginTerms AS BIGINT) AS margin
         |  FROM (SELECT vec_id,
         |          CAST(CASE WHEN label = 0 THEN 1 ELSE -1 END AS BIGINT) AS y
         |        FROM embeddings) lb
         |$roundJoins)
         |SELECT vec_id, y, margin,
         |  CAST(CASE WHEN margin > 0 THEN 1 ELSE -1 END AS BIGINT) AS pred
         |FROM mar ORDER BY vec_id""".stripMargin
    (Seq(header) ++ rounds ++ Seq(tail)).mkString(",\n")
  }
}
