package graft.queries

import graft.{QueryDef, Tables}
import graft.operators.{Retrieval, Sampling}
import org.apache.spark.sql.functions._

/** Retrieval training-data queries (SURVEY §2.12): hard-negative
  * mining for contrastive retriever training and MMR result
  * diversification — both on the engine's quantized-integer L2
  * convention, so every ranking, score, and the greedy MMR recurrence
  * itself (unrolled per-step CTEs) hash-match the DuckDB replay.
  */
object RetrievalQueries {

  private val NegSalt = 132L
  private val NegRate = 0.02  // ≈10 probe queries at 500 rows
  private val NegK = 5
  private val MmrQueryId = 7L
  private val PoolSize = 20
  private val MmrK = 5
  private val Quantum = "1048576.0" // 2^20 = KMeans.DistQuantum

  /** Component rows (vec_id, pos, v) — the shared unnest. */
  private val dimsCte: String =
    s"""dims AS MATERIALIZED (
       |  SELECT vec_id, unnest(embedding) AS v,
       |    unnest(list_transform(range(0, len(embedding)), p -> p)) AS pos
       |  FROM embeddings)""".stripMargin

  /** Σ floor((a−b)²·2^20) between two component aliases. */
  private def qDist(a: String, b: String): String =
    s"""SUM(CAST(floor((CAST($a.v AS DOUBLE) - CAST($b.v AS DOUBLE))
       | * (CAST($a.v AS DOUBLE) - CAST($b.v AS DOUBLE)) * $Quantum) AS BIGINT))""".stripMargin

  def defs: Seq[QueryDef] = Seq(

    // ----- q132: hard-negative mining — for each hash-sampled probe,
    // the 5 nearest corpus vectors with a DIFFERENT label (quantized-
    // exact L2, ties by id): the negatives that most confuse a
    // retriever, ready for contrastive training.
    QueryDef(
      "q132_hard_negatives",
      (s, d) => {
        Retrieval.hardNegatives(Tables.embeddings(s, d),
            "vec_id", "embedding", "label", NegRate, NegSalt, NegK)
          .orderBy(col("query_id"), col("rank"))
      },
      Some {
        val frac = Sampling.hashFractionSql("vec_id", NegSalt)
        s"""WITH $dimsCte,
           |probes AS MATERIALIZED (
           |  SELECT vec_id AS qid, label AS qlabel FROM embeddings
           |  WHERE $frac < $NegRate),
           |dists AS MATERIALIZED (
           |  SELECT p.qid, d.vec_id, ${qDist("d", "q")} AS dist
           |  FROM probes p
           |  JOIN dims q ON q.vec_id = p.qid
           |  JOIN dims d ON d.pos = q.pos
           |  JOIN embeddings e ON e.vec_id = d.vec_id AND e.label <> p.qlabel
           |  GROUP BY p.qid, d.vec_id),
           |ranked AS MATERIALIZED (
           |  SELECT qid AS query_id, vec_id AS neg_id, CAST(dist AS BIGINT) AS dist,
           |    row_number() OVER (PARTITION BY qid ORDER BY dist, vec_id) AS rank
           |  FROM dists)
           |SELECT query_id, neg_id, CAST(rank AS INT) AS rank, dist
           |FROM ranked WHERE rank <= $NegK
           |ORDER BY query_id, rank""".stripMargin
      }),

    // ----- q133: MMR diversified top-k — greedy maximal-marginal-
    // relevance (λ=1/2) over the top-20 pool nearest vec_id 7: seed =
    // nearest, each later pick maximizes min-distance-to-selected
    // minus distance-to-query. The oracle unrolls all five greedy
    // steps as CTEs and hash-matches picks, ranks, and scores.
    QueryDef(
      "q133_mmr_diversify",
      (s, d) => {
        import s.implicits._
        val embs = Tables.embeddings(s, d)
        val query = embs.filter($"vec_id" === MmrQueryId)
          .select($"embedding").as[Array[Float]].first()
        Retrieval.mmrSelect(embs, "vec_id", "embedding", query,
          PoolSize, MmrK, excludeId = Some(MmrQueryId))
      },
      Some {
        val steps = (2 to MmrK).map { t =>
          s"""cand$t AS MATERIALIZED (
             |  SELECT p.vec_id, min(dd.dist) - p.dq AS score
             |  FROM pool p
             |  JOIN dd ON dd.ida = p.vec_id
             |  JOIN sel${t - 1} s ON dd.idb = s.vec_id
             |  WHERE p.vec_id NOT IN (SELECT vec_id FROM sel${t - 1})
             |  GROUP BY p.vec_id, p.dq),
             |pick$t AS MATERIALIZED (
             |  SELECT vec_id, $t AS rank, score FROM cand$t
             |  ORDER BY score DESC, vec_id LIMIT 1),
             |sel$t AS MATERIALIZED (
             |  SELECT vec_id FROM sel${t - 1} UNION ALL SELECT vec_id FROM pick$t)""".stripMargin
        }.mkString(",\n")
        val picks = (2 to MmrK).map(t => s"SELECT vec_id, rank, score FROM pick$t")
          .mkString(" UNION ALL ")
        s"""WITH $dimsCte,
           |qv AS MATERIALIZED (SELECT pos, v FROM dims WHERE vec_id = $MmrQueryId),
           |dq AS MATERIALIZED (
           |  SELECT d.vec_id, CAST(${qDist("d", "q")} AS BIGINT) AS dist
           |  FROM dims d JOIN qv q ON d.pos = q.pos
           |  WHERE d.vec_id <> $MmrQueryId
           |  GROUP BY d.vec_id),
           |pool AS MATERIALIZED (
           |  SELECT vec_id, dist AS dq FROM dq ORDER BY dist, vec_id LIMIT $PoolSize),
           |dd AS MATERIALIZED (
           |  SELECT a.vec_id AS ida, b.vec_id AS idb,
           |    CAST(${qDist("da", "db")} AS BIGINT) AS dist
           |  FROM pool a JOIN pool b ON a.vec_id <> b.vec_id
           |  JOIN dims da ON da.vec_id = a.vec_id
           |  JOIN dims db ON db.vec_id = b.vec_id AND db.pos = da.pos
           |  GROUP BY a.vec_id, b.vec_id),
           |sel1 AS MATERIALIZED (
           |  SELECT vec_id, 1 AS rank, -dq AS score FROM pool
           |  ORDER BY dq, vec_id LIMIT 1),
           |$steps
           |SELECT CAST(rank AS INT) AS rank, vec_id, CAST(score AS BIGINT) AS mmr_score
           |FROM (SELECT vec_id, rank, score FROM sel1 UNION ALL $picks)
           |ORDER BY rank""".stripMargin
      }),

    // ----- q201: NDCG@10 retrieval eval — the GRADED ranking metric
    // next to q131's recall@10/MRR: per hash-sampled probe, the exact
    // quantized-L2 ranking scored against same-label relevance. The
    // log₂ rank discounts are micro-quantized CONSTANTS computed once
    // in Scala and inlined into BOTH engines (the libm-snap
    // discipline) — DCG/IDCG are integer sums, NDCG an integer ppm
    // division, so the metric itself hash-matches.
    {
      val NdcgSalt = 201L
      val NdcgRate = 0.02
      val NdcgK = 10
      QueryDef(
        "q201_ndcg_eval",
        (s, d) => Retrieval.ndcgAtK(Tables.embeddings(s, d),
          "vec_id", "embedding", "label", NdcgRate, NdcgSalt, NdcgK),
        Some {
          val frac = Sampling.hashFractionSql("vec_id", NdcgSalt)
          val disc = Retrieval.dcgDiscountsMicro(NdcgK)
          val pre = disc.scanLeft(0L)(_ + _)
          val discVals = disc.zipWithIndex
            .map { case (v, i) => s"(${i + 1}, ${v}::BIGINT)" }.mkString(", ")
          val preVals = pre.zipWithIndex
            .map { case (v, j) => s"($j, ${v}::BIGINT)" }.mkString(", ")
          s"""WITH $dimsCte,
             |probes AS MATERIALIZED (
             |  SELECT vec_id AS qid, label AS qlabel FROM embeddings
             |  WHERE $frac < $NdcgRate),
             |dists AS MATERIALIZED (
             |  SELECT p.qid, d.vec_id, CAST(${qDist("d", "q")} AS BIGINT) AS dist
             |  FROM probes p
             |  JOIN dims q ON q.vec_id = p.qid
             |  JOIN dims d ON d.pos = q.pos AND d.vec_id <> p.qid
             |  GROUP BY p.qid, d.vec_id),
             |top AS MATERIALIZED (
             |  SELECT qid, vec_id, rnk FROM (
             |    SELECT qid, vec_id,
             |      row_number() OVER (PARTITION BY qid ORDER BY dist, vec_id) AS rnk
             |    FROM dists) t
             |  WHERE rnk <= $NdcgK),
             |disc(rnk, dmicro) AS (VALUES $discVals),
             |pre(j, v) AS (VALUES $preVals),
             |dcg AS (
             |  SELECT t.qid,
             |    CAST(SUM(CASE WHEN e.label = p.qlabel THEN x.dmicro ELSE 0 END)
             |      AS BIGINT) AS dcg_micro
             |  FROM top t
             |  JOIN disc x ON x.rnk = t.rnk
             |  JOIN embeddings e ON e.vec_id = t.vec_id
             |  JOIN probes p ON p.qid = t.qid
             |  GROUP BY 1),
             |nrel AS (
             |  SELECT p.qid, CAST(count(*) AS BIGINT) AS n_rel
             |  FROM probes p
             |  JOIN embeddings e ON e.label = p.qlabel AND e.vec_id <> p.qid
             |  GROUP BY 1)
             |SELECT g.qid AS query_id,
             |  COALESCE(n.n_rel, 0) AS n_rel,
             |  g.dcg_micro,
             |  pr.v AS idcg_micro,
             |  CASE WHEN pr.v = 0 THEN 0
             |       ELSE g.dcg_micro * 1000000 // pr.v END AS ndcg_ppm
             |FROM dcg g
             |LEFT JOIN nrel n ON n.qid = g.qid
             |JOIN pre pr ON pr.j = LEAST(COALESCE(n.n_rel, 0), $NdcgK)
             |ORDER BY query_id""".stripMargin
        })
    },

    // ----- q313: average precision @ 10 — the area-under-precision
    // retrieval metric completing the eval trio (q131 recall/MRR,
    // q201 graded NDCG): AP = Σ_{rel hit at rank i} P@i, normalized
    // by min(n_rel, 10). Unlike NDCG's inlined libm discounts, AP is
    // PURE integer arithmetic end to end — each precision term an
    // exact ppm integer division at a positive rank (DuckDB // ≡
    // Spark DIV on positives), the running relevant-count a
    // query-PARTITIONED window — so the metric hash-matches with
    // zero tolerance and no precomputed constants.
    {
      val ApSalt = 313L
      val ApRate = 0.02
      val ApK = 10
      QueryDef(
        "q313_average_precision",
        (s, d) => Retrieval.averagePrecisionAtK(Tables.embeddings(s, d),
          "vec_id", "embedding", "label", ApRate, ApSalt, ApK),
        Some {
          val frac = Sampling.hashFractionSql("vec_id", ApSalt)
          s"""WITH $dimsCte,
             |probes AS MATERIALIZED (
             |  SELECT vec_id AS qid, label AS qlabel FROM embeddings
             |  WHERE $frac < $ApRate),
             |dists AS MATERIALIZED (
             |  SELECT p.qid, d.vec_id, CAST(${qDist("d", "q")} AS BIGINT) AS dist
             |  FROM probes p
             |  JOIN dims q ON q.vec_id = p.qid
             |  JOIN dims d ON d.pos = q.pos AND d.vec_id <> p.qid
             |  GROUP BY p.qid, d.vec_id),
             |top AS MATERIALIZED (
             |  SELECT qid, vec_id, rnk FROM (
             |    SELECT qid, vec_id,
             |      row_number() OVER (PARTITION BY qid ORDER BY dist, vec_id) AS rnk
             |    FROM dists) t
             |  WHERE rnk <= $ApK),
             |terms AS (
             |  SELECT t.qid, t.rnk,
             |    CASE WHEN e.label = p.qlabel THEN 1 ELSE 0 END AS rel
             |  FROM top t
             |  JOIN embeddings e ON e.vec_id = t.vec_id
             |  JOIN probes p ON p.qid = t.qid),
             |cumt AS (
             |  SELECT qid, rnk, rel,
             |    CAST(SUM(rel) OVER (PARTITION BY qid ORDER BY rnk
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             |      AS BIGINT) AS cnt
             |  FROM terms),
             |ap AS (
             |  SELECT qid,
             |    CAST(SUM(CASE WHEN rel = 1
             |      THEN cnt * 1000000 // rnk ELSE 0 END) AS BIGINT)
             |      AS sum_terms
             |  FROM cumt GROUP BY 1),
             |nrel AS (
             |  SELECT p.qid, CAST(count(*) AS BIGINT) AS n_rel
             |  FROM probes p
             |  JOIN embeddings e ON e.label = p.qlabel AND e.vec_id <> p.qid
             |  GROUP BY 1)
             |SELECT a.qid AS query_id,
             |  COALESCE(n.n_rel, 0) AS n_rel,
             |  CASE WHEN COALESCE(n.n_rel, 0) = 0 THEN 0
             |    ELSE a.sum_terms // LEAST(n.n_rel, $ApK) END AS ap_ppm
             |FROM ap a LEFT JOIN nrel n ON n.qid = a.qid
             |ORDER BY query_id""".stripMargin
        })
    },

    // ----- q328: k-NN classification eval — leave-one-out majority
    // vote of the 5 nearest neighbors' labels per hash-sampled
    // probe: the "is the embedding space label-separable" read the
    // retrieval metrics (q131/q201/q313) imply but never state.
    // Ranking is the exact quantized-L2 convention (ties by id);
    // the majority vote breaks count ties by label order — fully
    // deterministic, so the per-probe prediction table hash-matches.
    {
      val KnnSalt = 328L
      val KnnRate = 0.05
      val KnnK = 5
      QueryDef(
        "q328_knn_classifier",
        (s, d) => {
          import s.implicits._
          import org.apache.spark.sql.expressions.Window
          val embs = Tables.embeddings(s, d)
          val probes = embs
            .filter(Sampling.hashFraction($"vec_id", KnnSalt) < KnnRate)
            .select($"vec_id".as("query_id"), $"embedding".as("qvec"),
              $"label".as("qlabel"))
          val top = embs
            .join(broadcast(probes), $"vec_id" =!= $"query_id")
            .withColumn("dist", Retrieval.quantL2($"embedding", $"qvec"))
            .withColumn("rnk", row_number().over(
              Window.partitionBy($"query_id").orderBy($"dist", $"vec_id")))
            .filter($"rnk" <= KnnK)
          val votes = top.groupBy($"query_id", $"qlabel", $"label")
            .agg(count(lit(1)).as("n_votes"))
          val pred = votes.withColumn("vr", row_number().over(
              Window.partitionBy($"query_id")
                .orderBy($"n_votes".desc, $"label")))
            .filter($"vr" === 1)
          pred.select($"query_id", $"qlabel".as("true_label"),
              $"label".as("pred_label"), $"n_votes",
              ($"label" === $"qlabel").as("correct"))
            .orderBy($"query_id")
        },
        Some {
          val frac = Sampling.hashFractionSql("vec_id", KnnSalt)
          s"""WITH $dimsCte,
             |probes AS MATERIALIZED (
             |  SELECT vec_id AS qid, label AS qlabel FROM embeddings
             |  WHERE $frac < $KnnRate),
             |dists AS MATERIALIZED (
             |  SELECT p.qid, d.vec_id, CAST(${qDist("d", "q")} AS BIGINT) AS dist
             |  FROM probes p
             |  JOIN dims q ON q.vec_id = p.qid
             |  JOIN dims d ON d.pos = q.pos AND d.vec_id <> p.qid
             |  GROUP BY p.qid, d.vec_id),
             |top AS (
             |  SELECT qid, vec_id FROM (
             |    SELECT qid, vec_id,
             |      row_number() OVER (PARTITION BY qid ORDER BY dist, vec_id) AS rnk
             |    FROM dists) t
             |  WHERE rnk <= $KnnK),
             |votes AS (
             |  SELECT t.qid, p.qlabel, e.label,
             |    CAST(COUNT(*) AS BIGINT) AS n_votes
             |  FROM top t
             |  JOIN embeddings e ON e.vec_id = t.vec_id
             |  JOIN probes p ON p.qid = t.qid
             |  GROUP BY 1, 2, 3),
             |pred AS (
             |  SELECT qid, qlabel, label, n_votes FROM (
             |    SELECT qid, qlabel, label, n_votes,
             |      row_number() OVER (PARTITION BY qid
             |        ORDER BY n_votes DESC, label) AS vr
             |    FROM votes) v
             |  WHERE vr = 1)
             |SELECT qid AS query_id, qlabel AS true_label,
             |  label AS pred_label, n_votes,
             |  label = qlabel AS correct
             |FROM pred ORDER BY query_id""".stripMargin
        })
    },

    // ----- q336: intrinsic dimension of the embedding space by the
    // TwoNN estimator (Facco et al. 2017) — the GEOMETRY-QA member
    // next to q69's moment stats and q288's Mahalanobis outliers:
    // d̂ = n / Σ ln(r₂/r₁) over each probe's two nearest neighbors,
    // needing NO density model and only the 2-NN ranks. Distances
    // are the exact quantized-L2 convention (squared, so each ln
    // ratio is halved); one snapped ln per probe (probe-count
    // bounded → order-free integer sum); zero-distance duplicates
    // excluded identically on both sides.
    {
      val IdSalt = 336L
      val IdRate = 0.1
      QueryDef(
        "q336_intrinsic_dim",
        (s, d) => {
          import s.implicits._
          import org.apache.spark.sql.expressions.Window
          val embs = Tables.embeddings(s, d)
          val probes = embs
            .filter(Sampling.hashFraction($"vec_id", IdSalt) < IdRate)
            .select($"vec_id".as("qid"), $"embedding".as("qvec"))
          val two = embs
            .join(broadcast(probes), $"vec_id" =!= $"qid")
            .withColumn("dist", Retrieval.quantL2($"embedding", $"qvec"))
            .withColumn("rnk", row_number().over(
              Window.partitionBy($"qid").orderBy($"dist", $"vec_id")))
            .filter($"rnk" <= 2)
            .groupBy($"qid").agg(
              min(when($"rnk" === 1, $"dist")).as("d1"),
              min(when($"rnk" === 2, $"dist")).as("d2"))
            .filter($"d1" > 0L && $"d2".isNotNull)
          val terms = two.select(
            floor(log($"d2".cast("double") / $"d1".cast("double")) / lit(2.0)
              * 1000000 + lit(0.5)).cast("long").as("term"))
          terms.agg(count(lit(1)).as("n_probes"),
              sum($"term").as("sum_lnmu_micro"))
            .select($"n_probes", $"sum_lnmu_micro",
              when($"sum_lnmu_micro" <= 0L, lit(null).cast("long"))
                .otherwise(floor($"n_probes".cast("double") * lit(1000000.0)
                    / $"sum_lnmu_micro".cast("double") * 1000 + lit(0.5))
                  .cast("long")).as("id_milli"))
        },
        Some {
          val frac = Sampling.hashFractionSql("vec_id", IdSalt)
          s"""WITH $dimsCte,
             |probes AS MATERIALIZED (
             |  SELECT vec_id AS qid FROM embeddings WHERE $frac < $IdRate),
             |dists AS MATERIALIZED (
             |  SELECT p.qid, d.vec_id, CAST(${qDist("d", "q")} AS BIGINT) AS dist
             |  FROM probes p
             |  JOIN dims q ON q.vec_id = p.qid
             |  JOIN dims d ON d.pos = q.pos AND d.vec_id <> p.qid
             |  GROUP BY p.qid, d.vec_id),
             |two AS (
             |  SELECT qid,
             |    MIN(CASE WHEN rnk = 1 THEN dist END) AS d1,
             |    MIN(CASE WHEN rnk = 2 THEN dist END) AS d2
             |  FROM (
             |    SELECT qid, dist,
             |      row_number() OVER (PARTITION BY qid ORDER BY dist, vec_id)
             |        AS rnk
             |    FROM dists) t
             |  WHERE rnk <= 2 GROUP BY qid),
             |terms AS (
             |  SELECT CAST(floor(ln(CAST(d2 AS DOUBLE) / CAST(d1 AS DOUBLE))
             |    / 2.0 * 1000000 + 0.5) AS BIGINT) AS term
             |  FROM two WHERE d1 > 0 AND d2 IS NOT NULL),
             |agg AS (
             |  SELECT CAST(COUNT(*) AS BIGINT) AS n_probes,
             |    CAST(SUM(term) AS BIGINT) AS sum_lnmu_micro
             |  FROM terms)
             |SELECT n_probes, sum_lnmu_micro,
             |  CASE WHEN sum_lnmu_micro <= 0 THEN NULL
             |    ELSE CAST(floor(CAST(n_probes AS DOUBLE) * 1000000.0
             |      / CAST(sum_lnmu_micro AS DOUBLE) * 1000 + 0.5) AS BIGINT)
             |    END AS id_milli
             |FROM agg""".stripMargin
        })
    },

    // ----- q237: matryoshka truncation recall — how much retrieval
    // quality survives keeping only the FIRST 16 of 64 embedding dims
    // (the nested-representation deployment question: a 4× cheaper
    // index probes with the truncated prefix). Per hash-sampled probe:
    // exact quantized-L2 top-10 on full dims (ground truth) vs top-10
    // on the 16-dim prefix, recall@10 = |overlap|/10 — same integer
    // distance convention as q131/q132, both rankings re-derived in
    // the oracle. Scale shape: one component self-join keyed by pos,
    // BOTH distances from the same grouped pass (the truncated sum is
    // a pos<16 conditional, not a second scan), per-probe windows
    // partitioned by query.
    {
      val TruncDims = 16
      val K = 10
      val Salt = 237L
      val Rate = 0.02
      QueryDef(
        "q237_matryoshka_recall",
        (s, d) => {
          import s.implicits._
          import org.apache.spark.sql.expressions.Window
          val embs = Tables.embeddings(s, d)
          val dims = embs.select($"vec_id",
            posexplode($"embedding").as(Seq("pos", "v")))
          val probes = embs
            .filter(Sampling.hashFraction($"vec_id", Salt) < Rate)
            .select($"vec_id".as("qid"))
          val qdims = dims.join(probes, $"vec_id" === $"qid")
            .select($"qid", $"pos", $"v".as("qv"))
          val term = floor(($"d.v".cast("double") - $"qv".cast("double"))
            * ($"d.v".cast("double") - $"qv".cast("double"))
            * lit(1048576.0)).cast("long")
          val dists = dims.as("d").join(qdims.as("q"),
              $"d.pos" === $"q.pos" && $"d.vec_id" =!= $"q.qid")
            .groupBy($"qid", $"d.vec_id".as("vid"))
            .agg(sum(term).as("dist_full"),
              sum(when($"d.pos" < TruncDims, term).otherwise(0L))
                .as("dist_trunc"))
          val rf = Window.partitionBy($"qid").orderBy($"dist_full", $"vid")
          val rt = Window.partitionBy($"qid").orderBy($"dist_trunc", $"vid")
          dists
            .withColumn("rf", row_number().over(rf))
            .withColumn("rt", row_number().over(rt))
            .groupBy($"qid")
            .agg(sum(when($"rf" <= K && $"rt" <= K, 1L).otherwise(0L))
              .as("n_common"))
            .select($"qid".as("query_id"), $"n_common",
              ($"n_common" * lit(1000L / K)).as("recall_milli"))
            .orderBy($"query_id")
        },
        Some {
          val frac = Sampling.hashFractionSql("vec_id", Salt)
          val term = s"""CAST(floor((CAST(d.v AS DOUBLE) - CAST(q.v AS DOUBLE))
                        | * (CAST(d.v AS DOUBLE) - CAST(q.v AS DOUBLE))
                        | * $Quantum) AS BIGINT)""".stripMargin
          s"""WITH $dimsCte,
             |probes AS MATERIALIZED (
             |  SELECT vec_id AS qid FROM embeddings WHERE $frac < $Rate),
             |dists AS MATERIALIZED (
             |  SELECT p.qid, d.vec_id AS vid,
             |    CAST(SUM($term) AS BIGINT) AS dist_full,
             |    CAST(SUM(CASE WHEN d.pos < $TruncDims THEN $term
             |      ELSE 0 END) AS BIGINT) AS dist_trunc
             |  FROM probes p
             |  JOIN dims q ON q.vec_id = p.qid
             |  JOIN dims d ON d.pos = q.pos AND d.vec_id <> p.qid
             |  GROUP BY 1, 2),
             |ranked AS (
             |  SELECT qid, vid,
             |    row_number() OVER (PARTITION BY qid
             |      ORDER BY dist_full, vid) AS rf,
             |    row_number() OVER (PARTITION BY qid
             |      ORDER BY dist_trunc, vid) AS rt
             |  FROM dists)
             |SELECT qid AS query_id,
             |  CAST(SUM(CASE WHEN rf <= $K AND rt <= $K THEN 1 ELSE 0 END)
             |    AS BIGINT) AS n_common,
             |  CAST(SUM(CASE WHEN rf <= $K AND rt <= $K THEN 1 ELSE 0 END)
             |    * ${1000 / K} AS BIGINT) AS recall_milli
             |FROM ranked GROUP BY qid ORDER BY query_id""".stripMargin
        })
    })
}
