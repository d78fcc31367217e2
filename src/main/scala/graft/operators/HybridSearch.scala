package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Hybrid retrieval — reciprocal-rank fusion (Cormack et al.,
  * SIGIR'09) of independently-ranked result lists, the standard way a
  * keyword (BM25) and a vector (cosine) retriever combine without
  * score calibration: rrf(d) = Σ_lists 1/(c + rank_list(d)), missing
  * membership contributes 0.
  *
  * Scale shape: each leg retrieves its own top-k (both already
  * bounded — BM25 via aggregate pruning, vector via
  * TakeOrderedAndProject), so fusion operates on k-sized inputs —
  * a union + groupBy over ≤ Σk rows regardless of corpus size. The
  * per-leg rank pass is over those k rows, never the corpus.
  */
object HybridSearch {

  /** Attach 1-based ranks to a leg's results: highest `scoreCol`
    * first, ties broken by id — input is a top-k list (k rows by
    * construction), ranked by GlobalOrder.zipRank so no
    * single-partition WindowExec appears anywhere in the fused plan
    * (rank is a long; rrf arithmetic is unchanged). NOTE: zipRank is
    * EAGER — calling this executes the leg's plan (k-bounded, cheap)
    * and pins the ranked rows as an RDD boundary; don't expect
    * downstream predicates to push below the rank.
    */
  def ranked(leg: DataFrame, idCol: String, scoreCol: String): DataFrame =
    GlobalOrder.zipRank(
        leg.select(col(idCol).as("id"), col(scoreCol).as("__s"))
          .sort(col("__s").desc, col("id")),
        "rank")
      .select(col("id"), col("rank"))

  /** Fuse ranked legs ((id, rank) each) into (id, rrf_score, n_legs),
    * top `k` by score (ties → id). `c` damps the head of each list
    * (60 is the published default).
    */
  def rrfFuse(legs: Seq[DataFrame], k: Int, c: Int = 60): DataFrame = {
    require(legs.nonEmpty)
    val r4 = graft.functions.TextFunctions.r4 _
    legs.map(_.select(col("id"), (lit(1.0) / (lit(c) + col("rank"))).as("part")))
      .reduce(_ unionByName _)
      .groupBy(col("id"))
      .agg(r4(sum(col("part"))).as("rrf_score"), count(lit(1)).as("n_legs"))
      .orderBy(col("rrf_score").desc, col("id"))
      .limit(k)
  }
}
