package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Deterministic DBSCAN over cosine neighborhoods — the
  * density-based clustering family next to [[KMeans]] (centroid) and
  * [[Dedup.connectedComponents]] (graph): embedding groups of
  * arbitrary shape plus an explicit noise bucket, the standard
  * corpus-exploration read-out before committing to a k.
  *
  * Semantics (DBSCAN with one deterministic refinement):
  *  - neighbors: cosine(a, b) > eps (strict, matching the q37 join);
  *  - core: |N(v)| + 1 ≥ minPts (self counts, the classical rule);
  *  - clusters: connected components of the core-core subgraph,
  *    labeled by component-min id ([[Dedup.connectedComponentsAuto]]);
  *  - border: non-core with ≥ 1 core neighbor, assigned the MIN rep
  *    among its core neighbors' clusters — classical DBSCAN leaves
  *    border ties scan-order-dependent; taking the min makes the
  *    assignment a pure function of the graph (layout-independent,
  *    and exactly what the SQL oracle computes);
  *  - noise: everything else, cluster −1.
  *
  * Scale shape: pair generation is the [[Dedup.cosineJoinGrid]]
  * 1-Bucket-Theta grid by default (exact output, Σn²/blk work — fine
  * to ~10⁶ vectors per block), or [[AnnSearch.bandJoin]] when `ann`
  * is set (the 100× path: banded LSH candidates, emit-once, exact
  * cosine verify — sub-quadratic, miss probability (1−p²)^bands per
  * qualifying pair, negligible at high eps; DbscanSpec pins grid ≡
  * band on the fixture). Everything after is degree counts, one
  * component run over the (sparser) core subgraph, and broadcastable
  * role joins — all shuffles keyed on vertex id, frames bounded by
  * |V| + |E|.
  */
object Dbscan {

  /** (id, role ∈ core|border|noise, cluster; −1 for noise), ordered
    * by id.
    *
    * @param ann when Some((lsh, bands)), neighbor pairs come from
    *   [[AnnSearch.bandJoin]] instead of the exact grid — same
    *   (id_a, id_b, cos > eps) contract, sub-quadratic candidate
    *   generation for corpus-scale runs.
    */
  def cluster(
      embs: DataFrame,
      idCol: String,
      vecCol: String,
      eps: Double,
      minPts: Int,
      ann: Option[(AnnSearch.LshScheme, Int)] = None): DataFrame = {
    require(minPts >= 1, "minPts must be >= 1")
    val rawPairs = ann match {
      case Some((lsh, bands)) =>
        AnnSearch.bandJoin(embs.sparkSession, embs, idCol, vecCol, lsh, bands, eps)
      case None => Dedup.cosineJoinGrid(embs, idCol, vecCol, eps)
    }
    val pairs = rawPairs
      .select(col("id_a"), col("id_b"))
      .transform(graft.operators.Iterate.truncate) // one materialization feeds degree, CC, border
    val ids = embs.select(col(idCol).cast("long").as("id"))
    val adj = pairs.select(col("id_a").as("id"), col("id_b").as("nb"))
      .union(pairs.select(col("id_b").as("id"), col("id_a").as("nb")))
    val deg = adj.groupBy(col("id")).agg(count(lit(1)).as("deg"))
    val roles = ids.join(deg, Seq("id"), "left")
      .select(col("id"), (coalesce(col("deg"), lit(0L)) + 1L >= minPts).as("is_core"))
    val coreIds = roles.filter(col("is_core")).select(col("id"))
    val corePairs = pairs
      .join(coreIds.select(col("id").as("id_a")), "id_a")
      .join(coreIds.select(col("id").as("id_b")), "id_b")
    val comp = Dedup.connectedComponentsAuto(coreIds, "id", corePairs)
    // border: min cluster rep over CORE neighbors
    val borderRep = adj
      .join(comp.select(col("id").as("nb"), col("rep").as("nrep")), "nb")
      .groupBy(col("id")).agg(min(col("nrep")).as("brep"))
    roles
      .join(comp, Seq("id"), "left")
      .join(borderRep, Seq("id"), "left")
      .select(col("id"),
        when(col("is_core"), "core")
          .when(col("brep").isNotNull, "border")
          .otherwise("noise").as("role"),
        when(col("is_core"), col("rep"))
          .when(col("brep").isNotNull, col("brep"))
          .otherwise(-1L).as("cluster"))
      .orderBy(col("id"))
  }
}
