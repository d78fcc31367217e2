package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Graph statistics over an edge list — the analytics a near-dup
  * graph gets queried for once components exist: triangle count and
  * the global clustering coefficient ("are duplicates cliquey or
  * chained?" — cliques mean template families, chains mean drifting
  * near-copies, and the two need different curation responses).
  *
  * Triangles via the ORIENTED edge join (each undirected edge stored
  * once as a < b): a triangle {x<y<z} is counted exactly once as the
  * path x→y→z closed by x→z — no ×6 overcount, no post-dedup.
  * Scale shape: two equi-joins on node keys; candidate volume is
  * Σ_v d⁺(v)² over OUT-degrees, which the a<b orientation caps for
  * the common skew (one hub node) since a hub's edges spread across
  * its lower-id neighbors. The heavy-hitter refinement (orient by
  * degree, not id) drops in without changing the contract.
  */
object GraphOps {

  /** Undirected edges normalized to one row per edge, endpoints
    * ordered (a < b), self-loops dropped.
    */
  def orient(edges: DataFrame, srcCol: String, dstCol: String): DataFrame =
    edges.select(
        least(col(srcCol), col(dstCol)).as("a"),
        greatest(col(srcCol), col(dstCol)).as("b"))
      .filter(col("a") < col("b"))
      .distinct()

  /** One row: (n_nodes, n_edges, n_triangles, global_clustering).
    * Global clustering = 3·triangles / wedges, where wedges =
    * Σ deg·(deg−1)/2 over undirected degrees; 0 when the graph has no
    * wedge at all.
    */
  def triangleStats(edges: DataFrame, srcCol: String, dstCol: String): DataFrame = {
    // reused by the triangle join (×3) and the degree pass; storage
    // released by the caller's clearCache (the repo convention)
    val e = orient(edges, srcCol, dstCol).cache()
    val tri = e.as("e1")
      .join(e.as("e2"), col("e1.b") === col("e2.a"))
      .join(e.as("e3"),
        col("e1.a") === col("e3.a") && col("e2.b") === col("e3.b"))
      .select(count(lit(1)).as("n_triangles"))
    val deg = e.select(col("a").as("v")).unionAll(e.select(col("b").as("v")))
      .groupBy(col("v")).agg(count(lit(1)).as("d"))
    // coalesce: SUM over zero rows is NULL, and NULL n_wedges would
    // slip past the ===0 guard below into a NULL clustering — the
    // empty graph must report the documented 0.0
    val wedge = deg.select(
      count(lit(1)).as("n_nodes"),
      coalesce((sum(col("d") * (col("d") - 1)) / 2).cast("long"), lit(0L))
        .as("n_wedges"))
    val nEdges = e.select(count(lit(1)).as("n_edges"))
    val out = nEdges.crossJoin(wedge).crossJoin(tri)
      .select(
        col("n_nodes"), col("n_edges"), col("n_triangles"),
        graft.functions.TextFunctions.r4(
          when(col("n_wedges") === 0, lit(0.0))
            .otherwise(lit(3.0) * col("n_triangles") / col("n_wedges")))
          .as("global_clustering"))
    out
  }
}
