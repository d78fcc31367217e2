package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Simplified (centroid-based) silhouette — the clustering-quality
  * read-out next to [[KMeans]] / [[Dbscan]] / [[Dedup.semDeDup]]:
  * for each point, a = squared distance to its OWN cluster centroid,
  * b = min squared distance to any OTHER centroid, silhouette
  * s = (b − a) / max(a, b) ∈ [−1, 1]. The centroid variant (Kaufman &
  * Rousseeuw's "simplified silhouette") costs O(n·d·k) instead of the
  * O(n²·d) pairwise classic — the only formulation that survives a
  * corpus-scale n — and is the standard elbow-companion for choosing
  * k.
  *
  * Exactness discipline (shared with [[KMeans]]): centroid component
  * sums quantized at [[KMeans.SumQuantum]] (exact order-free BIGINT
  * sums; one double division per component), per-dim distance terms
  * quantized at [[KMeans.DistQuantum]] and integer-summed, the final
  * ratio micro-snapped — every float op is a fixed IEEE chain both
  * engines replay, so the score itself hash-matches the oracle.
  *
  * Scale shape: centroids are a k·d frame (map-side-combined groupBy,
  * broadcastable); the term join fans each exploded (row, dim) by k —
  * inherent to the k-way comparison — then immediately re-keys to a
  * n·k distance frame. No pairwise join, no collect.
  */
object Silhouette {

  private val MicroSnap = 1000000L

  /** Per-point silhouette: (id, lbl, a2, b2, sil_micro). A single
    * cluster (b undefined) scores 0 by convention.
    */
  def perPoint(
      embs: DataFrame,
      idCol: String,
      vecCol: String,
      labelCol: String): DataFrame = {
    val Q = KMeans.SumQuantum
    val DQ = KMeans.DistQuantum
    val dims = embs
      .select(col(idCol).cast("long").as("id"),
        col(labelCol).cast("long").as("lbl"),
        posexplode(col(vecCol)))
      .select(col("id"), col("lbl"), col("pos"),
        col("col").cast("double").as("v"))
    val cent = dims.groupBy(col("lbl").as("clbl"), col("pos"))
      .agg(sum(floor(col("v") * Q).cast("long")).as("csum"),
        count(lit(1)).as("cnt"))
      .select(col("clbl"), col("pos"),
        ((col("csum").cast("double") / col("cnt")) / Q).as("comp"))
    val d2 = dims.join(broadcast(cent), "pos")
      .groupBy(col("id"), col("lbl"), col("clbl"))
      .agg(sum(floor((col("v") - col("comp")) * (col("v") - col("comp")) * DQ)
        .cast("long")).as("d2"))
    d2.groupBy(col("id"), col("lbl"))
      .agg(
        min(when(col("clbl") === col("lbl"), col("d2"))).as("a2"),
        min(when(col("clbl") =!= col("lbl"), col("d2"))).as("b2"))
      .select(col("id"), col("lbl"), col("a2"), col("b2"),
        when(col("b2").isNull, lit(0L))
          .when(greatest(col("a2"), col("b2")) === 0, lit(0L))
          .otherwise(floor((col("b2") - col("a2")).cast("double")
            / greatest(col("a2"), col("b2")).cast("double") * MicroSnap + lit(0.5))
            .cast("long"))
          .as("sil_micro"))
  }

  /** Per-cluster summary: (label, n, mean_sil_micro), ordered by
    * label — the "is cluster c coherent" dashboard row.
    */
  def byCluster(
      embs: DataFrame,
      idCol: String,
      vecCol: String,
      labelCol: String): DataFrame =
    perPoint(embs, idCol, vecCol, labelCol)
      .groupBy(col("lbl").as("label"))
      .agg(count(lit(1)).as("n"),
        floor(sum(col("sil_micro")).cast("double") / count(lit(1)) + lit(0.5))
          .cast("long").as("mean_sil_micro"))
      .orderBy(col("label"))
}
