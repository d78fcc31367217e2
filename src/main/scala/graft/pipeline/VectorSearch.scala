package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Vector similarity scoring + top-k retrieval — the engine-side form
  * of the reference's hosted vector-search index + query (SURVEY
  * §2.11 U10/U11;
  * `ocr-tesseract-unstructured.py:145-153` index build,
  * `:167-171` `similarity_search(..., num_results=5)`).
  *
  * The index is just a table (id, embedding) — the reference's
  * delta-sync index materialized as first-class data. Query = score
  * + top-k, planned by Catalyst as TakeOrderedAndProject over a scan:
  * no global sort, partial top-k per partition, k rows to the driver.
  *
  * Scale path (100 TB): brute force is a full scan per query —
  * correct baseline, O(N). `graft.operators.AnnSearch` adds the
  * LSH-bucketed variant that prunes the scan to candidate buckets.
  */
object VectorSearch {

  /** Cosine similarity of two `array<float|double>` columns, computed
    * entirely in Catalyst expressions (`zip_with` + `aggregate` —
    * no UDF, stays codegen-friendly). Accumulates left-to-right in
    * double, matching DuckDB's `list_cosine_similarity` on DOUBLE[]
    * for oracle parity.
    */
  def cosineSim(a: Column, b: Column): Column = {
    val ad = transform(a, x => x.cast("double"))
    val bd = transform(b, x => x.cast("double"))
    val dot = aggregate(zip_with(ad, bd, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)
    val na = aggregate(transform(ad, x => x * x), lit(0.0), (acc, x) => acc + x)
    val nb = aggregate(transform(bd, x => x * x), lit(0.0), (acc, x) => acc + x)
    dot / (sqrt(na) * sqrt(nb))
  }

  /** Array literal column for a query vector. */
  def vecLit(v: Seq[Double]): Column = array(v.map(lit): _*)

  /** Brute-force top-k by cosine against a constant query vector.
    * Deterministic: ties broken by `idCol`.
    */
  def topK(
      index: DataFrame,
      embeddingCol: String,
      idCol: String,
      query: Seq[Double],
      k: Int): DataFrame = {
    index
      .withColumn("sim", cosineSim(col(embeddingCol), vecLit(query)))
      .orderBy(col("sim").desc, col(idCol))
      .limit(k)
  }

  /** The reference's `similarity_search(query_text, …, num_results)`:
    * embed the query text with the same embedder that built the
    * index, then score+top-k. One driver-side embed call (a single
    * text), then a fully distributed scan.
    */
  def searchText(
      index: DataFrame,
      embeddingCol: String,
      idCol: String,
      queryText: String,
      embedder: Embedder,
      k: Int): DataFrame = {
    val qv = embedder.embed(Seq(queryText)).head.map(_.toDouble).toSeq
    topK(index, embeddingCol, idCol, qv, k)
  }
}
