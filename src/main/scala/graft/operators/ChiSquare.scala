package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** χ² feature selection over (token presence × class) — the classic
  * supervised vocabulary ranking (Yang & Pedersen '97) a curation
  * stack runs before training a [[NaiveBayes]]/[[LogReg]] filter:
  * which words are evidence FOR a label, not just frequent.
  *
  * Reference seam: no supervised analytics exist in the reference
  * (SURVEY §2.12 extension), so the semantics follow the standard
  * 2×2 document-frequency contingency per (class c, word w):
  * A = docs in c containing w, with marginals nw (docs containing w),
  * nc (docs in c), N. χ² = N·(AD−BC)² / (nw·(N−nw)·nc·(N−nc)).
  *
  * Exactness: all contingency cells are exact BIGINT counts; the χ²
  * value is computed as ONE fixed left-associated chain of IEEE
  * double operations (each individually exactly rounded, so the
  * whole chain is engine-independent given the same order — the
  * oracle writes the identical expression), then snapped to r4 fixed
  * point. No libm calls at all.
  *
  * Degenerate columns (nw = 0 or nw = N — a word absent everywhere
  * or present everywhere) carry zero information and a zero
  * denominator; they are filtered, mirrored by the oracle.
  *
  * Scale shape: presence pairs shuffle once on (class, word) and
  * once on word for the marginals — all frames after the first
  * aggregation are vocabulary-sized, never corpus-sized. The final
  * top-k runs a window PARTITIONED by class over the vocabulary
  * frame. Marginal joins broadcast (|classes| and |vocab| rows).
  */
object ChiSquare {

  /** r4 fixed point for χ² scores. */
  val Scale = 10000L

  /** Top-`k` χ² words per class:
    * (c, w, a_docs, chi2_q, rnk), ordered by (c, rnk).
    */
  def topFeatures(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      labelCol: String,
      k: Int): DataFrame = {
    require(k >= 1, "k must be >= 1")
    val presence = docs
      .select(col(idCol), col(labelCol).as("c"),
        explode(array_distinct(
          filter(split(col(textCol), " "), w => length(w) > 0))).as("w"))

    val a = presence.groupBy(col("c"), col("w")).agg(count(lit(1)).as("a_docs"))
    val nw = a.groupBy(col("w")).agg(sum(col("a_docs")).as("nw"))
    val nc = docs.groupBy(col(labelCol).as("c")).agg(count(lit(1)).as("nc"))
    val nn = docs.agg(count(lit(1)).as("n"))

    // grid: every (class, word) cell — absent A counts are 0
    val grid = nc.crossJoin(nw)
      .join(a, Seq("c", "w"), "left")
      .na.fill(0L, Seq("a_docs"))
      .crossJoin(broadcast(nn))
      .filter(col("nw") > 0 && col("nw") < col("n"))

    // AD − BC with B = nw−A, C = nc−A, D = N−nc−B: exact longs
    val dd = (col("a_docs") * (col("n") - col("nc") - (col("nw") - col("a_docs")))
      - (col("nw") - col("a_docs")) * (col("nc") - col("a_docs"))).cast("double")
    // ONE left-associated double chain — textual mirror in the oracle
    val chi2 = col("n").cast("double") * dd * dd /
      col("nw").cast("double") / (col("n") - col("nw")).cast("double") /
      col("nc").cast("double") / (col("n") - col("nc")).cast("double")

    val scored = grid.select(col("c"), col("w"), col("a_docs"),
      floor(chi2 * Scale + lit(0.5)).cast("long").as("chi2_q"))
    val win = Window.partitionBy(col("c"))
      .orderBy(col("chi2_q").desc, col("w").asc)
    scored
      .withColumn("rnk", row_number().over(win).cast("long"))
      .filter(col("rnk") <= k)
      .orderBy(col("c"), col("rnk"))
  }
}
