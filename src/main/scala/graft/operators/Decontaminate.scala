package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Benchmark decontamination for training corpora: flag training
  * documents that share any word n-gram with an evaluation set (the
  * GPT-3 appendix-C / open-data "13-gram overlap" recipe; n is a
  * parameter because the right value is corpus-dependent). A training
  * document that reproduces an eval passage leaks the benchmark into
  * the weights — curation drops or audits every flagged doc.
  *
  * Scale shape (100 TB):
  *  - eval sets are benchmark-sized (thousands of docs), so the
  *    distinct eval-gram table is tiny next to the corpus —
  *    BROADCAST it; the contamination check is then a single narrow
  *    scan of the training corpus (explode grams → broadcast hash
  *    semi-join), no shuffle of training data at all;
  *  - per-doc `array_distinct` before the explode bounds the gram
  *    stream by document length and makes the joined row count the
  *    distinct-shared-gram count with no second distinct;
  *  - at petabyte scale, hash grams to 64 bits on both sides before
  *    the join (8-byte keys; a collision flags one extra doc, the
  *    audit-side review catches it) — kept as strings here so the
  *    DuckDB oracle mirrors exactly.
  */
object Decontaminate {

  /** Distinct n-grams of the evaluation corpus — the blocklist. */
  def evalGrams(eval: DataFrame, textCol: String, n: Int): DataFrame =
    eval.select(explode(array_distinct(Boilerplate.ngrams(col(textCol), n))).as("gram"))
      .distinct()

  /** Per-training-document contamination: (idCol, n_shared) for every
    * doc sharing ≥1 distinct n-gram with the eval set; clean docs are
    * absent (semi-join semantics — callers left-join back for a flag
    * column).
    */
  def overlap(
      train: DataFrame,
      eval: DataFrame,
      idCol: String,
      textCol: String,
      n: Int): DataFrame = {
    val block = broadcast(evalGrams(eval, textCol, n))
    graft.Par.spread(train.select(col(idCol), col(textCol)))
      .select(col(idCol),
        explode(array_distinct(Boilerplate.ngrams(col(textCol), n))).as("gram"))
      .join(block, Seq("gram"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_shared"))
  }
}
