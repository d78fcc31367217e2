package graft.operators

import graft.functions.TextFunctions
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Exact phrase search over a POSITIONAL postings list — the missing
  * member between the doc-level inverted index (q114: word → doc ids)
  * and BM25 bag-of-words ranking (q52): "which documents contain this
  * exact word sequence", the lookup a contamination audit or a quote
  * tracer needs word-adjacency for, where bag-of-words matching
  * over-matches.
  *
  * Algorithm (the classic positional-index phrase walk, recast as one
  * relational join): a phrase [w₀ … w_{k−1}] matches at position a in
  * a document iff term i occurs at position a+i for ALL i. Each
  * matched posting votes (doc, pos − i); a position where the votes
  * cover all k DISTINCT term indexes is a match — repeated words in
  * the phrase ("the cat the") work because votes are counted per
  * INDEX, not per word.
  *
  * Scale shape: the postings scan filters to the phrase's ≤k distinct
  * words FIRST (an isin predicate — pushable, and against a
  * word-bucketed postings ARTIFACT it becomes partition pruning, the
  * inverted-index read pattern); the phrase frame (k rows) broadcasts;
  * the one shuffle is the anchor groupBy, keyed (doc, anchor), whose
  * cardinality is the matched-posting count, never the corpus. No
  * per-document window, no array re-walk per candidate.
  */
object PhraseSearch {

  /** Positional postings: one row per token occurrence, 1-based
    * positions ([[TextFunctions.spaceTokens]] — the oracle-mirrorable
    * single-space convention, empties dropped BEFORE numbering).
    */
  def postings(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(col(idCol).as("doc_id"),
        posexplode(TextFunctions.spaceTokens(col(textCol))))
      .select(col("doc_id"), (col("pos") + 1).cast("long").as("pos"), col("col").as("word"))

  /** Documents containing the exact phrase: (doc_id, n_hits,
    * first_pos) — occurrence count and the 1-based position of the
    * first match.
    */
  def phraseMatches(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      phrase: Seq[String]): DataFrame = {
    require(phrase.nonEmpty, "phrase must have at least one word")
    require(phrase.forall(w => w.nonEmpty && !w.exists(_.isWhitespace)),
      "phrase terms are single tokens — split the phrase on spaces first")
    val spark = docs.sparkSession
    import spark.implicits._
    val ph = phrase.zipWithIndex.map { case (w, i) => (i.toLong, w) }.toDF("i", "w")
    postings(docs, idCol, textCol)
      .filter(col("word").isin(phrase.distinct: _*))
      .join(broadcast(ph), col("word") === col("w"))
      .select(col("doc_id"), (col("pos") - col("i")).as("anchor"), col("i"))
      .groupBy(col("doc_id"), col("anchor"))
      .agg(count_distinct(col("i")).as("nterms"))
      .filter(col("nterms") === phrase.length)
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_hits"), min(col("anchor")).as("first_pos"))
  }
}
