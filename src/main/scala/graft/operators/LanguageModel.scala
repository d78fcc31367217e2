package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Unigram language-model scoring — the classic corpus-level quality
  * signal: documents whose tokens are collectively improbable under
  * the corpus's own unigram distribution are boilerplate, gibberish,
  * or wrong-language, and perplexity-filtering on exactly this score
  * (usually from a small LM, here from the corpus itself) is a
  * standard curation stage (CCNet-style).
  *
  * Scale shape: the probability table is VOCABULARY-sized (one
  * count aggregate over the exploded token stream — map-side partial
  * combine does the heavy lifting), broadcast into the scoring join,
  * so scoring is one scan of the corpus with no corpus-sized shuffle.
  * Tokenization is the repo's oracle-mirrorable space split.
  */
object LanguageModel {

  private def toks(text: Column): Column =
    filter(split(text, " "), t => length(t) > 0)

  /** (word, n, p) unigram table with optional add-k smoothing over
    * the OBSERVED vocabulary: p = (n + k) / (N + k·V). k = 0 is the
    * plain MLE (every observed token has p > 0; only cross-corpus
    * scoring needs k > 0).
    */
  def unigramProbs(docs: DataFrame, textCol: String, k: Double = 0.0): DataFrame = {
    val words = graft.Par.spread(docs.select(col(textCol)))
      .select(explode(toks(col(textCol))).as("word"))
    val counts = words.groupBy(col("word")).agg(count(lit(1)).as("n"))
    // two scalar broadcasts (N, V) via a crossJoin of a 1-row frame —
    // no collect, stays a plan
    val totals = counts.agg(sum(col("n")).as("__N"), count(lit(1)).as("__V"))
    counts.crossJoin(totals)
      .withColumn("p",
        (col("n") + lit(k)) / (col("__N") + lit(k) * col("__V")))
      .select(col("word"), col("n"), col("p"))
  }

  /** Per-document negative log-likelihood under `probs`:
    * (id, n_tokens, avg_nll) — avg_nll is the cross-entropy in nats,
    * r4-rounded; exp(avg_nll) is the doc's unigram perplexity.
    * Unseen tokens (cross-corpus scoring with k = 0) would be null —
    * they are dropped from the average rather than poisoning it; pass
    * k > 0 at table build time to score them instead.
    */
  def scoreDocs(docs: DataFrame, idCol: String, textCol: String,
      probs: DataFrame): DataFrame = {
    val tok = graft.Par.spread(docs.select(col(idCol).as("id"), col(textCol)))
      .select(col("id"), explode(toks(col(textCol))).as("word"))
    tok.join(broadcast(probs.select(col("word"), col("p"))), Seq("word"), "left")
      .groupBy(col("id"))
      .agg(count(lit(1)).as("n_tokens"),
        graft.functions.TextFunctions.r4(avg(-log(col("p")))).as("avg_nll"))
  }
}
