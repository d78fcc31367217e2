package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Byte-pair-encoding TOKENIZER TRAINING (Sennrich, Haddow, Birch —
  * "Neural Machine Translation of Rare Words with Subword Units",
  * ACL 2016) — the merge-rule learner that [[Vocab]] (id assignment)
  * and `TextFunctions.bpeTokens` (pre-tokenization) bracket: given a
  * corpus, learn the ranked list of symbol-pair merges a subword
  * tokenizer applies.
  *
  * Scale shape: BPE trains on the WORD-FREQUENCY table, not the raw
  * corpus — the corpus-scale step is ONE tokenize+groupBy shuffle
  * into (word, count), vocabulary-sized from then on. Each merge
  * iteration is: adjacent-pair counts weighted by word frequency
  * (one vocab-sized aggregate with map-side partials), a 1-row
  * argmax to the driver (bounded orchestration — the merge RULE is
  * the only thing that moves), and a narrow map applying the merge
  * to each word's symbol array. The iterating Dataset is persisted
  * and lineage-truncated every few rounds (localCheckpoint — the
  * [[Dedup.connectedComponents]] discipline: iterative plans
  * otherwise grow per round).
  *
  * Determinism: ties on pair count break by the lexicographically
  * smaller pair, so the merge list is a pure function of the corpus
  * — same merges on every run and partition layout (spec-pinned
  * against a single-threaded reference implementation).
  */
object Bpe {

  final case class Merge(rank: Int, left: String, right: String, pairCount: Long)

  /** Greedy left-to-right application of one merge to a symbol
    * array — standard BPE merge semantics (non-overlapping, one
    * pass).
    */
  private[operators] def applyMerge(
      syms: Array[String], a: String, b: String): Array[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var i = 0
    while (i < syms.length) {
      if (i + 1 < syms.length && syms(i) == a && syms(i + 1) == b) {
        out += a + b
        i += 2
      } else {
        out += syms(i)
        i += 1
      }
    }
    out.toArray
  }

  /** Learn `numMerges` merge rules from the corpus. Words are
    * whitespace tokens, seeded as character symbol sequences with a
    * trailing end-of-word marker (the paper's `</w>`, so merges can't
    * cross word boundaries and a final symbol distinguishes "low…"
    * from "low"). Stops early when the best pair's weighted count
    * falls under `minPairCount`.
    */
  def train(
      docs: DataFrame,
      textCol: String,
      numMerges: Int,
      minPairCount: Long = 2L): Seq[Merge] = {
    val spark = docs.sparkSession
    import spark.implicits._
    require(numMerges >= 0)

    // corpus-scale step: ONE shuffle into the word-frequency table
    var words: Dataset[(Array[String], Long)] =
      graft.Par.spread(docs.select(col(textCol)))
        .select(explode(graft.functions.TextFunctions.tokens(col(textCol))).as("w"))
        .groupBy($"w").agg(count(lit(1)).as("n"))
        .as[(String, Long)]
        .map { case (w, n) => (w.map(_.toString).toArray :+ "</w>", n) }
        .persist()
    words.count()

    val merges = scala.collection.mutable.ArrayBuffer.empty[Merge]
    var rank = 0
    var done = false
    while (rank < numMerges && !done) {
      // vocab-sized pair count; the space joiner cannot appear inside
      // a symbol (words are whitespace tokens, so no symbol — initial
      // or merged — ever contains one)
      val top = words.toDF("syms", "n")
        .select(explode(expr(
          """CASE WHEN size(syms) < 2 THEN array()
            |ELSE transform(sequence(1, size(syms) - 1),
            |               i -> concat(syms[i-1], ' ', syms[i])) END""".stripMargin))
          .as("pair"), col("n"))
        .groupBy($"pair").agg(sum($"n").as("cnt"))
        // deterministic argmax: max count, ties to the smaller pair
        .orderBy($"cnt".desc, $"pair")
        .limit(1)
        .as[(String, Long)]
        .collect()
        .headOption

      top match {
        case Some((pair, cnt)) if cnt >= minPairCount =>
          val Array(a, b) = pair.split(' ')
          merges += Merge(rank, a, b, cnt)
          val prev = words
          val mapped = words.map { case (syms, n) => (applyMerge(syms, a, b), n) }
          // lineage truncation every few rounds: localCheckpoint is
          // eager, so the checkpointed generation needs no persist of
          // its own (persisting `mapped` first would orphan a cache
          // entry nothing ever releases)
          words =
            if ((rank + 1) % 5 == 0) mapped.localCheckpoint()
            else { val p = mapped.persist(); p.count(); p }
          prev.unpersist(blocking = false)
          rank += 1
        case _ => done = true
      }
    }
    words.unpersist(blocking = false)
    merges.toSeq
  }

  /** Segment text with a learned merge list: per word, apply merges
    * in rank order (the standard encoder). A narrow map; the merge
    * list rides the closure.
    */
  def segmentWord(word: String, merges: Seq[Merge]): Array[String] = {
    var syms = word.map(_.toString).toArray :+ "</w>"
    merges.foreach(m => syms = applyMerge(syms, m.left, m.right))
    syms
  }

  /** (idCol, tokens array<string>) — each doc's whitespace words
    * segmented to subword units under the learned merges.
    */
  def encode(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      merges: Seq[Merge]): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col(idCol).cast("long"), col(textCol))
      .as[(Long, String)]
      .mapPartitions { it =>
        // per-task memoization: corpora repeat words heavily
        val cache = scala.collection.mutable.HashMap.empty[String, Array[String]]
        it.map { case (id, text) =>
          // the trainer's tokenizer contract, scalar form — encode
          // words MUST be produced exactly like training words
          val words = graft.functions.TextFunctions.tokensScalar(text)
          (id, words.flatMap(w => cache.getOrElseUpdate(w, segmentWord(w, merges))))
        }
      }
      .toDF(idCol, "subwords")
  }
}
