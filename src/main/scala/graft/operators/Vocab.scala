package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Word-level vocabulary building and token-id encoding — the
  * tokenize→ids step that turns a curated corpus into trainer input.
  * Ids are assigned by descending corpus frequency (ties broken by
  * token text), id 0 reserved for OOV — the classic frequency-ranked
  * vocab layout.
  *
  * Scale shape (100 TB):
  *  - BUILD is one gram-keyed shuffle with map-side partial counts
  *    (the q56 document-frequency shape) followed by a rank over the
  *    top `maxSize` tokens — maxSize rows, not corpus rows, pass the
  *    zipRank id assignment (TakeOrdered cuts k per task map-side);
  *  - ENCODE joins the exploded (doc, pos, token) stream against the
  *    vocab — vocab tables are ≤ a few hundred thousand rows, so the
  *    join BROADCASTS and encoding is a narrow pass over the corpus;
  *    per-doc id arrays reassemble position-ordered via
  *    `array_sort` over (pos, id) structs — no per-group sort task,
  *    no UDF anywhere.
  */
object Vocab {

  /** (token, id) vocabulary of the `maxSize` most frequent tokens;
    * id 1 = most frequent (0 is the implicit OOV id).
    */
  def build(docs: DataFrame, textCol: String, maxSize: Int): DataFrame = {
    require(maxSize > 0, "maxSize must be positive")
    // ids via GlobalOrder.zipRank over the top-maxSize cut
    // (TakeOrdered): the input is vocab-sized by construction, and
    // the TakeOrdered result is a single sorted partition, so the
    // ranking is one narrow pass — no single-partition WindowExec,
    // no ranking warning in the logs. NOTE: zipRank is EAGER — build()
    // executes the frequency aggregation at call time and returns the
    // vocab pinned behind an RDD boundary (vocab-sized, the frame is
    // about to be broadcast by encode() anyway)
    GlobalOrder.zipRank(
      graft.Par.spread(docs.select(col(textCol)))
        .select(explode(graft.functions.TextFunctions.tokens(col(textCol))).as("token"))
        .groupBy(col("token")).agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("token")).limit(maxSize),
      "id")
      .select(col("token"), col("id"), col("n"))
  }

  /** Documents encoded as position-ordered id arrays (OOV → 0):
    * (idCol, ids, n_tokens, n_oov).
    */
  def encode(docs: DataFrame, idCol: String, textCol: String, vocab: DataFrame): DataFrame = {
    val exploded = graft.Par.spread(docs.select(col(idCol), col(textCol)))
      .select(col(idCol),
        posexplode(graft.functions.TextFunctions.tokens(col(textCol)))
          .as(Seq("pos", "token")))
    exploded
      // vocab id under a reserved name: the caller's idCol may itself
      // be named "id"
      .join(broadcast(vocab.select(col("token"), col("id").as("__vid"))),
        Seq("token"), "left")
      .withColumn("tid", coalesce(col("__vid"), lit(0L)))
      .groupBy(col(idCol))
      .agg(
        // array_sort on (pos, tid) structs: comparison is field-order,
        // pos first — position order restored without a sort task
        transform(
          array_sort(collect_list(struct(col("pos"), col("tid")))),
          s => s.getField("tid")).as("ids"),
        count(lit(1)).as("n_tokens"),
        sum((col("tid") === 0L).cast("long")).as("n_oov"))
  }
}
