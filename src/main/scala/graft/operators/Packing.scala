package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing for LLM pre-training: assign documents to
  * fixed-token-budget training sequences ("packs"). The classic
  * streaming first-fit packer is inherently sequential; the
  * distributed form shards the corpus deterministically and packs by
  * CUMULATIVE START OFFSET within each shard — a document belongs to
  * the pack where its first token lands (`floor((cum − n) / budget)`),
  * so packs respect document order, fill greedily, and a document
  * straddling a boundary stays whole (token-level splitting is the
  * trainer's concern, not the layout's).
  *
  * Scale shape (100 TB):
  *  - one shuffle into `shards` hash partitions + a per-shard sort —
  *    shards pack INDEPENDENTLY, so parallelism is `shards`-wide and
  *    there is never a global ordering (a global cumsum window would
  *    serialize the whole corpus through one task);
  *  - everything after the window is arithmetic on (id, int) rows —
  *    whole-stage codegen, no data movement;
  *  - determinism: shard = id mod shards and the in-shard order is the
  *    id itself, so the layout is reproducible run-over-run (and
  *    mirrorable by any SQL engine for audit).
  */
object Packing {

  /** Per-document pack assignment: (idCol, shard, pack_id, n_tokens).
    * `budget` should be a power of two so the offset division is exact
    * in IEEE double on every engine.
    */
  def assign(
      docs: DataFrame,
      idCol: String,
      tokenCol: String,
      budget: Int,
      shards: Int): DataFrame = {
    require(budget > 0 && shards > 0, "budget and shards must be positive")
    val w = Window.partitionBy(col("shard")).orderBy(col(idCol))
    docs
      .withColumn("shard", pmod(col(idCol), lit(shards)).cast("long"))
      .withColumn("__cum", sum(col(tokenCol)).over(w))
      .withColumn("pack_id",
        floor((col("__cum") - col(tokenCol)) / budget.toDouble).cast("long"))
      .drop("__cum")
  }

  /** Pack-level manifest: documents and token mass per (shard, pack).
    * `pack_tokens` may exceed `budget` by at most one straddling
    * document's tail — the trainer's split point, recorded not hidden.
    */
  def manifest(
      docs: DataFrame,
      idCol: String,
      tokenCol: String,
      budget: Int,
      shards: Int): DataFrame =
    assign(docs, idCol, tokenCol, budget, shards)
      .groupBy(col("shard"), col("pack_id"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col(tokenCol)).as("pack_tokens"))
}
