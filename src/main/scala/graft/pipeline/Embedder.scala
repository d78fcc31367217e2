package graft.pipeline

import scala.util.hashing.MurmurHash3

/** Text → fixed-dim embedding, the engine-side analogue of the
  * reference's model-serving endpoint
  * (`03-model-inference-on-chunks.py:55-60,96-109`,
  * `databricks-bge-large-en`). Behind a trait so the deterministic
  * local implementation used by tests/oracles and a real remote
  * endpoint client are drop-in replacements (SURVEY.md §7.1).
  *
  * Implementations must be pure (same text ⇒ same vector) and
  * Serializable — instances are constructed per partition inside
  * `mapPartitions` (the batch-amortized-init pattern the reference's
  * Iterator-style pandas_udf exists for,
  * `03-model-inference-on-chunks.py:70-83`).
  */
trait Embedder extends Serializable {
  def dim: Int

  /** Embed one batch. Batch size is controlled by the caller
    * (`Inference.embedChunks` groups to ≤150, the reference's
    * endpoint cap at `03-model-inference-on-chunks.py:102-104`).
    */
  def embed(texts: Seq[String]): Seq[Array[Float]]
}

/** Deterministic feature-hashing embedder: unigram + bigram token
  * features hashed into `dim` signed buckets (hashing trick), then
  * L2-normalized. Seeded MurmurHash3 — identical output on every JVM,
  * executor, and retry, which is what makes embedding-dependent
  * queries reproducible offline (no live endpoint at test time).
  */
final case class HashingEmbedder(dim: Int = 64, seed: Int = 42) extends Embedder {
  require(dim > 0)

  override def embed(texts: Seq[String]): Seq[Array[Float]] =
    texts.map(embedOne)

  def embedOne(text: String): Array[Float] = {
    val v = new Array[Float](dim)
    if (text != null) {
      val toks = text.split("\\s+").filter(_.nonEmpty)
      var i = 0
      while (i < toks.length) {
        add(v, toks(i))
        if (i + 1 < toks.length) add(v, toks(i) + " " + toks(i + 1))
        i += 1
      }
    }
    val norm = math.sqrt(v.foldLeft(0.0)((a, x) => a + x.toDouble * x)).toFloat
    if (norm > 0) { var j = 0; while (j < dim) { v(j) /= norm; j += 1 } }
    v
  }

  @inline private def add(v: Array[Float], feature: String): Unit = {
    val h = MurmurHash3.stringHash(feature, seed)
    val bucket = math.floorMod(h, dim)
    val sign = if (((h >>> 31) & 1) == 0) 1.0f else -1.0f
    v(bucket) += sign
  }
}
