package graft.pipeline

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}

/** One text chunk: the `chunks` table row of the reference
  * (`02-parallel-ocr-with-ray.py:292-296`; composite "i_j" ids from
  * `ocr-tesseract-unstructured.py:93`).
  */
final case class Chunk(doc_id: Long, chunk_idx: Int, chunk_id: String, chunk: String)

/** Chunk + embedding: the inference output row
  * (`03-model-inference-on-chunks.py:131`).
  */
final case class EmbeddedChunk(
    doc_id: Long, chunk_idx: Int, chunk_id: String, chunk: String,
    embedding: Array[Float])

/** Batched embedding inference — the Scala analogue of the reference's
  * Iterator-of-Series pandas_udf (`03-model-inference-on-chunks.py:96-109`):
  * per-partition embedder init (once, not per row — the batch-state
  * rationale documented at `:70-83`), then each partition's iterator
  * is consumed in ≤`batchSize` groups (the endpoint cap of 150 at
  * `:102-104`), flattening embeddings back onto the rows.
  *
  * Scale: this is a narrow map — no shuffle, no driver collection;
  * parallelism = input partitions. Upstream should size partitions so
  * a batch of `batchSize` texts fits comfortably in executor memory
  * (chunk texts are ≤ chunker width).
  */
object Inference {

  def embedChunks(
      chunks: Dataset[Chunk],
      embedder: Embedder,
      batchSize: Int = 150): Dataset[EmbeddedChunk] = {
    val spark = chunks.sparkSession
    import spark.implicits._
    chunks.mapPartitions { it =>
      // embedder is deserialized once per task: per-partition "client init"
      it.grouped(batchSize).flatMap { batch =>
        val vecs = embedder.embed(batch.map(_.chunk))
        batch.lazyZip(vecs).map { (c, v) =>
          EmbeddedChunk(c.doc_id, c.chunk_idx, c.chunk_id, c.chunk, v)
        }
      }
    }
  }

  /** documents(doc_id, text) → chunks via the column-level char-window
    * chunker: posexplode keeps the 0-based ordinal for the "i_j"
    * composite ids. Pure Catalyst (no UDF) until the typed boundary.
    */
  def chunkDocuments(
      spark: SparkSession,
      docs: DataFrame,
      width: Int = 200,
      minChars: Int = 50): Dataset[Chunk] = {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    graft.Par.spread(docs)
      .select(
        col("doc_id"),
        posexplode(Chunker.charWindowChunks(col("text"), width)))
      .toDF("doc_id", "chunk_idx", "chunk")
      .filter(length(col("chunk")) > minChars)
      .select(
        col("doc_id"),
        col("chunk_idx").cast("int").as("chunk_idx"),
        concat_ws("_", col("doc_id"), col("chunk_idx")).as("chunk_id"),
        col("chunk"))
      .as[Chunk]
  }
}
