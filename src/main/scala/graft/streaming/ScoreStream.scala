package graft.streaming

import graft.operators.LogReg
import org.apache.spark.sql.{DataFrame, Dataset}

/** Streaming corpus quality scoring — the deployment shape of
  * [[graft.operators.LogReg]]: the model is trained in batch (nightly,
  * on the labeled slice) and applied to the incoming stream (the
  * crawl) as a STATELESS narrow map, so the scorer composes with any
  * trigger/watermark and never holds state. Same fixed-point
  * arithmetic as the batch scorer, so stream scoring of the same rows
  * is bit-identical to batch scoring (spec-pinned parity — the
  * stream≡batch discipline of [[SemDeDupStream]]/[[SpanDedupStream]]).
  */
object ScoreStream {

  /** One streamed row: id, embedding, label (label may be -1 =
    * unknown for unlabeled crawl data — it is carried, not used).
    */
  final case class VecDoc(id: Long, vec: Array[Float], y: Int)

  /** (id, margin, score, pred, y) per streamed row — the exact
    * [[LogReg.scoreAll]] output schema, computed with the model on
    * the closure.
    */
  def scored(ds: Dataset[VecDoc], model: LogReg.Model): DataFrame = {
    val spark = ds.sparkSession
    import spark.implicits._
    ds.mapPartitions { it =>
      it.map { d =>
        val x = LogReg.quantize(d.vec)
        val z = model.margin(x)
        (d.id, z, model.score(x), if (z >= 0L) 1L else 0L, d.y.toLong)
      }
    }.toDF("id", "margin", "score", "pred", "y")
  }

  /** Only the rows the learned filter keeps — the gate a crawl
    * pipeline writes onward (q135's WHERE, streaming).
    */
  def kept(ds: Dataset[VecDoc], model: LogReg.Model): DataFrame =
    scored(ds, model).filter(org.apache.spark.sql.functions.col("pred") === 1L)
}
