package graft.pipeline

import java.nio.charset.StandardCharsets

/** Strategy names of the reference's OCR stage:
  * `strategy="ocr_only"` (`02-parallel-ocr-with-ray.py:226`) and
  * `strategy="hi_res"` (`ocr-tesseract-unstructured.py:82`).
  */
sealed trait PartitionStrategy
object PartitionStrategy {
  case object OcrOnly extends PartitionStrategy
  case object HiRes extends PartitionStrategy
}

/** Binary document → text elements, the engine-side seam for the
  * reference's `unstructured.partition_pdf` + tesseract OCR
  * (`02-parallel-ocr-with-ray.py:223-228`,
  * `ocr-tesseract-unstructured.py:78-83`).
  *
  * OCR engines aren't available in this environment, so the real
  * implementation is a documented STUB SEAM: a production deployment
  * drops in a tesseract/unstructured-backed implementation with this
  * exact signature. Everything around the seam — partitioning of
  * work (LPT, §4 row 1 of SURVEY.md), per-task execution via
  * `mapPartitions`, chunk/explode/join plumbing — is real and tested
  * with [[TextPartitioner]].
  *
  * Per-document OCR is minutes-heavy (ref: ~3 min avg, 30 min
  * outliers — `02-parallel-ocr-with-ray.py:5,8`): the unit of
  * parallelism must be the document, never the byte range, which is
  * why [[OcrPipeline.extractText]] repartitions documents
  * rather than relying on input-split sizing.
  */
trait PdfPartitioner extends Serializable {
  def partition(content: Array[Byte], strategy: PartitionStrategy): Seq[String]
}

/** Deterministic stand-in: decode bytes as UTF-8 and split into
  * page-like elements on form-feed or blank-line boundaries. Stands
  * in for OCR output so the full pipeline is locally testable.
  */
final case class TextPartitioner() extends PdfPartitioner {
  override def partition(
      content: Array[Byte],
      strategy: PartitionStrategy): Seq[String] = {
    if (content == null) return Seq.empty
    val text = new String(content, StandardCharsets.UTF_8)
    text.split("\f|\n\\s*\n").iterator.map(_.trim).filter(_.nonEmpty).toSeq
  }
}
