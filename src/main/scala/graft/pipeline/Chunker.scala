package graft.pipeline

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Deterministic document chunking — the engine-side replacement for
  * the reference's `unstructured.chunk_by_title` stage
  * (`02-parallel-ocr-with-ray.py:223-230`, `ocr-tesseract-unstructured.py:78-84`).
  *
  * The reference treats chunk content as opaque; its only semantic
  * contract is "drop chunks of ≤ 50 characters"
  * (`02-parallel-ocr-with-ray.py:230`). We therefore define precise,
  * reimplementable specs (SURVEY.md §7.4) instead of chasing
  * byte-compatibility with unstructured's model-dependent algorithm:
  *
  *  - [[CharWindowChunker]]: fixed-width character windows — the
  *    SQL-expressible spec used by the oracle-checked queries;
  *  - [[ParagraphChunker]]: split on blank-line boundaries, greedily
  *    merge paragraphs up to a target size — the `chunk_by_title`
  *    analogue for structured text.
  *
  * Both are pure functions of the input string: safe to re-evaluate
  * under Spark task retries/speculation, usable inside codegen'd
  * expressions or `mapPartitions` alike.
  */
trait Chunker extends Serializable {
  def chunk(text: String): Seq[String]
}

/** Non-overlapping fixed-width char windows; trailing window kept only
  * if longer than `minChars`. Matches `Chunker.charWindowChunks`'s
  * column expression element-for-element (spec test in ChunkerSpec).
  */
final case class CharWindowChunker(width: Int = 200, minChars: Int = 50)
    extends Chunker {
  require(width > 0 && minChars >= 0)
  override def chunk(text: String): Seq[String] =
    if (text == null) Seq.empty
    else text.grouped(width).filter(_.length > minChars).toSeq
}

/** Blank-line paragraph split, greedy merge up to `targetChars`; the
  * reference's min-length filter applied to merged chunks.
  */
final case class ParagraphChunker(targetChars: Int = 1000, minChars: Int = 50)
    extends Chunker {
  require(targetChars > 0)
  override def chunk(text: String): Seq[String] = {
    if (text == null) return Seq.empty
    val paras = text.split("\n\\s*\n").iterator.map(_.trim).filter(_.nonEmpty)
    val out = Seq.newBuilder[String]
    val cur = new StringBuilder
    for (p <- paras) {
      if (cur.nonEmpty && cur.length + 1 + p.length > targetChars) {
        out += cur.toString; cur.clear()
      }
      if (cur.nonEmpty) cur.append('\n')
      cur.append(p)
    }
    if (cur.nonEmpty) out += cur.toString
    out.result().filter(_.length > minChars)
  }
}

object Chunker {

  /** Column-level char-window chunking: `array<string>` of up-to-
    * `width`-char windows. Stays inside Catalyst (regexp_extract_all
    * is codegen'd) — no UDF, so predicate pushdown and whole-stage
    * codegen survive. Pair with `posexplode` for (chunk_idx, chunk)
    * rows; 0-based index matches DuckDB `generate_series(0, …)`.
    * `(?s)` (DOTALL) is load-bearing: without it `.` skips newlines,
    * silently dropping them and diverging from the Scala chunker.
    */
  def charWindowChunks(text: Column, width: Int = 200): Column =
    regexp_extract_all(text, lit(s"(?s).{1,$width}"), lit(0))

  /** The reference's chunk filter (`len > 50`,
    * 02-parallel-ocr-with-ray.py:230) applied array-side, before the
    * generator — fewer rows enter the explode.
    */
  def filterShort(chunks: Column, minChars: Int = 50): Column =
    filter(chunks, c => length(c) > minChars)

  /** OVERLAPPING sliding char windows — start offsets 0, stride,
    * 2·stride, …: with stride < width consecutive chunks share
    * width−stride chars, so a passage straddling a window boundary is
    * wholly contained in some chunk (the retrieval-chunking layout;
    * the reference's windows are non-overlapping). Pure Catalyst:
    * a sequence of start offsets mapped through substring — codegen,
    * no UDF, and exactly mirrorable by SQL list_transform. Null text
    * → empty array; text shorter than one window → one chunk.
    */
  def slidingWindowChunks(text: Column, width: Int = 200, stride: Int = 150): Column = {
    require(width > 0 && stride > 0 && stride <= width,
      "need 0 < stride <= width (stride > width would drop characters)")
    val len = length(text)
    // last start index k: smallest k with k·stride + width ≥ len,
    // i.e. ceil((len−width)/stride) — clamped to ≥ 0
    val k = greatest(ceil((len - width).cast("double") / stride).cast("int"), lit(0))
    when(text.isNull || len === 0, array().cast("array<string>"))
      .otherwise(transform(sequence(lit(0), k),
        i => substring(text, i * stride + lit(1), lit(width))))
  }
}
