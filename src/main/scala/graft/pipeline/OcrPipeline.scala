package graft.pipeline

import org.apache.spark.HashPartitioner
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The reference's two heavy pipelines, Spark-first.
  *
  * E1 (metadata ingest, `01-download-pdfs.py:174-183`): select →
  * limit → filters → derived filename/filesize → sink. The reference
  * applies `limit(100)` BEFORE its filters (a semantic trap,
  * SURVEY.md §2.2) — preserved here, but over a total order so the
  * result is deterministic (a bare limit on a distributed scan isn't).
  *
  * E2 (OCR fan-out, `02-parallel-ocr-with-ray.py:125-296`): the
  * reference leaves Spark for Ray because per-document OCR is
  * minutes-heavy. We keep it in Spark: longest-processing-time-first
  * placement (its `ORDER BY filesize DESC`, rationale at `:4-8,125`)
  * becomes an explicit round-robin-by-rank repartition, then
  * document-per-task `mapPartitions`. No driver collect, no
  * positional re-join — chunks stay keyed by doc_id throughout
  * (replacing the fragile ordinal join at `:274-282`).
  */
object OcrPipeline {

  /** E1: the papers table derivation. `filename` mirrors
    * `{vol}pdfs/{date[:10]}_{title.replace(' ','_')}.pdf`
    * (`01-download-pdfs.py:135-136`) with fixture columns standing in
    * (FIXTURES.md role mapping); `filesize` ≈ `n_chars`.
    */
  def buildPapers(docs: DataFrame, limitN: Int = 100): DataFrame =
    docs
      .orderBy(col("doc_id"))
      .limit(limitN)                       // limit BEFORE filters, as in ref
      .filter(col("source").isNotNull)
      .filter(substring(col("source"), 1, 3) === "src")
      .withColumn("filename",
        concat(lit("pdfs/"), substring(col("source"), 1, 10), lit("_"),
          translate(substring(col("text"), 1, 20), " ", "_"), lit(".pdf")))
      .withColumn("filesize", col("n_chars"))
      .select("doc_id", "source", "filename", "filesize")
      .orderBy(col("filesize").desc, col("doc_id"))   // LPT order (O1)

  /** S10: filesystem glob → binary rows, the engine-side form of the
    * reference's directory listing at `ocr-tesseract-unstructured
    * .py:57-59`. `binaryFile` gives (path, modificationTime, length,
    * content); `doc_id` is derived from the file name when it carries
    * one (`..._<digits>.pdf`/`doc<digits>.pdf`), else a stable hash
    * of the path — deterministic across runs, unlike the reference's
    * listing-order ordinals. `length` doubles as the LPT `filesize`
    * (real byte counts, not a proxy).
    */
  def readBinaryDocs(
      spark: SparkSession,
      dir: String,
      glob: String = "*.pdf"): DataFrame = {
    // ≤18 digits: anything longer would overflow the long cast (an
    // ANSI-mode exception killing the whole scan on one odd filename)
    // → such names fall through to the path hash.
    val numbered = regexp_extract(col("path"), "(?<!\\d)(\\d{1,18})\\.[A-Za-z0-9]+$", 1)
    val base = spark.read.format("binaryFile")
      .option("pathGlobFilter", glob)
      .load(dir)
      .withColumn("doc_id",
        when(numbered =!= "", numbered.cast("long"))
          .otherwise(abs(xxhash64(col("path")))))

    // Downstream joins key on doc_id — a silent collision ("a/doc_1.pdf"
    // vs "b/doc_1.pdf", or a numbered id landing on another path's
    // hash) would MERGE two documents. Guard eagerly on the skinny
    // (doc_id, path) projection (the binary `content` column is pruned
    // at the source, so this is a listing-sized job): colliding ids
    // fall back to the path hash, and if even that collides (p ≈ 2⁻⁶³
    // per pair) the read fails loudly rather than corrupt joins.
    val dupIds = base.select(col("doc_id")).groupBy(col("doc_id"))
      .count().filter(col("count") > 1)
      .select(col("doc_id")).collect().map(_.getLong(0))   // bounded: collisions only
    val resolved =
      if (dupIds.isEmpty) base
      else base.withColumn("doc_id",
        when(col("doc_id").isin(dupIds.toSeq: _*), abs(xxhash64(col("path"))))
          .otherwise(col("doc_id")))
    if (dupIds.nonEmpty) {
      val still = resolved.select(col("doc_id")).groupBy(col("doc_id"))
        .count().filter(col("count") > 1).count()
      if (still > 0) throw new IllegalStateException(
        s"readBinaryDocs: $still doc_id collision(s) persist after path-hash " +
          s"fallback under $dir — rename the conflicting files")
    }
    resolved.select(col("doc_id"), col("path"), col("length").as("filesize"), col("content"))
  }

  /** Longest-processing-time-first placement: rank documents by
    * descending cost, deal rank i to partition i mod n — each task
    * gets an equal count of docs, with the heavy ones spread evenly
    * and leading their task. `zipWithIndex` (one extra job to count
    * partitions, no single-partition window) + a hash partitioner on
    * the dealt key. RDD drop-down is deliberate: task placement is
    * exactly the "genuine per-partition imperative logic" case.
    */
  def lptRepartition(df: DataFrame, sizeCol: String, numPartitions: Int): DataFrame = {
    require(numPartitions > 0)
    val spark = df.sparkSession
    val schema = df.schema
    val dealt = df.orderBy(col(sizeCol).desc).rdd
      .zipWithIndex()
      .map { case (row, rank) => ((rank % numPartitions).toInt, row) }
      .partitionBy(new HashPartitioner(numPartitions))
      .values
    spark.createDataFrame(dealt, schema)
  }

  /** E2 OCR stage: (doc_id, content binary, filesize) → (doc_id, text),
    * document-per-task with LPT placement. The OCR engine sits behind
    * [[PdfPartitioner]]; elements are re-joined by newline, keyed by
    * doc_id (never by position).
    */
  def extractText(
      spark: SparkSession,
      binDocs: DataFrame,
      partitioner: PdfPartitioner,
      strategy: PartitionStrategy = PartitionStrategy.OcrOnly,
      parallelism: Int = 32): DataFrame =
    extractMapped(spark, binDocs, parallelism) { (id, content) =>
      (id, partitioner.partition(content, strategy).mkString("\n"), "")
    }.drop("extract_path")

  /** [[extractText]] with per-document provenance: the third column
    * is the [[ExtractPath]] label of the branch that produced each
    * document's text (real PDF text layer, OCR-seam fallback, or
    * non-PDF bytes) — the auditable form the pipeline sinks so a
    * corpus run reports HOW its text was obtained, not just that
    * rows exist.
    */
  def extractTextAudited(
      spark: SparkSession,
      binDocs: DataFrame,
      partitioner: AutoPartitioner,
      strategy: PartitionStrategy = PartitionStrategy.OcrOnly,
      parallelism: Int = 32): DataFrame =
    extractMapped(spark, binDocs, parallelism) { (id, content) =>
      val (els, path) = partitioner.partitionWithPath(content, strategy)
      (id, els.mkString("\n"), path)
    }

  /** The one copy of the extraction plumbing (skinny projection → LPT
    * placement → per-partition map) behind [[extractText]] and
    * [[extractTextAudited]] — a placement/casting change lands in
    * both or neither. */
  private def extractMapped(
      spark: SparkSession,
      binDocs: DataFrame,
      parallelism: Int)(
      f: (Long, Array[Byte]) => (Long, String, String)): DataFrame = {
    import spark.implicits._
    val placed = lptRepartition(
      binDocs.select(col("doc_id").cast("long"), col("content"), col("filesize").cast("long")),
      "filesize", parallelism)
    placed.as[(Long, Array[Byte], Long)].mapPartitions { it =>
      it.map { case (id, content, _) => f(id, content) }
    }.toDF("doc_id", "text", "extract_path")
  }
}
