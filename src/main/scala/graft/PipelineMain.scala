package graft

import graft.pipeline._
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** The reference pipeline end-to-end as one runnable program — what
  * `01-download-pdfs.py` → `02-parallel-ocr-with-ray.py` →
  * `03-model-inference-on-chunks.py` → vector search do across four
  * notebooks, as a single deterministic Spark job graph.
  *
  * Usage: `runMain graft.PipelineMain <sfDir> <outDir> [queryText]`
  * Writes: papers.parquet, chunks.parquet, index.parquet,
  * search_results.parquet under outDir, and prints stage counts.
  */
object PipelineMain {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val outDir = if (args.length > 1) args(1) else "/tmp/graft-pipeline"
    val queryText = if (args.length > 2) args(2) else "spark join performance"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = Graft.session(master = s"local[$cpus]",
      shufflePartitions = Some(cpus.toInt), appName = "graft-pipeline")
    spark.sparkContext.setLogLevel("WARN")
    run(spark, sfDir, outDir, queryText)
    spark.stop()
  }

  def run(spark: SparkSession, sfDir: String, outDir: String, queryText: String): Unit = {
    import spark.implicits._

    // E1: metadata → papers (select/limit/filter/derive/sort)
    val papers = OcrPipeline.buildPapers(Tables.documents(spark, sfDir), limitN = 100)
    papers.write.mode("overwrite").parquet(s"$outDir/papers")
    println(s"[pipeline] papers: ${spark.read.parquet(s"$outDir/papers").count()}")

    // E2: chunking (the OCR stage collapses: fixture documents carry
    // their text; with binary input this is OcrPipeline.extractText
    // behind the PdfPartitioner seam, LPT-placed)
    val docsForChunks = Tables.documents(spark, sfDir)
      .join(papers.select($"doc_id"), Seq("doc_id"), "left_semi")
    val chunks = Inference.chunkDocuments(spark, docsForChunks)
    chunks.toDF().write.mode("overwrite").parquet(s"$outDir/chunks")
    println(s"[pipeline] chunks: ${spark.read.parquet(s"$outDir/chunks").count()}")

    // E3: batched embedding inference → index table (U4/U10)
    val embedder = HashingEmbedder(dim = 64)
    val index = Inference.embedChunks(
      spark.read.parquet(s"$outDir/chunks").as[Chunk], embedder, batchSize = 150)
    index.toDF().write.mode("overwrite").parquet(s"$outDir/index")
    println(s"[pipeline] index: ${spark.read.parquet(s"$outDir/index").count()}")

    // U11: similarity search over the materialized index
    val results = VectorSearch.searchText(
      spark.read.parquet(s"$outDir/index"), "embedding", "chunk_id",
      queryText, embedder, k = 5)
      .select($"chunk_id", $"doc_id", $"chunk", round($"sim", 6).as("sim"))
    results.write.mode("overwrite").parquet(s"$outDir/search_results")
    println(s"[pipeline] search('$queryText') top-5:")
    results.collect().foreach(r =>
      println(s"  ${r.getString(0)}  sim=${r.getDouble(3)}  ${r.getString(2).take(60)}…"))
  }
}
