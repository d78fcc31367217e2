package graft.operators

import org.apache.spark.sql.SparkSession

/** Small-file compaction — the OPTIMIZE-compact maintenance primitive:
  * streaming sinks, incremental syncs, and fine-grained partitioned
  * writes accumulate thousands of tiny files, and at 100 TB the
  * resulting task-per-file scheduling and footer-per-file planning
  * overwhelm the driver long before the data does. Compaction rewrites
  * a directory into ⌈bytes / target⌉ files.
  *
  * `coalesce`, not `repartition`: compaction must not pay a shuffle —
  * coalesce merges existing partitions map-side, so the rewrite
  * streams each input file exactly once. The trade (coalesce cannot
  * SPLIT partitions) is irrelevant here: small-file inputs only ever
  * merge downward.
  *
  * Writes to a NEW directory + success marker rather than in-place:
  * parquet has no transaction, so in-place compaction that fails
  * midway destroys the table. Swapping the directory pointer is the
  * caller's (or the table format's) atomic step.
  */
object Compact {

  /** Number of output files for `totalBytes` of input at `targetBytes`
    * per file — always ≥ 1.
    */
  def plannedFiles(totalBytes: Long, targetBytes: Long): Int = {
    require(targetBytes > 0, "target file size must be positive")
    math.max(1, math.ceil(totalBytes.toDouble / targetBytes).toInt)
  }

  /** Compact parquet at `srcDir` into ~`targetBytes` files at
    * `destDir`; returns the output file count. Idempotent via the
    * `_SUCCESS` marker (same amortized-artifact contract as
    * [[ZOrder.ensureClustered]]).
    */
  def compactDir(
      spark: SparkSession,
      srcDir: String,
      destDir: String,
      targetBytes: Long): Int = {
    import java.nio.file.{Files, Paths}
    if (!Files.exists(Paths.get(destDir, "_SUCCESS"))) {
      val src = spark.read.parquet(srcDir)
      val bytes = src.inputFiles.map(f =>
        try Files.size(Paths.get(new java.net.URI(f).getPath))
        catch { case _: Exception => 0L }).sum
      src.coalesce(plannedFiles(bytes, targetBytes))
        .write.mode("overwrite").parquet(destDir)
    }
    spark.read.parquet(destDir).inputFiles.length
  }
}
