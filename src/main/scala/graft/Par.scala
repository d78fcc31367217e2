package graft

import org.apache.spark.sql.DataFrame

/** Parallelism repair for CPU-dense pipelines over narrow sources.
  *
  * A scan's split count floors at ONE SPLIT PER FILE — a small corpus
  * in one parquet file runs every downstream narrow operator
  * (tokenization, hashing, signature computation) on a single task no
  * matter how many cores the cluster has (measured: 6× on the sf0.1
  * documents table for n-gram explode). `spread` round-robins such an
  * input up to the default parallelism BEFORE the expensive
  * projection; when the source already carries at least cores-many
  * files (any warehouse-scale table), it is a no-op — no shuffle is
  * added on the path where the data is already wide.
  */
object Par {
  def spread(df: DataFrame): DataFrame = {
    if (df.isStreaming) return df    // micro-batch sizing is the stream's own concern
    val target = df.sparkSession.sparkContext.defaultParallelism
    // the SCAN partition count, not the file count: maxPartitionBytes
    // coalesces many small files into few splits (measured: a 32-file
    // 272 KB artifact scanned as ONE partition, serializing the whole
    // downstream signature stage on one task)
    if (df.rdd.getNumPartitions < target) df.repartition(target) else df
  }
}
