package graft.sources

import org.apache.spark.sql.DataFrame

/** Partitioned-parquet sink with DYNAMIC partition overwrite — the
  * idempotent-backfill shape a 100 TB pipeline actually runs: a daily
  * (or per-source) job recomputes SOME partitions and must replace
  * exactly those, leaving every untouched partition intact. Spark's
  * default (`static`) overwrite mode deletes the WHOLE table root
  * first — re-running yesterday's slice silently destroys the rest of
  * the corpus — so the mode is set per-write here (the
  * `partitionOverwriteMode` write option; session config stays
  * untouched), and the static foot-gun is opt-in via `replaceAll`.
  *
  * Layout contract: `partitionBy(cols)` produces `col=value/`
  * directories, so downstream reads with a partition-column predicate
  * prune at the FILE listing (PartitionFilters in the scan, zero data
  * files opened for excluded partitions) — asserted in
  * PartitionedSinkSpec. This is the on-disk analogue of the bucketed
  * artifacts: layout chosen once at write time, paid back on every
  * read.
  */
object PartitionedSink {

  /** Overwrite ONLY the partitions present in `df` (dynamic mode).
    * Partitions not represented in `df` survive. Idempotent: writing
    * the same slice twice leaves one copy.
    */
  def overwritePartitions(df: DataFrame, path: String, partitionCols: Seq[String]): Unit =
    df.write
      .mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy(partitionCols: _*)
      .parquet(path)

  /** Replace the WHOLE dataset (static mode — the default Spark
    * behavior, explicit here so callers choose destruction rather
    * than inherit it).
    */
  def replaceAll(df: DataFrame, path: String, partitionCols: Seq[String]): Unit =
    df.write
      .mode("overwrite")
      .option("partitionOverwriteMode", "static")
      .partitionBy(partitionCols: _*)
      .parquet(path)
}
