package graft.sources

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

/** Bucketed external-table copies for co-located fact⋈fact joins —
  * the 100 TB strategy when NEITHER side of a recurring join fits a
  * broadcast: both tables are written `bucketBy` the join key once,
  * and every subsequent join consumes the bucketing as its required
  * distribution, planning NO shuffle exchange on either side (and,
  * with one file per bucket and `sortBy`, no sort). The build cost is
  * one shuffle, amortized over every query against the copy — the
  * same materialized-artifact shape as the ANN indexes
  * (AnnSearch.persistedIndex).
  */
object BucketedTables {

  /** Ensure a bucketed copy of `df` exists at `path` and is
    * registered in the session catalog; returns the table name.
    *
    * The table name carries a digest of the path so distinct corpora/
    * params coexist in one catalog. `repartition(buckets, key)` before
    * the write aligns task partitioning with the bucket spec — each
    * task holds exactly one bucket, so every bucket is ONE file and
    * Spark trusts the `sortBy` order at read time (files-per-bucket=1
    * is its condition for eliding the merge sort).
    *
    * Re-runs: path already built (`_SUCCESS`) → just (re)register the
    * catalog entry (a fresh session starts with an empty in-memory
    * catalog); otherwise write via `saveAsTable` with an explicit
    * LOCATION — an external table, nothing lands in the default
    * warehouse directory.
    */
  def ensure(
      spark: SparkSession,
      df: DataFrame,
      baseName: String,
      path: String,
      key: String,
      buckets: Int): String = {
    require(buckets > 0)
    val table = s"${baseName}_${java.security.MessageDigest.getInstance("MD5")
      .digest(path.getBytes("UTF-8")).map("%02x".format(_)).mkString.take(8)}"
    val built = Files.exists(Paths.get(path, "_SUCCESS"))
    if (!built) {
      spark.sql(s"DROP TABLE IF EXISTS $table")
      df.repartition(buckets, col(key))
        .write.mode("overwrite")
        .bucketBy(buckets, key).sortBy(key)
        .option("path", path)
        .saveAsTable(table)
    } else if (!spark.catalog.tableExists(table)) {
      spark.sql(
        s"CREATE TABLE $table (${df.schema.toDDL}) USING PARQUET " +
          s"CLUSTERED BY ($key) SORTED BY ($key) INTO $buckets BUCKETS " +
          s"LOCATION '$path'")
    }
    table
  }
}
