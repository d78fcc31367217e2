package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** CSV metadata ingest — the reference's entry point
  * (`01-download-pdfs.py:64`, S1) including its pre-clean pass that
  * strips newlines embedded inside quoted cells
  * (`01-download-pdfs.py:50-55`, S2).
  *
  * The reference rewrites the file row-by-row on the driver before
  * Spark ever sees it. We keep the whole thing declarative:
  * `multiLine` parsing handles quoted embedded newlines natively, and
  * the newline→space normalization is a `regexp_replace` projection —
  * distributed, pushdown-friendly, no driver pre-pass. Schema is
  * explicit (never inferred — SURVEY.md §7.1): inference costs an
  * extra full scan at 100 TB and can silently change types between
  * runs.
  */
object CsvIngest {

  def readClean(
      spark: SparkSession,
      path: String,
      schema: StructType,
      cleanCols: Seq[String]): DataFrame = {
    val raw = spark.read
      .option("header", "true")
      .option("multiLine", "true")
      .option("escape", "\"")
      .schema(schema)
      .csv(path)
    cleanCols.foldLeft(raw) { (df, c) =>
      df.withColumn(c, regexp_replace(col(c), "[\\r\\n]+", " "))
    }
  }

  /** Same read, with structurally-broken rows captured instead of
    * silently nulled: PERMISSIVE mode routes each malformed line into
    * `_corrupt_record`, so at 100 TB bad input is quarantined data
    * (filterable, countable, reprocessable), not a task failure and
    * not a silent drop. Returns (clean rows, corrupt rows).
    */
  def readQuarantined(
      spark: SparkSession,
      path: String,
      schema: StructType): (DataFrame, DataFrame) = {
    import org.apache.spark.sql.types.{StringType, StructField}
    val withCorrupt = StructType(schema.fields :+ StructField("_corrupt_record", StringType))
    val raw = spark.read
      .option("header", "true")
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .schema(withCorrupt)
      .csv(path)
      .cache() // corrupt-record column is only populated while the parse is live
    val clean = raw.filter(col("_corrupt_record").isNull).drop("_corrupt_record")
    val corrupt = raw.filter(col("_corrupt_record").isNotNull)
      .select(col("_corrupt_record"))
    (clean, corrupt)
  }
}
