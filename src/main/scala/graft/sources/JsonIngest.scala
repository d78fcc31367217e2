package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructField, StructType}

/** JSON-lines ingest — the other metadata interchange format a
  * document pipeline meets in the wild (one JSON object per line,
  * the shape every crawler/labeling tool exports). Same discipline
  * as [[CsvIngest]]: explicit schema (inference is an extra full
  * scan at 100 TB and can silently change types between runs),
  * PERMISSIVE parsing with malformed lines QUARANTINED into a
  * corrupt-record side channel — bad input is filterable data, not
  * a task failure and not a silent drop.
  */
object JsonIngest {

  /** Strict-schema JSON-lines read (one object per line). */
  def read(
      spark: SparkSession,
      path: String,
      schema: StructType): DataFrame =
    spark.read.schema(schema).json(path)

  /** Same read with structurally-broken lines captured: returns
    * (clean rows, corrupt raw lines). The corrupt side keeps the
    * verbatim line so a 100 TB run can count, sample, and reprocess
    * its quarantine without re-reading the source.
    */
  def readQuarantined(
      spark: SparkSession,
      path: String,
      schema: StructType): (DataFrame, DataFrame) = {
    val withCorrupt =
      StructType(schema.fields :+ StructField("_corrupt_record", StringType))
    val raw = spark.read
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .schema(withCorrupt)
      .json(path)
      .cache() // corrupt column is only populated while the parse is live
    val clean = raw.filter(col("_corrupt_record").isNull)
      .drop("_corrupt_record")
    val corrupt = raw.filter(col("_corrupt_record").isNotNull)
      .select(col("_corrupt_record"))
    (clean, corrupt)
  }

  /** Projection-shaped consumer for semi-structured event payloads:
    * parse a JSON string column against `schema` in place (the
    * from_json path q09/q46 exercise), keeping rows whose payload
    * fails the schema as NULL structs rather than dropping them —
    * the consumer decides, not the parser.
    */
  def parseColumn(
      df: DataFrame,
      jsonCol: String,
      schema: StructType,
      outCol: String): DataFrame =
    df.withColumn(outCol, from_json(col(jsonCol), schema))
}
