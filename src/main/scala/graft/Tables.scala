package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Parquet table loaders over the driver test corpus
  * (`/root/testdata/sf*` — see TESTDATA.md). One parquet file per
  * table; at cluster scale these would be partitioned directories,
  * but the read path is identical (`spark.read.parquet(dir)`).
  *
  * All schemas are fixed by the fixtures (FIXTURES.md §B); we rely on
  * parquet footer schemas rather than re-declaring them — the footer
  * IS explicit (no inference happens, unlike the reference's CSV read
  * at 01-download-pdfs.py:64).
  */
object Tables {
  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def lineitem(s: SparkSession, d: String): DataFrame  = table(s, d, "lineitem")
  def orders(s: SparkSession, d: String): DataFrame    = table(s, d, "orders")
  def customer(s: SparkSession, d: String): DataFrame  = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = table(s, d, "part")
  def nation(s: SparkSession, d: String): DataFrame    = table(s, d, "nation")
  def region(s: SparkSession, d: String): DataFrame    = table(s, d, "region")
  /** `events.ts` has shipped as BOTH parquet TIMESTAMP(NANOS) (early
    * fixture generations — Spark rejects it by default) and plain
    * TIMESTAMP(MICROS) (current generation). Handle either by schema,
    * not by assumption:
    *  - NANOS: read as nanos-since-epoch (legacy conf) and floor to
    *    microseconds — exactly what DuckDB does loading the same file
    *    into its µs TIMESTAMP, so oracle comparisons line up;
    *  - MICROS: arrives as TIMESTAMP_NTZ; cast to session-zone
    *    TimestampType (session TZ is pinned UTC everywhere, so the
    *    instant is unchanged) to keep every downstream query on the
    *    same type the nanos path produced.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types.LongType
    val df = table(s, d, "events")
    df.schema("ts").dataType match {
      // integral `div` (not `/`): ns values exceed double's 2^53 mantissa
      case LongType => df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case _        => df.withColumn("ts", col("ts").cast("timestamp"))
    }
  }
  def documents(s: SparkSession, d: String): DataFrame = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")
}
