package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Kafka-shaped source seam — the connector interface, jar-free.
  *
  * This environment carries no `spark-sql-kafka` connector jar, so the
  * engine cannot open a real `format("kafka")` stream; what it CAN pin
  * down is everything a query sees of one: the exact source schema
  * (key/value as binary, topic/partition/offset bookkeeping columns,
  * event timestamp), the consumer-side projection (bytes → string →
  * from_json), and the exactly-once sink discipline (offset-keyed
  * idempotent writes under at-least-once replay). Any stream with
  * these columns — MemoryStream in specs, the real connector in
  * production — flows through unchanged: swapping in
  * `spark.readStream.format("kafka")` is a one-line change at the
  * source, which is the point of the seam.
  */
object KafkaShaped {

  /** The Kafka source schema, verbatim (Structured Streaming Kafka
    * integration guide): key/value are BYTES — deserialization is the
    * query's job, not the source's.
    */
  val schema: StructType = StructType(Seq(
    StructField("key", BinaryType),
    StructField("value", BinaryType),
    StructField("topic", StringType),
    StructField("partition", IntegerType),
    StructField("offset", LongType),
    StructField("timestamp", TimestampType),
    StructField("timestampType", IntegerType)))

  /** Adapt a record stream (string key/value, the test-friendly shape)
    * into the exact Kafka source schema. Column names are matched by
    * NAME, not position, and the output column order/types are pinned
    * to [[schema]].
    */
  def fromRecords(records: DataFrame): DataFrame = {
    // timestampType (0 = CreateTime) is connector bookkeeping most
    // record producers don't carry — default it rather than require it
    val tsType =
      if (records.columns.contains("timestampType")) col("timestampType")
      else lit(0)
    records.select(
      col("key").cast(BinaryType).as("key"),
      col("value").cast(BinaryType).as("value"),
      col("topic").cast(StringType).as("topic"),
      col("partition").cast(IntegerType).as("partition"),
      col("offset").cast(LongType).as("offset"),
      col("timestamp").cast(TimestampType).as("timestamp"),
      tsType.cast(IntegerType).as("timestampType"))
  }

  /** The standard consumer-side projection: value bytes → UTF-8 string
    * → `from_json(valueSchema)`, exploded to columns, with the
    * (topic, partition, offset, timestamp) bookkeeping columns kept —
    * downstream exactly-once sinks key on them.
    */
  def parseJson(kafka: DataFrame, valueSchema: StructType): DataFrame =
    kafka.select(
      col("topic"), col("partition"), col("offset"), col("timestamp"),
      from_json(col("value").cast(StringType), valueSchema).as("v"))
      .select(col("topic"), col("partition"), col("offset"), col("timestamp"), col("v.*"))

  /** Exactly-once parquet sink under at-least-once delivery: each
    * micro-batch is anti-joined against the (topic, partition, offset)
    * keys already persisted, so replayed records — a restarted query
    * re-emitting a batch, a producer retry duplicating rows — land
    * exactly once. The anti-join reads only the sink's bookkeeping
    * columns (column-pruned scan); at warehouse scale the same
    * contract is one MERGE on the offset key. Batches are appended
    * with `mode("append")` AFTER dedup, so the sink never rewrites
    * history.
    */
  def exactlyOnceSink(parsed: DataFrame, path: String, checkpoint: String)
      : org.apache.spark.sql.streaming.StreamingQuery =
    parsed.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: Dataset[Row], _: Long) =>
        val spark = batch.sparkSession
        val fresh =
          if (!new java.io.File(path).exists()) batch
          else {
            val seen = spark.read.parquet(path)
              .select(col("topic"), col("partition"), col("offset"))
            batch.join(seen, Seq("topic", "partition", "offset"), "left_anti")
          }
        // a batch can carry its own duplicates too (producer retry)
        fresh.dropDuplicates("topic", "partition", "offset")
          .write.mode("append").parquet(path)
      }
      .start()
}
