package graft.streaming

import java.nio.file.Files

import graft.SparkSpec
import graft.pipeline.{Chunk, HashingEmbedder}
import org.apache.spark.sql.functions._

class IncrementalIndexSpec extends SparkSpec {

  test("AvailableNow sync: embeds only new chunks, idempotent re-run") {
    import spark.implicits._
    val base = Files.createTempDirectory("graft-stream")
    val chunksDir = s"$base/chunks"
    val indexDir = s"$base/index"
    val ckpt = s"$base/ckpt"
    val e = HashingEmbedder(dim = 64)

    // batch 1
    Seq(Chunk(1L, 0, "1_0", "first chunk text for the index"),
        Chunk(2L, 0, "2_0", "second chunk text for the index"))
      .toDS().write.mode("append").parquet(chunksDir)
    IncrementalIndex.syncOnce(spark, chunksDir, indexDir, ckpt, e)
    assert(spark.read.parquet(indexDir).count() === 2)

    // batch 2 appended: only the delta is embedded
    Seq(Chunk(3L, 0, "3_0", "third chunk arrives later"))
      .toDS().write.mode("append").parquet(chunksDir)
    IncrementalIndex.syncOnce(spark, chunksDir, indexDir, ckpt, e)
    val idx = spark.read.parquet(indexDir)
    assert(idx.count() === 3)
    assert(idx.select("chunk_id").as[String].collect().sorted === Array("1_0", "2_0", "3_0"))

    // re-run with no new input: no duplicates (checkpointed exactly-once)
    IncrementalIndex.syncOnce(spark, chunksDir, indexDir, ckpt, e)
    assert(spark.read.parquet(indexDir).count() === 3)

    // embeddings identical to batch-mode inference
    val fromStream = idx.filter($"chunk_id" === "3_0")
      .select("embedding").as[Array[Float]].head()
    assert(fromStream.toSeq === e.embedOne("third chunk arrives later").toSeq)
  }

  test("windowedEventStats: streaming AvailableNow result matches batch") {
    import spark.implicits._
    val base = Files.createTempDirectory("graft-events")
    val eventsDir = s"$base/events"
    val rows = Seq(
      ("2024-01-01 00:05:00", "click", 1.0),
      ("2024-01-01 00:55:00", "click", 2.0),
      ("2024-01-01 01:10:00", "view", 5.0),
      ("2024-01-01 02:01:00", "click", 7.0))
      .toDF("ts_s", "event_type", "value")
      .select(to_timestamp($"ts_s").as("ts"), $"event_type", $"value")
    rows.write.parquet(eventsDir)

    val batchResult = IncrementalIndex.windowedEventStats(rows)
      .orderBy("hour_start", "event_type").collect().toSeq

    val stream = spark.readStream.schema(rows.schema).parquet(eventsDir)
    val q = IncrementalIndex.windowedEventStats(stream)
      .writeStream.format("memory").queryName("winstats")
      .outputMode("complete")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val streamResult = spark.table("winstats")
      .orderBy("hour_start", "event_type").collect().toSeq
    assert(streamResult === batchResult)
    assert(batchResult.map(_.getLong(2)).sum === 4)
  }
}
