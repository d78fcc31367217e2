package graft.streaming

import java.nio.file.Files
import java.sql.Timestamp

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.types._

/** The kafka-shaped connector seam (streaming/KafkaShaped): source
  * schema pinned to the real connector's, consumer-side JSON
  * projection, and the exactly-once offset-keyed sink contract under
  * at-least-once replay — all over MemoryStream, so the semantics are
  * checked jar-free and `format("kafka")` is a one-line swap.
  */
case class KafkaRec(key: String, value: String, topic: String,
    partition: Int, offset: Long, timestamp: Timestamp)

class KafkaShapedSpec extends SparkSpec {

  private def rec(p: Int, o: Long, id: Long, qty: Int): KafkaRec =
    KafkaRec(s"k$id", s"""{"id":$id,"qty":$qty}""", "orders", p, o,
      Timestamp.valueOf(s"2026-01-01 00:00:0${o % 10}"))

  private val valueSchema = StructType(Seq(
    StructField("id", LongType), StructField("qty", IntegerType)))

  test("fromRecords pins the exact Kafka source schema") {
    import spark.implicits._
    val df = KafkaShaped.fromRecords(Seq(rec(0, 0L, 1L, 2)).toDF())
    // names + types pinned; nullability is the producer's property
    // (case-class primitives arrive non-null) and the connector's
    // fields are all nullable
    assert(df.schema.map(f => (f.name, f.dataType)) ===
      KafkaShaped.schema.map(f => (f.name, f.dataType)))
    // value survives the binary round-trip
    val row = df.head
    assert(new String(row.getAs[Array[Byte]]("value"), "UTF-8").contains("\"id\":1"))
  }

  test("parseJson: bytes -> string -> columns, bookkeeping kept") {
    import spark.implicits._
    val parsed = KafkaShaped.parseJson(
      KafkaShaped.fromRecords(Seq(rec(3, 7L, 42L, 5)).toDF()), valueSchema)
    val r = parsed.head
    assert(parsed.columns.toSeq ===
      Seq("topic", "partition", "offset", "timestamp", "id", "qty"))
    assert((r.getAs[Int]("partition"), r.getAs[Long]("offset"),
      r.getAs[Long]("id"), r.getAs[Int]("qty")) === ((3, 7L, 42L, 5)))
  }

  test("exactly-once sink under at-least-once replay and in-batch duplicates") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val dir = Files.createTempDirectory("graft-kafka").toString
    val mem = MemoryStream[KafkaRec]
    val parsed = KafkaShaped.parseJson(
      KafkaShaped.fromRecords(mem.toDF()), valueSchema)
    val q = KafkaShaped.exactlyOnceSink(parsed, s"$dir/sink", s"$dir/ckpt")
    try {
      // batch 1: three records, one duplicated INSIDE the batch
      mem.addData(rec(0, 0L, 1L, 1), rec(0, 1L, 2L, 2), rec(0, 1L, 2L, 2), rec(1, 0L, 3L, 3))
      q.processAllAvailable()
      // batch 2: at-least-once replay of (0,1) and (1,0) plus one new offset
      mem.addData(rec(0, 1L, 2L, 2), rec(1, 0L, 3L, 3), rec(1, 1L, 4L, 4))
      q.processAllAvailable()
    } finally q.stop()

    val sunk = spark.read.parquet(s"$dir/sink")
    assert(sunk.count() === 4L)                       // offsets (0,0) (0,1) (1,0) (1,1)
    assert(sunk.select("topic", "partition", "offset").distinct().count() === 4L)
    val ids = sunk.select("id").collect().map(_.getLong(0)).sorted.toSeq
    assert(ids === Seq(1L, 2L, 3L, 4L))
  }

  test("offset replay after a cold restart stays exactly-once (new query, same sink)") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val dir = Files.createTempDirectory("graft-kafka2").toString
    def run(records: Seq[KafkaRec]): Unit = {
      val mem = MemoryStream[KafkaRec]
      val q = KafkaShaped.exactlyOnceSink(
        KafkaShaped.parseJson(KafkaShaped.fromRecords(mem.toDF()), valueSchema),
        s"$dir/sink", Files.createTempDirectory("ck").toString)
      try { mem.addData(records: _*); q.processAllAvailable() } finally q.stop()
    }
    // first run persists offsets 0..2; a restarted consumer without its
    // checkpoint re-reads from the last committed offset — replaying 1..2
    run(Seq(rec(0, 0L, 1L, 1), rec(0, 1L, 2L, 2), rec(0, 2L, 3L, 3)))
    run(Seq(rec(0, 1L, 2L, 2), rec(0, 2L, 3L, 3), rec(0, 3L, 4L, 4)))
    val sunk = spark.read.parquet(s"$dir/sink")
    assert(sunk.count() === 4L)
    assert(sunk.select("offset").collect().map(_.getLong(0)).sorted.toSeq ===
      Seq(0L, 1L, 2L, 3L))
  }
}
