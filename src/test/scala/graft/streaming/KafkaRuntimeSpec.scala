package graft.streaming

import java.nio.file.Files
import java.sql.Timestamp

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.types._

/** The Kafka runtime probe (streaming/KafkaRuntime): both branches
  * asserted, whichever one this environment takes — the
  * OcrRuntimeSpec discipline. On the seam branch, [[sourceOrSeam]]
  * must return the caller's kafka-shaped stream and that stream must
  * carry the exact connector schema (so a future live flip changes
  * nothing downstream). On the live branch, the real
  * `format("kafka")` subscription must carry the same schema and the
  * full parse + exactly-once-sink contract must hold end-to-end
  * against the broker (producer driven reflectively — the connector
  * jar ships the kafka-clients classes, so no compile-time
  * dependency).
  */
class KafkaRuntimeSpec extends SparkSpec {

  private val valueSchema = StructType(Seq(
    StructField("id", LongType), StructField("qty", IntegerType)))

  test("probe never throws and names its active path") {
    val present = KafkaRuntime.connectorPresent
    val broker = KafkaRuntime.broker
    assert(KafkaRuntime.live.isDefined === (present && broker.isDefined))
    info(s"connector jar: ${if (present) "present" else "absent"}; " +
      s"broker (${KafkaRuntime.BrokerEnv}): ${broker.getOrElse("unset")} -> " +
      s"active path: ${if (KafkaRuntime.live.isDefined) "LIVE format(\"kafka\")" else "seam"}")
  }

  test("sourceOrSeam dispatches per the probe and the schema is the connector's either way") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    KafkaRuntime.live match {
      case None =>
        val mem = MemoryStream[KafkaRec]
        val seam = KafkaShaped.fromRecords(mem.toDF())
        val src = KafkaRuntime.sourceOrSeam(spark, "orders", seam)
        assert(src eq seam, "seam branch must return the caller's stream unchanged")
        assert(src.schema.map(f => (f.name, f.dataType)) ===
          KafkaShaped.schema.map(f => (f.name, f.dataType)))
      case Some(_) =>
        val src = KafkaRuntime.sourceOrSeam(spark, "graft-probe-schema",
          sys.error("live branch must not build the seam"))
        assert(src.isStreaming)
        assert(src.schema.map(f => (f.name, f.dataType)) ===
          KafkaShaped.schema.map(f => (f.name, f.dataType)))
    }
  }

  test("offset and data-loss options resolve explicit > env > default " +
    "(the first live flip must not silently replay the retention window)") {
    // the sandbox has no GRAFT_KAFKA_* env, so env-layer = unset here;
    // explicit beats default, default is earliest (fresh-checkpoint
    // semantics), and failOnDataLoss defaults to Spark's own (unset)
    assume(sys.env.get(KafkaRuntime.StartingOffsetsEnv).isEmpty &&
      sys.env.get(KafkaRuntime.FailOnDataLossEnv).isEmpty)
    assert(KafkaRuntime.resolvedStartingOffsets(None) === "earliest")
    assert(KafkaRuntime.resolvedStartingOffsets(Some("latest")) === "latest")
    assert(KafkaRuntime.resolvedFailOnDataLoss(None) === None)
    assert(KafkaRuntime.resolvedFailOnDataLoss(Some(false)) === Some(false))
  }

  test("boolean env parse is case-insensitive and names the variable on garbage") {
    // `_.toBoolean` on "yes" crashed query startup with a bare
    // 'For input string: "yes"' that identified nothing (r14 ADVICE)
    assert(KafkaRuntime.parseBooleanEnv(KafkaRuntime.FailOnDataLossEnv, "TRUE"))
    assert(!KafkaRuntime.parseBooleanEnv(KafkaRuntime.FailOnDataLossEnv, " False "))
    val ex = intercept[IllegalArgumentException] {
      KafkaRuntime.parseBooleanEnv(KafkaRuntime.FailOnDataLossEnv, "yes")
    }
    assert(ex.getMessage.contains(KafkaRuntime.FailOnDataLossEnv))
    assert(ex.getMessage.contains("yes"))
  }

  test("the downstream contract runs green on the active path") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val dir = Files.createTempDirectory("graft-kafka-rt").toString
    KafkaRuntime.live match {
      case None =>
        // seam branch: the identical query KafkaShapedSpec pins,
        // routed through sourceOrSeam — proves the dispatch point
        // composes with parseJson + the exactly-once sink
        val mem = MemoryStream[KafkaRec]
        val src = KafkaRuntime.sourceOrSeam(spark, "orders",
          KafkaShaped.fromRecords(mem.toDF()))
        val q = KafkaShaped.exactlyOnceSink(
          KafkaShaped.parseJson(src, valueSchema), s"$dir/sink", s"$dir/ckpt")
        try {
          mem.addData(
            KafkaRec("k1", """{"id":1,"qty":2}""", "orders", 0, 0L,
              Timestamp.valueOf("2026-01-01 00:00:00")),
            KafkaRec("k1", """{"id":1,"qty":2}""", "orders", 0, 0L,
              Timestamp.valueOf("2026-01-01 00:00:00")),
            KafkaRec("k2", """{"id":2,"qty":3}""", "orders", 0, 1L,
              Timestamp.valueOf("2026-01-01 00:00:01")))
          q.processAllAvailable()
        } finally q.stop()
        val sunk = spark.read.parquet(s"$dir/sink")
        assert(sunk.count() === 2L)
      case Some(bootstrap) =>
        // live branch: produce three records (one id duplicated by a
        // simulated producer retry is impossible to force offsets for,
        // so exactly-once is asserted on distinct broker offsets) and
        // read them back through the real connector
        val topic = s"graft-probe-${System.currentTimeMillis()}"
        produce(bootstrap, topic, Seq(
          """{"id":1,"qty":2}""", """{"id":2,"qty":3}""", """{"id":3,"qty":4}"""))
        val src = KafkaRuntime.sourceOrSeam(spark, topic,
          sys.error("live branch must not build the seam"))
        val q = KafkaShaped.exactlyOnceSink(
          KafkaShaped.parseJson(src, valueSchema), s"$dir/sink", s"$dir/ckpt")
        try q.processAllAvailable() finally q.stop()
        val sunk = spark.read.parquet(s"$dir/sink")
        assert(sunk.count() === 3L)
        assert(sunk.select("id").collect().map(_.getLong(0)).sorted.toSeq ===
          Seq(1L, 2L, 3L))
    }
  }

  /** Reflective KafkaProducer — compiles without kafka-clients on the
    * classpath; only ever called on the live branch, where the
    * connector jar provides these classes.
    */
  private def produce(bootstrap: String, topic: String, values: Seq[String]): Unit = {
    val props = new java.util.Properties()
    props.put("bootstrap.servers", bootstrap)
    props.put("key.serializer", "org.apache.kafka.common.serialization.StringSerializer")
    props.put("value.serializer", "org.apache.kafka.common.serialization.StringSerializer")
    val producerCls = Class.forName("org.apache.kafka.clients.producer.KafkaProducer")
    val recordCls = Class.forName("org.apache.kafka.clients.producer.ProducerRecord")
    val producer = producerCls.getConstructor(classOf[java.util.Properties])
      .newInstance(props)
    try {
      val send = producerCls.getMethod("send", recordCls)
      values.foreach { v =>
        val rec = recordCls
          .getConstructor(classOf[String], classOf[Object], classOf[Object])
          .newInstance(topic, null, v)
        send.invoke(producer, rec.asInstanceOf[Object])
      }
      producerCls.getMethod("flush").invoke(producer)
    } finally producerCls.getMethod("close").invoke(producer)
  }
}
