package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Runtime probe for a REAL Kafka channel — the tesseract-probe
  * pattern applied to [[KafkaShaped]]'s seam: if this environment
  * ever grows the `spark-sql-kafka` connector jar AND a reachable
  * broker, the engine lights up `format("kafka")` without a code
  * round; until then every query runs against the kafka-shaped seam
  * (MemoryStream in specs, any DataFrame with [[KafkaShaped.schema]]
  * in production).
  *
  * The two preconditions are probed independently so a failure is
  * attributable:
  *  - [[connectorPresent]] — is `KafkaSourceProvider` on the
  *    classpath (the connector jar ships the kafka-clients it needs);
  *  - [[broker]] — does `GRAFT_KAFKA_BOOTSTRAP` name a bootstrap
  *    server list (the standard `host:port[,host:port…]` form).
  *
  * [[sourceOrSeam]] makes the "one-line swap" the seam scaladoc
  * promises LITERAL: callers write their query against the returned
  * DataFrame and the dispatch — real connector vs seam — is decided
  * by the environment, exactly like
  * [[graft.pipeline.OcrRuntime.bestPartitioner]].
  */
object KafkaRuntime {

  /** Bootstrap-servers environment variable (standard
    * `host:port[,host:port…]` value).
    */
  val BrokerEnv = "GRAFT_KAFKA_BOOTSTRAP"

  /** Whether the Kafka connector is loadable. Probed by class name —
    * `DataSource.lookupDataSource` would throw a user-facing error
    * with install instructions when absent, which is noise here; the
    * provider class IS the connector.
    */
  lazy val connectorPresent: Boolean =
    try {
      Class.forName("org.apache.spark.sql.kafka010.KafkaSourceProvider")
      true
    } catch { case _: Throwable => false }

  def broker: Option[String] =
    sys.env.get(BrokerEnv).map(_.trim).filter(_.nonEmpty)

  /** Some(bootstrap) when BOTH the connector jar and a broker are
    * available — the live path.
    */
  def live: Option[String] = if (connectorPresent) broker else None

  /** A streaming DataFrame in the Kafka source schema: the real
    * `format("kafka")` subscription when [[live]], otherwise the
    * caller's kafka-shaped seam (lazily evaluated — a live run never
    * builds it). Either way the result carries
    * [[KafkaShaped.schema]]'s columns, so the downstream query —
    * [[KafkaShaped.parseJson]], watermarks, the exactly-once sink —
    * is identical on both paths.
    */
  def sourceOrSeam(spark: SparkSession, topic: String,
      seam: => DataFrame): DataFrame = live match {
    case Some(bootstrap) =>
      spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap)
        .option("subscribe", topic)
        .option("startingOffsets", "earliest")
        .load()
    case None => seam
  }
}
