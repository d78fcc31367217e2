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

  /** Starting-offsets environment variable. `earliest` is only safe
    * on a FRESH checkpoint against a fresh topic; flipping live
    * against an existing production topic with `earliest` replays the
    * whole retention window into the standing query's state. Callers
    * (or operators) set `GRAFT_KAFKA_STARTING_OFFSETS=latest` — or a
    * per-partition offset JSON — for that case. Once a checkpoint
    * exists Spark ignores this option entirely (offsets come from the
    * checkpoint), so it only governs first-run semantics.
    */
  val StartingOffsetsEnv = "GRAFT_KAFKA_STARTING_OFFSETS"

  /** Fail-on-data-loss environment variable (`true`/`false`). Spark's
    * default `true` aborts the query when subscribed offsets have
    * aged out of retention; `false` skips the gap and keeps the
    * standing query alive — the right default differs per pipeline,
    * so it is env-visible rather than hardcoded.
    */
  val FailOnDataLossEnv = "GRAFT_KAFKA_FAIL_ON_DATA_LOSS"

  /** A streaming DataFrame in the Kafka source schema: the real
    * `format("kafka")` subscription when [[live]], otherwise the
    * caller's kafka-shaped seam (lazily evaluated — a live run never
    * builds it). Either way the result carries
    * [[KafkaShaped.schema]]'s columns, so the downstream query —
    * [[KafkaShaped.parseJson]], watermarks, the exactly-once sink —
    * is identical on both paths.
    *
    * `startingOffsets` defaults to `earliest` (fresh-checkpoint
    * semantics) and is overridable per call or via
    * [[StartingOffsetsEnv]]; `failOnDataLoss` follows Spark's default
    * unless set per call or via [[FailOnDataLossEnv]]. Precedence:
    * explicit argument > environment > default.
    */
  def sourceOrSeam(spark: SparkSession, topic: String,
      seam: => DataFrame,
      startingOffsets: Option[String] = None,
      failOnDataLoss: Option[Boolean] = None): DataFrame = live match {
    case Some(bootstrap) =>
      val reader = spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap)
        .option("subscribe", topic)
        .option("startingOffsets", resolvedStartingOffsets(startingOffsets))
      resolvedFailOnDataLoss(failOnDataLoss)
        .fold(reader)(b => reader.option("failOnDataLoss", b.toString))
        .load()
    case None => seam
  }

  /** Offset resolution (explicit > env > `earliest`) — factored out so
    * the precedence is spec-assertable without a live broker.
    */
  def resolvedStartingOffsets(explicit: Option[String]): String =
    explicit
      .orElse(sys.env.get(StartingOffsetsEnv).map(_.trim).filter(_.nonEmpty))
      .getOrElse("earliest")

  /** failOnDataLoss resolution (explicit > env > Spark default, i.e.
    * None = option not set at all).
    */
  def resolvedFailOnDataLoss(explicit: Option[Boolean]): Option[Boolean] =
    explicit.orElse(
      sys.env.get(FailOnDataLossEnv).map(_.trim).filter(_.nonEmpty)
        .map(parseBooleanEnv(FailOnDataLossEnv, _)))

  /** Case-insensitive true/false parse that names the offending env
    * var — `_.toBoolean` on a value like "yes" crashes query startup
    * with a bare `For input string: "yes"` that identifies nothing.
    */
  private[streaming] def parseBooleanEnv(name: String, raw: String): Boolean =
    raw.trim.toLowerCase match {
      case "true"  => true
      case "false" => false
      case other => throw new IllegalArgumentException(
        s"$name must be 'true' or 'false' (case-insensitive), got '$other'")
    }
}
