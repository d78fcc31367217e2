package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Observation}

/** In-flight data-quality audit — `Dataset.observe` metrics riding
  * the job itself: row counts, null counts, domain violations are
  * aggregated by the SAME tasks that execute the query, so the audit
  * costs ZERO extra scans (compare [[Expectations]], which is the
  * right tool for a standalone k-row report but pays its own pass).
  * At 100 TB "count what you just wrote" as a second job doubles the
  * read; observed metrics make the write self-reporting — the
  * DLT-expectations shape on plain open-source Spark.
  *
  * Batch: [[audited]] wraps an action (usually the sink write) and
  * returns the action's result with the observed metric row, throwing
  * [[AuditViolation]] when an expectation fails — the write-then-gate
  * pattern (the write has happened; the gate stops the PROMOTION
  * step, which is why sinks that need all-or-nothing pair this with
  * the staging-directory convention used by Compact/ZOrder).
  *
  * Streaming: `observe` composes with streaming frames out of the
  * box — per-micro-batch metric rows surface on
  * `StreamingQueryProgress.observedMetrics` (spec-pinned), giving the
  * always-on channel the same self-reporting without a listener of
  * ours.
  */
object InFlightAudit {

  final case class AuditViolation(failed: Map[String, Any])
    extends RuntimeException(
      s"in-flight audit failed: ${failed.map { case (k, v) => s"$k=$v" }.mkString(", ")}")

  /** Attach named aggregate metrics to `df` under observation `name` —
    * the STREAMING-safe variant (an [[Observation]] handle rejects
    * streaming frames because each micro-batch produces its own
    * metric row; the per-batch rows surface on
    * `StreamingQueryProgress.observedMetrics(name)` instead). Also
    * valid on batch frames when the caller reads metrics through a
    * QueryExecutionListener of its own. At least one metric is
    * required by the observe contract.
    */
  def instrument(df: DataFrame, name: String,
      metrics: (String, Column)*): DataFrame = {
    require(metrics.nonEmpty, "at least one metric")
    val named = metrics.map { case (n, c) => c.as(n) }
    df.observe(name, named.head, named.tail: _*)
  }

  /** Batch variant over an [[Observation]] handle (blocks on `get`
    * until the action's job completes).
    */
  def instrument(df: DataFrame, obs: Observation,
      metrics: (String, Column)*): DataFrame = {
    require(metrics.nonEmpty, "at least one metric")
    val named = metrics.map { case (n, c) => c.as(n) }
    df.observe(obs, named.head, named.tail: _*)
  }

  /** Run `action` over the instrumented frame, then evaluate
    * `expectations` against the observed metrics. Returns (action
    * result, metric map); throws [[AuditViolation]] with every failed
    * metric when any expectation is false. The metric map holds
    * whatever the aggregate produced (Long for counts, etc.).
    *
    * ONE-ACTION CONTRACT: `action` must trigger exactly one Spark job
    * over the frame it is GIVEN (a write, count, collect — not a plan
    * transformation, and not an action over some other DataFrame).
    * If it triggers none, there is no metric row — rather than block
    * forever on `Observation.get`, this raises a clear error naming
    * the contract after `metricTimeout`. If it triggers several jobs
    * over the instrumented frame, Spark's Observation records the
    * FIRST job's metrics and only that job is gated.
    */
  def audited[T](
      df: DataFrame,
      metrics: Seq[(String, Column)],
      expectations: Map[String, Any => Boolean] = Map.empty,
      metricTimeout: scala.concurrent.duration.Duration =
        scala.concurrent.duration.Duration(5, "min"))(
      action: DataFrame => T): (T, Map[String, Any]) = {
    val obs = new Observation()
    val out = action(instrument(df, obs, metrics: _*))
    // the action has RETURNED, so its jobs are done: any wait here is
    // listener-delivery latency, not computation — a timeout means the
    // action never ran a job over the instrumented frame
    val row =
      try scala.concurrent.Await.result(obs.future, metricTimeout)
      catch {
        case _: java.util.concurrent.TimeoutException =>
          throw new IllegalStateException(
            "InFlightAudit.audited: no observed metrics after " +
              s"$metricTimeout — the action must trigger exactly one job " +
              "over the DataFrame it is given (one-action contract)")
      }
    val got: Map[String, Any] =
      row.schema.fieldNames.zip(row.toSeq).toMap
    val failed = expectations.flatMap { case (k, pred) =>
      val v = got.get(k)
      // a missing metric is itself a violation — never silently pass
      if (v.exists(pred)) None else Some(k -> v.getOrElse("<absent>"))
    }
    if (failed.nonEmpty) throw AuditViolation(failed)
    (out, got)
  }
}
