package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, Trigger}

/** In-flight observe() audits (operators/InFlightAudit): metrics ride
  * the action's own tasks (no second scan), expectations gate the
  * result, a missing metric is a violation, and the streaming frame
  * surfaces the same metrics per micro-batch on the progress object.
  */
class InFlightAuditSpec extends SparkSpec {
  import spark.implicits._

  private def docs = Seq(
    (1L, "alpha"), (2L, "bravo"), (3L, null.asInstanceOf[String]))
    .toDF("id", "text")

  test("metrics observed during the action; expectations pass") {
    val (_, got) = InFlightAudit.audited(
      docs,
      Seq(
        "n" -> count(lit(1)),
        "n_null_text" -> count(when($"text".isNull, 1)),
        "max_id" -> max($"id")),
      Map("n" -> ((v: Any) => v.asInstanceOf[Long] == 3L)))(
      _.write.mode("overwrite").format("noop").save())
    assert(got("n") === 3L)
    assert(got("n_null_text") === 1L)
    assert(got("max_id") === 3L)
  }

  test("failed expectation throws with the offending metric values") {
    val e = intercept[InFlightAudit.AuditViolation] {
      InFlightAudit.audited(
        docs,
        Seq("n_null_text" -> count(when($"text".isNull, 1))),
        Map("n_null_text" -> ((v: Any) => v.asInstanceOf[Long] == 0L)))(
        _.write.mode("overwrite").format("noop").save())
    }
    assert(e.failed === Map("n_null_text" -> 1L))
    assert(e.getMessage.contains("n_null_text=1"))
  }

  test("a missing metric never silently passes") {
    val e = intercept[InFlightAudit.AuditViolation] {
      InFlightAudit.audited(
        docs,
        Seq("n" -> count(lit(1))),
        Map("typo_name" -> ((_: Any) => true)))(
        _.write.mode("overwrite").format("noop").save())
    }
    assert(e.failed.keySet === Set("typo_name"))
  }

  test("streaming frame reports the same metrics per micro-batch on the progress") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[(Long, String)]
    val instrumented = InFlightAudit.instrument(
      mem.toDF().toDF("id", "text"), "audit",
      "n" -> count(lit(1)),
      "n_null_text" -> count(when($"text".isNull, 1)))
    val q = instrumented.writeStream.format("noop")
      .outputMode(OutputMode.Append).trigger(Trigger.ProcessingTime(0)).start()
    try {
      mem.addData((1L, "a"), (2L, null.asInstanceOf[String]))
      q.processAllAvailable()
      val metrics = q.recentProgress.flatMap(p =>
        Option(p.observedMetrics.get("audit"))).lastOption
      assert(metrics.isDefined, "no observed metrics on the streaming progress")
      assert(metrics.get.getAs[Long]("n") === 2L)
      assert(metrics.get.getAs[Long]("n_null_text") === 1L)
    } finally q.stop()
  }

  test("one-action contract: an action that runs no job over the " +
    "instrumented frame raises a clear error instead of blocking forever") {
    import scala.concurrent.duration._
    val df = spark.range(5).toDF("id")
    val e = intercept[IllegalStateException] {
      InFlightAudit.audited(df, Seq("n" -> count(lit(1))),
        metricTimeout = 2.seconds)(
        // violates the contract: returns a plan, triggers no job
        _.filter($"id" > 1))
    }
    assert(e.getMessage.contains("one-action contract"))
  }
}
