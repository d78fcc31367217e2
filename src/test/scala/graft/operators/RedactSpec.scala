package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class RedactSpec extends SparkSpec {

  private val planted = Seq(
    (1L, "contact alice.smith+spam@example.co.uk or visit https://ex.org/a?b=1 today"),
    (2L, "server at 192.168.0.1 answered, call +1 (415) 555-0123 now"),
    (3L, "perfectly clean prose with no identifiers at all"),
    (4L, null: String))

  test("scrub masks every planted pattern, leaves clean text alone") {
    import spark.implicits._
    val out = planted.toDF("id", "text")
      .select($"id", Redact.scrub($"text").as("t"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out(1L) === "contact <EMAIL> or visit <URL> today")
    assert(out(2L) === "server at <IP> answered, call <PHONE> now")
    assert(out(3L) === "perfectly clean prose with no identifiers at all")
    assert(out(4L) === null)
  }

  test("counts: per-pattern audit signal") {
    import spark.implicits._
    val c = planted.toDF("id", "text")
      .select($"id", Redact.counts($"text").as("c"))
      .select($"id", $"c.n_url", $"c.n_email", $"c.n_ipv4", $"c.n_phone")
      .collect().map(r => r.getLong(0) -> (r.getInt(1), r.getInt(2), r.getInt(3), r.getInt(4)))
      .toMap
    assert(c(1L) === ((1, 1, 0, 0)))
    assert(c(2L) === ((0, 0, 1, 1)))
    assert(c(3L) === ((0, 0, 0, 0)))
    assert(c(4L) === ((0, 0, 0, 0)))   // null text → zero counts, not nulls
  }

  test("fixture corpus is a true negative: no false positives on real docs") {
    import spark.implicits._
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001")
    val total = docs.select(Redact.counts($"text").as("c"))
      .select(($"c.n_url" + $"c.n_email" + $"c.n_ipv4" + $"c.n_phone").as("n"))
      .agg(sum($"n")).head.getLong(0)
    assert(total === 0L)
  }
}
