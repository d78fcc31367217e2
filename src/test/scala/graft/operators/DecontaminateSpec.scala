package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class DecontaminateSpec extends SparkSpec {

  private def df(rows: (Long, String)*) = {
    import spark.implicits._
    rows.toDF("id", "text")
  }

  test("overlap flags exactly the docs sharing an n-gram, with distinct counts") {
    val eval = df(
      (100L, "the quick brown fox jumps over the lazy dog"))
    val train = df(
      // contains "the quick brown" and "quick brown fox" (two shared 3-grams)
      (1L, "prefix the quick brown fox suffix"),
      // repeats a shared 3-gram twice — still counted once (distinct)
      (2L, "x the lazy dog y the lazy dog z"),
      // clean
      (3L, "completely unrelated prose without overlap"))
    val got = Decontaminate.overlap(train, eval, "id", "text", n = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got(1L) === 2L)   // "the quick brown", "quick brown fox"
    assert(got(2L) === 1L)   // "the lazy dog" appears twice, counted once
    assert(!got.contains(3L))
  }

  test("short documents (< n tokens) produce no grams and never flag") {
    val eval = df((100L, "a b c d e"))
    val train = df((1L, "a b"), (2L, "a b c"))
    val got = Decontaminate.overlap(train, eval, "id", "text", n = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(!got.contains(1L))   // 2 tokens < n
    assert(got(2L) === 1L)      // exactly the one gram "a b c"
  }

  test("eval blocklist is broadcast: no shuffle of the training side") {
    val eval = df((100L, "shared passage of benchmark text here"))
    val train = df((1L to 50L).map(i =>
      (i, s"doc $i shared passage of benchmark text here tail $i")): _*)
    val plan = Decontaminate.overlap(train, eval, "id", "text", n = 5)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      "expected broadcast join for the eval gram blocklist:\n" + plan.take(1200))
  }
}
