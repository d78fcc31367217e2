package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class VocabSpec extends SparkSpec {

  private def docs = {
    import spark.implicits._
    Seq(
      (1L, "the cat sat on the mat"),
      (2L, "the dog sat"),
      (3L, "zebra xylophone")).toDF("id", "text")
  }

  test("build: ids rank by frequency, ties by token text") {
    val v = Vocab.build(docs, "text", maxSize = 4)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // freq: the=3, sat=2, then cat/dog/mat/on/xylophone/zebra all 1 (tie → text order)
    assert(v("the") === 1L)
    assert(v("sat") === 2L)
    assert(v("cat") === 3L)
    assert(v("dog") === 4L)
    assert(v.size === 4)
  }

  test("encode: position order preserved, OOV to id 0") {
    import spark.implicits._
    val v = Vocab.build(docs, "text", maxSize = 4)
    val enc = Vocab.encode(docs, "id", "text", v)
      .collect().map(r => r.getLong(0) ->
        ((r.getSeq[Long](1), r.getLong(2), r.getLong(3)))).toMap
    // doc 1: the cat sat on the mat → 1, 3, 2, 0, 1, 0
    assert(enc(1L) === ((Seq(1L, 3L, 2L, 0L, 1L, 0L), 6L, 2L)))
    // doc 3: all OOV
    assert(enc(3L) === ((Seq(0L, 0L), 2L, 2L)))
  }

  test("encode joins the vocab by broadcast — corpus side stays narrow") {
    val v = Vocab.build(docs, "text", maxSize = 4)
    val plan = Vocab.encode(docs, "id", "text", v)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      "vocab lookup should broadcast:\n" + plan.take(1000))
  }
}
