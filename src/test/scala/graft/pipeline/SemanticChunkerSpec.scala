package graft.pipeline

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SemanticChunkerSpec extends SparkSpec {
  import spark.implicits._

  // Two topics with disjoint vocabularies, 80 tokens each → at
  // width=20: 4 topic-A segments, then 4 topic-B segments. The drift
  // boundary falls exactly at segment 4.
  private val topicA = Seq.fill(20)("spark shuffle partition join").mkString(" ")
  private val topicB = Seq.fill(20)("violin sonata allegro tempo").mkString(" ")

  private def docs() = Seq(
    (1L, s"$topicA $topicB"),
    (2L, topicA)
  ).toDF("doc_id", "text")

  test("segments: fixed token windows, ordinal-stamped, empty doc survives") {
    val segs = SemanticChunker.segments(docs(), "doc_id", "text", width = 20)
      .orderBy($"doc_id", $"seg_id").collect()
    assert(segs.count(_.getLong(0) == 1L) === 8)
    assert(segs.count(_.getLong(0) == 2L) === 4)
    val empty = SemanticChunker.segments(
      Seq((9L, "")).toDF("doc_id", "text"), "doc_id", "text", 20).collect()
    assert(empty.length === 1 && empty.head.getInt(1) === 0)
  }

  test("topic drift opens a chunk boundary; homogeneous doc stays one chunk") {
    val out = SemanticChunker.chunk(spark, docs(), "doc_id", "text", width = 20)
      .orderBy($"doc_id", $"chunk_id").collect()
    val d1 = out.filter(_.getLong(0) == 1L)
    assert(d1.length === 2, s"expected 2 chunks for the shifted doc, got ${d1.length}")
    assert(d1.map(_.getLong(2)).toSeq === Seq(4L, 4L)) // 4 segments each side
    assert(d1(0).getString(3).contains("spark") && !d1(0).getString(3).contains("violin"))
    assert(d1(1).getString(3).contains("violin") && !d1(1).getString(3).contains("spark"))
    val d2 = out.filter(_.getLong(0) == 2L)
    assert(d2.length === 1, "homogeneous doc must not split")
  }

  test("reassembly: chunks concatenated in order reproduce the token stream") {
    val out = SemanticChunker.chunk(spark, docs(), "doc_id", "text", width = 20)
    val rebuilt = out.orderBy($"doc_id", $"chunk_id")
      .groupBy($"doc_id")
      .agg(concat_ws(" ", collect_list($"chunk_text")).as("t"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    // collect_list order after orderBy is stable here because the
    // grouped frame is tiny; the operator itself orders within chunks
    val orig = docs().collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    for ((id, t) <- orig)
      assert(rebuilt(id).split("\\s+").toSeq === t.split("\\s+").toSeq,
        s"doc $id token stream must survive chunking")
  }

  test("layout-independent: identical chunks after repartition") {
    def run(df: org.apache.spark.sql.DataFrame) =
      SemanticChunker.chunk(spark, df, "doc_id", "text", width = 20)
        .orderBy($"doc_id", $"chunk_id")
        .select($"doc_id", $"chunk_id", $"n_segments", $"chunk_text")
        .collect().toSeq
    assert(run(docs()) === run(docs().repartition(7)))
  }
}
