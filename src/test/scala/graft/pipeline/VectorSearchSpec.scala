package graft.pipeline

import graft.SparkSpec
import org.apache.spark.sql.functions._

class VectorSearchSpec extends SparkSpec {

  test("cosineSim: exact values on known vectors") {
    import spark.implicits._
    val df = Seq(
      (1L, Seq(1.0f, 0.0f), Seq(1.0f, 0.0f)),   // identical → 1
      (2L, Seq(1.0f, 0.0f), Seq(0.0f, 1.0f)),   // orthogonal → 0
      (3L, Seq(1.0f, 1.0f), Seq(-1.0f, -1.0f))  // opposite → -1
    ).toDF("id", "a", "b")
    val out = df.select($"id", VectorSearch.cosineSim($"a", $"b").as("sim"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(math.abs(out(1L) - 1.0) < 1e-12)
    assert(math.abs(out(2L)) < 1e-12)
    assert(math.abs(out(3L) + 1.0) < 1e-12)
  }

  test("topK: returns k best, ties broken by id, matches full sort prefix") {
    import spark.implicits._
    val vecs = (0 until 50).map { i =>
      (i.toLong, Seq(math.cos(i * 0.1).toFloat, math.sin(i * 0.1).toFloat))
    }.toDF("vec_id", "embedding")
    val q = Seq(1.0, 0.0)
    val top = VectorSearch.topK(vecs, "embedding", "vec_id", q, 5)
      .select("vec_id").as[Long].collect()
    val full = vecs.withColumn("sim", VectorSearch.cosineSim($"embedding", VectorSearch.vecLit(q)))
      .orderBy($"sim".desc, $"vec_id").select("vec_id").as[Long].collect()
    assert(top.toSeq === full.take(5).toSeq)
    assert(top.head === 0L)  // cos(0) aligned with query
  }

  test("searchText: query embedded with index embedder; self-retrieval ranks first") {
    import spark.implicits._
    val e = HashingEmbedder(dim = 64)
    val texts = Seq(
      (1L, "spark sql join optimizer catalyst engine"),
      (2L, "tennis racket string tension guide"),
      (3L, "gardening tips for winter tomato plants"))
    val chunks = spark.createDataset(texts.map { case (id, t) => Chunk(id, 0, s"${id}_0", t) })
    val index = Inference.embedChunks(chunks, e).toDF()
    val top = VectorSearch.searchText(index, "embedding", "chunk_id",
      "spark sql join optimizer catalyst engine", e, k = 1)
      .select("doc_id").as[Long].collect()
    assert(top.toSeq === Seq(1L))
  }
}
