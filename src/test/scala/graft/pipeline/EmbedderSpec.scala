package graft.pipeline

import graft.SparkSpec

class EmbedderSpec extends SparkSpec {

  private val e = HashingEmbedder(dim = 64, seed = 42)

  test("deterministic: same text, same vector; seeded") {
    val a = e.embedOne("spark join performance tuning")
    val b = e.embedOne("spark join performance tuning")
    assert(a.toSeq === b.toSeq)
    val other = HashingEmbedder(dim = 64, seed = 7).embedOne("spark join performance tuning")
    assert(a.toSeq !== other.toSeq)
  }

  test("unit norm for non-empty text; zeros for empty/null") {
    val v = e.embedOne("some words to hash")
    val norm = math.sqrt(v.map(x => x.toDouble * x).sum)
    assert(math.abs(norm - 1.0) < 1e-5)
    assert(e.embedOne("").toSeq === Seq.fill(64)(0.0f))
    assert(e.embedOne(null).toSeq === Seq.fill(64)(0.0f))
  }

  test("different texts diverge; word order matters (bigrams)") {
    val a = e.embedOne("alpha beta gamma")
    val b = e.embedOne("gamma beta alpha")
    assert(a.toSeq !== b.toSeq)
  }

  test("batched inference equals per-row inference across batch boundaries") {
    import spark.implicits._
    val chunks = (1 to 307).map(i => Chunk(i.toLong, 0, s"${i}_0", s"chunk text number $i"))
    val ds = spark.createDataset(chunks).repartition(3)
    val out = Inference.embedChunks(ds, e, batchSize = 150).collect()
    assert(out.length === 307)
    val byId = out.map(c => c.chunk_id -> c.embedding).toMap
    chunks.foreach { c =>
      assert(byId(c.chunk_id).toSeq === e.embedOne(c.chunk).toSeq, c.chunk_id)
    }
  }
}
