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

  test("PolyHashingEmbedder: integer coordinates, deterministic, sign/bucket rule") {
    // the q157 replay contract: raw signed feature counts (exactly
    // representable floats — cross-engine cosine over them rounds
    // only at the final divide), derived from the shared PolyHash
    val pe = PolyHashingEmbedder(dim = 64)
    val v = pe.embedOne("spark join performance tuning spark join")
    assert(v.toSeq === pe.embedOne("spark join performance tuning spark join").toSeq)
    v.foreach(x => assert(x == math.rint(x), s"non-integer coordinate $x"))
    assert(v.map(math.abs).sum > 0, "non-empty text must produce features")
    // coordinate j accumulates exactly the features with h mod 64 == j,
    // signed by popcount parity of h >>> 6 — replayed here feature by
    // feature, the same derivation the DuckDB oracle runs
    val toks = "spark join performance tuning spark join".split(" ")
    val feats = toks.toSeq ++ toks.sliding(2).map(_.mkString(" "))
    val expect = new Array[Float](64)
    feats.foreach { f =>
      val h = graft.functions.PolyHash.featureHash(f)
      val s = if ((java.lang.Long.bitCount(h >>> 6) & 1) == 0) 1.0f else -1.0f
      expect((h % 64).toInt) += s
    }
    assert(v.toSeq === expect.toSeq)
    assert(pe.embedOne("").toSeq === Seq.fill(64)(0.0f))
    assert(pe.embedOne(null).toSeq === Seq.fill(64)(0.0f))
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
