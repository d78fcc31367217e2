package graft.operators

import graft.SparkSpec

class PqSearchSpec extends SparkSpec {

  private def exactTopK(
      vecs: Seq[(Long, Array[Float])], q: Array[Float], k: Int): Seq[Long] =
    vecs.map { case (id, v) =>
      var d = 0.0; var i = 0
      while (i < v.length) { val x = v(i).toDouble - q(i); d += x * x; i += 1 }
      (id, d)
    }.sortBy { case (id, d) => (d, id) }.take(k).map(_._1)

  test("lossless regime: ≤k distinct sub-vectors per block → ADC equals exact L2") {
    import spark.implicits._
    // 12 distinct vectors repeated — every block sees ≤12 ≤ k=16
    // distinct sub-vectors, so Lloyd is stationary at the exact
    // values, encoding is lossless, and ADC distances are exact
    val base = (0 until 12).map { p =>
      (0 until 64).map(i => (math.sin(p * 64 + i) * 2).toFloat).toArray
    }
    val vecs = (0L until 120L).map(id => (id, base((id % 12).toInt)))
    val df = vecs.toDF("vec_id", "embedding")
    val model = PqSearch.train(spark, df, "embedding", m = 8, k = 16,
      iterations = 3, seed = 7L)
    val enc = PqSearch.encode(spark, df, "vec_id", "embedding", model)
    val q = (0 until 64).map(i => (math.cos(i) * 2).toFloat).toArray
    val got = PqSearch.search(enc, "vec_id", q, k = 10, model)
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    assert(got.map(_._1).toSeq === exactTopK(vecs, q, 10))
    // distances match to the Lloyd quantization grain (lloydStep
    // accumulates centroid sums as 2^-20-quantized integers, so a
    // stationary centroid sits within ~1e-6 of the exact value, not
    // bit-on-it), not just the ranking
    val byId = vecs.toMap
    got.foreach { case (id, d2) =>
      val v = byId(id)
      var d = 0.0; var i = 0
      while (i < 64) { val x = v(i).toDouble - q(i); d += x * x; i += 1 }
      assert(math.abs(d - d2) < 1e-5, s"id=$id adc=$d2 exact=$d")
    }
  }

  test("clustered corpus: recall@10 ≥ 0.7 at 32× compression") {
    import spark.implicits._
    // 40 tight clusters in 64-dim: the regime PQ is built for
    val rnd = new scala.util.Random(3)
    val centers = (0 until 40).map(_ => Array.fill(64)(rnd.nextFloat() * 4 - 2))
    val vecs = (0L until 500L).map { id =>
      val c = centers((id % 40).toInt)
      (id, c.map(x => x + (rnd.nextFloat() - 0.5f) * 0.1f))
    }
    val df = vecs.toDF("vec_id", "embedding")
    val model = PqSearch.train(spark, df, "embedding", m = 8, k = 16,
      iterations = 5, seed = 11L)
    val enc = PqSearch.encode(spark, df, "vec_id", "embedding", model)
    val q = centers(17).map(x => x + 0.02f)
    val got = PqSearch.search(enc, "vec_id", q, k = 10, model)
      .collect().map(_.getLong(0)).toSet
    val want = exactTopK(vecs, q, 10).toSet
    val recall = got.intersect(want).size / 10.0
    assert(recall >= 0.7, s"recall=$recall got=$got want=$want")
  }

  test("deterministic training; codes shaped (m, [0,k))") {
    import spark.implicits._
    val df = graft.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val m1 = PqSearch.train(spark, df, "embedding", m = 8, k = 16, iterations = 3)
    val m2 = PqSearch.train(spark, df.repartition(7), "embedding", m = 8, k = 16,
      iterations = 3)
    assert(m1.codebooks.map(_.map(_.toSeq).toSeq).toSeq ===
      m2.codebooks.map(_.map(_.toSeq).toSeq).toSeq) // layout-invariant
    val codes = PqSearch.encode(spark, df, "vec_id", "embedding", m1)
      .select("codes").as[Array[Int]].collect()
    assert(codes.forall(c => c.length == 8 && c.forall(x => x >= 0 && x < 16)))
  }

  test("IVF-PQ composition: cell pruning + ADC keeps recall while scanning a fraction") {
    import spark.implicits._
    val rnd = new scala.util.Random(9)
    val centers = (0 until 40).map(_ => Array.fill(64)(rnd.nextFloat() * 4 - 2))
    val vecs = (0L until 800L).map { id =>
      val c = centers((id % 40).toInt)
      (id, c.map(x => x + (rnd.nextFloat() - 0.5f) * 0.1f))
    }
    val df = vecs.toDF("vec_id", "embedding")
    val pq = PqSearch.train(spark, df, "embedding", m = 8, k = 16,
      iterations = 5, seed = 21L)
    // one coarse cell per true cluster — fewer cells than clusters
    // forces multi-cluster centroids and the probe ranking degrades
    // (the IvfSearchSpec trade-off); 40 cells ≙ the corpus structure
    val ivf = IvfSearch.train(spark, df, "embedding", k = 40, iterations = 5)
    val enc = PqSearch.encodeWithCells(spark, df, "vec_id", "embedding", pq, ivf)
      .persist()
    val q = centers(23).map(x => x + 0.02f)
    // PQ resolution limit: every member of a tight cluster quantizes
    // to the SAME codes, so ADC can rank clusters, not members — the
    // honest recall target is the whole home cluster (= exact top-20)
    val got20 = PqSearch.searchIvfPq(enc, "vec_id", q, k = 20, pq, ivf, nProbe = 4)
      .collect().map(_.getLong(0)).toSet
    val want20 = exactTopK(vecs, q, 20).toSet
    assert(got20.intersect(want20).size / 20.0 >= 0.7,
      s"cluster recall=${got20.intersect(want20).size / 20.0}")
    // member-level ranking comes from the standard exact-rerank tier:
    // ADC shortlist (3k..5k) re-scored against the raw vectors
    val shortlist = PqSearch.searchIvfPq(enc, "vec_id", q, k = 50, pq, ivf, nProbe = 4)
      .collect().map(_.getLong(0)).toSet
    val reranked = exactTopK(vecs.filter(v => shortlist(v._1)), q, 10).toSet
    val want10 = exactTopK(vecs, q, 10).toSet
    assert(reranked.intersect(want10).size / 10.0 >= 0.9,
      s"reranked recall=${reranked.intersect(want10).size / 10.0}")
    // the probe really prunes: ≤ nProbe of 40 cells scanned
    val probed = ivf.rankedCells(q).take(4).toSet
    val scanned = enc.filter($"cell".isin(probed.toSeq: _*)).count()
    assert(scanned < 800 * 0.3, s"scanned=$scanned of 800")
    enc.unpersist()
  }

  test("search plan: TakeOrderedAndProject over the code scan, never a global sort") {
    import spark.implicits._
    val df = graft.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val model = PqSearch.train(spark, df, "embedding", m = 8, k = 16, iterations = 2)
    val enc = PqSearch.encode(spark, df, "vec_id", "embedding", model)
    val out = PqSearch.search(enc, "vec_id", new Array[Float](64), k = 5, model)
    out.count()
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), plan.take(600))
  }
}
