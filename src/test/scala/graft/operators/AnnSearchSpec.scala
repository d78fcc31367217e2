package graft.operators

import scala.util.Random

import graft.SparkSpec
import graft.pipeline.VectorSearch

class AnnSearchSpec extends SparkSpec {

  private def clustered(n: Int, dim: Int, seed: Int): Seq[(Long, Array[Float])] = {
    val r = new Random(seed)
    val centers = Array.fill(8)(Array.fill(dim)(r.nextGaussian()))
    (0 until n).map { i =>
      val c = centers(i % 8)
      (i.toLong, c.map(x => (x + 0.15 * r.nextGaussian()).toFloat))
    }
  }

  test("ANN with multiprobe: high recall vs brute force, scans a fraction of rows") {
    import spark.implicits._
    val dim = 32
    val vecs = clustered(2000, dim, seed = 7)
    val df = vecs.toDF("vec_id", "embedding")
    val lsh = AnnSearch.HyperplaneLsh(dim, nBits = 10, seed = 1)
    val index = AnnSearch.buildIndex(spark, df, "vec_id", "embedding", lsh).persist()

    // queries from the SAME distribution as the index (same centers,
    // fresh noise) — off-manifold queries legitimately miss LSH buckets
    val queries = clustered(30, dim, seed = 7).map(_._2)
    var recallSum = 0.0
    var candFrac = 0.0
    for (q <- queries) {
      val ann = AnnSearch.search(index, "vec_id", "embedding", q, 10, lsh, nProbe = 12)
        .select("vec_id").as[Long].collect().toSet
      val exact = VectorSearch.topK(df, "embedding", "vec_id", q.map(_.toDouble).toSeq, 10)
        .select("vec_id").as[Long].collect().toSet
      recallSum += ann.intersect(exact).size / 10.0
      val probes = lsh.probeBuckets(q, 12)
      candFrac += index.filter($"bucket".isin(probes: _*)).count().toDouble / 2000
    }
    val recall = recallSum / queries.size
    val frac = candFrac / queries.size
    assert(recall >= 0.8, s"recall@10 = $recall")
    assert(frac < 0.5, s"candidate fraction = $frac")
  }

  test("RademacherLsh: recall holds with the SQL-replayable planes") {
    // The q156 oracle proves cross-engine equality; this pins that the
    // replayable family is also a USEFUL index — popcount-parity ±1
    // planes, not just any deterministic signs (an LCG-parity rule
    // measured 52/64 inter-plane correlation and was rejected).
    import spark.implicits._
    val dim = 32
    val vecs = clustered(2000, dim, seed = 7)
    val df = vecs.toDF("vec_id", "embedding")
    val lsh = AnnSearch.RademacherLsh(dim, nBits = 10)
    val index = AnnSearch.buildIndex(spark, df, "vec_id", "embedding", lsh).persist()
    val queries = clustered(30, dim, seed = 7).map(_._2)
    var recallSum = 0.0
    var candFrac = 0.0
    for (q <- queries) {
      val ann = AnnSearch.search(index, "vec_id", "embedding", q, 10, lsh, nProbe = 12)
        .select("vec_id").as[Long].collect().toSet
      val exact = VectorSearch.topK(df, "embedding", "vec_id", q.map(_.toDouble).toSeq, 10)
        .select("vec_id").as[Long].collect().toSet
      recallSum += ann.intersect(exact).size / 10.0
      val probes = lsh.probeBuckets(q, 12)
      candFrac += index.filter($"bucket".isin(probes: _*)).count().toDouble / 2000
    }
    index.unpersist()
    val recall = recallSum / queries.size
    val frac = candFrac / queries.size
    assert(recall >= 0.8, s"recall@10 = $recall")
    assert(frac < 0.5, s"candidate fraction = $frac")
  }

  test("lshJoin: high recall vs brute-force pairs, exact cosines, no duplicates") {
    import spark.implicits._
    val dim = 32
    val vecs = clustered(600, dim, seed = 11)
    val df = vecs.toDF("vec_id", "embedding")
    val lsh = AnnSearch.HyperplaneLsh(dim, nBits = 10, seed = 2)
    val approx = AnnSearch.lshJoin(spark, df, "vec_id", "embedding", lsh,
        threshold = 0.9, nFlip = 6)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap

    // brute force ground truth via the blocked cosine join with a
    // single constant block (all pairs)
    val exact = graft.operators.Dedup.cosinePairs(
        df.withColumn("blk", org.apache.spark.sql.functions.lit(1)),
        "vec_id", "embedding", "blk", 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap

    assert(exact.nonEmpty)
    val recall = approx.keySet.intersect(exact.keySet).size.toDouble / exact.size
    assert(recall >= 0.8, s"pair recall = $recall (${approx.size} vs ${exact.size})")
    assert(approx.keySet.subsetOf(exact.keySet))          // no false positives
    approx.foreach { case (k, c) => assert(c === exact(k)) }  // exact cosines
    assert(approx.keys.toSeq.distinct.size === approx.size)   // deduplicated
  }

  test("bandJoin: equals brute-force pairs at 15×2-bit bands; blocking respected") {
    import spark.implicits._
    import org.apache.spark.sql.functions.lit
    val dim = 32
    val df = clustered(600, dim, seed = 11).toDF("vec_id", "embedding")
    val lsh = AnnSearch.HyperplaneLsh(dim, nBits = 30, seed = 2)
    val got = AnnSearch.bandJoin(spark, df, "vec_id", "embedding", lsh,
        bands = 15, threshold = 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap

    val exact = Dedup.cosinePairs(df.withColumn("blk", lit(1)),
        "vec_id", "embedding", "blk", 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap

    // miss prob per pair ≤ (1 − 0.8565²)^15 ≈ 2e-9 at cos 0.9 —
    // equality, not a recall bound
    assert(exact.nonEmpty)
    assert(got === exact)

    // blocking column folds into the bucket key: only same-block pairs
    val blocked = df.withColumn("parity", $"vec_id" % 2)
    val gotB = AnnSearch.bandJoin(spark, blocked, "vec_id", "embedding", lsh,
        bands = 15, threshold = 0.9, blockCol = Some("parity"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(gotB === exact.keySet.filter { case (a, b) => a % 2 == b % 2 })
  }

  test("persisted index: probe filter prunes partitions at the source") {
    import org.apache.spark.sql.functions.{col, input_file_name}
    import spark.implicits._
    val dim = 16
    val df = clustered(800, dim, seed = 13).toDF("vec_id", "embedding")
    val lsh = AnnSearch.HyperplaneLsh(dim, nBits = 4, seed = 3)
    val path = java.nio.file.Files.createTempDirectory("graft-lsh-idx").toString + "/idx"

    val index = AnnSearch.persistedIndex(spark, df, "vec_id", "embedding", lsh, path)
    // second call reuses the artifact (same _SUCCESS; no rebuild)
    val again = AnnSearch.persistedIndex(spark, df, "vec_id", "embedding", lsh, path)
    assert(again.count() === index.count())

    val q = clustered(1, dim, seed = 13).head._2
    val res = AnnSearch.search(index, "vec_id", "embedding", q, 5, lsh, nProbe = 3)
    // the probe predicate reaches the scan as a partition filter
    val plan = res.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters:") && plan.contains("bucket"),
      plan.take(800))
    // physically, only files under probed bucket= directories are read
    val probes = lsh.probeBuckets(q, 3).toSet
    val files = index.filter(col("bucket").isin(probes.toSeq: _*))
      .select(input_file_name()).distinct().as[String].collect()
    assert(files.nonEmpty)
    assert(files.forall(f => probes.exists(p => f.contains(s"bucket=$p/"))),
      files.mkString("\n"))

    // identical results to the in-memory index
    val mem = AnnSearch.search(
      AnnSearch.buildIndex(spark, df, "vec_id", "embedding", lsh),
      "vec_id", "embedding", q, 5, lsh, nProbe = 3)
    assert(res.collect().toSeq === mem.collect().toSeq)
  }

  test("bucket determinism and probe ordering") {
    val lsh = AnnSearch.HyperplaneLsh(16, nBits = 8, seed = 5)
    val v = Array.fill(16)(0.3f)
    assert(lsh.bucket(v) === lsh.bucket(v.clone()))
    val probes = lsh.probeBuckets(v, 5)
    assert(probes.head === lsh.bucket(v))
    assert(probes.distinct.size === probes.size)
    assert(probes.size === 5)
  }
}
