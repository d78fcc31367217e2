package graft.tools

import org.apache.spark.sql.SparkSession

/** Long-tail-vocabulary probe corpus (r14 verdict #5): the driver
  * fixture's documents table has a ~31-word vocabulary, so its
  * exact-Jaccard TRUE-PAIR count is enormous (4.76M pairs at sf0.1,
  * t=0.7) and every pair-producing probe on it is OUTPUT-bound —
  * the selective regime the prefix filter exists for never gets
  * exercised. This generator synthesizes a `documents.parquet` with
  * a Zipf(1.1) vocabulary over 30k words (the web-corpus shape:
  * a few hot words, a long rare tail) where near-duplicate pairs are
  * PLANTED — every 10th document is its predecessor with ~8% of
  * token positions resampled — so true pairs are ~nDocs/10, linear
  * in corpus size, and candidate explosion shows up as wall-clock
  * superlinearity instead of being masked by output volume.
  *
  * The ×K corpus is `shards` disjoint replicas (tokens suffixed
  * `~shard` for shard > 0, the [[ScaleUp]] discipline): cross-shard
  * Jaccard is exactly 0, so pairs scale exactly ×K. Languages are
  * assigned per DECADE of documents so a planted pair always shares
  * its `lang` block. Everything derives from splitmix64 of
  * (doc, position) — deterministic, partitioning-independent.
  */
object LongTailCorpus {

  /** splitmix64 finalizer — cheap deterministic per-key randomness. */
  private def mix(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }
  private def uniform(seed: Long): Double =
    (mix(seed) >>> 11) * (1.0 / (1L << 53))

  val VocabSize = 30000
  val ZipfExponent = 1.1

  def build(spark: SparkSession, out: String, nDocs: Long, shards: Int): Unit = {
    import spark.implicits._
    // cumulative Zipf CDF over ranks (driver-side: 30k doubles)
    val cum = new Array[Double](VocabSize)
    var acc = 0.0
    var i = 0
    while (i < VocabSize) {
      acc += 1.0 / math.pow(i + 1.0, ZipfExponent)
      cum(i) = acc
      i += 1
    }
    val total = acc
    val cumB = spark.sparkContext.broadcast(cum)
    spark.range(nDocs * shards).repartition(
        spark.sparkContext.defaultParallelism)
      .mapPartitions { it =>
        val c = cumB.value
        def word(u: Double): String = {
          val x = u * total
          var lo = 0; var hi = VocabSize - 1
          while (lo < hi) {
            val mid = (lo + hi) >>> 1
            if (c(mid) < x) lo = mid + 1 else hi = mid
          }
          s"w$lo"
        }
        def baseToks(local: Long, shard: Long): IndexedSeq[String] = {
          val n = 30 + java.lang.Math.floorMod(
            mix(local * 7919L + shard * 104729L), 51L).toInt
          (0 until n).map(p =>
            word(uniform(local * 1000003L + p * 17L + shard * 31L)))
        }
        it.map { gid =>
          val shard = gid / nDocs
          val local = gid % nDocs
          val toks0: IndexedSeq[String] =
            if (local % 10 == 9 && local > 0) {
              // planted near-dup of the previous doc: ~8% of token
              // positions resampled → distinct-token Jaccard ~0.85
              baseToks(local - 1, shard).zipWithIndex.map { case (t, p) =>
                if (uniform(gid * 131L + p * 7L) < 0.08)
                  word(uniform(gid * 1009L + p * 13L))
                else t
              }
            } else baseToks(local, shard)
          val toks = if (shard == 0L) toks0 else toks0.map(_ + s"~$shard")
          val text = toks.mkString(" ")
          val lang = Seq("en", "fr", "de", "zh")(
            java.lang.Math.floorMod(mix(local / 10 + shard * 7L), 4L).toInt)
          (gid, text, lang, s"lt$shard", text.length.toLong)
        }
      }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$out/documents.parquet")
    System.err.println(
      s"[longtail] $out: ${nDocs * shards} docs, $shards shard(s)")
  }
}
