package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class DsirSpec extends SparkSpec {
  import spark.implicits._

  // Two distinguishable "domains": target-flavored docs reuse a small
  // vocabulary of target words; raw-only docs use a disjoint one.
  private def corpus() = {
    val target = (0 until 40).map(i =>
      (i.toLong, s"alpha beta gamma delta alpha beta w$i", "en"))
    val other = (0 until 40).map(i =>
      (100L + i, s"zebra yak xylo walrus zebra yak u$i", "de"))
    (target ++ other).toDF("doc_id", "text", "lang")
  }

  private def lut(df: org.apache.spark.sql.DataFrame) =
    Dsir.quantizedLogRatios(Dsir.bucketCounts(df, "text", col("lang") === "en"))

  test("LUT has fixed size and integer micro-nat entries") {
    val q = lut(corpus())
    assert(q.length === Dsir.Buckets)
    // unseen buckets carry the smoothing-only ratio ln(nr+B/2 over nt+B/2)-ish,
    // a single shared value — LUT is total, no lookup can miss
    assert(q.distinct.length >= 2)
  }

  test("scores separate target-flavored docs from raw-only docs") {
    val docs = corpus()
    val scored = Dsir.scoreDocs(docs, "text", lut(docs))
    val avg = scored.groupBy($"lang").agg(expr("avg(qlogw)").as("a"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(avg("en") > avg("de") + Dsir.Quantum.toDouble,
      s"expected ≥1 nat separation, got $avg")
  }

  test("resampling enriches the target domain above the corpus base rate") {
    val docs = corpus()
    val picked = Dsir.gumbelTopK(
      Dsir.scoreDocs(docs, "text", lut(docs)), $"doc_id", k = 20, salt = 7L)
    val enFrac = picked.filter($"lang" === "en").count().toDouble / 20
    assert(enFrac > 0.5, s"corpus is 50% en; resample should enrich, got $enFrac")
  }

  test("deterministic under repartitioning") {
    val docs = corpus()
    val q = lut(docs)
    def run(df: org.apache.spark.sql.DataFrame) =
      Dsir.gumbelTopK(Dsir.scoreDocs(df, "text", q), $"doc_id", 15, 7L)
        .select($"doc_id", $"qlogw", $"pri").orderBy($"doc_id").collect().toSeq
    assert(run(docs) === run(docs.repartition(7, $"lang")))
    // and the LUT itself is layout-independent (integer monoid counts)
    assert(q.toSeq === lut(docs.repartition(11)).toSeq)
  }

  test("short and empty docs score zero and survive the pipeline") {
    val docs = Seq(
      (1L, "solo", "en"), (2L, "", "en"), (3L, null.asInstanceOf[String], "de"),
      (4L, "two words", "de")).toDF("doc_id", "text", "lang")
    val scored = Dsir.scoreDocs(docs, "text", lut(corpus()))
      .select($"doc_id", $"n_bigrams", $"qlogw").orderBy($"doc_id").collect()
    assert(scored(0).getLong(1) === 0L && scored(0).getLong(2) === 0L)
    assert(scored(1).getLong(1) === 0L && scored(1).getLong(2) === 0L)
    assert(scored(2).getLong(1) === 0L && scored(2).getLong(2) === 0L)
    assert(scored(3).getLong(1) === 1L)
  }
}
