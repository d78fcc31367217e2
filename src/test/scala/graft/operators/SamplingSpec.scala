package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

class SamplingSpec extends SparkSpec {
  import spark.implicits._

  private def docs(n: Int): DataFrame =
    (0 until n).map(i => (i.toLong, if (i % 3 == 0) "en" else if (i % 3 == 1) "de" else "zh",
      s"src${i % 7}")).toDF("doc_id", "lang", "source")

  test("hashFraction is deterministic, in [0,1), and salt-decorrelated") {
    val d = docs(2000)
    val f0 = d.select(Sampling.hashFraction($"doc_id").as("f")).collect().map(_.getDouble(0))
    val f0b = d.select(Sampling.hashFraction($"doc_id").as("f")).collect().map(_.getDouble(0))
    assert(f0.sameElements(f0b))
    assert(f0.forall(f => f >= 0.0 && f < 1.0))
    // distinct salts give distinct sequences (decorrelation smoke check:
    // agreement below-threshold between salted selections ≈ product of rates)
    val both = d.select(
      (Sampling.hashFraction($"doc_id") < 0.5).as("a"),
      (Sampling.hashFraction($"doc_id", salt = 1) < 0.5).as("b"))
      .collect()
    val overlap = both.count(r => r.getBoolean(0) && r.getBoolean(1)).toDouble / 2000
    assert(math.abs(overlap - 0.25) < 0.05, s"salted selections not independent: $overlap")
  }

  test("stratifiedSample hits per-stratum rates and is layout-stable") {
    val d = docs(3000)
    val picked = Sampling.stratifiedSample(
      d, $"lang", $"doc_id", Map("en" -> 0.5, "zh" -> 0.2), defaultRate = 0.1)
    val byLang = picked.groupBy($"lang").count().as[(String, Long)].collect().toMap
    assert(math.abs(byLang("en") / 1000.0 - 0.5) < 0.06)
    assert(math.abs(byLang("zh") / 1000.0 - 0.2) < 0.06)
    assert(math.abs(byLang("de") / 1000.0 - 0.1) < 0.06)
    // repartitioning must not change the selected set — the property
    // df.sample() lacks
    val again = Sampling.stratifiedSample(
      d.repartition(13), $"lang", $"doc_id", Map("en" -> 0.5, "zh" -> 0.2), 0.1)
    assert(picked.select("doc_id").except(again.select("doc_id")).isEmpty)
    assert(again.select("doc_id").except(picked.select("doc_id")).isEmpty)
  }

  test("assignSplits covers every row exactly once at ~the asked fractions") {
    val d = docs(5000)
    val split = Sampling.assignSplits(
      d, $"doc_id", Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
    assert(split.count() === 5000)
    val byS = split.groupBy($"split").count().as[(String, Long)].collect().toMap
    assert(byS.keySet === Set("train", "val", "test"))
    assert(math.abs(byS("train") / 5000.0 - 0.8) < 0.03)
    assert(math.abs(byS("val") / 5000.0 - 0.1) < 0.02)
    assert(math.abs(byS("test") / 5000.0 - 0.1) < 0.02)
    intercept[IllegalArgumentException] {
      Sampling.assignSplits(d, $"doc_id", Seq("a" -> 0.5, "b" -> 0.3))
    }
  }

  test("groupSample returns exactly k per group; preFilter path is identical") {
    val d = docs(7000)
    val full = Sampling.groupSample(d, Seq($"source"), $"doc_id", k = 10)
    val counts = full.groupBy($"source").count().as[(String, Long)].collect()
    assert(counts.length === 7 && counts.forall(_._2 == 10))
    // 7000/7 = 1000 rows per group; preFilter 0.1 keeps ~100 ≥ 10 per
    // group — result must be the exact same set
    val filtered = Sampling.groupSample(d, Seq($"source"), $"doc_id", k = 10, preFilter = 0.1)
    assert(full.select("doc_id").except(filtered.select("doc_id")).isEmpty)
    assert(filtered.select("doc_id").except(full.select("doc_id")).isEmpty)
  }
}
