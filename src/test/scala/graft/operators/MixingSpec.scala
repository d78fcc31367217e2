package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class MixingSpec extends SparkSpec {

  test("sampleStrata keeps deterministic id slices per stratum") {
    import spark.implicits._
    // ids 0..999 in each of two strata → realized counts are exact
    val docs = (0L until 1000L).flatMap(i => Seq((i, "a"), (i + 1000L, "b")))
      .toDF("id", "s")
    // stratum b's ids are 1000..1999 → same mod-1000 residues 0..999
    val kept = Mixing.sampleStrata(docs, "id", "s", Map("a" -> 0.3, "b" -> 0.8))
      .groupBy($"s").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(kept("a") === 300L)
    assert(kept("b") === 800L)
  }

  test("rates that are inexact doubles round to the intended cutoff") {
    import spark.implicits._
    // 0.29 * 1000 = 289.999... in IEEE double; truncation would keep 289
    val docs = (0L until 1000L).map(i => (i, "s")).toDF("id", "s")
    val kept = Mixing.sampleStrata(docs, "id", "s", Map("s" -> 0.29)).count()
    assert(kept === 290L)
  }

  test("strata absent from the recipe are dropped; rate 1.0 keeps all") {
    import spark.implicits._
    val docs = (0L until 100L).map(i => (i, if (i < 50) "keep" else "unknown"))
      .toDF("id", "s")
    val kept = Mixing.sampleStrata(docs, "id", "s", Map("keep" -> 1.0))
    assert(kept.count() === 50L)
    assert(kept.filter($"s" === "unknown").count() === 0L)
  }

  test("determinism: identical selection run-over-run, no shuffle in the plan") {
    import spark.implicits._
    val docs = (0L until 500L).map(i => (i, if (i % 3 == 0) "x" else "y")).toDF("id", "s")
    val a = Mixing.sampleStrata(docs, "id", "s", Map("x" -> 0.5, "y" -> 0.2))
    val ids1 = a.select($"id").collect().map(_.getLong(0)).toSet
    val ids2 = Mixing.sampleStrata(docs, "id", "s", Map("x" -> 0.5, "y" -> 0.2))
      .select($"id").collect().map(_.getLong(0)).toSet
    assert(ids1 === ids2)
    assert(!a.queryExecution.executedPlan.toString.contains("Exchange"),
      "mixing must be a scan-level filter, not a shuffle")
  }

  test("temperature weights: τ=1 reproduces shares, τ<1 lifts the tail, alloc ≈ epoch") {
    import spark.implicits._
    val docs = ((0 until 900).map(i => (i.toLong, "big")) ++
      (0 until 100).map(i => (1000L + i, "small"))).toDF("id", "s")
    def w(tau: Double) = Mixing.temperatureWeights(docs, "s", tau, 10000L)
      .collect().map(r => r.getString(0) -> r).toMap
    val t1 = w(1.0)
    assert(t1("big").getDouble(3) === 0.9 && t1("small").getDouble(3) === 0.1)
    val t5 = w(0.5)
    assert(t5("small").getDouble(3) > 0.1, "τ<1 must upweight the tail stratum")
    assert(t5("big").getDouble(3) < 0.9)
    val allocSum = t5.values.map(_.getLong(4)).sum
    assert(math.abs(allocSum - 10000L) <= t5.size, // ±1 rounding per stratum
      s"allocations should sum to ~epochSize, got $allocSum")
  }
}
