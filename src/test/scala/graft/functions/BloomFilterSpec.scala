package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins the three properties that make [[BloomFilter]] safe as a
  * runtime join filter at any scale:
  *  - NO false negatives (a pruned row is definitely a non-match);
  *  - false-positive rate within the textbook bound (pruning
  *    actually prunes — a saturated filter would be silently useless);
  *  - the OR-monoid merge is partition-layout invariant (the merged
  *    bit set is byte-identical however rows were split), the same
  *    contract CountMinSketchSpec pins for its counters.
  */
class BloomFilterSpec extends SparkSpec {

  import spark.implicits._

  private val keys: Seq[Long] = (0L until 5000L).map(i => i * 7919L + 13L)

  test("no false negatives: every inserted key probes true") {
    val words = spark.createDataset(keys).toDF("k")
      .agg(BloomFilter.sketch(col("k"))).as[Array[Long]].head()
    assert(keys.forall(k => BloomFilter.mightContain(words, k)))
  }

  test("false-positive rate on disjoint probes is within the bound") {
    val words = spark.createDataset(keys).toDF("k")
      .agg(BloomFilter.sketch(col("k"))).as[Array[Long]].head()
    // disjoint probe set (the build keys are ≡ 13 mod 7919)
    val probes = (0L until 20000L).map(i => i * 7919L + 14L)
    val fp = probes.count(k => BloomFilter.mightContain(words, k))
    // (1 − e^(−kn/m))^k for n=5000, m=2^20, k=5 ≈ 4.6e-9; allow slack
    // up to 1e-3 — the assertion is "pruning works", not the exact rate
    assert(fp.toDouble / probes.size < 1e-3, s"fp=$fp of ${probes.size}")
  }

  test("merge is partition-layout invariant (OR-monoid)") {
    val one = spark.createDataset(keys).repartition(1).toDF("k")
      .agg(BloomFilter.sketch(col("k"))).as[Array[Long]].head()
    val many = spark.createDataset(keys).repartition(13).toDF("k")
      .agg(BloomFilter.sketch(col("k"))).as[Array[Long]].head()
    assert(java.util.Arrays.equals(one, many))
  }

  test("codegen and interpreted probes agree (expression column path)") {
    val bloom = spark.createDataset(keys).toDF("k")
      .agg(BloomFilter.sketch(col("k")).as("bf"))
    val mixed = spark.createDataset(keys.take(100) ++ Seq(999999999L, -42L))
      .toDF("k")
    val got = mixed.join(broadcast(bloom))
      .select(col("k"), BloomFilter.mightContainCol(col("bf"), col("k")).as("hit"))
      .as[(Long, Boolean)].collect().toMap
    val words = bloom.select(col("bf")).as[Array[Long]].head()
    assert(got.forall { case (k, hit) => hit == BloomFilter.mightContain(words, k) })
    assert(keys.take(100).forall(got(_)))
  }

  test("NULL keys are skipped, matching SQL aggregate semantics") {
    // a null input must not plant key-0 bits: the filter over
    // (nulls ++ keys) is byte-identical to the filter over keys alone
    val withNulls = (keys.map(Option(_)) ++ Seq(None, None)).toDF("k")
      .agg(BloomFilter.sketch(col("k"))).as[Array[Long]].head()
    val without = spark.createDataset(keys).toDF("k")
      .agg(BloomFilter.sketch(col("k"))).as[Array[Long]].head()
    assert(java.util.Arrays.equals(withNulls, without))
  }

  test("numWords sizes the filter; probe reads m off the array length") {
    for (words <- Seq(256, 65536)) {
      val bloom = spark.createDataset(keys).toDF("k")
        .agg(BloomFilter.sketch(col("k"), numWords = words).as("bf"))
      val arr = bloom.select(col("bf")).as[Array[Long]].head()
      assert(arr.length === words)
      assert(keys.forall(k => BloomFilter.mightContain(arr, k)))
      // codegen column path agrees at the non-default size
      val hits = spark.createDataset(keys.take(50)).toDF("k")
        .join(broadcast(bloom))
        .select(BloomFilter.mightContainCol(col("bf"), col("k")))
        .as[Boolean].collect()
      assert(hits.forall(identity))
    }
    intercept[IllegalArgumentException] { BloomFilter.sketch(col("k"), 1000) }
    // > 2^26 words would truncate bit indices past Int — rejected,
    // never a silent FP degradation
    intercept[IllegalArgumentException] { BloomFilter.sketch(col("k"), 1 << 27) }
  }

  test("q122 pruning drops most non-matching fact rows before the join") {
    val dimKeys = (0L until 500L).map(_ * 3L)
    val factKeys = (0L until 50000L)
    val bloom = spark.createDataset(dimKeys).toDF("k")
      .agg(BloomFilter.sketch(col("k")).as("bf"))
    val kept = spark.createDataset(factKeys).toDF("k")
      .join(broadcast(bloom))
      .filter(BloomFilter.mightContainCol(col("bf"), col("k")))
      .count()
    val dimSet = dimKeys.toSet
    val trueMatches = factKeys.count(dimSet)
    assert(kept >= trueMatches)            // no false negatives
    assert(kept < factKeys.size / 10,      // ≥90% of the fact side pruned
      s"kept=$kept of ${factKeys.size}")
  }

  test("q122 plan: the probe filter sits under the sort-merge join") {
    val df = graft.SparkEntry.queries("q122_bloom_prune_join")(
      spark, "/root/testdata/sf0.001")
    df.count()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("might_contain"), plan.take(1200))
    assert(plan.contains("SortMergeJoin"), plan.take(1200))
  }
}
