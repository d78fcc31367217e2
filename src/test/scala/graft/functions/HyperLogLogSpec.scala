package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class HyperLogLogSpec extends SparkSpec {
  import spark.implicits._

  test("rho: leading-zero rank of the 22-bit word") {
    assert(HyperLogLog.rho(0L) === 23)
    assert(HyperLogLog.rho(1L) === 22)
    assert(HyperLogLog.rho((1L << 21)) === 1)
    assert(HyperLogLog.rho((1L << 21) | 5L) === 1)
    assert(HyperLogLog.rho(2L) === 21)
  }

  test("estimate within theoretical error on 10k distinct keys") {
    val n = 10000
    val df = (0 until n).map(_.toLong).toDF("k")
    val est = df.agg(HyperLogLog.sketch($"k").as("regs"))
      .select(HyperLogLog.estimate($"regs")).head().getDouble(0)
    // 3σ bound at 1.04/√1024 ≈ 3.25% per σ
    assert(math.abs(est - n) / n < 0.10, s"estimate $est vs exact $n")
  }

  test("partitioning invariance: registers are a commutative idempotent monoid") {
    val keys = (0 until 5000).map(i => (i % 1000).toLong) // dups: idempotence
    def regs(parts: Int): Seq[Int] =
      keys.toDF("k").repartition(parts)
        .agg(HyperLogLog.sketch($"k").as("r"))
        .head().getSeq[Int](0)
    val r1 = regs(1)
    assert(r1 === regs(7))
    // duplicate-insensitive: distinct input yields identical registers
    val rd = keys.distinct.toDF("k").agg(HyperLogLog.sketch($"k").as("r"))
      .head().getSeq[Int](0)
    assert(r1 === rd)
  }

  test("null keys are skipped") {
    val df = Seq[java.lang.Long](1L, 2L, null, 3L, null).toDF("k")
    val withNulls = df.agg(HyperLogLog.sketch($"k").as("r")).head().getSeq[Int](0)
    val without = Seq(1L, 2L, 3L).toDF("k")
      .agg(HyperLogLog.sketch($"k").as("r")).head().getSeq[Int](0)
    assert(withNulls === without)
  }

  test("small-range correction engages and is sane at tiny cardinality") {
    val df = (0 until 30).map(_.toLong).toDF("k")
    val est = df.agg(HyperLogLog.sketch($"k").as("regs"))
      .select(HyperLogLog.estimate($"regs")).head().getDouble(0)
    assert(est > 20 && est < 40, s"linear-counting estimate $est for n=30")
  }

  test("scalar, Column, and SQL hash forms agree bit for bit") {
    val ids = Seq(0L, 1L, 42L, 999999L, -17L)
    val fromCol = ids.toDF("id")
      .select(graft.operators.Sampling.hashBits($"id").as("h"))
      .orderBy($"h").collect().map(_.getLong(0)).sorted
    val fromScalar = ids.map(graft.operators.Sampling.hashBitsScalar(_)).sorted
    assert(fromCol.toSeq === fromScalar)
  }
}
