package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sampling / splitting — the reproducibility layer of a
  * training-data pipeline. `df.sample()` is seeded per-partition, so
  * its output changes whenever partitioning changes (repartition, AQE,
  * file split size) — useless for a train/test split that must be
  * stable across reruns AND recomputable by any other engine auditing
  * the corpus. Everything here instead derives selection from a pure
  * arithmetic hash of a stable row id: same row in → same decision
  * out, on any cluster layout, in any engine (the DuckDB oracles run
  * the identical arithmetic).
  *
  * The hash is a 32-bit multiplicative (Weyl) scheme chosen for
  * portability, not cryptography: every step stays below 2^63 so it
  * evaluates overflow-free in engines that trap on BIGINT overflow
  * (DuckDB) and in Java's wrapping arithmetic alike. Selection
  * quality: for any id set, `a*id mod 2^32` with odd `a` is a
  * bijection on the low 32 bits, and thresholding it hits rate r with
  * the Weyl equidistribution guarantee — no clumping on sequential
  * ids (which `id % 100 < r*100` would clump badly).
  *
  * Scale shape: `stratifiedSample` / `assignSplits` are pure
  * per-row projections — no shuffle, filter pushes to the scan,
  * trivially parallel at 100 TB. `groupSample` (exact k-per-group)
  * needs one shuffle on the group key; for k ≪ group size pass
  * `preFilter` to cut the shuffled volume first (exact as long as
  * every group keeps ≥ k survivors — see the method doc).
  */
object Sampling {

  private val M31 = 2147483648L    // 2^31 — pre-reduction keeps products < 2^63
  private val A   = 2654435761L    // Knuth's 32-bit golden-ratio multiplier
  private val A2  = 1779033703L    // 2nd-round odd multiplier; (2^32)·A2 < 2^63
  private val C   = 40503L
  private val M32 = 4294967296L    // 2^32

  /** 2^-33 — the fraction floor every ln(hashFraction) consumer uses
    * so a hash value of 0 can't produce ln(0). ONE copy (the r4
    * constant discipline): [[weightedSample]], [[prioritySql]], and
    * Dsir's Gumbel noise must all floor at the same value or Spark
    * and the oracle diverge on hash-0 ids.
    */
  val FracFloor = 1.16415321826934814e-10

  /** Deterministic uniform-[0,1) fraction of a non-negative integral
    * id. `salt` decorrelates independent decisions on the same id
    * (sample-then-split must not reuse one hash: the split would be
    * conditioned on the sample). Decorrelation requires NONLINEARITY:
    * any purely affine salting (add/multiply mod 2^32) merely rotates
    * the same sequence, so two thresholded selections stay almost
    * perfectly correlated (measured: 0.5 joint rate for two 0.5-rate
    * selections instead of the independent 0.25). The xor-shift
    * between the two multiplicative rounds is the standard 32-bit
    * finisher fix. Every intermediate stays below 2^63: overflow-free
    * both in Java's wrapping arithmetic and in engines that trap on
    * BIGINT overflow (DuckDB). The fraction is h/2^32 with h < 2^32 —
    * exactly representable in double, so engines agree bit-for-bit.
    */
  def hashFraction(id: Column, salt: Long = 0L): Column =
    hashBits(id, salt).cast("double") / M32

  /** The raw 32-bit hash value in [0, 2^32) behind [[hashFraction]] —
    * exposed for consumers that need BITS rather than a fraction (the
    * HyperLogLog register split). One arithmetic, three surfaces:
    * this Column form, [[hashBitsScalar]] (executor-side typed code),
    * and [[hashBitsSql]] (DuckDB oracle) must move together.
    */
  def hashBits(id: Column, salt: Long = 0L): Column = {
    // salt bound keeps (M31 + salt·7919)·A < 2^63 — the overflow-free
    // guarantee the scaladoc makes; abs() makes negative ids (signed
    // fingerprints) hash into [0,1) instead of yielding a NEGATIVE
    // "fraction" that every `f < rate` filter would accept (±id
    // collide — acceptable for sampling, documented)
    require(salt >= 0 && salt <= 100000L, s"salt must be in [0, 100000], got $salt")
    val h1 = ((abs(id % M31) + salt * 7919L) * A + C) % M32
    val h2 = h1.bitwiseXOR(shiftright(h1, 16))
    val h3 = (h2 * A2) % M32
    h3.bitwiseXOR(shiftright(h3, 16))
  }

  /** Scalar twin of [[hashBits]] for typed executor-side code (the
    * HyperLogLog Aggregator) — every intermediate < 2^63, so plain
    * wrapping Long arithmetic is exact, bit-identical to the Column
    * and SQL forms. Values are positive (< 2^32), so `>>` ≡ `>>>`.
    */
  def hashBitsScalar(id: Long, salt: Long = 0L): Long = {
    require(salt >= 0 && salt <= 100000L, s"salt must be in [0, 100000], got $salt")
    val h1 = ((math.abs(id % M31) + salt * 7919L) * A + C) % M32
    val h2 = h1 ^ (h1 >> 16)
    val h3 = (h2 * A2) % M32
    h3 ^ (h3 >> 16)
  }

  /** SQL text of the identical arithmetic, for DuckDB oracle queries.
    * The sub-expression duplication (each xor names its input twice)
    * is fine: the oracle is machine-generated text, and DuckDB CSE's
    * the repeated subtrees.
    */
  def hashFractionSql(idExpr: String, salt: Long = 0L): String =
    s"CAST(${hashBitsSql(idExpr, salt)} AS DOUBLE) / $M32"

  /** SQL text of [[hashBits]] (the raw 32-bit value), for oracles that
    * consume hash BITS (HyperLogLog).
    */
  def hashBitsSql(idExpr: String, salt: Long = 0L): String = {
    require(salt >= 0 && salt <= 100000L, s"salt must be in [0, 100000], got $salt")
    val h1 = s"((abs($idExpr % $M31) + ${salt * 7919L}) * $A + $C) % $M32"
    val h2 = s"xor($h1, ($h1) >> 16)"
    val h3 = s"(($h2) * $A2) % $M32"
    s"xor($h3, ($h3) >> 16)"
  }

  /** Per-stratum Bernoulli sampling at stratum-specific rates: keeps a
    * row iff hashFraction(id, salt) < rate(stratum). One scan, no
    * shuffle; the comparison is a pushable filter.
    */
  def stratifiedSample(
      df: DataFrame,
      stratum: Column,
      id: Column,
      rates: Map[String, Double],
      defaultRate: Double,
      salt: Long = 0L): DataFrame = {
    val rate = rates.foldLeft(lit(defaultRate)) { case (acc, (k, r)) =>
      when(stratum === k, lit(r)).otherwise(acc)
    }
    df.filter(hashFraction(id, salt) < rate)
  }

  /** Adds a `split` column assigning each row to exactly one named
    * split by cumulative fraction thresholds — e.g.
    * `Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)`. Fractions
    * must sum to 1 (the last split absorbs rounding). Pure projection.
    */
  def assignSplits(
      df: DataFrame,
      id: Column,
      splits: Seq[(String, Double)],
      salt: Long = 0L): DataFrame = {
    require(splits.nonEmpty, "assignSplits needs at least one split")
    require(math.abs(splits.map(_._2).sum - 1.0) < 1e-9,
      s"split fractions must sum to 1, got ${splits.map(_._2).sum}")
    val f = hashFraction(id, salt)
    val cums = splits.scanLeft(0.0)(_ + _._2).tail
    // last split is the unconditional otherwise — absorbs float rounding
    val expr0 = splits.init.zip(cums.init).foldRight(lit(splits.last._1)) {
      case (((name, _), cum), acc) => when(f < cum, lit(name)).otherwise(acc)
    }
    df.withColumn("split", expr0)
  }

  /** Exact uniform k-per-group sample without replacement: rank rows
    * within each group by their hash fraction (ties broken by id — the
    * hash is a bijection so ties are only possible across salts) and
    * keep the first k. One shuffle on `groups`.
    *
    * `preFilter` < 1.0 drops rows with fraction ≥ preFilter BEFORE the
    * shuffle — the result is identical as long as every group retains
    * at least k survivors (survivor count per group is Binomial(n,
    * preFilter); pick preFilter ≥ (k + 6·sqrt(k)) / n_min for a
    * comfortably negligible failure probability). At 100 TB this is
    * the difference between shuffling the corpus and shuffling ~k/
    * preFilter rows per group.
    */
  def groupSample(
      df: DataFrame,
      groups: Seq[Column],
      id: Column,
      k: Int,
      salt: Long = 0L,
      preFilter: Double = 1.0): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val f = hashFraction(id, salt)
    val base = if (preFilter < 1.0) df.filter(f < preFilter) else df
    val w = Window.partitionBy(groups: _*).orderBy(f.asc, id.asc)
    base
      .withColumn("__rk", row_number().over(w))
      .filter(col("__rk") <= k)
      .drop("__rk")
  }

  /** Deterministic weighted sampling WITHOUT replacement (Efraimidis-
    * Spirakis A-ES): each row gets priority ln(u)/w with u =
    * hashFraction(id) — monotone-equivalent to the classic u^(1/w) —
    * and the top-k priorities are the sample. Inclusion probability
    * is proportional to weight; the whole draw is reproducible from
    * ids alone.
    *
    * The priority is ROUNDED (r7) before ranking with the id as tie-
    * break, the repo's BM25 convention: ln() differs across libm
    * implementations by an ulp, and an unrounded order could flip a
    * rank at the k boundary between engines. Top-k is
    * TakeOrderedAndProject — no global sort.
    *
    * Rows with weight ≤ 0 (or null) are EXCLUDED by the operator —
    * ln(u) < 0 divided by a non-positive weight would flip to a
    * POSITIVE priority and put exactly the weightless rows at the top
    * of the sample. u is floored at 2^-33 so the h = 0 hash value
    * can't produce ln(0).
    */
  def weightedSample(
      df: DataFrame,
      id: Column,
      weight: Column,
      k: Int,
      salt: Long = 0L): DataFrame = {
    val u = greatest(hashFraction(id, salt), lit(FracFloor))
    val pri = floor(log(u) / weight * 1e7 + 0.5) / 1e7
    df.filter(weight > 0)
      .withColumn("__pri", pri)
      .orderBy(col("__pri").desc, id.asc)
      .limit(k)
      .drop("__pri")
  }

  /** SQL text of [[weightedSample]]'s priority, for DuckDB oracles.
    * The oracle query must also mirror the operator's `weight > 0`
    * filter.
    */
  def prioritySql(idExpr: String, weightExpr: String, salt: Long = 0L): String =
    s"floor(ln(greatest(${hashFractionSql(idExpr, salt)}, $FracFloor))" +
      s" / ($weightExpr) * 1e7 + 0.5) / 1e7"
}
