package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic, REPLAYABLE quantile sketch — the oracle-checkable
  * member of the sketch family next to [[graft.functions.HyperLogLog]]
  * (distinct counts) and [[graft.functions.CountMinSketch]]
  * (frequencies). Spark's built-in `percentile_approx` (KLL-ish,
  * q43) is correct but not replayable by another engine, so its
  * driver row is rows-only; this sketch is pure integer algebra, so
  * DuckDB recomputing the identical state hash-matches the estimate
  * itself (the q140/q149 HLL discipline applied to quantiles).
  *
  * State: values quantized to integer cents, bucketed at fixed width
  * W — `(group, bucket = cents DIV W, cnt)`. That state is a
  * commutative monoid (merge = sum counts per bucket): map-side
  * combined in one `groupBy`, union-mergeable across sources/days,
  * and BOUNDED by value-range/W per group regardless of row count —
  * the property that makes it a sketch and not a sample. sf-tested at
  * ~1050 buckets/group; a 100 TB corpus with the same price domain
  * produces the same ≤1050-row state per group.
  *
  * Read-out: quantile pct lands in the unique bucket whose cumulative
  * count first reaches rank = ⌈pct·n/100⌉; the estimate is that
  * bucket's inclusive upper edge `b·W + W − 1`, so est − true ∈
  * [0, W) always (spec-pinned), and W = 1 degenerates to the exact
  * percentile. Cumulations are per-group PARTITIONED windows over the
  * bucket-bounded state (never an unpartitioned window; the window
  * input is sketch-sized, not data-sized).
  */
object QuantileSketch {

  /** Mergeable sketch state: one row per (groupCols..., bucket) with
    * the bucket's row count. `centsCol` must be a non-negative BIGINT
    * quantization of the value (money cents, micro-units, ...).
    */
  def sketch(
      df: DataFrame,
      groupCols: Seq[String],
      centsCol: Column,
      bucketWidth: Long): DataFrame = {
    require(bucketWidth >= 1, "bucketWidth >= 1")
    val gs = groupCols.map(col)
    df.select(gs :+ centsCol.cast("long").as("c"): _*)
      .groupBy(gs :+ expr(s"c DIV $bucketWidth").as("bucket"): _*)
      .agg(count(lit(1)).as("cnt"))
  }

  /** Merge two sketch states built with the same groupCols and width
    * (sum counts per bucket — the monoid op; union-then-sketch and
    * sketch-then-merge commute, spec-pinned).
    */
  def merge(a: DataFrame, b: DataFrame, groupCols: Seq[String]): DataFrame = {
    val keys = groupCols :+ "bucket"
    a.unionByName(b)
      .groupBy(keys.map(col): _*)
      .agg(sum(col("cnt")).as("cnt"))
  }

  /** Quantile read-out from sketch state: one row per (group, pct)
    * with the population n, the 1-based target rank ⌈pct·n/100⌉, and
    * the bucket-upper-edge estimate in cents. Total order on
    * (groupCols..., pct).
    */
  def quantiles(
      state: DataFrame,
      groupCols: Seq[String],
      pcts: Seq[Int],
      bucketWidth: Long): DataFrame = {
    require(pcts.nonEmpty && pcts.forall(p => p >= 1 && p <= 100),
      "pcts must be integer percents in [1, 100]")
    val gs = groupCols.map(col)
    val wCum = Window.partitionBy(gs: _*).orderBy(col("bucket"))
    val wAll = Window.partitionBy(gs: _*)
    val withCum = state
      .withColumn("cum", sum(col("cnt")).over(wCum))
      .withColumn("n", sum(col("cnt")).over(wAll))
      .withColumn("pct", explode(array(pcts.map(lit): _*)))
      .withColumn("target_rank", expr("(pct * n + 99) DIV 100"))
      // the unique bucket containing the rank: cum−cnt < rank ≤ cum
      .filter(col("cum") - col("cnt") < col("target_rank") && col("target_rank") <= col("cum"))
    withCum.select(
        gs ++ Seq(col("pct"), col("n"), col("target_rank"),
          (col("bucket") * bucketWidth + (bucketWidth - 1)).as("est_cents")): _*)
      .orderBy(gs :+ col("pct"): _*)
  }
}
