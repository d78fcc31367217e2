package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton-curve) multi-dimensional clustering — the data
  * LAYOUT operator behind lakehouse `OPTIMIZE ZORDER BY` (Delta/
  * Iceberg): rows close in several dimensions land in the same files,
  * so a multi-column range predicate touches a handful of files
  * instead of all of them. Layout never changes answers — only which
  * parquet min/max footers can rule a file out (Moerkotte, "Small
  * Materialized Aggregates", VLDB'98 is the skipping primitive).
  *
  * Scale shape (100 TB):
  *  - per-column QUANTILE bins (approxQuantile, one distributed pass,
  *    driver holds only `2^bits` boundaries per column) — equi-depth
  *    bins keep the curve balanced under skew where uniform
  *    width_bucket bins would collapse;
  *  - the z-value is pure bit arithmetic (shift/or over binned ints),
  *    whole-stage-codegen'd, no UDF;
  *  - `repartitionByRange(zv)` gives each output file a contiguous
  *    z-range (one range-exchange — the build cost, amortized over
  *    every subsequent skipping read, like the ANN index builds).
  */
object ZOrder {

  /** Equi-depth bin boundaries per column: 2^bits − 1 interior
    * quantile cuts. `relativeError` trades a second of build time for
    * boundary precision; boundaries only shape the LAYOUT, never
    * query answers.
    */
  def binBoundaries(
      df: DataFrame,
      cols: Seq[String],
      bits: Int,
      relativeError: Double = 0.001): Map[String, Array[Double]] = {
    require(bits >= 1 && bits <= 16, "1..16 bits per dimension")
    val nCuts = (1 << bits) - 1
    val probs = (1 to nCuts).map(_.toDouble / (1 << bits)).toArray
    val casted = df.select(cols.map(c => col(c).cast("double").as(c)): _*)
    // the multi-column overload sketches every dimension in ONE
    // distributed pass — the per-column call would rescan the dataset
    // once per dimension just to plan the layout
    val cuts = casted.stat.approxQuantile(cols.toArray, probs, relativeError)
    cols.zip(cuts).toMap
  }

  /** Bin a (double-cast) column against sorted boundary cuts: the bin
    * index is the count of cuts ≤ value — a short codegen'd fold over
    * a literal array, nulls to bin 0 (nulls cluster together at the
    * curve's origin).
    */
  private def bin(c: Column, cuts: Array[Double]): Column =
    aggregate(
      lit(cuts),
      lit(0),
      (acc, cut) => acc + when(c.isNotNull && c.cast("double") >= cut, 1).otherwise(0))

  /** Morton z-value: interleave the bits of each dimension's bin index
    * (dimension 0 owns the most-significant position of each round).
    * Pure shift/or arithmetic over longs — fits whole-stage codegen.
    */
  def zvalue(binCols: Seq[Column], bits: Int): Column = {
    require(binCols.nonEmpty)
    require(binCols.size * bits <= 63, "z-value must fit a signed long")
    val d = binCols.size
    val terms = for {
      i <- 0 until bits                 // bit position within a dimension
      (bc, k) <- binCols.zipWithIndex   // dimension
    } yield {
      val outPos = i * d + (d - 1 - k)  // interleaved position
      shiftleft(shiftright(bc.cast("long"), i).bitwiseAND(lit(1L)), outPos)
    }
    terms.reduce(_.bitwiseOR(_))
  }

  /** Return `df` clustered on the z-order of `cols`: range-partitioned
    * into `numFiles` contiguous z-ranges and sorted within each, so a
    * write produces files whose per-column min/max spans are tight in
    * EVERY clustered dimension.
    */
  def cluster(
      df: DataFrame,
      cols: Seq[String],
      bits: Int = 4,
      numFiles: Int = 16): DataFrame = {
    val bounds = binBoundaries(df, cols, bits)
    val zv = zvalue(cols.map(c => bin(col(c), bounds(c))), bits)
    df.withColumn("__z", zv)
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
  }

  /** Build (or reuse) a z-ordered parquet copy at `path`; idempotent
    * via the `_SUCCESS` marker, same amortized-artifact contract as
    * [[graft.sources.BucketedTables.ensure]].
    */
  def ensureClustered(
      df: DataFrame,
      cols: Seq[String],
      path: String,
      bits: Int = 4,
      numFiles: Int = 16): String = {
    if (!java.nio.file.Files.exists(java.nio.file.Paths.get(path, "_SUCCESS")))
      cluster(df, cols, bits, numFiles).write.mode("overwrite").parquet(path)
    path
  }
}
