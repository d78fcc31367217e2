package graft.operators

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._

/** 2-dimensional skyline (Pareto frontier): rows not dominated by any
  * other row, where q dominates p iff q.min ≤ p.min ∧ q.max ≥ p.max
  * with at least one strict inequality ("cheaper and at least as
  * big, or as cheap and strictly bigger"). Exact-tie rows (both
  * dimensions equal) dominate neither and all survive.
  *
  * Scale shape — the classic two-phase reduction:
  *  1. range-partition on the minimized dimension and sort WITHIN
  *     partitions (a spillable local sort, no global exchange of all
  *     rows to one task);
  *  2. per-partition linear sweep keeps each partition's local
  *     skyline — any point dominated within its partition is
  *     dominated globally, so this loses nothing;
  *  3. the union of local skylines (skyline-sized, typically
  *     O(log n) per partition for independent dimensions) goes
  *     through the same sweep once more in a single narrow task.
  * Dominated points never cross the network; the only all-to-one
  * movement is the already-tiny candidate set.
  */
object Skyline {

  /** Local sweep over rows sorted by (min asc, max desc): a row
    * survives iff its `max` equals its price-group's top AND strictly
    * exceeds the best `max` of all strictly-lower `min` groups.
    */
  private def sweep(rows: Iterator[Row], minIdx: Int, maxIdx: Int): Iterator[Row] = {
    var bestLower = Double.NegativeInfinity   // max over strictly lower min-groups
    var curMin = Double.NaN                   // current min-group key
    var groupTop = Double.NegativeInfinity    // top max within the group (first row's, by sort)
    rows.filter { r =>
      val mn = r.getDouble(minIdx)
      val mx = r.getDouble(maxIdx)
      if (mn != curMin || curMin.isNaN) {     // entering a new min-group
        bestLower = math.max(bestLower, groupTop)
        curMin = mn
        groupTop = mx                         // sort gives the group max first
      }
      mx == groupTop && mx > bestLower
    }
  }

  /** Frontier of `df` minimizing `minCol` and maximizing `maxCol`
    * (both numeric, null rows dropped). Returns the surviving rows
    * with their original columns.
    */
  def frontier2d(df: DataFrame, minCol: String, maxCol: String): DataFrame = {
    val prepared = df
      .filter(col(minCol).isNotNull && col(maxCol).isNotNull)
      .withColumn("__mn", col(minCol).cast("double"))
      .withColumn("__mx", col(maxCol).cast("double"))
    val schema = prepared.schema
    val enc = Encoders.row(schema)
    val mnI = schema.fieldIndex("__mn")
    val mxI = schema.fieldIndex("__mx")
    val local = prepared
      .repartitionByRange(col("__mn"))
      .sortWithinPartitions(col("__mn").asc, col("__mx").desc)
      .mapPartitions(it => sweep(it, mnI, mxI))(enc)
    // phase 2: the skyline-sized candidate union through one narrow task
    local
      .coalesce(1)
      .sortWithinPartitions(col("__mn").asc, col("__mx").desc)
      .mapPartitions(it => sweep(it, mnI, mxI))(enc)
      .drop("__mn", "__mx")
  }
}
