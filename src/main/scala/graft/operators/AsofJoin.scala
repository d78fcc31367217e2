package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (temporal) join: for each left row, attach the payload of
  * the LATEST right row with `right.ts <= left.ts` for the same key —
  * the standard enrichment join of event pipelines (attach the most
  * recent profile/model-version/price to each event).
  *
  * Spark-first mechanics (no built-in ASOF in Spark): tag and union
  * both sides, then `last(payload, ignoreNulls)` windows over
  * (key; ts, side) with right rows sorting before left rows at equal
  * ts (inclusive as-of). Cost = ONE shuffle on the key + a
  * partition-local sort — never a range-exploded join, never a
  * per-left-row scan of the right side. Skewed keys fall under the
  * same salting/AQE remedies as any keyed shuffle.
  *
  * Contract: right must be unique per (key, ts) — pre-aggregate if
  * not — otherwise "the latest right row" is ambiguous.
  */
object AsofJoin {

  /** Returns every left row + `__asof_<c>` for each payload column
    * (null when no right row precedes it).
    */
  def asofJoin(
      left: DataFrame,
      right: DataFrame,
      key: String,
      leftTsCol: String,
      rightTsCol: String,
      payloadCols: Seq[String]): DataFrame = {
    require(!payloadCols.contains(key))
    // one struct for ALL payloads: a real right row yields a non-null
    // struct even when individual payload values are null, so
    // "matched a row with null payload" ≠ "no match"
    val rightTagged = right.select(
      col(key), col(rightTsCol).as("__ts"), lit(0).as("__side"),
      struct(payloadCols.map(col): _*).as("__asof"))
    val leftTagged = left
      .withColumn("__ts", col(leftTsCol))
      .withColumn("__side", lit(1))

    // union by name; each side's missing columns become nulls
    val unioned = leftTagged.unionByName(rightTagged, allowMissingColumns = true)

    // right rows at equal ts sort BEFORE left rows → inclusive (<=)
    val w = Window.partitionBy(col(key)).orderBy(col("__ts"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val filled = unioned
      .withColumn("__asof", last(col("__asof"), ignoreNulls = true).over(w))
    val unpacked = payloadCols.foldLeft(filled) { (df, c) =>
      df.withColumn(s"__asof_$c", col("__asof").getField(c))
    }
    unpacked.filter(col("__side") === 1).drop("__ts", "__side", "__asof")
  }
}
