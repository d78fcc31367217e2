package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Snapshot diff — classify every key as added / removed / changed /
  * unchanged between two versions of a table. This is the audit
  * counterpart of [[Upsert]]: upsert APPLIES a delta, diff RECOVERS
  * one, and `diff(old, upsert(old, delta)) == delta` is the round-trip
  * property the specs pin.
  *
  * Plan shape: one FULL OUTER join on the key — which Spark can never
  * broadcast (both sides must surface unmatched rows), so it is the
  * co-partitioned shuffle join it has to be; presence flags (`lit
  * (true)` per side) distinguish "row absent" from "column null", and
  * change detection is a null-safe (`<=>`) conjunction over the
  * compared columns — no hashing, no collect. At 100 TB both sides
  * shuffle once on the same key; if the tables are bucketed by the
  * key (see the q57 bucketed-join operator), the shuffle disappears
  * entirely.
  */
object TableDiff {

  /** Row-level diff: key columns, `change_type`, and `old_<c>` /
    * `new_<c>` for each compared column. `unchanged` rows are
    * included (filter them out for a CDC feed); keys must be
    * non-null on both sides.
    */
  def diff(
      oldDf: DataFrame,
      newDf: DataFrame,
      keys: Seq[String],
      compareCols: Seq[String]): DataFrame = {
    require(keys.nonEmpty, "diff needs key columns")
    val o = oldDf.select((keys ++ compareCols).map(col): _*)
      .withColumnsRenamed(compareCols.map(c => c -> s"old_$c").toMap)
      .withColumn("__in_old", lit(true))
    val n = newDf.select((keys ++ compareCols).map(col): _*)
      .withColumnsRenamed(compareCols.map(c => c -> s"new_$c").toMap)
      .withColumn("__in_new", lit(true))
    val same = compareCols.map(c => col(s"old_$c") <=> col(s"new_$c"))
      .reduceOption(_ && _).getOrElse(lit(true))
    o.join(n, keys, "full_outer")
      .withColumn("change_type",
        when(col("__in_old").isNull, lit("added"))
          .when(col("__in_new").isNull, lit("removed"))
          .when(same, lit("unchanged"))
          .otherwise(lit("changed")))
      .drop("__in_old", "__in_new")
  }
}
