package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Column profiling — the ANALYZE-stats pass: per-column count, null
  * count, min/max, mean, and an ndv estimate, as data. These are the
  * numbers every downstream decision reads — join-side selection,
  * skew diagnosis before salting, curation range checks — and at
  * 100 TB the profiling pass itself must be one scan, not one per
  * column.
  *
  * Plan shape: ALL columns profile in a SINGLE aggregate over one scan
  * (k columns → k×6 partial buffers in the same map-side pass), then
  * unpivot the 1-row result driver-side — the row is k×6 scalars, not
  * data. ndv is HyperLogLog (`approx_count_distinct`) by design: exact
  * ndv per column compiles to an Expand replicating the input per
  * distinct aggregate (the q35 pathology — measured 6× there); a
  * profiling pass never needs exact ndv.
  */
object Profile {

  /** One row per profiled column:
    * (column, n, n_nulls, min, max, mean, ndv). Numeric stats are
    * doubles (min/max/mean cast); `ndv` is an HLL estimate at `rsd`
    * relative error.
    */
  def profile(df: DataFrame, cols: Seq[String], rsd: Double = 0.02): DataFrame = {
    require(cols.nonEmpty, "profile needs at least one column")
    val aggs = cols.flatMap { c =>
      Seq(
        count(col(c)).as(s"__cnt_$c"),
        sum(col(c).isNull.cast("long")).as(s"__nul_$c"),
        min(col(c).cast("double")).as(s"__min_$c"),
        max(col(c).cast("double")).as(s"__max_$c"),
        avg(col(c).cast("double")).as(s"__avg_$c"),
        approx_count_distinct(col(c), rsd).as(s"__ndv_$c"))
    }
    val one = df.agg(aggs.head, aggs.tail: _*)
    val structs = cols.map { c =>
      struct(
        lit(c).as("column"),
        col(s"__cnt_$c").as("n"),
        col(s"__nul_$c").as("n_nulls"),
        col(s"__min_$c").as("min"),
        col(s"__max_$c").as("max"),
        col(s"__avg_$c").as("mean"),
        col(s"__ndv_$c").as("ndv"))
    }
    one.select(explode(array(structs: _*)).as("p")).select(col("p.*"))
  }
}
