package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality expectations over a table, evaluated as a
  * small violation report — the contract gate every ingest step of a
  * training pipeline runs before publishing a snapshot.
  *
  * Scale shape: ALL row-local checks (not-null, range, set, arbitrary
  * predicate) compile into ONE aggregate over one scan — k checks are
  * k conditional-sum buffers in the same map-side pass, like
  * [[Profile]]. Relational checks cost what they must: uniqueness is
  * one groupBy-free distinct-count aggregate, a foreign key is one
  * left-anti join against the (usually broadcastable) referenced key
  * set. The report itself is k scalar rows — never data-sized.
  */
object Expectations {

  sealed trait Check { def name: String }
  /** Violated by null values in `column`. */
  final case class NotNull(column: String) extends Check {
    val name = s"not_null($column)"
  }
  /** Violated by non-null values outside [lo, hi]. */
  final case class InRange(column: String, lo: Double, hi: Double) extends Check {
    val name = s"in_range($column,$lo,$hi)"
  }
  /** Violated by non-null values not in `values`. */
  final case class InSet(column: String, values: Seq[String]) extends Check {
    val name = s"in_set($column)"
  }
  /** Violated by every row beyond the first per key (n − ndv). */
  final case class Unique(columns: Seq[String]) extends Check {
    val name = s"unique(${columns.mkString(",")})"
  }
  /** Violated by rows whose key has no match in `ref` (left anti). */
  final case class ForeignKey(column: String, ref: DataFrame, refColumn: String,
      refName: String) extends Check {
    val name = s"foreign_key($column->$refName.$refColumn)"
  }
  /** Violated where `cond` is false or null. */
  final case class Predicate(label: String, cond: Column) extends Check {
    val name = s"predicate($label)"
  }

  /** One row per check: (check, n_violations, pass), ordered by check
    * name. Row-local checks share a single scan; each Unique /
    * ForeignKey adds one aggregate/join job over the same input.
    */
  def run(df: DataFrame, checks: Seq[Check]): DataFrame = {
    require(checks.nonEmpty, "no checks given")
    val local: Seq[(String, Column)] = checks.collect {
      case c: NotNull => c.name -> col(c.column).isNull
      case c: InRange => c.name ->
        (col(c.column).isNotNull && !col(c.column).between(c.lo, c.hi))
      case c: InSet => c.name ->
        (col(c.column).isNotNull && !col(c.column).isInCollection(c.values))
      case c: Predicate => c.name -> !coalesce(c.cond, lit(false))
    }
    val localReport: Option[DataFrame] =
      if (local.isEmpty) None
      else {
        // index-based aliases: check names contain dots/parens that
        // col() would parse as nested-field access
        val aggs = local.zipWithIndex.map { case ((_, viol), i) =>
          sum(viol.cast("long")).as(s"__v_$i")
        }
        val one = df.agg(aggs.head, aggs.tail: _*)
        val rows = local.zipWithIndex.map { case ((n, _), i) =>
          struct(lit(n).as("check"), coalesce(col(s"__v_$i"), lit(0L)).as("n_violations"))
        }
        Some(one.select(explode(array(rows: _*)).as("s")).select(col("s.*")))
      }
    val relational: Seq[DataFrame] = checks.collect {
      case c: Unique =>
        df.agg((count(lit(1)) -
          count_distinct(struct(c.columns.map(col): _*))).as("n_violations"))
          .select(lit(c.name).as("check"), col("n_violations"))
      case c: ForeignKey =>
        df.select(col(c.column)).filter(col(c.column).isNotNull)
          .join(broadcast(c.ref.select(col(c.refColumn).as(c.column)).distinct()),
            Seq(c.column), "left_anti")
          .agg(count(lit(1)).as("n_violations"))
          .select(lit(c.name).as("check"), col("n_violations"))
    }
    (localReport.toSeq ++ relational)
      .reduce(_ unionByName _)
      .withColumn("pass", col("n_violations") === 0L)
      .orderBy(col("check"))
  }
}
