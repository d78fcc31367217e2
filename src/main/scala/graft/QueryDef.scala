package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One named, driver-checkable query: the Spark implementation plus an
  * equivalent ANSI-SQL oracle for DuckDB (None → the driver records a
  * weaker rows-only check; used for operators whose semantics aren't
  * SQL-expressible, e.g. seeded embedding inference).
  *
  * Determinism contract (SURVEY.md §7.4):
  *  - every query imposes a total order (ties broken by a unique key)
  *    so row-order-sensitive hashing matches;
  *  - money-typed sums are computed in decimal(18,2) (exact, order-
  *    independent) and cast to double only at the end — float sums
  *    would differ between Spark's and DuckDB's accumulation orders;
  *  - output column names are identical between Spark and oracle.
  */
final case class QueryDef(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object QueryDef {
  def all: Seq[QueryDef] =
    queries.CoreQueries.defs ++
      queries.PipelineQueries.defs ++
      queries.DedupQueries.defs ++
      queries.TextQueries.defs ++
      queries.ScaleQueries.defs ++
      queries.MultimodalQueries.defs ++
      queries.SamplingQueries.defs ++
      queries.SequenceQueries.defs ++
      queries.MatchQueries.defs ++
      queries.QualityQueries.defs ++
      queries.AnalyticsQueries.defs ++
      queries.SurfaceQueries.defs ++
      queries.BusinessQueries.defs ++
      queries.ClusterQueries.defs ++
      queries.ClassifierQueries.defs ++
      queries.QuantQueries.defs ++
      queries.RetrievalQueries.defs ++
      queries.RiskQueries.defs
}
