package graft.queries

/** Fixed fixtures shared by the declared queries and their DuckDB
  * oracles — single definitions so the Spark side and the SQL
  * literals cannot drift (every ANN/search row must probe with the
  * SAME vector for cross-query comparability).
  */
private[queries] object QueryFixtures {

  /** The fixed 64-dim query vector: ((i % 7) − 3) / 3. */
  val queryVec: Seq[Double] = (0 until 64).map(i => ((i % 7) - 3) / 3.0)

  /** [[queryVec]] as a DOUBLE[] SQL literal (the brute-force oracles
    * score against the raw doubles).
    */
  val queryVecSql: String =
    queryVec.map(_.toString).mkString("[", ",", "]")

  /** The FLOAT image of [[queryVec]] as Array[Float] — what the ANN
    * entry points actually search with.
    */
  val queryVecF: Array[Float] = queryVec.map(_.toFloat).toArray

  /** [[queryVecF]] as a DOUBLE[] SQL literal. Double.toString
    * round-trips exactly, so DuckDB parses back the identical doubles
    * the Spark side computes with after the float narrowing; the raw
    * double literal would diverge in the last ulp wherever the float
    * rounding moved the value.
    */
  val queryVecFSql: String =
    queryVecF.map(f => f.toDouble.toString).mkString("[", ",", "]")

  /** SQL image of [[graft.operators.LogReg.fdiv]] — floor of the IEEE
    * double quotient, exact while |a|,|b| < 2^53 (each call site's
    * headroom note proves its operands are).
    */
  def fdivSql(a: String, b: String): String =
    s"CAST(floor(CAST($a AS DOUBLE) / CAST($b AS DOUBLE)) AS BIGINT)"
}
