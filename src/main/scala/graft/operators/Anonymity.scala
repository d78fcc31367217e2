package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Re-identification risk audit for tabular training data: k-anonymity
  * (Sweeney 2002) and l-diversity (Machanavajjhala et al. 2007) over a
  * quasi-identifier (QI) tuple. Before a table ships into a training
  * corpus, the compliance question is "how many rows sit in a QI
  * equivalence class smaller than k" (unique-ish rows re-identify
  * their subjects) and "do small classes also expose a sensitive
  * attribute" (a class can be large yet carry one sensitive value —
  * everyone in it is outed). These audits are the measurement side;
  * the fix side composes from existing operators (suppress = filter
  * on [[riskAnnotate]], generalize = coarsen a QI column — derive it
  * with `withColumn` before auditing — and re-run; [[Redact]] covers
  * free text).
  *
  * QI columns are passed BY NAME; derived identifiers (bands, bins)
  * are added by the caller first, so the audit key is a real column
  * both here and in any oracle replaying the audit.
  *
  * Scale shape: everything is ONE groupBy on the QI tuple (map-side
  * partials; class count ≤ row count, usually ≪), then arithmetic on
  * the class frame. [[riskAnnotate]] joins class sizes back on the QI
  * key — a shuffle join that AQE converts to broadcast when the class
  * frame is small; no windows, no driver state.
  */
object Anonymity {

  /** Equivalence-class frame: one row per QI tuple with its size. */
  def classSizes(df: DataFrame, quasi: Seq[String]): DataFrame = {
    require(quasi.nonEmpty, "k-anonymity needs at least one quasi-identifier")
    df.groupBy(quasi.map(col): _*).agg(count(lit(1)).as("class_size"))
  }

  /** Class-size histogram with the k-violation flag: for each size,
    * how many classes and rows sit at it — the whole k-anonymity
    * risk profile in ≤ max-class-size rows (any k can be read off
    * the same histogram).
    */
  def sizeHistogram(df: DataFrame, quasi: Seq[String], k: Long): DataFrame =
    classSizes(df, quasi)
      .groupBy(col("class_size"))
      .agg(count(lit(1)).as("n_classes"))
      .withColumn("n_rows", col("class_size") * col("n_classes"))
      .withColumn("violates_k",
        when(col("class_size") < k, 1L).otherwise(0L))

  /** Rows annotated with their class size — the input to a
    * suppression pass (`filter($"class_size" >= k)`). NULL-safe on
    * the QI key: a NULL quasi-identifier value is itself a class
    * (classSizes groups it as one), and a null-unsafe equi-join would
    * silently drop exactly those rows from the audit — the one
    * failure mode a compliance pass must not have.
    */
  def riskAnnotate(df: DataFrame, quasi: Seq[String]): DataFrame = {
    val sizes = quasi.foldLeft(classSizes(df, quasi)) {
      (d, c) => d.withColumnRenamed(c, s"__qi_$c")
    }
    val cond = quasi.map(c => col(c) <=> col(s"__qi_$c")).reduce(_ && _)
    df.join(sizes, cond).drop(quasi.map(c => s"__qi_$c"): _*)
  }

  /** Per-class distinct count of a sensitive attribute: classes with
    * `n_sensitive < l` fail l-diversity even when k-anonymous.
    */
  def lDiversity(df: DataFrame, quasi: Seq[String], sensitive: String): DataFrame =
    df.groupBy(quasi.map(col): _*)
      .agg(
        count(lit(1)).as("class_size"),
        countDistinct(col(sensitive)).as("n_sensitive"))
}
