package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** The Jaro–Winkler core, shared by the interpreted and codegen paths
  * (one static body ⇒ bit-identical results on either path).
  *
  * Operation-for-operation the textbook algorithm (Winkler 1990):
  * greedy first-available matching inside the ⌊max(l1,l2)/2⌋−1
  * window, transpositions = half the out-of-order matches, jaro =
  * (m/l1 + m/l2 + (m−t)/m)/3 with each division in double, then the
  * ≤4-char common-prefix boost j + (p·0.1)·(1−j) applied ONLY when
  * jaro > 0.7 — the RapidFuzz/DuckDB boost-threshold convention
  * (`jaro_winkler_similarity`'s default score_cutoff semantics):
  * ('ab','ax') is 0.6667 on both engines, not 0.7. With the gate this
  * is the same IEEE op sequence DuckDB runs (verified value-for-value
  * on transposition, prefix, boost-gate boundary, and mixed-length
  * cases), so an e4-snapped comparison between engines is stable.
  *
  * Parity domain: ASCII (more precisely, strings whose UTF-16 code
  * units correspond 1:1 with what DuckDB iterates). This core compares
  * UTF-16 code units; DuckDB compares UTF-8 bytes — supplementary
  * characters count as 2 units here vs 4 bytes there, shifting
  * lengths, match windows, and prefix counts. For non-ASCII corpora
  * the cross-engine oracle contract does not hold; q216/q224 operate
  * on ASCII part/person names where the domains coincide.
  *
  * One deliberate divergence: two EMPTY strings score 1.0 here
  * (identity short-circuit) where DuckDB returns 0 — callers
  * comparing cross-engine should filter empties (part names never
  * are).
  */
object JaroWinklerAlgo {

  def similarity(a: UTF8String, b: UTF8String): Double =
    sim(a.toString, b.toString)

  def sim(s1: String, s2: String): Double = {
    if (s1 == s2) return 1.0
    val l1 = s1.length
    val l2 = s2.length
    if (l1 == 0 || l2 == 0) return 0.0
    val md = math.max(l1, l2) / 2 - 1
    val m1 = new Array[Boolean](l1)
    val m2 = new Array[Boolean](l2)
    var m = 0
    var i = 0
    while (i < l1) {
      val lo = math.max(0, i - md)
      val hi = math.min(l2, i + md + 1)
      var j = lo
      var done = false
      while (j < hi && !done) {
        if (!m2(j) && s2.charAt(j) == s1.charAt(i)) {
          m1(i) = true; m2(j) = true; m += 1; done = true
        }
        j += 1
      }
      i += 1
    }
    if (m == 0) return 0.0
    var t = 0
    var k = 0
    i = 0
    while (i < l1) {
      if (m1(i)) {
        while (!m2(k)) k += 1
        if (s1.charAt(i) != s2.charAt(k)) t += 1
        k += 1
      }
      i += 1
    }
    t /= 2
    val jaro = (m.toDouble / l1 + m.toDouble / l2 +
      (m - t).toDouble / m) / 3.0
    // boost gate: RapidFuzz (and DuckDB's port of it) only applies the
    // Winkler prefix bonus when the base Jaro score clears 0.7
    if (jaro <= 0.7) return jaro
    var pref = 0
    val pmax = math.min(4, math.min(l1, l2))
    while (pref < pmax && s1.charAt(pref) == s2.charAt(pref)) pref += 1
    jaro + pref * 0.1 * (1.0 - jaro)
  }
}

/** Native Catalyst Jaro–Winkler over two string columns — the fuzzy-
  * match scorer for blocked record linkage (q216). A codegen-friendly
  * expression (one static call, no UDF serialization, stays inside
  * whole-stage codegen); null inputs yield null.
  */
case class JaroWinkler(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
    if (left.dataType == StringType && right.dataType == StringType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"jaro_winkler requires string arguments, got ${left.dataType.sql} and ${right.dataType.sql}")
  }

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "jaro_winkler"

  override def nullSafeEval(a: Any, b: Any): Any =
    JaroWinklerAlgo.similarity(
      a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.JaroWinklerAlgo$$.MODULE$$.similarity($a, $b);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
