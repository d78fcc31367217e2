package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native Catalyst quantized squared L2 — Σ_j floor((a_j − b_j)²·q) —
  * over two `array<float|double>` columns (the engine's exact-integer
  * distance convention: [[graft.operators.KMeans]] DistQuantum; the
  * hot inner loop of q131/q132/q133's rankings).
  *
  * The composed form (`zip_with` + `aggregate`,
  * [[graft.operators.Retrieval.quantL2]]) materializes a per-row
  * intermediate long array and evaluates a lambda per element; this
  * expression generates one fused primitive loop via `doGenCode` — no
  * allocations, no virtual calls, stays inside whole-stage codegen.
  * Bit-identical to the composed form: same per-term
  * (double)a−(double)b, d·d·q product order, `Math.floor`, long
  * accumulation.
  *
  * Null semantics mirror the composed form's null-poisoning: null
  * input, length mismatch (zip_with pads with null), or any null
  * ELEMENT → null result. The quantum argument must be a foldable
  * double literal (it is embedded in the generated code).
  */
case class QuantL2(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(dt: DataType): Boolean = dt match {
      case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
      case _ => false
    }
    if (!ok(first.dataType) || !ok(second.dataType))
      TypeCheckResult.TypeCheckFailure(
        s"quant_l2 requires array<float|double> arguments, got ${first.dataType.sql} and ${second.dataType.sql}")
    else if (third.dataType != DoubleType || !third.foldable)
      TypeCheckResult.TypeCheckFailure("quant_l2 quantum must be a double literal")
    else TypeCheckResult.TypeCheckSuccess
  }

  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "quant_l2"

  private def elemIsFloat(e: Expression): Boolean =
    e.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(a: Any, b: Any, q: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    if (x.numElements() != y.numElements()) return null
    val quantum = q.asInstanceOf[Double]
    val lf = elemIsFloat(first); val rf = elemIsFloat(second)
    var s = 0L
    var i = 0
    val n = x.numElements()
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      val xv = if (lf) x.getFloat(i).toDouble else x.getDouble(i)
      val yv = if (rf) y.getFloat(i).toDouble else y.getDouble(i)
      val d = xv - yv
      s += math.floor(d * d * quantum).toLong
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val lGet = if (elemIsFloat(first)) "getFloat" else "getDouble"
    val rGet = if (elemIsFloat(second)) "getFloat" else "getDouble"
    nullSafeCodeGen(ctx, ev, (a, b, q) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      val d = ctx.freshName("d")
      s"""
         |final int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  long $s = 0L;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    final double $d = (double) $a.$lGet($i) - (double) $b.$rGet($i);
         |    $s += (long) java.lang.Math.floor($d * $d * $q);
         |  }
         |  if (!${ev.isNull}) {
         |    ${ev.value} = $s;
         |  }
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): Expression =
    copy(first = newFirst, second = newSecond, third = newThird)
}
