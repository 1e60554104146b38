package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Squared-L2 distance between two numeric array columns as a native
  * codegen'd expression — the IVF/PQ assignment hot path (every
  * corpus vector evaluates it once per candidate centroid). Semantics
  * are the strict left-to-right double fold
  * `Σ_{i} (double(a[i]) − double(b[i]))²` in index order — exactly the
  * fold the portable `aggregate`/`zip_with` formulation and the DuckDB
  * oracle compute. For EQUAL-LENGTH DENSE vectors (every IVF/PQ path
  * in this engine) swapping this in changes the plan (interpreted
  * higher-order functions → one fused codegen loop), never the bits of
  * the result.
  *
  * Either side may be `array<float>` (raw embeddings) or
  * `array<double>` (trained centroid means) — k-means assignment mixes
  * them. Outside the dense contract the edge semantics intentionally
  * DIFFER from the HOF fold (ADVICE r5): mismatched lengths fold over
  * the shorter prefix and a null element contributes 0 — defensive
  * choices that return a number where the HOF fold propagates NULL.
  * Degenerate inputs surface as distances, not silent row drops
  * ([[VectorDot]] makes the same ones).
  */
case class VectorSqDist(left: Expression, right: Expression) extends BinaryExpression {

  private def isNumArray(t: DataType): Boolean = t match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
    case _ => false
  }

  private def isFloat(t: DataType): Boolean = t match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (isNumArray(left.dataType) && isNumArray(right.dataType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_vector_sqdist requires array<float|double> arguments, got " +
        s"${left.dataType.sql} and ${right.dataType.sql}")

  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_vector_sqdist"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    val xf = isFloat(left.dataType)
    val yf = isFloat(right.dataType)
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (!x.isNullAt(i) && !y.isNullAt(i)) {
        val xv = if (xf) x.getFloat(i).toDouble else x.getDouble(i)
        val yv = if (yf) y.getFloat(i).toDouble else y.getDouble(i)
        val d = xv - yv
        acc += d * d
      }
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      val d = ctx.freshName("d")
      def get(arr: String, fl: Boolean, idx: String) =
        if (fl) s"((double) $arr.getFloat($idx))" else s"$arr.getDouble($idx)"
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$a.isNullAt($i) && !$b.isNullAt($i)) {
         |    double $d = ${get(a, isFloat(left.dataType), i)} - ${get(b, isFloat(right.dataType), i)};
         |    $acc += $d * $d;
         |  }
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): VectorSqDist =
    copy(left = newLeft, right = newRight)
}
