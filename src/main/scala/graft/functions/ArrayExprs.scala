package graft.functions

import org.apache.spark.sql.{Column, GraftShims}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/**
 * Native Catalyst expressions for the hot vector kernels. The
 * higher-order-function formulations (`aggregate(zip_with(...))`) are
 * correct but interpreted — per-element lambda dispatch outside
 * whole-stage codegen. These compile to a tight primitive loop inside
 * the generated code (single array traversal, no allocation), which
 * matters when a similarity join evaluates millions of 64-dim pairs:
 * the content-based scorer dropped ~10× switching over.
 *
 * Left-to-right accumulation order is IDENTICAL to both the HOF fold
 * and DuckDB's list_sum, so oracle hashes are unaffected.
 */
abstract class VectorBinaryExpression extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(t: DataType) = t match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two array<double> arguments, got " +
        s"${left.dataType.simpleString} and ${right.dataType.simpleString}")
  }

  /** Per-element contribution for the interpreted path. */
  protected def combine(x: Double, y: Double): Double
  /** Per-element contribution as generated Java (vars `xi`, `yi`). */
  protected def combineCode: String

  // Length mismatch → NULL, matching the HOF fold these replace
  // (zip_with pads the short side with null, which the fold then
  // propagates): a truncated/corrupt vector must surface as NULL, not
  // as a plausible partial sum that silently reorders kNN results.
  override def nullable: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any = {
    val xs = a.asInstanceOf[ArrayData]
    val ys = b.asInstanceOf[ArrayData]
    val n = xs.numElements()
    if (n != ys.numElements()) null
    else {
      var acc = 0.0
      var i = 0
      while (i < n) {
        acc += combine(xs.getDouble(i), ys.getDouble(i))
        i += 1
      }
      acc
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $acc = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    double xi = $a.getDouble($i);
         |    double yi = $b.getDouble($i);
         |    $acc += $combineCode;
         |  }
         |  ${ev.value} = $acc;
         |}
       """.stripMargin
    })
}

/** Σ xᵢ·yᵢ over two array<double> columns, one fused loop. */
case class DotProduct(left: Expression, right: Expression)
    extends VectorBinaryExpression {
  override protected def combine(x: Double, y: Double): Double = x * y
  override protected def combineCode: String = "xi * yi"
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "vec_dot"
}

/** Σ (xᵢ−yᵢ)² — squared L2 distance, one fused loop. */
case class SquaredDistance(left: Expression, right: Expression)
    extends VectorBinaryExpression {
  override protected def combine(x: Double, y: Double): Double = {
    val d = x - y; d * d
  }
  override protected def combineCode: String = "(xi - yi) * (xi - yi)"
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SquaredDistance =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "vec_sqdist"
}

object ArrayExprs {
  import GraftShims.{toColumn, toExpression}
  /** Column surface for [[DotProduct]]. */
  def vecDot(a: Column, b: Column): Column =
    toColumn(DotProduct(toExpression(a), toExpression(b)))
  /** Column surface for [[SquaredDistance]]. */
  def vecSqDist(a: Column, b: Column): Column =
    toColumn(SquaredDistance(toExpression(a), toExpression(b)))
}
