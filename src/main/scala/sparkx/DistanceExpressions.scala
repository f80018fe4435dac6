package org.apache.spark.sql.graftx

import org.apache.spark.sql.Column
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.classic.ExpressionUtils.{column, expression}
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, DoubleType}

/** Native Catalyst distance expressions (SURVEY.md §4 "custom Catalyst
  * work #1"): a single fused loop over two ARRAY<DOUBLE> values with
  * whole-stage codegen.
  *
  * The pure-`functions` formulation (`aggregate(zip_with(a, b, …))`)
  * materializes an intermediate array per row-pair — at kNN-join
  * cardinality (n·q rows) that allocation dominates. These expressions
  * generate a tight scalar loop instead: no allocation, no virtual
  * calls, same left-to-right summation order (oracle parity preserved).
  */
abstract class BinaryVectorFold extends BinaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(DoubleType), ArrayType(DoubleType))
  override def dataType: DataType = DoubleType

  /** Scalar combine step; must match the codegen template below. */
  protected def combine(acc: Double, x: Double, y: Double): Double
  /** Java source for the combine step over vars (acc, x, y). */
  protected def combineCode(acc: String, x: String, y: String): String

  override def nullSafeEval(a: Any, b: Any): Any = {
    val xs = a.asInstanceOf[ArrayData]
    val ys = b.asInstanceOf[ArrayData]
    val n = math.min(xs.numElements(), ys.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) { acc = combine(acc, xs.getDouble(i), ys.getDouble(i)); i += 1 }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      val x = ctx.freshName("x")
      val y = ctx.freshName("y")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $x = $a.getDouble($i);
         |  double $y = $b.getDouble($i);
         |  $acc = ${combineCode(acc, x, y)};
         |}
         |${ev.value} = $acc;
         |""".stripMargin
    })
}

/** Σ (aᵢ−bᵢ)² — fused squared-L2 (distance.go:18-25). */
case class L2SqExpr(left: Expression, right: Expression) extends BinaryVectorFold {
  override def prettyName: String = "graft_l2sq"
  protected def combine(acc: Double, x: Double, y: Double): Double =
    acc + (x - y) * (x - y)
  protected def combineCode(acc: String, x: String, y: String): String =
    s"$acc + ($x - $y) * ($x - $y)"
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** Σ aᵢ·bᵢ — fused dot product (distance.go:28-34). */
case class DotExpr(left: Expression, right: Expression) extends BinaryVectorFold {
  override def prettyName: String = "graft_dot"
  protected def combine(acc: Double, x: Double, y: Double): Double = acc + x * y
  protected def combineCode(acc: String, x: String, y: String): String =
    s"$acc + $x * $y"
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

object DistanceExpressions {
  /** Column wrappers over the native expressions. */
  def l2SqFast(a: Column, b: Column): Column = column(L2SqExpr(expression(a), expression(b)))
  def dotFast(a: Column, b: Column): Column = column(DotExpr(expression(a), expression(b)))

  /** SQL registration (graft_l2sq / graft_dot), for spark.sql users. */
  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_l2sq", exprs => L2SqExpr(exprs(0), exprs(1)), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_dot", exprs => DotExpr(exprs(0), exprs(1)), "built-in")
  }
}
