package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Native codegen'd dot product over two ARRAY<DOUBLE> columns — the
  * custom-`Expression` tier of the extension ladder (compose built-ins →
  * custom Expression → custom plan; SURVEY.md §2.13). Semantically equal to
  * `aggregate(zip_with(a, b, _*_), 0d, _+_)` (same strict left fold, so
  * results are bit-identical and oracle-compatible) but generates a single
  * fused Java loop with no intermediate array allocation, and stays inside
  * whole-stage codegen. Mirrors the fusion the reference gets from its
  * device lambdas (linalg/dot.cuh:38, map.cuh:95).
  */
case class ArrayDot(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) { s += x.getDouble(i) * y.getDouble(i); i += 1 }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val sum = ctx.freshName("sum")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $sum = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $sum += $a.getDouble($i) * $b.getDouble($i);
         |}
         |${ev.value} = $sum;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ArrayDot =
    copy(left = newLeft, right = newRight)
}

object ArrayDot {
  /** Column-level API: native fused dot product (inputs must be
    * ARRAY<DOUBLE> — cast lanes before calling). */
  def dot(a: Column, b: Column): Column = ColumnBridge.column(
    ArrayDot(ColumnBridge.expression(a), ColumnBridge.expression(b)))
}
