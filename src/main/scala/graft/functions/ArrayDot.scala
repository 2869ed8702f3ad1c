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
  * `aggregate(zip_with(a, b, _*_), 0d, _+_)` on ALL inputs: the same strict
  * left fold (bit-identical, oracle-compatible) on equal-length non-null
  * lanes, and null when lengths differ or any lane is null (zip_with
  * null-pads the shorter array; a null term poisons the fold). The payoff
  * is one fused Java loop with no intermediate array allocation that stays
  * inside whole-stage codegen — the per-lane null check is compiled away
  * when the schema says lanes are non-nullable. Mirrors the fusion the
  * reference gets from its device lambdas (linalg/dot.cuh:38, map.cuh:95).
  */
case class ArrayDot(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  // null on length mismatch / null lane, even for non-null inputs
  override def nullable: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    var s = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      s += x.getDouble(i) * y.getDouble(i)
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val sum = ctx.freshName("sum")
      val laneCheck =
        if (FusedKernels.lanesNullable(left) || FusedKernels.lanesNullable(right))
          s"if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }"
        else ""
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $sum = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $laneCheck
         |    $sum += $a.getDouble($i) * $b.getDouble($i);
         |  }
         |  if (!${ev.isNull}) ${ev.value} = $sum;
         |}
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
