package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Native codegen'd squared-L2 distance Σ(a−b)² over two ARRAY<DOUBLE>
  * columns — third member of the fused-kernel Expression family
  * ([[ArrayDot]], [[ArrayNormSq]]; SURVEY.md §2.13). Semantically equal to
  * `aggregate(zip_with(a, b, (x, y) => (x-y)*(x-y)), 0d, _+_)` (same strict
  * left fold → bit-identical, oracle-compatible) but one generated Java
  * loop with no intermediate zipped array. It is the pair kernel of the
  * distance suite: epsilon-neighborhood joins, kNN graphs, core
  * distances — reference: the fused L2 distance tile loop the reference
  * builds from contractions (distance path of linalg/contractions.cuh:34).
  * Equality holds on ALL inputs: null when lengths differ or any lane is
  * null (zip_with null-pads; a null term poisons the fold), the identical
  * strict fold otherwise.
  */
case class ArrayL2Sq(left: Expression, right: Expression)
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
      val d = x.getDouble(i) - y.getDouble(i)
      s += d * d
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val d = ctx.freshName("d")
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
         |    double $d = $a.getDouble($i) - $b.getDouble($i);
         |    $sum += $d * $d;
         |  }
         |  if (!${ev.isNull}) ${ev.value} = $sum;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ArrayL2Sq =
    copy(left = newLeft, right = newRight)
}

object ArrayL2Sq {
  /** Column-level API: native fused squared-L2 distance (inputs must be
    * ARRAY<DOUBLE> — cast lanes before calling). */
  def l2sq(a: Column, b: Column): Column = ColumnBridge.column(
    ArrayL2Sq(ColumnBridge.expression(a), ColumnBridge.expression(b)))
}
