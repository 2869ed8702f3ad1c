package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Native codegen'd Σx² over an ARRAY<DOUBLE> column — the second member of
  * the fused-kernel Expression family after [[ArrayDot]] (SURVEY.md §2.13).
  * Semantically equal to `aggregate(transform(v, x*x), 0d, _+_)` on ALL
  * inputs (same strict left fold → bit-identical, oracle-compatible; null
  * when any lane is null, which poisons the HOF fold too) but one
  * generated Java loop with no intermediate array. It is the inner kernel of the L2
  * norm, cosine similarity, normalize, and squared-distance paths —
  * reference: linalg/norm.cuh:51 (L2Norm main_op=sq fused reduce).
  */
case class ArrayNormSq(child: Expression) extends UnaryExpression {

  override def dataType: DataType = DoubleType

  // null on a null lane, even for a non-null input array (matches the
  // HOF fold, which a null term poisons)
  override def nullable: Boolean = true

  override def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val n = x.numElements()
    var s = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i)) return null
      val v = x.getDouble(i)
      s += v * v
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val v = ctx.freshName("v")
      val sum = ctx.freshName("sum")
      val laneCheck =
        if (FusedKernels.lanesNullable(child))
          s"if ($a.isNullAt($i)) { ${ev.isNull} = true; break; }"
        else ""
      s"""
         |int $n = $a.numElements();
         |double $sum = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $laneCheck
         |  double $v = $a.getDouble($i);
         |  $sum += $v * $v;
         |}
         |if (!${ev.isNull}) ${ev.value} = $sum;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): ArrayNormSq =
    copy(child = newChild)
}

object ArrayNormSq {
  /** Column-level API: fused sum of squares (input must be ARRAY<DOUBLE>). */
  def normSq(a: Column): Column =
    ColumnBridge.column(ArrayNormSq(ColumnBridge.expression(a)))
}
