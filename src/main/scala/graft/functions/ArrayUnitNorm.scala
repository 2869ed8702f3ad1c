package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.DataType

/** Fused unit-normalize over an ARRAY<DOUBLE> column — one codegen'd pass
  * computing Σx², sqrt, and the per-lane divide, with NO intermediate
  * array and no CodegenFallback lambda. Semantically equal on ALL inputs to
  * `transform(v, x => when(l2(v) =!= 0.0, x / l2(v)).otherwise(x))` with
  * `l2(v) = sqrt(aggregate(transform(v, x*x), 0d, _+_))` (the
  * ArrayMath.normalize∘l2 composition every embedding pre-pass used):
  * same strict left fold for the norm, same IEEE divide per lane — so the
  * values are bit-identical and every existing DuckDB oracle replay still
  * matches. When any lane is null the HOF norm folds to null, whose
  * `when` condition falls through to `otherwise(x)` — the array passes
  * through UNCHANGED; likewise for an exactly-zero norm. A NaN norm
  * (NaN lanes) divides through as NaN, as the HOF form does.
  *
  * This is the row-path twin of the columnar kernel's unit-norm lane
  * ([[graft.plans.ColumnarDotKernel]] `UnitCol`), the shape that puts the
  * batch kernel inside the PRODUCTION dedup/ANN pipelines: the reference's
  * row-normalize is likewise a precompiled kernel feeding its distance
  * primitives (linalg/normalize.cuh:36 rowNormalize, fused
  * main_op/reduce_op/fin_op), not a bench fixture.
  */
case class ArrayUnitNorm(child: Expression) extends UnaryExpression {

  override def dataType: DataType = child.dataType

  override def nullSafeEval(a: Any): Any =
    ArrayUnitNorm.evalArray(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.ArrayUnitNorm.evalArray($a);")

  override protected def withNewChildInternal(newChild: Expression): ArrayUnitNorm =
    copy(child = newChild)
}

object ArrayUnitNorm {

  /** The single-pass kernel both eval modes share (and the bit-exactness
    * contract the columnar lane is pinned against): strict left-fold Σx²,
    * `sqrt`, divide — input returned AS-IS when the norm is null (a null
    * lane) or exactly 0.0, matching the HOF `when/otherwise` fallthrough. */
  def evalArray(x: ArrayData): ArrayData = {
    val n = x.numElements()
    var s = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i)) return x // null lane → null norm → pass-through
      val v = x.getDouble(i)
      s += v * v
      i += 1
    }
    val nrm = math.sqrt(s)
    if (nrm == 0.0) x // zero vector (or n == 0) → pass-through
    else {
      val out = new Array[Double](n)
      i = 0
      while (i < n) { out(i) = x.getDouble(i) / nrm; i += 1 }
      new GenericArrayData(out)
    }
  }

  /** Column-level API: fused unit normalization (input must be
    * ARRAY<DOUBLE> — cast lanes before calling). */
  def unit(v: Column): Column =
    ColumnBridge.column(ArrayUnitNorm(ColumnBridge.expression(v)))
}
