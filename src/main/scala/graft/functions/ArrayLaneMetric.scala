package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Native codegen'd two-array lane folds for the distance-metric family —
  * the [[ArrayDot]] template parameterized by the per-lane op. Each op is
  * one fused Java loop over both arrays (no intermediate `zip_with` array,
  * stays inside whole-stage codegen) and is BIT-IDENTICAL to its
  * declarative HOF twin in [[graft.operators.DistanceOps]] /
  * [[ArrayMath]] on equal-length non-null lanes (same strict left fold
  * order); null on length mismatch or any null lane, like the twins.
  * Mirrors the fused device lambdas of the reference distance kernels
  * (distance/distance.cuh pairwise family; core/operators.hpp:27-391).
  *
  * Ops:
  *  - `l1`       Σ |x − y|                      (L1 / Manhattan)
  *  - `linf`     max |x − y|  (null on empty — array_max semantics)
  *  - `canberra` Σ |x−y| / (|x|+|y|), 0/0 lanes contribute 0
  *  - `mink3`    Σ |x−y|³     (cbrt applied by the caller)
  *  - `hamming`  Σ [x ≠ y]    (count of differing lanes, as double)
  *  - `abssum`   Σ |x + y|    (Bray-Curtis denominator)
  */
case class ArrayLaneMetric(left: Expression, right: Expression, op: String)
    extends BinaryExpression {

  require(ArrayLaneMetric.ops.contains(op), s"unknown lane metric op: $op")

  override def dataType: DataType = DoubleType

  override def nullable: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    if (op == "linf" && n == 0) return null
    var s = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      val xv = x.getDouble(i)
      val yv = y.getDouble(i)
      op match {
        case "l1" => s += math.abs(xv - yv)
        case "linf" =>
          val d = math.abs(xv - yv)
          s = if (i == 0) d else math.max(s, d)
        case "canberra" =>
          val den = math.abs(xv) + math.abs(yv)
          s += (if (den != 0.0) math.abs(xv - yv) / den else 0.0)
        case "mink3" => val d = math.abs(xv - yv); s += d * d * d
        case "hamming" => if (xv != yv) s += 1.0
        case "abssum" => s += math.abs(xv + yv)
      }
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      val xv = ctx.freshName("xv")
      val yv = ctx.freshName("yv")
      val d = ctx.freshName("d")
      val laneCheck =
        if (FusedKernels.lanesNullable(left) || FusedKernels.lanesNullable(right))
          s"if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }"
        else ""
      val body = op match {
        case "l1" => s"$s += Math.abs($xv - $yv);"
        case "linf" =>
          s"double $d = Math.abs($xv - $yv); $s = ($i == 0) ? $d : Math.max($s, $d);"
        case "canberra" =>
          s"""double $d = Math.abs($xv) + Math.abs($yv);
             |    $s += ($d != 0.0) ? Math.abs($xv - $yv) / $d : 0.0;""".stripMargin
        case "mink3" => s"double $d = Math.abs($xv - $yv); $s += $d * $d * $d;"
        case "hamming" => s"if ($xv != $yv) $s += 1.0;"
        case "abssum" => s"$s += Math.abs($xv + $yv);"
      }
      val emptyGuard =
        if (op == "linf") s"if ($n == 0) { ${ev.isNull} = true; } else" else ""
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else $emptyGuard {
         |  double $s = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $laneCheck
         |    double $xv = $a.getDouble($i);
         |    double $yv = $b.getDouble($i);
         |    $body
         |  }
         |  if (!${ev.isNull}) ${ev.value} = $s;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ArrayLaneMetric =
    copy(left = newLeft, right = newRight)
}

object ArrayLaneMetric {
  val ops: Set[String] = Set("l1", "linf", "canberra", "mink3", "hamming", "abssum")

  private def mk(op: String)(a: Column, b: Column): Column = ColumnBridge.column(
    ArrayLaneMetric(ColumnBridge.expression(a), ColumnBridge.expression(b), op))

  /** Σ|x−y| — fused L1 distance (no intermediate diff array). */
  def l1(a: Column, b: Column): Column = mk("l1")(a, b)
  /** max|x−y| — fused Chebyshev distance. */
  def linf(a: Column, b: Column): Column = mk("linf")(a, b)
  /** Canberra distance with the 0/0-lane-contributes-0 convention. */
  def canberra(a: Column, b: Column): Column = mk("canberra")(a, b)
  /** Σ|x−y|³ — Minkowski-3 inner sum (caller applies cbrt). */
  def mink3(a: Column, b: Column): Column = mk("mink3")(a, b)
  /** Count of differing lanes (as double; caller normalizes by d). */
  def hamming(a: Column, b: Column): Column = mk("hamming")(a, b)
  /** Σ|x+y| — Bray-Curtis denominator. */
  def abssum(a: Column, b: Column): Column = mk("abssum")(a, b)
}
