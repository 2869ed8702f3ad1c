package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, DoubleType}
import graft.functions.{ArrayDot, ArrayL2Sq, ArrayNormSq}

/** Optimizer rule: rewrite the declarative HOF dot-product pattern
  *
  *   aggregate(zip_with(a, b, (x, y) => x * y), 0.0, (acc, v) => acc + v)
  *
  * into the fused native [[ArrayDot]] expression — one codegen'd Java loop,
  * no intermediate zipped array, stays inside whole-stage codegen. This is
  * the `Rule[LogicalPlan]`-via-`SparkSessionExtensions` tier of the
  * extension ladder (SURVEY.md §2.13): users keep writing the declarative
  * form (or `ArrayMath.dot`) and the optimizer swaps in the kernel —
  * the Catalyst analog of the reference dispatching a fused device kernel
  * for the same composed lambda (linalg/dot.cuh:38, map.cuh:95).
  *
  * The rewrite is exact on ALL inputs, not just well-formed ones: the
  * kernels return null exactly where the HOF form does (length mismatch →
  * zip_with null-pads → poisoned fold; null lane → poisoned fold), and on
  * equal-length non-null lanes the fold order is identical, so results
  * are bit-for-bit the same (oracle-compatible). Installing the
  * extensions therefore never changes results, even on ragged or
  * null-laned data outside the canonical `(id, vec)` encoding.
  */
object DotFusionRule extends Rule[LogicalPlan] {

  private def doubleArray(e: Expression): Boolean = e.dataType match {
    case ArrayType(DoubleType, _) => true
    case _ => false
  }

  private def boundTo(vars: Seq[Expression], args: Seq[NamedExpression]): Boolean = {
    val varIds = vars.collect { case v: NamedLambdaVariable => v.exprId }.toSet
    varIds.size == vars.length &&
      varIds == args.collect { case v: NamedLambdaVariable => v.exprId }.toSet
  }

  private def isIdentity(finish: Expression): Boolean = finish match {
    case LambdaFunction(v: NamedLambdaVariable, Seq(arg: NamedLambdaVariable), _) =>
      v.exprId == arg.exprId
    case _ => false
  }

  /** x·x with both operands the single lambda variable (the sq main_op). */
  private def isSquare(x: Expression, y: Expression,
      args: Seq[NamedExpression]): Boolean = (x, y, args) match {
    case (xv: NamedLambdaVariable, yv: NamedLambdaVariable,
        Seq(arg: NamedLambdaVariable)) =>
      xv.exprId == arg.exprId && yv.exprId == arg.exprId
    case _ => false
  }

  /** (x, y) bound to the zip lambda's (first, second) args IN ORDER —
    * a−b is not b−a, so the diff-square match must be positional. */
  private def firstSecond(x: Expression, y: Expression,
      args: Seq[NamedExpression]): Boolean = (x, y, args) match {
    case (xv: NamedLambdaVariable, yv: NamedLambdaVariable,
        Seq(a1: NamedLambdaVariable, a2: NamedLambdaVariable)) =>
      xv.exprId == a1.exprId && yv.exprId == a2.exprId
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformAllExpressions {
    case ArrayAggregate(
        ZipWith(a, b, LambdaFunction(Multiply(x, y, _), zipArgs, _)),
        Literal(zero, DoubleType),
        LambdaFunction(Add(acc, el, _), mergeArgs, _),
        finish)
      if zero == 0.0 && doubleArray(a) && doubleArray(b) &&
        boundTo(Seq(x, y), zipArgs) && boundTo(Seq(acc, el), mergeArgs) &&
        isIdentity(finish) =>
      ArrayDot(a, b)
    // aggregate(zip_with(a, b, (x,y) => (x-y)*(x-y)), 0.0, +) → fused
    // Σ(a-b)² (the pair kernel of the distance suite); same strict fold
    // order → bit-identical
    case ArrayAggregate(
        ZipWith(a, b, LambdaFunction(
          Multiply(Subtract(x1, y1, _), Subtract(x2, y2, _), _), zipArgs, _)),
        Literal(zero, DoubleType),
        LambdaFunction(Add(acc, el, _), mergeArgs, _),
        finish)
      if zero == 0.0 && doubleArray(a) && doubleArray(b) &&
        firstSecond(x1, y1, zipArgs) && firstSecond(x2, y2, zipArgs) &&
        boundTo(Seq(acc, el), mergeArgs) && isIdentity(finish) =>
      ArrayL2Sq(a, b)
    // aggregate(zip_with(a, b, (x,y) => abs(x-y)), 0.0, +) → fused L1
    // distance; same strict fold order → bit-identical
    case ArrayAggregate(
        ZipWith(a, b, LambdaFunction(Abs(Subtract(x, y, _), _), zipArgs, _)),
        Literal(zero, DoubleType),
        LambdaFunction(Add(acc, el, _), mergeArgs, _),
        finish)
      if zero == 0.0 && doubleArray(a) && doubleArray(b) &&
        firstSecond(x, y, zipArgs) &&
        boundTo(Seq(acc, el), mergeArgs) && isIdentity(finish) =>
      graft.functions.ArrayLaneMetric(a, b, "l1")
    // the ArrayMath.l1(ArrayMath.sub(a,b)) spelling: aggregate(
    // transform(zip_with(a, b, x-y), abs), 0.0, +) → same fused L1
    case ArrayAggregate(
        ArrayTransform(
          ZipWith(a, b, LambdaFunction(Subtract(x, y, _), zipArgs, _)),
          LambdaFunction(Abs(v: NamedLambdaVariable, _), tArgs, _)),
        Literal(zero, DoubleType),
        LambdaFunction(Add(acc, el, _), mergeArgs, _),
        finish)
      if zero == 0.0 && doubleArray(a) && doubleArray(b) &&
        firstSecond(x, y, zipArgs) && boundTo(Seq(v), tArgs) &&
        boundTo(Seq(acc, el), mergeArgs) && isIdentity(finish) =>
      graft.functions.ArrayLaneMetric(a, b, "l1")
    // aggregate(transform(v, x*x), 0.0, +) → fused Σx² (the L2/cosine/
    // normalize inner kernel); same strict fold order → bit-identical
    case ArrayAggregate(
        ArrayTransform(v, LambdaFunction(Multiply(x, y, _), tArgs, _)),
        Literal(zero, DoubleType),
        LambdaFunction(Add(acc, el, _), mergeArgs, _),
        finish)
      if zero == 0.0 && doubleArray(v) && isSquare(x, y, tArgs) &&
        boundTo(Seq(acc, el), mergeArgs) && isIdentity(finish) =>
      ArrayNormSq(v)
  }
}

/** Session extension entry point: `.withExtensions(new GraftExtensions)` or
  * `spark.sql.extensions=graft.plans.GraftExtensions`. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectOptimizerRule(_ => DotFusionRule)
    // whole-operator tier: plans the custom AsOfJoinPlan logical node
    ext.injectPlannerStrategy(_ => AsOfJoinStrategy)
    // accelerator tier: batch dot-product kernel on the columnar seam
    // (VERDICT r10 item 2) — consumes the vectorized parquet reader's
    // ColumnarBatch directly, bit-identical to the row path
    ext.injectColumnar(_ => new GraftDotKernelRule)
  }
}
