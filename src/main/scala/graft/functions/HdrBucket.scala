package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, LongType}

/** Native codegen'd HDR-histogram bucket id of a non-negative BIGINT —
  * the hot-path form of the sketch bucketing in
  * [[graft.operators.StatsOps.quantileSketch]] (the declarative twin
  * routes the exponent through `length(bin(v))`, allocating a STRING per
  * row; this is two integer ops via `Long.numberOfLeadingZeros`).
  * Bit-identical to the declarative form for every v ≥ 0:
  *
  *   v < 32 → v ;  else e = 63 − nlz(v), bucket = (e−4)·32 + (v >>> (e−5)) − 32
  *
  * (for positive v the logical shift equals the oracle's floor-division
  * by 2^(e−5), and e equals `length(bin(v)) − 1`). Negative input yields
  * NULL — the sketch's domain is non-negative counts/cents, and the
  * declarative form is undefined garbage there; the property suite pins
  * the v ≥ 0 equivalence across the full range.
  */
case class HdrBucket(child: Expression) extends UnaryExpression {

  // analysis-time type check: a non-BIGINT child must fail analysis, not
  // surface later as a ClassCastException / codegen compile error
  // (ExpectsInputTypes' AbstractDataType is private[sql], hence this form)
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"HDR_BUCKET requires a BIGINT child, got ${child.dataType.catalogString}")

  override def dataType: DataType = LongType

  override def nullable: Boolean = true

  override def nullSafeEval(a: Any): Any = {
    val v = a.asInstanceOf[Long]
    if (v < 0L) null
    else if (v < 32L) v
    else {
      val e = 63 - java.lang.Long.numberOfLeadingZeros(v)
      (e - 4).toLong * 32L + (v >>> (e - 5)) - 32L
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val e = ctx.freshName("e")
      s"""
         |if ($a < 0L) {
         |  ${ev.isNull} = true;
         |} else if ($a < 32L) {
         |  ${ev.value} = $a;
         |} else {
         |  int $e = 63 - java.lang.Long.numberOfLeadingZeros($a);
         |  ${ev.value} = ((long) ($e - 4)) * 32L + ($a >>> ($e - 5)) - 32L;
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): HdrBucket =
    copy(child = newChild)
}

object HdrBucket {
  /** Column-level API: HDR bucket id (input must be BIGINT ≥ 0). */
  def bucket(v: Column): Column =
    ColumnBridge.column(HdrBucket(ColumnBridge.expression(v)))
}
