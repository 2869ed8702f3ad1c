package graft.functions

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.types.ArrayType

/** Shared codegen helpers for the fused array-kernel Expression family
  * ([[ArrayDot]], [[ArrayNormSq]], [[ArrayL2Sq]]).
  */
private[functions] object FusedKernels {

  /** Whether an array-typed child can hold null lanes — decided from the
    * schema at codegen time so the per-lane null check compiles away on
    * the (normal) non-nullable-lane path. */
  def lanesNullable(e: Expression): Boolean = e.dataType match {
    case ArrayType(_, containsNull) => containsNull
    case _ => true
  }
}
