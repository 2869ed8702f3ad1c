package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Typed vector aggregators with `Array[Double]` buffers — the Spark form
  * of the reference's fused keyed reductions (SURVEY.md §4 custom-code
  * list): reduce_rows_by_key (linalg/reduce_rows_by_key.cuh:141),
  * stats::sum (stats/sum.cuh:35), meanvar (stats/meanvar.cuh:39).
  *
  * Buffers are partial-aggregated map-side and merged pairwise — the
  * mergeable-partials contract that makes one shuffle carry only
  * (#keys × d) doubles instead of n×d lanes. Lane-wise addition is
  * order-insensitive up to FP rounding; declared outputs round to the
  * oracle tolerance (SURVEY §7 policy).
  */
object VectorAgg {

  /** Element-wise sum of ARRAY<DOUBLE> columns (vector_sum). */
  private object VectorSum extends Aggregator[Seq[Double], Seq[Double], Seq[Double]] {
    def zero: Seq[Double] = Seq.empty
    def reduce(buf: Seq[Double], v: Seq[Double]): Seq[Double] =
      if (buf.isEmpty) v else buf.zip(v).map { case (a, b) => a + b }
    def merge(a: Seq[Double], b: Seq[Double]): Seq[Double] =
      if (a.isEmpty) b else if (b.isEmpty) a else a.zip(b).map { case (x, y) => x + y }
    def finish(buf: Seq[Double]): Seq[Double] = buf
    def bufferEncoder: Encoder[Seq[Double]] = ExpressionEncoderHelper.seqDouble
    def outputEncoder: Encoder[Seq[Double]] = ExpressionEncoderHelper.seqDouble
  }

  /** vector_sum as a Column aggregate usable in groupBy().agg(...). */
  def vectorSum(c: Column): Column = udaf(VectorSum).apply(c)
}

private object ExpressionEncoderHelper {
  import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
  import org.apache.spark.sql.catalyst.encoders.AgnosticEncoders
  val seqDouble: Encoder[Seq[Double]] =
    ExpressionEncoder(AgnosticEncoders.IterableEncoder(
      scala.reflect.classTag[Seq[Double]],
      AgnosticEncoders.PrimitiveDoubleEncoder,
      containsNull = false,
      lenientSerialization = false))
}
