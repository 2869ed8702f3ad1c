package graft.functions

import org.apache.spark.sql.{Column, Encoder}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Typed vector aggregators with `Array[Double]` buffers — the Spark form
  * of the reference's fused keyed reductions (SURVEY.md §4 custom-code
  * list): reduce_rows_by_key (linalg/reduce_rows_by_key.cuh:141),
  * stats::sum (stats/sum.cuh:35), meanvar (stats/meanvar.cuh:39).
  *
  * Buffers are partial-aggregated map-side and merged pairwise — the
  * mergeable-partials contract that makes one shuffle carry only
  * (#keys × d) doubles instead of n×d lanes. Primitive-array buffers ride
  * the UnsafeArrayData fast path (no per-lane boxing — the Seq[Double]
  * version spent most of its time allocating); in-place accumulation is
  * safe because ObjectHashAggregate holds the buffer object between calls.
  * Lane-wise addition is order-insensitive up to FP rounding; declared
  * outputs round to the oracle tolerance (SURVEY §7 policy).
  */
object VectorAgg {

  /** Element-wise sum of ARRAY<DOUBLE> columns (vector_sum). */
  private object VectorSum
      extends Aggregator[Array[Double], Array[Double], Array[Double]] {
    def zero: Array[Double] = Array.emptyDoubleArray
    def reduce(buf: Array[Double], v: Array[Double]): Array[Double] =
      if (buf.isEmpty) v.clone()
      else {
        var i = 0
        while (i < buf.length) { buf(i) += v(i); i += 1 }
        buf
      }
    def merge(a: Array[Double], b: Array[Double]): Array[Double] =
      if (a.isEmpty) b
      else if (b.isEmpty) a
      else {
        var i = 0
        while (i < a.length) { a(i) += b(i); i += 1 }
        a
      }
    def finish(buf: Array[Double]): Array[Double] = buf
    def bufferEncoder: Encoder[Array[Double]] = ExpressionEncoderHelper.doubleArray
    def outputEncoder: Encoder[Array[Double]] = ExpressionEncoderHelper.doubleArray
  }

  /** vector_sum as a Column aggregate usable in groupBy().agg(...). */
  def vectorSum(c: Column): Column = udaf(VectorSum).apply(c)

  /** Fused Σ w·v without materializing the scaled array per row — the
    * axpy-accumulate the sharded-Lanczos CGS passes run over every
    * coordinate each step (`vectorSum(scale(qs, w))` pays an interpreted
    * HOF alloc per row; this multiplies into the primitive buffer
    * directly, same products in the same per-partition order ⇒
    * bit-identical partials). */
  private object AxpySum
      extends Aggregator[(Array[Double], Double), Array[Double], Array[Double]] {
    def zero: Array[Double] = Array.emptyDoubleArray
    def reduce(buf: Array[Double], in: (Array[Double], Double)): Array[Double] = {
      val (v, w) = in
      if (buf.isEmpty) {
        val out = new Array[Double](v.length)
        var i = 0
        while (i < v.length) { out(i) = v(i) * w; i += 1 }
        out
      } else {
        var i = 0
        while (i < buf.length) { buf(i) += v(i) * w; i += 1 }
        buf
      }
    }
    def merge(a: Array[Double], b: Array[Double]): Array[Double] =
      VectorSum.merge(a, b)
    def finish(buf: Array[Double]): Array[Double] = buf
    def bufferEncoder: Encoder[Array[Double]] = ExpressionEncoderHelper.doubleArray
    def outputEncoder: Encoder[Array[Double]] = ExpressionEncoderHelper.doubleArray
  }

  def axpySum(v: Column, w: Column): Column =
    udaf(AxpySum, org.apache.spark.sql.Encoders.tuple(
      ExpressionEncoderHelper.doubleArray,
      org.apache.spark.sql.Encoders.scalaDouble)).apply(v, w)
}

private object ExpressionEncoderHelper {
  import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
  import org.apache.spark.sql.catalyst.encoders.AgnosticEncoders
  val doubleArray: Encoder[Array[Double]] =
    ExpressionEncoder(AgnosticEncoders.ArrayEncoder(
      AgnosticEncoders.PrimitiveDoubleEncoder, containsNull = false))
}
