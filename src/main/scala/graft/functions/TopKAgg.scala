package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Bounded-heap per-group top-k — the Spark form of the reference's
  * select_k (matrix/detail/select_k-inl.cuh:38), as a MERGEABLE typed
  * aggregate instead of a rank window.
  *
  * Why not `row_number().over(Window.partitionBy(g).orderBy(c)) <= k`:
  * that plan shuffles and sorts ALL n rows per group even when
  * WindowGroupLimit fires (the limit prunes rows, not the exchange+sort
  * of what remains — measured 27–39 s on a 2.5e7-row LAP kernel). And
  * `slice(array_sort(collect_list(...)), 1, k)` holds O(group size)
  * buffers — an ~80 GB executor bomb on a 5e4² cost matrix. This
  * aggregator's state is EXACTLY k entries per group at every moment:
  * partials fold map-side where rows are produced, merge is a k+k
  * sorted merge, and the one shuffle carries #groups × k entries.
  * Same measured kernel: 0.7 s warm — 40× under the window.
  *
  * Buffer layout: flat Array[Double] `[size, c0, j0, c1, j1, …]` sorted
  * ascending by (c, then j) — primitive arrays ride the UnsafeArrayData
  * fast path (the VectorAgg lesson; a PriorityQueue buffer boxes every
  * entry). Payload j is carried as a double: exact for |j| < 2^53, which
  * any id/ordinal payload satisfies.
  */
object TopKAgg {

  private case class TopKMin(k: Int)
      extends Aggregator[(Double, Long), Array[Double], Array[Double]] {
    require(k >= 1, s"k must be >= 1, got $k")

    def zero: Array[Double] = Array.emptyDoubleArray

    @inline private def lt(c1: Double, j1: Double, c2: Double, j2: Double): Boolean =
      c1 < c2 || (c1 == c2 && j1 < j2)

    def reduce(buf0: Array[Double], in: (Double, Long)): Array[Double] = {
      val buf = if (buf0.isEmpty) new Array[Double](2 * k + 1) else buf0
      val n = buf(0).toInt
      val c = in._1
      val j = in._2.toDouble
      if (n < k) {
        var p = n // entry slot to fill; entry e sits at (1+2e, 2+2e)
        while (p > 0 && lt(c, j, buf(2 * p - 1), buf(2 * p))) {
          buf(2 * p + 1) = buf(2 * p - 1); buf(2 * p + 2) = buf(2 * p)
          p -= 1
        }
        buf(2 * p + 1) = c; buf(2 * p + 2) = j
        buf(0) = n + 1.0
      } else if (lt(c, j, buf(2 * k - 1), buf(2 * k))) {
        var p = k - 1 // displace the current max, bubble into place
        while (p > 0 && lt(c, j, buf(2 * p - 1), buf(2 * p))) {
          buf(2 * p + 1) = buf(2 * p - 1); buf(2 * p + 2) = buf(2 * p)
          p -= 1
        }
        buf(2 * p + 1) = c; buf(2 * p + 2) = j
      }
      buf
    }

    def merge(a: Array[Double], b: Array[Double]): Array[Double] =
      if (a.isEmpty) b
      else if (b.isEmpty) a
      else {
        val na = a(0).toInt; val nb = b(0).toInt
        val out = new Array[Double](2 * k + 1)
        var ia = 0; var ib = 0; var o = 0
        while (o < k && (ia < na || ib < nb)) {
          val takeA = ib >= nb || (ia < na &&
            lt(a(1 + 2 * ia), a(2 + 2 * ia), b(1 + 2 * ib), b(2 + 2 * ib)))
          if (takeA) {
            out(1 + 2 * o) = a(1 + 2 * ia); out(2 + 2 * o) = a(2 + 2 * ia); ia += 1
          } else {
            out(1 + 2 * o) = b(1 + 2 * ib); out(2 + 2 * o) = b(2 + 2 * ib); ib += 1
          }
          o += 1
        }
        out(0) = o.toDouble
        out
      }

    /** Flat `[c0, j0, c1, j1, …]` ascending — decode with [[decodeTopK]]. */
    def finish(buf: Array[Double]): Array[Double] =
      if (buf.isEmpty) Array.emptyDoubleArray
      else java.util.Arrays.copyOfRange(buf, 1, 1 + 2 * buf(0).toInt)

    def bufferEncoder: Encoder[Array[Double]] = TopKEncoderHelper.doubleArray
    def outputEncoder: Encoder[Array[Double]] = TopKEncoderHelper.doubleArray
  }

  /** k smallest (value, payload) pairs per group as a flat array column.
    * Usage: `df.groupBy(g).agg(TopKAgg.topKMin(col("c"), col("j"), 16))`. */
  def topKMin(value: Column, payload: Column, k: Int): Column =
    udaf(TopKMin(k), Encoders.tuple(
      Encoders.scalaDouble, Encoders.scalaLong)).apply(value, payload)

  /** Decode a [[topKMin]] flat array into one struct<c:double, j:long> per
    * entry (explode downstream). Runs once per GROUP row, so the
    * interpreted HOF cost is #groups-sized, never data-sized. */
  def decodeTopK(flat: Column): Column = {
    import org.apache.spark.sql.functions._
    transform(sequence(lit(0), ((size(flat) / 2) - 1).cast("int")), e =>
      struct(element_at(flat, e * 2 + 1).as("c"),
        element_at(flat, e * 2 + 2).cast("long").as("j")))
  }
}

private object TopKEncoderHelper {
  import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
  import org.apache.spark.sql.catalyst.encoders.AgnosticEncoders
  val doubleArray: Encoder[Array[Double]] =
    ExpressionEncoder(AgnosticEncoders.ArrayEncoder(
      AgnosticEncoders.PrimitiveDoubleEncoder, containsNull = false))
}
