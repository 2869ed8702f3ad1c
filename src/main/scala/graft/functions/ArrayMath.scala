package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Column-expression vector math over `ARRAY<DOUBLE>` lanes.
  *
  * This is the Spark realization of the reference's element-wise /
  * map-reduce layer (reference: cpp/include/raft/core/operators.hpp:27-391,
  * cpp/include/raft/linalg/map.cuh:95, cpp/include/raft/linalg/reduce.cuh:148).
  * Everything here stays inside Catalyst higher-order functions — codegen'd,
  * no UDFs — so per-row folds run as a no-shuffle whole-stage-codegen loop,
  * the Catalyst analog of the reference fusing main_op/reduce_op/final_op
  * into one kernel (SURVEY.md §3.2).
  */
object ArrayMath {

  /** Per-row fold: sum of f(lane). `reduce(..., main_op, sum)` analog. */
  def foldSum(v: Column, f: Column => Column): Column =
    aggregate(transform(v, f), lit(0.0), (acc, x) => acc + x)

  /** dot(a, b) — reference: cpp/include/raft/linalg/dot.cuh:38. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  /** L2 norm per row — reference: cpp/include/raft/linalg/norm.cuh:51 (L2Norm). */
  def l2(v: Column): Column = sqrt(foldSum(v, x => x * x))

  /** L1 norm — reference: linalg/norm_types.hpp (L1Norm). */
  def l1(v: Column): Column = foldSum(v, x => abs(x))

  /** L-infinity norm (max |x|) — reference: linalg/norm_types.hpp (LinfNorm). */
  def linf(v: Column): Column = array_max(transform(v, x => abs(x)))

  /** L0 "norm" (nonzero count) — reference: linalg/norm_types.hpp (L0PseudoNorm). */
  def l0(v: Column): Column =
    aggregate(v, lit(0L), (acc, x) => acc + when(x =!= 0.0, 1L).otherwise(0L))

  /** Row sum / mean / min / max. */
  def rowSum(v: Column): Column  = foldSum(v, identity)
  def rowMean(v: Column): Column = rowSum(v) / size(v)
  def rowMin(v: Column): Column  = array_min(v)
  def rowMax(v: Column): Column  = array_max(v)

  /** argmax with lowest-index tie-break, 0-based —
    * reference: cpp/include/raft/matrix/argmax.cuh:28 (ties: smallest index,
    * matching cub::ArgMax semantics).
    */
  def argmax(v: Column): Column = array_position(v, array_max(v)) - 1
  /** argmin, 0-based — reference: cpp/include/raft/matrix/argmin.cuh:28. */
  def argmin(v: Column): Column = array_position(v, array_min(v)) - 1

  /** Scale every lane: out = v * s (s a scalar Column) —
    * reference: cpp/include/raft/linalg/multiply.cuh:61. */
  def scale(v: Column, s: Column): Column = transform(v, x => x * s)

  /** Element-wise binary ops between two vectors —
    * reference: cpp/include/raft/linalg/eltwise.cuh:29-74. */
  def add(a: Column, b: Column): Column = zip_with(a, b, (x, y) => x + y)
  def sub(a: Column, b: Column): Column = zip_with(a, b, (x, y) => x - y)
  def mul(a: Column, b: Column): Column = zip_with(a, b, (x, y) => x * y)

  /** axpy: y + alpha*x — reference: cpp/include/raft/linalg/axpy.cuh:36. */
  def axpy(alpha: Column, x: Column, y: Column): Column =
    zip_with(x, y, (xi, yi) => alpha * xi + yi)

  /** Row-normalize by a given norm column (L1/L2/Linf chosen by caller) —
    * reference: cpp/include/raft/linalg/normalize.cuh:48 (row_normalize).
    * Zero-norm rows pass through unchanged (reference divides guarded by eps).
    */
  def normalize(v: Column, norm: Column): Column =
    transform(v, x => when(norm =!= 0.0, x / norm).otherwise(x))

  /** zero_small_values: x := 0 where |x| < eps —
    * reference: cpp/include/raft/matrix/threshold.cuh:32. */
  def threshold(v: Column, eps: Column): Column =
    transform(v, x => when(abs(x) < eps, 0.0).otherwise(x))

  /** Round every lane to `d` decimals (declared-precision policy for
    * float hash-matching vs the oracle, SURVEY.md §7 hard-parts).
    * `+ 0.0` collapses IEEE −0.0 to +0.0 — Spark's round and DuckDB's
    * disagree on the sign of −0.0 and the hash compare sees the difference.
    */
  def roundLanes(v: Column, d: Int): Column = transform(v, x => round(x, d) + 0.0)

  /** Cosine similarity between two vectors; 0 when either norm is 0. */
  def cosine(a: Column, b: Column): Column = {
    val denom = l2(a) * l2(b)
    when(denom =!= 0.0, dot(a, b) / denom).otherwise(0.0)
  }
}
