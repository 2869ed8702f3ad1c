package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.operators.TextOps.h32

/** Deterministic counter-based RNG + dataset generators (SURVEY.md §2.11,
  * §2.1). The reference's RNG is Philox/PCG counter-based so results are
  * reproducible independent of launch shape (random/rng_state.hpp,
  * rng_device.cuh); the Spark analog keys every draw off
  * `hash(row id, seed, stream)` — a pure expression, never `rand()`, so
  * results are identical under any repartitioning and reproducible by the
  * SQL oracle.
  */
object RandomOps {

  /** Uniform (0,1) from (id, seed, stream): md5-based 32-bit counter hash. */
  def hashU(id: Column, seed: Long, stream: String): Column =
    (h32(concat_ws(":", id, lit(seed), lit(stream))) + lit(0.5)) / lit(4294967296.0)

  /** uniform(lo,hi) — reference: random/rng.cuh:43. */
  def uniform(id: Column, seed: Long, stream: String, lo: Double, hi: Double): Column =
    lit(lo) + hashU(id, seed, stream) * lit(hi - lo)

  /** uniformInt[lo,hi) — reference: random/rng.cuh:94. */
  def uniformInt(id: Column, seed: Long, stream: String, lo: Long, hi: Long): Column =
    pmod(h32(concat_ws(":", id, lit(seed), lit(stream))), lit(hi - lo)) + lit(lo)

  /** standard normal via Box-Muller over two hash-uniform streams —
    * reference: random/rng.cuh:148 (normal). */
  def normal(id: Column, seed: Long, stream: String): Column =
    sqrt(lit(-2.0) * log(hashU(id, seed, stream + "~1"))) *
      cos(lit(2.0 * math.Pi) * hashU(id, seed, stream + "~2"))

  /** Uniform (0,1) from xxhash64 — same counter-hash contract as [[hashU]]
    * (pure expression, partition-invariant) but ~20× cheaper than the md5
    * path. NOT oracle-replicable (DuckDB has no xxhash64): use only for
    * internal draws that are never value-compared (e.g. rsvd's Ω sketch). */
  def hashUFast(id: Column, seed: Long, stream: String): Column =
    (pmod(xxhash64(id, lit(seed), lit(stream)), lit(1L << 52)).cast("double")
      + lit(0.5)) / lit((1L << 52).toDouble)

  /** standard normal via Box-Muller over two xxhash64 streams — the fast
    * variant of [[normal]] for internal (never oracle-compared) draws. */
  def normalFast(id: Column, seed: Long, stream: String): Column =
    sqrt(lit(-2.0) * log(hashUFast(id, seed, stream + "~1"))) *
      cos(lit(2.0 * math.Pi) * hashUFast(id, seed, stream + "~2"))

  /** bernoulli(p) — reference: random/rng.cuh:388. */
  def bernoulli(id: Column, seed: Long, stream: String, p: Double): Column =
    (hashU(id, seed, stream) < lit(p)).cast("int")

  /** normalInt: Box-Muller normal N(mu, sigma²) truncated to integer —
    * reference: random/rng.cuh:195 (detail/rng_device.cuh:242 runs the
    * double Box-Muller then `static_cast<IntType>`, i.e. truncation
    * toward zero — Spark's double→long cast semantics exactly). */
  def normalInt(id: Column, seed: Long, stream: String, mu: Double, sigma: Double): Column =
    (lit(mu) + lit(sigma) * normal(id, seed, stream)).cast("long")

  /** scaled_bernoulli: ±scale coin, val = u < p ? −scale : +scale —
    * reference: random/rng.cuh:431 (detail/rng_device.cuh:296). */
  def scaledBernoulli(id: Column, seed: Long, stream: String, p: Double, scale: Double): Column =
    when(hashU(id, seed, stream) < lit(p), lit(-scale)).otherwise(lit(scale))

  /** normalTable: n×d normal matrix where column j draws N(mu(j), sigma(j)²)
    * — reference: random/rng.cuh:257 (detail/rng_device.cuh:262: per-column
    * mu_vec/sigma_vec lookup). The (id, column-stream) counter hash keeps
    * every cell partition-invariant and oracle-reproducible. */
  def normalTable(spark: SparkSession, n: Long, seed: Long,
      mus: Seq[Double], sigmas: Seq[Double]): DataFrame = {
    require(mus.length == sigmas.length, "mu/sigma tables must align")
    spark.range(n).select(col("id") +: mus.indices.map { j =>
      round(lit(mus(j)) + lit(sigmas(j)) * normal(col("id"), seed, s"t$j"), 6).as(s"x$j")
    }: _*)
  }

  /** Inverse-CDF transforms — reference: random/rng.cuh:479-700
    * (gumbel, lognormal, logistic, exponential, rayleigh, laplace). */
  def exponential(id: Column, seed: Long, stream: String, lambda: Double): Column =
    -log(hashU(id, seed, stream)) / lit(lambda)
  def gumbel(id: Column, seed: Long, stream: String, mu: Double, beta: Double): Column =
    lit(mu) - lit(beta) * log(-log(hashU(id, seed, stream)))
  def logistic(id: Column, seed: Long, stream: String, mu: Double, s: Double): Column = {
    val u = hashU(id, seed, stream)
    lit(mu) + lit(s) * log(u / (lit(1.0) - u))
  }
  def rayleigh(id: Column, seed: Long, stream: String, sigma: Double): Column =
    lit(sigma) * sqrt(lit(-2.0) * log(hashU(id, seed, stream)))
  def laplace(id: Column, seed: Long, stream: String, mu: Double, b: Double): Column = {
    val u = hashU(id, seed, stream)
    lit(mu) - lit(b) * signum(u - lit(0.5)) * log(lit(1.0) - lit(2.0) * abs(u - lit(0.5)))
  }
  def lognormal(id: Column, seed: Long, stream: String, mu: Double, sigma: Double): Column =
    exp(lit(mu) + lit(sigma) * normal(id, seed, stream))

  /** permute: hash-ordered row permutation — reference: random/permute.cuh:90.
    * At scale this is a full sort, the same cost as the reference's
    * gather-from-permutation; the hash key is uniformly distributed so the
    * range partitioner is balanced by construction.
    */
  def permute(df: DataFrame, idCol: String, seed: Long): DataFrame =
    // distributed global rank (RankUtils TeraSort shape) — the bare
    // ORDER-only window moved every row to one task
    graft.operators.RankUtils.globalRowNumber(df,
      Seq(md5(concat_ws(":", col(idCol), lit(seed))), col(idCol)), "ord")

  /** Weighted sampling without replacement via the exp-sort / A-Res trick
    * (key = ln(u)/w, take top-k) — reference:
    * random/sample_without_replacement.cuh:90. A per-partition top-k heap
    * (TakeOrderedAndProject) — no full sort at scale.
    */
  def sampleWithoutReplacement(df: DataFrame, id: Column, weight: Column,
      k: Int, seed: Long): DataFrame =
    df.withColumn("__key", log(hashU(id, seed, "swr")) / weight)
      .orderBy(col("__key").desc, id.asc)
      .limit(k)
      .drop("__key")

  /** Deterministic per-key bottom-k sample — the distributed, MERGEABLE
    * form of per-group reservoir sampling: keep the k ids with the
    * smallest 52-bit md5 key within each group. Because "k smallest
    * hashes" is a commutative idempotent fold, partials combine map-side
    * and across shards/days exactly like a sketch (this is the KMV
    * construction — the same k-minimum-values state that estimates
    * distinct counts), where rand()-reservoirs are order-dependent and
    * unmergeable. State: k entries per group (TopKAgg bounded heap); the
    * one shuffle carries #groups × k rows. 52 hash bits keep the
    * double-typed heap key exact (< 2^53). */
  def bottomKSample(df: DataFrame, keyCol: String, idCol: String,
      k: Int, seed: Long): DataFrame = {
    val h = conv(substring(md5(
      concat_ws(":", col(idCol), lit(seed), lit("bks"))), 1, 13), 16, 10)
      .cast("long")
    df.select(col(keyCol).as("g"), h.as("h"), col(idCol).cast("long").as("id"))
      .groupBy(col("g"))
      .agg(graft.functions.TopKAgg.topKMin(col("h").cast("double"), col("id"), k)
        .as("flat"))
      .select(col("g"), posexplode(graft.functions.TopKAgg.decodeTopK(col("flat")))
        .as(Seq("pos", "e")))
      .select(col("g"), (col("pos") + 1).cast("long").as("rk"),
        col("e.c").cast("long").as("h"), col("e.j").as("id"))
  }

  /** make_blobs: k Gaussian clusters in d dims, deterministic centroids
    * c(cl,j) = ((cl·7+j) mod 5)·10 — reference: random/make_blobs.cuh:58. */
  def makeBlobs(spark: SparkSession, n: Long, d: Int, k: Int, seed: Long): DataFrame = {
    val cl = pmod(col("id"), lit(k))
    val vec = transform(sequence(lit(0), lit(d - 1)), j => {
      val centroid = pmod(cl * 7 + j, lit(5)).cast("double") * 10.0
      val u1 = (h32(concat_ws(":", col("id"), j, lit(seed), lit("b1"))) + lit(0.5)) / lit(4294967296.0)
      val u2 = (h32(concat_ws(":", col("id"), j, lit(seed), lit("b2"))) + lit(0.5)) / lit(4294967296.0)
      centroid + sqrt(lit(-2.0) * log(u1)) * cos(lit(2.0 * math.Pi) * u2)
    })
    spark.range(n).select(col("id"), cl.as("cluster"), vec.as("vec"))
  }

  /** make_regression: y = Σ_j x_j·(j+1) + 0.1·ε —
    * reference: random/make_regression.cuh:64. */
  def makeRegression(spark: SparkSession, n: Long, d: Int, seed: Long): DataFrame = {
    val y = (0 until d).map { j =>
      uniform(col("id"), seed, s"x$j", -1.0, 1.0) * lit(j + 1.0)
    }.reduce(_ + _) + normal(col("id"), seed, "eps") * 0.1
    spark.range(n).select(col("id"), round(y, 6).as("y"))
  }

  /** discrete: weighted categorical draw by inverse-CDF over cumulative
    * weights — reference: random/rng.cuh (discrete; cf.
    * sampleWithoutReplacement:794). Weights must sum to 1. */
  def discrete(id: Column, seed: Long, stream: String, weights: Seq[Double]): Column = {
    val u = hashU(id, seed, stream)
    val cum = weights.scanLeft(0.0)(_ + _).tail
    cum.init.zipWithIndex.reverse.foldLeft(lit(weights.length - 1): Column) {
      case (acc, (c, i)) => when(u < c, i).otherwise(acc)
    }
  }

  /** multi_variable_gaussian: x = L·z with L the Cholesky factor of a fixed
    * SPD Σ (local d×d decomposition, distributed per-row transform) —
    * reference: random/multi_variable_gaussian.cuh:28. */
  def cholesky3(sigma: Array[Array[Double]]): Array[Array[Double]] = {
    val l = Array.ofDim[Double](3, 3)
    for (i <- 0 until 3; j <- 0 to i) {
      val s = (0 until j).map(t => l(i)(t) * l(j)(t)).sum
      if (i == j) l(i)(j) = math.sqrt(sigma(i)(i) - s)
      else l(i)(j) = (sigma(i)(j) - s) / l(j)(j)
    }
    l
  }

  def multiVariableGaussian(spark: SparkSession, n: Long, seed: Long,
      l: Array[Array[Double]]): DataFrame = {
    val z = (0 until 3).map(i => normal(col("id"), seed, s"m$i"))
    val x = (0 until 3).map(i => (0 to i).map(j => lit(l(i)(j)) * z(j)).reduce(_ + _))
    spark.range(n).select(col("id") +: x.zipWithIndex.map { case (c, i) =>
      round(c, 6).as(s"x$i") }: _*)
  }

  /** rmat_rectangular_gen: R-MAT power-law edges by recursive bisection —
    * reference: random/rmat_rectangular_generator.cuh:86. One row per edge,
    * each bit of (src,dst) decided by a counter-hash draw against the
    * quadrant probabilities θ = (a,b,c,d); fully parallel, no state.
    */
  def rmat(spark: SparkSession, nEdges: Long, scale: Int, seed: Long,
      a: Double = 0.57, b: Double = 0.19, c: Double = 0.19): DataFrame = {
    val src = (0 until scale).map { l =>
      val u = hashU(col("id"), seed, s"r$l")
      // top-half (src bit 1) when u falls past a+b
      when(u >= lit(a + b), lit(1L << (scale - 1 - l))).otherwise(0L)
    }.reduce(_ + _)
    val dst = (0 until scale).map { l =>
      val u = hashU(col("id"), seed, s"r$l")
      val u2 = hashU(col("id"), seed, s"q$l")
      // right-half bit: within top rows P(right)=d/(c+d), within bottom b/(a+b)
      val pRight = when(u >= lit(a + b), lit((1.0 - a - b - c) / (1.0 - a - b)))
        .otherwise(lit(b / (a + b)))
      when(u2 < pRight, lit(1L << (scale - 1 - l))).otherwise(0L)
    }.reduce(_ + _)
    spark.range(nEdges).select(col("id").as("eid"), src.as("src"), dst.as("dst"))
  }
}
