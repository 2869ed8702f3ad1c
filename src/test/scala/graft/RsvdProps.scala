package graft

import breeze.linalg.{svd => bsvd, DenseMatrix}
import org.scalacheck.{Gen, Prop, Properties}
import org.scalacheck.Prop.forAll
import org.scalacheck.Test.Parameters
import graft.operators.SolverOps

/** Property test for the sparse two-pass randomized SVD: when rank(A) ≤
  * the sketch width l, the Halko sketch spans the whole row space and the
  * returned singular values are EXACT (up to float arithmetic) — across
  * random shapes, ranks, and entry patterns, including rank-deficient
  * cases (the seam the round-4 eig-whitening rewrite fixed: a
  * Cholesky-based orthonormalization died on exactly these). Each sample
  * runs the full distributed pipeline — few samples. */
object RsvdProps extends Properties("SparseRsvd") {

  override def overrideParameters(p: Parameters): Parameters =
    p.withMinSuccessfulTests(5)

  private lazy val spark = TestSpark.spark

  private val caseGen = for {
    rows <- Gen.choose(20, 60)
    cols <- Gen.choose(8, 24)
    r <- Gen.choose(1, 4)
    seed <- Gen.choose(0L, 100000L)
  } yield (rows, cols, r, seed)

  property("rank-r matrices: sketch-exact sigma matches Breeze, any shape/seed") =
    forAll(caseGen) { case (rows, cols, r, seed) =>
      val rng = new scala.util.Random(seed)
      // A = Σ_k u_k v_kᵀ — rank ≤ r by construction
      val u = Array.fill(r, rows)(rng.nextDouble() * 2 - 1)
      val v = Array.fill(r, cols)(rng.nextDouble() * 2 - 1)
      val dense = DenseMatrix.tabulate(rows, cols)((i, j) =>
        (0 until r).map(k => u(k)(i) * v(k)(j)).sum)
      import spark.implicits._
      val entries = for {
        i <- 0 until rows; j <- 0 until cols if dense(i, j) != 0.0
      } yield (i.toLong, j.toLong, dense(i, j))
      val coo = entries.toDF("row", "col", "value")
      val got = SolverOps.rsvdSparse(coo, r,
        colDomain = Some(spark.range(cols).toDF("id")))
      val exact = bsvd(dense).S.toArray.take(r)
      val ok = got.zip(exact).forall { case (g, e) =>
        e < 1e-9 || math.abs(g - e) / e < 1e-6
      }
      Prop(ok) :| s"rows=$rows cols=$cols r=$r got=${got.toList} exact=${exact.toList}"
    }
}
