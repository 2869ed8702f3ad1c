package graft

import breeze.linalg.{DenseMatrix, DenseVector}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{MatrixOps, RandomOps, SolverOps, StatsOps, TextOps}

/** Golden-value and invariance checks for the round-7 additions:
  * conjugate gradient, ridge, logistic IRLS, column ranks, bootstrap CI,
  * PMI collocations, isotonic calibration.
  */
class Round7Spec extends AnyFunSuite {
  import TestSpark._

  test("conjugate gradient converges to the Breeze direct solve of (L+I)x=b") {
    val n = 64
    val edges = RandomOps.rmat(spark, 300, 6, 7)
    // 25 CG iterations on a 64-node SPD system is effectively exact
    val got = SolverOps.conjugateGradient(edges, n.toLong, 25).collect()
      .map(r => r.getLong(0).toInt -> r.getDouble(1)).toMap
    // build A = L + I and b locally from the same fixture
    val e = edges.where(col("src") =!= col("dst"))
      .select(least(col("src"), col("dst")), greatest(col("src"), col("dst")))
      .distinct().collect().map(r => (r.getLong(0).toInt, r.getLong(1).toInt))
    val a = DenseMatrix.eye[Double](n)
    e.foreach { case (i, j) =>
      a(i, i) += 1.0; a(j, j) += 1.0; a(i, j) -= 1.0; a(j, i) -= 1.0
    }
    val b = DenseVector.tabulate(n) { i =>
      val h = TestSpark.md5h32(s"$i:cg")
      (h % 1000L).toDouble / 1000.0
    }
    val x = a \ b
    for (i <- 0 until n)
      assert(math.abs(got(i) - x(i)) < 1e-5, s"x($i): ${got(i)} vs ${x(i)}")
  }

  test("ridge matches the Breeze closed form and shrinks toward lstsq as λ→0") {
    val data = graft.Tables.vectors(spark, sf)
      .select(expr("slice(vec, 1, 4)").as("vec"),
        graft.functions.ArrayMath.rowSum(col("vec")).as("y"))
    val rows = data.collect()
    val a = DenseMatrix(rows.map(_.getSeq[Double](0).toArray): _*)
    val y = DenseVector(rows.map(_.getDouble(1)))
    for (lam <- Seq(0.0, 50.0)) {
      val w = SolverOps.ridgeRegression(data, lam, freeIntercept = false)
      val reg = (a.t * a) + (DenseMatrix.eye[Double](4) *:* lam)
      val exact = reg \ (a.t * y)
      for (j <- 0 until 4)
        assert(math.abs(w(j) - exact(j)) < 1e-6, s"λ=$lam w($j)")
    }
  }

  test("logistic IRLS drives the gradient toward zero on a separable-ish fixture") {
    val data = graft.Tables.documents(spark, sf).select(
      array(lit(1.0), log(col("n_chars").cast("double"))).as("vec"),
      (col("lang") === "en").cast("double").as("y"))
    val w = SolverOps.logisticRegression(data, 8)
    // gradient at the fit: Σ (σ(wᵀx) − y)·x ≈ 0 per lane
    val rows = data.collect().map(r => (r.getSeq[Double](0).toArray, r.getDouble(1)))
    val g = new Array[Double](2)
    rows.foreach { case (x, y) =>
      val p = 1.0 / (1.0 + math.exp(-(w(0) * x(0) + w(1) * x(1))))
      g(0) += (p - y) * x(0); g(1) += (p - y) * x(1)
    }
    assert(math.abs(g(0)) / rows.length < 1e-8 && math.abs(g(1)) / rows.length < 1e-8,
      s"gradient ${g.toSeq}")
  }

  test("colRanks equals the local per-column sort rank and is partition-invariant") {
    val v = graft.Tables.vectors(spark, sf).where(col("id") < 100)
      .select(col("id"), expr("slice(vec, 1, 8)").as("vec"))
    val n = v.count()
    val got = MatrixOps.colRanks(v.repartition(7), n).collect()
      .map(r => (r.getLong(0), r.getInt(1)) -> r.getLong(2)).toMap
    val local = v.collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toArray)
    for (pos <- 0 until 8) {
      val sorted = local.map { case (id, vec) => (vec(pos), id) }.sorted
      sorted.zipWithIndex.foreach { case ((_, id), rk) =>
        assert(got((id, pos)) == rk + 1L, s"id=$id pos=$pos")
      }
    }
  }

  test("bootstrap CI brackets the point estimate and is partition-invariant") {
    val docs = graft.Tables.documents(spark, sf)
    val a = StatsOps.bootstrapCI(docs, "doc_id", "n_chars", 100, 3, 98).head()
    val b = StatsOps.bootstrapCI(docs.repartition(13), "doc_id", "n_chars",
      100, 3, 98).head()
    assert(a == b, "counter-hash bootstrap must not depend on partitioning")
    assert(a.getDouble(1) <= a.getDouble(0) && a.getDouble(0) <= a.getDouble(2),
      s"lo ${a.getDouble(1)} <= est ${a.getDouble(0)} <= hi ${a.getDouble(2)}")
  }

  test("PMI is positive for a planted collocation and negative for an anti-pair") {
    import spark.implicits._
    // "aa bb" always adjacent; "cc"/"dd" frequent but never adjacent
    val docs = (0 until 80).map { i =>
      (i.toLong, if (i % 2 == 0) "aa bb xx aa bb yy cc zz dd" else "cc xx dd yy aa bb")
    }.toDF("doc_id", "text")
    val got = TextOps.pmiCollocations(docs, 1L).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getDouble(3)).toMap
    assert(got(("aa", "bb")) > 0.5, s"planted collocation ${got(("aa", "bb"))}")
    assert(!got.contains(("cc", "dd")) || got(("cc", "dd")) < 0.0)
  }

  test("isotonic fit is monotone non-decreasing and mass-preserving") {
    import spark.implicits._
    val scored = (0 until 2000).map { i =>
      val p = (TestSpark.md5h32(s"$i:iso") % 1000L).toDouble / 1000.0
      // noisy monotone-ish label with a deliberate violator region
      val y = if (p > 0.45 && p < 0.55) 1L else if (p > TestSpark.md5h32(s"$i:y") % 1000L / 1000.0) 1L else 0L
      (p, y)
    }.toDF("p", "y")
    val rows = StatsOps.isotonicCalibration(scored, 10)
      .orderBy(col("bin")).collect()
    val iso = rows.map(_.getDouble(3))
    assert(iso.sliding(2).forall(w => w.length < 2 || w(0) <= w(1) + 1e-12),
      s"not monotone: ${iso.toSeq}")
    // weighted mean of the fit equals the weighted mean of the raw rates
    val n = rows.map(_.getLong(1).toDouble)
    val raw = rows.map(_.getDouble(2))
    val mRaw = n.zip(raw).map { case (w, r) => w * r }.sum / n.sum
    val mIso = n.zip(iso).map { case (w, r) => w * r }.sum / n.sum
    assert(math.abs(mRaw - mIso) < 1e-4, s"$mRaw vs $mIso")
  }
}
