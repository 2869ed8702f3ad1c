package graft

import breeze.linalg.{svd => bsvd, DenseMatrix}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.SolverOps

/** Numeric verification of the factorization/solver layer against Breeze
  * (driver-side golden implementation — mirrors the reference's
  * pytest-vs-scipy tier, pylibraft/tests/test_sparse.py:69).
  */
class SolverSpec extends AnyFunSuite {
  import TestSpark._

  private lazy val localMatrix: DenseMatrix[Double] = {
    val rows = graft.Tables.vectors(spark, sf).orderBy(col("id"))
      .select(col("vec")).collect().map(_.getSeq[Double](0).toArray)
    DenseMatrix(rows: _*)
  }

  test("distributed SVD singular values match Breeze within 1e-6 rel") {
    val got = SolverOps.singularValues(graft.Tables.vectors(spark, sf), 5).collect()
      .sortBy(_.getInt(0)).map(_.getDouble(1))
    val expected = bsvd(localMatrix).S.toArray.take(5)
    got.zip(expected).foreach { case (g, e) =>
      assert(math.abs(g - e) / e < 1e-4, s"sigma mismatch: $g vs $e")
    }
  }

  test("power-iteration top eigen of Gram equals sigma1^2") {
    val lambda = SolverOps.topEigenGram(graft.Tables.vectors(spark, sf))
    val sigma1 = bsvd(localMatrix).S(0)
    assert(math.abs(lambda - sigma1 * sigma1) / (sigma1 * sigma1) < 1e-6)
  }

  test("PCA explained variance sums below 1 and is descending") {
    val v = SolverOps.pcaExplainedVariance(graft.Tables.vectors(spark, sf), 5).collect()
      .sortBy(_.getInt(0)).map(_.getDouble(1))
    assert(v.sum <= 1.0 + 1e-9)
    assert(v.sameElements(v.sorted.reverse))
  }

  test("Boruvka MST on a weighted two-component graph") {
    import spark.implicits._
    // two triangles with one heavy edge each; MST = 2 light edges per component
    val edges = Seq(
      (0L, 1L, 1.0), (1L, 2L, 2.0), (0L, 2L, 9.0),
      (10L, 11L, 1.0), (11L, 12L, 2.0), (10L, 12L, 9.0)
    ).toDF("src", "dst", "value")
    val mst = SolverOps.boruvkaMst(edges).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(mst == Set((0L, 1L, 1.0), (1L, 2L, 2.0), (10L, 11L, 1.0), (11L, 12L, 2.0)))
  }

  test("MST and CC size-dispatch paths agree (local Kruskal/union-find vs distributed rounds)") {
    import spark.implicits._
    val edges = spark.range(80).selectExpr("id AS src", "id + 1 AS dst",
        "((id * 37) % 101) / 101.0 AS value")
      .union(spark.range(40).selectExpr("id AS src", "id + 40 AS dst", "3.0 + id AS value"))
    val local = SolverOps.boruvkaMst(edges).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val dist = SolverOps.boruvkaMst(edges, localThreshold = 0L).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(local == dist, "dispatch paths must build the same forest")
    val e2 = edges.select(col("src"), col("dst"))
    val lcc = graft.operators.LabelOps.connectedComponents(e2).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val dcc = graft.operators.LabelOps.connectedComponents(e2, localThreshold = 0L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(lcc == dcc, "CC dispatch paths must agree")
  }
}
