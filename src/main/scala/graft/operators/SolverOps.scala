package graft.operators

import org.apache.spark.mllib.linalg.{Vectors => MLVectors}
import org.apache.spark.mllib.linalg.distributed.RowMatrix
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Dense factorizations & iterative solvers (SURVEY.md §2.8).
  * MLlib's distributed linear algebra covers the factorizations
  * (computeSVD = distributed Gram + local eig, the same shape as the
  * reference's svdEig path, linalg/svd.cuh:93); the iterative solvers
  * (power iteration, Borůvka MST) are driver-orchestrated DataFrame loops
  * with bounded lineage — one job per iteration, the Spark analog of the
  * reference's restart-style solvers (sparse/solver/lanczos.cuh:35).
  */
object SolverOps {

  private def toRowMatrix(vectors: DataFrame): RowMatrix =
    new RowMatrix(vectors.orderBy(col("id"))
      .select(col("vec")).rdd
      .map(r => MLVectors.dense(r.getSeq[Double](0).toArray)))

  /** Top-k singular values via RowMatrix.computeSVD —
    * reference: linalg/svd.cuh:36 (svd_qr) / tsvd.cuh:34. */
  def singularValues(spark: SparkSession, dir: String, k: Int): DataFrame = {
    val svd = toRowMatrix(Tables.vectors(spark, dir)).computeSVD(k, computeU = false)
    val rows = svd.s.toArray.toSeq.zipWithIndex.map { case (s, i) => (i, s) }
    spark.createDataFrame(rows).toDF("i", "sigma")
      .select(col("i"), round(col("sigma"), 4).as("sigma"))
  }

  /** PCA explained-variance of the top-k components —
    * reference: linalg/pca.cuh:41 (pca_fit returns explained variance). */
  def pcaExplainedVariance(spark: SparkSession, dir: String, k: Int): DataFrame = {
    val (_, variance) = toRowMatrix(Tables.vectors(spark, dir))
      .computePrincipalComponentsAndExplainedVariance(k)
    val rows = variance.toArray.toSeq.zipWithIndex.map { case (v, i) => (i, v) }
    spark.createDataFrame(rows).toDF("i", "explained")
      .select(col("i"), round(col("explained"), 6).as("explained"))
  }

  /** Dominant eigenvalue of the d×d Gram matrix XᵀX: one distributed
    * treeAggregate pass accumulates the d² outer-product partials
    * (mergeable, d bounded — the cov/gram Aggregator pattern of SURVEY §4),
    * then a local symmetric eig on the driver — the same
    * distributed-Gram + local-eig split as the reference's svdEig path
    * (linalg/svd.cuh:93, eig.cuh:121) and MLlib's computeSVD.
    */
  def topEigenGram(spark: SparkSession, dir: String): Double = {
    val vecs = Tables.vectors(spark, dir).select(col("vec"))
    val d = vecs.head().getSeq[Double](0).length
    val gram = vecs.rdd.treeAggregate(new Array[Double](d * d))(
      seqOp = (acc, row) => {
        val x = row.getSeq[Double](0)
        var i = 0
        while (i < d) {
          val xi = x(i)
          var j = 0
          while (j < d) { acc(i * d + j) += xi * x(j); j += 1 }
          i += 1
        }
        acc
      },
      combOp = (a, b) => { var k = 0; while (k < d * d) { a(k) += b(k); k += 1 }; a })
    val m = new breeze.linalg.DenseMatrix(d, d, gram)
    breeze.linalg.eigSym(m).eigenvalues.toArray.max
  }

  /** Borůvka minimum spanning forest over a COO edge list —
    * reference: sparse/solver/mst.cuh:38 (+ detail/mst_solver_inl.cuh).
    * Each round: every component picks its lightest outgoing edge
    * (min_by per component — one aggregation), components merge via the
    * pointer-jumping CC step. Ties broken by (weight, src, dst) — the
    * deterministic "alterated weights" idea of the reference.
    * O(log n) rounds, each a bounded set of joins/aggregations.
    */
  def boruvkaMst(edges: DataFrame): DataFrame = {
    val spark = edges.sparkSession
    import spark.implicits._
    var comp = edges.select(col("src").as("node"))
      .unionByName(edges.select(col("dst").as("node")))
      .distinct().withColumn("comp", col("node")).localCheckpoint(true)
    val e = edges.select(col("src"), col("dst"), col("value")).localCheckpoint(true)
    var chosen = Seq.empty[(Long, Long, Double)].toDF("src", "dst", "value")
    var active = true
    var rounds = 0
    while (active && rounds < 25) {
      val labeled = e
        .join(comp.select(col("node").as("src"), col("comp").as("cs")), Seq("src"))
        .join(comp.select(col("node").as("dst"), col("comp").as("cd")), Seq("dst"))
        .where(col("cs") =!= col("cd"))
      if (labeled.isEmpty) { active = false }
      else {
        // lightest outgoing edge per component (both directions), ties by (value, src, dst)
        val out = labeled.select(col("cs").as("c"), col("src"), col("dst"), col("value"))
          .unionByName(labeled.select(col("cd").as("c"), col("src"), col("dst"), col("value")))
        val best = out.groupBy(col("c"))
          .agg(min(struct(col("value"), col("src"), col("dst"))).as("m"))
          .select(col("m.src").as("src"), col("m.dst").as("dst"), col("m.value").as("value"))
          .distinct()
        chosen = chosen.unionByName(best).localCheckpoint(true)
        // merge: union-find via CC on chosen edges
        comp = LabelOps.connectedComponents(
            chosen.select(col("src"), col("dst")))
          .localCheckpoint(true)
        rounds += 1
      }
    }
    chosen.select(col("src"), col("dst"), round(col("value"), 4).as("value"))
  }
}
