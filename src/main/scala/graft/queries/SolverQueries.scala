package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.SolverOps

/** Factorization/solver queries (SURVEY.md §2.8). SVD/PCA/eigen have no
  * SQL oracle (verified against Breeze in SolverSpec → rows-only check
  * here); the MST runs on a constructed graph whose spanning tree is
  * closed-form, giving an exact oracle.
  */
object SolverQueries extends QueryGroup {

  /** Chain 0-1-...-99 (w=1) plus heavy shortcut edges the MST must reject. */
  private def mstFixture(s: SparkSession): DataFrame = {
    val chain = s.range(99).select(col("id").as("src"), (col("id") + 1).as("dst"),
      lit(1.0).as("value"))
    val heavy = s.range(100).select(
      least(col("id"), pmod(col("id") + 37, lit(100))).as("src"),
      greatest(col("id"), pmod(col("id") + 37, lit(100))).as("dst"),
      (lit(10.0) + col("id")).as("value"))
    chain.unionByName(heavy)
  }

  val q: Map[String, (SparkSession, String) => DataFrame] = Map(
    "solver_svd" -> ((s, d) => SolverOps.singularValues(s, d, 5)),
    "solver_pca_var" -> ((s, d) => SolverOps.pcaExplainedVariance(s, d, 5)),
    "solver_top_eigen" -> ((s, d) => {
      val lambda = SolverOps.topEigenGram(s, d)
      s.createDataFrame(Seq(Tuple1(BigDecimal(lambda).setScale(2,
        BigDecimal.RoundingMode.HALF_UP).toDouble))).toDF("lambda1")
    }),
    "solver_mst" -> ((s, d) => SolverOps.boruvkaMst(mstFixture(s))),
  )

  val sql: Map[String, String] = Map(
    "solver_mst" ->
      """SELECT i AS src, i + 1 AS dst, CAST(1.0 AS DOUBLE) AS value
        |FROM range(99) t(i)""".stripMargin,
  )
}
