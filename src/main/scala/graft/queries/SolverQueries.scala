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
    "solver_single_linkage" -> ((s, d) => {
      // chain with distinct hash weights (37 coprime 101 ⇒ no ties) plus
      // heavy shortcuts the MST rejects; k=5 cuts the 4 heaviest chain
      // edges → components are contiguous segments (closed-form oracle)
      val chain = s.range(59).select(col("id").as("src"), (col("id") + 1).as("dst"),
        (pmod(col("id") * 37, lit(101)).cast("double") / 101.0).as("value"))
      val heavy = s.range(60).select(
        least(col("id"), pmod(col("id") + 23, lit(60))).as("src"),
        greatest(col("id"), pmod(col("id") + 23, lit(60))).as("dst"),
        (lit(2.0) + col("id")).as("value"))
      SolverOps.singleLinkage(chain.unionByName(heavy), 5)
        .select(col("node"), col("comp"))
    }),
    "solver_partition" -> ((s, d) => graft.operators.SpectralOps.analyzePartition(s, d)),
    "solver_modularity" -> ((s, d) => graft.operators.SpectralOps.modularity(s, d)),
    "solver_qr" -> ((s, d) => SolverOps.qrR(s, d)),
    "solver_lstsq" -> ((s, d) => {
      val v = graft.Tables.vectors(s, d)
      val pair = v.select(expr("slice(vec, 1, 8)").as("vec"),
        graft.functions.ArrayMath.rowSum(col("vec")).as("y"))
      val x = SolverOps.lstsq(pair)
      s.createDataFrame(x.toSeq.zipWithIndex.map { case (v, i) =>
        (i, BigDecimal(v).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble) })
        .toDF("j", "coef")
    }),
    "solver_rsvd" -> ((s, d) => {
      val sv = SolverOps.rsvdSingularValues(graft.Tables.vectors(s, d), 5)
      s.createDataFrame(sv.zipWithIndex.map { case (v, i) =>
        (i, BigDecimal(v).setScale(2, BigDecimal.RoundingMode.HALF_UP).toDouble) })
        .toDF("i", "sigma")
    }),
    "solver_eigsh" -> ((s, d) => {
      // symmetric Laplacian of the 30-node chain graph (known spectrum)
      val chain = s.range(29).select(col("id").as("row"), (col("id") + 1).as("col"),
        lit(-1.0).as("value"))
      val sym = chain.unionByName(chain.select(col("col").as("row"),
        col("row").as("col"), col("value")))
      val deg = s.range(30).select(col("id").as("row"), col("id").as("col"),
        org.apache.spark.sql.functions.when(col("id") === 0 || col("id") === 29, 1.0)
          .otherwise(2.0).as("value"))
      val lap = sym.unionByName(deg)
      val ev = SolverOps.eigshSmallest(lap, 30, 3)
      s.createDataFrame(ev.zipWithIndex.map { case (v, i) =>
        (i, BigDecimal(v).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble) })
        .toDF("i", "eig")
    }),
    "solver_eigsh_sharded" -> ((s, d) => {
      // same 30-chain Laplacian as solver_eigsh, through the sharded-basis
      // thick-restart path; spectrum is closed-form → real SQL oracle
      val chain = s.range(29).select(col("id").as("row"), (col("id") + 1).as("col"),
        lit(-1.0).as("value"))
      val sym = chain.unionByName(chain.select(col("col").as("row"),
        col("row").as("col"), col("value")))
      val deg = s.range(30).select(col("id").as("row"), col("id").as("col"),
        org.apache.spark.sql.functions.when(col("id") === 0 || col("id") === 29, 1.0)
          .otherwise(2.0).as("value"))
      // m > n: the basis reaches the full space, the residual vanishes and
      // one phase returns the exact spectrum — no restart cycles
      val ev = SolverOps.eigshSmallestSharded(sym.unionByName(deg), 30, 3,
        m = 40, maxRestarts = 4)
      s.createDataFrame(ev.zipWithIndex.map { case (v, i) =>
        (i, BigDecimal(v).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble) })
        .toDF("i", "eig")
    }),
    "solver_lap" -> ((s, d) => SolverOps.lapAssignment(s, 50)),
    "solver_lap_dist" -> ((s, d) => SolverOps.lapAuctionDistributed(s, 500)),
    "solver_rsvd_sparse" -> ((s, d) => {
      val sv = SolverOps.rsvdSparse(graft.Tables.cooOrdersParts(s, d), 5,
        colDomain = Some(graft.Tables.part(s, d).select(col("p_partkey").as("id"))))
      s.createDataFrame(sv.zipWithIndex.map { case (v, i) =>
        (i, BigDecimal(v).setScale(2, BigDecimal.RoundingMode.HALF_UP).toDouble) })
        .toDF("i", "sigma")
    }),
    "solver_tsvd_recon" -> ((s, d) => {
      val (err, total) = SolverOps.tsvdReconstructionError(graft.Tables.vectors(s, d), 8)
      s.createDataFrame(Seq((
        BigDecimal(err).setScale(2, BigDecimal.RoundingMode.HALF_UP).toDouble,
        BigDecimal(err / total).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)))
        .toDF("frob_err_sq", "err_ratio")
    }),
  )

  private val graphCte =
    """WITH coo AS (
      |  SELECT l_orderkey AS row, l_partkey AS col, sum(l_quantity) AS value
      |  FROM lineitem GROUP BY 1, 2),
      |e0 AS (
      |  SELECT a.col AS src, b.col AS dst, CAST(count(*) AS DOUBLE) AS value
      |  FROM coo a JOIN coo b ON a.row = b.row AND a.col < b.col
      |  GROUP BY 1, 2),
      |g AS (
      |  SELECT src, dst, value, src % 5 AS cs, dst % 5 AS cd FROM (
      |    SELECT src, dst, value FROM e0
      |    UNION ALL SELECT dst AS src, src AS dst, value FROM e0))""".stripMargin

  val sql: Map[String, String] = Map(
    // Constant = the Hungarian optimum of the deterministic md5-hash cost
    // fixture (n=500, costs = h32(i:j:lap) mod 1e6) — independently
    // computable from the fixture alone; Solver2Spec cross-checks the
    // distributed auction against the in-repo Hungarian at n=60. The
    // auction's ε-CS certificate + integer costs guarantee exact equality.
    "solver_lap_dist" ->
      "SELECT CAST(500 AS BIGINT) AS n_assigned, CAST(1584818 AS BIGINT) AS total_cost",
    "solver_mst" ->
      """SELECT i AS src, i + 1 AS dst, CAST(1.0 AS DOUBLE) AS value
        |FROM range(99) t(i)""".stripMargin,
    "solver_single_linkage" ->
      """WITH ch AS (
        |  SELECT i AS src, ((i*37) % 101) / 101.0 AS w FROM range(59) t(i)),
        |cut AS (SELECT src FROM ch ORDER BY w DESC LIMIT 4)
        |SELECT node,
        |  coalesce((SELECT max(c.src) + 1 FROM cut c WHERE c.src < node), 0) AS comp
        |FROM range(60) t(node)""".stripMargin,
    // path-graph Laplacian spectrum is closed form: 2 − 2cos(πq/n)
    "solver_eigsh_sharded" ->
      """SELECT i, round(2.0 - 2.0 * cos(pi() * i / 30), 6) + 0.0 AS eig
        |FROM range(3) t(i)""".stripMargin,
    "solver_partition" ->
      s"""$graphCte,
         |sizes AS (
         |  SELECT cs AS cluster, count(*) AS size FROM
         |    (SELECT DISTINCT src, cs FROM g) GROUP BY 1),
         |cut AS (
         |  SELECT cs AS cluster, round(sum(value), 2) AS cut_weight
         |  FROM g WHERE cs <> cd GROUP BY 1)
         |SELECT sizes.cluster, sizes.size, coalesce(cut.cut_weight, 0.0) AS cut_weight
         |FROM sizes LEFT JOIN cut ON sizes.cluster = cut.cluster""".stripMargin,
    "solver_modularity" ->
      s"""$graphCte,
         |m AS (SELECT sum(value) AS m2 FROM g),
         |pc AS (
         |  SELECT cs, sum(CASE WHEN cs = cd THEN value ELSE 0.0 END) AS ec,
         |         sum(value) AS dc
         |  FROM g GROUP BY cs)
         |SELECT round(sum(ec/m.m2 - (dc/m.m2)*(dc/m.m2)), 6) AS modularity
         |FROM pc, m""".stripMargin,
  )
}
