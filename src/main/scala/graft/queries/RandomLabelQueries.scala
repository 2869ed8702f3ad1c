package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.{GraphOps, LabelOps, RandomOps, SolverOps}
import graft.Tables

/** RNG / generator / label-op queries (SURVEY.md §2.11, §2.1, §2.7).
  * Every random draw is a pure function of (id, seed, stream) via the
  * md5-prefix hash, so the DuckDB oracle reproduces the exact bits.
  */
object RandomLabelQueries extends QueryGroup {

  /** DuckDB uniform(0,1) for the same (id,seed,stream) counter as Spark. */
  private def u(id: String, stream: String, seed: Long = 42): String =
    s"((CAST(('0x' || substr(md5(concat_ws(':', $id, $seed, '$stream')), 1, 8)) AS BIGINT) + 0.5) / 4294967296.0)"
  private def h(id: String, stream: String, seed: Long = 42): String =
    s"CAST(('0x' || substr(md5(concat_ws(':', $id, $seed, '$stream')), 1, 8)) AS BIGINT)"

  val q: Map[String, (SparkSession, String) => DataFrame] = Map(
    "rng_uniform" -> ((s, d) => s.range(1000).select(col("id"),
      round(RandomOps.uniform(col("id"), 42, "u", 0.0, 1.0), 6).as("u"))),
    "rng_normal" -> ((s, d) => s.range(1000).select(col("id"),
      round(RandomOps.normal(col("id"), 42, "n"), 6).as("z"))),
    "rng_bernoulli" -> ((s, d) => s.range(1000).select(col("id"),
      RandomOps.bernoulli(col("id"), 42, "b", 0.3).as("b"))),
    "rng_uniform_int" -> ((s, d) => s.range(1000).select(col("id"),
      RandomOps.uniformInt(col("id"), 42, "i", 10, 20).as("k"))),
    "rng_dists" -> ((s, d) => s.range(500).select(col("id"),
      round(RandomOps.exponential(col("id"), 42, "e", 2.0), 6).as("expo"),
      round(RandomOps.gumbel(col("id"), 42, "g", 0.0, 1.0), 6).as("gum"),
      round(RandomOps.logistic(col("id"), 42, "l", 0.0, 1.0), 6).as("logi"),
      round(RandomOps.rayleigh(col("id"), 42, "r", 1.0), 6).as("ray"),
      round(RandomOps.laplace(col("id"), 42, "p", 0.0, 1.0), 6).as("lap"),
      round(RandomOps.lognormal(col("id"), 42, "o", 0.0, 0.5), 6).as("lgn"))),
    "rng_normal_int" -> ((s, d) => s.range(1000).select(col("id"),
      RandomOps.normalInt(col("id"), 42, "ni", 100.0, 15.0).as("k"))),
    "rng_scaled_bernoulli" -> ((s, d) => s.range(1000).select(col("id"),
      RandomOps.scaledBernoulli(col("id"), 42, "sb", 0.3, 2.5).as("v"))),
    "rng_normal_table" -> ((s, d) =>
      RandomOps.normalTable(s, 500, 42, Seq(0.0, 10.0, 100.0), Seq(1.0, 2.0, 5.0))),
    "rng_permute" -> ((s, d) =>
      RandomOps.permute(Tables.customer(s, d).select(col("c_custkey")), "c_custkey", 9)
        .select(col("ord"), col("c_custkey"))),
    "rng_sample_weighted" -> ((s, d) => {
      val li = Tables.lineitem(s, d)
        .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
          (col("l_orderkey") * 8 + col("l_linenumber")).as("rid"))
      RandomOps.sampleWithoutReplacement(li, col("rid"), col("l_quantity"), 50, 42)
        .select(col("l_orderkey"), col("l_linenumber"))
    }),
    "gen_blobs" -> ((s, d) => {
      // lane-exploded to scalar rows: the driver's pandas sort cannot order
      // ARRAY cells (same convention as MatrixQueries.lanes)
      val b = RandomOps.makeBlobs(s, 500, 8, 4, 42)
      b.select(col("id"), col("cluster"), posexplode(col("vec")).as(Seq("pos", "v")))
        .select(col("id"), col("cluster"), col("pos"),
          (round(col("v"), 6) + 0.0).as("v"))
    }),
    "gen_regression" -> ((s, d) => RandomOps.makeRegression(s, 1000, 4, 42)),
    "gen_rmat" -> ((s, d) => RandomOps.rmat(s, 1000, 8, 42)),
    "label_unique" -> ((s, d) =>
      LabelOps.uniqueLabels(Tables.customer(s, d), "c_mktsegment")),
    "label_monotonic" -> ((s, d) => {
      val relabeled = Tables.embeddings(s, d)
        .select((col("label") * 3 + 1).cast("long").as("y"))
      LabelOps.makeMonotonic(relabeled, "y")
    }),
    "label_monotonic_remap" -> ((s, d) => {
      val relabeled = Tables.embeddings(s, d)
        .select(col("vec_id"), (col("label") * 3 + 1).cast("long").as("y"))
      LabelOps.makeMonotonicRemap(relabeled, "y", "vec_id")
    }),
    "label_ovr" -> ((s, d) =>
      LabelOps.oneVsRest(Tables.embeddings(s, d), "label", "vec_id", 3L)),
    "rng_discrete" -> ((s, d) => s.range(1000).select(col("id"),
      RandomOps.discrete(col("id"), 42, "c", Seq(0.1, 0.2, 0.3, 0.4)).as("cat"))),
    "rng_mvn" -> ((s, d) => RandomOps.multiVariableGaussian(s, 500, 42,
      RandomOps.cholesky3(Array(Array(4.0, 2.0, 1.0), Array(2.0, 3.0, 0.5),
        Array(1.0, 0.5, 2.0))))),
    "label_cc" -> ((s, d) => {
      // chain graph in blocks of 50: closed-form components for the oracle
      val edges = s.range(200).where(pmod(col("id"), lit(50)) =!= 49)
        .select(col("id").as("src"), (col("id") + 1).as("dst"))
      LabelOps.connectedComponents(edges).select(col("node"), col("comp"))
    }),
    // PageRank over the deterministic R-MAT graph (same hash draws the
    // gen_rmat oracle replays); 10 fixed rounds -> the oracle replays the
    // identical iteration as a recursive CTE. Engines differ only in
    // float summation order (~1e-14), absorbed by round(.,6).
    "graph_pagerank" -> ((s, d) =>
      GraphOps.pageRank(RandomOps.rmat(s, 1000, 8, 42), 256L, 10)
        .select(col("node"), (round(col("r"), 6) + 0.0).as("r"))),
    // deterministic label propagation over the same R-MAT graph: 3
    // synchronous rounds, plurality vote with total tie order — all
    // integer state, so the unrolled SQL replay matches bit-for-bit
    "graph_lpa" -> ((s, d) =>
      GraphOps.labelPropagation(RandomOps.rmat(s, 1000, 8, 42), 256L, 3)),
    // triangle counts via degree-ordered wedges; the oracle uses the
    // INDEPENDENT numeric-order brute formulation — same answer reached
    // by a different algorithm is the strongest hash check
    "graph_triangles" -> ((s, d) =>
      GraphOps.triangleCounts(RandomOps.rmat(s, 1000, 8, 42))),
    // link prediction: common-neighbor counts + Adamic-Adar weights for
    // NON-edges at distance 2, wedges keyed by the middle vertex
    "graph_common_neighbors" -> ((s, d) =>
      GraphOps.commonNeighbors(RandomOps.rmat(s, 1000, 8, 42))),
    // 4 synchronous peel rounds of the 3-core; the oracle replays each
    // round (the labelPropagation fixed-round convention)
    "graph_kcore" -> ((s, d) =>
      GraphOps.kCore(RandomOps.rmat(s, 1000, 8, 42), 3L, 4)),
    // DeepWalk corpus: one 6-step walk per vertex, each neighbor pick a
    // counter-hash argmin — the oracle replays the steps as unrolled
    // arg_min aggregates over the same md5 keys
    "graph_walks" -> ((s, d) =>
      GraphOps.randomWalks(RandomOps.rmat(s, 1000, 8, 42), 6)),
    // topic-conditioned authority: restart mass confined to an 8-seed
    // set (nodes 0,31,...,217), 10 synchronous rounds
    "graph_ppr" -> ((s, d) =>
      GraphOps.personalizedPageRank(RandomOps.rmat(s, 1000, 8, 42), 256L,
        s.range(8).select((col("id") * 31).as("node")), 10)
        .select(col("node"), (round(col("r"), 6) + 0.0).as("r"))),
    // node2vec biased walks (p=1/2, q=2 as integer weights 4/2/1):
    // the oracle replays each step's replica argmin over the same keys
    "graph_node2vec" -> ((s, d) =>
      GraphOps.node2vecWalks(RandomOps.rmat(s, 1000, 8, 42), 6)),
    // average local clustering + global transitivity in one row
    "graph_clustering" -> ((s, d) =>
      GraphOps.clusteringCoefficient(RandomOps.rmat(s, 1000, 8, 42))),
    // degree assortativity (Newman 2002) over endpoint degree pairs
    "graph_assortativity" -> ((s, d) =>
      GraphOps.degreeAssortativity(RandomOps.rmat(s, 1000, 8, 42))),
    // exact 0..3-hop ball sizes — the bounded oracle form of the
    // neighborhood function (the scale path is graph_hyperball)
    "graph_ball_exact" -> ((s, d) =>
      GraphOps.neighborhoodFunction(RandomOps.rmat(s, 1000, 8, 42), 3)),
    // HyperBall 2-hop census, m=16 HLL registers as (node, reg) ROWS;
    // the oracle replays registers, merges and the corrected estimate
    "graph_hyperball" -> ((s, d) =>
      GraphOps.hyperBall(RandomOps.rmat(s, 1000, 8, 42), 2, 16)),
    // the neighborhood-function curve N(t), t=0..3 — the effective-
    // diameter statistic HyperBall exists for
    "graph_hyperball_nf" -> ((s, d) =>
      GraphOps.hyperBallNF(RandomOps.rmat(s, 1000, 8, 42), 3, 16)
        .select(col("t"), (round(col("nf"), 4) + 0.0).as("nf"))),
    // HITS after 5 L1-normalized rounds; unrolled half-step oracle
    "graph_hits" -> ((s, d) =>
      GraphOps.hits(RandomOps.rmat(s, 1000, 8, 42), 256L, 5)
        .select(col("node"), (round(col("h"), 6) + 0.0).as("h"),
          (round(col("a"), 6) + 0.0).as("a"))),
    // 3 peel rounds of the 4-truss (edges in ≥2 triangles); the oracle
    // recounts support each round with the brute wedge formulation —
    // independent of the degree-ordered enumeration the op uses
    "graph_ktruss" -> ((s, d) =>
      GraphOps.kTruss(RandomOps.rmat(s, 1000, 8, 42), 4L, 3)),
    // truncated harmonic centrality from the exact 0..3-hop ball census;
    // H = (6·Δ1 + 3·Δ2 + 2·Δ3)/6 keeps the fold all-integer until one
    // final division (order-independent across engines)
    "graph_harmonic" -> ((s, d) =>
      GraphOps.harmonicCentrality(RandomOps.rmat(s, 1000, 8, 42), 3)),
    // 90%-effective diameter interpolated from the HyperBall N(t) curve
    "graph_eff_diameter" -> ((s, d) =>
      GraphOps.effectiveDiameter(RandomOps.rmat(s, 1000, 8, 42), 3, 16, 0.9)),
    // mergeable KMV bottom-k sample: 5 smallest 52-bit md5 keys per
    // market segment — the distributed reservoir-sampling analog
    "rng_bottomk_sample" -> ((s, d) =>
      RandomOps.bottomKSample(Tables.customer(s, d), "c_mktsegment",
        "c_custkey", 5, 7)),
    // conjugate gradient on A = L + I of the rmat graph (SPD), 3
    // iterations from x=0; the oracle unrolls the same 3 steps with
    // MATERIALIZED state CTEs (each level has 3 consumers)
    "solver_cg" -> ((s, d) =>
      SolverOps.conjugateGradient(RandomOps.rmat(s, 1000, 8, 42), 256L, 3)),
  )

  private def rmatSql(nEdges: Int, scale: Int, seed: Long,
      a: Double, b: Double, c: Double): String = {
    val srcBits = (0 until scale).map { l =>
      s"(CASE WHEN ${u("id", s"r$l", seed)} >= ${a + b} THEN ${1L << (scale - 1 - l)} ELSE 0 END)"
    }.mkString(" + ")
    val dstBits = (0 until scale).map { l =>
      val pTop = (1.0 - a - b - c) / (1.0 - a - b)
      val pBot = b / (a + b)
      s"""(CASE WHEN ${u("id", s"q$l", seed)} <
         |  (CASE WHEN ${u("id", s"r$l", seed)} >= ${a + b} THEN $pTop ELSE $pBot END)
         |THEN ${1L << (scale - 1 - l)} ELSE 0 END)""".stripMargin
    }.mkString(" + ")
    s"SELECT id AS eid, $srcBits AS src, $dstBits AS dst FROM range($nEdges) t(id)"
  }

  val sql: Map[String, String] = Map(
    "rng_uniform" ->
      s"SELECT id, round(${u("id", "u")}, 6) AS u FROM range(1000) t(id)",
    "rng_normal" ->
      s"""SELECT id, round(sqrt(-2.0 * ln(${u("id", "n~1")})) *
         |cos(2.0 * pi() * ${u("id", "n~2")}), 6) AS z FROM range(1000) t(id)""".stripMargin,
    "rng_bernoulli" ->
      s"SELECT id, CAST(${u("id", "b")} < 0.3 AS INT) AS b FROM range(1000) t(id)",
    "rng_uniform_int" ->
      s"SELECT id, ${h("id", "i")} % 10 + 10 AS k FROM range(1000) t(id)",
    "rng_dists" ->
      s"""SELECT id,
         |  round(-ln(${u("id", "e")}) / 2.0, 6) AS expo,
         |  round(-ln(-ln(${u("id", "g")})), 6) AS gum,
         |  round(ln(${u("id", "l")} / (1.0 - ${u("id", "l")})), 6) AS logi,
         |  round(sqrt(-2.0 * ln(${u("id", "r")})), 6) AS ray,
         |  round(-sign(${u("id", "p")} - 0.5) * ln(1.0 - 2.0 * abs(${u("id", "p")} - 0.5)), 6) AS lap,
         |  round(exp(0.5 * sqrt(-2.0 * ln(${u("id", "o~1")})) *
         |        cos(2.0 * pi() * ${u("id", "o~2")})), 6) AS lgn
         |FROM range(500) t(id)""".stripMargin,
    "rng_normal_int" ->
      s"""SELECT id, CAST(trunc(100.0 + 15.0 * sqrt(-2.0 * ln(${u("id", "ni~1")})) *
         |cos(2.0 * pi() * ${u("id", "ni~2")})) AS BIGINT) AS k FROM range(1000) t(id)""".stripMargin,
    "rng_scaled_bernoulli" ->
      s"""SELECT id, CASE WHEN ${u("id", "sb")} < 0.3 THEN -2.5 ELSE 2.5 END AS v
         |FROM range(1000) t(id)""".stripMargin,
    "rng_normal_table" -> {
      val cols = Seq((0.0, 1.0), (10.0, 2.0), (100.0, 5.0)).zipWithIndex.map {
        case ((mu, sg), j) =>
          s"round($mu + $sg * sqrt(-2.0 * ln(${u("id", s"t$j~1")})) * cos(2.0 * pi() * ${u("id", s"t$j~2")}), 6) AS x$j"
      }.mkString(",\n  ")
      s"SELECT id,\n  $cols\nFROM range(500) t(id)"
    },
    "rng_permute" ->
      """SELECT row_number() OVER (ORDER BY md5(concat_ws(':', c_custkey, 9)), c_custkey) AS ord,
        |       c_custkey
        |FROM customer""".stripMargin,
    "rng_sample_weighted" ->
      s"""SELECT l_orderkey, l_linenumber FROM lineitem
         |ORDER BY ln(${u("l_orderkey * 8 + l_linenumber", "swr")}) / l_quantity DESC,
         |         l_orderkey * 8 + l_linenumber
         |LIMIT 50""".stripMargin,
    "gen_blobs" -> {
      val u1 = "((CAST(('0x' || substr(md5(concat_ws(':', id, j, 42, 'b1')), 1, 8)) AS BIGINT) + 0.5) / 4294967296.0)"
      val u2 = "((CAST(('0x' || substr(md5(concat_ws(':', id, j, 42, 'b2')), 1, 8)) AS BIGINT) + 0.5) / 4294967296.0)"
      s"""SELECT id, id % 4 AS cluster, j AS pos,
         |  round(CAST(((id % 4) * 7 + j) % 5 AS DOUBLE) * 10.0 +
         |        sqrt(-2.0 * ln($u1)) * cos(2.0 * pi() * $u2), 6) + 0.0 AS v
         |FROM range(500) t(id), range(8) s(j)""".stripMargin
    },
    "gen_regression" -> {
      val terms = (0 until 4).map { j =>
        s"(-1.0 + ${u("id", s"x$j")} * 2.0) * ${j + 1.0}"
      }.mkString(" + ")
      s"""SELECT id, round($terms +
         |  sqrt(-2.0 * ln(${u("id", "eps~1")})) * cos(2.0 * pi() * ${u("id", "eps~2")}) * 0.1,
         |  6) AS y
         |FROM range(1000) t(id)""".stripMargin
    },
    "gen_rmat" -> rmatSql(1000, 8, 42, 0.57, 0.19, 0.19),
    "rng_discrete" ->
      s"""SELECT id, CASE WHEN ${u("id", "c")} < 0.1 THEN 0
         |  WHEN ${u("id", "c")} < 0.30000000000000004 THEN 1
         |  WHEN ${u("id", "c")} < 0.6000000000000001 THEN 2
         |  ELSE 3 END AS cat
         |FROM range(1000) t(id)""".stripMargin,
    "rng_mvn" -> {
      val l = graft.operators.RandomOps.cholesky3(Array(
        Array(4.0, 2.0, 1.0), Array(2.0, 3.0, 0.5), Array(1.0, 0.5, 2.0)))
      def z(i: Int) =
        s"(sqrt(-2.0 * ln(${u("id", s"m$i~1")})) * cos(2.0 * pi() * ${u("id", s"m$i~2")}))"
      val xs = (0 until 3).map { i =>
        val terms = (0 to i).map(j => s"${l(i)(j)} * ${z(j)}").mkString(" + ")
        s"round($terms, 6) AS x$i"
      }.mkString(", ")
      s"SELECT id, $xs FROM range(500) t(id)"
    },
    "label_unique" -> "SELECT DISTINCT c_mktsegment AS label FROM customer",
    "label_monotonic" ->
      """WITH dl AS (SELECT DISTINCT CAST(label*3+1 AS BIGINT) AS label FROM embeddings)
        |SELECT label, dense_rank() OVER (ORDER BY label) - 1 AS dense FROM dl""".stripMargin,
    "label_monotonic_remap" ->
      """WITH dl AS (SELECT DISTINCT CAST(label*3+1 AS BIGINT) AS label FROM embeddings),
        |d AS (SELECT label, dense_rank() OVER (ORDER BY label) - 1 AS dense FROM dl)
        |SELECT e.vec_id AS id, CAST(e.label*3+1 AS BIGINT) AS label, d.dense
        |FROM embeddings e JOIN d ON CAST(e.label*3+1 AS BIGINT) = d.label""".stripMargin,
    "label_ovr" ->
      """SELECT vec_id AS id, CASE WHEN label = 3 THEN 1 ELSE 0 END AS ovr
        |FROM embeddings""".stripMargin,
    "label_cc" ->
      "SELECT id AS node, (id // 50) * 50 AS comp FROM range(200) t(id)",
    "graph_pagerank" ->
      s"""WITH RECURSIVE
         |raw AS (${rmatSql(1000, 8, 42, 0.57, 0.19, 0.19)}),
         |e AS (SELECT DISTINCT src, dst FROM raw),
         |deg AS (SELECT src, count(*)::DOUBLE AS od FROM e GROUP BY 1),
         |pr AS (
         |  SELECT 0 AS it, id::BIGINT AS node, 1.0/256 AS r FROM range(256) t(id)
         |  UNION ALL
         |  SELECT it + 1, node, 0.15/256 + 0.85 * s AS r FROM (
         |    SELECT p.it AS it, n.id AS node, COALESCE(sum(contrib.cv), 0.0) AS s
         |    FROM range(256) n(id)
         |    CROSS JOIN (SELECT DISTINCT it FROM pr WHERE it < 10) p
         |    LEFT JOIN (
         |      SELECT pr2.it AS cit, e.dst AS d, pr2.r / deg.od AS cv
         |      FROM pr pr2 JOIN e ON e.src = pr2.node JOIN deg ON deg.src = e.src
         |    ) contrib ON contrib.d = n.id AND contrib.cit = p.it
         |    GROUP BY 1, 2)
         |)
         |SELECT node, round(r, 6) + 0.0 AS r FROM pr WHERE it = 10""".stripMargin,
    "graph_lpa" -> {
      def round(r: Int): String = {
        val prev = s"l${r - 1}"
        s"""v$r AS (SELECT u.src, l.label, count(*) AS c
           |       FROM und u JOIN $prev l ON l.node = u.dst GROUP BY 1, 2),
           |p$r AS (SELECT src AS node, label FROM (
           |  SELECT src, label,
           |    row_number() OVER (PARTITION BY src ORDER BY c DESC, label) AS rn
           |  FROM v$r) WHERE rn = 1),
           |l$r AS (SELECT l.node, COALESCE(p.label, l.label) AS label
           |        FROM $prev l LEFT JOIN p$r p ON p.node = l.node)""".stripMargin
      }
      s"""WITH raw AS (${rmatSql(1000, 8, 42, 0.57, 0.19, 0.19)}),
         |e0 AS (SELECT DISTINCT src, dst FROM raw WHERE src <> dst),
         |und AS (SELECT DISTINCT src, dst FROM (
         |  SELECT src, dst FROM e0 UNION ALL SELECT dst, src FROM e0)),
         |l0 AS (SELECT id::BIGINT AS node, id::BIGINT AS label FROM range(256) t(id)),
         |${(1 to 3).map(round).mkString(",\n")}
         |SELECT node, label FROM l3""".stripMargin
    },
    // numeric-order brute triangles: e1=(x,y), e2=(y,z), e3=(x,z) with
    // x<y<z each counted once — algorithm-independent of the Spark
    // degree-ordered wedge implementation
    "graph_triangles" ->
      s"""WITH raw AS (${rmatSql(1000, 8, 42, 0.57, 0.19, 0.19)}),
         |und AS (SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
         |        FROM raw WHERE src <> dst),
         |t AS (SELECT e1.a AS x, e1.b AS y, e2.b AS z
         |      FROM und e1
         |      JOIN und e2 ON e2.a = e1.b
         |      JOIN und e3 ON e3.a = e1.a AND e3.b = e2.b)
         |SELECT node, count(*) AS n_tri FROM (
         |  SELECT x AS node FROM t
         |  UNION ALL SELECT y FROM t
         |  UNION ALL SELECT z FROM t)
         |GROUP BY 1""".stripMargin,
    "graph_common_neighbors" ->
      s"""WITH raw AS (${rmatSql(1000, 8, 42, 0.57, 0.19, 0.19)}),
         |und AS (SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
         |        FROM raw WHERE src <> dst),
         |adj AS (SELECT a AS m, b AS x FROM und
         |        UNION ALL SELECT b, a FROM und),
         |dg AS (SELECT m, count(*) AS dm FROM adj GROUP BY 1),
         |w AS (SELECT p.x AS a, q.x AS b, count(*) AS shared,
         |             round(sum(1.0 / ln(dg.dm)), 6) + 0.0 AS adamic_adar
         |      FROM adj p JOIN adj q ON p.m = q.m AND p.x < q.x
         |      JOIN dg ON dg.m = p.m
         |      GROUP BY 1, 2)
         |SELECT w.a, w.b, w.shared, w.adamic_adar FROM w
         |LEFT JOIN und ON und.a = w.a AND und.b = w.b
         |WHERE und.a IS NULL AND w.shared >= 2""".stripMargin,
    "graph_kcore" -> {
      def round(r: Int): String = {
        val prev = s"e${r - 1}"
        s"""d$r AS (SELECT node, count(*) AS deg FROM (
           |  SELECT a AS node FROM $prev UNION ALL SELECT b FROM $prev)
           |  GROUP BY 1),
           |k$r AS (SELECT node FROM d$r WHERE deg >= 3),
           |e$r AS (SELECT e.a, e.b FROM $prev e
           |        JOIN k$r ka ON ka.node = e.a
           |        JOIN k$r kb ON kb.node = e.b)""".stripMargin
      }
      s"""WITH raw AS (${rmatSql(1000, 8, 42, 0.57, 0.19, 0.19)}),
         |e0 AS (SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
         |       FROM raw WHERE src <> dst),
         |${(1 to 4).map(round).mkString(",\n")}
         |SELECT node, count(*) AS deg FROM (
         |  SELECT a AS node FROM e4 UNION ALL SELECT b FROM e4)
         |GROUP BY 1""".stripMargin
    },
    "graph_walks" -> {
      def step(t: Int): String =
        s"""s$t AS (SELECT s.walk AS walk,
           |  arg_min(a.x, ${h(s"concat_ws(':', s.walk, $t, a.x)", "walk")} * 65536 + a.x) AS node
           |  FROM s${t - 1} s JOIN adj a ON a.m = s.node GROUP BY 1)""".stripMargin
      s"""WITH raw AS (${rmatSql(1000, 8, 42, 0.57, 0.19, 0.19)}),
         |und AS (SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
         |        FROM raw WHERE src <> dst),
         |adj AS (SELECT a AS m, b AS x FROM und UNION ALL SELECT b, a FROM und),
         |s0 AS (SELECT DISTINCT m AS walk, m AS node FROM adj),
         |${(1 to 6).map(step).mkString(",\n")}
         |${(0 to 6).map(t => s"SELECT walk, $t AS step, node FROM s$t").mkString("\nUNION ALL ")}""".stripMargin
    },
    "graph_ppr" ->
      s"""WITH RECURSIVE
         |raw AS (${rmatSql(1000, 8, 42, 0.57, 0.19, 0.19)}),
         |e AS (SELECT DISTINCT src, dst FROM raw),
         |deg AS (SELECT src, count(*)::DOUBLE AS od FROM e GROUP BY 1),
         |sd AS (SELECT id * 31 AS node FROM range(8) t(id)),
         |nd AS (SELECT n.id::BIGINT AS node,
         |         CASE WHEN sd.node IS NULL THEN 0.0 ELSE 1.0 END AS is_seed
         |       FROM range(256) n(id) LEFT JOIN sd ON sd.node = n.id),
         |pr AS (
         |  SELECT 0 AS it, node, is_seed / 8 AS r FROM nd
         |  UNION ALL
         |  SELECT it + 1, node, 0.15 * is_seed / 8 + 0.85 * s AS r FROM (
         |    SELECT p.it AS it, nd.node AS node, nd.is_seed AS is_seed,
         |           COALESCE(sum(contrib.cv), 0.0) AS s
         |    FROM nd
         |    CROSS JOIN (SELECT DISTINCT it FROM pr WHERE it < 10) p
         |    LEFT JOIN (
         |      SELECT pr2.it AS cit, e.dst AS d, pr2.r / deg.od AS cv
         |      FROM pr pr2 JOIN e ON e.src = pr2.node JOIN deg ON deg.src = e.src
         |    ) contrib ON contrib.d = nd.node AND contrib.cit = p.it
         |    GROUP BY 1, 2, 3)
         |)
         |SELECT node, round(r, 6) + 0.0 AS r FROM pr WHERE it = 10""".stripMargin,
    "graph_node2vec" -> {
      // MATERIALIZED: each step reads the previous state and adj twice
      def step(t: Int): String =
        s"""c$t AS MATERIALIZED (SELECT s.walk AS walk, s.node AS cur, a.x AS x,
           |  CASE WHEN a.x = s.prev THEN 4
           |       WHEN pa.px IS NOT NULL THEN 2 ELSE 1 END AS w
           |  FROM s${t - 1} s JOIN adj a ON a.m = s.node
           |  LEFT JOIN adj2 pa ON pa.pm = s.prev AND pa.px = a.x),
           |s$t AS MATERIALIZED (SELECT walk, cur AS prev,
           |  arg_min(x, ${h(s"concat_ws(':', walk, $t, x, rep)", "n2v")} * 2048 + x * 8 + rep) AS node
           |  FROM (SELECT c.*, r.rep FROM c$t c, unnest(range(1, c.w + 1)) AS r(rep))
           |  GROUP BY walk, cur)""".stripMargin
      s"""WITH raw AS MATERIALIZED (${rmatSql(1000, 8, 42, 0.57, 0.19, 0.19)}),
         |und AS MATERIALIZED (SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
         |        FROM raw WHERE src <> dst),
         |adj AS MATERIALIZED (SELECT a AS m, b AS x FROM und UNION ALL SELECT b, a FROM und),
         |adj2 AS MATERIALIZED (SELECT m AS pm, x AS px FROM adj),
         |s0 AS MATERIALIZED (SELECT DISTINCT m AS walk, m AS prev, m AS node FROM adj),
         |${(1 to 6).map(step).mkString(",\n")}
         |${(0 to 6).map(t => s"SELECT walk, $t AS step, node FROM s$t").mkString("\nUNION ALL ")}""".stripMargin
    },
    "graph_clustering" ->
      s"""WITH raw AS MATERIALIZED (${rmatSql(1000, 8, 42, 0.57, 0.19, 0.19)}),
         |und AS MATERIALIZED (SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
         |        FROM raw WHERE src <> dst),
         |adj AS MATERIALIZED (SELECT a AS m, b AS x FROM und UNION ALL SELECT b, a FROM und),
         |dg AS MATERIALIZED (SELECT m, count(*) AS deg FROM adj GROUP BY 1),
         |t3 AS MATERIALIZED (SELECT e1.a AS x, e1.b AS y, e2.b AS z
         |      FROM und e1
         |      JOIN und e2 ON e2.a = e1.b
         |      JOIN und e3 ON e3.a = e1.a AND e3.b = e2.b),
         |trit AS MATERIALIZED (SELECT node, count(*) AS n_tri FROM (
         |  SELECT x AS node FROM t3
         |  UNION ALL SELECT y FROM t3
         |  UNION ALL SELECT z FROM t3) GROUP BY 1),
         |n AS (SELECT dg.m AS node, dg.deg AS deg, COALESCE(trit.n_tri, 0) AS t
         |      FROM dg LEFT JOIN trit ON trit.node = dg.m)
         |SELECT count(*) AS n_nodes,
         |  round(avg(CASE WHEN deg >= 2 THEN 2.0 * t / (deg * (deg - 1))
         |                 ELSE 0.0 END), 6) + 0.0 AS avg_cc,
         |  round(CAST(sum(t) AS DOUBLE) /
         |        sum(CASE WHEN deg >= 2 THEN deg * (deg - 1) / 2 ELSE 0 END), 6)
         |    + 0.0 AS transitivity
         |FROM n""".stripMargin,
    "graph_assortativity" ->
      s"""WITH raw AS MATERIALIZED (${rmatSql(1000, 8, 42, 0.57, 0.19, 0.19)}),
         |und AS MATERIALIZED (SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
         |        FROM raw WHERE src <> dst),
         |adj AS MATERIALIZED (SELECT a AS m, b AS x FROM und UNION ALL SELECT b, a FROM und),
         |dg AS MATERIALIZED (SELECT m, count(*) AS d FROM adj GROUP BY 1)
         |SELECT round(corr(CAST(d1.d AS DOUBLE), CAST(d2.d AS DOUBLE)), 6) + 0.0
         |         AS assortativity,
         |       count(*) AS n_pairs
         |FROM adj JOIN dg d1 ON d1.m = adj.m JOIN dg d2 ON d2.m = adj.x""".stripMargin,
    "graph_ball_exact" -> {
      def hop(t: Int): String =
        s"""b$t AS MATERIALIZED (SELECT DISTINCT v, u FROM (
           |  SELECT v, u FROM b${t - 1}
           |  UNION ALL
           |  SELECT b.v, a.x FROM b${t - 1} b JOIN adj a ON a.m = b.u))""".stripMargin
      s"""WITH raw AS MATERIALIZED (${rmatSql(1000, 8, 42, 0.57, 0.19, 0.19)}),
         |und AS MATERIALIZED (SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
         |        FROM raw WHERE src <> dst),
         |adj AS MATERIALIZED (SELECT a AS m, b AS x FROM und UNION ALL SELECT b, a FROM und),
         |b0 AS MATERIALIZED (SELECT DISTINCT m AS v, m AS u FROM adj),
         |${(1 to 3).map(hop).mkString(",\n")}
         |${(0 to 3).map(t =>
             s"SELECT v AS node, $t AS t, count(*) AS size FROM b$t GROUP BY 1")
           .mkString("\nUNION ALL ")}""".stripMargin
    },
    "graph_hyperball" -> {
      def merge(t: Int): String =
        s"""s$t AS MATERIALIZED (SELECT v, reg, max(rank) AS rank FROM (
           |  SELECT a.x AS v, s.reg, s.rank FROM s${t - 1} s JOIN adj a ON a.m = s.v
           |  UNION ALL SELECT v, reg, rank FROM s${t - 1}) GROUP BY 1, 2)""".stripMargin
      s"""WITH raw AS MATERIALIZED (${rmatSql(1000, 8, 42, 0.57, 0.19, 0.19)}),
         |und AS MATERIALIZED (SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
         |        FROM raw WHERE src <> dst),
         |adj AS MATERIALIZED (SELECT a AS m, b AS x FROM und UNION ALL SELECT b, a FROM und),
         |own AS MATERIALIZED (SELECT u,
         |  ${h("u", "hbj")} % 16 AS reg,
         |  CASE WHEN ${h("u", "hbw")} = 0 THEN 33
         |       ELSE 33 - length(bin(${h("u", "hbw")})) END AS rank
         |  FROM (SELECT DISTINCT m AS u FROM adj)),
         |s0 AS MATERIALIZED (SELECT u AS v, reg, rank FROM own),
         |${(1 to 2).map(merge).mkString(",\n")},
         |agg AS (SELECT v, sum(power(2.0, -rank)) + (16 - count(*)) AS z,
         |               CAST(16 - count(*) AS DOUBLE) AS zeros
         |        FROM s2 GROUP BY v)
         |SELECT v AS node,
         |  round(CASE WHEN 0.673 * 16 * 16 / z <= 2.5 * 16 AND zeros > 0
         |             THEN 16 * ln(16 / zeros)
         |             ELSE 0.673 * 16 * 16 / z END, 4) AS est
         |FROM agg""".stripMargin
    },
    "graph_hyperball_nf" -> {
      def merge(t: Int): String =
        s"""s$t AS MATERIALIZED (SELECT v, reg, max(rank) AS rank FROM (
           |  SELECT a.x AS v, s.reg, s.rank FROM s${t - 1} s JOIN adj a ON a.m = s.v
           |  UNION ALL SELECT v, reg, rank FROM s${t - 1}) GROUP BY 1, 2)""".stripMargin
      def est(t: Int): String =
        s"""est$t AS (SELECT sum(CASE WHEN 0.673 * 16 * 16 / z <= 2.5 * 16 AND zeros > 0
           |                    THEN 16 * ln(16 / zeros)
           |                    ELSE 0.673 * 16 * 16 / z END) AS nf
           |  FROM (SELECT v, sum(power(2.0, -rank)) + (16 - count(*)) AS z,
           |               CAST(16 - count(*) AS DOUBLE) AS zeros
           |        FROM s$t GROUP BY v))""".stripMargin
      s"""WITH raw AS MATERIALIZED (${rmatSql(1000, 8, 42, 0.57, 0.19, 0.19)}),
         |und AS MATERIALIZED (SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
         |        FROM raw WHERE src <> dst),
         |adj AS MATERIALIZED (SELECT a AS m, b AS x FROM und UNION ALL SELECT b, a FROM und),
         |own AS MATERIALIZED (SELECT u,
         |  ${h("u", "hbj")} % 16 AS reg,
         |  CASE WHEN ${h("u", "hbw")} = 0 THEN 33
         |       ELSE 33 - length(bin(${h("u", "hbw")})) END AS rank
         |  FROM (SELECT DISTINCT m AS u FROM adj)),
         |s0 AS MATERIALIZED (SELECT u AS v, reg, rank FROM own),
         |${(1 to 3).map(merge).mkString(",\n")},
         |${(0 to 3).map(est).mkString(",\n")}
         |${(0 to 3).map(t =>
             s"SELECT $t AS t, round(nf, 4) + 0.0 AS nf FROM est$t")
           .mkString("\nUNION ALL ")}""".stripMargin
    },
    "graph_harmonic" -> {
      def hop(t: Int): String =
        s"""b$t AS MATERIALIZED (SELECT DISTINCT v, u FROM (
           |  SELECT v, u FROM b${t - 1}
           |  UNION ALL
           |  SELECT b.v, a.x FROM b${t - 1} b JOIN adj a ON a.m = b.u))""".stripMargin
      s"""WITH raw AS MATERIALIZED (${rmatSql(1000, 8, 42, 0.57, 0.19, 0.19)}),
         |und AS MATERIALIZED (SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
         |        FROM raw WHERE src <> dst),
         |adj AS MATERIALIZED (SELECT a AS m, b AS x FROM und UNION ALL SELECT b, a FROM und),
         |b0 AS MATERIALIZED (SELECT DISTINCT m AS v, m AS u FROM adj),
         |${(1 to 3).map(hop).mkString(",\n")},
         |${(0 to 3).map(t =>
             s"s$t AS (SELECT v, count(*) AS c FROM b$t GROUP BY 1)").mkString(",\n")}
         |SELECT s0.v AS node,
         |  round((6 * (s1.c - s0.c) + 3 * (s2.c - s1.c) + 2 * (s3.c - s2.c)) / 6.0, 6)
         |    + 0.0 AS h
         |FROM s0 JOIN s1 USING (v) JOIN s2 USING (v) JOIN s3 USING (v)""".stripMargin
    },
    "graph_eff_diameter" -> {
      def merge(t: Int): String =
        s"""s$t AS MATERIALIZED (SELECT v, reg, max(rank) AS rank FROM (
           |  SELECT a.x AS v, s.reg, s.rank FROM s${t - 1} s JOIN adj a ON a.m = s.v
           |  UNION ALL SELECT v, reg, rank FROM s${t - 1}) GROUP BY 1, 2)""".stripMargin
      def est(t: Int): String =
        s"""est$t AS (SELECT sum(CASE WHEN 0.673 * 16 * 16 / z <= 2.5 * 16 AND zeros > 0
           |                    THEN 16 * ln(16 / zeros)
           |                    ELSE 0.673 * 16 * 16 / z END) AS nf
           |  FROM (SELECT v, sum(power(2.0, -rank)) + (16 - count(*)) AS z,
           |               CAST(16 - count(*) AS DOUBLE) AS zeros
           |        FROM s$t GROUP BY v))""".stripMargin
      s"""WITH raw AS MATERIALIZED (${rmatSql(1000, 8, 42, 0.57, 0.19, 0.19)}),
         |und AS MATERIALIZED (SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
         |        FROM raw WHERE src <> dst),
         |adj AS MATERIALIZED (SELECT a AS m, b AS x FROM und UNION ALL SELECT b, a FROM und),
         |own AS MATERIALIZED (SELECT u,
         |  ${h("u", "hbj")} % 16 AS reg,
         |  CASE WHEN ${h("u", "hbw")} = 0 THEN 33
         |       ELSE 33 - length(bin(${h("u", "hbw")})) END AS rank
         |  FROM (SELECT DISTINCT m AS u FROM adj)),
         |s0 AS MATERIALIZED (SELECT u AS v, reg, rank FROM own),
         |${(1 to 3).map(merge).mkString(",\n")},
         |${(0 to 3).map(est).mkString(",\n")},
         |nf AS (${(0 to 3).map(t => s"SELECT $t AS t, nf FROM est$t")
             .mkString(" UNION ALL ")}),
         |tgt AS (SELECT nf * 0.9 AS target FROM est3),
         |stp AS (SELECT a.t, a.nf, b.nf AS pnf
         |        FROM nf a LEFT JOIN nf b ON b.t = a.t - 1)
         |SELECT round(min(CASE WHEN t = 0 THEN 0.0
         |                 ELSE t - 1 + (target - pnf) / (nf - pnf) END), 4) + 0.0 AS d_eff,
         |  round(max(target), 4) + 0.0 AS target
         |FROM stp, tgt WHERE nf >= target AND (t = 0 OR pnf < target)""".stripMargin
    },
    "rng_bottomk_sample" ->
      """WITH hh AS (
        |  SELECT c_mktsegment AS g,
        |    CAST(('0x' || substr(md5(concat_ws(':', c_custkey, 7, 'bks')), 1, 13))
        |      AS BIGINT) AS h,
        |    CAST(c_custkey AS BIGINT) AS id
        |  FROM customer),
        |r AS (SELECT g, h, id,
        |        row_number() OVER (PARTITION BY g ORDER BY h, id) AS rk
        |      FROM hh)
        |SELECT g, rk, h, id FROM r WHERE rk <= 5""".stripMargin,
    "graph_hits" -> {
      // unnormalized linear iteration, ONE final L1 normalization —
      // mirrors GraphOps.hits exactly. MATERIALIZED: each level is
      // referenced twice (next half-step + final/normalizer), so the
      // unmaterialized plan re-evaluates the chain exponentially
      // (a measured multi-hour hang on the earlier 3-ref form)
      def halfSteps(r: Int): String =
        s"""a$r AS MATERIALIZED (SELECT e.dst AS node, sum(h.h) AS a
           |  FROM e JOIN h${r - 1} h ON h.node = e.src GROUP BY 1),
           |h$r AS MATERIALIZED (SELECT e.src AS node, sum(a.a) AS h
           |  FROM e JOIN a$r a ON a.node = e.dst GROUP BY 1)""".stripMargin
      s"""WITH raw AS MATERIALIZED (${rmatSql(1000, 8, 42, 0.57, 0.19, 0.19)}),
         |e AS MATERIALIZED (SELECT DISTINCT src, dst FROM raw),
         |nd AS MATERIALIZED (SELECT id::BIGINT AS node FROM range(256) t(id)),
         |h0 AS MATERIALIZED (SELECT DISTINCT src AS node, 1.0 AS h FROM e),
         |${(1 to 5).map(halfSteps).mkString(",\n")}
         |SELECT nd.node,
         |  round(COALESCE(h5.h, 0.0) / (SELECT sum(h) FROM h5), 6) + 0.0 AS h,
         |  round(COALESCE(a5.a, 0.0) / (SELECT sum(a) FROM a5), 6) + 0.0 AS a
         |FROM nd LEFT JOIN h5 ON h5.node = nd.node
         |        LEFT JOIN a5 ON a5.node = nd.node""".stripMargin
    },
    "graph_ktruss" -> {
      // MATERIALIZED for the same reason as graph_hits: each round
      // references the previous edge set 4× (adj twice, support join,
      // the filtered output) — unmaterialized this is 4^3 R-MAT replays
      def round(r: Int): String = {
        val prev = s"e${r - 1}"
        s"""adj$r AS MATERIALIZED (SELECT a AS m, b AS x FROM $prev
           |  UNION ALL SELECT b, a FROM $prev),
           |sup$r AS MATERIALIZED (SELECT w.a, w.b, count(*) AS sup
           |  FROM (SELECT p.x AS a, q.x AS b FROM adj$r p
           |        JOIN adj$r q ON p.m = q.m AND p.x < q.x) w
           |  JOIN $prev e ON e.a = w.a AND e.b = w.b GROUP BY 1, 2),
           |e$r AS MATERIALIZED (SELECT e.a, e.b FROM $prev e
           |  LEFT JOIN sup$r s ON s.a = e.a AND s.b = e.b
           |  WHERE COALESCE(s.sup, 0) >= 2)""".stripMargin
      }
      s"""WITH raw AS MATERIALIZED (${rmatSql(1000, 8, 42, 0.57, 0.19, 0.19)}),
         |e0 AS MATERIALIZED (SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
         |       FROM raw WHERE src <> dst),
         |${(1 to 3).map(round).mkString(",\n")}
         |SELECT a, b FROM e3""".stripMargin
    },
    // CG unrolled: per iteration SpMV (neighbor-sum join), rr/pap scalar
    // dots, x/r update with α = rr/pap, then β = rr'/rr and the new p.
    // Each state level feeds 3+ consumers → MATERIALIZED throughout
    // (the graph_hits lesson). A = L + I: Ax = (deg+1)x − Σ_{j∈N} x_j.
    "solver_cg" -> {
      def iter(t: Int): String = {
        val prev = s"st${t - 1}"
        s"""nb$t AS MATERIALIZED (SELECT u.u AS i, sum(s2.p) AS sp
           |  FROM und u JOIN $prev s2 ON s2.i = u.v GROUP BY 1),
           |ap$t AS MATERIALIZED (SELECT s.i,
           |    (s.dg + 1) * s.p - coalesce(nb.sp, 0.0) AS ap
           |  FROM $prev s LEFT JOIN nb$t nb ON nb.i = s.i),
           |sc$t AS MATERIALIZED (SELECT sum(s.r * s.r) AS rr,
           |    sum(s.p * a.ap) AS pap
           |  FROM $prev s JOIN ap$t a ON a.i = s.i),
           |up$t AS MATERIALIZED (SELECT s.i, s.dg,
           |    s.x + (c.rr / c.pap) * s.p AS x,
           |    s.r - (c.rr / c.pap) * a.ap AS r, s.p AS p0
           |  FROM $prev s JOIN ap$t a ON a.i = s.i CROSS JOIN sc$t c),
           |sc2$t AS MATERIALIZED (SELECT sum(r * r) AS rr2 FROM up$t),
           |st$t AS MATERIALIZED (SELECT u.i, u.dg, u.x, u.r,
           |    u.r + (c2.rr2 / c.rr) * u.p0 AS p
           |  FROM up$t u CROSS JOIN sc$t c CROSS JOIN sc2$t c2)""".stripMargin
      }
      val b = "(CAST(('0x' || substr(md5(concat_ws(':', n.i, 'cg')), 1, 8)) " +
        "AS BIGINT) % 1000) / 1000.0"
      s"""WITH raw AS MATERIALIZED (${rmatSql(1000, 8, 42, 0.57, 0.19, 0.19)}),
         |e0 AS (SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
         |       FROM raw WHERE src <> dst),
         |und AS MATERIALIZED (SELECT a AS u, b AS v FROM e0
         |       UNION ALL SELECT b, a FROM e0),
         |dgt AS (SELECT u, count(*) AS dg FROM und GROUP BY 1),
         |st0 AS MATERIALIZED (SELECT n.i, coalesce(dgt.dg, 0) AS dg,
         |    0.0 AS x, $b AS r, $b AS p
         |  FROM (SELECT id::BIGINT AS i FROM range(256) t(id)) n
         |  LEFT JOIN dgt ON dgt.u = n.i),
         |${(1 to 3).map(iter).mkString(",\n")}
         |SELECT i, round(x, 6) + 0.0 AS x FROM st3""".stripMargin
    },
  )
}
