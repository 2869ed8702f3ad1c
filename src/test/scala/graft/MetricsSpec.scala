package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{GraphOps, RandomOps, StatsOps}

/** Closed-form invariants for the round-7 metric additions: ROC-AUC,
  * calibration, Kendall τ-b, robust stats, NDCG/MRR, harmonic
  * centrality, effective diameter, and the KMV bottom-k sample —
  * properties the DuckDB replay oracles can't express (perfect/reversed
  * separation, hand-computable graphs, merge-invariance). */
class MetricsSpec extends AnyFunSuite {
  import TestSpark._

  private def auc(rows: Seq[(Double, Boolean)]): Double = {
    import spark.implicits._
    StatsOps.rocAuc(rows.toDF("score", "pos"), "score", col("pos"))
      .collect().head.getAs[Double]("auc")
  }

  test("rocAuc: perfect separation 1.0, reversed 0.0, all-tied 0.5") {
    val pos = (1 to 20).map(i => (100.0 + i, true))
    val neg = (1 to 30).map(i => (i.toDouble, false))
    assert(auc(pos ++ neg) == 1.0)
    assert(auc(pos.map { case (s, _) => (-s, true) } ++
      neg.map { case (s, _) => (-s, false) }) == 0.0)
    // every score identical: average ranks make AUC exactly 1/2
    assert(auc((1 to 10).map(_ => (7.0, true)) ++
      (1 to 13).map(_ => (7.0, false))) == 0.5)
  }

  test("rocAuc: hand-computed ties match the trapezoid/rank formula") {
    // scores: pos {3, 2}, neg {2, 1}: pairs (3>2),(3>1),(2=2 half),(2>1)
    // AUC = (1 + 1 + 0.5 + 1) / 4 = 0.875
    assert(auc(Seq((3.0, true), (2.0, true), (2.0, false), (1.0, false))) == 0.875)
  }

  test("calibration: perfectly calibrated bins have ece 0") {
    import spark.implicits._
    // bin 2 (p=0.25): 1 of 4 positive; bin 7 (p=0.75): 3 of 4 positive
    val rows = Seq.tabulate(4)(i => (0.25, if (i == 0) 1L else 0L)) ++
      Seq.tabulate(4)(i => (0.75, if (i < 3) 1L else 0L))
    val out = StatsOps.calibration(rows.toDF("p", "y"), 10).collect()
    assert(out.length == 2)
    out.foreach(r => assert(r.getAs[Double]("ece") == 0.0, r.toString))
    assert(out.forall(r => r.getAs[Double]("conf") == r.getAs[Double]("acc")))
  }

  test("kendallTau: perfect agreement +1, reversal -1, and a textbook tie case") {
    import spark.implicits._
    def tau(xy: Seq[(Int, Int)]): Double =
      StatsOps.kendallTau(xy.toDF("x", "y"), "x", "y")
        .collect().head.getAs[Double]("tau_b")
    assert(tau((1 to 8).map(i => (i, i * 2))) == 1.0)
    assert(tau((1 to 8).map(i => (i, -i))) == -1.0)
    // x = (1,2,2,3), y = (1,2,3,4): C=5, D=0, n0=6, n1=1 (the x-tie), n2=0
    // tau-b = 5 / sqrt(5 * 6) = 0.912871
    assert(tau(Seq((1, 1), (2, 2), (2, 3), (3, 4))) == 0.912871)
  }

  test("robustStats: median/iqr/mad/winsorized mean on a hand fixture") {
    import spark.implicits._
    // 1..9 plus an outlier 1000: median=5.5, q25=3.25, q75=7.75
    val df = ((1 to 9).map(_.toDouble) :+ 1000.0).toDF("v")
    val r = StatsOps.robustStats(df, "v").collect().head
    assert(r.getAs[Long]("n") == 10L)
    assert(r.getAs[Double]("median") == 5.5)
    assert(r.getAs[Double]("iqr") == 4.5)
    // deviations |x-5.5|: 0.5,0.5,1.5,1.5,2.5,2.5,3.5,3.5,4.5,994.5 -> median 2.5
    assert(r.getAs[Double]("mad") == 2.5)
    // q05 = 1.45 (clamps x=1 up), q95 = 9 + 0.55*991 = 554.05 (clamps 1000)
    // mean = (1.45 + (2+..+9) + 554.05) / 10 = 59.95
    assert(r.getAs[Double]("winsor_mean") == 59.95)
  }

  test("ndcgMrr: ideal ranking scores 1.0; relevant item at rank 2 halves MRR") {
    import spark.implicits._
    // key 1: scores align with relevance (ideal): ndcg=1, first rel rank 1
    // key 2: the only grade-3 item ranked second: mrr contribution 1/2
    val rows = Seq(
      (1L, 9.0, 1L, 3.0), (1L, 8.0, 2L, 2.0), (1L, 7.0, 3L, 0.0),
      (2L, 9.0, 4L, 1.0), (2L, 8.0, 5L, 3.0), (2L, 7.0, 6L, 0.0))
      .toDF("k", "s", "id", "rel")
    val r = StatsOps.ndcgMrr(rows, "k", "s", "id", col("rel"), 10)
      .collect().head
    assert(r.getAs[Long]("n_keys") == 2L)
    assert(r.getAs[Double]("mrr") == 0.75) // (1 + 1/2) / 2
    // key2: dcg = (2^1-1)/log2(2) + (2^3-1)/log2(3); idcg = 7 + 1/log2(3)
    val l3 = math.log(3.0) / math.log(2.0)
    val nd2 = (1.0 + 7.0 / l3) / (7.0 + 1.0 / l3)
    val expected = BigDecimal((1.0 + nd2) / 2.0)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(r.getAs[Double]("mean_ndcg") == expected)
  }

  test("harmonicCentrality: path graph P4 closed form at maxT=3") {
    import spark.implicits._
    // 0-1-2-3: H(0) = 1 + 1/2 + 1/3 = 1.833333; H(1) = 2 + 1/2 = 2.5
    val edges = Seq((0L, 1L), (1L, 2L), (2L, 3L)).toDF("src", "dst")
    val h = GraphOps.harmonicCentrality(edges, 3).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(h(0L) == 1.833333 && h(3L) == 1.833333, h.toString)
    assert(h(1L) == 2.5 && h(2L) == 2.5, h.toString)
  }

  test("effectiveDiameter: complete graph reaches everyone in one hop") {
    import spark.implicits._
    val edges = (for (i <- 0L until 8L; j <- i + 1 until 8L) yield (i, j))
      .toDF("src", "dst")
    val r = GraphOps.effectiveDiameter(edges, 3, 16).collect().head
    // N(t) is flat from t=1 on: the 90% crossing sits inside step 0->1
    val d = r.getAs[Double]("d_eff")
    assert(d >= 0.0 && d <= 1.0, s"complete graph d_eff: $d")
  }

  test("bottomKSample: k per group, exactly the k smallest hashes, merge-stable") {
    import spark.implicits._
    val df = (1 to 200).map(i => (s"g${i % 3}", i.toLong)).toDF("seg", "ck")
    val got = RandomOps.bottomKSample(df, "seg", "ck", 4, 11)
    val rows = got.collect()
    assert(rows.length == 12)
    // recompute the reference bottom-4 on the driver from the same md5 key
    val byHash = df.select(col("seg"),
        conv(substring(md5(concat_ws(":", col("ck"), lit(11), lit("bks"))), 1, 13),
          16, 10).cast("long").as("h"), col("ck"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .groupBy(_._1).map { case (g, xs) =>
        g -> xs.sortBy(x => (x._2, x._3)).take(4).map(_._3).toSet }
    rows.groupBy(_.getString(0)).foreach { case (g, rs) =>
      assert(rs.map(_.getAs[Long]("id")).toSet == byHash(g), s"group $g")
    }
    // partition-count invariance: the aggregator merges identically
    val rep = RandomOps.bottomKSample(df.repartition(7), "seg", "ck", 4, 11)
      .collect().map(_.toString).sorted
    assert(rep.sameElements(rows.map(_.toString).sorted))
  }
}
