package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.GraphOps

/** PageRank invariants the oracle hash can't express: closed-form
  * fixpoints (cycle = uniform, isolated = (1−d)/N) and rank ordering on
  * a hub graph. */
class GraphSpec extends AnyFunSuite {
  import TestSpark._

  test("pageRank: directed cycle stays uniform; isolated node at (1-d)/N") {
    import spark.implicits._
    // 0 -> 1 -> 2 -> 3 -> 0, node 4 isolated
    val edges = Seq((0L, 1L), (1L, 2L), (2L, 3L), (3L, 0L)).toDF("src", "dst")
    val r = GraphOps.pageRank(edges, 5L, 12).collect()
      .map(x => x.getLong(0) -> x.getDouble(1)).toMap
    // uniform 1/5 is the cycle fixpoint: contrib = r, so r' = 0.03 + 0.85 r
    // converges to 0.03/0.15 = 0.2
    (0L to 3L).foreach(i => assert(math.abs(r(i) - 0.2) < 1e-6, s"cycle $i ${r(i)}"))
    assert(math.abs(r(4L) - 0.15 / 5) < 1e-12, "isolated rank = (1-d)/N")
  }

  test("triangleCounts: K4, squares, bridges and duplicate edges are closed-form") {
    import spark.implicits._
    // K4 on 0-3 (each node in C(3,2)=3 triangles), a 4-cycle on 10-13
    // (no triangles), a pendant edge 0-20, plus duplicate/reversed
    // spellings of an existing edge that must canonicalize away
    val edges = Seq(
      (0L, 1L), (0L, 2L), (0L, 3L), (1L, 2L), (1L, 3L), (2L, 3L),
      (10L, 11L), (11L, 12L), (12L, 13L), (13L, 10L),
      (0L, 20L), (1L, 0L), (2L, 0L)).toDF("src", "dst")
    val got = GraphOps.triangleCounts(edges).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    (0L to 3L).foreach(i => assert(got(i) == 3L, s"K4 node $i: $got"))
    assert(!(10L to 13L).exists(got.contains), s"square has no triangles: $got")
    assert(!got.contains(20L), s"pendant node in no triangle: $got")
  }

  test("kCore: the pendant path cascades away round by round, cores survive") {
    import spark.implicits._
    // K5 on 0-4, a path 4-10-11-12 hanging off (peels one node per
    // round at k=2: 12 then 11 then 10), and a triangle 20-21-22 (a
    // 2-core that must survive)
    val edges = ((for { i <- 0 to 4; j <- 0 to 4 if i < j } yield
      (i.toLong, j.toLong)) ++ Seq((4L, 10L), (10L, 11L), (11L, 12L),
      (20L, 21L), (21L, 22L), (20L, 22L))).toDF("src", "dst")
    val got = GraphOps.kCore(edges, 2L, 4).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val want = (0L to 4L).map(_ -> 4L).toMap ++
      Seq(20L, 21L, 22L).map(_ -> 2L)
    assert(got == want, s"2-core: $got")
    // one round only removes the path TIP — the cascade is real
    val partial = GraphOps.kCore(edges, 2L, 1).collect()
      .map(_.getLong(0)).toSet
    assert(partial.contains(10L) && partial.contains(11L) && !partial.contains(12L),
      s"after one round only node 12 is gone: $partial")
  }

  test("randomWalks: every hop follows an edge, degree-1 nodes are forced, partition-invariant") {
    import spark.implicits._
    // path 0-1-2 plus triangle 5-6-7
    val edges = Seq((0L, 1L), (1L, 2L), (5L, 6L), (6L, 7L), (5L, 7L))
      .toDF("src", "dst")
    val walks = GraphOps.randomWalks(edges, 4, 42)
    val rows = walks.collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    assert(rows.length == 6 * 5, s"6 walks x 5 positions: ${rows.length}")
    // consecutive positions are edges of the symmetrized graph
    val und = Set((0L, 1L), (1L, 2L), (5L, 6L), (6L, 7L), (5L, 7L))
      .flatMap { case (a, b) => Seq((a, b), (b, a)) }
    val byWalk = rows.groupBy(_._1).values
    byWalk.foreach { w =>
      val seq = w.sortBy(_._2).map(_._3)
      seq.sliding(2).foreach { case Array(a, b) =>
        assert(und.contains((a, b)), s"hop $a->$b not an edge")
      }
    }
    // degree-1 endpoints have exactly one choice: 0 -> 1, 2 -> 1
    val w0 = rows.filter(r => r._1 == 0L && r._2 == 1).head._3
    val w2 = rows.filter(r => r._1 == 2L && r._2 == 1).head._3
    assert(w0 == 1L && w2 == 1L)
    // partition invariance: the hash pick is a pure function of (walk, t, x)
    val reWalks = GraphOps.randomWalks(edges.repartition(7), 4, 42)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    assert(reWalks == rows.toSet, "walks must not depend on partitioning")
  }

  test("personalizedPageRank: mass stays on the seed-reachable side") {
    import spark.implicits._
    // two disconnected directed cycles: 0->1->2->0 and 10->11->12->10
    val edges = Seq((0L, 1L), (1L, 2L), (2L, 0L),
      (10L, 11L), (11L, 12L), (12L, 10L)).toDF("src", "dst")
    val seeds = Seq(0L).toDF("node")
    val r = GraphOps.personalizedPageRank(edges, 13L, seeds, 12)
      .collect().map(x => x.getLong(0) -> x.getDouble(1)).toMap
    assert(r(10L) == 0.0 && r(11L) == 0.0 && r(12L) == 0.0,
      s"unreachable component must hold zero mass: $r")
    // cycles have no dangling loss: total mass on the seeded cycle is 1
    val tot = r(0L) + r(1L) + r(2L)
    assert(math.abs(tot - 1.0) < 1e-9, s"seeded cycle mass $tot")
    assert(r(0L) > r(1L) && r(1L) > r(2L),
      s"restart node outranks its successors: $r")
  }

  test("hits: shared-citation authority dominates; scores are L1-normalized") {
    import spark.implicits._
    // 0 and 3 both cite 1; only 0 cites 2 — authority(1) > authority(2);
    // hub(0) cites both top authorities so hub(0) > hub(3)
    val edges = Seq((0L, 1L), (0L, 2L), (3L, 1L)).toDF("src", "dst")
    val r = GraphOps.hits(edges, 5L, 5).collect()
      .map(x => x.getLong(0) -> (x.getDouble(1), x.getDouble(2))).toMap
    assert(r(1L)._2 > r(2L)._2, s"authority(1) > authority(2): $r")
    assert(r(0L)._1 > r(3L)._1, s"hub(0) > hub(3): $r")
    assert(r(4L) == ((0.0, 0.0)), s"isolated node scores 0: $r")
    val (hs, as2) = (r.values.map(_._1).sum, r.values.map(_._2).sum)
    assert(math.abs(hs - 1.0) < 1e-9 && math.abs(as2 - 1.0) < 1e-9,
      s"L1 norms: $hs, $as2")
  }

  test("kTruss: K5 is a 4-truss, attached triangles and paths peel away") {
    import spark.implicits._
    // K5 on 0-4; triangle 4-10-11 hanging off; path 11-20
    val k5 = for { i <- 0 to 4; j <- 0 to 4 if i < j } yield (i.toLong, j.toLong)
    val edges = (k5 ++ Seq((4L, 10L), (10L, 11L), (4L, 11L), (11L, 20L)))
      .toDF("src", "dst")
    val t4 = GraphOps.kTruss(edges, 4L, 3).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(t4 == k5.toSet, s"4-truss is exactly K5: $t4")
    // the 3-truss keeps the attached triangle but not the pendant path
    val t3 = GraphOps.kTruss(edges, 3L, 3).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(t3 == k5.toSet ++ Set((4L, 10L), (10L, 11L), (4L, 11L)),
      s"3-truss adds the triangle: $t3")
  }

  test("node2vec walks: edge-valid transitions, full length, partition-invariant") {
    import spark.implicits._
    val edges = Seq((0L, 1L), (1L, 2L), (2L, 3L), (3L, 0L), (0L, 2L), (3L, 4L))
      .toDF("src", "dst")
    val w = GraphOps.node2vecWalks(edges, 5).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    assert(w.count(_._2 == 0) == 5 && w.length == 5 * 6, s"5 walks x 6 steps: ${w.length}")
    val und = Set((0L, 1L), (1L, 2L), (2L, 3L), (0L, 3L), (0L, 2L), (3L, 4L))
      .flatMap { case (a, b) => Set((a, b), (b, a)) }
    val byWalk = w.groupBy(_._1).values
    assert(byWalk.forall(steps => steps.sortBy(_._2).sliding(2).forall {
      case Array((_, _, a), (_, _, b)) => und((a, b)); case _ => true
    }), "every consecutive pair is an edge")
    // partition-invariance: the counter-hash picks ignore physical layout
    val w2 = GraphOps.node2vecWalks(edges.repartition(7), 5).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    assert(w.toSet == w2.toSet, "walks are partition-invariant")
  }

  test("clustering coefficient and assortativity: closed forms on K4+pendant and a star") {
    import spark.implicits._
    // K4 on 0-3 with pendant 4 on 3: c = (1,1,1,0.5,0), avg 0.7;
    // transitivity = 3*4 / (3+3+3+6+0) = 0.8
    val k4p = (for { i <- 0 to 3; j <- 0 to 3 if i < j } yield (i.toLong, j.toLong))
      .++(Seq((3L, 4L))).toDF("src", "dst")
    val r = GraphOps.clusteringCoefficient(k4p).head()
    assert(r.getLong(0) == 5L && r.getDouble(1) == 0.7 && r.getDouble(2) == 0.8, s"$r")
    // star: every edge pairs the hub (deg 4) with a leaf (deg 1) -> r = -1
    val star = Seq((0L, 1L), (0L, 2L), (0L, 3L), (0L, 4L)).toDF("src", "dst")
    val a = GraphOps.degreeAssortativity(star).head()
    assert(a.getDouble(0) == -1.0 && a.getLong(1) == 8L, s"star assortativity: $a")
  }

  test("neighborhoodFunction: closed-form ball sizes on a path; hyperBall tracks exact") {
    import spark.implicits._
    // path 0-1-2-3-4: |B_1| = 2,3,3,3,2; |B_2| = 3,4,5,4,3
    val path = Seq((0L, 1L), (1L, 2L), (2L, 3L), (3L, 4L)).toDF("src", "dst")
    val nf = GraphOps.neighborhoodFunction(path, 2).collect()
      .map(r => (r.getLong(0), r.getInt(1)) -> r.getLong(2)).toMap
    assert((0L to 4L).forall(v => nf((v, 0)) == 1L), s"t=0 balls are singletons: $nf")
    assert(Seq(0L -> 2L, 1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 2L)
      .forall { case (v, s) => nf((v, 1)) == s }, s"t=1: $nf")
    assert(Seq(0L -> 3L, 1L -> 4L, 2L -> 5L, 3L -> 4L, 4L -> 3L)
      .forall { case (v, s) => nf((v, 2)) == s }, s"t=2: $nf")
    // HLL path: m=64 registers on a 40-clique — every 1-hop ball is the
    // whole clique, so every estimate is the same and near 40
    val k40 = (for { i <- 0 until 40; j <- 0 until 40 if i < j }
      yield (i.toLong, j.toLong)).toDF("src", "dst")
    val est = GraphOps.hyperBall(k40, 1, 64).collect().map(_.getDouble(1))
    assert(est.distinct.length == 1, "identical balls estimate identically")
    assert(math.abs(est.head - 40.0) / 40.0 < 0.35,
      s"estimate within HLL tolerance of 40: ${est.head}")
    // the neighborhood-function curve is non-decreasing in t and
    // saturates at the clique census from t=1 on
    val curve = GraphOps.hyperBallNF(k40, 2, 64).collect()
      .map(r => r.getInt(0) -> r.getDouble(1)).sortBy(_._1).map(_._2)
    assert(curve.sliding(2).forall { case Array(a, b) => b >= a; case _ => true },
      s"N(t) monotone: ${curve.toSeq}")
    assert(curve(1) == curve(2), s"one-hop saturation on a clique: ${curve.toSeq}")
  }

  test("spectralPartition recovers a planted weakly-coupled partition") {
    import spark.implicits._
    // 4 cliques of 5 chained by weak bridges of distinct weights (chain,
    // not ring — no coupling-mode degeneracy for the single-start Krylov
    // space to miss); the generative grouping is the unique weak cut
    val n = 20L
    val ids = spark.range(n)
    val intra = ids.select(col("id").as("row"))
      .join(ids.select(col("id").as("col")),
        col("row") =!= col("col") &&
          floor(col("row") / 5) === floor(col("col") / 5))
      .select(col("row"), col("col"), lit(1.0).as("value"))
    val weak = Seq((4L, 5L, 0.01), (9L, 10L, 0.02), (14L, 15L, 0.04))
      .flatMap { case (u, v, w) => Seq((u, v, w), (v, u, w)) }
      .toDF("row", "col", "value")
    val part = graft.operators.SpectralOps
      .spectralPartition(intra.unionByName(weak), n, 4, m = 21)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    (0L until n).foreach { i =>
      assert(part(i) === (i / 5) * 5, s"node $i -> ${part(i)}")
    }
  }

  test("pageRank: lineage stays flat across rounds (checkpoint every 5)") {
    // n=1e5 permutation graph (each node one out-edge). Plans are compared
    // at the same offset past a checkpoint (7 = 5+2 vs 32 = 30+2): without
    // the in-loop localCheckpoint the 32-round plan embeds all 32 rounds
    // and the node count grows ~5x; with it both carry exactly 2 rounds of
    // lineage, so the counts are EQUAL — the flat-plan property that keeps
    // a 50+-round solve plannable on a real graph.
    val n = 100000L
    val edges = spark.range(n).select(col("id").as("src"),
      ((col("id") * 31 + 7) % n).as("dst"))
    def planNodes(iters: Int): Int = {
      val r = GraphOps.pageRank(edges, n, iters)
      r.queryExecution.logical.collect { case p => p }.size
    }
    val p7 = planNodes(7)
    val p32 = planNodes(32)
    assert(p32 === p7, s"lineage grew with round count: $p7 -> $p32")
  }

  test("label propagation separates bridge-joined triangles; isolated keeps own label") {
    import spark.implicits._
    // two triangles joined by ONE bridge (2-3): CC merges everything into
    // one component; LPA's plurality vote keeps the triangles apart —
    // exactly the "softer than CC" property the curation use wants.
    // Node 6 has no edges and must keep label 6.
    val edges = Seq((0L, 1L), (1L, 2L), (0L, 2L), (3L, 4L), (4L, 5L), (3L, 5L),
      (2L, 3L)).toDF("src", "dst")
    val got = GraphOps.labelPropagation(edges, 7L, 3).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got(0L) == got(1L) && got(1L) == got(2L), s"triangle A split: $got")
    assert(got(3L) == got(4L) && got(4L) == got(5L), s"triangle B split: $got")
    assert(got(0L) != got(3L), s"bridge merged the triangles: $got")
    assert(got(6L) == 6L, s"isolated node lost its label: $got")
  }

  test("pageRank: hub with many in-links outranks leaves") {
    import spark.implicits._
    val edges = (1L to 9L).map(i => (i, 0L)).toDF("src", "dst")
    val r = GraphOps.pageRank(edges, 10L, 10).collect()
      .map(x => x.getLong(0) -> x.getDouble(1)).toMap
    assert(r(0L) > 5 * r(1L), s"hub ${r(0L)} vs leaf ${r(1L)}")
    // leaves get no in-links: exactly the damping floor
    (1L to 9L).foreach(i => assert(math.abs(r(i) - 0.15 / 10) < 1e-12))
  }
}
