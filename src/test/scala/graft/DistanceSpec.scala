package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{ClusterOps, DistanceOps, RandomOps}

/** Behavior tests for the pairwise-distance layer and the structures built
  * on it (kNN graph, mutual-reachability linkage, PQ-ADC) — properties the
  * oracle hash-compare can't see: metric identities, graph symmetry
  * semantics, PQ cluster recall.
  */
class DistanceSpec extends AnyFunSuite {
  import TestSpark._

  private def twoVecs = {
    import spark.implicits._
    Seq((0L, Seq(1.0, -2.0, 0.0, 3.0)), (1L, Seq(-1.0, 2.0, 4.0, 3.0)))
      .toDF("id", "vec")
  }

  test("pairwise metrics match hand-computed values") {
    val r = DistanceOps.pairwiseMetrics(twoVecs, 2).collect().head
    // diffs = (2, -4, -4, 0): l1 = 10, l2 = 6, linf = 4
    assert(r.getAs[Double]("l1") == 10.0)
    assert(r.getAs[Double]("l2") == 6.0)
    assert(r.getAs[Double]("linf") == 4.0)
    // canberra = 2/2 + 4/4 + 4/4 + 0/6 = 3.0
    assert(r.getAs[Double]("canberra") == 3.0)
    // dot = -1-4+0+9 = 4; |a| = sqrt(14), |b| = sqrt(30)
    assert(math.abs(r.getAs[Double]("cos") - 4.0 / math.sqrt(14.0 * 30.0)) < 1e-4)
    // corr: n·sab − sa·sb = 4·4 − 2·8 = 0 → distance exactly 1
    assert(r.getAs[Double]("corr") == 1.0)
    // bray: Σ|a−b| / Σ|a+b| = 10 / (0+0+4+6) = 1
    assert(r.getAs[Double]("bray") == 1.0)
    // minkowski p=3: cbrt(8 + 64 + 64 + 0)
    assert(math.abs(r.getAs[Double]("mink3") - math.cbrt(136.0)) < 1e-4)
    // hamming: 3 of 4 lanes differ
    assert(r.getAs[Double]("hamming") == 0.75)
  }

  test("pairwise metrics2 (simplex/binary/haversine rows) match hand-computed values") {
    val r = DistanceOps.pairwiseMetrics2(twoVecs, 2).collect().head
    // a=(1,-2,0,3), b=(-1,2,4,3): ip = -1-4+0+9 = 4
    assert(r.getAs[Double]("ip") == 4.0)
    // p = |a|/6 = (1/6,1/3,0,1/2), q = |b|/10 = (.1,.2,.4,.3);
    // every p>0 lane has p/q = 5/3, so KL = ln(5/3)
    assert(math.abs(r.getAs[Double]("kl") - math.log(5.0 / 3.0)) < 2e-4)
    // js² = (ln(5/4) + 0.6·ln(3/4) + 0.4·ln 2)/2
    val js = math.sqrt((math.log(1.25) + 0.6 * math.log(0.75) + 0.4 * math.log(2.0)) / 2.0)
    assert(math.abs(r.getAs[Double]("js") - js) < 2e-4)
    // Σ√(pq) = √(1/60)+√(1/15)+0+√(3/20)
    val hell = math.sqrt(1.0 -
      (math.sqrt(1.0 / 60) + math.sqrt(1.0 / 15) + math.sqrt(3.0 / 20)))
    assert(math.abs(r.getAs[Double]("hellinger") - hell) < 2e-4)
    // masks: a>0 = (1,0,0,1), b>0 = (0,1,1,1), both = 1
    assert(r.getAs[Double]("jaccard") == 0.75)   // 1 - 1/4
    assert(r.getAs[Double]("dice") == 0.6)       // 1 - 2/5
    assert(r.getAs[Double]("russellrao") == 0.75) // (4-1)/4
    // lat/lon = first two lanes /10: (0.1,-0.2) vs (-0.1,0.2)
    val inner = math.pow(math.sin(0.1), 2) +
      math.cos(0.1) * math.cos(-0.1) * math.pow(math.sin(-0.2), 2)
    assert(math.abs(r.getAs[Double]("haversine") -
      2.0 * math.asin(math.sqrt(inner))) < 2e-4)
  }

  test("eps-neighborhood degree counts self and is symmetric in total") {
    val blobs = RandomOps.makeBlobs(spark, 200, 8, 5, 42).select(col("id"), col("vec"))
    val deg = DistanceOps.epsNeighborhood(blobs, 64.0).collect()
    assert(deg.length == 200)
    assert(deg.forall(_.getLong(1) >= 1L)) // self always within eps
    // degree sum counts each (a,b) pair twice plus n selves -> even parity check
    val total = deg.map(_.getLong(1)).sum
    assert((total - 200) % 2 == 0)
  }

  test("kNN graph: k edges per node, mutual flag agrees with reverse edge") {
    val blobs = RandomOps.makeBlobs(spark, 150, 8, 5, 42).select(col("id"), col("vec"))
    val g = DistanceOps.knnGraph(blobs, 4).collect()
    val bySrc = g.groupBy(_.getLong(0))
    assert(bySrc.size == 150 && bySrc.forall(_._2.length == 4))
    val edges = g.map(r => (r.getLong(0), r.getLong(1))).toSet
    g.foreach { r =>
      val mutual = r.getAs[Int]("mutual") == 1
      assert(mutual == edges.contains((r.getLong(1), r.getLong(0))))
    }
  }

  test("mutual-reachability linkage recovers separated blobs") {
    val blobs = RandomOps.makeBlobs(spark, 300, 8, 5, 42).select(col("id"), col("vec"))
    val labels = DistanceOps.mutualReachabilityLinkage(blobs, 5, 5).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(labels.size == 300)
    // every node labeled with its blob's min id = blob index
    labels.foreach { case (node, comp) => assert(comp == node % 5) }
  }

  test("PQ-ADC top-k stays within the query's generative blob") {
    val blobs = RandomOps.makeBlobs(spark, 1000, 8, 5, 42).select(col("id"), col("vec"))
    val top = ClusterOps.pqTopK(blobs, 5, 10, d = 8, m = 2, ksub = 5, iters = 5)
      .collect()
    assert(top.length == 50)
    top.foreach { r =>
      assert(r.getLong(1) % 5 == r.getLong(0) % 5,
        s"PQ neighbor ${r.getLong(1)} not in query ${r.getLong(0)}'s blob")
    }
  }

  test("NN-descent reaches >=0.98 recall of the exact kNN graph in 4 rounds") {
    val blobs = RandomOps.makeBlobs(spark, 500, 8, 5, 42)
      .select(col("id"), col("vec")).localCheckpoint(true)
    val exact = DistanceOps.knnGraph(blobs, 5).select(col("src"), col("dst"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val nn = DistanceOps.nnDescent(blobs, 5, 4).select(col("src"), col("dst"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (nn intersect exact).size.toDouble / exact.size
    // hash-deterministic: measured 0.9844 at these parameters; the
    // plateau (~0.99, not 1.0) is the algorithm's documented local-search
    // behavior, which is why the driver query records rows-only
    assert(recall >= 0.98, s"NN-descent recall $recall")
    // determinism: the fixpoint reproduces exactly
    val nn2 = DistanceOps.nnDescent(blobs, 5, 4).select(col("src"), col("dst"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(nn == nn2)
    // early termination: a large round budget converges to the SAME
    // fixpoint (extra rounds past convergence are provable no-ops and
    // are skipped, so this must not run 12 rounds of joins)
    val nn12 = DistanceOps.nnDescent(blobs, 5, 12).select(col("src"), col("dst"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(nn12 == nn || (nn12 intersect exact).size >= (nn intersect exact).size)
  }

  test("DBSCAN: core/border/noise on a hand-built line cluster") {
    import spark.implicits._
    // 1-d line embedded in 2 lanes: 0,1,2,3 chained at unit spacing; point
    // 4 at x=4.5 is within eps of only point 3 (border: non-core with a
    // core neighbor); point 5 at x=100 is noise. eps=1.1, minPts=3 (self
    // included): points 1,2 have 2 neighbors each (core); 0,3 have 1-2...
    val pts = Seq(
      (0L, Seq(0.0, 0.0)), (1L, Seq(1.0, 0.0)), (2L, Seq(2.0, 0.0)),
      (3L, Seq(3.0, 0.0)), (4L, Seq(3.9, 0.0)), (5L, Seq(100.0, 0.0)),
      (6L, Seq(4.9, 0.0))).toDF("id", "vec")
    // neighbors within 1.1: 0-[1], 1-[0,2], 2-[1,3], 3-[2,4], 4-[3,6], 6-[4], 5-[]
    // minPts=3 => core = {1,2,3,4}; components of core-core graph = {1,2,3,4} -> label 1
    // border: 0 (neighbor of core 1), 6 (neighbor of core 4) -> label 1; noise: 5
    val r = DistanceOps.dbscan(pts, 1.1, 3).collect()
      .map(x => x.getLong(0) -> (x.getLong(1), x.getInt(2))).toMap
    assert(Seq(1L, 2L, 3L, 4L).forall(i => r(i) == (1L, 1)))
    assert(r(0L) == (1L, 0) && r(6L) == (1L, 0)) // border points, not core
    assert(r(5L) == (-1L, 0)) // noise
  }

  test("ball-cover kNN is exact AND prunes the candidate space") {
    val blobs = RandomOps.makeBlobs(spark, 500, 8, 5, 42)
      .select(col("id"), col("vec")).coalesce(4).localCheckpoint(true)
    val bc = DistanceOps.ballCoverKnn(blobs, 5, 25)
      .select("src", "dst", "rnk").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    // brute force reference
    val brute = DistanceOps.knnGraph(blobs, 5)
      .select("src", "dst", "rnk").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(bc === brute, "triangle-inequality pruning must stay exact")
    // the pruned candidate set is a small fraction of the n² scan: with
    // 25 landmarks over 5 separated blobs, surviving cells are (almost
    // always) only the query's own blob -> ~n²/5 pairs, not 500*499
    val cand = DistanceOps.ballCoverCandidates(blobs, 5, 25).count()
    assert(cand < 500L * 499L / 3,
      s"expected pruning to cut the pair count, got $cand")
  }

  test("graph-search ANN recalls most true neighbors through the kNN graph") {
    val blobs = RandomOps.makeBlobs(spark, 500, 8, 5, 42)
      .select(col("id"), col("vec")).coalesce(4).localCheckpoint(true)
    val g = DistanceOps.knnGraph(blobs, 5).select(col("src"), col("dst"))
    val gs = graft.operators.AnnOps.graphSearchTopK(blobs, g, 20, 5, 16, 6)
      .select(col("qid").as("src"), col("node").as("dst"))
    val brute = DistanceOps.knnGraph(blobs, 5)
      .where(col("src") < 20).select(col("src"), col("dst"))
    val hits = gs.join(brute, Seq("src", "dst")).count()
    // the kNN-5 graph of separated blobs has NO inter-blob edges, so a
    // query only reaches its true neighbors if one of its 16 uniform
    // seeds lands in its own 100-point blob (p ≈ 1 − 0.8^16 ≈ 0.97 per
    // query) — the connectivity caveat CAGRA's graph-optimize step
    // exists to fix. Expect high-but-not-perfect recall.
    assert(hits >= 80, s"recall ${hits / 100.0} below floor")
  }

  test("landmark seeding lifts graph-search recall to ~1.0") {
    val blobs = RandomOps.makeBlobs(spark, 500, 8, 5, 42)
      .select(col("id"), col("vec")).coalesce(4).localCheckpoint(true)
    val g0 = DistanceOps.knnGraph(blobs, 5).select(col("src"), col("dst"))
    // symmetrized graph (the CAGRA-optimize reverse-edge step): directed
    // kNN-5 stalls greedy walks; reverse edges double the usable degree
    val g = g0.unionByName(g0.select(col("dst").as("src"), col("src").as("dst"))).distinct()
    val gs = graft.operators.AnnOps
      .graphSearchTopKLandmarks(blobs, g, 20, 5, 8, 6, 25)
      .select(col("qid").as("src"), col("node").as("dst"))
    val brute = DistanceOps.knnGraph(blobs, 5)
      .where(col("src") < 20).select(col("src"), col("dst"))
    val hits = gs.join(brute, Seq("src", "dst")).count()
    // nearest landmarks are in the query's own blob by construction, so
    // the seed-connectivity cap of the random-seed variant is gone
    assert(hits >= 98, s"landmark-seeded recall ${hits / 100.0} below 0.98")
  }

  test("graph optimize respects degree bounds and beats plain kNN-5 at equal search cost") {
    val blobs = RandomOps.makeBlobs(spark, 500, 8, 5, 42)
      .select(col("id"), col("vec")).coalesce(4).localCheckpoint(true)
    val g10 = DistanceOps.knnGraph(blobs, 10)
      .select(col("src"), col("dst"), col("rnk")).localCheckpoint(true)
    val opt = graft.operators.AnnOps.optimizeKnnGraph(g10, 5).localCheckpoint(true)
    // out-degree ≤ 2·deg (deg forward + deg reverse, minus overlaps)
    val maxDeg = opt.groupBy(col("src")).count().agg(max(col("count"))).collect()(0).getLong(0)
    assert(maxDeg <= 10, s"out-degree $maxDeg exceeds 2*deg")
    // detour pruning actually dropped edges: strictly fewer forward
    // survivors than the 5000 input edges, yet every node keeps ≥ 1
    val nFwd = opt.where(col("is_fwd") === 1).count()
    assert(nFwd < 5000 && nFwd >= 500, s"forward survivors $nFwd")
    assert(opt.select(col("src")).distinct().count() == 500)
    // recall at equal search cost: beam search over the optimized graph
    // (degree ≤ 10 but only 5 forward picks per node were allowed) must
    // beat the same search over the plain kNN-5 graph — reverse edges
    // un-stall greedy walks (the CAGRA claim)
    val brute = DistanceOps.knnGraph(blobs, 5)
      .where(col("src") < 20).select(col("src"), col("dst")).localCheckpoint(true)
    def recallOf(g: org.apache.spark.sql.DataFrame): Long =
      graft.operators.AnnOps.graphSearchTopK(blobs, g, 20, 5, 16, 6)
        .select(col("qid").as("src"), col("node").as("dst"))
        .join(brute, Seq("src", "dst")).count()
    val base = recallOf(DistanceOps.knnGraph(blobs, 5).select(col("src"), col("dst")))
    val tuned = recallOf(opt.select(col("src"), col("dst")))
    assert(tuned >= base, s"optimized recall $tuned below base $base")
    // the residual misses are queries whose 16 random seeds all land
    // outside their blob (p ≈ 3% per query on this fixture) — optimize
    // cannot fix seed placement; landmark seeding does (test above)
    assert(tuned >= 90, s"optimized recall $tuned below 0.90")
  }

  test("PQ encode compresses same-blob points to identical codes") {
    val blobs = RandomOps.makeBlobs(spark, 500, 8, 5, 42).select(col("id"), col("vec"))
    val cb = ClusterOps.pqTrain(blobs, d = 8, m = 2, ksub = 5, iters = 5)
    assert(cb.length == 2 && cb.forall(_.length == 5) && cb.forall(_.forall(_.length == 4)))
    val codes = ClusterOps.pqEncode(blobs, 8, cb)
      .select(col("id"), col("c0"), col("c1")).collect()
    val byBlob = codes.groupBy(_.getLong(0) % 5)
    byBlob.foreach { case (_, rows) =>
      assert(rows.map(r => (r.getInt(1), r.getInt(2))).distinct.length == 1)
    }
  }
}
