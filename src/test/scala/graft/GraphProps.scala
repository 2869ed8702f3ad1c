package graft

import org.scalacheck.{Gen, Prop, Properties}
import org.scalacheck.Prop.forAll
import org.scalacheck.Test.Parameters
import graft.operators.{DistanceOps, GraphOps}

/** Properties for the round-5 graph/clustering ops on random inputs —
  * behaviors the fixture oracles can't cover. Few samples: each is a
  * full Spark job. */
object GraphProps extends Properties("GraphOps") {

  override def overrideParameters(p: Parameters): Parameters =
    p.withMinSuccessfulTests(6)

  private lazy val spark = TestSpark.spark

  private val edgeGen: Gen[List[(Long, Long)]] =
    Gen.choose(4, 20).flatMap { n =>
      Gen.listOfN(2 * n, for {
        a <- Gen.choose(0L, n.toLong - 1)
        b <- Gen.choose(0L, n.toLong - 1)
        if a != b
      } yield (a, b))
    }.suchThat(_.nonEmpty)

  property("pageRank matches a reference driver-side iteration exactly") =
    forAll(edgeGen) { edges =>
      import spark.implicits._
      val n = 20L
      val iters = 5
      val got = GraphOps.pageRank(edges.toDF("src", "dst"), n, iters)
        .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
      // driver-side replay of the same simplification (dangling dropped)
      val e = edges.distinct
      val out = e.groupBy(_._1).view.mapValues(_.size.toDouble).toMap
      var r = Array.fill(n.toInt)(1.0 / n)
      for (_ <- 0 until iters) {
        val next = Array.fill(n.toInt)(0.15 / n)
        e.foreach { case (s, d) =>
          next(d.toInt) += 0.85 * r(s.toInt) / out(s)
        }
        r = next
      }
      val ok = (0 until n.toInt).forall(i => math.abs(got(i.toLong) - r(i)) < 1e-9)
      Prop(ok) :| s"got=${got.toSeq.sortBy(_._1)} want=${r.toSeq}"
    }

  private val ptsGen: Gen[List[(Long, Double, Double)]] =
    Gen.choose(6, 25).flatMap { n =>
      Gen.listOfN(n, Gen.choose(0.0, 10.0).flatMap(x =>
        Gen.choose(0.0, 10.0).map(y => (x, y))))
        .map(_.zipWithIndex.map { case ((x, y), i) => (i.toLong, x, y) })
    }

  property("dbscan matches a brute-force driver implementation") =
    forAll(ptsGen) { pts =>
      import spark.implicits._
      val eps = 2.0
      val minPts = 3
      val df = pts.map { case (i, x, y) => (i, Seq(x, y)) }.toDF("id", "vec")
      val got = DistanceOps.dbscan(df, eps, minPts).collect()
        .map(r => r.getLong(0) -> ((r.getLong(1), r.getInt(2)))).toMap
      // brute force: core = >= minPts-1 neighbors; clusters = CC over
      // core-core pairs with min-id labels; border = min core-neighbor label
      val arr = pts.toArray
      def d2(a: (Long, Double, Double), b: (Long, Double, Double)) =
        (a._2 - b._2) * (a._2 - b._2) + (a._3 - b._3) * (a._3 - b._3)
      val nbrs = arr.map(p => p._1 ->
        arr.filter(q => q._1 != p._1 && d2(p, q) <= eps * eps).map(_._1).toSet).toMap
      val core = arr.map(_._1).filter(i => nbrs(i).size + 1 >= minPts).toSet
      val parent = scala.collection.mutable.HashMap.empty[Long, Long]
      def find(x: Long): Long = {
        var r = x; while (parent.getOrElse(r, r) != r) r = parent(r); r
      }
      core.foreach(i => parent.getOrElseUpdate(i, i))
      for (i <- core; j <- nbrs(i) if core(j)) {
        val (ri, rj) = (find(i), find(j))
        if (ri != rj) parent(math.max(ri, rj)) = math.min(ri, rj)
      }
      val compOf = core.map(i => i -> core.filter(j => find(j) == find(i)).min).toMap
      val want = arr.map { p =>
        val i = p._1
        if (core(i)) i -> ((compOf(i), 1))
        else {
          val coreN = nbrs(i).filter(core)
          if (coreN.nonEmpty) i -> ((coreN.map(compOf).min, 0))
          else i -> ((-1L, 0))
        }
      }.toMap
      Prop(got == want) :| s"got=$got want=$want"
    }

  property("neighborhoodFunction matches driver BFS balls exactly") =
    forAll(edgeGen) { edges =>
      import spark.implicits._
      val got = GraphOps.neighborhoodFunction(edges.toDF("src", "dst"), 3)
        .collect().map(r => (r.getLong(0), r.getInt(1)) -> r.getLong(2)).toMap
      // driver BFS over the same symmetrized simple edge set
      val und = edges.filter(e => e._1 != e._2)
        .map(e => (math.min(e._1, e._2), math.max(e._1, e._2))).distinct
      val adj = (und ++ und.map(_.swap)).groupBy(_._1).view
        .mapValues(_.map(_._2).toSet).toMap
      val want = adj.keys.flatMap { v =>
        var ball = Set(v)
        (0 to 3).map { t =>
          if (t > 0) ball = ball ++ ball.flatMap(adj)
          (v, t) -> ball.size.toLong
        }
      }.toMap
      Prop(got == want) :| s"got=$got want=$want"
    }

  property("node2vec walks follow edges and never leave the start component") =
    forAll(edgeGen) { edges =>
      import spark.implicits._
      val walks = GraphOps.node2vecWalks(edges.toDF("src", "dst"), 4)
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
      val und = edges.filter(e => e._1 != e._2)
        .map(e => (math.min(e._1, e._2), math.max(e._1, e._2))).distinct
      val undSet = und.toSet ++ und.map(_.swap).toSet
      val ok = walks.groupBy(_._1).values.forall { steps =>
        val seq = steps.sortBy(_._2).map(_._3)
        seq.length == 5 && seq.sliding(2).forall {
          case Array(a, b) => undSet((a, b)); case _ => true
        }
      }
      Prop(ok) :| s"bad walk in ${walks.toSeq.sortBy(w => (w._1, w._2))}"
    }
}
