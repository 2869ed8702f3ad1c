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
