package graft

import org.scalacheck.{Gen, Prop, Properties}
import org.scalacheck.Prop.forAll
import org.scalacheck.Test.Parameters
import graft.operators.SolverOps

/** Property test for the distributed auction LAP: across random instance
  * shapes (n varies the hash cost matrix entirely; small topT starves the
  * kernel and forces the column-generation repair path — the seam where
  * round 3 found a livelock), the certified auction total must EXACTLY
  * equal an independently-run Hungarian on the same integer costs. The
  * ε-CS certificate + integer costs make this an equality, not a
  * tolerance. Few samples — each runs the full auction driver loop.
  */
object LapProps extends Properties("AuctionLap") {

  override def overrideParameters(p: Parameters): Parameters =
    p.withMinSuccessfulTests(6)

  private lazy val spark = TestSpark.spark

  private def h32(s: String): Long = {
    val hex = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).take(4).map(b => f"$b%02x").mkString
    java.lang.Long.parseLong(hex, 16)
  }

  property("certified auction total == Hungarian across shapes and starved kernels") =
    forAll(Gen.choose(8, 45), Gen.choose(2, 8)) { (n, topT) =>
      val Array(row) = SolverOps.lapAuctionDistributed(spark, n, topT = topT).collect()
      val cost = Array.tabulate(n, n)((i, j) => (h32(s"$i:$j:lap") % 1000000L).toDouble)
      val (_, total) = SolverOps.hungarian(cost)
      Prop(row.getLong(0) == n.toLong && row.getLong(1) == total.toLong) :|
        s"n=$n topT=$topT auction=${row.getLong(1)} hungarian=${total.toLong}"
    }
}
