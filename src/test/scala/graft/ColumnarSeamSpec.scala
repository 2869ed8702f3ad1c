package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.plans.ColumnarSeamProbe

/** The columnar (accelerator) seam: with the probe installed the physical
  * plan must cross the injectColumnar hook — the attach point a GPU
  * backend uses — and results must be identical to the un-extended
  * session. This is the contract a real columnar replacement must meet.
  */
class ColumnarSeamSpec extends AnyFunSuite {

  test("plans cross the columnar seam unchanged; hook observes the operators") {
    val base = TestSpark.spark
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val s = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .withExtensions(new graft.plans.GraftExtensionsWithSeam)
      .getOrCreate()
    try {
      ColumnarSeamProbe.reset()
      def q(sess: SparkSession) = Tables.lineitem(sess, TestSpark.sf)
        .groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("n"), round(sum(col("l_quantity")), 2).as("qty"))
        .orderBy(col("l_returnflag"))
        .collect().map(_.toString).toSeq
      val extended = q(s)
      assert(ColumnarSeamProbe.plansSeen.get() > 0, "columnar hook never fired")
      val seen = ColumnarSeamProbe.nodesSeen
      assert(seen.contains("HashAggregateExec") || seen.contains("ObjectHashAggregateExec"),
        s"aggregate never crossed the seam: $seen")
      // identity transitions ⇒ results equal the un-extended session's
      assert(extended == q(base))
    } finally {
      SparkSession.setDefaultSession(base)
      SparkSession.setActiveSession(base)
    }
  }
}
