package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.ArrayMath

/** SparkSessionExtensions wiring: the DotFusionRule must rewrite the HOF
  * dot-product pattern to the native ArrayDot expression with identical
  * results (same strict fold ⇒ bit-for-bit equal).
  */
class ExtensionsSpec extends AnyFunSuite {

  test("DotFusionRule rewrites HOF dot to ArrayDot and preserves values") {
    val base = TestSpark.spark // materialize the shared context first
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    // TestSpark is the EXTENDED session now (same as the gates); the
    // contrast session is built plain on the shared context
    val plain = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .getOrCreate()
    val s = base
    try {
      def dotDf(sess: SparkSession) = sess.range(50).select(col("id"),
        ArrayMath.dot(
          transform(sequence(lit(0), lit(7)), j => (col("id") + j).cast("double")),
          transform(sequence(lit(0), lit(7)), j => (j * 2).cast("double"))).as("d"))
      val df = dotDf(s)
      assert(df.queryExecution.optimizedPlan.toString.toLowerCase.contains("arraydot"),
        "optimizer did not substitute the native expression")
      assert(!dotDf(plain).queryExecution.optimizedPlan.toString.toLowerCase
        .contains("arraydot"), "un-extended session must keep the HOF form")
      val got = df.collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
      (0L until 50L).foreach { id =>
        val expected = (0 until 8).map(j => (id + j).toDouble * (j * 2)).sum
        assert(got(id) == expected, s"id=$id: ${got(id)} vs $expected")
      }
    } finally {
      // s shares the SparkContext — do NOT stop it; just restore the session
      SparkSession.setDefaultSession(base)
      SparkSession.setActiveSession(base)
    }
  }

  test("L2Sq fusion rewrites the diff-square zip fold to ArrayL2Sq, same bits") {
    val base = TestSpark.spark
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    // TestSpark is the EXTENDED session now (same as the gates); the
    // contrast session is built plain on the shared context
    val plain = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .getOrCreate()
    val s = base
    try {
      def dDf(sess: SparkSession) = sess.range(50).select(col("id"),
        graft.operators.DistanceOps.l2sq(
          transform(sequence(lit(0), lit(7)), j => (col("id") + j).cast("double")),
          transform(sequence(lit(0), lit(7)), j => (j * 3).cast("double"))).as("d2"))
      val df = dDf(s)
      assert(df.queryExecution.optimizedPlan.toString.toLowerCase.contains("arrayl2sq"),
        "optimizer did not substitute ArrayL2Sq")
      // the sibling rules must not misfire on the diff-square pattern
      assert(!df.queryExecution.optimizedPlan.toString.toLowerCase.contains("arraydot("))
      assert(!dDf(plain).queryExecution.optimizedPlan.toString.toLowerCase
        .contains("arrayl2sq"), "un-extended session must keep the HOF form")
      val got = df.collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
      (0L until 50L).foreach { id =>
        var expected = 0.0 // strict left fold, same order as the HOF
        (0 until 8).foreach { j =>
          val d = (id + j).toDouble - j * 3; expected += d * d }
        assert(got(id) == expected, s"id=$id: ${got(id)} vs $expected")
      }
    } finally {
      SparkSession.setDefaultSession(base)
      SparkSession.setActiveSession(base)
    }
  }

  test("fusion rules do not fire on near-miss patterns") {
    val base = TestSpark.spark
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    // TestSpark is the EXTENDED session now (same as the gates); the
    // contrast session is built plain on the shared context
    val plain = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .getOrCreate()
    val s = base
    try {
      val v = transform(sequence(lit(0), lit(7)), j => (col("id") + j).cast("double"))
      val w = transform(sequence(lit(0), lit(7)), j => (j * 2).cast("double"))
      // (x+y)*(x-y), reversed diff order, and non-zero init: all must stay HOF
      val nearMisses = Seq(
        aggregate(zip_with(v, w, (x, y) => (x + y) * (x - y)), lit(0.0), (a, b) => a + b),
        aggregate(zip_with(v, w, (x, y) => (y - x) * (x - y)), lit(0.0), (a, b) => a + b),
        aggregate(zip_with(v, w, (x, y) => (x - y) * (x - y)), lit(1.0), (a, b) => a + b),
        aggregate(zip_with(v, w, (x, y) => x * y), lit(0.0), (a, b) => a - b))
      nearMisses.zipWithIndex.foreach { case (c, i) =>
        val p = s.range(3).select(c.as("r")).queryExecution.optimizedPlan
          .toString.toLowerCase
        assert(!p.contains("arraydot") && !p.contains("arrayl2sq")
          && !p.contains("arraynormsq"), s"near-miss $i was rewritten:\n$p")
      }
    } finally {
      SparkSession.setDefaultSession(base)
      SparkSession.setActiveSession(base)
    }
  }

  test("NormSq fusion rewrites aggregate(transform(v, x*x)) to ArrayNormSq, same bits") {
    val base = TestSpark.spark
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    // TestSpark is the EXTENDED session now (same as the gates); the
    // contrast session is built plain on the shared context
    val plain = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .getOrCreate()
    val s = base
    try {
      def sqDf(sess: SparkSession) = sess.range(50).select(col("id"),
        ArrayMath.foldSum(
          transform(sequence(lit(0), lit(7)), j => (col("id") + j).cast("double")),
          x => x * x).as("n2"))
      val df = sqDf(s)
      assert(df.queryExecution.optimizedPlan.toString.toLowerCase.contains("arraynormsq"),
        "optimizer did not substitute ArrayNormSq")
      // the dot rule must NOT misfire on the square pattern and vice versa
      assert(!df.queryExecution.optimizedPlan.toString.toLowerCase.contains("arraydot("))
      val got = df.collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
      (0L until 50L).foreach { id =>
        var expected = 0.0 // strict left fold, same order as the HOF
        (0 until 8).foreach { j => val v = (id + j).toDouble; expected += v * v }
        assert(got(id) == expected, s"id=$id: ${got(id)} vs $expected")
      }
    } finally {
      SparkSession.setDefaultSession(base)
      SparkSession.setActiveSession(base)
    }
  }

  test("L1 fusion rewrites both declarative abs-diff spellings, same bits") {
    val s = TestSpark.spark
    def va = transform(sequence(lit(0), lit(7)), j => (col("id") * 3 - j * 2).cast("double"))
    def vb = transform(sequence(lit(0), lit(7)), j => (col("id") - j * 5).cast("double"))
    // spelling 1: aggregate(zip_with(a, b, abs(x - y)), 0.0, +)
    val direct = s.range(50).select(col("id"),
      aggregate(zip_with(va, vb, (x, y) => abs(x - y)), lit(0.0), (acc, x) => acc + x).as("d"))
    // spelling 2: ArrayMath.l1(ArrayMath.sub(a, b))
    val composed = s.range(50).select(col("id"),
      ArrayMath.l1(ArrayMath.sub(va, vb)).as("d"))
    Seq("direct" -> direct, "composed" -> composed).foreach { case (tag, df) =>
      assert(df.queryExecution.optimizedPlan.toString.toLowerCase.contains("arraylanemetric"),
        s"$tag spelling not fused")
      val got = df.collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
      (0L until 50L).foreach { id =>
        val expected = (0 until 8).map(j => math.abs((id * 3 - j * 2).toDouble - (id - j * 5))).sum
        assert(got(id) == expected, s"$tag id=$id: ${got(id)} vs $expected")
      }
    }
  }
}
